"""Pinhole (perspective) camera intrinsics.

Parity: ``kaolin/render/camera/intrinsics_pinhole.py`` (reference).
Matrix conventions match the reference bit-for-bit (SURVEY.md A.5):

* perspective_matrix = ``[[fx,0,-x0,0],[0,fy,-y0,0],[0,0,0,1],[0,0,1,0]]``
  (w <- z swap rows, negated principal point, reference :237-286).
* ndc_matrix composes Ortho x DepthScale with left-handed NDC; supported
  depth ranges: [-1,1] (OpenGL), [0,1], [1,0] (reverse-z) (reference
  :288-458).
* projection_matrix = ndc_matrix @ perspective_matrix (reference :459-485).
"""

import math
from enum import IntEnum
from typing import Optional

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.render.camera.intrinsics import (
    CameraFOV, CameraIntrinsics, default_dtype, down_from_homogeneous,
    up_to_homogeneous)

__all__ = ['PinholeIntrinsics']


class PinholeParamsDefEnum(IntEnum):
    """Column indices of the pinhole ``params`` tensor.

    Parity: ``kaolin/render/camera/intrinsics_pinhole.py:27``.
    """
    x0 = 0
    y0 = 1
    focal_x = 2
    focal_y = 3


class PinholeIntrinsics(CameraIntrinsics):
    """Pinhole intrinsics: params columns are (x0, y0, focal_x, focal_y)."""

    DEFAULT_NEAR = 1e-2
    DEFAULT_FAR = 1e2
    param_names = ('x0', 'y0', 'focal_x', 'focal_y')

    @property
    def lens_type(self):
        return 'pinhole'

    # -- constructors ------------------------------------------------------
    @classmethod
    def from_focal(cls, width, height, focal_x, focal_y=None,
                   x0=None, y0=None, near=DEFAULT_NEAR, far=DEFAULT_FAR,
                   num_cameras=1, dtype=default_dtype):
        """Parity: ``intrinsics_pinhole.py:160``."""
        x0 = 0.0 if x0 is None else x0
        y0 = 0.0 if y0 is None else y0
        focal_y = focal_y if focal_y else focal_x
        params = cls._allocate_params(x0, y0, focal_x, focal_y,
                                      num_cameras=num_cameras, dtype=dtype)
        return cls(width, height, params, near, far)

    @classmethod
    def from_fov(cls, width, height, fov, fov_direction=CameraFOV.VERTICAL,
                 x0=0., y0=0., near=DEFAULT_NEAR, far=DEFAULT_FAR,
                 num_cameras=1, dtype=default_dtype):
        """``fov`` is in radians.  Parity: ``intrinsics_pinhole.py:199``."""
        assert fov_direction in (CameraFOV.HORIZONTAL, CameraFOV.VERTICAL)
        tan_half = math.tan(fov / 2.0)
        aspect_scale = (width / 2.0 if fov_direction is CameraFOV.HORIZONTAL
                        else height / 2.0)
        focal = aspect_scale / tan_half
        params = cls._allocate_params(x0, y0, focal, focal,
                                      num_cameras=num_cameras, dtype=dtype)
        return cls(width, height, params, near, far)

    # -- params ------------------------------------------------------------
    @property
    def x0(self):
        return self._param_col('x0')

    @x0.setter
    def x0(self, val):
        self._set_param_col('x0', val)

    @property
    def y0(self):
        return self._param_col('y0')

    @y0.setter
    def y0(self, val):
        self._set_param_col('y0', val)

    @property
    def focal_x(self):
        return self._param_col('focal_x')

    @focal_x.setter
    def focal_x(self, val):
        self._set_param_col('focal_x', val)

    @property
    def focal_y(self):
        return self._param_col('focal_y')

    @focal_y.setter
    def focal_y(self, val):
        self._set_param_col('focal_y', val)

    @property
    def cx(self):
        """Principal point x in image coords (center + x0)."""
        return self.width / 2. + self.x0

    @property
    def cy(self):
        return self.height / 2. + self.y0

    # -- fov ---------------------------------------------------------------
    def tan_half_fov(self, camera_fov_direction=CameraFOV.VERTICAL):
        """Parity: ``intrinsics_pinhole.py:655``."""
        if camera_fov_direction is CameraFOV.HORIZONTAL:
            return (self.width / 2.0) / self.focal_x
        elif camera_fov_direction is CameraFOV.VERTICAL:
            return (self.height / 2.0) / self.focal_y
        raise ValueError(f"Unsupported fov direction {camera_fov_direction}")

    def fov(self, camera_fov_direction=CameraFOV.VERTICAL, in_degrees=True):
        """Parity: ``intrinsics_pinhole.py:673``."""
        if camera_fov_direction is CameraFOV.HORIZONTAL:
            x, y = self.focal_x, self.width / 2.0
        elif camera_fov_direction is CameraFOV.VERTICAL:
            x, y = self.focal_y, self.height / 2.0
        else:
            raise ValueError(
                f"Unsupported fov direction {camera_fov_direction}")
        out = 2 * jnp.arctan2(jnp.asarray(y, dtype=self.dtype), x)
        if in_degrees:
            out = out * 180 / math.pi
        return out

    @property
    def fov_x(self):
        return self.fov(CameraFOV.HORIZONTAL, in_degrees=True)

    @fov_x.setter
    def fov_x(self, angle_degs):
        fov = jnp.asarray(angle_degs, dtype=self.dtype) / 180 * math.pi
        self.focal_x = (self.width / 2.0) / jnp.tan(fov / 2.0)

    @property
    def fov_y(self):
        return self.fov(CameraFOV.VERTICAL, in_degrees=True)

    @fov_y.setter
    def fov_y(self, angle_degs):
        fov = jnp.asarray(angle_degs, dtype=self.dtype) / 180 * math.pi
        self.focal_y = (self.height / 2.0) / jnp.tan(fov / 2.0)

    def zoom(self, amount):
        """Zoom by changing fov by ``amount`` degrees (positive zooms in).

        Parity: ``intrinsics_pinhole.py:726``.
        """
        fov_ratio = self.fov_x / self.fov_y
        self.fov_y = self.fov_y - amount
        self.fov_x = self.fov_y * fov_ratio
        return self

    # -- matrices ----------------------------------------------------------
    def perspective_matrix(self):
        """(C, 4, 4) camera-space -> homogeneous pre-NDC clip matrix."""
        zero = jnp.zeros_like(self.focal_x)
        one = jnp.ones_like(self.focal_x)
        rows = [
            jnp.stack([self.focal_x, zero, -self.x0, zero], axis=-1),
            jnp.stack([zero, self.focal_y, -self.y0, zero], axis=-1),
            jnp.stack([zero, zero, zero, one], axis=-1),
            jnp.stack([zero, zero, one, zero], axis=-1),
        ]
        return jnp.stack(rows, axis=1)

    def ndc_matrix(self, left, right, bottom, top, near, far):
        """(1, 4, 4) matrix normalizing the frustum cuboid to clip space."""
        tx = -(right + left) / (right - left)
        ty = -(top + bottom) / (top - bottom)
        if self.ndc_min == -1 and self.ndc_max == 1:
            U = -2.0 * near * far / (far - near)
            V = -(far + near) / (far - near)
        elif self.ndc_min == 0 and self.ndc_max == 1:
            U = (near * far) / (near - far)
            V = far / (far - near)
        elif self.ndc_min == 1 and self.ndc_max == 0:
            U = (near * far) / (far - near)
            V = near / (far - near)
        else:
            raise NotImplementedError(
                'Perspective Projection does not support NDC range of '
                f'[{self.ndc_min}, {self.ndc_max}]')
        ndc = jnp.array([
            [2.0 / (right - left), 0.0, 0.0, -tx],
            [0.0, 2.0 / (top - bottom), 0.0, -ty],
            [0.0, 0.0, U, V],
            [0.0, 0.0, 0.0, -1.0]], dtype=self.dtype)
        return ndc[None]

    def projection_matrix(self):
        """(C, 4, 4) OpenGL-compatible projection = ndc @ perspective."""
        persp = self.perspective_matrix()
        top = self.height / 2
        bottom = -top
        right = self.width / 2
        left = -right
        ndc = self.ndc_matrix(left, right, bottom, top, self.near, self.far)
        return ndc @ persp

    def project(self, vectors):
        """Project to homogeneous clip coords (no perspective division).

        Args:
            vectors: ``(B, 3|4)`` or ``(C, B, 3|4)``.

        Returns:
            ``(C, B, 4)``.
        """
        proj = self.projection_matrix()
        v = up_to_homogeneous(vectors)
        C = len(self)
        v = jnp.broadcast_to(v, (C,) + v.shape[-2:])
        return jnp.einsum('cij,cbj->cbi', proj, v)

    def transform(self, vectors):
        """Project to NDC (with perspective division).  Returns (C, B, 3)."""
        return down_from_homogeneous(self.project(vectors))

    def normalize_depth(self, depth):
        """Normalize depths to [0, 1] within the NDC frustum.

        Parity: ``intrinsics_pinhole.py:553``.
        """
        if depth.ndim < 2:
            depth = jnp.broadcast_to(depth, (len(self),) + depth.shape)
        proj = self.projection_matrix()
        a = -proj[:, 2, 2]
        b = -proj[:, 2, 3]
        depth = jnp.clip(depth, min(self.near, self.far),
                         max(self.near, self.far))
        ndc_depth = a[:, None] - b[:, None] / depth
        ndc_min = min(self.ndc_min, self.ndc_max)
        ndc_max = max(self.ndc_min, self.ndc_max)
        normalized = (ndc_depth - ndc_min) / (ndc_max - ndc_min)
        return jnp.clip(normalized, 0.0, 1.0)
