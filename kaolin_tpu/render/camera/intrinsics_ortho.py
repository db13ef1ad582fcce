"""Orthographic camera intrinsics.

Parity: ``kaolin/render/camera/intrinsics_ortho.py`` (reference).
"""

from enum import IntEnum

import jax.numpy as jnp

from kaolin_tpu.render.camera.intrinsics import (
    CameraIntrinsics, default_dtype, down_from_homogeneous,
    up_to_homogeneous)

__all__ = ['OrthographicIntrinsics']


class OrthoParamsDefEnum(IntEnum):
    """Column indices of the orthographic ``params`` tensor.

    Parity: ``kaolin/render/camera/intrinsics_ortho.py:26``.
    """
    fov_distance = 0


class OrthographicIntrinsics(CameraIntrinsics):
    """Orthographic intrinsics: single ``fov_distance`` zoom-scale param."""

    DEFAULT_NEAR = 1e-2
    DEFAULT_FAR = 1e2
    param_names = ('fov_distance',)

    @property
    def lens_type(self):
        return 'ortho'

    @classmethod
    def from_frustum(cls, width, height, fov_distance=1.0,
                     near=DEFAULT_NEAR, far=DEFAULT_FAR, num_cameras=1,
                     dtype=default_dtype):
        """Parity: ``intrinsics_ortho.py:73``."""
        params = cls._allocate_params(fov_distance, num_cameras=num_cameras,
                                      dtype=dtype)
        return cls(width, height, params, near, far)

    @property
    def fov_distance(self):
        return self._param_col('fov_distance')

    @fov_distance.setter
    def fov_distance(self, val):
        self._set_param_col('fov_distance', val)

    def orthographic_matrix(self, left, right, bottom, top, near, far):
        """(C, 4, 4) glOrtho-style NDC normalization matrix.

        Parity: ``intrinsics_ortho.py:102``.
        """
        fov = self.fov_distance
        zero = jnp.zeros_like(fov)
        one = jnp.ones_like(fov)
        tx = jnp.full_like(fov, -(right + left) / (right - left))
        ty = jnp.full_like(fov, -(top + bottom) / (top - bottom))
        tz = jnp.full_like(fov, -(far + near) / (far - near))
        W = right - left
        H = top - bottom
        D = jnp.full_like(fov, far - near)
        rows = [
            jnp.stack([2.0 / (fov * W), zero, zero, tx], axis=-1),
            jnp.stack([zero, 2.0 / (fov * H), zero, ty], axis=-1),
            jnp.stack([zero, zero, -2.0 / D, tz], axis=-1),
            jnp.stack([zero, zero, zero, one], axis=-1),
        ]
        return jnp.stack(rows, axis=1)

    def projection_matrix(self):
        """(C, 4, 4) OpenGL-compatible orthographic projection matrix."""
        top = 1.0
        bottom = -top
        right = 1.0 * self.width / self.height
        left = -right
        return self.orthographic_matrix(left, right, bottom, top,
                                        self.near, self.far)

    def transform(self, vectors):
        """Project to NDC coords.  Returns (C, B, 3)."""
        proj = self.projection_matrix()
        v = up_to_homogeneous(vectors)
        C = len(self)
        v = jnp.broadcast_to(v, (C,) + v.shape[-2:])
        out = jnp.einsum('cij,cbj->cbi', proj, v)
        return down_from_homogeneous(out)

    def project(self, vectors):
        proj = self.projection_matrix()
        v = up_to_homogeneous(vectors)
        C = len(self)
        v = jnp.broadcast_to(v, (C,) + v.shape[-2:])
        return jnp.einsum('cij,cbj->cbi', proj, v)

    def normalize_depth(self, depth):
        """Normalize depths to [0, 1] linearly within [near, far]."""
        if depth.ndim < 2:
            depth = jnp.broadcast_to(depth, (len(self),) + depth.shape)
        depth = jnp.clip(depth, min(self.near, self.far),
                         max(self.near, self.far))
        normalized = (depth - self.near) / (self.far - self.near)
        return jnp.clip(normalized, 0.0, 1.0)

    def zoom(self, amount):
        """Zoom by decreasing fov_distance.  Parity: ``intrinsics_ortho.py``."""
        self.fov_distance = jnp.clip(self.fov_distance - amount, 1e-4, None)
        return self
