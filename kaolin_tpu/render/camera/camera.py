"""The Camera: a pair of (CameraExtrinsics, CameraIntrinsics).

Parity: ``kaolin/render/camera/camera.py`` (reference).  Attribute access is
routed to the extrinsics / intrinsics components (reference :561-601);
construction is disambiguated from kwargs (reference ``from_args`` :282-387).
"""

from typing import Sequence

import jax
import jax.numpy as jnp

from kaolin_tpu.render.camera.extrinsics import CameraExtrinsics
from kaolin_tpu.render.camera.intrinsics import CameraIntrinsics, CameraFOV
from kaolin_tpu.render.camera.intrinsics_pinhole import PinholeIntrinsics
from kaolin_tpu.render.camera.intrinsics_ortho import OrthographicIntrinsics

__all__ = ['Camera', 'allclose']

_EXTRINSICS_ATTRS = {
    'R', 't', 'view_matrix', 'inv_view_matrix', 'cam_pos', 'cam_right',
    'cam_up', 'cam_forward', 'translate', 'rotate', 'move_right', 'move_up',
    'move_forward', 'change_coordinate_system', 'reset_coordinate_system',
    'basis_change_matrix', 'inv_transform_rays', 'switch_backend',
    'backend_name',
}
_INTRINSICS_ATTRS = {
    'width', 'height', 'near', 'far', 'aspect_ratio', 'projection_matrix',
    'viewport_matrix', 'ndc_matrix', 'perspective_matrix', 'focal_x',
    'focal_y', 'x0', 'y0', 'cx', 'cy', 'fov', 'fov_x', 'fov_y',
    'tan_half_fov', 'fov_distance', 'zoom', 'lens_type', 'normalize_depth',
    'set_ndc_range', 'ndc_min', 'ndc_max', 'clip_mask', 'project',
    'orthographic_matrix',
}


@jax.tree_util.register_pytree_node_class
class Camera:
    """Differentiable batched camera = extrinsics + intrinsics.

    Build with :meth:`from_args`, e.g.::

        Camera.from_args(eye=[0, 0, 3], at=[0, 0, 0], up=[0, 1, 0],
                         fov=math.radians(45), width=512, height=512)
    """

    def __init__(self, extrinsics: CameraExtrinsics,
                 intrinsics: CameraIntrinsics):
        if len(extrinsics) != len(intrinsics):
            raise ValueError(
                f"extrinsics ({len(extrinsics)}) and intrinsics "
                f"({len(intrinsics)}) must hold the same number of cameras")
        object.__setattr__(self, 'extrinsics', extrinsics)
        object.__setattr__(self, 'intrinsics', intrinsics)

    # -- pytree ------------------------------------------------------------
    def tree_flatten(self):
        return (self.extrinsics, self.intrinsics), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        object.__setattr__(obj, 'extrinsics', children[0])
        object.__setattr__(obj, 'intrinsics', children[1])
        return obj

    # -- construction ------------------------------------------------------
    @classmethod
    def from_args(cls, **kwargs):
        """Build a camera, inferring the extrinsics / intrinsics ctors from
        the given kwargs.

        Extrinsics (one group):
            * ``eye``, ``at``, ``up`` — lookat
            * ``view_matrix`` — direct matrix
            * ``cam_pos``, ``cam_dir`` — pose
        Intrinsics:
            * ``fov`` (radians) [``fov_direction``] — pinhole from fov
            * ``focal_x`` [``focal_y``, ``x0``, ``y0``] — pinhole from focal
            * ``fov_distance`` — orthographic
            plus ``width``, ``height`` and optional ``near``, ``far``,
            ``dtype``.

        Parity: ``kaolin/render/camera/camera.py:282``.
        """
        dtype = kwargs.pop('dtype', jnp.float32)
        backend = kwargs.pop('backend', None)
        requires_grad = kwargs.pop('requires_grad', False)
        # device accepted and ignored (JAX manages placement via shardings)
        kwargs.pop('device', None)

        if 'eye' in kwargs:
            extrinsics = CameraExtrinsics.from_lookat(
                eye=kwargs.pop('eye'), at=kwargs.pop('at'),
                up=kwargs.pop('up'), dtype=dtype,
                requires_grad=requires_grad, backend=backend)
        elif 'view_matrix' in kwargs:
            extrinsics = CameraExtrinsics.from_view_matrix(
                kwargs.pop('view_matrix'), dtype=dtype,
                requires_grad=requires_grad, backend=backend)
        elif 'cam_pos' in kwargs:
            extrinsics = CameraExtrinsics.from_camera_pose(
                cam_pos=kwargs.pop('cam_pos'), cam_dir=kwargs.pop('cam_dir'),
                dtype=dtype, requires_grad=requires_grad, backend=backend)
        else:
            raise ValueError(
                "Could not match extrinsics args: give (eye, at, up), "
                "view_matrix, or (cam_pos, cam_dir)")

        num_cameras = len(extrinsics)
        width = kwargs.pop('width')
        height = kwargs.pop('height')
        common = {}
        for k in ('near', 'far'):
            if k in kwargs:
                common[k] = kwargs.pop(k)
        if 'fov' in kwargs:
            intrinsics = PinholeIntrinsics.from_fov(
                width, height, kwargs.pop('fov'),
                kwargs.pop('fov_direction', CameraFOV.VERTICAL),
                x0=kwargs.pop('x0', 0.), y0=kwargs.pop('y0', 0.),
                num_cameras=num_cameras, dtype=dtype, **common)
        elif 'focal_x' in kwargs:
            intrinsics = PinholeIntrinsics.from_focal(
                width, height, kwargs.pop('focal_x'),
                kwargs.pop('focal_y', None),
                x0=kwargs.pop('x0', None), y0=kwargs.pop('y0', None),
                num_cameras=num_cameras, dtype=dtype, **common)
        else:
            intrinsics = OrthographicIntrinsics.from_frustum(
                width, height, kwargs.pop('fov_distance', 1.0),
                num_cameras=num_cameras, dtype=dtype, **common)
        if kwargs:
            raise ValueError(f"Unrecognized Camera.from_args kwargs: "
                             f"{sorted(kwargs)}")
        return cls(extrinsics, intrinsics)

    # -- attribute routing -------------------------------------------------
    def __getattr__(self, name):
        # only called when normal lookup fails
        extr = object.__getattribute__(self, 'extrinsics')
        intr = object.__getattribute__(self, 'intrinsics')
        if name in _EXTRINSICS_ATTRS or hasattr(type(extr), name):
            return getattr(extr, name)
        if name in _INTRINSICS_ATTRS or hasattr(intr, name):
            return getattr(intr, name)
        raise AttributeError(
            f"Camera has no attribute {name!r}")

    def __setattr__(self, name, value):
        if name in ('extrinsics', 'intrinsics'):
            object.__setattr__(self, name, value)
        elif name in _EXTRINSICS_ATTRS:
            setattr(self.extrinsics, name, value)
        elif name in _INTRINSICS_ATTRS:
            setattr(self.intrinsics, name, value)
        else:
            object.__setattr__(self, name, value)

    # -- core --------------------------------------------------------------
    def __len__(self):
        return len(self.extrinsics)

    @property
    def dtype(self):
        return self.extrinsics.dtype

    def transform(self, vectors):
        """Full transform: world -> camera -> NDC.

        Parity: ``kaolin/render/camera/camera.py:509``.
        """
        cam_space = self.extrinsics.transform(vectors)
        return self.intrinsics.transform(cam_space)

    def view_projection_matrix(self):
        """(C, 4, 4) ``projection @ view``.

        Parity: ``kaolin/render/camera/camera.py:532``.
        """
        return (self.intrinsics.projection_matrix() @
                self.extrinsics.view_matrix())

    def __getitem__(self, item):
        if isinstance(item, int):
            n = len(self)
            if item < -n or item >= n:
                raise IndexError(
                    f'camera index {item} out of range for batch of {n}')
        return Camera(self.extrinsics[item], self.intrinsics[item])

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    @classmethod
    def cat(cls, cameras: Sequence['Camera']):
        """Concatenate camera batches.  Parity: reference :547."""
        return cls(
            CameraExtrinsics.cat([c.extrinsics for c in cameras]),
            type(cameras[0].intrinsics).cat(
                [c.intrinsics for c in cameras]))

    def allclose(self, other, rtol=1e-5, atol=1e-8):
        return (self.extrinsics.allclose(other.extrinsics, rtol, atol) and
                self.intrinsics.allclose(other.intrinsics, rtol, atol))

    def parameters(self):
        return (self.extrinsics.params, self.intrinsics.params)

    def named_params(self):
        ep = self.extrinsics.named_params()
        ip = self.intrinsics.named_params()
        return [dict(**e, **i) for e, i in zip(ep, ip)]

    def __repr__(self):
        return (f"Camera of {len(self)} cameras of "
                f"{self.width}x{self.height}:\n"
                f"{self.extrinsics!r}\n{self.intrinsics!r}")

    # common ray generation helper (used by visualizers / raytracers)
    def generate_rays(self):
        """Generate per-pixel primary rays in world coords.

        Returns:
            (ray_orig, ray_dir): each ``(C, H*W, 3)``, rows in row-major
            pixel order (y outer, x inner, origin at top-left).
        """
        H, W = self.height, self.width
        xs = (jnp.arange(W, dtype=self.dtype) + 0.5) / W * 2. - 1.
        ys = 1. - (jnp.arange(H, dtype=self.dtype) + 0.5) / H * 2.
        grid_x, grid_y = jnp.meshgrid(xs, ys, indexing='xy')
        if isinstance(self.intrinsics, PinholeIntrinsics):
            tan_x = self.intrinsics.tan_half_fov(CameraFOV.HORIZONTAL)
            tan_y = self.intrinsics.tan_half_fov(CameraFOV.VERTICAL)
            dirs = jnp.stack([
                grid_x[None] * tan_x[:, None, None],
                grid_y[None] * tan_y[:, None, None],
                -jnp.ones((len(self), H, W), dtype=self.dtype)], axis=-1)
            orig = jnp.zeros_like(dirs)
        else:
            fov_d = self.intrinsics.fov_distance
            aspect = self.intrinsics.aspect_ratio
            orig = jnp.stack([
                grid_x[None] * fov_d[:, None, None] * aspect,
                grid_y[None] * fov_d[:, None, None],
                jnp.zeros((len(self), H, W), dtype=self.dtype)], axis=-1)
            dirs = jnp.concatenate([
                jnp.zeros_like(orig[..., :2]),
                -jnp.ones_like(orig[..., :1])], axis=-1)
        orig = orig.reshape(len(self), -1, 3)
        dirs = dirs.reshape(len(self), -1, 3)
        out_orig, out_dir = self.extrinsics.inv_transform_rays(orig, dirs)
        out_dir = out_dir / jnp.maximum(
            jnp.linalg.norm(out_dir, axis=-1, keepdims=True), 1e-12)
        return out_orig, out_dir


def allclose(input, other, rtol=1e-5, atol=1e-8):
    """Module-level allclose over Camera / extrinsics / intrinsics objects.

    Parity: ``kaolin/render/camera/camera.py:654``.
    """
    return input.allclose(other, rtol=rtol, atol=atol)
