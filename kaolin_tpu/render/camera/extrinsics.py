"""Differentiable camera extrinsics (SE(3) world→camera transform).

Parity: ``kaolin/render/camera/extrinsics.py`` (reference).

The view matrix is column-major convention::

    [ R | t ]     world2cam;  cam2world = [ R^T | -R^T t ]
    [ 0 | 1 ]

A pytree-registered container: ``params`` is the single traced leaf; the
backend name and base-change matrix are static aux data.  Methods that
mutate in the reference (translate/rotate/...) mutate ``self.params``
eagerly *and* return ``self`` so both imperative and functional styles work.
"""

from typing import Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from kaolin_tpu.render.camera import extrinsics_backends as _backends

__all__ = ['CameraExtrinsics']

default_dtype = jnp.float32


@jax.tree_util.register_pytree_node_class
class CameraExtrinsics:
    """Holds the extrinsics parameters of a batch of cameras.

    Construct via :meth:`from_lookat`, :meth:`from_camera_pose` or
    :meth:`from_view_matrix`.
    """

    def __init__(self, params, backend_name='matrix_se3',
                 base_change_matrix=None):
        self.params = jnp.asarray(params)
        self.backend_name = backend_name
        if base_change_matrix is None:
            base_change_matrix = np.eye(3, dtype=np.float32)
        self._base_change_matrix = np.asarray(base_change_matrix)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.params,), (self.backend_name,
                                self._base_change_matrix.tobytes(),
                                self._base_change_matrix.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        backend_name, bcm_bytes, bcm_shape = aux
        bcm = np.frombuffer(bcm_bytes, dtype=np.float32).reshape(bcm_shape)
        obj = cls.__new__(cls)
        obj.params = children[0]
        obj.backend_name = backend_name
        obj._base_change_matrix = bcm
        return obj

    # -- constructors ------------------------------------------------------
    @classmethod
    def _from_mat(cls, mat, backend=None, requires_grad=False):
        if backend is None:
            backend = ('matrix_6dof_rotation' if requires_grad
                       else 'matrix_se3')
        b = _backends.get_backend(backend)
        return cls(b.from_mat(jnp.asarray(mat)), backend)

    @classmethod
    def from_view_matrix(cls, view_matrix, dtype=default_dtype,
                         requires_grad=False, backend=None):
        """Build from a (C, 4, 4) column-major world2cam matrix.

        Parity: ``kaolin/render/camera/extrinsics.py:412``.
        """
        mat = jnp.asarray(view_matrix, dtype=dtype)
        if mat.ndim == 2:
            mat = mat[None]
        return cls._from_mat(mat, backend, requires_grad)

    @classmethod
    def from_camera_pose(cls, cam_pos, cam_dir, dtype=default_dtype,
                         requires_grad=False, backend=None):
        """Build from camera position and 3x3 orientation in world coords.

        Parity: ``kaolin/render/camera/extrinsics.py:272``.
        """
        cam_pos = jnp.asarray(cam_pos, dtype=dtype)
        cam_dir = jnp.asarray(cam_dir, dtype=dtype)
        if cam_dir.ndim == 2:
            cam_dir = cam_dir[None]
        if cam_pos.ndim == 1:
            cam_pos = cam_pos[None]
        if cam_pos.shape[-1] != 1:
            cam_pos = cam_pos[..., None]  # (C, 3, 1)
        world_rotation = jnp.swapaxes(cam_dir, -1, -2)
        world_translation = -world_rotation @ cam_pos
        return cls._from_rt(world_rotation, world_translation, backend,
                            requires_grad)

    @classmethod
    def _from_rt(cls, rotation, translation, backend=None,
                 requires_grad=False):
        C = rotation.shape[0]
        top = jnp.concatenate([rotation, translation], axis=2)
        bottom = jnp.broadcast_to(
            jnp.array([[0., 0., 0., 1.]], dtype=rotation.dtype), (C, 1, 4))
        mat = jnp.concatenate([top, bottom], axis=1)
        return cls._from_mat(mat, backend, requires_grad)

    @classmethod
    def from_lookat(cls, eye, at, up, dtype=default_dtype,
                    requires_grad=False, backend=None):
        """Build from eye/at/up (glm-style lookat, right handed).

        Parity: ``kaolin/render/camera/extrinsics.py:324``.
        """
        eye = jnp.atleast_2d(jnp.asarray(eye, dtype=dtype).squeeze())
        at = jnp.atleast_2d(jnp.asarray(at, dtype=dtype).squeeze())
        up = jnp.atleast_2d(jnp.asarray(up, dtype=dtype).squeeze())

        def normalize(v):
            return v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

        backward = normalize(at - eye)
        right = normalize(jnp.cross(backward, up))
        up_ortho = jnp.cross(right, backward)
        world_rotation = jnp.stack((right, up_ortho, -backward), axis=1)
        world_translation = -world_rotation @ eye[..., None]
        return cls._from_rt(world_rotation, world_translation, backend,
                            requires_grad)

    # -- core accessors ----------------------------------------------------
    def __len__(self):
        return self.params.shape[0]

    @property
    def backend(self):
        return _backends.get_backend(self.backend_name)

    @property
    def dtype(self):
        return self.params.dtype

    @property
    def requires_grad(self):
        # JAX has no per-tensor requires_grad; kept for API parity.
        return self.backend_name == 'matrix_6dof_rotation'

    def view_matrix(self):
        """(C, 4, 4) world2cam matrix.  Reference ``extrinsics.py:688``."""
        return self.backend.to_mat(self.params)

    def inv_view_matrix(self):
        """(C, 4, 4) cam2world matrix.  Reference ``extrinsics.py:735``."""
        mat = self.view_matrix()
        R = mat[:, :3, :3]
        t = mat[:, :3, 3:]
        Rt = jnp.swapaxes(R, 1, 2)
        top = jnp.concatenate([Rt, -Rt @ t], axis=2)
        bottom = jnp.broadcast_to(
            jnp.array([[0., 0., 0., 1.]], dtype=mat.dtype),
            (mat.shape[0], 1, 4))
        return jnp.concatenate([top, bottom], axis=1)

    @property
    def R(self):
        """(C, 3, 3) rotation component of the view matrix."""
        return self.view_matrix()[:, :3, :3]

    @R.setter
    def R(self, val):
        mat = self.view_matrix()
        mat = mat.at[:, :3, :3].set(val)
        self.update(mat)

    @property
    def t(self):
        """(C, 3, 1) translation component of the view matrix."""
        return self.view_matrix()[:, :3, 3:]

    @t.setter
    def t(self, val):
        val = jnp.asarray(val)
        if val.shape[-1] != 1:
            val = val[..., None]
        mat = self.view_matrix()
        mat = mat.at[:, :3, 3:].set(val)
        self.update(mat)

    def update(self, mat):
        """Replace params from a (C, 4, 4) view matrix (in place)."""
        self.params = self.backend.from_mat(mat)
        return self

    # -- transforms --------------------------------------------------------
    def transform(self, vectors):
        """World → camera: ``R @ v + t``.

        Args:
            vectors: ``(B, 3)`` or ``(C, B, 3)``.

        Returns:
            ``(C, B, 3)``.  Reference ``extrinsics.py:627``.
        """
        C = len(self)
        v = jnp.broadcast_to(vectors, (C,) + vectors.shape[-2:])
        R = self.R  # (C, 3, 3)
        t = self.t  # (C, 3, 1)
        return jnp.einsum('cij,cbj->cbi', R, v) + t[:, None, :, 0]

    def inv_transform_rays(self, ray_orig, ray_dir):
        """Camera → world for ray origins and directions.

        Reference ``extrinsics.py:653``.
        """
        C = len(self)
        o = jnp.broadcast_to(ray_orig, (C,) + ray_orig.shape[-2:])
        d = jnp.broadcast_to(ray_dir, (C,) + ray_dir.shape[-2:])
        R = self.R
        t = self.t
        Rt = jnp.swapaxes(R, 1, 2)
        out_d = jnp.einsum('cij,cbj->cbi', Rt, d)
        out_o = jnp.einsum('cij,cbj->cbi', Rt, o - t[:, None, :, 0])
        return out_o, out_d

    # -- coordinate system -------------------------------------------------
    def change_coordinate_system(self, basis_change):
        """Apply a 3x3 permutation/reflection change of world basis.

        Reference ``extrinsics.py:477``: ``R <- R @ P^T``.
        """
        P = np.asarray(basis_change, dtype=np.float32)
        self._base_change_matrix = self._base_change_matrix @ P
        self.R = self.R @ jnp.asarray(P.T, dtype=self.dtype)[None]
        return self

    def reset_coordinate_system(self):
        """Revert all accumulated basis changes.  Reference :539."""
        self.change_coordinate_system(self._base_change_matrix.T)
        self._base_change_matrix = np.eye(3, dtype=np.float32)
        return self

    @property
    def basis_change_matrix(self):
        return jnp.asarray(self._base_change_matrix)

    # -- interactive ops ---------------------------------------------------
    def translate(self, t):
        """Translate the camera in world coords (orientation unchanged).

        Reference ``extrinsics.py:784``: ``t <- t - R @ delta``.
        """
        t = jnp.asarray(t, dtype=self.dtype)
        if t.shape[-1] != 1:
            t = t[..., None]
        self.t = self.t - self.R @ t
        return self

    def rotate(self, yaw=None, pitch=None, roll=None):
        """In-place yaw/pitch/roll rotation, applied in camera space.

        Reference ``extrinsics.py:802``.
        """
        C = len(self)
        dtype = self.dtype
        rotation_mat = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (C, 4, 4))

        def as_arr(x):
            x = jnp.asarray(x, dtype=dtype)
            return jnp.broadcast_to(jnp.atleast_1d(x), (C,))

        if yaw is not None:
            a = as_arr(yaw)
            m = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (C, 4, 4))
            m = m.at[:, 0, 0].set(jnp.cos(a)).at[:, 0, 2].set(-jnp.sin(a)) \
                 .at[:, 2, 0].set(jnp.sin(a)).at[:, 2, 2].set(jnp.cos(a))
            rotation_mat = m @ rotation_mat
        if pitch is not None:
            a = as_arr(pitch)
            m = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (C, 4, 4))
            m = m.at[:, 1, 1].set(jnp.cos(a)).at[:, 1, 2].set(jnp.sin(a)) \
                 .at[:, 2, 1].set(-jnp.sin(a)).at[:, 2, 2].set(jnp.cos(a))
            rotation_mat = m @ rotation_mat
        if roll is not None:
            a = as_arr(roll)
            m = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (C, 4, 4))
            m = m.at[:, 0, 0].set(jnp.cos(a)).at[:, 0, 1].set(-jnp.sin(a)) \
                 .at[:, 1, 0].set(jnp.sin(a)).at[:, 1, 1].set(jnp.cos(a))
            rotation_mat = m @ rotation_mat
        self.update(rotation_mat @ self.view_matrix())
        return self

    def _world_axis(self, i):
        col = jnp.zeros_like(self.t)
        return col.at[:, i].set(1.)

    def move_right(self, amount):
        self.t = self.t - self._world_axis(0) * amount
        return self

    def move_up(self, amount):
        self.t = self.t - self._world_axis(1) * amount
        return self

    def move_forward(self, amount):
        self.t = self.t - self._world_axis(2) * amount
        return self

    def cam_pos(self):
        """(C, 3, 1) camera position in world coords: ``-R^T t``."""
        return -jnp.swapaxes(self.R, 1, 2) @ self.t

    def cam_right(self):
        return jnp.swapaxes(self.R, 1, 2) @ self._world_axis(0)

    def cam_up(self):
        return jnp.swapaxes(self.R, 1, 2) @ self._world_axis(1)

    def cam_forward(self):
        return jnp.swapaxes(self.R, 1, 2) @ self._world_axis(2)

    # -- misc --------------------------------------------------------------
    def parameters(self):
        return self.params

    def switch_backend(self, backend_name):
        """Return a copy using another param backend.  Reference :176."""
        mat = self.view_matrix()
        b = _backends.get_backend(backend_name)
        out = CameraExtrinsics(b.from_mat(mat), backend_name,
                               self._base_change_matrix)
        return out

    def gradient_mask(self, *args):
        """Boolean mask over ``params`` selecting 'R' and/or 't' subsets.

        Reference ``extrinsics.py:1094``.
        """
        mask = np.zeros(self.params.shape[-1], dtype=bool)
        for a in args:
            if a == 'R':
                mask[self.backend.R_idx] = True
            elif a == 't':
                mask[self.backend.t_idx] = True
            else:
                raise ValueError(f"unknown component {a!r}")
        return jnp.broadcast_to(jnp.asarray(mask), self.params.shape)

    def __getitem__(self, item):
        if isinstance(item, int):
            item = slice(item, item + 1)
        return CameraExtrinsics(self.params[item], self.backend_name,
                                self._base_change_matrix)

    @classmethod
    def cat(cls, cameras: Sequence['CameraExtrinsics']):
        """Concatenate multiple extrinsics into one batch.  Reference :1162."""
        mats = jnp.concatenate([c.view_matrix() for c in cameras], axis=0)
        first = cameras[0]
        b = first.backend
        return cls(b.from_mat(mats), first.backend_name,
                   first._base_change_matrix)

    def allclose(self, other, rtol=1e-5, atol=1e-8):
        return (self.params.shape == other.params.shape and
                bool(jnp.allclose(self.view_matrix(), other.view_matrix(),
                                  rtol=rtol, atol=atol)))

    def named_params(self):
        """List of dicts of named params per camera.  Reference :1186."""
        out = []
        mats = np.asarray(self.view_matrix())
        for m in mats:
            out.append({'R': m[:3, :3], 't': m[:3, 3]})
        return out

    def __repr__(self):
        return (f"CameraExtrinsics of {len(self)} cameras, backend: "
                f"{self.backend_name}.\n{self.view_matrix()}")
