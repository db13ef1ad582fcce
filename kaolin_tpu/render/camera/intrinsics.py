"""Camera intrinsics base class and homogeneous-coordinate helpers.

Parity: ``kaolin/render/camera/intrinsics.py`` (reference).
"""

from enum import IntEnum
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['CameraFOV', 'CameraIntrinsics', 'up_to_homogeneous',
           'down_from_homogeneous']

default_dtype = jnp.float32


def up_to_homogeneous(vectors):
    """Append a homogeneous w=1 coordinate if the last dim is 3.

    Parity: ``kaolin/render/camera/intrinsics.py:45``.
    """
    if vectors.shape[-1] == 4:
        return vectors
    ones = jnp.ones(vectors.shape[:-1] + (1,), dtype=vectors.dtype)
    return jnp.concatenate([vectors, ones], axis=-1)


def down_from_homogeneous(homogeneous_vectors):
    """Perspective division: divide by w and drop it.

    Parity: ``kaolin/render/camera/intrinsics.py:61``.
    """
    return homogeneous_vectors[..., :-1] / homogeneous_vectors[..., -1:]


class CameraFOV(IntEnum):
    """Camera field-of-view direction."""
    HORIZONTAL = 0
    VERTICAL = 1
    DIAGONAL = 2


class CameraIntrinsics:
    """Base class for lens intrinsics (pinhole / orthographic).

    Subclasses are pytree-registered containers: ``params`` (C, P) is the
    traced leaf; width/height/near/far/ndc range are static aux fields.

    Parity: ``kaolin/render/camera/intrinsics.py:85``.
    """

    param_names = ()  # subclass: ordered names of columns of `params`

    def __init__(self, width, height, params, near=1e-2, far=1e2):
        self.width = int(width)
        self.height = int(height)
        self.params = jnp.asarray(params)
        self.near = float(near)
        self.far = float(far)
        self.ndc_min = -1.
        self.ndc_max = 1.

    # -- pytree protocol (shared by subclasses via __init_subclass__) ------
    def tree_flatten(self):
        return (self.params,), (self.width, self.height, self.near, self.far,
                                self.ndc_min, self.ndc_max)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.width, obj.height, obj.near, obj.far,
         obj.ndc_min, obj.ndc_max) = aux
        obj.params = children[0]
        return obj

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_node_class(cls)

    # -- basic accessors ---------------------------------------------------
    def __len__(self):
        return self.params.shape[0]

    @property
    def aspect_ratio(self):
        return self.width / self.height

    @property
    def dtype(self):
        return self.params.dtype

    def parameters(self):
        return self.params

    @classmethod
    def _allocate_params(cls, *args, num_cameras=1, dtype=default_dtype):
        row = jnp.array(args, dtype=dtype)
        return jnp.tile(row[None], (num_cameras, 1))

    def _param_col(self, name):
        return self.params[:, self.param_names.index(name)]

    def _set_param_col(self, name, val):
        idx = self.param_names.index(name)
        val = jnp.broadcast_to(jnp.asarray(val, dtype=self.dtype),
                               (len(self),))
        self.params = self.params.at[:, idx].set(val)

    def named_params(self):
        out = []
        arr = np.asarray(self.params)
        for row in arr:
            out.append(dict(zip(self.param_names, row.tolist())))
        return out

    # -- NDC / viewport ----------------------------------------------------
    def set_ndc_range(self, ndc_min, ndc_max):
        """Set the NDC depth range convention (default [-1, 1]).

        Parity: ``kaolin/render/camera/intrinsics.py:471``.
        """
        self.ndc_min = ndc_min
        self.ndc_max = ndc_max
        return self

    def viewport_matrix(self, vl=0, vr=None, vb=0, vt=None,
                        min_depth=0.0, max_depth=1.0):
        """Matrix mapping NDC [-1, 1] coords to screen (viewport) coords.

        Parity: ``kaolin/render/camera/intrinsics.py:139``.

        Returns:
            (1, 4, 4) matrix.
        """
        if vr is None:
            vr = self.width
        if vt is None:
            vt = self.height
        sx = (vr - vl) / 2.
        sy = (vt - vb) / 2.
        sz = (max_depth - min_depth) / 2.
        tx = (vr + vl) / 2.
        ty = (vt + vb) / 2.
        tz = (max_depth + min_depth) / 2.
        mat = jnp.array([[sx, 0., 0., tx],
                         [0., sy, 0., ty],
                         [0., 0., sz, tz],
                         [0., 0., 0., 1.]], dtype=self.dtype)
        return mat[None]

    def clip_mask(self, depth):
        """Boolean mask of depths within the [near, far] frustum range.

        Parity: ``kaolin/render/camera/intrinsics.py:390``.
        """
        return (depth <= -self.near) & (depth >= -self.far)

    # -- transforms (abstract) ---------------------------------------------
    def projection_matrix(self):
        raise NotImplementedError

    def transform(self, vectors):
        raise NotImplementedError

    def zoom(self, amount):
        raise NotImplementedError

    @property
    def lens_type(self):
        raise NotImplementedError

    # -- misc --------------------------------------------------------------
    def gradient_mask(self, *args):
        """Boolean mask over params selecting named columns.

        Parity: ``kaolin/render/camera/intrinsics.py:359``.
        """
        mask = np.zeros(len(self.param_names), dtype=bool)
        for a in args:
            mask[self.param_names.index(a)] = True
        return jnp.broadcast_to(jnp.asarray(mask), self.params.shape)

    def __getitem__(self, item):
        if isinstance(item, int):
            item = slice(item, item + 1)
        obj = self.tree_unflatten(self.tree_flatten()[1],
                                  (self.params[item],))
        return obj

    @classmethod
    def cat(cls, cameras: Sequence['CameraIntrinsics']):
        """Concatenate intrinsics batches.  Reference :453."""
        first = cameras[0]
        params = jnp.concatenate([c.params for c in cameras], axis=0)
        return first.tree_unflatten(first.tree_flatten()[1], (params,))

    def allclose(self, other, rtol=1e-5, atol=1e-8):
        return (type(self) is type(other) and
                self.params.shape == other.params.shape and
                (self.width, self.height, self.near, self.far) ==
                (other.width, other.height, other.near, other.far) and
                bool(jnp.allclose(self.params, other.params,
                                  rtol=rtol, atol=atol)))

    def __repr__(self):
        return (f"{type(self).__name__} of {len(self)} cameras of "
                f"{self.width}x{self.height}.\n{self.params}")
