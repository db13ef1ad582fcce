"""Parameter backends for CameraExtrinsics.

Parity: ``kaolin/render/camera/extrinsics_backends.py`` (reference).
Backends are pure param<->matrix conversion functions (JAX-friendly — the
class machinery of the reference collapses into a registry of function
pairs).

* ``matrix_se3``: params = flattened 4x4 view matrix (16,).  Identity
  mapping; fastest, but unconstrained under optimization.
* ``matrix_6dof_rotation``: params = (r1 r2 r3 u1 u2 u3 tx ty tz) (9,);
  rotation recovered with one Gram-Schmidt step (Zhou et al. 2019), so
  gradient steps stay in SE(3).  Reference: ``extrinsics_backends.py:205``.
"""

from enum import IntEnum

import jax.numpy as jnp

_REGISTRY = {}

# parity alias: the reference exposes the backend base class as
# ``ExtrinsicsRep`` (``extrinsics_backends.py:40``)
class ExtrinsicsParamsDefEnum(IntEnum):
    """Semantic blocks of the extrinsics parameters (R then t).

    Parity: ``kaolin/render/camera/extrinsics_backends.py:34``.
    """
    R = 0
    t = 1


class ExtrinsicsRep:
    """Base marker class for extrinsics parameter backends."""
    pass



def register_backend(name):
    def deco(cls):
        _REGISTRY[name] = cls
        cls.name = name
        return cls
    return deco


def get_backend(name):
    if name not in _REGISTRY:
        raise ValueError(
            f"Unknown extrinsics backend {name!r}; available: "
            f"{sorted(_REGISTRY)}")
    return _REGISTRY[name]


def available_backends():
    return sorted(_REGISTRY)


@register_backend('matrix_se3')
class MatrixSE3Rep:
    """Flattened 4x4 view matrix; identity representation."""
    num_params = 16

    @staticmethod
    def to_mat(params):
        return params.reshape(-1, 4, 4)

    @staticmethod
    def from_mat(mat):
        return mat.reshape(-1, 16)

    # param indices of R and t components within the param vector
    R_idx = [0, 1, 2, 4, 5, 6, 8, 9, 10]
    t_idx = [3, 7, 11]


@register_backend('matrix_6dof_rotation')
class Matrix6DofRotationRep:
    """6-DoF rotation (first two view-matrix rows) + 3-DoF translation."""
    num_params = 9

    @staticmethod
    def to_mat(params):
        C = params.shape[0]
        a1 = params[:, 0:3]
        a2 = params[:, 3:6]
        translation = params[:, 6:9]
        b1 = a1 / jnp.maximum(
            jnp.linalg.norm(a1, axis=1, keepdims=True), 1e-12)
        b1_dot_a2 = jnp.sum(b1 * a2, axis=1, keepdims=True)
        b2u = a2 - b1_dot_a2 * b1
        b2 = b2u / jnp.maximum(
            jnp.linalg.norm(b2u, axis=1, keepdims=True), 1e-12)
        b3 = jnp.cross(b1, b2)
        rotation = jnp.stack([b1, b2, b3], axis=1)  # (C, 3, 3) rows
        top = jnp.concatenate([rotation, translation[..., None]], axis=2)
        bottom = jnp.broadcast_to(
            jnp.array([[0., 0., 0., 1.]], dtype=params.dtype), (C, 1, 4))
        return jnp.concatenate([top, bottom], axis=1)

    @staticmethod
    def from_mat(mat):
        C = mat.shape[0]
        rotation = mat[:, :2, :3].reshape(C, 6)
        translation = mat[:, :3, 3]
        return jnp.concatenate([rotation, translation], axis=1)

    R_idx = list(range(0, 6))
    t_idx = list(range(6, 9))
