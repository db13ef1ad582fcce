"""Pointcloud ops.

Parity: ``kaolin/ops/pointcloud.py`` (reference).
"""

import jax.numpy as jnp

__all__ = ['center_points']


def center_points(points, normalize: bool = False, eps: float = 1e-6):
    """Center a batch of pointclouds at the mid-point of their AABB.

    If ``normalize``, also scale isotropically so points fit in [-0.5, 0.5].

    Parity: ``kaolin/ops/pointcloud.py:20``.

    Args:
        points: ``(B, N, 3)`` pointclouds.
        normalize: scale to the unit cube after centering.
        eps: minimum extent used to avoid division by zero.

    Returns:
        ``(B, N, 3)`` centered (and optionally normalized) points.
    """
    if points.ndim != 3:
        raise ValueError(f"points must be (B, N, 3), got {points.shape}")
    vmax = jnp.max(points, axis=1, keepdims=True)
    vmin = jnp.min(points, axis=1, keepdims=True)
    out = points - (vmax + vmin) / 2.
    if normalize:
        denom = jnp.maximum(
            jnp.max(vmax - vmin, axis=-1, keepdims=True), eps)
        out = out / denom
    return out
