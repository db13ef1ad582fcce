"""Voxelgrid metrics.

Parity: ``kaolin/metrics/voxelgrid.py`` (reference).
"""

import jax.numpy as jnp

__all__ = ['iou']


def iou(pred, gt):
    """Intersection-over-union of binary voxelgrids.

    Parity: ``kaolin/metrics/voxelgrid.py:19``.

    Example:
        >>> import jax.numpy as jnp
        >>> pred = jnp.zeros((1, 2, 2, 2)).at[0, 0].set(1.)
        >>> iou(pred, jnp.ones((1, 2, 2, 2))).tolist()
        [0.5]

    Args:
        pred, gt: ``(B, X, Y, Z)``.

    Returns:
        ``(B,)`` IoU values.
    """
    if pred.shape != gt.shape:
        raise ValueError(
            f"Expected predicted voxelgrids and ground truth voxelgrids to "
            f"have the same shape, but got {pred.shape} and {gt.shape}")
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    intersection = jnp.sum(pred & gt, axis=(1, 2, 3)).astype(jnp.float32)
    union = jnp.sum(pred | gt, axis=(1, 2, 3)).astype(jnp.float32)
    return intersection / union
