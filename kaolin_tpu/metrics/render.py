"""Rendering losses.

Parity: ``kaolin/metrics/render.py`` (reference).
"""

import jax.numpy as jnp

__all__ = ['mask_iou']


def mask_iou(lhs_mask, rhs_mask):
    """IoU silhouette loss of two soft masks: ``1 - mean(IoU)``.

    Parity: ``kaolin/metrics/render.py:18``.

    Args:
        lhs_mask, rhs_mask: ``(B, H, W)``.

    Returns:
        scalar loss.
    """
    batch_size = lhs_mask.shape[0]
    assert rhs_mask.shape == lhs_mask.shape
    sil_mul = lhs_mask * rhs_mask
    sil_add = lhs_mask + rhs_mask
    iou_up = jnp.sum(sil_mul.reshape(batch_size, -1), axis=1)
    iou_down = jnp.sum((sil_add - sil_mul).reshape(batch_size, -1), axis=1)
    iou_neg = iou_up / (iou_down + 1e-10)
    return 1.0 - jnp.mean(iou_neg)
