"""Reductions over packed layouts.

Parity: ``kaolin/ops/reduction.py`` (reference).  The CUDA block/lane
reduction (``packed_simple_sum_cuda.cu:36``) becomes a single
``jax.ops.segment_sum`` — race-free by construction, no atomics.
"""

import numpy as np
import jax
import jax.numpy as jnp

from kaolin_tpu.ops.batch import get_first_idx

__all__ = ['packed_simple_sum']


def packed_simple_sum(tensor, numel_per_tensor):
    """Sum all elements of each sub-tensor in a packed tensor.

    Parity: ``kaolin/ops/reduction.py:42``.

    Args:
        tensor: packed tensor ``(total_rows, last_dim)``.
        numel_per_tensor: (B,) host array of rows per sub-tensor.

    Returns:
        (B,) array of per-sub-tensor sums.
    """
    numel_per_tensor = np.asarray(numel_per_tensor, dtype=np.int64)
    num_segments = numel_per_tensor.shape[0]
    seg_ids = jnp.asarray(
        np.repeat(np.arange(num_segments), numel_per_tensor))
    row_sums = jnp.sum(tensor, axis=-1)
    return jax.ops.segment_sum(row_sums, seg_ids, num_segments=num_segments)
