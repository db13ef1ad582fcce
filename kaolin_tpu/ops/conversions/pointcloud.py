"""Pointcloud conversions: voxelgrids and SPC.

Parity: ``kaolin/ops/conversions/pointcloud.py`` (reference).
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['pointclouds_to_voxelgrids', 'unbatched_pointcloud_to_spc']


def _base_points_to_voxelgrids(points, resolution):
    """Points in [0, 1] -> (B, r, r, r) occupancy; index = round(p*(r-1)).

    Parity: ``kaolin/ops/conversions/pointcloud.py:22``.
    """
    B = points.shape[0]
    idx = jnp.round(points * (resolution - 1)).astype(jnp.int32)
    in_range = jnp.all((idx >= 0) & (idx <= resolution - 1), axis=-1)
    idx = jnp.clip(idx, 0, resolution - 1)
    vg = jnp.zeros((B, resolution, resolution, resolution),
                   dtype=points.dtype)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], idx.shape[:2])
    vals = in_range.astype(points.dtype)
    vg = vg.at[b_idx, idx[..., 0], idx[..., 1], idx[..., 2]].max(vals)
    return vg


def pointclouds_to_voxelgrids(pointclouds, resolution, origin=None,
                              scale=None, return_sparse=False):
    """Voxelize pointclouds.

    Parity: ``kaolin/ops/conversions/pointcloud.py:77`` (``return_sparse``
    is accepted but returns dense — JAX has no COO voxel type).
    """
    if not isinstance(resolution, int):
        raise TypeError(f"Expected resolution to be int "
                        f"but got {type(resolution)}.")
    if origin is None:
        origin = jnp.min(pointclouds, axis=1)
    if scale is None:
        max_val = jnp.max(pointclouds, axis=1)
        scale = jnp.max(max_val - origin, axis=1)
    pointclouds = (pointclouds - origin[:, None]) / scale.reshape(-1, 1, 1)
    return _base_points_to_voxelgrids(pointclouds, resolution)


def unbatched_pointcloud_to_spc(pointcloud, level, features=None):
    """Convert a pointcloud in [-1, 1] to a Structured Point Cloud.

    Features of points landing in the same voxel are averaged
    (reference ``conversions/pointcloud.py:143``).

    Returns:
        :class:`kaolin_tpu.rep.Spc` (with ``features`` set if given).
    """
    from kaolin_tpu.ops.spc.points import (quantize_points,
                                           points_to_morton,
                                           unbatched_points_to_octree)
    from kaolin_tpu.rep.spc import Spc
    qpts = np.asarray(quantize_points(jnp.asarray(pointcloud), level))
    morton = points_to_morton(qpts)
    uniq, inv = np.unique(morton, return_inverse=True)
    octree = unbatched_points_to_octree(qpts, level)
    lengths = np.array([len(octree)], dtype=np.int32)
    out_features = None
    if features is not None:
        feats = np.asarray(features)
        sums = np.zeros((uniq.shape[0], feats.shape[-1]), feats.dtype)
        counts = np.zeros((uniq.shape[0],), np.int64)
        np.add.at(sums, inv, feats)
        np.add.at(counts, inv, 1)
        out_features = jnp.asarray(sums / counts[:, None])
    return Spc(octrees=octree, lengths=lengths, features=out_features)
