"""SDF -> voxelgrid conversion (MISE-style multiresolution extraction).

Parity: ``kaolin/ops/conversions/sdf.py`` (reference).  The reference uses
a Cython MISE octree (``kaolin/cython/ops/conversions/mise.pyx``); here the
multiresolution refinement runs in vectorized numpy: evaluate the coarse
grid, then per upsampling step only evaluate new grid points adjacent to
active (mixed-sign) cells, propagating signs elsewhere.
"""

import numpy as np
import jax.numpy as jnp

__all__ = ['sdf_to_voxelgrids']


def _eval_sdf(sdf_fn, pts_np, bbox_center, bbox_dim):
    coords = (pts_np - 0.5) * bbox_dim + bbox_center
    vals = sdf_fn(jnp.asarray(coords.astype(np.float32)))
    return np.asarray(vals)


def _unbatched_sdf_to_voxelgrid_native(sdf_fn, bbox_center, bbox_dim,
                                       init_res, upsampling_steps):
    """Drive the native C++ MISE octree (csrc/mise.cpp)."""
    from kaolin_tpu._native import Mise
    m = Mise(init_res, upsampling_steps)
    while True:
        pts = m.query()
        if pts.shape[0] == 0:
            if not m.refine():
                break
            continue
        vals = _eval_sdf(sdf_fn, pts / m.final_resolution, bbox_center,
                         bbox_dim)
        m.update((vals <= 0).astype(np.uint8))
    return m.to_dense().astype(np.float32)


def _unbatched_sdf_to_voxelgrid(sdf_fn, bbox_center, bbox_dim, init_res,
                                upsampling_steps):
    try:
        return _unbatched_sdf_to_voxelgrid_native(
            sdf_fn, bbox_center, bbox_dim, init_res, upsampling_steps)
    except Exception:
        pass
    final_res = init_res * (2 ** upsampling_steps)
    # evaluate coarse grid points (res+1 per side, normalized [0, 1])
    res = init_res
    lin = np.linspace(0., 1., res + 1)
    pts = np.stack(np.meshgrid(lin, lin, lin, indexing='ij'),
                   axis=-1).reshape(-1, 3)
    occ = (_eval_sdf(sdf_fn, pts, bbox_center, bbox_dim) <= 0).reshape(
        res + 1, res + 1, res + 1)

    for _ in range(upsampling_steps):
        new_res = res * 2
        new_occ = np.zeros((new_res + 1,) * 3, dtype=bool)
        # carry over sign of coarse grid points (even indices)
        new_occ[::2, ::2, ::2] = occ
        # active cells: mixed-sign corners
        c = occ
        corners = np.stack([
            c[:-1, :-1, :-1], c[:-1, :-1, 1:], c[:-1, 1:, :-1],
            c[:-1, 1:, 1:], c[1:, :-1, :-1], c[1:, :-1, 1:],
            c[1:, 1:, :-1], c[1:, 1:, 1:]], axis=0)
        ssum = corners.sum(0)
        active = (ssum > 0) & (ssum < 8)
        act_idx = np.stack(np.nonzero(active), axis=-1)  # coarse cell ids

        # fill non-active fine points by nearest coarse sign
        # (odd-index points take the sign of the floor coarse point)
        fill = np.repeat(np.repeat(np.repeat(
            occ[:-1, :-1, :-1], 2, 0), 2, 1), 2, 2)
        new_occ[:new_res, :new_res, :new_res] = fill
        new_occ[::2, ::2, ::2] = occ

        if act_idx.shape[0] > 0:
            # evaluate the 27 fine grid points of each active cell
            offs = np.stack(np.meshgrid(*[np.arange(3)] * 3,
                                        indexing='ij'),
                            axis=-1).reshape(-1, 3)
            fine_pts = (act_idx[:, None] * 2 + offs[None]).reshape(-1, 3)
            fine_pts = np.unique(fine_pts, axis=0)
            vals = _eval_sdf(sdf_fn, fine_pts / new_res, bbox_center,
                             bbox_dim)
            new_occ[fine_pts[:, 0], fine_pts[:, 1], fine_pts[:, 2]] = \
                vals <= 0
        occ = new_occ
        res = new_res
    return occ.astype(np.float32)


def sdf_to_voxelgrids(sdf, bbox_center=0., bbox_dim=1., init_res=32,
                      upsampling_steps=0):
    """Convert SDF callables to binary voxelgrids of resolution
    ``init_res * 2**upsampling_steps + 1``.

    Parity: ``kaolin/ops/conversions/sdf.py:46``.

    Args:
        sdf: list of callables mapping (N, 3) coords -> (N,) sdf values.
        bbox_center / bbox_dim: bounding box of the surface.
        init_res: initial grid resolution.
        upsampling_steps: number of refinement doublings.

    Returns:
        ``(B, R, R, R)`` grids with R = init_res * 2**steps + 1;
        value 1 where sdf <= 0.
    """
    if not isinstance(sdf, list):
        raise TypeError(f"Expected sdf to be list but got {type(sdf)}.")
    for i, s in enumerate(sdf):
        if not callable(s):
            raise TypeError(f"Expected sdf[{i}] to be callable.")
    out = [_unbatched_sdf_to_voxelgrid(s, bbox_center, bbox_dim, init_res,
                                       upsampling_steps) for s in sdf]
    return jnp.asarray(np.stack(out))
