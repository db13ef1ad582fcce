"""Parity tests: raster (coherent-beam) engine vs the BFS traversal.

The raster engine must return exactly the hit set of
``unbatched_raytrace`` (same voxels, same depths) for any ray set whose
tiles don't saturate — verified here on random octrees with camera-style
ray grids, axis-aligned rays, rays starting inside the volume, and
degenerate (zero-component) directions.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops import spc as spc_ops
from kaolin_tpu.render import spc as spc_render
from kaolin_tpu.render.spc.raster import (
    unbatched_raytrace_coherent, hits_to_nuggets)

from tests.test_spc_raytrace import build


def camera_grid(side, z=-2.5, spread=0.1, extent=0.9):
    ys, xs = np.meshgrid(np.linspace(-extent, extent, side),
                         np.linspace(-extent, extent, side), indexing='ij')
    o = np.stack([xs.ravel(), ys.ravel(), np.full(side * side, z)], -1)
    d = np.stack([xs.ravel() * spread, ys.ravel() * spread,
                  np.ones(side * side)], -1)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def nugget_table(ridx, pidx, depths):
    """Set-comparable (n, 4) float table sorted by (ray, t_near, pidx)."""
    arr = np.stack([np.asarray(ridx, np.float64),
                    np.asarray(depths)[:, 0].astype(np.float64),
                    np.asarray(pidx, np.float64),
                    np.asarray(depths)[:, 1].astype(np.float64)], -1)
    order = np.lexsort((arr[:, 2], arr[:, 1], arr[:, 0]))
    return arr[order]


def assert_parity(octree, pyramid, exsum, ph, o, d, level, **kw):
    """Hit-set parity vs the BFS.  The raster engine tests leaves
    directly while the BFS requires every ANCESTOR slab interval to be
    non-empty; when a ray grazes a voxel edge the ancestor test can
    fp-round to empty, so the raster may keep epsilon-span hits the BFS
    drops (measured: +41 of 806k on the fox bench scene).  Such extras
    must be grazing (t_far - t_near ~ 0); everything else is exact."""
    ridx, pidx, depths = spc_render.unbatched_raytrace(
        octree, ph, pyramid, exsum, o, d, level, with_exit=True)
    hits = unbatched_raytrace_coherent(
        octree, ph, pyramid, exsum, o, d, level, **kw)
    assert not bool(hits.saturated), 'raise caps in the test'
    r2, p2, d2 = hits_to_nuggets(hits)
    ta = nugget_table(ridx, pidx, depths)
    tb = nugget_table(r2, p2, d2)
    key_a = set(map(tuple, ta[:, [0, 2]].astype(np.int64)))
    key_b = set(map(tuple, tb[:, [0, 2]].astype(np.int64)))
    assert key_a <= key_b, f'raster missed {len(key_a - key_b)} BFS hits'
    extras = key_b - key_a
    if extras:
        span = {tuple(row[[0, 2]].astype(np.int64)): row[3] - row[1]
                for row in tb}
        for k in extras:
            assert span[k] < 1e-5, f'non-grazing extra hit {k}'
    # depths of the common hits match exactly
    if not key_a:
        return ta
    common = np.array([row for row in tb
                       if tuple(row[[0, 2]].astype(np.int64)) in key_a])
    order = np.lexsort((common[:, 2], common[:, 1], common[:, 0]))
    common = common[order]
    assert common.shape == ta.shape
    np.testing.assert_array_equal(ta[:, 0], common[:, 0])
    np.testing.assert_allclose(ta[:, 1], common[:, 1], atol=1e-6)
    np.testing.assert_allclose(ta[:, 3], common[:, 3], atol=1e-6)
    return ta


class TestRasterParity:
    @pytest.mark.parametrize('level', [2, 4, 6])
    def test_random_octree_camera_grid(self, level):
        rng = np.random.default_rng(level)
        pts = rng.integers(0, 2 ** level, size=(400, 3))
        octree, pyramid, exsum, ph = build(pts, level)
        o, d = camera_grid(24)
        ta = assert_parity(octree, pyramid, exsum, ph, o, d, level,
                           rays_per_tile=32, max_tile_voxels=512)
        assert ta.shape[0] > 0

    def test_mosaic_engine_parity(self):
        """Interpret-mode run of the fused Pallas engine vs the BFS,
        with a prebuilt cell table.  Covers hit blocks, all-miss blocks
        (the grid edges), and the empty-block compaction path."""
        level = 4
        rng = np.random.default_rng(14)
        pts = rng.integers(2, 2 ** level - 2, size=(300, 3))
        octree, pyramid, exsum, ph = build(pts, level)
        from kaolin_tpu.render.spc.raster import build_cell_table
        table = build_cell_table(ph, pyramid, level, cell_shift=2,
                                 cell_width=64)
        assert int(table.overflow) == 0
        o, d = camera_grid(16, extent=1.2)   # edge rays miss everything
        # random octrees are spatially dense relative to the beam size,
        # so candidate caps must cover most cells
        ta = assert_parity(octree, pyramid, exsum, ph, o, d, level,
                           rays_per_tile=16, engine='mosaic',
                           cell_table=table,
                           segments=((8, 256), (None, 64)), knum=64)
        assert ta.shape[0] > 0

    def test_axis_aligned_rays_and_inside_origins(self):
        level = 3
        pts = np.stack(np.meshgrid(*[np.arange(8)] * 3,
                                   indexing='ij'), -1).reshape(-1, 3)
        pts = pts[(pts.sum(-1) % 3) == 0]        # sparse pattern
        octree, pyramid, exsum, ph = build(pts, level)
        side = 8
        ys, xs = np.meshgrid(np.linspace(-0.95, 0.95, side),
                             np.linspace(-0.95, 0.95, side), indexing='ij')
        # axis-aligned rays (two zero direction components), some origins
        # inside the volume
        o = np.stack([xs.ravel(), ys.ravel(),
                      np.full(side * side, -0.5)], -1).astype(np.float32)
        d = np.tile(np.array([[0., 0., 1.]], np.float32), (side * side, 1))
        assert_parity(octree, pyramid, exsum, ph, o, d, level,
                      rays_per_tile=16, max_tile_voxels=512, knum=16)

    def test_grid_shape_block_tiling(self):
        level = 4
        rng = np.random.default_rng(7)
        pts = rng.integers(0, 2 ** level, size=(200, 3))
        octree, pyramid, exsum, ph = build(pts, level)
        o, d = camera_grid(16)
        hits_rows = unbatched_raytrace_coherent(
            octree, ph, pyramid, exsum, o, d, level,
            rays_per_tile=16, max_tile_voxels=512)
        hits_blk = unbatched_raytrace_coherent(
            octree, ph, pyramid, exsum, o, d, level,
            rays_per_tile=16, max_tile_voxels=512, grid_shape=(16, 16))
        np.testing.assert_array_equal(np.asarray(hits_rows.count),
                                      np.asarray(hits_blk.count))
        np.testing.assert_allclose(np.asarray(hits_rows.t_near),
                                   np.asarray(hits_blk.t_near), atol=1e-6)

    def test_saturation_flag(self):
        level = 5
        rng = np.random.default_rng(3)
        pts = rng.integers(0, 2 ** level, size=(2000, 3))
        octree, pyramid, exsum, ph = build(pts, level)
        # incoherent rays: beams cover everything -> tile caps overflow
        o = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
        d = rng.normal(size=(64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        hits = unbatched_raytrace_coherent(
            octree, ph, pyramid, exsum, o, d, level,
            rays_per_tile=64, max_tile_voxels=64)
        assert bool(hits.saturated)

    def test_miss_all(self):
        level = 3
        pts = np.zeros((1, 3), np.int64)
        octree, pyramid, exsum, ph = build(pts, level)
        o = np.full((32, 3), 3., np.float32)
        d = np.ones((32, 3), np.float32)
        hits = unbatched_raytrace_coherent(
            octree, ph, pyramid, exsum, o, d, level, rays_per_tile=16)
        assert int(np.asarray(hits.count).sum()) == 0
        assert np.all(np.asarray(hits.pidx) == -1)
