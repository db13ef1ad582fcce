import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops import spc as spc_ops
from kaolin_tpu.render import spc as spc_render


def build(points, level):
    points = np.asarray(points, dtype=np.int16)
    octree = spc_ops.unbatched_points_to_octree(points, level)
    lengths = np.array([len(octree)], dtype=np.int32)
    max_level, pyramids, exsum = spc_ops.scan_octrees(octree, lengths)
    ph = spc_ops.generate_points(octree, pyramids, exsum)
    return octree, np.asarray(pyramids)[0], exsum, ph


class TestPackOps:
    def test_mark_pack_boundaries(self):
        ids = jnp.array([1, 1, 1, 1, 2, 2, 2])
        out = spc_render.mark_pack_boundaries(ids)
        np.testing.assert_array_equal(
            np.asarray(out), [True, False, False, False, True, False, False])

    def test_diff(self):
        feats = jnp.array([[1.], [3.], [6.], [10.], [2.], [5.]])
        boundaries = jnp.array([True, False, False, False, True, False])
        out = spc_render.diff(feats, boundaries)
        np.testing.assert_allclose(
            np.asarray(out)[:, 0], [2., 3., 4., 0., 3., 0.])

    def test_sum_reduce(self):
        feats = jnp.array([[1.], [2.], [3.], [4.], [5.]])
        boundaries = jnp.array([True, False, True, False, False])
        out = spc_render.sum_reduce(feats, boundaries)
        np.testing.assert_allclose(np.asarray(out)[:, 0], [3., 12.])

    @pytest.mark.parametrize('exclusive', [False, True])
    @pytest.mark.parametrize('reverse', [False, True])
    def test_cumsum_matches_numpy(self, exclusive, reverse):
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(11, 2)).astype(np.float32)
        boundaries = np.zeros(11, dtype=bool)
        boundaries[[0, 4, 7]] = True
        out = spc_render.cumsum(jnp.asarray(feats), jnp.asarray(boundaries),
                                exclusive=exclusive, reverse=reverse)
        # numpy reference per pack
        expected = np.zeros_like(feats)
        packs = [(0, 4), (4, 7), (7, 11)]
        for lo, hi in packs:
            seg = feats[lo:hi]
            if reverse:
                seg = seg[::-1]
            c = np.cumsum(seg, axis=0)
            if exclusive:
                c = np.concatenate([np.zeros_like(c[:1]), c[:-1]])
            if reverse:
                c = c[::-1]
            expected[lo:hi] = c
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5,
                                   atol=1e-6)

    @pytest.mark.parametrize('exclusive', [False, True])
    @pytest.mark.parametrize('reverse', [False, True])
    def test_cumprod_matches_numpy(self, exclusive, reverse):
        rng = np.random.default_rng(1)
        feats = rng.uniform(0.5, 2.0, size=(9, 1)).astype(np.float32)
        boundaries = np.zeros(9, dtype=bool)
        boundaries[[0, 3, 6]] = True
        out = spc_render.cumprod(jnp.asarray(feats), jnp.asarray(boundaries),
                                 exclusive=exclusive, reverse=reverse)
        expected = np.zeros_like(feats)
        for lo, hi in [(0, 3), (3, 6), (6, 9)]:
            seg = feats[lo:hi]
            if reverse:
                seg = seg[::-1]
            c = np.cumprod(seg, axis=0)
            if exclusive:
                c = np.concatenate([np.ones_like(c[:1]), c[:-1]])
            if reverse:
                c = c[::-1]
            expected[lo:hi] = c
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)

    def test_cumprod_grad_with_zeros(self):
        # the product-rule formulation stays finite where the reference's
        # division-based backward would produce NaN (raytrace.py:186-188)
        feats = jnp.array([[0.5], [0.0], [2.0]])
        boundaries = jnp.array([True, False, False])

        def f(x):
            return jnp.sum(spc_render.cumprod(x, boundaries))

        g = jax.grad(f)(feats)
        assert np.isfinite(np.asarray(g)).all()

    def test_exponential_integration(self):
        tau = jnp.array([[0.5], [0.5], [1.0]])
        feats = jnp.array([[1., 2.], [3., 4.], [5., 6.]])
        boundaries = jnp.array([True, False, True])
        out, transmittance = spc_render.exponential_integration(
            feats, tau, boundaries)
        # manual: pack0: T0 = exp(0)*(1-e^-.5), T1 = exp(-.5)*(1-e^-.5)
        a = 1 - np.exp(-0.5)
        t0, t1 = a, np.exp(-0.5) * a
        t2 = 1 - np.exp(-1.)
        np.testing.assert_allclose(
            np.asarray(transmittance)[:, 0], [t0, t1, t2], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out)[0], [1 * t0 + 3 * t1, 2 * t0 + 4 * t1],
            rtol=1e-5)


class TestRaytrace:
    def test_single_voxel_hit_miss(self):
        octree, pyramid, exsum, ph = build([[0, 0, 0]], 1)
        orig = jnp.array([[-0.5, -0.5, 2.0], [0.5, 0.5, 2.0]])
        dirs = jnp.array([[0., 0., -1.], [0., 0., -1.]])
        ridx, pidx, depth = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 1)
        assert np.asarray(ridx).tolist() == [0]
        # hit voxel spans [-1,0]^3; entry at z=0 -> depth 2.0
        np.testing.assert_allclose(np.asarray(depth)[0, 0], 2.0, rtol=1e-5)

    def test_depth_ordering_along_ray(self):
        # full level-2 grid: a ray along -z crosses 4 voxels near-to-far
        pts = np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing='ij'),
                       axis=-1).reshape(-1, 3)
        octree, pyramid, exsum, ph = build(pts, 2)
        orig = jnp.array([[-0.9, -0.9, 2.0]])
        dirs = jnp.array([[0., 0., -1.]])
        ridx, pidx, depth = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 2)
        d = np.asarray(depth)[:, 0]
        assert len(d) == 4
        assert (np.diff(d) > 0).all()  # near-to-far
        # voxels crossed are at x=y=0 (coords quantized from -0.9)
        leaf_pts = np.asarray(ph)[np.asarray(pidx)]
        np.testing.assert_array_equal(leaf_pts[:, 0], [0, 0, 0, 0])
        np.testing.assert_array_equal(leaf_pts[:, 2], [3, 2, 1, 0])

    def test_with_exit_depths(self):
        octree, pyramid, exsum, ph = build([[0, 0, 0]], 1)
        orig = jnp.array([[-0.5, -0.5, 2.0]])
        dirs = jnp.array([[0., 0., -1.]])
        ridx, pidx, depth = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 1, with_exit=True)
        d = np.asarray(depth)
        np.testing.assert_allclose(d[0], [2.0, 3.0], rtol=1e-5)

    def test_ray_ordering_multiple_rays(self):
        pts = np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing='ij'),
                       axis=-1).reshape(-1, 3)
        octree, pyramid, exsum, ph = build(pts, 2)
        rng = np.random.default_rng(0)
        orig = jnp.asarray(np.stack([
            rng.uniform(-0.9, 0.9, 8), rng.uniform(-0.9, 0.9, 8),
            np.full(8, 2.)], axis=-1).astype(np.float32))
        dirs = jnp.asarray(np.broadcast_to(
            np.array([0., 0., -1.], np.float32), (8, 3)).copy())
        ridx, pidx, depth = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 2)
        r = np.asarray(ridx)
        # rays sorted ascending, each with 4 hits, depths ascending per ray
        np.testing.assert_array_equal(r, np.repeat(np.arange(8), 4))
        d = np.asarray(depth)[:, 0].reshape(8, 4)
        assert (np.diff(d, axis=1) > 0).all()

    def test_inside_origin(self):
        # ray starting inside the voxel: final-level test requires
        # depth > 0, so the containing voxel is skipped (CUDA parity)
        octree, pyramid, exsum, ph = build([[0, 0, 0]], 1)
        orig = jnp.array([[-0.5, -0.5, -0.5]])
        dirs = jnp.array([[0., 0., -1.]])
        ridx, pidx, depth = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 1)
        assert np.asarray(ridx).shape[0] == 0

    def test_chunked_matches_unchunked(self):
        # 32 rays traced as 4x8-ray chunks must give identical nuggets
        pts = np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing='ij'),
                       axis=-1).reshape(-1, 3)
        octree, pyramid, exsum, ph = build(pts, 2)
        rng = np.random.default_rng(1)
        n = 32
        orig = jnp.asarray(np.stack([
            rng.uniform(-0.9, 0.9, n), rng.uniform(-0.9, 0.9, n),
            np.full(n, 2.)], axis=-1).astype(np.float32))
        dirs = np.stack([rng.uniform(-.1, .1, n), rng.uniform(-.1, .1, n),
                         np.full(n, -1.)], axis=-1)
        dirs = jnp.asarray(
            (dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
            .astype(np.float32))
        ref = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 2)
        out = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 2, chunk_rays=8)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)

    def test_chunked_ragged_last_chunk(self):
        # num_rays not a multiple of chunk_rays: padded rays add no hits
        octree, pyramid, exsum, ph = build([[0, 0, 0], [1, 1, 1]], 1)
        n = 11
        orig = jnp.asarray(np.stack([
            np.linspace(-0.9, 0.9, n), np.linspace(-0.9, 0.9, n),
            np.full(n, 2.)], axis=-1).astype(np.float32))
        dirs = jnp.asarray(np.broadcast_to(
            np.array([0., 0., -1.], np.float32), (n, 3)).copy())
        ref = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 1)
        out = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 1, chunk_rays=4)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)

    def test_level0_compacted(self):
        # level 0: miss/hit/miss pattern must return a packed prefix of
        # hits only (regression: misses used to leave -1 holes)
        octree, pyramid, exsum, ph = build([[0, 0, 0]], 1)
        orig = jnp.array([[5., 5., 2.], [-0.5, -0.5, 2.], [5., -5., 2.]])
        dirs = jnp.array([[0., 0., -1.]] * 3)
        ridx, pidx, depth, info = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 0, trim=False,
            return_info=True)
        r = np.asarray(ridx)
        n = int(info.count)
        assert n == 1
        assert r[0] == 1 and (r[1:] == -1).all()
        assert not bool(info.saturated)
        # root voxel spans [-1,1]^3; entry at z=1 -> depth 1.0
        np.testing.assert_allclose(np.asarray(depth)[0, 0], 1.0, rtol=1e-5)

    def test_level0_trimmed(self):
        octree, pyramid, exsum, ph = build([[0, 0, 0]], 1)
        orig = jnp.array([[5., 5., 2.], [-0.5, -0.5, 2.]])
        dirs = jnp.array([[0., 0., -1.]] * 2)
        ridx, pidx, depth = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 0)
        assert np.asarray(ridx).tolist() == [1]
        np.testing.assert_allclose(np.asarray(depth)[0, 0], 1.0, rtol=1e-5)

    def test_saturation_reported_via_info(self):
        # one ray with 4 true hits and cap=2: jit path must flag the drop
        pts = np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing='ij'),
                       axis=-1).reshape(-1, 3)
        octree, pyramid, exsum, ph = build(pts, 2)
        orig = jnp.array([[-0.9, -0.9, 2.0]])
        dirs = jnp.array([[0., 0., -1.]])
        ridx, pidx, depth, info = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 2, trim=False,
            max_nuggets=2, return_info=True)
        assert bool(info.saturated)
        with pytest.warns(RuntimeWarning, match='saturated'):
            spc_render.unbatched_raytrace(
                octree, ph, pyramid, exsum, orig, dirs, 2, max_nuggets=2)

    def test_level_limit(self):
        octree, pyramid, exsum, ph = build([[0, 0, 0]], 1)
        orig = jnp.array([[0., 0., 2.]])
        dirs = jnp.array([[0., 0., -1.]])
        with pytest.raises(ValueError, match='level'):
            spc_render.unbatched_raytrace(
                octree, ph, pyramid, exsum, orig, dirs, 16)


class TestRayGen:
    def test_generate_primary_rays(self):
        # identity transform: ray_o = (0,0,1) everywhere, ray_d = (px,py,0)
        tf = jnp.eye(4)
        ray_o, ray_d = spc_render.generate_primary_rays(4, 4, tf)
        assert ray_o.shape == (16, 3) and ray_d.shape == (16, 3)
        np.testing.assert_allclose(np.asarray(ray_o),
                                   np.tile([0., 0., 1.], (16, 1)))
        np.testing.assert_allclose(np.asarray(ray_d)[5], [1., 1., 0.])
        np.testing.assert_allclose(np.asarray(ray_d)[7], [3., 1., 0.])

    def test_generate_shadow_rays(self):
        # rays down onto the z=0 plane; light above
        ray_o = jnp.array([[0., 0., 2.], [1., 0., 2.], [0., 1., 2.]])
        ray_d = jnp.array([[0., 0., -1.], [0., 0., 1.], [0., 0., -1.]])
        light = jnp.array([0., 0., 5.])
        plane = jnp.array([0., 0., 1., 0.])       # z = 0
        src, dst, idx = spc_render.generate_shadow_rays(
            ray_o, ray_d, light, plane)
        # ray 1 points away from the plane -> filtered
        np.testing.assert_array_equal(np.asarray(idx), [0, 2])
        np.testing.assert_allclose(np.asarray(src),
                                   np.tile([0., 0., 5.], (2, 1)))
        # dirs are unit vectors from the light to the plane hits
        d0 = np.asarray(dst)[0]
        np.testing.assert_allclose(d0, [0., 0., -1.], atol=1e-6)
        d1 = np.asarray(dst)[1]
        expected = np.array([0., 1., -5.]) / np.linalg.norm([0., 1., -5.])
        np.testing.assert_allclose(d1, expected, rtol=1e-5)

    def test_shadow_rays_grazing_filtered(self):
        ray_o = jnp.array([[0., 0., 1.]])
        ray_d = jnp.array([[1., 0., 0.]])        # parallel to plane z=0
        src, dst, idx = spc_render.generate_shadow_rays(
            ray_o, ray_d, jnp.array([0., 0., 5.]),
            jnp.array([0., 0., 1., 0.]))
        assert np.asarray(idx).shape[0] == 0

    def test_two_band_caps_match_default(self):
        # coarse-band capacity schedule must not change results
        pts = np.stack(np.meshgrid(*[np.arange(8)] * 3, indexing='ij'),
                       axis=-1).reshape(-1, 3)
        octree, pyramid, exsum, ph = build(pts, 3)
        rng = np.random.default_rng(3)
        n = 16
        orig = jnp.asarray(np.stack([
            rng.uniform(-0.9, 0.9, n), rng.uniform(-0.9, 0.9, n),
            np.full(n, 2.)], axis=-1).astype(np.float32))
        dirs = jnp.asarray(np.broadcast_to(
            np.array([0., 0., -1.], np.float32), (n, 3)).copy())
        ref = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 3,
            max_nuggets=32 * n)
        out = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 3,
            max_nuggets=32 * n, max_nuggets_coarse=16 * n,
            coarse_levels=2)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)

    def test_two_band_caps_chunked(self):
        octree, pyramid, exsum, ph = build([[0, 0, 0], [1, 1, 1]], 1)
        n = 12
        orig = jnp.asarray(np.stack([
            np.linspace(-0.9, 0.9, n), np.linspace(-0.9, 0.9, n),
            np.full(n, 2.)], axis=-1).astype(np.float32))
        dirs = jnp.asarray(np.broadcast_to(
            np.array([0., 0., -1.], np.float32), (n, 3)).copy())
        ref = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 1)
        out = spc_render.unbatched_raytrace(
            octree, ph, pyramid, exsum, orig, dirs, 1, chunk_rays=4,
            max_nuggets=8 * n, max_nuggets_coarse=4 * n, coarse_levels=3)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)
