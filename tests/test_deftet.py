import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.render.mesh import deftet_sparse_render


@pytest.fixture
def scene():
    # two stacked triangles covering the center pixel, different depths
    fvi = jnp.array([[
        [[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]],   # near (z = -1)
        [[-0.6, -0.6], [0.6, -0.6], [0.0, 0.6]],   # far (z = -2)
    ]])
    fvz = jnp.array([[[-1., -1., -1.], [-2., -2., -2.]]])
    ff = jnp.array([[
        [[1., 0.], [1., 0.], [1., 0.]],
        [[0., 1.], [0., 1.], [0., 1.]],
    ]])
    return fvi, fvz, ff


def test_deftet_two_layers(scene):
    fvi, fvz, ff = scene
    pixel_coords = jnp.array([[[0., 0.], [0.9, 0.9]]])
    render_ranges = jnp.array([[[-1e4, 0.], [-1e4, 0.]]])
    feats, face_idx = deftet_sparse_render(
        pixel_coords, render_ranges, fvz, fvi, ff, knum=4)
    fi = np.asarray(face_idx)
    # center pixel: both faces, sorted near-to-far (0 then 1)
    np.testing.assert_array_equal(fi[0, 0], [0, 1, -1, -1])
    # corner pixel: nothing
    np.testing.assert_array_equal(fi[0, 1], [-1, -1, -1, -1])
    f = np.asarray(feats)
    np.testing.assert_allclose(f[0, 0, 0], [1., 0.], atol=1e-5)
    np.testing.assert_allclose(f[0, 0, 1], [0., 1.], atol=1e-5)
    np.testing.assert_allclose(f[0, 1], 0., atol=1e-6)


def test_deftet_render_range_filter(scene):
    fvi, fvz, ff = scene
    pixel_coords = jnp.array([[[0., 0.]]])
    # only keep depths in (-1.5, 0): excludes the far face at -2
    render_ranges = jnp.array([[[-1.5, 0.]]])
    _, face_idx = deftet_sparse_render(
        pixel_coords, render_ranges, fvz, fvi, ff, knum=4)
    np.testing.assert_array_equal(np.asarray(face_idx)[0, 0],
                                  [0, -1, -1, -1])


def test_deftet_knum_truncation(scene):
    fvi, fvz, ff = scene
    pixel_coords = jnp.array([[[0., 0.]]])
    render_ranges = jnp.array([[[-1e4, 0.]]])
    _, face_idx = deftet_sparse_render(
        pixel_coords, render_ranges, fvz, fvi, ff, knum=1)
    # first by mesh order = face 0
    np.testing.assert_array_equal(np.asarray(face_idx)[0, 0], [0])


def test_deftet_gradients(scene):
    fvi, fvz, ff = scene
    pixel_coords = jnp.array([[[0.05, 0.1]]])
    render_ranges = jnp.array([[[-1e4, 0.]]])

    def loss(fvi_, ff_):
        feats, _ = deftet_sparse_render(
            pixel_coords, render_ranges, fvz, fvi_, ff_, knum=4)
        return jnp.sum(feats ** 2)

    g_fvi, g_ff = jax.grad(loss, argnums=(0, 1))(fvi, ff)
    assert np.isfinite(np.asarray(g_fvi)).all()
    assert np.abs(np.asarray(g_ff)).sum() > 0


def test_deftet_feature_list(scene):
    fvi, fvz, ff = scene
    pixel_coords = jnp.array([[[0., 0.]]])
    render_ranges = jnp.array([[[-1e4, 0.]]])
    (f1, f2), face_idx = deftet_sparse_render(
        pixel_coords, render_ranges, fvz, fvi, [ff, ff * 2.], knum=2)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1) * 2.,
                               atol=1e-5)


class TestNaiveCrossCheck:
    """k-buffer renderer vs the in-library naive dense reference
    (reference test strategy: test_rasterization.py:148,216 and the
    deftet tests compare the CUDA kernel against
    _naive_deftet_sparse_render)."""

    @pytest.fixture
    def random_scene(self):
        rng = np.random.RandomState(7)
        B, F, P = 2, 60, 40
        centers = rng.uniform(-0.8, 0.8, (B, F, 1, 2))
        fvi = jnp.asarray(
            (centers + rng.uniform(-0.35, 0.35, (B, F, 3, 2))
             ).astype(np.float32))
        fvz = jnp.asarray(
            -rng.uniform(0.5, 3.0, (B, F, 1)).astype(np.float32)
            * np.ones((1, 1, 3), np.float32)
            + rng.uniform(-0.05, 0.05, (B, F, 3)).astype(np.float32))
        ff = jnp.asarray(rng.randn(B, F, 3, 4).astype(np.float32))
        pixels = jnp.asarray(
            rng.uniform(-1., 1., (B, P, 2)).astype(np.float32))
        ranges = jnp.tile(jnp.array([[[-1e4, 0.]]]), (B, P, 1))
        return pixels, ranges, fvz, fvi, ff

    def test_forward_matches_naive(self, random_scene):
        from kaolin_tpu.render.mesh.deftet import (
            _naive_deftet_sparse_render)
        pixels, ranges, fvz, fvi, ff = random_scene
        knum = 64  # > max faces per pixel: both orderings agree
        feats, fidx = deftet_sparse_render(
            pixels, ranges, fvz, fvi, ff, knum=knum)
        nfeats, nfidx = _naive_deftet_sparse_render(
            pixels, ranges, fvz, fvi, ff, knum=knum)
        np.testing.assert_array_equal(np.asarray(fidx), np.asarray(nfidx))
        np.testing.assert_allclose(np.asarray(feats), np.asarray(nfeats),
                                   atol=1e-4)

    def test_gradients_match_naive(self, random_scene):
        from kaolin_tpu.render.mesh.deftet import (
            _naive_deftet_sparse_render)
        pixels, ranges, fvz, fvi, ff = random_scene

        def loss_k(fvi_, fvz_, ff_):
            feats, _ = deftet_sparse_render(
                pixels, ranges, fvz_, fvi_, ff_, knum=64)
            return jnp.sum(feats ** 2)

        def loss_n(fvi_, fvz_, ff_):
            feats, _ = _naive_deftet_sparse_render(
                pixels, ranges, fvz_, fvi_, ff_, knum=64)
            return jnp.sum(feats ** 2)

        gk = jax.grad(loss_k, argnums=(0, 2))(fvi, fvz, ff)
        gn = jax.grad(loss_n, argnums=(0, 2))(fvi, fvz, ff)
        for a, b in zip(gk, gn):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=1e-3)

    def test_valid_faces_mask(self, random_scene):
        pixels, ranges, fvz, fvi, ff = random_scene
        B, F = fvz.shape[:2]
        mask = jnp.asarray(np.arange(F) % 2 == 0)[None].repeat(B, 0)
        _, fidx = deftet_sparse_render(
            pixels, ranges, fvz, fvi, ff, knum=64, valid_faces=mask)
        fi = np.asarray(fidx)
        hit = fi[fi >= 0]
        assert hit.size > 0 and (hit % 2 == 0).all()


class TestBinnedEngine:
    """The spatially binned fast path (``max_candidates=...``) must match
    the default all-faces selection exactly whenever the candidate cap
    covers the scene."""

    @pytest.fixture
    def random_scene(self):
        rng = np.random.RandomState(11)
        B, F, P = 2, 120, 70
        centers = rng.uniform(-0.8, 0.8, (B, F, 1, 2))
        fvi = jnp.asarray(
            (centers + rng.uniform(-0.2, 0.2, (B, F, 3, 2))
             ).astype(np.float32))
        fvz = jnp.asarray(
            -rng.uniform(0.5, 3.0, (B, F, 3)).astype(np.float32))
        ff = jnp.asarray(rng.randn(B, F, 3, 3).astype(np.float32))
        pixels = jnp.asarray(
            rng.uniform(-1., 1., (B, P, 2)).astype(np.float32))
        ranges = jnp.tile(jnp.array([[[-1e4, 0.]]]), (B, P, 1))
        return pixels, ranges, fvz, fvi, ff

    @pytest.mark.parametrize('knum', [3, 16])
    def test_forward_matches_default(self, random_scene, knum):
        pixels, ranges, fvz, fvi, ff = random_scene
        feats_d, fidx_d = deftet_sparse_render(
            pixels, ranges, fvz, fvi, ff, knum=knum)
        feats_b, fidx_b = deftet_sparse_render(
            pixels, ranges, fvz, fvi, ff, knum=knum,
            max_candidates=fvz.shape[1], pixel_chunk=32)
        np.testing.assert_array_equal(np.asarray(fidx_d),
                                      np.asarray(fidx_b))
        np.testing.assert_allclose(np.asarray(feats_d),
                                   np.asarray(feats_b), atol=1e-5)

    def test_gradients_match_default(self, random_scene):
        pixels, ranges, fvz, fvi, ff = random_scene

        def loss(fvi_, fvz_, ff_, mc):
            feats, _ = deftet_sparse_render(
                pixels, ranges, fvz_, fvi_, ff_, knum=16,
                max_candidates=mc)
            return jnp.sum(jnp.sin(feats))

        gd = jax.grad(functools.partial(loss, mc=None),
                      argnums=(0, 1, 2))(fvi, fvz, ff)
        gb = jax.grad(functools.partial(loss, mc=int(fvz.shape[1])),
                      argnums=(0, 1, 2))(fvi, fvz, ff)
        for a, b in zip(gd, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_valid_faces_and_feature_list(self, random_scene):
        pixels, ranges, fvz, fvi, ff = random_scene
        B, F = fvz.shape[:2]
        mask = jnp.asarray(np.arange(F) % 3 != 0)[None].repeat(B, 0)
        (f1, f2), fidx = deftet_sparse_render(
            pixels, ranges, fvz, fvi, [ff, ff * -1.5], knum=8,
            valid_faces=mask, max_candidates=F)
        fi = np.asarray(fidx)
        hit = fi[fi >= 0]
        assert hit.size > 0 and (hit % 3 != 0).all()
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f1) * -1.5,
                                   atol=1e-5)
