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
