"""Golden-tensor tests against the reference CUDA implementation.

Fixtures under /root/reference/tests/samples/dibr/simple were frozen from
Kaolin v0.10.0 CUDA kernels (reference test_dibr.py:77-107); matching them
is the driver's correctness metric ("grad allclose vs CUDA ref").
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import kaolin_tpu as kal

SIMPLE_GT_DIR = '/root/reference/tests/samples/dibr/simple/'

torch = pytest.importorskip('torch')


def load_pt(name):
    return torch.load(os.path.join(SIMPLE_GT_DIR, name),
                      map_location='cpu').numpy()


@pytest.fixture
def face_vertices_image():
    return jnp.array(
        [[[[-0.7, 0.], [0., -0.7], [0., 0.7]],
          [[-0.7, 0.], [0., 0.7], [0., -0.7]],
          [[0., -0.7], [0., 0.7], [0.7, 0.]]],
         [[[-0.7, -0.7], [0.7, -0.7], [-0.7, 0.7]],
          [[-0.7, -0.7], [0.7, -0.7], [-0.7, 0.7]],
          [[-0.7, -0.7], [0.7, -0.7], [-0.7, 0.7]]]], dtype=jnp.float32)


@pytest.fixture
def face_vertices_z():
    return jnp.array(
        [[[-2., -1., -1.],
          [-2.5, -3., -3.],
          [-2., -2., -2.]],
         [[-2., -1., -3.],
          [-2., -2., -2.],
          [-2., -3., -1.]]], dtype=jnp.float32)


@pytest.fixture
def selected_face_idx(face_vertices_image, face_vertices_z):
    face_features = jnp.zeros(face_vertices_z.shape + (1,))
    _, face_idx = kal.render.mesh.rasterize(
        35, 31, face_vertices_z, face_vertices_image, face_features,
        backend='jnp')
    return face_idx


@pytest.mark.parametrize('sigmainv', [7000, 70])
@pytest.mark.parametrize('boxlen', [0.02, 0.2])
@pytest.mark.parametrize('multiplier', [1000, 100])
@pytest.mark.parametrize('knum', [30, 20])
def test_dibr_soft_mask_forward_golden(
        face_vertices_image, selected_face_idx, sigmainv, boxlen,
        multiplier, knum):
    gt = load_pt(f'soft_mask_35_31_{int(sigmainv)}_{boxlen}.pt')
    soft_mask = kal.render.mesh.dibr_soft_mask(
        face_vertices_image, selected_face_idx, sigmainv, boxlen, knum,
        multiplier)
    np.testing.assert_allclose(np.asarray(soft_mask), gt,
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('sigmainv', [7000, 70])
@pytest.mark.parametrize('boxlen', [0.02, 0.2])
@pytest.mark.parametrize('multiplier', [1000, 100, 1])
def test_dibr_soft_mask_backward_golden(
        face_vertices_image, selected_face_idx, sigmainv, boxlen,
        multiplier):
    gt_grad = load_pt(
        f'grad_face_vertices_image_35_31_{int(sigmainv)}_{boxlen}.pt')
    mask = selected_face_idx != -1
    # reference loss target: mask shifted left by 5 pixels (test_dibr.py:185)
    shifted_mask = jnp.pad(mask, ((0, 0), (0, 0), (0, 5)))[..., 5:]

    def loss_fn(fvi):
        soft_mask = kal.render.mesh.dibr_soft_mask(
            fvi, selected_face_idx, sigmainv, boxlen, 30, multiplier)
        return kal.metrics.render.mask_iou(
            soft_mask, shifted_mask.astype(soft_mask.dtype))

    grad = jax.grad(loss_fn)(face_vertices_image)
    np.testing.assert_allclose(np.asarray(grad), gt_grad,
                               rtol=1e-5, atol=1e-5)


def test_rasterize_interpolation_and_zbuffer():
    # one big flat triangle (z=-1) + a closer small one (z=-0.5)
    fvi = jnp.array([[
        [[-0.9, -0.9], [0.9, -0.9], [0.0, 0.9]],
        [[-0.3, -0.3], [0.3, -0.3], [0.0, 0.3]],
    ]])
    fvz = jnp.array([[[-1., -1., -1.], [-0.5, -0.5, -0.5]]])
    ff = jnp.array([[
        [[1., 0., 0.], [1., 0., 0.], [1., 0., 0.]],
        [[0., 1., 0.], [0., 1., 0.], [0., 1., 0.]],
    ]])
    feats, fidx = kal.render.mesh.rasterize(64, 64, fvz, fvi, ff,
                                            backend='jnp')
    fidx = np.asarray(fidx)[0]
    feats = np.asarray(feats)[0]
    # center pixel belongs to the closer (green) triangle
    assert fidx[32, 32] == 1
    np.testing.assert_allclose(feats[32, 32], [0, 1, 0], atol=1e-5)
    # bottom corner area is the red triangle
    assert fidx[60, 32] == 0
    np.testing.assert_allclose(feats[60, 32], [1, 0, 0], atol=1e-5)
    # outside is empty
    assert fidx[0, 0] == -1
    np.testing.assert_allclose(feats[0, 0], [0, 0, 0], atol=1e-6)
    # roughly half the image covered by the big triangle
    assert 0.3 < (fidx >= 0).mean() < 0.6


def test_rasterize_feature_list_split():
    fvi = jnp.array([[[[-0.9, -0.9], [0.9, -0.9], [0.0, 0.9]]]])
    fvz = jnp.full((1, 1, 3), -1.)
    ff1 = jnp.ones((1, 1, 3, 2))
    ff2 = jnp.full((1, 1, 3, 3), 2.)
    (o1, o2), fidx = kal.render.mesh.rasterize(
        16, 16, fvz, fvi, [ff1, ff2], backend='jnp')
    assert o1.shape == (1, 16, 16, 2)
    assert o2.shape == (1, 16, 16, 3)
    covered = np.asarray(fidx[0]) >= 0
    np.testing.assert_allclose(np.asarray(o2[0])[covered], 2., atol=1e-5)


def test_rasterize_valid_faces_mask():
    fvi = jnp.array([[
        [[-0.9, -0.9], [0.9, -0.9], [0.0, 0.9]],
        [[-0.3, -0.3], [0.3, -0.3], [0.0, 0.3]],
    ]])
    fvz = jnp.array([[[-1., -1., -1.], [-0.5, -0.5, -0.5]]])
    ff = jnp.ones(fvz.shape + (1,))
    valid = jnp.array([[True, False]])
    _, fidx = kal.render.mesh.rasterize(32, 32, fvz, fvi, ff,
                                        valid_faces=valid, backend='jnp')
    assert not (np.asarray(fidx) == 1).any()
    assert (np.asarray(fidx) == 0).any()


def test_rasterize_gradients_vs_finite_difference():
    from kaolin_tpu.render.mesh.rasterization import (
        _interpolate_selected, pixel_coords)
    fvi = jnp.array([[[[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]]]])
    fvz = jnp.full((1, 1, 3), -1.)
    ff = jnp.array([[[[1.], [2.], [3.]]]])
    target = jnp.ones((1, 16, 16, 1)) * 2.
    # freeze the (non-differentiable) selection so finite differences probe
    # only the smooth interpolation epilogue (as the CUDA backward does)
    _, face_idx = kal.render.mesh.rasterize(16, 16, fvz, fvi, ff,
                                            backend='jnp')
    xs, ys = pixel_coords(16, 16, 1000.)

    def loss(fvi_):
        feats, _ = _interpolate_selected(
            face_idx[0], fvi_[0] * 1000., ff[0], xs, ys, 1e-8)
        return jnp.sum((feats[None] - target) ** 2)

    g = jax.grad(loss)(fvi)
    # finite differences; selection frozen, eps large enough to rise above
    # float32 resolution of the ~1e2-magnitude loss
    eps = 0.05
    g_np = np.asarray(g)
    for idx in [(0, 0, 0, 0), (0, 0, 1, 1), (0, 0, 2, 0)]:
        dv = np.zeros(fvi.shape, np.float32)
        dv[idx] = eps
        f1 = float(loss(fvi + dv))
        f2 = float(loss(fvi - dv))
        fd = (f1 - f2) / (2 * eps)
        assert abs(fd - g_np[idx]) < 0.1 * max(1., abs(fd)), \
            f"grad mismatch at {idx}: fd={fd} ad={g_np[idx]}"


def test_dibr_rasterization_end_to_end():
    fvi = jnp.array([[
        [[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]],
    ]])
    fvz = jnp.full((1, 1, 3), -1.)
    ff = jnp.ones(fvz.shape + (1,))
    normals_z = jnp.ones((1, 1))
    feats, soft_mask, fidx = kal.render.mesh.dibr_rasterization(
        32, 32, fvz, fvi, ff, normals_z, sigmainv=70, boxlen=0.2,
        rast_backend='jnp')
    sm = np.asarray(soft_mask)[0]
    covered = np.asarray(fidx)[0] >= 0
    assert (sm[covered] == 1.).all()
    # soft mask decays smoothly outside
    assert sm[~covered].max() > 0.5
    assert sm[0, 0] < 0.1
    # backface culling: flipped normals -> nothing rendered
    _, _, fidx2 = kal.render.mesh.dibr_rasterization(
        32, 32, fvz, fvi, ff, -normals_z, rast_backend='jnp')
    assert (np.asarray(fidx2) == -1).all()
