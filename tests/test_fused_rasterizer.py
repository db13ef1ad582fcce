"""Tests for the fused tile-binned Pallas DIB-R engine (render/mesh/_fused).

Runs in Pallas interpret mode on the CPU test mesh; the same code path
compiles via Mosaic on TPU.  Parity targets:

- z-buffer face selection == the brute-force 'jnp' backend;
- soft mask == dibr_soft_mask (k-buffer path) wherever per-pixel coverage
  stays under knum (the fused engine computes the uncapped product);
- soft-mask gradients == the reference CUDA product-division algebra
  (golden fixtures from /root/reference/tests/samples/dibr/simple).
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import kaolin_tpu as kal
from kaolin_tpu.render.mesh import _fused as FU
from kaolin_tpu.render.mesh import dibr as dibr_mod
from kaolin_tpu.render.mesh import rasterization as rast_mod

SIMPLE_GT_DIR = '/root/reference/tests/samples/dibr/simple/'


def random_scene(key, F=57, B=2, spread=0.3):
    k1, k2 = jax.random.split(jax.random.key(key))
    fvi = jax.random.uniform(k1, (B, F, 3, 2), minval=-0.9, maxval=0.9)
    cent = fvi.mean(axis=2, keepdims=True)
    fvi = cent + (fvi - cent) * spread
    fvz = jax.random.uniform(k2, (B, F, 3), minval=0.1, maxval=2.0)
    return fvz, fvi


@pytest.mark.parametrize('hw', [(64, 64), (35, 31), (40, 200)])
def test_fused_selection_matches_jnp(hw):
    H, W = hw
    fvz, fvi = random_scene(0)
    valid = jnp.ones(fvz.shape[:2], dtype=bool)
    fi_ref = rast_mod.rasterize_selection(H, W, fvz, fvi, valid,
                                          backend='jnp')
    sel = FU.fused_selection(fvz, fvi, valid, height=H, width=W,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(sel.face_idx),
                                  np.asarray(fi_ref))


def test_fused_selection_valid_faces():
    H = W = 32
    fvz, fvi = random_scene(3, F=8, B=1, spread=1.0)
    valid = jnp.array([[True, False, True, False, True, False, True,
                        False]])
    fi_ref = rast_mod.rasterize_selection(H, W, fvz, fvi, valid,
                                          backend='jnp')
    sel = FU.fused_selection(fvz, fvi, valid, height=H, width=W,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(sel.face_idx),
                                  np.asarray(fi_ref))
    assert not np.isin(np.asarray(sel.face_idx), [1, 3, 5, 7]).any()


def test_fused_softmask_matches_kbuffer_path():
    H, W = 48, 48
    fvz, fvi = random_scene(1)
    valid = jnp.ones(fvz.shape[:2], dtype=bool)
    fi = rast_mod.rasterize_selection(H, W, fvz, fvi, valid, backend='jnp')
    mask_ref = dibr_mod.dibr_soft_mask(fvi, fi, knum=60)
    sel = FU.fused_selection(fvz, fvi, valid, height=H, width=W,
                             interpret=True)
    mask_fused = FU.softmask_fused(fvi * 1000., sel, (H, W, 1000., 7000.))
    np.testing.assert_allclose(np.asarray(mask_fused),
                               np.asarray(mask_ref), atol=2e-5)


def test_fused_softmask_grad_matches_kbuffer_path():
    H = W = 40
    fvz, fvi = random_scene(2, F=23)
    valid = jnp.ones(fvz.shape[:2], dtype=bool)
    fi = rast_mod.rasterize_selection(H, W, fvz, fvi, valid, backend='jnp')
    sel = FU.fused_selection(fvz, fvi, valid, height=H, width=W,
                             interpret=True)
    config = (H, W, 1000., 7000.)

    def loss_ref(fvi_):
        return jnp.sum(dibr_mod.dibr_soft_mask(fvi_, fi, knum=40) ** 2)

    def loss_fused(fvi_s):
        return jnp.sum(FU.softmask_fused(fvi_s, sel, config) ** 2)

    g_ref = np.asarray(jax.grad(loss_ref)(fvi))
    g_fused = np.asarray(jax.grad(loss_fused)(fvi * 1000.)) * 1000.
    # CUDA product-division approximation vs exact cumprod: tiny rel diff
    scale = max(np.abs(g_ref).max(), 1.)
    np.testing.assert_allclose(g_fused / scale, g_ref / scale, atol=1e-4)


@pytest.mark.parametrize('sigmainv', [7000, 70])
@pytest.mark.parametrize('boxlen', [0.02, 0.2])
def test_fused_soft_mask_forward_golden(sigmainv, boxlen):
    torch = pytest.importorskip('torch')
    gt = torch.load(
        os.path.join(SIMPLE_GT_DIR, f'soft_mask_35_31_{sigmainv}_{boxlen}.pt'),
        map_location='cpu').numpy()
    fvi = jnp.array(
        [[[[-0.7, 0.], [0., -0.7], [0., 0.7]],
          [[-0.7, 0.], [0., 0.7], [0., -0.7]],
          [[0., -0.7], [0., 0.7], [0.7, 0.]]],
         [[[-0.7, -0.7], [0.7, -0.7], [-0.7, 0.7]],
          [[-0.7, -0.7], [0.7, -0.7], [-0.7, 0.7]],
          [[-0.7, -0.7], [0.7, -0.7], [-0.7, 0.7]]]], dtype=jnp.float32)
    fvz = jnp.array(
        [[[-2., -1., -1.], [-2.5, -3., -3.], [-2., -2., -2.]],
         [[-2., -1., -3.], [-2., -2., -2.], [-2., -3., -1.]]],
        dtype=jnp.float32)
    sel = FU.fused_selection(fvz, fvi, height=35, width=31,
                             boxlen=boxlen, sigmainv=sigmainv,
                             interpret=True)
    mask = FU.softmask_fused(fvi * 1000., sel, (35, 31, 1000., sigmainv))
    np.testing.assert_allclose(np.asarray(mask), gt, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('sigmainv', [7000, 70])
@pytest.mark.parametrize('boxlen', [0.02, 0.2])
def test_fused_soft_mask_backward_golden(sigmainv, boxlen):
    torch = pytest.importorskip('torch')
    gt_grad = torch.load(
        os.path.join(SIMPLE_GT_DIR,
                     f'grad_face_vertices_image_35_31_{sigmainv}_{boxlen}.pt'),
        map_location='cpu').numpy()
    fvi = jnp.array(
        [[[[-0.7, 0.], [0., -0.7], [0., 0.7]],
          [[-0.7, 0.], [0., 0.7], [0., -0.7]],
          [[0., -0.7], [0., 0.7], [0.7, 0.]]],
         [[[-0.7, -0.7], [0.7, -0.7], [-0.7, 0.7]],
          [[-0.7, -0.7], [0.7, -0.7], [-0.7, 0.7]],
          [[-0.7, -0.7], [0.7, -0.7], [-0.7, 0.7]]]], dtype=jnp.float32)
    fvz = jnp.array(
        [[[-2., -1., -1.], [-2.5, -3., -3.], [-2., -2., -2.]],
         [[-2., -1., -3.], [-2., -2., -2.], [-2., -3., -1.]]],
        dtype=jnp.float32)
    sel = FU.fused_selection(fvz, fvi, height=35, width=31,
                             boxlen=boxlen, sigmainv=sigmainv,
                             interpret=True)
    mask = sel.face_idx != -1
    shifted_mask = jnp.pad(mask, ((0, 0), (0, 0), (0, 5)))[..., 5:]

    def loss_fn(fvi_):
        soft_mask = FU.softmask_fused(fvi_ * 1000., sel,
                                      (35, 31, 1000., float(sigmainv)))
        return kal.metrics.render.mask_iou(
            soft_mask, shifted_mask.astype(soft_mask.dtype))

    grad = jax.grad(loss_fn)(fvi)
    # the fused backward uses the CUDA kernel's product-division
    # approximation (dibr_soft_mask_cuda.cu:283-284); near-edge pixels
    # with p ~ 1 deviate from the exact-cumprod goldens by <1%
    np.testing.assert_allclose(np.asarray(grad), gt_grad,
                               rtol=1e-2, atol=1e-3)


def test_dibr_rasterization_fused_backend():
    fvi = jnp.array([[
        [[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]],
    ]])
    fvz = jnp.full((1, 1, 3), -1.)
    ff = jnp.ones(fvz.shape + (1,))
    normals_z = jnp.ones((1, 1))
    feats, soft_mask, fidx = kal.render.mesh.dibr_rasterization(
        32, 32, fvz, fvi, ff, normals_z, sigmainv=70, boxlen=0.2,
        rast_backend='fused')
    feats_j, soft_mask_j, fidx_j = kal.render.mesh.dibr_rasterization(
        32, 32, fvz, fvi, ff, normals_z, sigmainv=70, boxlen=0.2,
        rast_backend='jnp')
    np.testing.assert_array_equal(np.asarray(fidx), np.asarray(fidx_j))
    np.testing.assert_allclose(np.asarray(soft_mask),
                               np.asarray(soft_mask_j), atol=2e-5)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats_j),
                               atol=1e-5)


def test_model_selection_fused_path():
    from kaolin_tpu.models import inverse_render as M

    class _M:
        vertices = jnp.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                              [0, -1, 0], [0, 0, 1], [0, 0, -1]],
                             dtype=jnp.float32) * 0.5
    faces = jnp.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                       [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    face_uvs = jnp.zeros((8, 3, 2), jnp.float32)
    params = M.init_params(_M(), texture_res=16)
    views = M.make_views(2)
    H = W = 32
    fi_f, sel = M.compute_selection(params, views, faces, H, W,
                                    backend='fused')
    fi_j, kbuf = M.compute_selection(params, views, faces, H, W,
                                     backend='jnp')
    np.testing.assert_array_equal(np.asarray(fi_f), np.asarray(fi_j))
    assert isinstance(sel, FU.FusedSelection)

    target_images = jnp.zeros((2, H, W, 3))
    target_masks = jnp.zeros((2, H, W))
    gf = jax.grad(lambda p: M.render_loss(
        p, views, faces, face_uvs, target_images, target_masks, H, W,
        backend='jnp', selection=(fi_f, sel)))(params)
    gj = jax.grad(lambda p: M.render_loss(
        p, views, faces, face_uvs, target_images, target_masks, H, W,
        backend='jnp', selection=(fi_j, kbuf)))(params)
    np.testing.assert_allclose(np.asarray(gf.vertices),
                               np.asarray(gj.vertices),
                               rtol=1e-3, atol=1e-5)
