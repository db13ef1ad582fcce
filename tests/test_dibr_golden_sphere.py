"""DIB-R soft-mask golden tests against the reference `dibr/sphere`
fixture set — a real-mesh scene (samples/model.obj, 3 cameras via the
legacy camera path), frozen from Kaolin v0.10.0 CUDA kernels.

Mirrors ``/root/reference/tests/python/kaolin/render/mesh/test_dibr.py``
(TestDibrSoftMask, :196-404): same camera setup, same golden files, same
tolerances (fwd atol/rtol 1e-5; grad rtol/atol 1e-1 because numerical
differences flip distance types at region borders).
"""
import math
import os

import numpy as np
import pytest
import jax.numpy as jnp

import kaolin_tpu as kal

SPHERE_GT_DIR = '/root/reference/tests/samples/dibr/sphere/'
MODEL_OBJ = '/root/reference/tests/samples/model.obj'

torch = pytest.importorskip('torch')


def load_pt(name):
    return torch.load(os.path.join(SPHERE_GT_DIR, name),
                      map_location='cpu').numpy()


@pytest.fixture(scope='module')
def scene():
    """face_vertices_image / face_vertices_z / selected_face_idx for the
    3-camera sphere scene (reference test_dibr.py:203-279)."""
    mesh = kal.io.obj.import_mesh(MODEL_OBJ)
    vertices = jnp.asarray(np.asarray(mesh.vertices))[None]
    faces = jnp.asarray(np.asarray(mesh.faces))
    min_v = vertices.min(axis=1, keepdims=True)
    max_v = vertices.max(axis=1, keepdims=True)
    vertices = (vertices - min_v) / (max_v - min_v)

    camera_pos = jnp.array([[0.5, 0.5, 3.], [2., 2., -2.], [3., 0.5, 0.5]])
    look_at = jnp.full((3, 3), 0.5)
    camera_up = jnp.tile(jnp.array([[0., 1., 0.]]), (3, 1))
    camera_proj = kal.render.camera.generate_perspective_projection(
        fovyangle=math.pi / 4.)
    camera_rot, camera_trans = \
        kal.render.camera.generate_rotate_translate_matrices(
            camera_pos, look_at, camera_up)
    vertices_camera = kal.render.camera.rotate_translate_points(
        vertices, camera_rot, camera_trans)
    vertices_image = kal.render.camera.perspective_camera(
        vertices_camera, camera_proj)
    face_vertices_z = kal.ops.mesh.index_vertices_by_faces(
        vertices_camera[..., -1:], faces)[..., 0]
    face_vertices_image = kal.ops.mesh.index_vertices_by_faces(
        vertices_image, faces)
    face_features = jnp.zeros(face_vertices_z.shape + (1,))
    _, face_idx = kal.render.mesh.rasterize(
        35, 31, face_vertices_z, face_vertices_image, face_features,
        backend='jnp')
    return face_vertices_image, face_vertices_z, face_idx


@pytest.mark.parametrize('sigmainv', [7000, 70])
@pytest.mark.parametrize('boxlen', [0.02, 0.01])
@pytest.mark.parametrize('multiplier', [1000, 100])
def test_soft_mask_forward_golden(scene, sigmainv, boxlen, multiplier):
    face_vertices_image, _, face_idx = scene
    gt = load_pt(f'soft_mask_35_31_{sigmainv}_{boxlen}.pt')
    soft_mask = kal.render.mesh.dibr_soft_mask(
        face_vertices_image, face_idx, sigmainv=sigmainv, boxlen=boxlen,
        knum=30, multiplier=multiplier)
    np.testing.assert_allclose(np.asarray(soft_mask), gt,
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize('sigmainv', [7000, 70])
@pytest.mark.parametrize('boxlen', [0.02, 0.01])
def test_soft_mask_backward_golden(scene, sigmainv, boxlen):
    import jax
    face_vertices_image, _, face_idx = scene
    gt_grad = load_pt(f'grad_face_vertices_image_35_31_{sigmainv}'
                      f'_{boxlen}.pt')
    mask = face_idx != -1
    # target = mask shifted left by 5 px (reference test_dibr.py:385-388)
    shifted_mask = jnp.pad(mask, ((0, 0), (0, 0), (0, 5)))[..., 5:]

    def loss_fn(fvi):
        soft_mask = kal.render.mesh.dibr_soft_mask(
            fvi, face_idx, sigmainv=sigmainv, boxlen=boxlen, knum=30,
            multiplier=1000.)
        return kal.metrics.render.mask_iou(
            soft_mask, shifted_mask.astype(soft_mask.dtype))

    grad = jax.grad(loss_fn)(face_vertices_image)
    np.testing.assert_allclose(np.asarray(grad), gt_grad,
                               rtol=1e-1, atol=1e-1)
