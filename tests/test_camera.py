import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.render.camera import (
    Camera, CameraExtrinsics, PinholeIntrinsics, OrthographicIntrinsics,
    CameraFOV, blender_coords)


def make_camera(num=1, backend=None):
    return Camera.from_args(
        eye=jnp.array([[0., 0., 4.]] * num), at=jnp.array([[0., 0., 0.]] * num),
        up=jnp.array([[0., 1., 0.]] * num),
        fov=math.radians(45), width=64, height=64, backend=backend)


def test_lookat_view_matrix():
    cam = make_camera()
    vm = np.asarray(cam.view_matrix())
    assert vm.shape == (1, 4, 4)
    # camera at (0,0,4) looking at origin: forward = -z, so R = I,
    # t = -R @ eye = (0,0,-4)
    np.testing.assert_allclose(vm[0, :3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(vm[0, :3, 3], [0, 0, -4], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.cam_pos())[0, :, 0],
                               [0, 0, 4], atol=1e-6)


def test_extrinsics_transform_and_inverse():
    cam = make_camera()
    pts = jnp.array([[[0., 0., 0.], [1., 2., 3.]]])
    cam_pts = cam.extrinsics.transform(pts)
    np.testing.assert_allclose(np.asarray(cam_pts[0, 0]), [0, 0, -4],
                               atol=1e-6)
    # inverse view matrix roundtrip
    inv = np.asarray(cam.inv_view_matrix())
    vm = np.asarray(cam.view_matrix())
    np.testing.assert_allclose(inv[0] @ vm[0], np.eye(4), atol=1e-5)


def test_inv_transform_rays_roundtrip():
    cam = make_camera()
    orig = jnp.array([[[0.1, -0.2, 0.5]]])
    direction = jnp.array([[[0., 0., -1.]]])
    w_orig, w_dir = cam.extrinsics.inv_transform_rays(orig, direction)
    # transform origin back
    back = cam.extrinsics.transform(w_orig)
    np.testing.assert_allclose(np.asarray(back), np.asarray(orig), atol=1e-5)


def test_projection_ndc_center():
    cam = make_camera()
    # point at the view center projects to ndc (0, 0)
    ndc = cam.transform(jnp.array([[[0., 0., 0.]]]))
    np.testing.assert_allclose(np.asarray(ndc[0, 0, :2]), [0., 0.],
                               atol=1e-6)
    # point slightly to the right -> positive x ndc
    ndc2 = cam.transform(jnp.array([[[0.5, 0., 0.]]]))
    assert float(ndc2[0, 0, 0]) > 0


def test_projection_matrix_structure():
    intr = PinholeIntrinsics.from_fov(64, 64, math.radians(60))
    persp = np.asarray(intr.perspective_matrix())[0]
    fx = float(intr.focal_x[0])
    expected = np.array([
        [fx, 0, 0, 0], [0, fx, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]])
    np.testing.assert_allclose(persp, expected, atol=1e-5)
    # ndc depth mapping: near -> -1, far -> +1 (z_ndc = -U/z - V at z=-near)
    proj = np.asarray(intr.projection_matrix())[0]
    for z, expected_ndc in ((-intr.near, -1.), (-intr.far, 1.)):
        v = proj @ np.array([0, 0, z, 1.])
        # float32 cancellation near the near plane: loose atol
        np.testing.assert_allclose(v[2] / v[3], expected_ndc, atol=5e-3)


def test_fov_focal_roundtrip():
    intr = PinholeIntrinsics.from_fov(64, 32, math.radians(45))
    np.testing.assert_allclose(float(intr.fov_y[0]), 45., rtol=1e-5)
    intr2 = PinholeIntrinsics.from_focal(64, 32, float(intr.focal_x[0]),
                                         float(intr.focal_y[0]))
    np.testing.assert_allclose(float(intr2.fov_y[0]), 45., rtol=1e-5)
    intr2.zoom(5.)
    np.testing.assert_allclose(float(intr2.fov_y[0]), 40., rtol=1e-4)


def test_ortho_projection():
    intr = OrthographicIntrinsics.from_frustum(64, 64, fov_distance=1.0)
    pts = jnp.array([[[0.5, 0.5, -1.]]])
    ndc = np.asarray(intr.transform(pts))
    np.testing.assert_allclose(ndc[0, 0, :2], [0.5, 0.5], atol=1e-5)


def test_six_dof_backend_matches_se3():
    cam = make_camera(backend='matrix_se3')
    cam6 = cam.extrinsics.switch_backend('matrix_6dof_rotation')
    np.testing.assert_allclose(np.asarray(cam6.view_matrix()),
                               np.asarray(cam.view_matrix()), atol=1e-5)


def test_requires_grad_selects_6dof():
    ext = CameraExtrinsics.from_lookat(
        eye=jnp.array([0., 1., 4.]), at=jnp.zeros(3), up=jnp.array([0., 1., 0.]),
        requires_grad=True)
    assert ext.backend_name == 'matrix_6dof_rotation'
    # gram-schmidt roundtrip keeps the matrix
    ext2 = CameraExtrinsics.from_lookat(
        eye=jnp.array([0., 1., 4.]), at=jnp.zeros(3), up=jnp.array([0., 1., 0.]))
    np.testing.assert_allclose(np.asarray(ext.view_matrix()),
                               np.asarray(ext2.view_matrix()), atol=1e-5)


def test_translate_rotate_move():
    cam = make_camera()
    pos0 = np.asarray(cam.cam_pos())[0, :, 0]
    cam.translate(jnp.array([1., 0., 0.]))
    pos1 = np.asarray(cam.cam_pos())[0, :, 0]
    np.testing.assert_allclose(pos1 - pos0, [1., 0., 0.], atol=1e-5)
    cam.move_forward(1.)
    # camera forward is -z here; moving forward moves camera along forward
    pos2 = np.asarray(cam.cam_pos())[0, :, 0]
    assert abs(pos2[2] - pos1[2]) > 0.5
    cam.rotate(yaw=0.3)
    # still a valid rotation matrix
    R = np.asarray(cam.R)[0]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_change_coordinate_system_roundtrip():
    cam = make_camera()
    vm0 = np.asarray(cam.view_matrix()).copy()
    cam.change_coordinate_system(blender_coords())
    vm1 = np.asarray(cam.view_matrix())
    assert not np.allclose(vm0, vm1)
    cam.reset_coordinate_system()
    np.testing.assert_allclose(np.asarray(cam.view_matrix()), vm0, atol=1e-5)


def test_camera_cat_and_getitem():
    cam1 = make_camera()
    cam2 = make_camera()
    cam2.translate(jnp.array([1., 0., 0.]))
    both = Camera.cat([cam1, cam2])
    assert len(both) == 2
    sub = both[1]
    np.testing.assert_allclose(np.asarray(sub.view_matrix()),
                               np.asarray(cam2.view_matrix()), atol=1e-6)


def test_camera_pytree_jit():
    cam = make_camera()

    @jax.jit
    def f(camera, pts):
        return camera.transform(pts)

    pts = jnp.zeros((1, 5, 3))
    out = f(cam, pts)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(cam.transform(pts)), atol=1e-6)


def test_camera_grad_through_6dof():
    ext = CameraExtrinsics.from_lookat(
        eye=jnp.array([0., 0., 4.]), at=jnp.zeros(3),
        up=jnp.array([0., 1., 0.]), requires_grad=True)
    intr = PinholeIntrinsics.from_fov(32, 32, math.radians(45))
    pts = jnp.array([[[0.3, 0.2, 0.1]]])

    def loss(params):
        e = CameraExtrinsics(params, 'matrix_6dof_rotation')
        cam = Camera(e, intr)
        ndc = cam.transform(pts)
        return jnp.sum(ndc[..., :2] ** 2)

    g = jax.grad(loss)(ext.params)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_legacy_camera_path():
    from kaolin_tpu.render.camera import (
        generate_rotate_translate_matrices, rotate_translate_points,
        perspective_camera, generate_perspective_projection)
    cam_pos = jnp.array([[0., 0., 4.]])
    look_at = jnp.zeros((1, 3))
    up = jnp.array([[0., 1., 0.]])
    rot, trans = generate_rotate_translate_matrices(cam_pos, look_at, up)
    pts = jnp.array([[[0., 0., 0.], [1., 0., 0.]]])
    cam_pts = rotate_translate_points(pts, rot, trans)
    np.testing.assert_allclose(np.asarray(cam_pts[0, 0]), [0, 0, -4],
                               atol=1e-6)
    proj = generate_perspective_projection(math.radians(45))
    im_pts = perspective_camera(cam_pts, proj)
    np.testing.assert_allclose(np.asarray(im_pts[0, 0]), [0, 0], atol=1e-6)


def test_generate_rays():
    cam = make_camera()
    orig, d = cam.generate_rays()
    assert orig.shape == (1, 64 * 64, 3)
    # center rays point roughly toward -z (towards origin from (0,0,4))
    center = np.asarray(d[0].reshape(64, 64, 3)[32, 32])
    assert center[2] < -0.9
    np.testing.assert_allclose(np.asarray(orig[0, 0]), [0, 0, 4], atol=1e-5)
