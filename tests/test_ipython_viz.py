"""Notebook visualizer tests, mock-driven like the reference's
(``/root/reference/tests/python/kaolin/visualize/test_ipython.py``):
the canvas widgets are optional, so the camera-motion logic and render
loop are exercised headless through the mouse-event handlers.
"""
import math

import numpy as np
import pytest
import jax.numpy as jnp

import kaolin_tpu as kal
from kaolin_tpu.visualize.ipython import (
    IpyFirstPersonVisualizer, IpyTurntableVisualizer, update_canvas)


class FakeCanvas:
    def __init__(self):
        self.images = []

    def put_image_data(self, img):
        self.images.append(np.asarray(img))


def make_camera():
    return kal.render.camera.Camera.from_args(
        eye=jnp.array([0., 0., 3.]), at=jnp.zeros(3),
        up=jnp.array([0., 1., 0.]), fov=math.pi / 4.,
        width=16, height=16)


def render(camera):
    """Trivial render callback: encodes the camera position in pixels."""
    pos = np.asarray(camera.cam_pos()).reshape(-1)[:3]
    img = np.zeros((16, 16, 3), np.float32)
    img[..., :] = np.abs(pos) / (np.abs(pos).max() + 1e-9)
    return img


def test_draw_renders_uint8_image():
    viz = IpyTurntableVisualizer(16, 16, make_camera(), render, max_fps=None)
    img = viz._draw(viz.render)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8


def test_draw_fps_throttle():
    viz = IpyTurntableVisualizer(16, 16, make_camera(), render, max_fps=24.)
    first = viz._draw(viz.render)
    second = viz._draw(viz.render)   # immediately after -> throttled
    assert first is not None and second is None


def test_turntable_orbit_preserves_focus_distance():
    viz = IpyTurntableVisualizer(16, 16, make_camera(), render,
                                 max_fps=None)
    start = np.asarray(viz.camera.cam_pos()).reshape(-1)[:3]
    d0 = np.linalg.norm(start - viz.focus_at)
    viz._handle_mouse_down(8, 8)
    viz._handle_mouse_move(12, 10)
    viz._handle_mouse_up(12, 10)
    end = np.asarray(viz.camera.cam_pos()).reshape(-1)[:3]
    d1 = np.linalg.norm(end - viz.focus_at)
    assert not np.allclose(start, end)          # camera moved
    np.testing.assert_allclose(d0, d1, rtol=1e-4)  # still on the orbit


def test_turntable_drag_requires_mouse_down():
    viz = IpyTurntableVisualizer(16, 16, make_camera(), render,
                                 max_fps=None)
    start = np.asarray(viz.camera.cam_pos()).reshape(-1)[:3]
    viz._handle_mouse_move(12, 10)   # no mouse_down first
    end = np.asarray(viz.camera.cam_pos()).reshape(-1)[:3]
    np.testing.assert_allclose(start, end)


def test_first_person_move_forward():
    viz = IpyFirstPersonVisualizer(16, 16, make_camera(), render,
                                   max_fps=None)
    start = np.asarray(viz.camera.cam_pos()).reshape(-1)[:3]
    viz.move_forward(0.5)
    end = np.asarray(viz.camera.cam_pos()).reshape(-1)[:3]
    # reference convention (extrinsics.py:898-905: t -= world_z * amount,
    # formula-identical here): translation along the camera z axis, which
    # for a lookat camera at +z points from the target to the eye
    np.testing.assert_allclose(end - start, [0., 0., 0.5], atol=1e-5)


def test_first_person_look_changes_orientation():
    viz = IpyFirstPersonVisualizer(16, 16, make_camera(), render,
                                   max_fps=None)
    before = np.asarray(viz.camera.extrinsics.view_matrix())
    viz._handle_mouse_down(8, 8)
    viz._handle_mouse_move(10, 9)
    after = np.asarray(viz.camera.extrinsics.view_matrix())
    assert not np.allclose(before, after)


def test_update_canvas_converts_float():
    canvas = FakeCanvas()
    update_canvas(canvas, np.full((4, 4, 3), 0.5, np.float32))
    assert canvas.images[0].dtype == np.uint8
    assert canvas.images[0][0, 0, 0] == 127
