"""Render utilities: texture mapping, SH lighting (legacy), vertex prep.

Parity: ``kaolin/render/mesh/utils.py`` (reference).
"""

import jax
import jax.numpy as jnp

from kaolin_tpu.render import camera as _camera
from kaolin_tpu.ops import mesh as _mesh_ops

__all__ = ['texture_mapping', 'spherical_harmonic_lighting',
           'prepare_vertices']


def _grid_sample_2d(image, coords_x, coords_y, mode='bilinear'):
    """Sample image (C, H, W) at continuous pixel coords (torch
    grid_sample convention, align_corners=False, padding_mode='border').

    coords are in [-1, 1]; -1 maps to pixel-edge -0.5, +1 to H-0.5.
    """
    C, H, W = image.shape
    # unnormalize (align_corners=False): x_pix = (x + 1) * W / 2 - 0.5
    x = (coords_x + 1.) * W / 2. - 0.5
    y = (coords_y + 1.) * H / 2. - 0.5
    if mode == 'nearest':
        # torch rounds half away... uses floor(x + 0.5) semantics
        xi = jnp.clip(jnp.floor(x + 0.5).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32), 0, H - 1)
        return image[:, yi, xi]
    elif mode == 'bilinear':
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)
        v00 = image[:, y0i, x0i]
        v01 = image[:, y0i, x1i]
        v10 = image[:, y1i, x0i]
        v11 = image[:, y1i, x1i]
        return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
                + v10 * (1 - wx) * wy + v11 * wx * wy)
    raise ValueError(f"unsupported mode {mode!r}")


def texture_mapping(texture_coordinates, texture_maps, mode='nearest'):
    """Sample texture maps at (OpenGL-convention) uv coordinates.

    Parity: ``kaolin/render/mesh/utils.py:23``: uvs in [0, 1] are clamped,
    y flipped (OpenGL bottom-up -> image top-down), then sampled with
    border padding and align_corners=False.

    Args:
        texture_coordinates: ``(B, h, w, 2)`` or ``(B, N, 2)`` uvs in [0,1].
        texture_maps: ``(B, C, h', w')``.
        mode: 'nearest' or 'bilinear'.

    Returns:
        ``(B, h, w, C)`` or ``(B, N, C)`` sampled features.
    """
    batch_size = texture_coordinates.shape[0]
    num_channels = texture_maps.shape[1]
    lead_shape = texture_coordinates.shape[1:-1]
    uv = texture_coordinates.reshape(batch_size, -1, 2)
    uv = jnp.clip(uv, 0., 1.)
    uv = uv * 2. - 1.
    cx = uv[..., 0]
    cy = -uv[..., 1]  # flip y

    out = jax.vmap(lambda img, x, y: _grid_sample_2d(img, x, y, mode))(
        texture_maps, cx, cy)  # (B, C, N)
    out = jnp.moveaxis(out, 1, -1)
    return out.reshape((batch_size,) + lead_shape + (num_channels,))


def spherical_harmonic_lighting(imnormal, lights):
    """Per-pixel SH9 lighting effect (deprecated in reference; kept for
    DIB-R tutorial parity).

    Parity: ``kaolin/render/mesh/utils.py:78``.

    Args:
        imnormal: ``(B, H, W, 3)`` per-pixel normals.
        lights: ``(B, 9)`` SH coefficients.

    Returns:
        ``(B, H, W)`` lighting effect.
    """
    x = imnormal[..., 0]
    y = imnormal[..., 1]
    z = imnormal[..., 2]
    bands = jnp.stack([
        0.28209479177 * jnp.ones_like(x),
        0.4886025119 * x,
        0.4886025119 * z,
        0.4886025119 * y,
        1.09254843059 * (x * y),
        1.09254843059 * (y * z),
        0.94617469575 * (z * z) - 0.31539156525,
        0.77254840404 * (x * z),
        0.38627420202 * (x * x - y * y)], axis=-1)
    return jnp.sum(bands * lights.reshape(-1, 1, 1, 9), axis=-1)


def prepare_vertices(vertices, faces, camera_proj, camera_rot=None,
                     camera_trans=None, camera_transform=None):
    """Transform + project vertices, index by faces, compute face normals.

    Parity: ``kaolin/render/mesh/utils.py:128``.

    Returns:
        (face_vertices_camera ``(B, F, 3, 3)``,
         face_vertices_image ``(B, F, 3, 2)``,
         face_normals ``(B, F, 3)``).
    """
    if camera_transform is None:
        assert camera_trans is not None and camera_rot is not None, \
            "camera_transform or camera_trans and camera_rot must be defined"
        vertices_camera = _camera.rotate_translate_points(
            vertices, camera_rot, camera_trans)
    else:
        assert camera_trans is None and camera_rot is None, \
            "camera_trans and camera_rot must be None when camera_transform " \
            "is defined"
        padded = jnp.pad(vertices, ((0, 0), (0, 0), (0, 1)),
                         constant_values=1.)
        vertices_camera = padded @ camera_transform
    vertices_image = _camera.perspective_camera(vertices_camera, camera_proj)
    face_vertices_camera = _mesh_ops.index_vertices_by_faces(
        vertices_camera, faces)
    face_vertices_image = _mesh_ops.index_vertices_by_faces(
        vertices_image, faces)
    face_normals = _mesh_ops.face_normals(face_vertices_camera, unit=True)
    return face_vertices_camera, face_vertices_image, face_normals
