"""Pixel-tile (image-row) sharding of the rasterizer.

SURVEY.md §2.3 calls for a ``(data, tile)`` mesh: views data-parallel on
one axis, each view's pixel rows split over the other so a single huge
render (driver config #5: 1024^2 x 64 views) spreads across chips.
Rasterization is gather-only over the face set, so row slabs need no
halo exchange — each device sweeps every face against its rows and the
outputs concatenate along the row axis (``out_specs`` does the stitch;
no collective is needed until the backward pass psums parameter grads).
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

__all__ = ['tile_sharded_selection', 'tile_sharded_render_loss']


def _shard_map():
    try:
        from jax import shard_map

        def wrap(f, mesh, in_specs, out_specs):
            return shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except ImportError:  # jax < 0.8
        from jax.experimental.shard_map import shard_map

        def wrap(f, mesh, in_specs, out_specs):
            return shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)
    return wrap


def tile_sharded_selection(mesh, face_vertices_z, face_vertices_image,
                           valid_faces, height, width, tile_axis='tile',
                           multiplier=1000., eps=1e-8):
    """Z-buffer selection with image rows sharded over ``tile_axis``.

    Each device renders its contiguous slab of ``height // ndev`` rows
    (faces replicated); results stitch to the full ``(B, H, W)`` image.
    Matches :func:`kaolin_tpu.render.mesh.rasterize_selection` with the
    'jnp' backend exactly (see tests/test_parallel.py).

    Args:
        mesh: a ``jax.sharding.Mesh`` containing ``tile_axis``.
        face_vertices_z: (B, F, 3) camera z.
        face_vertices_image: (B, F, 3, 2) image coords in [-1, 1].
        valid_faces: (B, F) bool.
        height, width: full image size; ``height`` must divide evenly by
            the tile-axis size.
        tile_axis: mesh axis name to shard rows over.

    Returns:
        (B, H, W) int32 winning-face image (-1 = background).
    """
    from kaolin_tpu.render.mesh.rasterization import (_selection_jnp,
                                                      pixel_coords)
    ndev = mesh.shape[tile_axis]
    if height % ndev:
        raise ValueError(f'height {height} not divisible by tile axis '
                         f'size {ndev}')
    rows_local = height // ndev
    fvi_scaled = face_vertices_image * multiplier
    dtype = face_vertices_z.dtype

    def local(fvz, fvi, valid):
        ti = jax.lax.axis_index(tile_axis)
        xs, ys = pixel_coords(height, width, multiplier, dtype=dtype)
        ys_local = jax.lax.dynamic_slice(ys, (ti * rows_local,),
                                         (rows_local,))
        return jax.lax.map(
            lambda ziv: _selection_jnp(
                ziv[0], ziv[1], ziv[2], xs, ys_local,
                height=rows_local, width=width, eps=eps),
            (jax.lax.stop_gradient(fvz), jax.lax.stop_gradient(fvi),
             valid))

    sharded = _shard_map()(
        local, mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(None, tile_axis, None))
    return sharded(face_vertices_z, fvi_scaled, valid_faces)


def tile_sharded_render_loss(mesh, params, views, faces, face_uvs,
                             target_images, target_masks, height, width,
                             data_axis='data', tile_axis='tile',
                             sigmainv=7000., boxlen=0.02, knum=30,
                             multiplier=1000., eps=1e-8):
    """DIB-R textured render loss sharded over a ``(data, tile)`` mesh —
    views data-parallel, each view's image ROWS split over ``tile_axis``
    — fully DIFFERENTIABLE: ``jax.grad`` of this loss yields parameter
    gradients psum-reduced over BOTH mesh axes (SURVEY §2.3; driver
    config #5: 64 views x 1024^2 over >= 2 hosts).

    Every stage runs on the local row slab only: z-buffer selection,
    texture/SH epilogue, and the soft-mask k-buffer + epilogue (via the
    slab-aware ``ys`` of :func:`~kaolin_tpu.render.mesh.dibr.
    _soft_mask_epilogue`).  The only cross-device communication is the
    scalar-loss reduction (and, under ``grad``, its transpose: one psum
    of the parameter gradients) — rasterization is gather-free across
    rows, so there is no halo exchange.

    Matches the single-device ``models.inverse_render.render_loss``
    (jnp backend) to float tolerance in BOTH value and gradients
    (tests/test_parallel.py).

    Args:
        mesh: Mesh with ``data_axis`` (divides num_views) and
            ``tile_axis`` (divides height).
        params: InverseRenderParams (replicated).
        views: CameraViews (sharded over views by this function).
        target_images: (B, H, W, 3); target_masks: (B, H, W).

    Returns:
        scalar loss (replicated).
    """
    from kaolin_tpu.models import inverse_render as M
    from kaolin_tpu.render.mesh.rasterization import (
        _selection_jnp, _interpolate_selected_batched, pixel_coords)
    from kaolin_tpu.render.mesh.dibr import (_soft_mask_select,
                                             _soft_mask_epilogue)
    from kaolin_tpu.render.mesh import (texture_mapping,
                                        spherical_harmonic_lighting)

    ndev_t = mesh.shape[tile_axis]
    num_views = views.camera_rot.shape[0]
    if height % ndev_t:
        raise ValueError(f'height {height} % tile axis {ndev_t} != 0')
    rows = height // ndev_t
    proj = views.camera_proj

    def local(p, rot, trans, t_img, t_mask):
        ti = jax.lax.axis_index(tile_axis)
        B = rot.shape[0]
        xs, ys_full = pixel_coords(height, width, multiplier,
                                   dtype=p.vertices.dtype)
        ys = jax.lax.dynamic_slice(ys_full, (ti * rows,), (rows,))
        t_img = jax.lax.dynamic_slice(
            t_img, (0, ti * rows, 0, 0), (B, rows, width, 3))
        t_mask = jax.lax.dynamic_slice(
            t_mask, (0, ti * rows, 0), (B, rows, width))

        v = M.CameraViews(rot, trans, proj)
        fvc, fvi, fn = M._prepare(p, v, faces)
        fvi_scaled = fvi * multiplier
        valid = fn[..., 2] >= 0.

        face_idx = jax.lax.map(
            lambda ziv: _selection_jnp(
                ziv[0], ziv[1], ziv[2], xs, ys, height=rows, width=width,
                eps=eps),
            (jax.lax.stop_gradient(fvc[..., 2]),
             jax.lax.stop_gradient(fvi_scaled), valid))

        face_uvs_b = jnp.broadcast_to(face_uvs[None],
                                      (B,) + face_uvs.shape)
        fn_corner = jnp.broadcast_to(fn[:, :, None, :],
                                     fn.shape[:2] + (3, 3))
        feats = jnp.concatenate([face_uvs_b, fn_corner], axis=-1)
        img_feats, _ = _interpolate_selected_batched(
            face_idx, fvi_scaled, feats, xs, ys, eps)
        uv_map = img_feats[..., :2]
        normal_map = img_feats[..., 2:5]
        texture = jnp.broadcast_to(p.texture_map[None],
                                   (B,) + p.texture_map.shape)
        albedo = texture_mapping(uv_map, texture, mode='bilinear')
        lighting = spherical_harmonic_lighting(
            normal_map, jnp.broadcast_to(p.sh_coeffs[None], (B, 9)))
        images = jnp.clip(albedo * jnp.clip(lighting, 0.)[..., None],
                          0., 1.)
        images = jnp.where((face_idx >= 0)[..., None], images, 0.)

        # soft mask on the local slab
        pts_min = jnp.min(fvi_scaled, axis=-2)
        pts_max = jnp.max(fvi_scaled, axis=-2)
        bboxes = jnp.concatenate([pts_min - boxlen * multiplier,
                                  pts_max + boxlen * multiplier], axis=-1)
        empty = face_idx < 0
        kbuf = jax.lax.map(
            lambda be: _soft_mask_select(be[0], be[1], xs, ys,
                                         height=rows, width=width,
                                         knum=knum),
            (jax.lax.stop_gradient(bboxes), empty))
        soft_mask = _soft_mask_epilogue(
            fvi_scaled, jax.lax.stop_gradient(kbuf), empty, xs, ys,
            float(sigmainv), float(multiplier))

        # losses as pixel partial sums, reduced over the tile axis
        l1_sum = jax.lax.psum(jnp.sum(jnp.abs(images - t_img)),
                              tile_axis)
        image_loss = l1_sum / (num_views * height * width * 3)
        mul = soft_mask * t_mask
        add = soft_mask + t_mask
        iou_up = jax.lax.psum(
            jnp.sum(mul.reshape(B, -1), axis=1), tile_axis)
        iou_down = jax.lax.psum(
            jnp.sum((add - mul).reshape(B, -1), axis=1), tile_axis)
        iou = jnp.sum(iou_up / (iou_down + 1e-10))
        mask_loss = 1.0 - jax.lax.psum(iou, data_axis) / num_views
        return jax.lax.psum(image_loss, data_axis) + mask_loss

    sharded = _shard_map()(
        local, mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P(data_axis),
                  P(data_axis)),
        out_specs=P())
    return sharded(params, views.camera_rot, views.camera_trans,
                   target_images, target_masks)
