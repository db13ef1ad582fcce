"""Bisect which stage of the render_loss grad program is slow."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from kaolin_tpu.io import obj
from kaolin_tpu.models import inverse_render as M
from kaolin_tpu.render import mesh as mesh_render
from kaolin_tpu.models.inverse_render import _prepare

height = width = 512
mesh = obj.import_mesh('/root/reference/sample_data/meshes/fox.obj',
                       triangulate=True)
faces = jnp.asarray(np.asarray(mesh.faces))
face_uvs = jnp.asarray(np.asarray(mesh.uvs)[np.asarray(mesh.face_uvs_idx)])
params = M.init_params(mesh, texture_res=256)
views = M.make_views(1)
target_images = jnp.zeros((1, height, width, 3))
target_masks = jnp.zeros((1, height, width))

sel_fn = jax.jit(lambda p, v, f: M.compute_selection(
    p, v, f, height, width, backend='fused'))
sel = jax.block_until_ready(sel_fn(params, views, faces))


def timeit(label, fn, *a, iters=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f'{label}: {(time.perf_counter()-t0)/iters*1000:.2f} ms',
          flush=True)


def staged_loss(stage):
    def loss(p, v, f, fu, sel, ti, tm):
        B = v.camera_rot.shape[0]
        fvc, fvi, fn = _prepare(p, v, f)
        if stage == 'prepare':
            return jnp.sum(fvi ** 2) + jnp.sum(fvc[..., 2] ** 2)
        face_uvs_b = jnp.broadcast_to(fu[None], (B,) + fu.shape)
        fn_corner = jnp.broadcast_to(fn[:, :, None, :],
                                     fn.shape[:2] + (3, 3))
        (uv_map, normal_map), face_idx = mesh_render.rasterize(
            height, width, fvc[..., 2], fvi, [face_uvs_b, fn_corner],
            valid_faces=fn[..., 2] >= 0., backend='fused',
            precomputed_face_idx=sel[0])
        if stage == 'interp':
            return jnp.sum(uv_map ** 2) + jnp.sum(normal_map ** 2)
        texture = jnp.broadcast_to(p.texture_map[None],
                                   (B,) + p.texture_map.shape)
        albedo = mesh_render.texture_mapping(uv_map, texture,
                                             mode='bilinear')
        if stage == 'texture':
            return jnp.sum(albedo ** 2)
        lighting = mesh_render.spherical_harmonic_lighting(
            normal_map, jnp.broadcast_to(p.sh_coeffs[None], (B, 9)))
        images = albedo * jnp.clip(lighting, 0.)[..., None]
        images = jnp.clip(images, 0., 1.)
        images = jnp.where((face_idx >= 0)[..., None], images, 0.)
        if stage == 'image':
            return jnp.mean(jnp.abs(images - ti))
        soft_mask = mesh_render.dibr_soft_mask(
            fvi, face_idx, sigmainv=7000., kbuf=sel[1])
        from kaolin_tpu.metrics.render import mask_iou
        return jnp.mean(jnp.abs(images - ti)) + mask_iou(soft_mask, tm)
    return loss


for stage in ('prepare', 'interp', 'texture', 'image', 'full'):
    g = jax.jit(jax.grad(staged_loss(stage)))
    timeit(f'grad[{stage}]', g, params, views, faces, face_uvs, sel,
           target_images, target_masks)
