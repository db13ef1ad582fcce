"""Break down the DIB-R grad epilogue cost at 512^2 on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from kaolin_tpu.io import obj
from kaolin_tpu.models import inverse_render as M

height = width = 512
mesh = obj.import_mesh('/root/reference/sample_data/meshes/fox.obj',
                       triangulate=True)
faces = jnp.asarray(np.asarray(mesh.faces))
face_uvs = jnp.asarray(np.asarray(mesh.uvs)[np.asarray(mesh.face_uvs_idx)])
params = M.init_params(mesh, texture_res=256)
views = M.make_views(1)
target_images = jnp.zeros((1, height, width, 3))
target_masks = jnp.zeros((1, height, width))

sel_fn = jax.jit(lambda p: M.compute_selection(
    p, views, faces, height, width, backend='fused'))
sel = jax.block_until_ready(sel_fn(params))


def timeit(label, fn, *a, iters=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'{label}: {dt*1000:.2f} ms', flush=True)
    return dt


# full grad, with and without soft mask
for wsm in (True, False):
    g = jax.jit(jax.grad(lambda p, s: M.render_loss(
        p, views, faces, face_uvs, target_images, target_masks,
        height, width, selection=s, with_soft_mask=wsm)))
    timeit(f'grad with_soft_mask={wsm}', g, params, sel)

# forward only
f = jax.jit(lambda p, s: M.render_loss(
    p, views, faces, face_uvs, target_images, target_masks,
    height, width, selection=s))
timeit('forward loss only', f, params, sel)

# soft-mask backward kernel alone
from kaolin_tpu.render.mesh import _fused as FU
fvi = jax.random.normal(jax.random.key(0), ()).astype(jnp.float32)  # dummy
sel_obj = sel[1]
g_prod = jnp.ones((1, height, width), jnp.float32)
g_prod_t = FU._tile_image(g_prod, height, width)
bwd = jax.jit(lambda vt, tr, bb, gp: FU._fused_backward(
    vt, tr, bb, gp, height, width, 1000., 7000., False))
timeit('softmask bwd kernel', bwd, sel_obj.vt, sel_obj.chunk_tranges,
       sel_obj.chunk_bbox, g_prod_t)
