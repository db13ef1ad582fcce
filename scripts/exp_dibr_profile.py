"""Profile the DIB-R 512^2 step phase by phase on the real chip.

NOTE: all device arrays are passed as jit ARGUMENTS — capturing a live
device array in a jitted closure permanently degrades the axon tunnel to
~1.4 ms/dispatch (see ops/gather.py docs + BENCH notes).
"""
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

backend = sys.argv[1] if len(sys.argv) > 1 else 'fused'

sel_fn = jax.jit(lambda p, v, f: M.compute_selection(
    p, v, f, height, width, backend=backend))
grad_fn = jax.jit(jax.grad(
    lambda p, sel, v, f, fu, ti, tm: M.render_loss(
        p, v, f, fu, ti, tm, height, width, selection=sel)))


def t(label, fn, *a, iters=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'{label}: {dt*1000:.2f} ms', flush=True)
    return out, dt


sel, dt_sel = t('selection', sel_fn, params, views, faces)
g, dt_grad = t('grad', grad_fn, params, sel, views, faces, face_uvs,
               target_images, target_masks)


def step(p, v, f, fu, ti, tm):
    s = sel_fn(p, v, f)
    return grad_fn(p, s, v, f, fu, ti, tm)


_, dt_step = t('pipelined step', step, params, views, faces, face_uvs,
               target_images, target_masks)
total = dt_sel + dt_grad
print(f'total: {total*1000:.2f} ms -> {height*width/total/1e6:.2f} Mpix/s')
print(f'pipelined: {dt_step*1000:.2f} ms -> '
      f'{height*width/dt_step/1e6:.2f} Mpix/s')
