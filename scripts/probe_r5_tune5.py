"""Tuning probe 2: non-saturating raster configs + deftet correctness.

Run: nohup python -u scripts/probe_r5_tune2.py > /tmp/probe_r5t2.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

T0 = time.perf_counter()


def log(msg):
    print(f'[{time.perf_counter() - T0:7.1f}s] {msg}', flush=True)


import jax
import jax.numpy as jnp

log(f'devices: {jax.devices()}')


def fence(x):
    return float(jnp.asarray(x).reshape(-1)[0])


from kaolin_tpu.io import obj
from kaolin_tpu.models import inverse_render as M
from kaolin_tpu.render.mesh.deftet import deftet_sparse_render

mesh = obj.import_mesh('/root/reference/sample_data/meshes/fox.obj',
                       triangulate=True)

# ---- deftet: correctness of the reduced caps + one more timing -------
H = W = 256
P = H * W
knum = 30
faces = jnp.asarray(np.asarray(mesh.faces))
params = M.init_params(mesh, texture_res=16)
views = M.make_views(1)
fvc, fvi, fn = jax.lax.stop_gradient(M._prepare(params, views, faces))
fvz = fvc[..., 2]
ys, xs = jnp.meshgrid(jnp.linspace(-1., 1., H),
                      jnp.linspace(-1., 1., W), indexing='ij')
pixel_coords = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)[None]
render_ranges = jnp.broadcast_to(jnp.asarray([[-1e4, 0.]]), (P, 2))[None]
feats = jnp.broadcast_to(fn[:, :, None, :], fn.shape[:2] + (3, 3))

out_ref, fid_ref = deftet_sparse_render(
    pixel_coords, render_ranges, fvz, fvi, feats, knum=knum,
    max_candidates=4096, pixel_chunk=1024)
for mc, pc in ((1024, 512), (896, 384), (1024, 384)):
    out_x, fid_x = deftet_sparse_render(
        pixel_coords, render_ranges, fvz, fvi, feats, knum=knum,
        max_candidates=mc, pixel_chunk=pc)
    same = int(jnp.sum((fid_x != fid_ref).astype(jnp.int32)))
    err = float(jnp.max(jnp.abs(out_x - out_ref)))
    log(f'deftet mc{mc} pc{pc}: fidx diffs={same} max feat err={err:.2e}')
    if same == 0:
        def step(x, mc=mc, pc=pc):
            def loss_fn(fvi_in):
                out, fidx = deftet_sparse_render(
                    pixel_coords, render_ranges, fvz, fvi_in, feats,
                    knum=knum, max_candidates=mc, pixel_chunk=pc)
                return jnp.sum(jnp.where((fidx >= 0)[..., None], out, 0.))
            g = jax.grad(loss_fn)(x)
            return x - 1e-30 * g

        K = 4

        @jax.jit
        def multi(x):
            return jax.lax.fori_loop(0, K, lambda i, q: step(q), x)

        out = multi(fvi)
        fence(out)
        t0 = time.perf_counter()
        fence(out)
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = multi(fvi)
        fence(out)
        dt = max(time.perf_counter() - t0 - rtt, 1e-9) / K
        log(f'deftet mc{mc} pc{pc}: {dt*1e3:.1f} ms -> '
            f'{P/dt/1e6:.2f} Mpix/s')

log('tune5 done')
