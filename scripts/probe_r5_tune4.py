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

# ---- raster non-saturating sweep -------------------------------------
from kaolin_tpu.ops.conversions.trianglemesh import unbatched_mesh_to_spc
from kaolin_tpu.ops.spc.spc import scan_octrees, generate_points
from kaolin_tpu.render.spc.raster import (
    build_cell_table, unbatched_raytrace_coherent, _block_order)

level = 10
v = np.asarray(mesh.vertices, np.float64)
c = (v.min(0) + v.max(0)) / 2
s = (v.max(0) - v.min(0)).max() / 2 * 1.05
v = (v - c) / s
fv = v[np.asarray(mesh.faces)]
octree, points, fidx_, bary = unbatched_mesh_to_spc(fv, level)
max_level, pyramids, exsum = scan_octrees(octree, np.array([octree.shape[0]]))
pyr0 = np.asarray(pyramids)[0]
ph = generate_points(jnp.asarray(octree), pyramids, exsum)
table = build_cell_table(ph, pyr0, level)
log('raster setup done')

side = 1024
n_rays = side * side
ys, xs = np.meshgrid(np.linspace(-0.9, 0.9, side),
                     np.linspace(-0.9, 0.9, side), indexing='ij')
o_all = np.stack([xs.ravel(), ys.ravel(), np.full(n_rays, -2.5)],
                 -1).astype(np.float32)
d_all = np.stack([xs.ravel() * 0.1, ys.ravel() * 0.1, np.ones(n_rays)], -1)
d_all = (d_all / np.linalg.norm(d_all, axis=-1, keepdims=True)
         ).astype(np.float32)
perm, _ = _block_order(side, side, 4, 4)
o_dev = jnp.asarray(o_all[perm])
d_dev = jnp.asarray(d_all[perm])


def time_raster(tag, **kw):
    try:
        hits = unbatched_raytrace_coherent(
            octree, ph, pyr0, exsum, o_dev, d_dev, level,
            cell_table=table, engine='mosaic', with_exit=False,
            knum=256, **kw)
        tot = int(jnp.sum(hits.count))
        sat = bool(hits.saturated)
        if sat:
            log(f'{tag}: SATURATED (hits={tot}) — skip timing')
            return
        K = 4

        def step(o):
            h = unbatched_raytrace_coherent(
                octree, ph, pyr0, exsum, o, d_dev, level,
                cell_table=table, engine='mosaic', with_exit=False,
                knum=256, **kw)
            tn = jnp.where(jnp.isfinite(h.t_near[:, :1]),
                           h.t_near[:, :1], 0.)
            return o_dev + 1e-20 * tn

        @jax.jit
        def multi(o):
            return jax.lax.fori_loop(0, K, lambda i, oo: step(oo), o)

        out = multi(o_dev)
        fence(out)
        t0 = time.perf_counter()
        fence(out)
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = multi(o_dev)
        fence(out)
        dt = max(time.perf_counter() - t0 - rtt, 1e-9) / K
        log(f'{tag}: {dt*1e3:.1f} ms -> {n_rays/dt/1e6:.1f} Mrays/s '
            f'(hits={tot} sat={sat})')
    except Exception as e:
        log(f'{tag} FAILED: {type(e).__name__}: {str(e)[:160]}')


time_raster('rH rt32 k256 mab8k', max_super_voxels=512 * 192,
            rays_per_tile=32, max_active_blocks=8192,
            segments=((512, 192), (1536, 48), (4096, 16), (None, 4)))
time_raster('rI rt32 k256 mab16k', max_super_voxels=512 * 192,
            rays_per_tile=32, max_active_blocks=16384,
            segments=((512, 192), (1536, 48), (4096, 16), (None, 4)))
log('tune4 done')
