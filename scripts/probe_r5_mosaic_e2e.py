"""Mosaic raster engine end-to-end on the bench config (fox level-10,
1M camera rays): correctness totals vs the BFS, fenced throughput.

Run: nohup python -u scripts/probe_r5_mosaic_e2e.py > /tmp/probe_r5e.log 2>&1 &
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
from kaolin_tpu.ops.conversions.trianglemesh import unbatched_mesh_to_spc
from kaolin_tpu.ops.spc.spc import scan_octrees, generate_points
from kaolin_tpu.render.spc.raster import (
    build_cell_table, unbatched_raytrace_coherent)
from kaolin_tpu.render.spc.raytrace import unbatched_raytrace

mesh = obj.import_mesh('/root/reference/sample_data/meshes/fox.obj',
                       triangulate=True)
level = 10
v = np.asarray(mesh.vertices, np.float64)
c = (v.min(0) + v.max(0)) / 2
s = (v.max(0) - v.min(0)).max() / 2 * 1.05
v = (v - c) / s
fv = v[np.asarray(mesh.faces)]
octree, points, face_idx, bary = unbatched_mesh_to_spc(fv, level)
log(f'octree: {points.shape[0]} voxels')
max_level, pyramids, exsum = scan_octrees(octree, np.array([octree.shape[0]]))
pyr0 = np.asarray(pyramids)[0]
ph = generate_points(jnp.asarray(octree), pyramids, exsum)

t0 = time.perf_counter()
table = build_cell_table(ph, pyr0, level)
ovf = int(table.overflow)
log(f'cell table built in {time.perf_counter()-t0:.1f}s, overflow={ovf}')

side = 1024
n_rays = side * side
ys, xs = np.meshgrid(np.linspace(-0.9, 0.9, side),
                     np.linspace(-0.9, 0.9, side), indexing='ij')
o_all = np.stack([xs.ravel(), ys.ravel(), np.full(n_rays, -2.5)],
                 -1).astype(np.float32)
d_all = np.stack([xs.ravel() * 0.1, ys.ravel() * 0.1, np.ones(n_rays)], -1)
d_all = (d_all / np.linalg.norm(d_all, axis=-1, keepdims=True)
         ).astype(np.float32)
o_dev = jnp.asarray(o_all)
d_dev = jnp.asarray(d_all)

# ---- ground truth: BFS total count -----------------------------------
try:
    t0 = time.perf_counter()
    ridx, pidx, depths, info = unbatched_raytrace(
        octree, ph, pyr0, exsum, o_dev, d_dev, level, trim=False,
        return_info=True, max_nuggets=3 * n_rays)
    bfs_count = int(info.count)
    log(f'BFS: count={bfs_count} sat={bool(info.saturated)} '
        f'({time.perf_counter()-t0:.1f}s compile+run)')
except Exception as e:
    log(f'BFS FAILED: {type(e).__name__}: {e}')
    bfs_count = -1


def timed(tag, **kw):
    try:
        t0 = time.perf_counter()
        hits = unbatched_raytrace_coherent(
            octree, ph, pyr0, exsum, o_dev, d_dev, level,
            cell_table=table, engine='mosaic', **kw)
        total = int(jnp.sum(hits.count))
        log(f'{tag}: compile+run {time.perf_counter()-t0:.1f}s '
            f'hits={total} (bfs {bfs_count}) sat={bool(hits.saturated)} '
            f'maxcount={int(jnp.max(hits.count))}')
        K = 4

        def step(o):
            h = unbatched_raytrace_coherent(
                octree, ph, pyr0, exsum, o, d_dev, level,
                cell_table=table, engine='mosaic', **kw)
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
        log(f'{tag}: {dt*1e3:.1f} ms/trace -> {n_rays/dt/1e6:.1f} Mrays/s '
            f'(rtt {rtt*1e3:.0f} ms)')
    except Exception as e:
        import traceback
        traceback.print_exc()
        log(f'{tag} FAILED: {type(e).__name__}: {e}')


timed('mosaic grid k192 noexit', knum=192, grid_shape=(side, side),
      with_exit=False)
timed('mosaic grid k192 exit', knum=192, grid_shape=(side, side))
timed('mosaic grid k192 ne8k', knum=192, grid_shape=(side, side),
      with_exit=False, max_active_blocks=16384)
log('e2e probe done')
