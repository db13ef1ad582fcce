"""Round-5 probe 2 (rev B): raster engine end-to-end on the bench config.

fox.obj level-10 octree, 1M camera-grid rays.  Measures exact hit stats
(with generous caps) then fenced throughput at candidate settings.

Run: nohup python -u scripts/probe_r5_raster2.py > /tmp/probe_r5b.log 2>&1 &
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
from kaolin_tpu.render.spc.raster import unbatched_raytrace_coherent

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


def stats(tag, **kw):
    try:
        t0 = time.perf_counter()
        hits = unbatched_raytrace_coherent(
            octree, ph, pyr0, exsum, o_dev, d_dev, level, **kw)
        log(f'{tag}: compile+run {time.perf_counter()-t0:.1f}s '
            f'hits={int(jnp.sum(hits.count))} sat={bool(hits.saturated)} '
            f'maxcount={int(jnp.max(hits.count))}')
    except Exception as e:
        log(f'{tag} FAILED: {type(e).__name__}: {e}')


def timed_trace(tag, **kw):
    try:
        t0 = time.perf_counter()
        hits = unbatched_raytrace_coherent(
            octree, ph, pyr0, exsum, o_dev, d_dev, level, **kw)
        log(f'{tag}: compile+run {time.perf_counter()-t0:.1f}s '
            f'hits={int(jnp.sum(hits.count))} sat={bool(hits.saturated)} '
            f'maxcount={int(jnp.max(hits.count))}')
        K = 4

        def step(o):
            h = unbatched_raytrace_coherent(
                octree, ph, pyr0, exsum, o, d_dev, level, **kw)
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
        log(f'{tag} FAILED: {type(e).__name__}: {e}')


# exact stats with generous caps (row tiling and 4x4 block tiling)
stats('STATS rows rt16 mv4096 k128', rays_per_tile=16, max_tile_voxels=4096,
      max_super_voxels=65536, knum=128)
stats('STATS grid rt16 mv4096 k128', rays_per_tile=16, max_tile_voxels=4096,
      max_super_voxels=65536, knum=128, grid_shape=(side, side))
stats('STATS grid rt16 mv2048 k128', rays_per_tile=16, max_tile_voxels=2048,
      max_super_voxels=32768, knum=128, grid_shape=(side, side))
stats('STATS grid rt16 mv1024 k128', rays_per_tile=16, max_tile_voxels=1024,
      max_super_voxels=16384, knum=128, grid_shape=(side, side))
stats('STATS grid rt64 mv2048 k128', rays_per_tile=64, max_tile_voxels=2048,
      max_super_voxels=32768, knum=128, grid_shape=(side, side))

timed_trace('TIME grid rt16 mv1536 k64', rays_per_tile=16,
            max_tile_voxels=1536, max_super_voxels=16384, knum=64,
            grid_shape=(side, side))
timed_trace('TIME rows rt16 mv2048 k64', rays_per_tile=16,
            max_tile_voxels=2048, max_super_voxels=24576, knum=64)
timed_trace('TIME grid rt64 mv2048 k64', rays_per_tile=64,
            max_tile_voxels=2048, max_super_voxels=16384, knum=64,
            grid_shape=(side, side))
log('probe2 done')
