"""Experiment: time mesh_to_spc level-10 on fox.obj + 1M-ray raytrace.

Timing discipline for the tunneled TPU: dependency-chained iterations
inside one jitted fori_loop, fenced by a scalar readback (see bench.py);
NO bulk device->host transfers.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from kaolin_tpu.io import obj
from kaolin_tpu.ops.conversions.trianglemesh import unbatched_mesh_to_spc
from kaolin_tpu.ops.spc.spc import scan_octrees, generate_points
from kaolin_tpu.render.spc.raytrace import unbatched_raytrace

LEVEL = int(os.environ.get('LEVEL', '10'))
NRAYS = int(os.environ.get('NRAYS', str(1024 * 1024)))
K_CAP = int(os.environ.get('K', '3'))          # max_nuggets = K_CAP * rays
COARSE = int(os.environ.get('COARSE', '0'))    # coarse band levels (opt-in)


def fence(x):
    return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


mesh = obj.import_mesh('/root/reference/sample_data/meshes/fox.obj',
                       triangulate=True)
v = np.asarray(mesh.vertices, np.float64)
c = (v.min(0) + v.max(0)) / 2
s = (v.max(0) - v.min(0)).max() / 2 * 1.05
fv = ((v - c) / s)[np.asarray(mesh.faces)]
print(f'faces={fv.shape[0]}', flush=True)

t0 = time.perf_counter()
octree, points, face_idx, bary = unbatched_mesh_to_spc(fv, LEVEL)
print(f'mesh_to_spc level={LEVEL}: {time.perf_counter()-t0:.2f}s, '
      f'octree_bytes={octree.shape[0]}, voxels={points.shape[0]}', flush=True)

max_level, pyramids, exsum = scan_octrees(octree, np.array([octree.shape[0]]))
point_hierarchy = generate_points(jnp.asarray(octree), pyramids, exsum)

side = int(np.sqrt(NRAYS))
ys, xs = np.meshgrid(np.linspace(-0.9, 0.9, side),
                     np.linspace(-0.9, 0.9, side), indexing='ij')
origin = jnp.asarray(np.stack(
    [xs.ravel(), ys.ravel(), np.full(side * side, -2.5)], -1), jnp.float32)
direction = np.stack([xs.ravel() * 0.1, ys.ravel() * 0.1,
                      np.ones(side * side)], -1)
direction = jnp.asarray(
    direction / np.linalg.norm(direction, axis=-1, keepdims=True),
    jnp.float32)
n = origin.shape[0]
print(f'rays={n}', flush=True)

kw = dict(trim=False, return_info=True, max_nuggets=K_CAP * n)
if COARSE:
    kw.update(max_nuggets_coarse=max(K_CAP // 2, 1) * n,
              coarse_levels=COARSE)


def rt_step(carry):
    o, sat = carry
    ridx, pidx, depths, info = unbatched_raytrace(
        octree, point_hierarchy, pyramids[0], exsum, o, direction, LEVEL,
        **kw)
    return origin + 0.0 * depths[:n, :1], sat | info.saturated


ITERS = 3
multi = jax.jit(lambda o: jax.lax.fori_loop(
    0, ITERS, lambda i, c: rt_step(c), (o, jnp.zeros((), bool))))

t0 = time.perf_counter()
out = multi(origin)
fence(out[0])
print(f'raytrace compile+run: {time.perf_counter()-t0:.2f}s', flush=True)
t0 = time.perf_counter()
fence(out[0])
rtt = time.perf_counter() - t0
t0 = time.perf_counter()
out = multi(origin)
fence(out[0])
dt = (time.perf_counter() - t0 - rtt) / ITERS
print(f'raytrace: {dt*1e3:.1f} ms/iter -> {n/dt/1e6:.2f} Mrays/s '
      f'(rtt {rtt*1e3:.0f} ms, saturated={bool(np.asarray(out[1]))})',
      flush=True)
