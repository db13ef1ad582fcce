"""Experiment: time mesh_to_spc level-10 on fox.obj + 1M-ray raytrace."""
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

mesh = obj.import_mesh('/root/reference/sample_data/meshes/fox.obj',
                       triangulate=True)
v = np.asarray(mesh.vertices, np.float64)
# normalize to [-1, 1] with margin
c = (v.min(0) + v.max(0)) / 2
s = (v.max(0) - v.min(0)).max() / 2 * 1.05
v = (v - c) / s
fv = v[np.asarray(mesh.faces)]
print(f'faces={fv.shape[0]}', flush=True)

t0 = time.perf_counter()
octree, points, face_idx, bary = unbatched_mesh_to_spc(fv, LEVEL)
t_build = time.perf_counter() - t0
print(f'mesh_to_spc level={LEVEL}: {t_build:.2f}s, '
      f'octree_bytes={octree.shape[0]}, voxels={points.shape[0]}', flush=True)

t0 = time.perf_counter()
max_level, pyramids, exsum = scan_octrees(
    jnp.asarray(octree), np.array([octree.shape[0]]))
print(f'scan: {time.perf_counter()-t0:.2f}s max_level={max_level}', flush=True)
# full point hierarchy: pidx returned by raytrace indexes into this
point_hierarchy = generate_points(jnp.asarray(octree), pyramids, exsum)

# camera-style rays: pixel grid at z=-2.5 with slight perspective
side = int(np.sqrt(NRAYS))
ys, xs = np.meshgrid(np.linspace(-0.9, 0.9, side),
                     np.linspace(-0.9, 0.9, side), indexing='ij')
origin = np.stack([xs.ravel(), ys.ravel(), np.full(side * side, -2.5)], -1)
direction = np.stack([xs.ravel() * 0.1, ys.ravel() * 0.1,
                      np.ones(side * side)], -1)
direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
origin = jnp.asarray(origin, jnp.float32)
direction = jnp.asarray(direction, jnp.float32)
print(f'rays={origin.shape[0]}', flush=True)

K = int(os.environ.get('K', '32'))
t0 = time.perf_counter()
MAX_NUGGETS = origin.shape[0] * K
ridx, pidx, depths = unbatched_raytrace(
    octree, point_hierarchy, pyramids[0], exsum, origin, direction, LEVEL,
    trim=False, max_hits_per_ray=K, max_nuggets=MAX_NUGGETS)
jax.block_until_ready(ridx)
t_compile = time.perf_counter() - t0
print(f'raytrace compile+run: {t_compile:.2f}s', flush=True)

for it in range(3):
    t0 = time.perf_counter()
    ridx, pidx, depths = unbatched_raytrace(
        octree, point_hierarchy, pyramids[0], exsum, origin, direction,
        LEVEL, trim=False, max_hits_per_ray=K, max_nuggets=MAX_NUGGETS)
    jax.block_until_ready(ridx)
    dt = time.perf_counter() - t0
    print(f'raytrace iter {it}: {dt*1e3:.1f}ms -> '
          f'{origin.shape[0]/dt/1e6:.2f} Mrays/s', flush=True)
nhits = int((np.asarray(ridx) >= 0).sum())
if nhits == MAX_NUGGETS:
    print('WARNING: nugget output saturated max_nuggets; counts truncated',
          flush=True)
print(f'total nuggets: {nhits}', flush=True)
