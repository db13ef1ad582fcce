"""Round-5 probe: primitives for the SPC raster (coherent-ray) engine.

Measures, on the real chip (fenced in-jit chains, no bulk d2h):
 1. dense per-(ray, voxel-candidate) slab test throughput at tile scale
 2. jax.lax.top_k vs iterative min-extraction for per-ray hit extraction
 3. BFS per-level frontier counts for the bench config (band-cap design)

Run: nohup python -u scripts/probe_r5_raster.py > /tmp/probe_r5.log 2>&1 &
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


def time_k(fn, *args, K=8):
    """Time K dependency-chained calls inside one jitted fori_loop."""
    @jax.jit
    def multi(a0):
        def body(i, a):
            out = fn(a)
            return a0 + 0.0 * out.astype(a0.dtype).reshape(-1)[0]
        return jax.lax.fori_loop(0, K, body, a0)

    out = multi(args[0])
    fence(out)
    t0 = time.perf_counter()
    fence(out)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = multi(args[0])
    fence(out)
    return max(time.perf_counter() - t0 - rtt, 1e-9) / K


# ---- 1) dense slab test at tile scale -----------------------------------
R, C = 4096, 2048   # rays per tile x candidate voxels
key = jax.random.PRNGKey(0)
o = jax.random.uniform(key, (R, 3), minval=-1, maxval=1)
d = jax.random.normal(key, (R, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
vox = jax.random.randint(key, (C, 3), 0, 1024).astype(jnp.int32)


def slab_test(o):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    half = 1.0 / 1024
    lo = vox.astype(jnp.float32) * (2 * half) - 1.0       # (C, 3)
    t0 = (lo[None] - o[:, None]) * inv[:, None]           # (R, C, 3)
    t1 = t0 + 2 * half * inv[:, None]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tf > tn) & (tf > 0.) & (tn > 0.)
    return jnp.where(hit, tn, jnp.inf)                    # (R, C)


dt = time_k(lambda a: slab_test(a).min(axis=1), o)
log(f'slab test (R={R}, C={C}): {dt*1e3:.2f} ms -> '
    f'{R*C/dt/1e9:.2f} Gpairs/s')

# ---- 2) top_k vs iterative extraction -----------------------------------
tvals = slab_test(o)
for KH in (16, 32):
    def topk_fn(t):
        v, i = jax.lax.top_k(-t, KH)
        return v
    dt = time_k(lambda a: topk_fn(slab_test(a)), o)
    log(f'slab+top_k k={KH}: {dt*1e3:.2f} ms')

    def iter_fn(t):
        outs = []
        for _ in range(KH):
            m = jnp.min(t, axis=1, keepdims=True)
            am = jnp.argmin(t, axis=1, keepdims=True)
            outs.append(m[:, 0])
            t = jnp.where(jnp.arange(t.shape[1])[None] == am, jnp.inf, t)
        return jnp.stack(outs, -1)
    dt = time_k(lambda a: iter_fn(slab_test(a)), o)
    log(f'slab+iter-min k={KH}: {dt*1e3:.2f} ms')

# sort-based: lax.sort over the candidate axis with payload
def sort_fn(t):
    ids = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None], t.shape)
    tv, iv = jax.lax.sort((t, ids), num_keys=1)
    return tv[:, :32].astype(jnp.float32) + iv[:, :32].astype(jnp.float32)


dt = time_k(lambda a: sort_fn(slab_test(a)), o)
log(f'slab+full-sort(2048) take 32: {dt*1e3:.2f} ms')

# ---- 2b) cumsum-placement extraction -------------------------------------
def cumsum_place(t):
    hit = jnp.isfinite(t)
    pos = jnp.cumsum(hit, axis=1) - 1                      # (R, C)
    KH = 32
    # out[r, k] = t of the hit with rank k: one-hot contraction per k
    sel = hit & (pos < KH)
    # scatter-free: for each k, sum over candidates with pos==k
    oh = (pos[:, :, None] == jnp.arange(KH)[None, None]) & sel[:, :, None]
    return jnp.sum(jnp.where(oh, t[:, :, None], 0.), axis=1)


dt = time_k(lambda a: cumsum_place(slab_test(a)), o)
log(f'slab+cumsum-onehot place k=32: {dt*1e3:.2f} ms')

# ---- 3) BFS frontier profile on the bench octree ------------------------
from kaolin_tpu.io import obj
from kaolin_tpu.ops.conversions.trianglemesh import unbatched_mesh_to_spc
from kaolin_tpu.ops.spc.spc import scan_octrees

mesh = obj.import_mesh('/root/reference/sample_data/meshes/fox.obj',
                       triangulate=True)
level = 10
v = np.asarray(mesh.vertices, np.float64)
c = (v.min(0) + v.max(0)) / 2
s = (v.max(0) - v.min(0)).max() / 2 * 1.05
v = (v - c) / s
fv = v[np.asarray(mesh.faces)]
t0 = time.perf_counter()
octree, points, face_idx, bary = unbatched_mesh_to_spc(fv, level)
log(f'mesh_to_spc host: {time.perf_counter()-t0:.1f}s, '
    f'{points.shape[0]} voxels, {octree.shape[0]} bytes')
max_level, pyramids, exsum = scan_octrees(octree, np.array([octree.shape[0]]))
log(f'pyramid: {pyramids[0][0].tolist()}')

# instrumented BFS: reuse the production level pass but collect counts
import kaolin_tpu.render.spc.raytrace as RT

n_rays = 1 << 16
side = 1024
ys, xs = np.meshgrid(np.linspace(-0.9, 0.9, side),
                     np.linspace(-0.9, 0.9, side), indexing='ij')
o_all = np.stack([xs.ravel(), ys.ravel(), np.full(side * side, -2.5)], -1)
d_all = np.stack([xs.ravel() * 0.1, ys.ravel() * 0.1,
                  np.ones(side * side)], -1)
d_all = d_all / np.linalg.norm(d_all, axis=-1, keepdims=True)
# first chunk of 64K rays (a coherent image slab — the worst case)
o0 = jnp.asarray(o_all[:n_rays], jnp.float32)
d0 = jnp.asarray(d_all[:n_rays], jnp.float32)

cap = 3 * n_rays
ridx, pidx, t_in, t_out, count, sat = RT._raytrace_bfs(
    jnp.asarray(octree), jnp.asarray(exsum), o0, d0, level, cap)
log(f'BFS chunk0: count={int(count)} sat={bool(sat)}')

# per-level counts: run the BFS level-by-level via the internal pass
# (cheap reimplementation: count after each level using level= l)
for l in range(1, level + 1):
    r2, p2, ti2, to2, c2, s2 = RT._raytrace_bfs(
        jnp.asarray(octree), jnp.asarray(exsum), o0, d0, l, cap)
    log(f'  frontier after level {l}: {int(c2)} ({int(c2)/n_rays:.2f}/ray)'
        f' sat={bool(s2)}')

log('probe done')
