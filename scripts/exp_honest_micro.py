"""Honest TPU microbenchmarks.

The axon tunnel runs fully async ("lazy futures"): block_until_ready does
NOT wait for execution until the process has performed one device->host
readback, after which every dispatch synchronizes (~1.4ms RTT).  Honest
protocol: poison first with a tiny D2H, measure a trivial dispatch as
baseline, report (t - baseline).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_ = np.asarray(jnp.ones((8,)))   # poison: force sync dispatch mode

BASE = None


def timeit(label, fn, *a, iters=20):
    global BASE
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    if BASE is None:
        BASE = dt
        print(f'{label}: {dt:.3f} ms [baseline]', flush=True)
    else:
        print(f'{label}: {dt:.3f} ms  (net {dt - BASE:.3f})', flush=True)
    return dt


timeit('trivial dispatch', jax.jit(lambda x: x * 2.0), jnp.ones((128, 128)))

P = 512 * 512
F = 10240
T = 256

idx_rand = jax.random.randint(jax.random.key(1), (P,), 0, F)
mask = jax.random.uniform(jax.random.key(3), (P,)) < 0.6
idx_hot = jnp.where(mask, 0, idx_rand)
g16 = jax.random.normal(jax.random.key(2), (P, 16))
g6 = jax.random.normal(jax.random.key(2), (P, 6))
g3 = jax.random.normal(jax.random.key(2), (P, 3))
tbl16 = jax.random.normal(jax.random.key(0), (F, 16))

timeit('gather (F,16) flat', jax.jit(lambda t, i: t[i]), tbl16, idx_rand)
timeit('gather (1,F,3,5) batched', jax.jit(
    lambda t, i: jax.vmap(lambda tt, ii: tt[ii])(t, i)),
    jax.random.normal(jax.random.key(0), (1, F, 3, 5)),
    idx_rand.reshape(1, 512, 512))
timeit('scat (F,16) rand', jax.jit(
    lambda i, v: jnp.zeros((F, 16), v.dtype).at[i].add(v)), idx_rand, g16)
timeit('scat (F,16) hot', jax.jit(
    lambda i, v: jnp.zeros((F, 16), v.dtype).at[i].add(v)), idx_hot, g16)
timeit('scat (F,6) rand', jax.jit(
    lambda i, v: jnp.zeros((F, 6), v.dtype).at[i].add(v)), idx_rand, g6)
timeit('scat (F,3) rand', jax.jit(
    lambda i, v: jnp.zeros((F, 3), v.dtype).at[i].add(v)), idx_rand, g3)
timeit('scat (T*T,3) rand', jax.jit(
    lambda i, v: jnp.zeros((T * T, 3), v.dtype).at[i].add(v)),
    jax.random.randint(jax.random.key(4), (P,), 0, T * T), g3)
timeit('scat (T*T,3) 4-tap', jax.jit(
    lambda i, v: (jnp.zeros((T * T, 3), v.dtype).at[i].add(v)
                  .at[i + 1].add(v).at[i + T].add(v).at[i + T + 1].add(v))),
    jax.random.randint(jax.random.key(4), (P,), 0, T * T - T - 2), g3)
timeit('scat (T*T,8) 4-tap', jax.jit(
    lambda i, v: (jnp.zeros((T * T, 8), v.dtype).at[i].add(v)
                  .at[i + 1].add(v).at[i + T].add(v).at[i + T + 1].add(v))),
    jax.random.randint(jax.random.key(4), (P,), 0, T * T - T - 2),
    jnp.pad(g3, ((0, 0), (0, 5))))

# one-hot matmul scatter alternative (MXU)
def onehot_scatter(i, v):
    oh = jax.nn.one_hot(i // 64, F // 64, dtype=jnp.bfloat16)
    sub = jax.nn.one_hot(i % 64, 64, dtype=jnp.bfloat16)
    # (P, F/64) x (P, 64) -> too big; do direct one-hot in chunks instead
    return None


# segment-sum alternative
timeit('sort+segsum (F,16)', jax.jit(
    lambda i, v: jax.ops.segment_sum(
        v[jnp.argsort(i)], jnp.sort(i), num_segments=F,
        indices_are_sorted=True)), idx_rand, g16)

# texture bilinear custom vjp fwd / bwd
from kaolin_tpu.render.mesh.utils import _bilinear_sample
uv = jax.random.uniform(jax.random.key(5), (P, 2)) * (T - 2)
tex_rows = jax.random.uniform(jax.random.key(0), (T * T, 3))
timeit('tex bilinear fwd', jax.jit(
    lambda t, u: _bilinear_sample(t, u[:, 0], u[:, 1], (T, T, 1, P))),
    tex_rows, uv)
timeit('tex bilinear fwd+bwd', jax.jit(jax.grad(
    lambda t, u: jnp.sum(_bilinear_sample(t, u[:, 0], u[:, 1],
                                          (T, T, 1, P)) ** 2))),
    tex_rows, uv)

# interp custom path
from kaolin_tpu.render.mesh.rasterization import (
    _interpolate_selected_batched, pixel_coords)
xs, ys = pixel_coords(512, 512, 1000.)
face_idx = jax.random.randint(jax.random.key(1), (1, 512, 512), -1, F)
fvi = jax.random.normal(jax.random.key(2), (1, F, 3, 2)) * 500.
feats = jax.random.normal(jax.random.key(3), (1, F, 3, 5))
timeit('interp fwd', jax.jit(
    lambda fi, fv, ff, x, y: _interpolate_selected_batched(
        fi, fv, ff, x, y, 1e-8)[0]), face_idx, fvi, feats, xs, ys)
timeit('interp fwd+bwd', jax.jit(jax.grad(
    lambda fv, ff, fi, x, y: jnp.sum(_interpolate_selected_batched(
        fi, fv, ff, x, y, 1e-8)[0] ** 2), argnums=(0, 1))),
    fvi, feats, face_idx, xs, ys)

# SH lighting
from kaolin_tpu.render.mesh.utils import spherical_harmonic_lighting
normals = jax.random.normal(jax.random.key(1), (1, 512, 512, 3))
sh = jnp.zeros((1, 9)).at[:, 0].set(3.)
timeit('sh fwd+bwd', jax.jit(jax.grad(
    lambda n, s: jnp.sum(spherical_harmonic_lighting(n, s) ** 2))),
    normals, sh)
