"""Pin down which gather/scatter layouts are slow on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

H = W = 512
P = H * W
F = 10240
idx2d = jax.random.randint(jax.random.key(1), (H, W), 0, F)
idx1d = idx2d.reshape(-1)


def timeit(label, fn, *a, iters=20):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'{label}: {dt*1000:.3f} ms', flush=True)
    return dt


tbl32 = jax.random.normal(jax.random.key(0), (F, 3, 2))
tbl35 = jax.random.normal(jax.random.key(0), (F, 3, 5))
tbl6 = tbl32.reshape(F, 6)
tbl15 = tbl35.reshape(F, 15)
tbl16 = jnp.pad(tbl15, ((0, 0), (0, 1)))

timeit('gather (F,3,2)[2d idx]', jax.jit(lambda t, i: t[i]), tbl32, idx2d)
timeit('gather (F,3,5)[2d idx]', jax.jit(lambda t, i: t[i]), tbl35, idx2d)
timeit('gather (F,6)[1d idx]', jax.jit(lambda t, i: t[i]), tbl6, idx1d)
timeit('gather (F,15)[1d idx]', jax.jit(lambda t, i: t[i]), tbl15, idx1d)
timeit('gather (F,16)[1d idx]', jax.jit(lambda t, i: t[i]), tbl16, idx1d)

g32 = jax.random.normal(jax.random.key(2), (H, W, 3, 2))
g6 = g32.reshape(P, 6)
g15 = jax.random.normal(jax.random.key(2), (P, 15))
g16 = jnp.pad(g15, ((0, 0), (0, 1)))
g3 = jax.random.normal(jax.random.key(2), (P, 3))
g8 = jnp.pad(g3, ((0, 0), (0, 5)))

timeit('scat (F,3,2).at[2d].add', jax.jit(
    lambda i, v: jnp.zeros((F, 3, 2)).at[i].add(v)), idx2d, g32)
timeit('scat (F,6).at[1d].add', jax.jit(
    lambda i, v: jnp.zeros((F, 6)).at[i].add(v)), idx1d, g6)
timeit('scat (F,15).at[1d].add', jax.jit(
    lambda i, v: jnp.zeros((F, 15)).at[i].add(v)), idx1d, g15)
timeit('scat (F,16).at[1d].add', jax.jit(
    lambda i, v: jnp.zeros((F, 16)).at[i].add(v)), idx1d, g16)
timeit('scat (F,3).at[1d].add', jax.jit(
    lambda i, v: jnp.zeros((F, 3)).at[i].add(v)), idx1d, g3)
timeit('scat (F,8).at[1d].add', jax.jit(
    lambda i, v: jnp.zeros((F, 8)).at[i].add(v)), idx1d, g8)

# texture-style: indices into 65536 rows, 4 taps
T = 256
it = jax.random.randint(jax.random.key(3), (P,), 0, T * T - T - 2)
timeit('tex scat 4x (T2,3)', jax.jit(
    lambda i, v: (jnp.zeros((T * T, 3)).at[i].add(v)
                  .at[i + 1].add(v).at[i + T].add(v).at[i + T + 1].add(v))),
    it, g3)
timeit('tex scat 1x (4P rows, 3)', jax.jit(
    lambda i, v: jnp.zeros((T * T, 3)).at[
        jnp.concatenate([i, i + 1, i + T, i + T + 1])].add(
        jnp.concatenate([v, v, v, v]))), it, g3)
timeit('tex scat 4x (T2,8)', jax.jit(
    lambda i, v: (jnp.zeros((T * T, 8)).at[i].add(v)
                  .at[i + 1].add(v).at[i + T].add(v).at[i + T + 1].add(v))),
    it, g8)
