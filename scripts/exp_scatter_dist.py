"""Does TPU scatter-add cost depend on the index distribution?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

P = 512 * 512
F = 10240


def timeit(label, fn, *a, iters=20):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f'{label}: {(time.perf_counter()-t0)/iters*1000:.3f} ms',
          flush=True)


g16 = jax.random.normal(jax.random.key(2), (P, 16))
scat = jax.jit(lambda i, v: jnp.zeros((F + 1, 16), v.dtype).at[i].add(v))
scat_drop = jax.jit(lambda i, v: jnp.zeros((F, 16), v.dtype)
                    .at[i].add(v, mode='drop'))

idx_rand = jax.random.randint(jax.random.key(1), (P,), 0, F)
timeit('scatter random idx', scat, idx_rand, g16)

mask = jax.random.uniform(jax.random.key(3), (P,)) < 0.6
idx_hot = jnp.where(mask, 0, idx_rand)
timeit('scatter 60%-hot idx', scat, idx_hot, g16)

idx_oob = jnp.where(mask, F + 7, idx_rand)   # background -> dropped
timeit('scatter 60%-dropped idx', scat_drop, idx_oob, g16)

# clustered-but-not-hot: sorted indices (spatial coherence)
idx_sorted = jnp.sort(idx_rand)
timeit('scatter sorted idx', scat, idx_sorted, g16)

# gather with hot row
tbl = jax.random.normal(jax.random.key(0), (F, 16))
gath = jax.jit(lambda t, i: t[i])
timeit('gather random idx', gath, tbl, idx_rand)
timeit('gather 60%-hot idx', gath, tbl, jnp.where(mask, 0, idx_rand))
