"""Measure stream-compaction primitive throughput on TPU.

Input: N=64M rows with ~25% valid; compact to cap=16M, order-preserving.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
import functools

N = int(os.environ.get('N', str(64 * 1024 * 1024)))
CAP = N // 4

key = jax.random.PRNGKey(0)
valid = jax.random.uniform(key, (N,)) < 0.22
vals = jnp.arange(N, dtype=jnp.int32)
vals2 = jnp.arange(N, dtype=jnp.int32) * 3


@jax.jit
def compact_scatter(valid, a, b):
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    idx = jnp.where(valid, pos, CAP)
    oa = jnp.full((CAP,), -1, a.dtype).at[idx].set(a, mode='drop')
    ob = jnp.full((CAP,), -1, b.dtype).at[idx].set(b, mode='drop')
    return oa, ob


@jax.jit
def compact_searchsorted(valid, a, b):
    cs = jnp.cumsum(valid.astype(jnp.int32))
    j = jnp.arange(CAP, dtype=jnp.int32)
    src = jnp.searchsorted(cs, j + 1, side='left').astype(jnp.int32)
    ok = j < cs[-1]
    src = jnp.clip(src, 0, N - 1)
    return jnp.where(ok, a[src], -1), jnp.where(ok, b[src], -1)


@jax.jit
def compact_sort(valid, a, b):
    key = jnp.where(valid, jnp.arange(N, dtype=jnp.int32),
                    jnp.iinfo(jnp.int32).max)
    k, oa, ob = jax.lax.sort((key, a, b), num_keys=1)
    # mask the tail: invalid rows sort to the end with arbitrary payloads
    ok = jnp.arange(CAP) < jnp.sum(valid.astype(jnp.int32))
    return jnp.where(ok, oa[:CAP], -1), jnp.where(ok, ob[:CAP], -1)


@jax.jit
def compact_nonzero(valid, a, b):
    idx, = jnp.nonzero(valid, size=CAP, fill_value=N - 1)
    n = jnp.sum(valid)
    ok = jnp.arange(CAP) < n
    return jnp.where(ok, a[idx], -1), jnp.where(ok, b[idx], -1)


def bench(f, name):
    try:
        t0 = time.perf_counter()
        o = f(valid, vals, vals2)
        jax.block_until_ready(o)
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = f(valid, vals, vals2)
            jax.block_until_ready(o)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f'{name:22s} {dt*1e3:9.2f} ms  ({N/dt/1e9:.2f} Gelem/s) '
              f'[compile {comp:.1f}s]', flush=True)
        return o
    except Exception as e:
        print(f'{name:22s} FAILED: {type(e).__name__}: {e}', flush=True)
        return None


r0 = bench(compact_scatter, 'scatter')
r1 = bench(compact_searchsorted, 'searchsorted')
r2 = bench(compact_sort, 'sort')
r3 = bench(compact_nonzero, 'nonzero_sized')
for nm, r in [('searchsorted', r1), ('sort', r2), ('nonzero', r3)]:
    if r is not None and r0 is not None:
        same = bool(jnp.all(r[0] == r0[0]) & jnp.all(r[1] == r0[1]))
        print(f'match scatter vs {nm}: {same}')
