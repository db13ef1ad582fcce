"""Micro-bench the primitives used by one BFS raytrace level at scale:
gather, cumsum, scatter-set(drop), sort — to find what serializes."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

CAP = 2 * 1024 * 1024          # parents
N = 8 * CAP                    # candidates
CAPN = 2 * 1024 * 1024

rng = np.random.default_rng(0)
ok = jnp.asarray(rng.random(N) < 0.12)
vals = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int32))
ridx = jnp.asarray(rng.integers(0, CAP, CAP, dtype=np.int32))


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(*args)
    jax.block_until_ready(out)
    print(f'{name}: {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms',
          flush=True)
    return out


timed('gather 2M<-2M', lambda i: i[ridx].sum(), vals[:CAP])
timed('cumsum 16M', lambda f: jnp.cumsum(f.astype(jnp.int32)), ok)
timed('cumsum (8,2M) axis0',
      lambda f: jnp.cumsum(f.reshape(8, CAP).astype(jnp.int32), axis=0), ok)


def scatter(okf, v):
    pos = jnp.cumsum(okf.astype(jnp.int32)) - 1
    dest = jnp.where(okf, pos, CAPN)
    return jnp.full((CAPN,), -1, jnp.int32).at[dest].set(v, mode='drop')


timed('cumsum+scatter 16M->2M', scatter, ok, vals)


def scatter_sorted(okf, v):
    # unique_indices + sorted hints
    pos = jnp.cumsum(okf.astype(jnp.int32)) - 1
    dest = jnp.where(okf, pos, CAPN)
    return jnp.full((CAPN,), -1, jnp.int32).at[dest].set(
        v, mode='drop', unique_indices=True, indices_are_sorted=True)


timed('scatter sorted+unique hints', scatter_sorted, ok, vals)


def via_sort(okf, v):
    key = jnp.where(okf, jnp.arange(N, dtype=jnp.int32),
                    jnp.iinfo(jnp.int32).max)
    sk, sv = jax.lax.sort((key, v), num_keys=1)
    return sv[:CAPN]


timed('sort-based compact 16M', via_sort, ok, vals)


def via_searchsorted(okf, v):
    inc = jnp.cumsum(okf.astype(jnp.int32))
    j = jnp.arange(CAPN, dtype=jnp.int32)
    src = jnp.searchsorted(inc, j + 1, side='left').astype(jnp.int32)
    valid = j < inc[-1]
    return jnp.where(valid, v[jnp.clip(src, 0, N - 1)], -1)


timed('searchsorted compact 16M', via_searchsorted, ok, vals)
