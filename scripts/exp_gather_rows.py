"""Measure TPU gather throughput: scalar vs full-tile (128-lane) rows."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

N = 2 * 1024 * 1024
M = 1024 * 1024
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, N, M, dtype=np.int32))


def timed(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    print(f'{name}: compile+run {time.perf_counter()-t0:.1f}s', flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f'{name}: {dt * 1e3:.1f} ms', flush=True)


tab1 = jnp.asarray(rng.random(N).astype(np.float32))
timed('scalar gather 1M', lambda: tab1[idx].sum())

tab128 = jnp.asarray(rng.random((N // 16, 128)).astype(np.float32))
idx16 = idx[:M] % (N // 16)
timed('row gather 1M x 128lane', lambda: tab128[idx16].sum())

tab8 = jnp.asarray(rng.random((N, 8)).astype(np.float32))
timed('row gather 1M x 8', lambda: tab8[idx].sum())
