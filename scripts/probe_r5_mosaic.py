"""Mosaic capability probe for the raster-trace kernel:
 1. dynamic-index DMA from HBM where the index is read from a VMEM ref
 2. dynamic trip-count fori_loop per program
 3. lane rolls (pltpu.roll) for shift networks
 4. DMA issue rate at ~2-6KB row granularity

Run: nohup python -u scripts/probe_r5_mosaic.py > /tmp/probe_r5m.log 2>&1 &
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log(f'devices: {jax.devices()}')


def fence(x):
    return float(jnp.asarray(x).reshape(-1)[0])


M, R, C = 4096, 8, 192   # table rows, sublanes, lanes
NB = 2048                # programs
CK = 16                  # ids per program

table = jnp.arange(M * R * C, dtype=jnp.float32).reshape(M, R, C)
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, M, size=(NB, 1, CK)), jnp.int32)
nbs = jnp.asarray(rng.integers(1, CK + 1, size=(NB,)), jnp.int32)


def kernel(nb_ref, ids_ref, table_hbm, out_ref, scratch, sem):
    nb = nb_ref[pl.program_id(0)]

    def body(j, acc):
        slot = j % 2
        idx = ids_ref[0, 0, j]
        dma = pltpu.make_async_copy(table_hbm.at[idx], scratch.at[slot],
                                    sem.at[slot])
        dma.start()
        dma.wait()
        x = scratch[slot]
        # lane roll check
        x = x + pltpu.roll(x, 1, 1) * 0.0
        return acc + jnp.sum(x, axis=0, keepdims=True)

    acc = jax.lax.fori_loop(0, nb, body,
                            jnp.zeros((1, C), jnp.float32))
    out_ref[0, 0, :] = acc[0]


@jax.jit
def run(nbs, ids, table):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 1, CK), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, C), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, R, C), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB, 1, C), jnp.float32),
    )(nbs, ids, table)


try:
    t0 = time.perf_counter()
    out = run(nbs, ids, table)
    fence(out)
    log(f'kernel compile+run ok in {time.perf_counter()-t0:.1f}s')
    # correctness
    expect = np.zeros((NB, C), np.float32)
    tb = np.asarray(table)
    idn = np.asarray(ids)
    nbn = np.asarray(nbs)[:, 0]
    for b in range(NB):
        for j in range(nbn[b]):
            expect[b] += tb[idn[b, j]].sum(0)
    got = np.asarray(out)[:, 0]
    err = np.abs(got - expect).max() / max(1., np.abs(expect).max())
    log(f'correctness rel err: {err:.2e}')

    # DMA rate: total DMAs = sum(nb)
    ndma = int(nbn.sum())
    K = 8

    @jax.jit
    def multi(t):
        def step(i, acc):
            o = run(nbs, ids, t + acc * 0.0)
            return acc + o[0, 0, :1]
        return jax.lax.fori_loop(0, K, step, jnp.zeros((1,), jnp.float32))

    o = multi(table)
    fence(o)
    t0 = time.perf_counter()
    fence(o)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    o = multi(table)
    fence(o)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / K
    log(f'{ndma} DMAs of {R*C*4}B in {dt*1e3:.2f} ms -> '
        f'{ndma/dt/1e6:.2f} M DMAs/s, {ndma*R*C*4/dt/1e9:.1f} GB/s')
except Exception as e:
    import traceback
    traceback.print_exc()
    log(f'FAILED: {type(e).__name__}: {e}')
log('mosaic probe done')
