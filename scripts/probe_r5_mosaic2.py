"""Bisect which Mosaic feature breaks the remote compile.

Run: nohup python -u scripts/probe_r5_mosaic2.py > /tmp/probe_r5m2.log 2>&1 &
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
NB, R, C, M, CK = 64, 8, 128, 256, 8
table = jnp.arange(M * R * C, dtype=jnp.float32).reshape(M, R, C)
ids = jnp.asarray(np.random.default_rng(0).integers(0, M, (NB, 1, CK)),
                  jnp.int32)
nbs = jnp.asarray(np.random.default_rng(1).integers(1, CK + 1, (NB, 2)),
                  jnp.int32)


def attempt(tag, fn):
    try:
        t0 = time.perf_counter()
        out = fn()
        v = float(jnp.asarray(out).reshape(-1)[0])
        log(f'{tag}: OK ({time.perf_counter()-t0:.1f}s, out0={v:.1f})')
        return True
    except Exception as e:
        msg = f'{type(e).__name__}: {e}'
        log(f'{tag}: FAIL {msg.splitlines()[0][:160]}')
        return False


# 1. trivial grid kernel
def k1(x_ref, o_ref):
    o_ref[0, 0] = x_ref[0, 0] * 2.


attempt('1 trivial', lambda: pl.pallas_call(
    k1, grid=(NB,),
    in_specs=[pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NB, 1, C), jnp.float32),
)(ids.astype(jnp.float32)[:, :, :1] * jnp.ones((1, 1, C))))


# 2. ANY input + static DMA
def k2(tab_ref, o_ref, scratch, sem):
    dma = pltpu.make_async_copy(tab_ref.at[3], scratch, sem)
    dma.start()
    dma.wait()
    o_ref[0, 0] = jnp.sum(scratch[:], axis=0)


attempt('2 static DMA from ANY', lambda: pl.pallas_call(
    k2, grid=(NB,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NB, 1, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((R, C), jnp.float32),
                    pltpu.SemaphoreType.DMA],
)(table))


# 3. dynamic DMA index from SMEM (full array)
def k3(sm_ref, tab_ref, o_ref, scratch, sem):
    b = pl.program_id(0)
    idx = sm_ref[b, 0]
    dma = pltpu.make_async_copy(tab_ref.at[idx], scratch, sem)
    dma.start()
    dma.wait()
    o_ref[0, 0] = jnp.sum(scratch[:], axis=0)


attempt('3 dyn DMA idx from SMEM', lambda: pl.pallas_call(
    k3, grid=(NB,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NB, 1, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((R, C), jnp.float32),
                    pltpu.SemaphoreType.DMA],
)(nbs, table))


# 4. dynamic DMA index read from VMEM block
def k4(ids_ref, tab_ref, o_ref, scratch, sem):
    idx = ids_ref[0, 0, 2]
    dma = pltpu.make_async_copy(tab_ref.at[idx], scratch, sem)
    dma.start()
    dma.wait()
    o_ref[0, 0] = jnp.sum(scratch[:], axis=0)


attempt('4 dyn DMA idx from VMEM', lambda: pl.pallas_call(
    k4, grid=(NB,),
    in_specs=[pl.BlockSpec((1, 1, CK), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NB, 1, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((R, C), jnp.float32),
                    pltpu.SemaphoreType.DMA],
)(ids, table))


# 5. dynamic fori_loop bound from SMEM + double-buffered dyn DMA
def k5(sm_ref, ids_ref, tab_ref, o_ref, scratch, sem):
    b = pl.program_id(0)
    nb = sm_ref[b, 0]

    def body(j, acc):
        slot = j % 2
        idx = ids_ref[0, 0, j]
        dma = pltpu.make_async_copy(tab_ref.at[idx], scratch.at[slot],
                                    sem.at[slot])
        dma.start()
        dma.wait()
        return acc + jnp.sum(scratch[slot], axis=0, keepdims=True)

    acc = jax.lax.fori_loop(0, nb, body, jnp.zeros((1, C), jnp.float32))
    o_ref[0, 0] = acc[0]


attempt('5 dyn loop + dbl-buf DMA', lambda: pl.pallas_call(
    k5, grid=(NB,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec((1, 1, CK), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NB, 1, C), jnp.float32),
    scratch_shapes=[pltpu.VMEM((2, R, C), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))],
)(nbs, ids, table))


# 6. pltpu.roll on lanes
def k6(x_ref, o_ref):
    x = x_ref[0, 0]
    o_ref[0, 0] = x + pltpu.roll(x, 3, 0)


attempt('6 lane roll', lambda: pl.pallas_call(
    k6, grid=(NB,),
    in_specs=[pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NB, 1, C), jnp.float32),
)(ids.astype(jnp.float32)[:, :, :1] * jnp.ones((1, 1, C))))

log('bisect done')
