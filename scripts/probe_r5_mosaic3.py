"""Bisect round 2: isolate dynamic-loop and roll failures.

Run: nohup python -u scripts/probe_r5_mosaic3.py > /tmp/probe_r5m3.log 2>&1 &
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
x2d = jnp.ones((NB, R, C), jnp.float32)


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


def call2d(k, extra_in=(), extra_specs=(), scratch=()):
    return pl.pallas_call(
        k, grid=(NB,),
        in_specs=list(extra_specs) + [
            pl.BlockSpec((1, R, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, R, C), jnp.float32),
        scratch_shapes=list(scratch),
    )(*extra_in, x2d)


# A. dynamic fori_loop bound from SMEM, pure compute body
def kA(sm_ref, x_ref, o_ref):
    nb = sm_ref[pl.program_id(0), 0]
    acc = jax.lax.fori_loop(0, nb, lambda j, a: a + x_ref[0],
                            jnp.zeros((R, C), jnp.float32))
    o_ref[0] = acc


attempt('A dyn-bound loop', lambda: call2d(
    kA, (nbs,), (pl.BlockSpec(memory_space=pltpu.SMEM),)))


# B. static loop, dyn DMA idx, traced scratch slot
def kB(ids_ref, tab_ref, x_ref, o_ref, scratch, sem):
    def body(j, acc):
        slot = j % 2
        idx = ids_ref[0, 0, j]
        dma = pltpu.make_async_copy(tab_ref.at[idx], scratch.at[slot],
                                    sem.at[slot])
        dma.start()
        dma.wait()
        return acc + scratch[slot]

    o_ref[0] = jax.lax.fori_loop(0, CK, body,
                                 jnp.zeros((R, C), jnp.float32))


attempt('B static loop traced slot', lambda: call2d(
    kB, (ids, table),
    (pl.BlockSpec((1, 1, CK), lambda b: (b, 0, 0),
                  memory_space=pltpu.VMEM),
     pl.BlockSpec(memory_space=pltpu.ANY)),
    scratch=(pltpu.VMEM((2, R, C), jnp.float32),
             pltpu.SemaphoreType.DMA((2,)))))


# C. static loop, dyn DMA idx, fixed slot
def kC(ids_ref, tab_ref, x_ref, o_ref, scratch, sem):
    def body(j, acc):
        idx = ids_ref[0, 0, j]
        dma = pltpu.make_async_copy(tab_ref.at[idx], scratch, sem)
        dma.start()
        dma.wait()
        return acc + scratch[:]

    o_ref[0] = jax.lax.fori_loop(0, CK, body,
                                 jnp.zeros((R, C), jnp.float32))


attempt('C static loop fixed slot', lambda: call2d(
    kC, (ids, table),
    (pl.BlockSpec((1, 1, CK), lambda b: (b, 0, 0),
                  memory_space=pltpu.VMEM),
     pl.BlockSpec(memory_space=pltpu.ANY)),
    scratch=(pltpu.VMEM((R, C), jnp.float32),
             pltpu.SemaphoreType.DMA)))


# D. dyn-bound loop + fixed-slot DMA
def kD(sm_ref, ids_ref, tab_ref, x_ref, o_ref, scratch, sem):
    nb = sm_ref[pl.program_id(0), 0]

    def body(j, acc):
        idx = ids_ref[0, 0, j]
        dma = pltpu.make_async_copy(tab_ref.at[idx], scratch, sem)
        dma.start()
        dma.wait()
        return acc + scratch[:]

    o_ref[0] = jax.lax.fori_loop(0, nb, body,
                                 jnp.zeros((R, C), jnp.float32))


attempt('D dyn loop fixed slot', lambda: call2d(
    kD, (nbs, ids, table),
    (pl.BlockSpec(memory_space=pltpu.SMEM),
     pl.BlockSpec((1, 1, CK), lambda b: (b, 0, 0),
                  memory_space=pltpu.VMEM),
     pl.BlockSpec(memory_space=pltpu.ANY)),
    scratch=(pltpu.VMEM((R, C), jnp.float32),
             pltpu.SemaphoreType.DMA)))


# E. pltpu.roll 2-D along lanes
def kE(x_ref, o_ref):
    x = x_ref[0]
    o_ref[0] = x + pltpu.roll(x, 3, 1)


attempt('E pltpu.roll 2d lanes', lambda: call2d(kE))


# F. jnp.roll
def kF(x_ref, o_ref):
    x = x_ref[0]
    o_ref[0] = x + jnp.roll(x, 3, 1)


attempt('F jnp.roll 2d lanes', lambda: call2d(kF))


# G. shift via concat of slices
def kG(x_ref, o_ref):
    x = x_ref[0]
    s = 4
    shifted = jnp.concatenate(
        [x[:, s:], jnp.zeros((R, s), jnp.float32)], axis=1)
    o_ref[0] = x + shifted


attempt('G concat-slice shift', lambda: call2d(kG))


# H. sublane (row) roll via pltpu.roll axis 0
def kH(x_ref, o_ref):
    x = x_ref[0]
    o_ref[0] = x + pltpu.roll(x, 1, 0)


attempt('H pltpu.roll 2d sublanes', lambda: call2d(kH))

log('bisect2 done')
