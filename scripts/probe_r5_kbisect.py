"""Bisect the raster trace kernel: compile staged variants on-chip.

Run: nohup python -u scripts/probe_r5_kbisect.py > /tmp/probe_r5k.log 2>&1 &
"""
import functools
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
from kaolin_tpu.render.spc.raster import _shl, _shr, _bitonic_by_t, _INF

log(f'devices: {jax.devices()}')

RT, CW, KBUF, CKB, NBS = 16, 192, 256, 8, 64
half = 1.0 / 1024


def staged_kernel(nb_ref, rays_ref, cell_ref, tn_ref, tf_ref, pi_ref,
                  cnt_ref, *, stage):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        tn_ref[0] = jnp.full((RT, KBUF), _INF, jnp.float32)
        tf_ref[0] = jnp.full((RT, KBUF), _INF, jnp.float32)
        pi_ref[0] = jnp.full((RT, KBUF), -1, jnp.int32)
        cnt_ref[0] = jnp.zeros((RT, 1), jnp.int32)

    nb = nb_ref[pl.program_id(0)]

    @pl.when(j < nb)
    def _():
        row = cell_ref[0, 0]
        rays = rays_ref[0]
        xw = row[0:1].astype(jnp.float32) * (2. * half) - 1.
        yw = row[1:2].astype(jnp.float32) * (2. * half) - 1.
        zw = row[2:3].astype(jnp.float32) * (2. * half) - 1.
        pid = row[3:4]
        ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
        ix, iy, iz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
        side = 2. * half

        def axis_t(lo, o, inv):
            t0 = (lo - o) * inv
            t1 = t0 + side * inv
            return jnp.minimum(t0, t1), jnp.maximum(t0, t1)
        ax0, ax1 = axis_t(xw, ox, ix)
        ay0, ay1 = axis_t(yw, oy, iy)
        az0, az1 = axis_t(zw, oz, iz)
        tn = jnp.maximum(jnp.maximum(ax0, ay0), az0)
        tf = jnp.minimum(jnp.minimum(ax1, ay1), az1)
        hit = (tf > tn) & (tf > 0.) & (tn > 0.) & (pid >= 0)
        hs = hit.astype(jnp.int32)
        if stage == 1:
            cnt_ref[0] = cnt_ref[0] + jnp.sum(hs, axis=1, keepdims=True)
            return
        incl = hs
        s = 1
        while s < CW:
            incl = incl + _shr(incl, s, 0)
            s *= 2
        rank = incl - hs
        m = incl[:, CW - 1:CW]
        if stage == 2:
            cnt_ref[0] = cnt_ref[0] + m + 0 * jnp.sum(rank)
            return
        lane = jax.lax.broadcasted_iota(jnp.int32, (RT, CW), 1)
        d = jnp.where(hit, lane - rank, 0)
        valid = hs
        ptn = jnp.where(hit, tn, _INF)
        ptf = jnp.where(hit, tf, _INF)
        ppi = jnp.where(hit, jnp.broadcast_to(pid, (RT, CW)), -1)
        s = 1
        while s < CW:
            moves = valid * ((d & s) != 0).astype(jnp.int32)
            arr_i = _shl(moves, s, 0)
            arrives = arr_i != 0
            keep_i = valid * (1 - moves)
            keep = keep_i != 0
            d = jnp.where(arrives, _shl(d, s, 0) - s,
                          jnp.where(keep, d, 0))
            ptn = jnp.where(arrives, _shl(ptn, s, _INF),
                            jnp.where(keep, ptn, _INF))
            ptf = jnp.where(arrives, _shl(ptf, s, _INF),
                            jnp.where(keep, ptf, _INF))
            ppi = jnp.where(arrives, _shl(ppi, s, -1),
                            jnp.where(keep, ppi, -1))
            valid = arr_i | keep_i
            s *= 2
        if stage == 3:
            cnt_ref[0] = cnt_ref[0] + m
            tn_ref[0] = jnp.pad(ptn, ((0, 0), (0, KBUF - CW)),
                                constant_values=_INF)
            return
        ptn = jnp.pad(ptn, ((0, 0), (0, KBUF - CW)), constant_values=_INF)
        ptf = jnp.pad(ptf, ((0, 0), (0, KBUF - CW)), constant_values=_INF)
        ppi = jnp.pad(ppi, ((0, 0), (0, KBUF - CW)), constant_values=-1)
        cnt = cnt_ref[0]
        s = 1
        while s < KBUF:
            cond = (cnt & s) != 0
            ptn = jnp.where(cond, _shr(ptn, s, _INF), ptn)
            ptf = jnp.where(cond, _shr(ptf, s, _INF), ptf)
            ppi = jnp.where(cond, _shr(ppi, s, -1), ppi)
            s *= 2
        klane = jax.lax.broadcasted_iota(jnp.int32, (RT, KBUF), 1)
        sel = (klane >= cnt) & (klane < cnt + m)
        tn_ref[0] = jnp.where(sel, ptn, tn_ref[0])
        tf_ref[0] = jnp.where(sel, ptf, tf_ref[0])
        pi_ref[0] = jnp.where(sel, ppi, pi_ref[0])
        cnt_ref[0] = cnt + m

    if stage >= 5:
        @pl.when(j == CKB - 1)
        def _():
            if stage == 5:
                tn, tf, pi = _bitonic_by_t(tn_ref[0], tf_ref[0],
                                           pi_ref[0], KBUF)
            else:
                cmax = jnp.max(cnt_ref[0])

                def empty(_):
                    return tn_ref[0], tf_ref[0], pi_ref[0]

                def small(_):
                    return _bitonic_by_t(tn_ref[0], tf_ref[0], pi_ref[0],
                                         64)

                def full(_):
                    return _bitonic_by_t(tn_ref[0], tf_ref[0], pi_ref[0],
                                         KBUF)

                tn, tf, pi = jax.lax.cond(
                    cmax == 0, empty,
                    lambda _: jax.lax.cond(cmax <= 64, small, full, None),
                    None)
            tn_ref[0] = tn
            tf_ref[0] = tf
            pi_ref[0] = pi


def run_stage(stage):
    rng = np.random.default_rng(0)
    nbs = jnp.asarray(rng.integers(0, CKB + 1, (NBS,)), jnp.int32)
    rays = jnp.asarray(rng.normal(size=(NBS, RT, 8)), jnp.float32)
    cells = jnp.asarray(rng.integers(0, 1024, (NBS * CKB, 1, 8, CW)),
                        jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NBS, CKB),
        in_specs=[
            pl.BlockSpec((1, RT, 8), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, CW),
                         lambda b, j, *_: (b * CKB + j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RT, KBUF), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT, KBUF), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT, KBUF), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT, 1), lambda b, j, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out = pl.pallas_call(
        functools.partial(staged_kernel, stage=stage),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NBS, RT, KBUF), jnp.float32),
            jax.ShapeDtypeStruct((NBS, RT, KBUF), jnp.float32),
            jax.ShapeDtypeStruct((NBS, RT, KBUF), jnp.int32),
            jax.ShapeDtypeStruct((NBS, RT, 1), jnp.int32),
        ],
    )(nbs, rays, cells)
    return float(jnp.sum(out[3]))


for stage in (1, 2, 3, 4, 5, 6):
    try:
        t0 = time.perf_counter()
        v = run_stage(stage)
        log(f'stage {stage}: OK ({time.perf_counter()-t0:.1f}s, cnt={v})')
    except Exception as e:
        log(f'stage {stage}: FAIL '
            f'{(type(e).__name__ + ": " + str(e)).splitlines()[0][:130]}')
log('kbisect done')
