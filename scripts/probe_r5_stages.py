"""Stage timing of the mosaic raster engine on the bench config.

Run: nohup python -u scripts/probe_r5_stages.py > /tmp/probe_r5s.log 2>&1 &
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

log(f'devices: {jax.devices()}')


def fence(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(tag, fn, *args, K=8):
    @jax.jit
    def multi(a0):
        def body(i, acc):
            out = fn(*args)
            return acc + out
        return jax.lax.fori_loop(0, K, body, a0)

    out = multi(jnp.zeros(()))
    fence(out)
    t0 = time.perf_counter()
    fence(out)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = multi(jnp.zeros(()))
    fence(out)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / K
    log(f'{tag}: {dt*1e3:.2f} ms')
    return dt


from kaolin_tpu.io import obj
from kaolin_tpu.ops.conversions.trianglemesh import unbatched_mesh_to_spc
from kaolin_tpu.ops.spc.spc import scan_octrees, generate_points
from kaolin_tpu.render.spc import raster as R

mesh = obj.import_mesh('/root/reference/sample_data/meshes/fox.obj',
                       triangulate=True)
level = 10
v = np.asarray(mesh.vertices, np.float64)
c = (v.min(0) + v.max(0)) / 2
s = (v.max(0) - v.min(0)).max() / 2 * 1.05
v = (v - c) / s
fv = v[np.asarray(mesh.faces)]
octree, points, face_idx, bary = unbatched_mesh_to_spc(fv, level)
max_level, pyramids, exsum = scan_octrees(octree, np.array([octree.shape[0]]))
pyr0 = np.asarray(pyramids)[0]
ph = generate_points(jnp.asarray(octree), pyramids, exsum)
table = R.build_cell_table(ph, pyr0, level)
log(f'setup done, Mc={table.rows.shape[0]-1}')

side = 1024
n_rays = side * side
ys, xs = np.meshgrid(np.linspace(-0.9, 0.9, side),
                     np.linspace(-0.9, 0.9, side), indexing='ij')
o_all = np.stack([xs.ravel(), ys.ravel(), np.full(n_rays, -2.5)],
                 -1).astype(np.float32)
d_all = np.stack([xs.ravel() * 0.1, ys.ravel() * 0.1, np.ones(n_rays)], -1)
d_all = (d_all / np.linalg.norm(d_all, axis=-1, keepdims=True)
         ).astype(np.float32)
perm, _ = R._block_order(side, side, 4, 4)
o_dev = jnp.asarray(o_all[perm])
d_dev = jnp.asarray(d_all[perm])

RT = 16
rows_t, blo, bhi = table.rows, table.blo, table.bhi
Mc = rows_t.shape[0] - 1
cs = 682
SEGS = ((2048, 128), (10240, 16), (24576, 4), (None, 2))


def stage_candidates(o, d):
    nB = n_rays // RT
    BS = 64
    nS = nB // BS
    o3 = o.reshape(nB, RT, 3)
    d3 = d.reshape(nB, RT, 3)
    olo_b = jnp.min(o3, axis=1)
    ohi_b = jnp.max(o3, axis=1)
    dlo_b = jnp.min(d3, axis=1)
    dhi_b = jnp.max(d3, axis=1)
    olo_s = jnp.min(olo_b.reshape(nS, BS, 3), axis=1)
    ohi_s = jnp.max(ohi_b.reshape(nS, BS, 3), axis=1)
    dlo_s = jnp.min(dlo_b.reshape(nS, BS, 3), axis=1)
    dhi_s = jnp.max(dhi_b.reshape(nS, BS, 3), axis=1)
    cand_s = R._beam_chunk_test(
        olo_s[:, None], ohi_s[:, None], dlo_s[:, None], dhi_s[:, None],
        blo[None, :Mc], bhi[None, :Mc])
    cid = jax.lax.broadcasted_iota(jnp.int32, (nS, Mc), 1)
    sv, (sp,) = R._compact_rows(cand_s, (jnp.where(cand_s, cid, Mc),))
    sup_ids = jnp.where(sv[:, :cs], sp[:, :cs], Mc)
    sup_blo = blo[sup_ids]
    sup_bhi = bhi[sup_ids]
    cand_b = R._beam_chunk_test(
        olo_b.reshape(nS, BS, 1, 3), ohi_b.reshape(nS, BS, 1, 3),
        dlo_b.reshape(nS, BS, 1, 3), dhi_b.reshape(nS, BS, 1, 3),
        sup_blo[:, None], sup_bhi[:, None]).reshape(nB, cs)
    n_b = jnp.sum(cand_b.astype(jnp.int32), axis=-1)
    gids = jnp.broadcast_to(sup_ids[:, None], (nS, BS, cs)).reshape(nB, cs)
    bv, (bp,) = R._compact_rows(cand_b, (jnp.where(cand_b, gids, Mc),))
    blk_ids = jnp.where(bv, bp, Mc)
    return n_b, blk_ids


def s1(o, d):
    n_b, blk_ids = stage_candidates(o, d)
    return jnp.sum(n_b).astype(jnp.float32)


def s1b(o, d):
    n_b, blk_ids = stage_candidates(o, d)
    order = jnp.argsort(-n_b, stable=True).astype(jnp.int32)
    return jnp.sum(order[:10]).astype(jnp.float32)


def s2(o, d):
    n_b, blk_ids = stage_candidates(o, d)
    order = jnp.argsort(-n_b, stable=True).astype(jnp.int32)
    ids_sorted = blk_ids[order]
    acc = jnp.zeros(())
    start = 0
    nB = n_rays // RT
    for cap, ckb in SEGS:
        stop = min(start + cap, nB) if cap else nB
        ids_seg = jnp.minimum(ids_sorted[start:stop, :ckb], Mc)
        gath = rows_t[ids_seg.reshape(-1)]
        acc = acc + jnp.sum(gath[:, 3, :1]).astype(jnp.float32)
        start = stop
    return acc


def s3(o, d):
    tns, tfs, pis, cnt, sat = R._raster_trace_mosaic(
        rows_t, blo, bhi, o, d, level, RT, 192, 256, cs, SEGS, False)
    return jnp.sum(cnt).astype(jnp.float32)


timeit('S1 candidates (beam tests + packs)', s1, o_dev, d_dev)
timeit('S1b + argsort', s1b, o_dev, d_dev)
timeit('S2 + segment gathers', s2, o_dev, d_dev)
timeit('S3 full trace', s3, o_dev, d_dev, K=4)


# ---- grid-step overhead: trivial kernel over (N,) steps ---------------
def dummy_kernel(x_ref, o_ref):
    o_ref[0] = x_ref[0] * 2.


for nsteps in (65536, 262144):
    x = jnp.ones((nsteps, 8, 128), jnp.float32)

    def run_dummy():
        out = pl.pallas_call(
            dummy_kernel,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nsteps, 8, 128), jnp.float32),
        )(x)
        return jnp.sum(out[:, 0, 0])

    dt = timeit(f'dummy grid {nsteps} steps', run_dummy, K=4)
    log(f'  -> {dt/nsteps*1e9:.0f} ns/step')

log('stages probe done')
