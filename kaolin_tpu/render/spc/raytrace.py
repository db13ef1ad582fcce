"""SPC octree ray tracing + pack primitives for volume rendering.

Parity: ``kaolin/render/spc/raytrace.py`` + CUDA kernels
``kaolin/csrc/render/spc/raytrace_cuda.cu`` (reference).

TPU-native design (SURVEY.md §3.2, A.4):

* The breadth-first traversal with per-level host-synced dynamic
  allocation (CUB scan sizing, ``raytrace_cuda.cu:544-560``) keeps its
  level-synchronous BFS shape but becomes fully static
  (:func:`_raytrace_bfs`): each level is one expand→test→compact pass
  over a static-capacity nugget buffer, compaction by cumsum + a single
  row scatter instead of CUB scans and host-sized allocs.  Children are
  emitted near-to-far by *exact entry depth* (an 8x8 vector ranking) —
  strictly stronger than the reference's ``VOXEL_ORDER`` Hamming
  heuristic (A.4) — so the packed output needs no sort.
* Large ray counts are traced in fixed-size chunks
  (:func:`unbatched_raytrace` ``chunk_rays``): one compiled BFS is
  reused across chunks (runtime and compile time both scale with the
  nugget capacity, so a 1M-ray trace runs as 16 x 64K-ray dispatches),
  then one device-side pass packs the per-chunk results.
* Serial per-pack cumsum/cumprod (``raytrace_cuda.cu:373-483``) become
  log-depth segmented ``associative_scan``; cumprod gradients avoid the
  reference's div-by-feature NaN workaround entirely (product-rule form).
"""

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    'RaytraceInfo',
    'unbatched_raytrace',
    'mark_pack_boundaries',
    'mark_first_hit',
    'diff',
    'sum_reduce',
    'cumsum',
    'cumprod',
    'exponential_integration',
]


@functools.partial(jax.jit, static_argnames=('level', 'cap', 'cap_coarse',
                                             'coarse_levels'))
def _raytrace_bfs(octree, exsum, origin, direction, level, cap,
                  cap_coarse=None, coarse_levels=0):
    """Level-synchronous breadth-first octree ray traversal.

    TPU redesign of the reference's BFS (``raytrace_cuda.cu:485-607``):
    the CUDA loop does per-level host-synced dynamic allocation (CUB scan
    sizing); here every level is a static-shaped expand→test→compact pass.
    TPU random access is *index-rate* bound (~1e8 indices/s regardless of
    row width up to 8 lanes — measured), so the design minimises the
    number of gather/scatter indices per level, not bytes:

    1. **expand** (pure vector ops): each live nugget (ray, node) emits
       its 8 children in ``(8, cap)`` orientation (8 sublanes × cap
       lanes tiles perfectly; ``(N, 3)``-style layouts would pad lanes
       3 -> 128).  Ray origin/inv-direction come from one packed
       ``(NR, 8)`` row gather; occupancy byte + exclusive-sum come from
       one gather of an arithmetically packed ``exsum*256 + byte`` table.
    2. **order + test**: slab ray-AABB per child; children are ranked
       near-to-far *by actual entry depth* with 8×8 vector comparisons
       (no sort) — exact where the reference's ``VOXEL_ORDER`` Hamming
       approximation (``raytrace_cuda.cu:225-269``) is heuristic.  The
       rank permutation packs into 24 bits of one int32.  Intermediate
       levels keep hits and voxels containing the origin (reference
       ``decide`` keeps ``depth != 0``); the final level requires entry
       depth > 0.
    3. **compact** (order-preserving, O(count) indices): scatter each
       live parent's output offset ("head"), propagate parent ids with a
       segmented cummax, then gather ONE packed ``(cap, 8)`` row per
       output nugget carrying all parent state (ray id, packed coords,
       occupancy byte, exclusive sum, child permutation, offset); the
       child's node id and coords are recomputed from it arithmetically.
       Entry/exit depths are recomputed from the compacted voxel coords
       at the end (vector ops are free, random-access indices are not).

    The identical middle levels run under one ``lax.scan`` body with a
    flat capacity, so XLA compiles the level pass once, not ``level``
    times.

    Returns:
        (ridx (cap,), pidx (cap,), t_near (cap,), t_far (cap,),
        count (), saturated ()) — valid prefix of length ``count``, tail
        ridx/pidx -1; ``saturated`` is True if any level overflowed
        ``cap`` (overflow hits are dropped).
    """
    NR = origin.shape[0]
    o = origin.astype(jnp.float32)
    d = direction.astype(jnp.float32)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                            jnp.where(d < 0, -1e-12, 1e-12), d)
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    ix, iy, iz = inv_d[:, 0], inv_d[:, 1], inv_d[:, 2]
    rays8 = jnp.stack([ox, oy, oz, ix, iy, iz,
                       jnp.zeros_like(ox), jnp.zeros_like(ox)], axis=-1)
    # one gather -> (occupancy byte, exclusive sum) when exsum fits 23
    # bits (point count < 2^23); two gathers otherwise
    can_pack = octree.shape[0] * 8 < (1 << 23)
    oct_i32 = octree.astype(jnp.int32)
    ex_i32 = exsum.astype(jnp.int32)
    comb = (ex_i32[:octree.shape[0]] * 256 + oct_i32 if can_pack
            else None)

    def slab1(lov, half, ro, rinv):
        t0 = (lov - ro) * rinv
        t1 = t0 + half * rinv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    def leaf_slab(qxv, qyv, qzv, rox, roy, roz, rix, riy, riz, half):
        tn_x, tf_x = slab1(qxv.astype(jnp.float32) * half - 1., half,
                           rox, rix)
        tn_y, tf_y = slab1(qyv.astype(jnp.float32) * half - 1., half,
                           roy, riy)
        tn_z, tf_z = slab1(qzv.astype(jnp.float32) * half - 1., half,
                           roz, riz)
        t_near = jnp.maximum(jnp.maximum(tn_x, tn_y), tn_z)
        t_far = jnp.minimum(jnp.minimum(tf_x, tf_y), tf_z)
        return t_near, t_far

    # ---- level 0: one root nugget per ray ------------------------------
    if cap_coarse is None or coarse_levels <= 0:
        cap_coarse, coarse_levels = cap, 0
    cap0 = cap_coarse if coarse_levels > 0 and level > 1 else cap
    zeros_nr = jnp.zeros((NR,), jnp.int32)
    root_near, root_far = leaf_slab(
        zeros_nr, zeros_nr, zeros_nr, ox, oy, oz, ix, iy, iz, 2.)
    alive0 = (root_far > root_near) & (root_far > 0.)
    if level == 0:
        alive0 = alive0 & (root_near > 0.)
    ridx0 = jnp.where(alive0, jnp.arange(NR, dtype=jnp.int32), -1)
    pad = cap0 - NR
    assert pad >= 0, 'cap (and cap_coarse) must be >= num_rays'
    ridx = jnp.pad(ridx0, (0, pad), constant_values=-1)
    pidx = jnp.zeros((cap0,), jnp.int32)
    qxy = jnp.zeros((cap0,), jnp.int32)       # (qx << 16) | qy
    qz = jnp.zeros((cap0,), jnp.int32)
    t_in = jnp.pad(root_near, (0, cap - NR))
    t_out = jnp.pad(root_far, (0, cap - NR))

    def make_level_pass(capn):
        """Level pass specialized to a static buffer size ``capn`` —
        both runtime and compile time of a pass scale with its capacity,
        and coarse levels need far smaller frontiers than deep ones."""

        def level_pass(state, half_and_final):
            """One BFS level: expand, rank near-to-far, compact.
            ``half`` is the child voxel side; ``final`` selects the
            bottom-level test."""
            ridx, pidx, qxy, qz, sat = state
            half, final = half_and_final
            live = ridx >= 0
            rsafe = jnp.clip(ridx, 0, NR - 1)
            ray = rays8[rsafe]                                # (capn, 8)
            rox, roy, roz = ray[:, 0], ray[:, 1], ray[:, 2]
            rix, riy, riz = ray[:, 3], ray[:, 4], ray[:, 5]

            psafe = jnp.clip(pidx, 0, octree.shape[0] - 1)
            if can_pack:
                cg = comb[psafe]                              # (capn,)
                bits = cg & 255
                exv = cg >> 8
            else:
                bits = oct_i32[psafe]
                exv = ex_i32[psafe]

            kslot = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            has = ((bits[None, :] >> kslot) & 1) == 1       # (8, capn)

            qx = qxy >> 16
            qy = qxy & 0xffff
            qcx = qx[None, :] * 2 + ((kslot >> 2) & 1)      # (8, capn)
            qcy = qy[None, :] * 2 + ((kslot >> 1) & 1)
            qcz = qz[None, :] * 2 + (kslot & 1)
            t_near, t_far = leaf_slab(
                qcx, qcy, qcz,
                rox[None, :], roy[None, :], roz[None, :],
                rix[None, :], riy[None, :], riz[None, :], half)

            ok = live[None, :] & has & (t_far > t_near) & (t_far > 0.)
            ok = ok & jnp.where(final, t_near > 0., True)

            # near-to-far rank by actual entry depth: 8x8 vector
            # comparisons, rank[k] = #valid children strictly before k
            # in (t, slot) order
            tkey = jnp.where(ok, t_near, jnp.inf)           # (8, capn)
            a = tkey[:, None, :]                            # (8k, 1, .)
            b = tkey[None, :, :]                            # (1, 8j, .)
            ji = jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 1)
            ki = jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 0)
            before = (b < a) | ((b == a) & (ji < ki))       # (8, 8, .)
            rank_t = jnp.sum(
                (before & ok[None, :, :]).astype(jnp.int32), axis=1)
            # child permutation: slot of rank r in bits [3r, 3r+3)
            perm = jnp.sum(jnp.where(
                ok, kslot << (3 * rank_t), 0), axis=0)      # (capn,)

            # compaction: head scatter + segmented cummax + 1 row gather
            cnt = jnp.sum(ok.astype(jnp.int32), axis=0)     # (capn,)
            base = jnp.cumsum(cnt) - cnt                    # exclusive
            total = base[-1] + cnt[-1]
            head_dst = jnp.where(cnt > 0, base, capn)
            head = jnp.full((capn,), -1, jnp.int32).at[head_dst].set(
                jnp.arange(capn, dtype=jnp.int32), mode='drop',
                unique_indices=True)
            parent = jax.lax.associative_scan(jnp.maximum, head)
            psafe2 = jnp.clip(parent, 0, capn - 1)

            # all parent state in one (capn, 8) row -> 1 gather/output
            table = jnp.stack([ridx, qxy, qz, bits, exv, perm, base,
                               cnt], axis=-1)
            row = table[psafe2]                             # (capn, 8)
            j = jnp.arange(capn, dtype=jnp.int32)
            k = jnp.clip(j - row[:, 6], 0, 7)
            valid = (j < total) & (parent >= 0)
            slot = (row[:, 5] >> (3 * k)) & 7
            rank_s = jax.lax.population_count(
                (row[:, 3] & ((2 << slot) - 1)).astype(jnp.uint32)
            ).astype(jnp.int32)
            new_pidx = jnp.where(valid, row[:, 4] + rank_s, -1)
            nqx = (row[:, 1] >> 16) * 2 + ((slot >> 2) & 1)
            nqy = (row[:, 1] & 0xffff) * 2 + ((slot >> 1) & 1)
            new_qxy = jnp.where(valid, (nqx << 16) | nqy, 0)
            new_qz = jnp.where(valid, row[:, 2] * 2 + (slot & 1), 0)
            new_ridx = jnp.where(valid, row[:, 0], -1)
            sat = sat | (total > capn)
            return (new_ridx, new_pidx, new_qxy, new_qz, sat), None

        return level_pass

    state = (ridx, pidx, qxy, qz, jnp.zeros((), bool))
    halves_all = [1.0 / (1 << l) for l in range(level - 1)]
    n_coarse = min(coarse_levels, level - 1) if coarse_levels else 0
    if n_coarse > 0:
        state, _ = jax.lax.scan(
            make_level_pass(cap_coarse), state,
            (jnp.asarray(halves_all[:n_coarse], jnp.float32),
             jnp.zeros((n_coarse,), bool)))
        # band transition: widen the buffers to the deep-level capacity
        grow = cap - cap_coarse
        ridx, pidx, qxy, qz, sat = state
        state = (jnp.pad(ridx, (0, grow), constant_values=-1),
                 jnp.pad(pidx, (0, grow)), jnp.pad(qxy, (0, grow)),
                 jnp.pad(qz, (0, grow)), sat)
    if level - 1 > n_coarse:
        state, _ = jax.lax.scan(
            make_level_pass(cap), state,
            (jnp.asarray(halves_all[n_coarse:], jnp.float32),
             jnp.zeros((level - 1 - n_coarse,), bool)))
    if level > 0:
        state, _ = make_level_pass(cap)(
            state, (jnp.float32(1.0 / (1 << (level - 1))),
                    jnp.asarray(True)))
    ridx, pidx, qxy, qz, sat = state

    if level > 0:
        # recompute depths from compacted voxel coords (vector ops only)
        rsafe = jnp.clip(ridx, 0, NR - 1)
        ray = rays8[rsafe]
        t_in, t_out = leaf_slab(
            qxy >> 16, qxy & 0xffff, qz,
            ray[:, 0], ray[:, 1], ray[:, 2],
            ray[:, 3], ray[:, 4], ray[:, 5], 1.0 / (1 << (level - 1)))
        t_in = jnp.where(ridx >= 0, t_in, 0.)
        t_out = jnp.where(ridx >= 0, t_out, 0.)
    else:
        # level 0: no level_pass ran, so pack the root nuggets (misses
        # would otherwise leave -1 holes interleaved with hits) and mask
        # the depths of dead slots
        live = ridx >= 0
        dst = jnp.where(live, jnp.cumsum(live.astype(jnp.int32)) - 1, cap)

        def pack(x, fill):
            return jnp.full((cap,), fill, x.dtype).at[dst].set(
                x, mode='drop', unique_indices=True)

        t_in = pack(jnp.where(live, t_in, 0.), 0.)
        t_out = pack(jnp.where(live, t_out, 0.), 0.)
        ridx = pack(ridx, -1)
        pidx = jnp.zeros((cap,), jnp.int32)

    count = jnp.sum((ridx >= 0).astype(jnp.int32))
    return ridx, pidx, t_in, t_out, count, sat


class RaytraceInfo(NamedTuple):
    """Aux outputs of :func:`unbatched_raytrace` (device scalars,
    jit-compatible)."""
    count: jnp.ndarray       # () int32: number of valid nuggets
    saturated: jnp.ndarray   # () bool: True if any level overflowed


@jax.jit
def _pack_chunks(ridx, pidx, t_in, t_out):
    """Device-side compaction of concatenated per-chunk outputs into one
    contiguous valid prefix (order-preserving, so per-ray near-to-far
    ordering and ray-major ordering are kept)."""
    n = ridx.shape[0]
    live = ridx >= 0
    dst = jnp.where(live, jnp.cumsum(live.astype(jnp.int32)) - 1, n)

    def pack(x, fill):
        return jnp.full((n,), fill, x.dtype).at[dst].set(
            x, mode='drop', unique_indices=True)

    return (pack(ridx, -1), pack(pidx, -1), pack(t_in, 0.),
            pack(t_out, 0.), jnp.sum(live.astype(jnp.int32)))


@functools.partial(jax.jit, static_argnames=('level', 'cap', 'cap_coarse',
                                             'coarse_levels'))
def _raytrace_chunks(octree, exsum, origin, direction, level, cap,
                     cap_coarse=None, coarse_levels=0):
    """Chunked BFS as ONE compiled program: ``lax.scan`` runs the
    fixed-shape BFS over ``(nchunks, chunk_rays, 3)`` ray blocks (the
    level pass is compiled once, reused for every chunk), then the
    per-chunk results are packed into a single contiguous prefix.

    One dispatch per trace — the per-chunk python loop costs ~5 host
    round-trips per chunk, which dominates when the device sits behind
    a high-latency tunnel.
    """
    nchunks, chunk_rays = origin.shape[0], origin.shape[1]

    def body(_, od):
        o, d = od
        ridx, pidx, t_in, t_out, _, sat = _raytrace_bfs(
            octree, exsum, o, d, level, cap,
            cap_coarse=cap_coarse, coarse_levels=coarse_levels)
        return None, (ridx, pidx, t_in, t_out, sat)

    _, (ridx, pidx, t_in, t_out, sat) = jax.lax.scan(
        body, None, (origin, direction))
    offs = (jnp.arange(nchunks, dtype=jnp.int32) * chunk_rays)[:, None]
    ridx = jnp.where(ridx >= 0, ridx + offs, -1)
    out = _pack_chunks(ridx.reshape(-1), pidx.reshape(-1),
                       t_in.reshape(-1), t_out.reshape(-1))
    return out + (jnp.any(sat),)


def unbatched_raytrace(octree, point_hierarchy, pyramid, exsum, origin,
                       direction, level, return_depth=True, with_exit=False,
                       max_nuggets=None, trim=True, return_info=False,
                       chunk_rays=None, max_nuggets_coarse=None,
                       coarse_levels=0, max_hits_per_ray=None,
                       max_steps=None):
    """Trace rays against an SPC octree.

    Parity: ``kaolin/render/spc/raytrace.py:31``.  Returns intersections
    ("nuggets") sorted by ray, near-to-far per ray.

    Args:
        octree: (num_bytes,) uint8.
        point_hierarchy: (num_points, 3) int coords.
        pyramid: (2, max_level + 2) int (host values used for capacities).
        exsum: (num_bytes + 1,) int32.
        origin: (num_rays, 3) float ray origins in [-1, 1] space.
        direction: (num_rays, 3) float ray directions.
        level: target octree level (<= 15, the SPC int16-coord limit).
        return_depth: also return entry depths.
        with_exit: also return exit depths.
        max_nuggets: static nugget-buffer capacity; the cap applies to
            EVERY level of the traversal (intermediate BFS frontiers,
            not just the packed output).  Default ``8 * num_rays``, min
            ``num_rays``.  If any level's true intersection count
            exceeds it the overflow is silently dropped; saturation is
            reported ONLY via the ``trim`` path's warning or the
            ``return_info`` saturation flag — the -1 padding of the
            ``trim=False`` output is NOT a reliable signal (a saturated
            buffer can come back full).  Size it to the scene; final
            counts are typically well under ``num_rays`` for surface
            octrees, but volume-dense octrees can need far more.
        trim: outside jit, trim outputs to the true intersection count
            (matches reference's dynamic shapes).  This host-syncs on
            the count (one scalar device->host transfer per call).
            Under jit, set False and use ``return_info`` for the valid
            count / saturation flag.
        return_info: also return a :class:`RaytraceInfo` (device
            scalars: valid-nugget ``count``, ``saturated`` flag) as the
            last output — the jit-compatible way to detect dropped hits.
        chunk_rays: trace rays in chunks of this size, reusing one
            compiled BFS per chunk shape (both compile time and runtime
            of a BFS pass scale with its nugget capacity, so chunking is
            how large ray counts stay fast: 1M rays = 16 x 64K chunks).
            Default: no chunking up to 128K rays, 64K chunks above.
            Pass 0 to disable chunking.
        max_nuggets_coarse, coarse_levels: optional two-band capacity
            schedule: the first ``coarse_levels`` BFS levels run with a
            ``max_nuggets_coarse`` buffer instead of ``max_nuggets``
            (per chunk, scaled like ``max_nuggets``).  A level pass
            costs time proportional to its capacity, so shrink the band
            whose frontiers are small.  CAUTION: for coherent camera-
            grid rays the COARSE levels have the largest frontiers
            (every ray crosses the same few large voxels), so a small
            coarse band saturates first there — this knob pays off for
            incoherent/sparse ray sets.  Saturation of either band is
            reported the same way.
        max_hits_per_ray, max_steps: deprecated (accepted for backward
            compatibility; the BFS traversal has no per-ray cap).

    Returns:
        (ridx, pidx[, depth][, info]): intersection ray / point indices,
        depths (num_nuggets, 1) or (num_nuggets, 2) if ``with_exit``,
        and a :class:`RaytraceInfo` if ``return_info``.
    """
    del max_hits_per_ray, max_steps  # deprecated (t-marching engine)
    if level > 15:
        raise ValueError(
            f'unbatched_raytrace: level={level} > 15 (SPC int16 coord '
            'limit, reference KAOLIN_SPC_MAX_LEVELS)')
    num_rays = origin.shape[0]
    if max_nuggets is None:
        max_nuggets = num_rays * 8
    cap = max(int(max_nuggets), num_rays)
    if chunk_rays is None:
        chunk_rays = num_rays if num_rays <= (1 << 17) else (1 << 16)
    chunk_rays = int(chunk_rays) or num_rays
    coarse_levels = int(coarse_levels)

    octree = jnp.asarray(octree)
    exsum = jnp.asarray(exsum)
    origin = jnp.asarray(origin)
    direction = jnp.asarray(direction)

    if max_nuggets_coarse is not None and int(max_nuggets_coarse) > cap:
        raise ValueError(
            f'unbatched_raytrace: max_nuggets_coarse='
            f'{int(max_nuggets_coarse)} exceeds max_nuggets={cap}; the '
            'coarse band cannot be wider than the deep band')
    if chunk_rays >= num_rays:
        cap_c = (max(int(max_nuggets_coarse), num_rays)
                 if max_nuggets_coarse else None)
        ridx, pidx, t_in, t_out, count, sat = _raytrace_bfs(
            octree, exsum, origin, direction, level, cap,
            cap_coarse=cap_c, coarse_levels=coarse_levels)
    else:
        nchunks = -(-num_rays // chunk_rays)
        cap_chunk = max(-(-cap // nchunks), chunk_rays)
        cap_c = (max(-(-max(int(max_nuggets_coarse), num_rays)
                       // nchunks), chunk_rays)
                 if max_nuggets_coarse else None)
        pad = nchunks * chunk_rays - num_rays
        if pad:
            # padded rays start outside [-1,1]^3 moving away -> no hits
            origin = jnp.concatenate(
                [origin, jnp.full((pad, 3), 3., origin.dtype)])
            direction = jnp.concatenate(
                [direction, jnp.ones((pad, 3), direction.dtype)])
        ridx, pidx, t_in, t_out, count, sat = _raytrace_chunks(
            octree, exsum,
            origin.reshape(nchunks, chunk_rays, 3),
            direction.reshape(nchunks, chunk_rays, 3), level, cap_chunk,
            cap_coarse=cap_c, coarse_levels=coarse_levels)

    if with_exit:
        depths = jnp.stack([t_in, t_out], axis=-1)
    else:
        depths = t_in[:, None]
    info = RaytraceInfo(count=count, saturated=sat)
    if trim:
        if bool(sat):
            import warnings
            warnings.warn(
                'unbatched_raytrace: nugget buffer saturated '
                f'(max_nuggets={cap}); intersections were dropped — '
                'raise max_nuggets', RuntimeWarning)
        n = int(count)
        ridx, pidx, depths = ridx[:n], pidx[:n], depths[:n]
    out = (ridx, pidx)
    if return_depth:
        out = out + (depths,)
    if return_info:
        out = out + (info,)
    return out


def mark_pack_boundaries(pack_ids):
    """True at the first element of each pack.

    Parity: ``kaolin/render/spc/raytrace.py:86``.

    Example:
        >>> import jax.numpy as jnp
        >>> mark_pack_boundaries(jnp.array([0, 0, 1, 1, 1, 4])).tolist()
        [True, False, True, False, False, True]
    """
    first = jnp.ones((1,), dtype=bool)
    rest = pack_ids[1:] != pack_ids[:-1]
    return jnp.concatenate([first, rest])


def mark_first_hit(ridx):
    """Deprecated alias of :func:`mark_pack_boundaries`."""
    return mark_pack_boundaries(ridx)


def diff(feats, boundaries):
    """Per-pack forward difference; last element of each pack -> 0.

    Parity: ``kaolin/render/spc/raytrace.py:124``.
    """
    feats_shape = feats.shape
    f = feats.reshape(feats.shape[0], -1)
    nxt = jnp.concatenate([f[1:], jnp.zeros_like(f[:1])], axis=0)
    is_last = jnp.concatenate([boundaries[1:],
                               jnp.ones((1,), dtype=bool)])
    out = jnp.where(is_last[:, None], 0., nxt - f)
    return out.reshape(feats_shape)


def _segment_ids(boundaries):
    return jnp.cumsum(boundaries.astype(jnp.int32)) - 1


def sum_reduce(feats, boundaries, num_packs=None):
    """Sum features within each pack -> (num_packs, feat_dim).

    Parity: ``kaolin/render/spc/raytrace.py:208``.  ``num_packs`` must be
    passed under jit (defaults to the concrete boundary count).
    """
    if num_packs is None:
        num_packs = int(jnp.sum(boundaries))
    seg = _segment_ids(boundaries)
    return jax.ops.segment_sum(feats, seg, num_segments=num_packs)


def _segmented_scan(feats, boundaries, exclusive, reverse, op):
    """Segmented inclusive/exclusive, forward/reverse scan via
    associative_scan (log depth)."""
    f = feats
    b = boundaries
    if reverse:
        f = jnp.flip(f, axis=0)
        # pack starts of the reversed sequence = pack ends of the original
        ends = jnp.concatenate([b[1:], jnp.ones((1,), dtype=bool)])
        b = jnp.flip(ends, axis=0)
    identity = 0. if op == 'sum' else 1.
    if exclusive:
        prev = jnp.concatenate(
            [jnp.full_like(f[:1], identity), f[:-1]], axis=0)
        f = jnp.where(b[:, None], identity, prev)

    def combine(a, c):
        va, ra = a
        vc, rc = c
        if op == 'sum':
            v = vc + jnp.where(rc[:, None], 0., va)
        else:
            v = vc * jnp.where(rc[:, None], 1., va)
        return v, ra | rc

    out, _ = jax.lax.associative_scan(combine, (f, b), axis=0)
    if reverse:
        out = jnp.flip(out, axis=0)
    return out


def cumsum(feats, boundaries, exclusive=False, reverse=False):
    """Segmented cumulative sum (tf.math.cumsum semantics per pack).

    Parity: ``kaolin/render/spc/raytrace.py:221``.

    Example:
        >>> import jax.numpy as jnp
        >>> feats = jnp.array([[1.], [2.], [3.], [4.]])
        >>> boundaries = jnp.array([True, False, True, False])
        >>> cumsum(feats, boundaries).tolist()
        [[1.0], [3.0], [3.0], [7.0]]
    """
    return _segmented_scan(feats, boundaries, exclusive, reverse, 'sum')


def cumprod(feats, boundaries, exclusive=False, reverse=False):
    """Segmented cumulative product.

    Parity: ``kaolin/render/spc/raytrace.py:241``.  Gradients come from
    autodiff of the scan (product-rule form) — exact where the reference's
    div-by-feats formulation needs its NaN->0 patch
    (``raytrace.py:186-188``).
    """
    return _segmented_scan(feats, boundaries, exclusive, reverse, 'prod')


def exponential_integration(feats, tau, boundaries, exclusive=True,
                            num_packs=None):
    """Beer-Lambert transmittance integration across packs.

    Parity: ``kaolin/render/spc/raytrace.py:265``.

    Returns:
        (integrated feats (num_packs, feat_dim), transmittance
        (num_elems, 1)).
    """
    alpha = 1.0 - jnp.exp(-tau)
    transmittance = jnp.exp(-1.0 * cumsum(tau, boundaries,
                                          exclusive=exclusive))
    transmittance = transmittance * alpha
    feats_out = sum_reduce(transmittance * feats, boundaries,
                           num_packs=num_packs)
    return feats_out, transmittance
