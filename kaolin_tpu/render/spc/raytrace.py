"""SPC octree ray tracing + pack primitives for volume rendering.

Parity: ``kaolin/render/spc/raytrace.py`` + CUDA kernels
``kaolin/csrc/render/spc/raytrace_cuda.cu`` (reference).

TPU-native design (SURVEY.md §3.2, A.4):

* The breadth-first traversal with per-level host-synced dynamic
  allocation (CUB scan sizing, ``raytrace_cuda.cu:544-560``) becomes a
  stackless **t-marching** traversal (``_raytrace_march``): all per-ray
  state is flat ``(num_rays,)`` vectors inside one ``lax.while_loop``;
  each step re-descends the octree at the current ray position and
  either records a leaf hit or skips the empty ancestor voxel.  Hits are
  emitted in ascending depth per ray — the same near-to-far invariant
  the reference gets from its ``VOXEL_ORDER`` table (A.4) and that the
  pack ops rely on.
* Serial per-pack cumsum/cumprod (``raytrace_cuda.cu:373-483``) become
  log-depth segmented ``associative_scan``; cumprod gradients avoid the
  reference's div-by-feature NaN workaround entirely (product-rule form).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    'unbatched_raytrace',
    'mark_pack_boundaries',
    'mark_first_hit',
    'diff',
    'sum_reduce',
    'cumsum',
    'cumprod',
    'exponential_integration',
]


@functools.partial(jax.jit, static_argnames=(
    'level', 'max_hits_per_ray', 'max_steps'))
def _raytrace_march(octree, exsum, origin, direction, level,
                    max_hits_per_ray, max_steps):
    """Stackless t-marching octree traversal (all state is flat (NR,)).

    Replaces the reference's breadth-first nugget expansion
    (``raytrace_cuda.cu:485-607``, CUB-scan-sized per level — a host-synced
    dynamic-shape pattern XLA can't express efficiently).  Each step, every
    ray re-descends the octree (``identify`` walk, ``spc_utils.cuh:32``) at
    its current position ``o + (t + eps) * d``; a full path to the target
    level is a leaf hit (recorded if its entry depth > 0, CUDA parity for
    inside-origins); a broken path yields the *empty* ancestor voxel whose
    exit advances ``t`` — hierarchical empty-space skipping.  Hits are
    emitted in ascending-t order per ray, preserving the near-to-far
    invariant (A.4) that the pack ops rely on.

    Returns:
        pidx (NR, K) int32 (-1 pad), t_in (NR, K), t_out (NR, K),
        nhit (NR,) int32.
    """
    NR = origin.shape[0]
    K = max_hits_per_ray
    L = level
    o = origin
    d = direction
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    oct_i32 = octree.astype(jnp.int32)
    exsum = exsum.astype(jnp.int32)
    eps = 1e-5

    def slab(lo, hi):
        t0 = (lo - o) * inv_d
        t1 = (hi - o) * inv_d
        t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
        t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        return t_near, t_far

    # root box [-1, 1]^3
    root_near, root_far = slab(jnp.full_like(o, -1.), jnp.ones_like(o))
    t0 = jnp.maximum(root_near, 0.)
    done0 = root_far <= t0

    state = dict(
        t=t0,
        done=done0,
        nhit=jnp.zeros((NR,), jnp.int32),
        steps=jnp.zeros((), jnp.int32),
        pidx=jnp.full((NR, K), -1, jnp.int32),
        t_in=jnp.zeros((NR, K), o.dtype),
        t_out=jnp.zeros((NR, K), o.dtype),
    )

    def cond(s):
        return (~jnp.all(s['done'])) & (s['steps'] < max_steps)

    def body(s):
        t = s['t']
        pos = o + (t + eps)[:, None] * d
        outside = jnp.any(jnp.abs(pos) >= 1., axis=-1)
        done = s['done'] | outside

        # quantize to target-level integer coords
        q = jnp.clip(((pos + 1.) * (0.5 * (1 << L))).astype(jnp.int32),
                     0, (1 << L) - 1)

        # identify walk, tracking the level where the path dies
        ord_ = jnp.zeros((NR,), jnp.int32)
        alive = ~done
        fail_level = jnp.full((NR,), L + 1, jnp.int32)
        for l in range(L):
            depth_shift = L - l - 1
            cbits = (q >> depth_shift) & 1
            child = (cbits[:, 0] << 2) | (cbits[:, 1] << 1) | cbits[:, 2]
            bits = oct_i32[jnp.clip(ord_, 0, oct_i32.shape[0] - 1)]
            has = ((bits >> child) & 1) == 1
            rank = jax.lax.population_count(
                (bits & ((2 << child) - 1)).astype(jnp.uint32)
            ).astype(jnp.int32)
            new_ord = exsum[jnp.clip(ord_, 0, exsum.shape[0] - 1)] + rank
            newly_dead = alive & ~has
            fail_level = jnp.where(newly_dead, l + 1, fail_level)
            alive = alive & has
            ord_ = jnp.where(alive, new_ord, ord_)

        hit = alive  # full path to level L exists
        # voxel to advance through: the leaf (hit) or the empty ancestor
        sv = jnp.where(hit, L, fail_level)  # (NR,)
        qv = q >> (L - jnp.minimum(sv, L))[:, None]
        rv = jnp.exp2(-sv.astype(o.dtype))  # half voxel size
        lo = qv.astype(o.dtype) * (2. * rv)[:, None] - 1.
        hi = lo + (2. * rv)[:, None]
        t_near, t_far = slab(lo, hi)

        record = hit & ~done & (t_near > 0.) & (s['nhit'] < K)
        kslot = jax.nn.one_hot(s['nhit'], K, dtype=bool) & record[:, None]
        pidx = jnp.where(kslot, ord_[:, None], s['pidx'])
        t_in = jnp.where(kslot, t_near[:, None], s['t_in'])
        t_out = jnp.where(kslot, t_far[:, None], s['t_out'])
        nhit = s['nhit'] + record.astype(jnp.int32)
        done = done | (nhit >= K)

        # monotone advance to the voxel exit
        t_new = jnp.maximum(t_far, t + eps)
        t = jnp.where(done, t, t_new)
        return dict(t=t, done=done, nhit=nhit, steps=s['steps'] + 1,
                    pidx=pidx, t_in=t_in, t_out=t_out)

    s = jax.lax.while_loop(cond, body, state)
    return s['pidx'], s['t_in'], s['t_out'], s['nhit']


@functools.partial(jax.jit, static_argnames=('out_cap', 'with_exit'))
def _pack_nuggets(pidx, t_in, t_out, nhit, out_cap, with_exit):
    """Compact (NR, K) padded per-ray hits into the reference's packed
    ray-major nugget list — gather-only (offsets via cumsum +
    searchsorted), no scatter, no sort."""
    NR, K = pidx.shape
    offsets = jnp.cumsum(nhit) - nhit  # exclusive
    total = jnp.sum(nhit)
    j = jnp.arange(out_cap, dtype=jnp.int32)
    ray = jnp.searchsorted(offsets, j, side='right').astype(jnp.int32) - 1
    ray = jnp.clip(ray, 0, NR - 1)
    k = j - offsets[ray]
    valid = j < total
    src = ray * K + jnp.clip(k, 0, K - 1)
    out_ridx = jnp.where(valid, ray, -1)
    out_pidx = jnp.where(valid, pidx.reshape(-1)[src], -1)
    d_in = jnp.where(valid, t_in.reshape(-1)[src], 0.)
    if with_exit:
        d_out = jnp.where(valid, t_out.reshape(-1)[src], 0.)
        depths = jnp.stack([d_in, d_out], axis=-1)
    else:
        depths = d_in[:, None]
    return out_ridx, out_pidx, depths, total


def unbatched_raytrace(octree, point_hierarchy, pyramid, exsum, origin,
                       direction, level, return_depth=True, with_exit=False,
                       max_nuggets=None, trim=True, max_hits_per_ray=None,
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
        level: target octree level.
        return_depth: also return entry depths.
        with_exit: also return exit depths.
        max_nuggets: static capacity bound of the output (default:
            ``8 * num_rays`` per level, clamped by the octree size).
        trim: outside jit, trim outputs to the true intersection count
            (matches reference's dynamic shapes).  Under jit, set False
            and use the returned count/validity (``ridx == -1`` padding).

    Returns:
        (ridx, pidx[, depth]): intersection ray / point indices, and
        depths (num_nuggets, 1) or (num_nuggets, 2) if ``with_exit``.
    """
    num_rays = origin.shape[0]
    if max_nuggets is None:
        max_nuggets = num_rays * 8
    if max_hits_per_ray is None:
        # a ray crosses at most 3 * 2^level leaf voxels; cap for memory
        max_hits_per_ray = min(3 << level, 256)
    if max_steps is None:
        # backstop only — the while_loop exits when all rays are done
        max_steps = 6 * (1 << level) + 64

    pidx_pad, t_in, t_out, nhit = _raytrace_march(
        jnp.asarray(octree), jnp.asarray(exsum),
        jnp.asarray(origin), jnp.asarray(direction),
        level, int(max_hits_per_ray), int(max_steps))
    ridx, pidx, depths, count = _pack_nuggets(
        pidx_pad, t_in, t_out, nhit, int(max_nuggets), with_exit)
    if trim:
        n = int(count)
        ridx, pidx, depths = ridx[:n], pidx[:n], depths[:n]
    if return_depth:
        return ridx, pidx, depths
    return ridx, pidx


def mark_pack_boundaries(pack_ids):
    """True at the first element of each pack.

    Parity: ``kaolin/render/spc/raytrace.py:86``.
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
