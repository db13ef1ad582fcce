"""SPC octree ray tracing + pack primitives for volume rendering.

Parity: ``kaolin/render/spc/raytrace.py`` + CUDA kernels
``kaolin/csrc/render/spc/raytrace_cuda.cu`` (reference).

TPU-native design (SURVEY.md §3.2, A.4):

* The breadth-first traversal's per-level host-synced dynamic allocation
  (CUB scan sizing, ``raytrace_cuda.cu:544-560``) becomes a statically
  bounded masked expansion: per level, every live nugget expands to 8
  child slots ordered near-to-far by the ``VOXEL_ORDER`` table, then a
  cumsum scatter compacts live entries (order-preserving, so the output
  stays depth-sorted per ray — the invariant the pack ops rely on).
  Per-level capacity = min(8 * prev, num_rays * nodes_at_level, max cap) —
  all host-known from the pyramid.
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

# near-to-far child visit order per ray-origin octant
# (raytrace_cuda.cu:48-57)
VOXEL_ORDER = np.array([
    [0, 1, 2, 4, 3, 5, 6, 7],
    [1, 0, 3, 5, 2, 4, 7, 6],
    [2, 0, 3, 6, 1, 4, 7, 5],
    [3, 1, 2, 7, 0, 5, 6, 4],
    [4, 0, 5, 6, 1, 2, 7, 3],
    [5, 1, 4, 7, 0, 3, 6, 2],
    [6, 2, 4, 7, 0, 3, 5, 1],
    [7, 3, 5, 6, 1, 2, 4, 0]], dtype=np.int32)


def _ray_aabb(o, d, inv_d, sgn, center, r):
    """Majercik et al. slab test (``spc_render_utils.cuh:47``).

    All args (..., 3) except r scalar.  Returns (...,) depth: 0 = miss,
    negative (-r) = origin inside the box.
    """
    oc = o - center
    cmax = jnp.max(jnp.abs(oc), axis=-1)
    inside = cmax < r
    winding = jnp.where(inside, -r, r)

    dplane = (winding[..., None] * sgn - oc) * inv_d  # (..., 3)
    d0, d1, d2 = dplane[..., 0], dplane[..., 1], dplane[..., 2]
    ltxy = d[..., 1] * d0 + oc[..., 1]
    ltxz = d[..., 2] * d0 + oc[..., 2]
    ltyx = d[..., 0] * d1 + oc[..., 0]
    ltyz = d[..., 2] * d1 + oc[..., 2]
    ltzx = d[..., 0] * d2 + oc[..., 0]
    ltzy = d[..., 1] * d2 + oc[..., 1]
    test0 = (d0 >= 0.) & (jnp.abs(ltxy) <= r) & (jnp.abs(ltxz) <= r)
    test1 = (d1 >= 0.) & (jnp.abs(ltyx) <= r) & (jnp.abs(ltyz) <= r)
    test2 = (d2 >= 0.) & (jnp.abs(ltzx) <= r) & (jnp.abs(ltzy) <= r)
    depth = jnp.where(test0, d0, jnp.where(test1, d1,
                                           jnp.where(test2, d2, 0.)))
    return jnp.where(inside, winding, depth)


def _ray_sgn(d):
    # signbit -> +1, else -1 (spc_render_utils.cuh:21)
    return jnp.where(jnp.signbit(d), 1., -1.)


def _compact(mask, arrays, out_cap):
    """Order-preserving compaction of masked rows into out_cap slots.

    Implemented as an argsort on (invalid, position) keys — a vectorized
    sort on TPU, where a scatter would lower to a serial loop.
    """
    n = mask.shape[0]
    big = n + 1
    keys = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), big)
    order = jnp.argsort(keys)  # valid rows first, original order kept
    take = min(out_cap, n)
    sel = order[:take]
    sel_valid = keys[sel] < big
    outs = []
    for a, fill in arrays:
        picked = jnp.where(
            sel_valid.reshape((-1,) + (1,) * (a.ndim - 1)), a[sel], fill)
        if take < out_cap:
            pad_width = ((0, out_cap - take),) + ((0, 0),) * (a.ndim - 1)
            picked = jnp.pad(picked, pad_width, constant_values=fill)
        outs.append(picked)
    count = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), out_cap)
    return outs, count


@functools.partial(jax.jit, static_argnames=(
    'level', 'return_depth', 'with_exit', 'caps'))
def _raytrace_impl(octree, point_hierarchy, exsum, origin, direction,
                   level, return_depth, with_exit, caps):
    num_rays = origin.shape[0]
    inv_d = 1.0 / (direction + 1e-8)
    sgn = _ray_sgn(direction)
    exit_sgn = _ray_sgn(-direction)
    ph = point_hierarchy.astype(jnp.int32)
    exsum = exsum.astype(jnp.int32)
    voxel_order = jnp.asarray(VOXEL_ORDER)

    ridx = jnp.arange(num_rays, dtype=jnp.int32)
    pidx = jnp.zeros((num_rays,), dtype=jnp.int32)
    valid = jnp.ones((num_rays,), dtype=bool)

    for l in range(level):
        r = 1.0 / (1 << l)
        centers = ph[pidx] * (2.0 * r) + r - 1.0  # (n, 3)
        o = origin[ridx]
        d = direction[ridx]
        depth = _ray_aabb(o, d, inv_d[ridx], sgn[ridx], centers, r)
        hit = valid & (depth != 0.)

        bits = octree[pidx].astype(jnp.int32)
        # ray-origin octant -> child visit order
        org01 = 0.5 * o + 0.5
        rel = org01 - (ph[pidx].astype(origin.dtype) + 0.5) * r
        code = ((rel[:, 0] > 0).astype(jnp.int32) * 4
                + (rel[:, 1] > 0).astype(jnp.int32) * 2
                + (rel[:, 2] > 0).astype(jnp.int32))
        order = voxel_order[code]  # (n, 8) child ids near-to-far

        child_bit = (bits[:, None] >> order) & 1  # (n, 8)
        rank = jax.lax.population_count(
            (bits[:, None] & ((2 << order) - 1)).astype(jnp.uint32)
        ).astype(jnp.int32)
        child_pidx = exsum[pidx][:, None] + rank  # (n, 8)
        child_valid = hit[:, None] & (child_bit == 1)

        flat_mask = child_valid.reshape(-1)
        flat_pidx = child_pidx.reshape(-1)
        flat_ridx = jnp.repeat(ridx, 8, total_repeat_length=ridx.shape[0] * 8)
        (ridx, pidx, valid), _ = _compact(
            flat_mask,
            [(flat_ridx, 0), (flat_pidx, 0),
             (jnp.ones_like(flat_mask), False)], caps[l])

    # final level: depth test
    r = 1.0 / (1 << level)
    centers = ph[pidx] * (2.0 * r) + r - 1.0
    o = origin[ridx]
    d = direction[ridx]
    depth_in = _ray_aabb(o, d, inv_d[ridx], sgn[ridx], centers, r)
    if with_exit:
        depth_out = _ray_aabb(o, d, inv_d[ridx], exit_sgn[ridx], centers, r)
        keep = valid & (depth_in > 0.) & (depth_out > 0.)
    else:
        keep = valid & (depth_in > 0.)

    arrays = [(ridx, -1), (pidx, -1), (depth_in, 0.)]
    if with_exit:
        arrays.append((depth_out, 0.))
    outs, count = _compact(keep, arrays, caps[level])
    if with_exit:
        out_ridx, out_pidx, d_in, d_out = outs
        depths = jnp.stack([d_in, d_out], axis=-1)
    else:
        out_ridx, out_pidx, d_in = outs
        depths = d_in[:, None]
    return out_ridx, out_pidx, depths, count


def unbatched_raytrace(octree, point_hierarchy, pyramid, exsum, origin,
                       direction, level, return_depth=True, with_exit=False,
                       max_nuggets=None, trim=True):
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
    pyr = np.asarray(pyramid)
    # pyramid may be traced; require host numpy for capacities
    nodes_at = pyr[0]
    if max_nuggets is None:
        max_nuggets = num_rays * 8
    caps = []
    prev = num_rays
    for l in range(1, level + 2):
        n_nodes = int(nodes_at[min(l, len(nodes_at) - 1)])
        cap = min(prev * 8, num_rays * max(n_nodes, 1), max_nuggets)
        # round up for better compiled-shape reuse
        cap = int(np.ceil(cap / 128) * 128)
        caps.append(cap)
        prev = cap
    caps[-1] = caps[-2] if level > 0 else caps[-1]

    ridx, pidx, depths, count = _raytrace_impl(
        octree, point_hierarchy, exsum,
        jnp.asarray(origin), jnp.asarray(direction),
        level, return_depth, with_exit, tuple(caps))
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
