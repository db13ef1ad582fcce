"""Tile-binned DIB-R engine: fused z-buffer selection + soft-mask.

Parity: ``kaolin/csrc/render/mesh/rasterization_cuda.cu:43-236`` (z-buffer
selection) and ``dibr_soft_mask_cuda.cu:27-404`` (soft mask), re-designed
for TPU.

Why tiles
---------
The CUDA kernels loop per pixel over *all* faces with shared-memory bbox
tiles; the pure-XLA equivalent (a pixels x faces sweep, or a gathered
per-pixel k-buffer) is HBM-bound: at 512^2 x 10k faces the k-buffer
epilogue gathers ~8M rows (TPU gathers run near one element per cycle)
and scatter-adds as many back.  Here faces are binned to 32x32-pixel
tiles once per step, and all per-pixel work is *tile-local dense vector
math* — regular compute instead of irregular memory:

1. **Binning** (`build_bins`): each face's (enlarged) bbox is mapped to a
   span of tiles; (tile, face) pairs are emitted for spans up to
   ``span x span`` tiles and sorted by (tile, face) with one
   ``lax.sort`` — each tile's faces form a contiguous, face-id-ascending
   segment.  Faces spanning more tiles go to a small global "big" list
   (``big_cap``) that every tile also processes; faces beyond ``big_cap``
   are dropped (use the brute-force backend for such degenerate scenes).
2. **Fused forward** (`selection_and_softmask`): one ``lax.map`` over
   tiles; each tile runs a ``lax.fori_loop`` whose trip count is its
   *actual* chunk count (XLA ``while`` with a traced bound — work scales
   with occupancy, shapes stay static).  Each chunk evaluates 128 faces
   against the tile's 1024 pixels: barycentric z-buffer update (strict
   ``>`` keeps the lowest face id on ties, matching the ascending CUDA
   loop) and the soft-mask partial product ``prod *= (1 - p)``.
3. **Backward** (`softmask_backward`): a ``lax.scan`` over tiles carrying
   the (F, 6) vertex-grad accumulator; each chunk reduces its pixel x face
   grads to (128, 6) rows and scatter-adds them — a few hundred 128-row
   scatters instead of one 8M-row scatter.

Semantics vs the reference: identical except that the soft mask has **no
``knum`` cap** — the CUDA kernel keeps only the first 30 covering faces
per pixel as a fixed-size-buffer limit (``dibr_soft_mask_cuda.cu:174``);
the tiled product includes *all* covering faces.  Results match bit-wise
wherever at most ``knum`` enlarged bboxes cover a pixel (virtually
always).  The backward uses the same ``(1-allprob)/(1-p+EPS)`` product
division as the CUDA kernel (``dibr_soft_mask_cuda.cu:283-284``).
"""

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from kaolin_tpu.render.mesh.rasterization import (
    pixel_coords, _bary_weights_pairwise)

_EPS = 1e-7        # reference dibr_soft_mask_cuda.cu:23
_CHUNK = 128       # faces per chunk = one lane tile


class Bins(NamedTuple):
    """Per-tile face lists (all jnp arrays; static config passed apart)."""
    sorted_fid: jnp.ndarray    # (N + CHUNK,) int32, segment-sorted face ids
    sorted_tile: jnp.ndarray   # (N + CHUNK,) int32, tile id (T = invalid)
    tile_start: jnp.ndarray    # (T + 1,) int32 segment starts
    big_fid: jnp.ndarray       # (big_cap,) int32 ascending, -1 padded
    num_big_chunks: jnp.ndarray  # () int32 = ceil(big_count / CHUNK)


def _axes(height, width, multiplier):
    """Linear pixel-center maps: x0 = ax*wi + bx, y0 = ay*hi + by
    (reference pixel convention ``rasterization_cuda.cu:85-86``)."""
    ax = 2. * multiplier / width
    bx = multiplier * (1. - width) / width
    ay = -2. * multiplier / height
    by = multiplier * (height - 1.) / height
    return ax, bx, ay, by


def build_bins(fvi_scaled, height, width, multiplier, margin=0., tile=32,
               span=4, big_cap=256):
    """Bin faces into ``tile x tile``-pixel tiles by (enlarged) bbox.

    Args:
        fvi_scaled: (F, 3, 2) image-plane verts (multiplier applied).
        margin: bbox enlargement in scaled units (soft mask ``boxlen *
            multiplier``; 0 for plain rasterization).

    Returns:
        Bins.  Static layout: ``Tx = ceil(W/tile)``, ``Ty = ceil(H/tile)``.
    """
    F = fvi_scaled.shape[0]
    Tx = -(-width // tile)
    Ty = -(-height // tile)
    T = Tx * Ty
    ax, bx, ay, by = _axes(height, width, multiplier)

    mn = jnp.min(fvi_scaled, axis=-2) - margin   # (F, 2)
    mx = jnp.max(fvi_scaled, axis=-2) + margin

    # pixel-column range whose centers can fall in [mn_x, mx_x]
    w_lo = jnp.ceil((mn[:, 0] - bx) / ax).astype(jnp.int32)
    w_hi = jnp.floor((mx[:, 0] - bx) / ax).astype(jnp.int32)
    # rows: y decreases with hi, so bounds swap
    h_lo = jnp.ceil((mx[:, 1] - by) / ay).astype(jnp.int32)
    h_hi = jnp.floor((mn[:, 1] - by) / ay).astype(jnp.int32)
    off = ((w_hi < w_lo) | (h_hi < h_lo)
           | (w_hi < 0) | (w_lo >= width) | (h_hi < 0) | (h_lo >= height))
    tx0 = jnp.clip(jnp.clip(w_lo, 0, width - 1) // tile, 0, Tx - 1)
    tx1 = jnp.clip(jnp.clip(w_hi, 0, width - 1) // tile, 0, Tx - 1)
    ty0 = jnp.clip(jnp.clip(h_lo, 0, height - 1) // tile, 0, Ty - 1)
    ty1 = jnp.clip(jnp.clip(h_hi, 0, height - 1) // tile, 0, Ty - 1)
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    big = (~off) & ((span_x > span) | (span_y > span))
    small = (~off) & (~big)

    # (F, span, span) candidate tiles; invalid slots get tile id T
    di = jnp.arange(span, dtype=jnp.int32)
    cand_tx = tx0[:, None] + di[None, :]            # (F, span)
    cand_ty = ty0[:, None] + di[None, :]
    ok_x = di[None, :] < span_x[:, None]
    ok_y = di[None, :] < span_y[:, None]
    tile_id = (cand_ty[:, :, None] * Tx + cand_tx[:, None, :])
    ok = (ok_y[:, :, None] & ok_x[:, None, :]) & small[:, None, None]
    tile_id = jnp.where(ok, tile_id, T).reshape(-1).astype(jnp.int32)
    fids = jnp.broadcast_to(
        jnp.arange(F, dtype=jnp.int32)[:, None, None],
        (F, span, span)).reshape(-1)

    sorted_tile, sorted_fid = jax.lax.sort((tile_id, fids), num_keys=2)
    # pad one chunk of sentinels so per-tile dynamic slices never wrap
    sorted_tile = jnp.pad(sorted_tile, (0, _CHUNK), constant_values=T)
    sorted_fid = jnp.pad(sorted_fid, (0, _CHUNK))
    tile_start = jnp.searchsorted(
        sorted_tile, jnp.arange(T + 1, dtype=jnp.int32)).astype(jnp.int32)

    BIG = jnp.int32(2 ** 30)
    bk = jnp.sort(jnp.where(big, jnp.arange(F, dtype=jnp.int32), BIG))
    bk = bk[:big_cap] if F >= big_cap else jnp.pad(
        bk, (0, big_cap - F), constant_values=BIG)
    big_fid = jnp.where(bk < BIG, bk, -1)
    big_count = jnp.sum(big).astype(jnp.int32)
    num_big_chunks = -(-jnp.minimum(big_count, big_cap) // _CHUNK)
    return Bins(sorted_fid, sorted_tile, tile_start, big_fid,
                num_big_chunks)


def _min_sqdist_terms(fv, x0, y0, multiplier):
    """Distance candidates to a 2D triangle (``dibr_soft_mask_cuda.cu:
    100-149``): 3 perpendicular edge distances (sentinel ``4*m^2`` when
    the projection falls outside the segment) + 3 vertex distances.

    fv: (C, 3, 2); x0/y0: (P, 1).  Returns (P, C, 6) stacked.
    """
    dists = []
    sentinel = 4. * multiplier * multiplier
    for i in range(3):
        x1, y1 = fv[None, :, i, 0], fv[None, :, i, 1]
        x2 = fv[None, :, (i + 1) % 3, 0]
        y2 = fv[None, :, (i + 1) % 3, 1]
        A = y2 - y1
        B = x1 - x2
        C = x2 * y1 - x1 * y2
        up = A * x0 + B * y0 + C
        down = A * A + B * B
        x3 = (B * B * x0 - A * B * y0 - A * C) / (down + _EPS)
        y3 = (A * A * y0 - A * B * x0 - B * C) / (down + _EPS)
        direct = (x3 - x1) * (x3 - x2) + (y3 - y1) * (y3 - y2)
        perp = up * up / (down + _EPS)
        dists.append(jnp.where(direct > 0, sentinel, perp))
    for i in range(3):
        x1, y1 = fv[None, :, i, 0], fv[None, :, i, 1]
        dists.append((x0 - x1) ** 2 + (y0 - y1) ** 2)
    return jnp.stack(dists, axis=-1)


def _chunk_arrays(bins: Bins, t, n_seg, start, i):
    """Face ids + validity for chunk ``i`` of tile ``t`` (segment chunks
    first, then the global big-face chunks)."""
    is_seg = i < n_seg
    off = jnp.where(is_seg, start + i * _CHUNK, 0)
    fid_seg = jax.lax.dynamic_slice(bins.sorted_fid, (off,), (_CHUNK,))
    tid_seg = jax.lax.dynamic_slice(bins.sorted_tile, (off,), (_CHUNK,))
    j = jnp.maximum(i - n_seg, 0)
    fid_big = jax.lax.dynamic_slice(bins.big_fid, (j * _CHUNK,), (_CHUNK,))
    fid = jnp.where(is_seg, fid_seg, fid_big)
    fvalid = jnp.where(is_seg, tid_seg == t, fid_big >= 0)
    return jnp.maximum(fid, 0), fvalid


def _merge_zbuffer(best_z, best_fid, z, fid):
    """Depth-test merge; ties keep the lowest face id (the ascending CUDA
    face loop keeps the first, ``rasterization_cuda.cu:159-169``)."""
    zc = jnp.max(z, axis=1)
    arg = jnp.argmax(z, axis=1)
    fc = fid[arg]
    upd = (zc > best_z) | ((zc == best_z) & (fc < best_fid) & (best_fid >= 0))
    return jnp.where(upd, zc, best_z), jnp.where(upd, fc, best_fid)


@functools.partial(jax.jit, static_argnames=(
    'height', 'width', 'multiplier', 'margin', 'tile', 'eps', 'sigmainv',
    'with_softmask'))
def _fused_forward(bins, fvz, fvi_scaled, vmask, height, width, multiplier,
                   margin, tile, eps, sigmainv, with_softmask):
    """face_idx (H, W) + soft-mask partial product (H, W) in one sweep."""
    Tx = -(-width // tile)
    Ty = -(-height // tile)
    T = Tx * Ty
    P = tile * tile
    ax, bx, ay, by = _axes(height, width, multiplier)
    inv = sigmainv / (multiplier * multiplier)
    neg_inf = jnp.asarray(-jnp.inf, fvz.dtype)

    def tile_body(t):
        start = bins.tile_start[t]
        n_seg = -(-(bins.tile_start[t + 1] - start) // _CHUNK)
        n_total = n_seg + bins.num_big_chunks
        wi = (t % Tx) * tile + jnp.arange(tile, dtype=jnp.int32)
        hi = (t // Tx) * tile + jnp.arange(tile, dtype=jnp.int32)
        x0 = (ax * wi + bx).astype(fvz.dtype)
        y0 = (ay * hi + by).astype(fvz.dtype)
        x0 = jnp.broadcast_to(x0[None, :], (tile, tile)).reshape(P, 1)
        y0 = jnp.broadcast_to(y0[:, None], (tile, tile)).reshape(P, 1)

        def chunk(i, carry):
            best_z, best_fid, prod = carry
            fid, fvalid = _chunk_arrays(bins, t, n_seg, start, i)
            fv = fvi_scaled[fid]                       # (C, 3, 2)
            w0, w1, w2 = _bary_weights_pairwise(
                fv, x0[:, 0], y0[:, 0], eps)           # (P, C)
            covered = ((w0 >= 0.) & (w1 >= 0.) & (w2 >= 0.)
                       & (fvalid & vmask[fid])[None, :])
            z = (w0 * fvz[fid][None, :, 0] + w1 * fvz[fid][None, :, 1]
                 + w2 * fvz[fid][None, :, 2])
            z = jnp.where(covered, z, neg_inf)
            best_z, best_fid = _merge_zbuffer(best_z, best_fid, z, fid)
            if with_softmask:
                mnb = jnp.min(fv, axis=-2) - margin    # (C, 2)
                mxb = jnp.max(fv, axis=-2) + margin
                enl = ((x0 >= mnb[None, :, 0]) & (x0 < mxb[None, :, 0])
                       & (y0 >= mnb[None, :, 1]) & (y0 < mxb[None, :, 1])
                       & fvalid[None, :])
                d = jnp.min(_min_sqdist_terms(fv, x0, y0, multiplier),
                            axis=-1)
                p = jnp.where(enl, jnp.exp(-inv * d), 0.)
                prod = prod * jnp.prod(1. - p, axis=1)
            return best_z, best_fid, prod

        init = (jnp.full((P,), neg_inf),
                jnp.full((P,), -1, jnp.int32),
                jnp.ones((P,), fvz.dtype))
        _, best_fid, prod = jax.lax.fori_loop(0, n_total, chunk, init)
        return best_fid, prod

    fid_t, prod_t = jax.lax.map(tile_body, jnp.arange(T, dtype=jnp.int32))
    def untile(img):
        img = img.reshape(Ty, Tx, tile, tile).transpose(0, 2, 1, 3)
        return img.reshape(Ty * tile, Tx * tile)[:height, :width]
    return untile(fid_t), untile(prod_t)


@functools.partial(jax.jit, static_argnames=(
    'height', 'width', 'multiplier', 'margin', 'tile', 'sigmainv'))
def _softmask_backward(bins, fvi_scaled, empty, prod, g, height, width,
                       multiplier, margin, tile, sigmainv):
    """d(mask)/d(fvi_scaled): same product-division algebra as the CUDA
    backward (``dibr_soft_mask_cuda.cu:230-353``), tile-local."""
    F = fvi_scaled.shape[0]
    Tx = -(-width // tile)
    Ty = -(-height // tile)
    T = Tx * Ty
    P = tile * tile
    ax, bx, ay, by = _axes(height, width, multiplier)
    inv = sigmainv / (multiplier * multiplier)

    pad_h = Ty * tile - height
    pad_w = Tx * tile - width
    def tiled(img):
        img = jnp.pad(img, ((0, pad_h), (0, pad_w)))
        return img.reshape(Ty, tile, Tx, tile).transpose(0, 2, 1, 3
                                                         ).reshape(T, P)
    g_eff = tiled(jnp.where(empty, g, 0.) * prod)   # g * allprod, per pixel
    prod_t = tiled(prod)

    def tile_step(dfvi, t):
        start = bins.tile_start[t]
        n_seg = -(-(bins.tile_start[t + 1] - start) // _CHUNK)
        n_total = n_seg + bins.num_big_chunks
        wi = (t % Tx) * tile + jnp.arange(tile, dtype=jnp.int32)
        hi = (t // Tx) * tile + jnp.arange(tile, dtype=jnp.int32)
        x0 = (ax * wi + bx).astype(fvi_scaled.dtype)
        y0 = (ay * hi + by).astype(fvi_scaled.dtype)
        x0 = jnp.broadcast_to(x0[None, :], (tile, tile)).reshape(P, 1)
        y0 = jnp.broadcast_to(y0[:, None], (tile, tile)).reshape(P, 1)
        gt = g_eff[t][:, None]                        # (P, 1)

        def chunk(i, dfvi):
            fid, fvalid = _chunk_arrays(bins, t, n_seg, start, i)
            fv = fvi_scaled[fid]
            mnb = jnp.min(fv, axis=-2) - margin
            mxb = jnp.max(fv, axis=-2) + margin
            enl = ((x0 >= mnb[None, :, 0]) & (x0 < mxb[None, :, 0])
                   & (y0 >= mnb[None, :, 1]) & (y0 < mxb[None, :, 1])
                   & fvalid[None, :])
            dall = _min_sqdist_terms(fv, x0, y0, multiplier)  # (P, C, 6)
            d = jnp.min(dall, axis=-1)
            branch = jnp.argmin(dall, axis=-1)
            p = jnp.where(enl, jnp.exp(-inv * d), 0.)
            # dL/dp_k = g * allprod / (1 - p_k + EPS)  (CUDA :283-284)
            dd = -inv * p * gt / (1. - p + _EPS)      # (P, C)
            comp = [jnp.zeros_like(dd) for _ in range(6)]
            for e in range(3):
                x1, y1 = fv[None, :, e, 0], fv[None, :, e, 1]
                x2 = fv[None, :, (e + 1) % 3, 0]
                y2 = fv[None, :, (e + 1) % 3, 1]
                A = y2 - y1
                B = x1 - x2
                C = x2 * y1 - x1 * y2
                up = A * x0 + B * y0 + C
                down = A * A + B * B
                x3 = (B * B * x0 - A * B * y0 - A * C) / (down + _EPS)
                y3 = (A * A * y0 - A * B * x0 - B * C) / (down + _EPS)
                direct = (x3 - x1) * (x3 - x2) + (y3 - y1) * (y3 - y2)
                perp = up * up / (down + _EPS)
                # the sentinel branch (projection outside the segment) is
                # a constant — no gradient (dibr_soft_mask_cuda.cu:135)
                w = jnp.where((branch == e) & (direct <= 0), dd, 0.)
                dA = 2. * (up * x0 - perp * A) / (down + _EPS)
                dB = 2. * (up * y0 - perp * B) / (down + _EPS)
                dC = 2. * up / (down + _EPS)
                j = (e + 1) % 3
                comp[2 * e] += w * (dB - dC * y2)
                comp[2 * e + 1] += w * (dC * x2 - dA)
                comp[2 * j] += w * (dC * y1 - dB)
                comp[2 * j + 1] += w * (dA - dC * x1)
            for v in range(3):
                w = jnp.where(branch == (3 + v), dd, 0.)
                x1, y1 = fv[None, :, v, 0], fv[None, :, v, 1]
                comp[2 * v] += w * 2. * (x1 - x0)
                comp[2 * v + 1] += w * 2. * (y1 - y0)
            rows = jnp.stack([c.sum(axis=0) for c in comp], axis=-1)
            return dfvi.at[fid].add(rows)             # (C, 6) scatter

        return jax.lax.fori_loop(0, n_total, chunk, dfvi), None

    dfvi, _ = jax.lax.scan(tile_step, jnp.zeros((F, 6), fvi_scaled.dtype),
                           jnp.arange(T, dtype=jnp.int32))
    return dfvi.reshape(F, 3, 2)


# ---------------------------------------------------------------------------
# public fused API (single mesh; batch via lax.map in callers)

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def softmask_from_prod(fvi_scaled, prod, empty, bin_arrays, config):
    """Soft mask from the precomputed partial product, differentiable
    w.r.t. ``fvi_scaled`` (``prod`` must equal the product computed from
    the same ``fvi_scaled``/``bin_arrays`` — callers get both from
    :func:`selection_and_softmask`).

    config: hashable (height, width, multiplier, margin, tile, sigmainv).
    """
    del fvi_scaled, bin_arrays, config
    return jnp.where(empty, 1. - prod, 1.)


def _softmask_fwd(fvi_scaled, prod, empty, bin_arrays, config):
    out = jnp.where(empty, 1. - prod, 1.)
    return out, (fvi_scaled, prod, empty, bin_arrays)


def _softmask_bwd(config, res, g):
    fvi_scaled, prod, empty, bin_arrays = res
    height, width, multiplier, margin, tile, sigmainv = config
    dfvi = _softmask_backward(
        Bins(*bin_arrays), fvi_scaled, empty, prod, g, height, width,
        multiplier=multiplier, margin=margin, tile=tile, sigmainv=sigmainv)
    fl0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dfvi, jnp.zeros_like(prod), fl0(empty),
            jax.tree.map(fl0, tuple(bin_arrays)))


softmask_from_prod.defvjp(_softmask_fwd, _softmask_bwd)


def selection_and_softmask(face_vertices_z, face_vertices_image,
                           valid_faces=None, height=256, width=256,
                           multiplier=1000., boxlen=0.02, sigmainv=7000.,
                           tile=32, span=4, big_cap=256,
                           with_softmask=True):
    """Fused tiled selection + soft mask for a batch of meshes.

    Args:
        face_vertices_z: (B, F, 3); face_vertices_image: (B, F, 3, 2)
        in [-1, 1]; valid_faces: (B, F) bool or None.

    Returns:
        (face_idx (B, H, W) int32, soft_mask (B, H, W)).  The soft mask
        is differentiable w.r.t. ``face_vertices_image``; the face index
        is piecewise constant (stop-gradient).
    """
    B, F = face_vertices_z.shape[:2]
    if valid_faces is None:
        valid_faces = jnp.ones((B, F), dtype=bool)
    margin = float(boxlen) * float(multiplier)
    config = (height, width, float(multiplier), margin, tile,
              float(sigmainv))
    fvi_scaled = face_vertices_image * multiplier

    def one(args):
        fvz, fvi, vmask = args
        fvi_ng = jax.lax.stop_gradient(fvi)
        bins = build_bins(fvi_ng, height, width, float(multiplier),
                          margin=margin, tile=tile, span=span,
                          big_cap=big_cap)
        face_idx, prod = _fused_forward(
            bins, jax.lax.stop_gradient(fvz), fvi_ng, vmask,
            height=height, width=width, multiplier=float(multiplier),
            margin=margin, tile=tile, eps=1e-8, sigmainv=float(sigmainv),
            with_softmask=with_softmask)
        if not with_softmask:
            return face_idx, (face_idx >= 0).astype(fvz.dtype)
        mask = softmask_from_prod(fvi, prod, face_idx < 0, tuple(bins),
                                  config)
        return face_idx, mask

    # sequential over batch: one mesh already fills the chip
    face_idx, mask = jax.lax.map(
        one, (face_vertices_z, fvi_scaled, valid_faces))
    return jax.lax.stop_gradient(face_idx), mask
