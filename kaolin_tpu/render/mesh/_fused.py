"""Fused tile-binned DIB-R engine (Pallas TPU kernels).

Parity: ``kaolin/csrc/render/mesh/rasterization_cuda.cu:43-236`` (z-buffer
selection) and ``dibr_soft_mask_cuda.cu:27-404`` (soft mask), re-designed
TPU-first.

Design
------
The CUDA kernels loop per pixel over faces with shared-memory bbox tiles.
The TPU equivalent built here:

1. **Spatial face sort + tile binning** (XLA, :func:`build_face_tiles`):
   faces are sorted by the pixel tile containing their (enlarged) bbox
   center and padded to chunks of ``FC`` faces.  After the sort each chunk
   is spatially local, so chunk-granularity culling works: for every image
   tile we keep only the *range* ``[lo, hi)`` of chunk ids whose bboxes
   overlap it (ranges are tight because chunks are sorted by tile), plus a
   per-chunk bbox for an exact in-kernel skip test.  A face spanning many
   tiles simply widens the ranges of the tiles it covers — there is no
   "big face" cap and nothing is ever dropped.

2. **Affine face columns**: every per-pixel quantity the rasterizer needs
   (the three edge functions, their sum, and the z numerator) is *affine*
   in pixel coordinates, so it is precomputed per face as three columns
   ``(c, cx, cy)`` and evaluated in-kernel with two FMAs.  Faces live on
   sublanes, pixels on lanes: coefficient broadcasts are free column
   slices, reductions over faces are fast sublane reductions, and the
   per-pixel running state (z, face id, soft-mask product) is a dense
   ``(1, P)`` lane vector.  No transposes anywhere in the hot loop.

3. **Fused forward kernel**: one pass per image tile computing both the
   z-buffer winner (strict ``>`` merge) and the soft-mask partial product
   ``prod(1 - p)`` over *all* faces whose enlarged bbox covers the pixel
   (the CUDA kernel caps at ``knum`` per its fixed k-buffer; results agree
   whenever coverage <= knum — virtually always).

4. **Transposed backward kernel**: gradients of the soft mask w.r.t. the
   image-space vertices use the same product-division algebra as the CUDA
   backward (``dibr_soft_mask_cuda.cu:283-284``: ``dL/dp_k = g * allprod /
   (1 - p_k + EPS)``).  The grid runs over *face chunks*; each program
   loops over the tiles its chunk overlaps and accumulates a dense
   ``(FC, 6)`` gradient block — every face chunk owns its output rows, so
   there are **no scatters and no atomics** (the CUDA backward needs
   atomicAdd).

Semantics notes (vs the brute-force ``dibr.py`` backend):

- backward: the product division is the CUDA kernel's approximation;
  ``dibr.py`` uses exact exclusive cumprods over its k-buffer.  The two
  differ only when some covering face has ``p ~ 1`` (pixel exactly on a
  face boundary).  The golden gradient fixtures were produced by the CUDA
  kernel, whose semantics this engine matches.
- z-ties: on an *exact* float z tie between two faces the CUDA kernel and
  the 'jnp' backend keep the lowest original face id; this engine keeps
  the lowest *spatially sorted* id (measure-zero event on real scenes).
"""

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['FusedSelection', 'fused_selection', 'softmask_fused']

_EPS = 1e-7        # reference dibr_soft_mask_cuda.cu:23
PS = 8             # pixel tile rows
FC = 64            # faces per chunk (sublanes)

# vt column layout (lanes of the (FC, NCOL) per-chunk face tile)
_W0 = 0            # w0 affine: c, cx, cy            (edge function 0)
_W1 = 3
_W2 = 6
_NRM = 9           # norm = w0+w1+w2 affine
_ZU = 12           # z numerator affine
_VALID = 15
_VX = 16           # x1,y1,x2,y2,x3,y3 image verts
_BB = 22           # enlarged bbox: xlo, ylo, xhi, yhi
_ED = 26           # per edge e: A, B, C, inv(A^2+B^2+EPS) at 26+4e
_NCOL = 40         # 38 used, padded to a multiple of 8


class FusedSelection(NamedTuple):
    """Selection-pass outputs + residuals for the soft-mask backward."""
    face_idx: jnp.ndarray      # (B, H, W) int32, original face ids, -1 empty
    prod: jnp.ndarray          # (B, H, W) f32 prod(1-p) over covering faces
    vt: jnp.ndarray            # (B, nC, FC, NCOL) sorted face columns
    chunk_tranges: jnp.ndarray  # (B, nC, 2) int32 tile range per chunk
    chunk_bbox: jnp.ndarray    # (B, nC, 4) f32 chunk bbox (union of faces)
    inv_perm: jnp.ndarray      # (B, F) sorted position of each original face


def _pixel_affine(height, width, multiplier):
    """x0 = ax*wi + bx, y0 = ay*hi + by (rasterization_cuda.cu:85-86)."""
    ax = 2. * multiplier / width
    bx = multiplier * (1. - width) / width
    ay = -2. * multiplier / height
    by = multiplier * (height - 1.) / height
    return ax, bx, ay, by


def _padded_dims(height, width):
    """Tile-aligned padded image dims; extra pixels computed then cropped."""
    hp = -(-height // PS) * PS
    if width > 128:
        wp = -(-width // 128) * 128
    else:
        wp = -(-width // 16) * 16      # P = 8*wp stays a lane multiple
    return hp, wp


def _tile_dims(hp, wp):
    tw = min(128, wp)
    return hp // PS, wp // tw, tw


def build_face_tiles(face_vertices_z, fvi_scaled, valid_faces, height,
                     width, multiplier, margin):
    """Sort faces spatially, build per-face columns + tile/chunk ranges.

    Single mesh: fvz (F, 3), fvi_scaled (F, 3, 2), valid (F,).

    Returns:
        (vt (nC, FC, NCOL), tile_ranges (T, 2), chunk_tranges (nC, 2),
        chunk_bbox (nC, 4), perm (Fp,), inv_perm (F,)).
    """
    F = face_vertices_z.shape[0]
    hp, wp = _padded_dims(height, width)
    nI, nJ, TW = _tile_dims(hp, wp)
    T = nI * nJ
    axp, bxp, ayp, byp = _pixel_affine(height, width, multiplier)
    dtype = fvi_scaled.dtype

    mn = jnp.min(fvi_scaled, axis=-2) - margin    # (F, 2) enlarged bbox
    mx = jnp.max(fvi_scaled, axis=-2) + margin

    # ---- spatial sort by tile of bbox center --------------------------
    cx = (mn[:, 0] + mx[:, 0]) * 0.5
    cy = (mn[:, 1] + mx[:, 1]) * 0.5
    wi_c = (cx - bxp) / axp
    hi_c = (cy - byp) / ayp
    tx = jnp.clip(wi_c.astype(jnp.int32) // TW, 0, nJ - 1)
    ty = jnp.clip(hi_c.astype(jnp.int32) // PS, 0, nI - 1)
    perm = jnp.argsort((ty * nJ + tx).astype(jnp.int32),
                       stable=True).astype(jnp.int32)
    inv_perm = jnp.argsort(perm).astype(jnp.int32)

    fpad = (-F) % FC
    Fp = F + fpad
    nC = Fp // FC

    def pad(a, fill=0.):
        return jnp.pad(a, ((0, fpad),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    fvz = pad(face_vertices_z[perm])
    fvi = pad(fvi_scaled[perm])
    valid = pad(valid_faces[perm].astype(dtype))
    # padded faces: bbox that never covers and never overlaps a tile
    mn = pad(mn[perm], fill=2. * float(multiplier))
    mx = pad(mx[perm], fill=-2. * float(multiplier))

    ax_, ay_ = fvi[:, 0, 0], fvi[:, 0, 1]
    bx_, by_ = fvi[:, 1, 0], fvi[:, 1, 1]
    cx_, cy_ = fvi[:, 2, 0], fvi[:, 2, 1]
    za, zb, zc = fvz[:, 0], fvz[:, 1], fvz[:, 2]

    cols = [None] * _NCOL
    # edge-function affine coefficients (value, d/dx0, d/dy0)
    cols[_W0:_W0 + 3] = [bx_ * cy_ - by_ * cx_, by_ - cy_, cx_ - bx_]
    cols[_W1:_W1 + 3] = [cx_ * ay_ - cy_ * ax_, cy_ - ay_, ax_ - cx_]
    cols[_W2:_W2 + 3] = [ax_ * by_ - ay_ * bx_, ay_ - by_, bx_ - ax_]
    for k in range(3):
        cols[_NRM + k] = (cols[_W0 + k] + cols[_W1 + k] + cols[_W2 + k])
        cols[_ZU + k] = (cols[_W0 + k] * za + cols[_W1 + k] * zb
                         + cols[_W2 + k] * zc)
    cols[_VALID] = valid
    cols[_VX:_VX + 6] = [ax_, ay_, bx_, by_, cx_, cy_]
    cols[_BB:_BB + 4] = [mn[:, 0], mn[:, 1], mx[:, 0], mx[:, 1]]
    vx = [ax_, ay_, bx_, by_, cx_, cy_]
    for e in range(3):
        x1, y1 = vx[2 * e], vx[2 * e + 1]
        x2 = vx[2 * ((e + 1) % 3)]
        y2 = vx[2 * ((e + 1) % 3) + 1]
        A = y2 - y1
        Bc = x1 - x2
        Cc = x2 * y1 - x1 * y2
        cols[_ED + 4 * e:_ED + 4 * e + 4] = [
            A, Bc, Cc, 1. / (A * A + Bc * Bc + _EPS)]
    for k in range(_NCOL):
        if cols[k] is None:
            cols[k] = jnp.zeros((Fp,), dtype)
    vt = jnp.stack(cols, axis=-1).reshape(nC, FC, _NCOL).astype(dtype)

    # ---- chunk bboxes + tile <-> chunk overlap ranges ------------------
    cmn = mn.reshape(nC, FC, 2).min(axis=1)                 # (nC, 2)
    cmx = mx.reshape(nC, FC, 2).max(axis=1)
    chunk_bbox = jnp.concatenate([cmn, cmx], axis=-1)       # (nC, 4)

    # tile pixel-coordinate ranges (x increases with wi, y decreases w/ hi)
    jj = jnp.arange(nJ, dtype=dtype)
    ii = jnp.arange(nI, dtype=dtype)
    t_xlo = axp * (jj * TW) + bxp
    t_xhi = axp * (jj * TW + TW - 1) + bxp
    t_yhi = ayp * (ii * PS) + byp
    t_ylo = ayp * (ii * PS + PS - 1) + byp
    ov_x = ((cmn[None, :, 0] <= t_xhi[:, None])
            & (cmx[None, :, 0] >= t_xlo[:, None]))          # (nJ, nC)
    ov_y = ((cmn[None, :, 1] <= t_yhi[:, None])
            & (cmx[None, :, 1] >= t_ylo[:, None]))          # (nI, nC)
    ov = ov_y[:, None, :] & ov_x[None, :, :]                # (nI, nJ, nC)
    ov = ov.reshape(T, nC)

    def ranges(mask, n):
        """[lo, hi) covering the True entries of each row of mask (M, n)."""
        idx = jnp.arange(n, dtype=jnp.int32)
        lo = jnp.min(jnp.where(mask, idx, n), axis=-1)
        hi = jnp.max(jnp.where(mask, idx + 1, 0), axis=-1)
        return jnp.stack([jnp.minimum(lo, hi), hi], axis=-1)

    tile_ranges = ranges(ov, nC)                            # (T, 2)
    chunk_tranges = ranges(ov.T, T)                         # (nC, 2)
    return vt, tile_ranges, chunk_tranges, chunk_bbox, perm, inv_perm


# ---------------------------------------------------------------------------
# forward kernel: z-buffer winner + soft-mask product per pixel tile

def _fwd_kernel(ranges_ref, cbb_ref, vt_ref, fid_ref, prod_ref, *,
                nJ, TW, eps, inv_sigma, sentinel, axp, bxp, ayp, byp,
                with_softmask):
    b = pl.program_id(0)
    t = pl.program_id(1)
    P = PS * TW
    i = t // nJ
    j = t % nJ
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    wi = (j * TW + lane % TW).astype(jnp.float32)
    hi = (i * PS + lane // TW).astype(jnp.float32)
    x0 = axp * wi + bxp                     # (1, P)
    y0 = ayp * hi + byp
    # tile pixel-coord bounds (scalar; ayp < 0 so row 0 has max y)
    t_xlo = axp * (j * TW) + bxp
    t_xhi = axp * (j * TW + TW - 1) + bxp
    t_yhi = ayp * (i * PS) + byp
    t_ylo = ayp * (i * PS + PS - 1) + byp
    neg_inf = jnp.float32(-jnp.inf)
    frow = jax.lax.broadcasted_iota(jnp.int32, (FC, P), 0)

    def process(ci, carry):
        bz, bf, pr = carry
        vt = vt_ref[0, ci]                  # (FC, NCOL)

        def col(c):
            return vt[:, c:c + 1]           # (FC, 1)

        def affine(c):
            return col(c) + col(c + 1) * x0 + col(c + 2) * y0   # (FC, P)

        w0 = affine(_W0)
        w1 = affine(_W1)
        w2 = affine(_W2)
        nrm = affine(_NRM)
        zu = affine(_ZU)
        s = nrm + jnp.where(nrm >= 0., eps, -eps)
        cov = ((w0 * s >= 0.) & (w1 * s >= 0.) & (w2 * s >= 0.)
               & (col(_VALID) > 0.))
        z = jnp.where(cov, zu / s, neg_inf)
        zc = jnp.max(z, axis=0, keepdims=True)              # (1, P)
        fid = jnp.min(jnp.where(z == zc, frow, jnp.int32(2 ** 30)),
                      axis=0, keepdims=True) + ci * FC
        upd = zc > bz
        bz = jnp.where(upd, zc, bz)
        bf = jnp.where(upd, fid, bf)

        if with_softmask:
            inb = ((x0 >= col(_BB)) & (x0 < col(_BB + 2))
                   & (y0 >= col(_BB + 1)) & (y0 < col(_BB + 3)))
            d = None
            for e in range(3):
                A = col(_ED + 4 * e)
                Bc = col(_ED + 4 * e + 1)
                Cc = col(_ED + 4 * e + 2)
                idn = col(_ED + 4 * e + 3)
                up = A * x0 + Bc * y0 + Cc
                t_ = up * idn
                x3 = x0 - A * t_
                y3 = y0 - Bc * t_
                x1 = col(_VX + 2 * e)
                y1 = col(_VX + 2 * e + 1)
                x2 = col(_VX + 2 * ((e + 1) % 3))
                y2 = col(_VX + 2 * ((e + 1) % 3) + 1)
                direct = (x3 - x1) * (x3 - x2) + (y3 - y1) * (y3 - y2)
                de = jnp.where(direct > 0., sentinel, up * up * idn)
                d = de if d is None else jnp.minimum(d, de)
            for v in range(3):
                x1 = col(_VX + 2 * v)
                y1 = col(_VX + 2 * v + 1)
                d = jnp.minimum(d, (x0 - x1) ** 2 + (y0 - y1) ** 2)
            p = jnp.where(inb, jnp.exp(-inv_sigma * d), 0.)
            # Mosaic has no reduce_prod: exact binary-tree product
            q = 1. - p                                      # (FC, P)
            n = FC
            while n > 1:
                n //= 2
                q = q[:n] * q[n:2 * n]
            pr = pr * q
        return bz, bf, pr

    def body(ci, carry):
        # exact chunk-bbox vs tile-bounds skip test (scalar, from SMEM)
        hit = ((cbb_ref[b, ci, 0] <= t_xhi) & (cbb_ref[b, ci, 2] >= t_xlo)
               & (cbb_ref[b, ci, 1] <= t_yhi) & (cbb_ref[b, ci, 3] >= t_ylo))
        return jax.lax.cond(hit, process, lambda _, c: c, ci, carry)

    init = (jnp.full((1, P), neg_inf, jnp.float32),
            jnp.full((1, P), -1, jnp.int32),
            jnp.ones((1, P), jnp.float32))
    _, bf, pr = jax.lax.fori_loop(ranges_ref[b, t, 0], ranges_ref[b, t, 1],
                                  body, init)
    fid_ref[0, 0] = bf
    prod_ref[0, 0] = pr


@functools.partial(jax.jit, static_argnames=(
    'height', 'width', 'multiplier', 'eps', 'sigmainv', 'with_softmask',
    'interpret'))
def _fused_forward(vt, tile_ranges, chunk_bbox, height, width, multiplier,
                   eps, sigmainv, with_softmask, interpret):
    """Batched fused forward.  vt (B, nC, FC, NCOL) etc (sorted space).

    Returns (face_idx_sorted (B, H, W) int32, prod (B, H, W) f32).
    """
    B, nC = vt.shape[:2]
    hp, wp = _padded_dims(height, width)
    nI, nJ, TW = _tile_dims(hp, wp)
    T = nI * nJ
    axp, bxp, ayp, byp = _pixel_affine(height, width, multiplier)

    kernel = pl.pallas_call(
        functools.partial(
            _fwd_kernel, nJ=nJ, TW=TW, eps=float(eps),
            inv_sigma=float(sigmainv) / float(multiplier) ** 2,
            sentinel=4. * float(multiplier) ** 2,
            axp=axp, bxp=bxp, ayp=ayp, byp=byp,
            with_softmask=with_softmask),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # (B, T, 2) ranges
            pl.BlockSpec(memory_space=pltpu.SMEM),      # (B, nC, 4) bboxes
            pl.BlockSpec((1, nC, FC, _NCOL), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, PS * TW), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, PS * TW), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, 1, PS * TW), jnp.int32),
            jax.ShapeDtypeStruct((B, T, 1, PS * TW), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * T * PS * TW * nC * FC // 4,
            bytes_accessed=B * (nC * FC * _NCOL * 4
                                + height * width * 8),
            transcendentals=B * T * PS * TW * FC,
        ),
        interpret=interpret,
    )
    fid_t, prod_t = kernel(tile_ranges, chunk_bbox, vt.astype(jnp.float32))

    def untile(img):
        img = img.reshape(B, nI, nJ, PS, TW).transpose(0, 1, 3, 2, 4)
        return img.reshape(B, hp, wp)[:, :height, :width]
    return untile(fid_t), untile(prod_t)


# ---------------------------------------------------------------------------
# backward kernel: soft-mask gradient w.r.t. image-space vertices

def _bwd_kernel(tranges_ref, cbb_ref, vt_ref, gprod_ref, out_ref, *,
                nJ, TW, inv_sigma, sentinel, axp, bxp, ayp, byp):
    b = pl.program_id(0)
    c = pl.program_id(1)
    P = PS * TW
    vt = vt_ref[0, 0]                       # (FC, NCOL)

    def col(cc):
        return vt[:, cc:cc + 1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    c_xlo = cbb_ref[b, c, 0]
    c_ylo = cbb_ref[b, c, 1]
    c_xhi = cbb_ref[b, c, 2]
    c_yhi = cbb_ref[b, c, 3]

    def process(t, acc):
        i = t // nJ
        j = t % nJ
        wi = (j * TW + lane % TW).astype(jnp.float32)
        hi = (i * PS + lane // TW).astype(jnp.float32)
        x0 = axp * wi + bxp
        y0 = ayp * hi + byp
        gt = gprod_ref[0, t]                # (1, P) = g * allprod (empty)

        inb = ((x0 >= col(_BB)) & (x0 < col(_BB + 2))
               & (y0 >= col(_BB + 1)) & (y0 < col(_BB + 3)))
        # recompute the 6 distance candidates (forward residual-free)
        ed = []
        d = None
        for e in range(3):
            A = col(_ED + 4 * e)
            Bc = col(_ED + 4 * e + 1)
            Cc = col(_ED + 4 * e + 2)
            idn = col(_ED + 4 * e + 3)
            up = A * x0 + Bc * y0 + Cc
            t_ = up * idn
            x3 = x0 - A * t_
            y3 = y0 - Bc * t_
            x1 = col(_VX + 2 * e)
            y1 = col(_VX + 2 * e + 1)
            x2 = col(_VX + 2 * ((e + 1) % 3))
            y2 = col(_VX + 2 * ((e + 1) % 3) + 1)
            direct = (x3 - x1) * (x3 - x2) + (y3 - y1) * (y3 - y2)
            perp = up * up * idn
            de = jnp.where(direct > 0., sentinel, perp)
            ed.append((A, Bc, up, idn, perp, direct, de))
            d = de if d is None else jnp.minimum(d, de)
        vd = []
        for v in range(3):
            x1 = col(_VX + 2 * v)
            y1 = col(_VX + 2 * v + 1)
            dv = (x0 - x1) ** 2 + (y0 - y1) ** 2
            vd.append(dv)
            d = jnp.minimum(d, dv)
        p = jnp.where(inb, jnp.exp(-inv_sigma * d), 0.)
        # CUDA product-division backward (dibr_soft_mask_cuda.cu:283-284)
        dd = (-inv_sigma) * p * gt / (1. - p + _EPS)        # (FC, P)

        remaining = jnp.ones_like(inb)
        new_comp = [None] * 6
        for e in range(3):
            A, Bc, up, idn, perp, direct, de = ed[e]
            sel = remaining & (de == d)
            remaining = remaining & jnp.logical_not(sel)
            w = jnp.where(sel & (direct <= 0.), dd, 0.)
            dA = 2. * (up * x0 - perp * A) * idn
            dB = 2. * (up * y0 - perp * Bc) * idn
            dC = 2. * up * idn
            x1 = col(_VX + 2 * e)
            y1 = col(_VX + 2 * e + 1)
            x2 = col(_VX + 2 * ((e + 1) % 3))
            y2 = col(_VX + 2 * ((e + 1) % 3) + 1)
            jj = (e + 1) % 3
            upd = [(2 * e, w * (dB - dC * y2)),
                   (2 * e + 1, w * (dC * x2 - dA)),
                   (2 * jj, w * (dC * y1 - dB)),
                   (2 * jj + 1, w * (dA - dC * x1))]
            for idx, val in upd:
                cur = new_comp[idx]
                new_comp[idx] = val if cur is None else cur + val
        for v in range(3):
            sel = remaining & (vd[v] == d)
            remaining = remaining & jnp.logical_not(sel)
            w = jnp.where(sel, dd, 0.)
            x1 = col(_VX + 2 * v)
            y1 = col(_VX + 2 * v + 1)
            cur = new_comp[2 * v]
            val = w * 2. * (x1 - x0)
            new_comp[2 * v] = val if cur is None else cur + val
            cur = new_comp[2 * v + 1]
            val = w * 2. * (y1 - y0)
            new_comp[2 * v + 1] = val if cur is None else cur + val
        return tuple(
            acc[cc] + jnp.sum(new_comp[cc], axis=1, keepdims=True)
            for cc in range(6))

    def body(t, acc):
        i = t // nJ
        j = t % nJ
        t_xlo = axp * (j * TW) + bxp
        t_xhi = axp * (j * TW + TW - 1) + bxp
        t_yhi = ayp * (i * PS) + byp
        t_ylo = ayp * (i * PS + PS - 1) + byp
        hit = ((c_xlo <= t_xhi) & (c_xhi >= t_xlo)
               & (c_ylo <= t_yhi) & (c_yhi >= t_ylo))
        return jax.lax.cond(hit, process, lambda _, a: a, t, acc)

    init = tuple(jnp.zeros((FC, 1), jnp.float32) for _ in range(6))
    acc = jax.lax.fori_loop(tranges_ref[b, c, 0], tranges_ref[b, c, 1],
                            body, init)
    out_ref[0, 0, :, 0:6] = jnp.concatenate(acc, axis=1)
    out_ref[0, 0, :, 6:8] = jnp.zeros((FC, 2), jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    'height', 'width', 'multiplier', 'sigmainv', 'interpret'))
def _fused_backward(vt, chunk_tranges, chunk_bbox, g_prod_tiled, height,
                    width, multiplier, sigmainv, interpret):
    """Batched soft-mask backward.  Returns (B, nC*FC, 6) sorted grads."""
    B, nC = vt.shape[:2]
    hp, wp = _padded_dims(height, width)
    nI, nJ, TW = _tile_dims(hp, wp)
    T = nI * nJ
    axp, bxp, ayp, byp = _pixel_affine(height, width, multiplier)

    kernel = pl.pallas_call(
        functools.partial(
            _bwd_kernel, nJ=nJ, TW=TW,
            inv_sigma=float(sigmainv) / float(multiplier) ** 2,
            sentinel=4. * float(multiplier) ** 2,
            axp=axp, bxp=bxp, ayp=ayp, byp=byp),
        grid=(B, nC),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # (B, nC, 2) tranges
            pl.BlockSpec(memory_space=pltpu.SMEM),   # (B, nC, 4) bboxes
            pl.BlockSpec((1, 1, FC, _NCOL), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1, PS * TW), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, FC, 8), lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nC, FC, 8), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * nC * FC * T * PS * TW // 4,
            bytes_accessed=B * (nC * FC * _NCOL * 4 + T * PS * TW * 4),
            transcendentals=B * nC * FC * PS * TW,
        ),
        interpret=interpret,
    )
    tiles = kernel(chunk_tranges, chunk_bbox, vt.astype(jnp.float32),
                   g_prod_tiled.astype(jnp.float32))
    return tiles[..., :6].reshape(B, nC * FC, 6)


def _tile_image(img, height, width):
    """(B, H, W) -> (B, T, 1, PS*TW) in the kernels' tile layout."""
    B = img.shape[0]
    hp, wp = _padded_dims(height, width)
    nI, nJ, TW = _tile_dims(hp, wp)
    img = jnp.pad(img, ((0, 0), (0, hp - height), (0, wp - width)))
    img = img.reshape(B, nI, PS, nJ, TW).transpose(0, 1, 3, 2, 4)
    return img.reshape(B, nI * nJ, 1, PS * TW)


def _use_interpret():
    return jax.default_backend() != 'tpu'


# ---------------------------------------------------------------------------
# public API

def fused_selection(face_vertices_z, face_vertices_image, valid_faces=None,
                    height=256, width=256, multiplier=1000., boxlen=0.02,
                    sigmainv=7000., eps=1e-8, with_softmask=True,
                    interpret=None):
    """Fused z-buffer + soft-mask selection pass (non-differentiable).

    Args:
        face_vertices_z: (B, F, 3) camera-space z.
        face_vertices_image: (B, F, 3, 2) image coords in [-1, 1].
        valid_faces: (B, F) bool (z-buffer only; the soft mask uses all
            faces, as the reference does).

    Returns:
        :class:`FusedSelection` — feed to :func:`softmask_fused` for the
        differentiable mask and to ``rasterize(precomputed_face_idx=...)``
        for feature interpolation.
    """
    B, F = face_vertices_z.shape[:2]
    if valid_faces is None:
        valid_faces = jnp.ones((B, F), dtype=bool)
    if interpret is None:
        interpret = _use_interpret()
    margin = float(boxlen) * float(multiplier)
    fvz = jax.lax.stop_gradient(face_vertices_z)
    fvi_scaled = jax.lax.stop_gradient(face_vertices_image) * multiplier

    prep = jax.vmap(lambda z, i, v: build_face_tiles(
        z, i, v, height, width, float(multiplier), margin))
    (vt, tile_ranges, chunk_tranges, chunk_bbox, perm,
     inv_perm) = prep(fvz, fvi_scaled, valid_faces)

    fid_s, prod = _fused_forward(
        vt, tile_ranges, chunk_bbox.astype(jnp.float32), height, width,
        float(multiplier), float(eps), float(sigmainv), with_softmask,
        interpret)
    # sorted -> original face ids (flat gather: batched gathers are slow
    # on TPU, see ops/gather.py)
    from kaolin_tpu.ops.gather import flat_index
    Fp = perm.shape[1]
    safe = flat_index(jnp.clip(fid_s, 0, Fp - 1), Fp)
    mapped = perm.reshape(-1)[safe].reshape(fid_s.shape)
    face_idx = jnp.where(fid_s >= 0, mapped, -1)
    return FusedSelection(face_idx, prod, vt, chunk_tranges,
                          chunk_bbox.astype(jnp.float32), inv_perm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def softmask_fused(fvi_scaled, sel: FusedSelection, config):
    """Differentiable soft mask from a :class:`FusedSelection`.

    ``config`` = (height, width, multiplier, sigmainv) hashable.
    ``fvi_scaled`` must be the same geometry the selection was built from
    (the forward value reuses the selection's product; the backward
    differentiates it w.r.t. ``fvi_scaled``).
    """
    del fvi_scaled, config
    return jnp.where(sel.face_idx < 0, 1. - sel.prod, 1.)


def _softmask_fused_fwd(fvi_scaled, sel, config):
    return softmask_fused(fvi_scaled, sel, config), sel


def _softmask_fused_bwd(config, sel, g):
    height, width, multiplier, sigmainv = config
    B = sel.face_idx.shape[0]
    F = sel.inv_perm.shape[1]
    empty = sel.face_idx < 0
    g_prod = jnp.where(empty, g * sel.prod, 0.)
    g_prod_t = _tile_image(g_prod, height, width)
    dsorted = _fused_backward(
        sel.vt, sel.chunk_tranges, sel.chunk_bbox, g_prod_t, height,
        width, float(multiplier), float(sigmainv),
        interpret=_use_interpret())                    # (B, Fp, 6)
    from kaolin_tpu.ops.gather import flat_index
    Fp = dsorted.shape[1]
    gidx = flat_index(sel.inv_perm.astype(jnp.int32), Fp)
    dfvi = dsorted.reshape(B * Fp, 6)[gidx]
    dfvi = dfvi.reshape(B, F, 3, 2)
    fl0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (dfvi, FusedSelection(*(fl0(x) for x in sel)))


softmask_fused.defvjp(_softmask_fused_fwd, _softmask_fused_bwd)
