"""Pallas TPU kernel for the rasterization selection pass.

Replaces the CUDA forward ``packed_rasterize_forward_cuda_kernel``
(``kaolin/csrc/render/mesh/rasterization_cuda.cu:43``): a z-buffer sweep
computing the winning face per pixel.

Kernel layout:

* grid = (batch, pixel_tile_rows, pixel_tile_cols, face_chunks); the face
  chunk axis is innermost, so the output tile (face index + z-buffer)
  stays resident in VMEM and accumulates across chunks — the classic
  matmul-k-loop pattern.
* each step evaluates all (TH*TW pixels x FC faces) edge functions as one
  (P, FC) vector op block on the VPU — the CUDA kernel's per-thread loop
  becomes a 2D outer product.
* a host-side (XLA) binning pass computes a per-(tile, chunk) overlap mask
  from face bboxes; the kernel skips culled chunks with ``@pl.when``
  (the shared-memory bbox tiling of the CUDA kernel, lifted to tile
  granularity).

Gradients never flow through this pass (selection is piecewise constant);
the differentiable epilogue lives in ``rasterization.py``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8     # pixel tile height (sublane)
TW = 128   # pixel tile width (lane)
FC = 256   # faces per chunk


def _selection_kernel(mask_ref, xs_ref, ys_ref, fvz_ref, fvi_ref, valid_ref,
                      idx_ref, z_ref, *, eps):
    f = pl.program_id(3)

    @pl.when(f == 0)
    def _init():
        idx_ref[...] = jnp.full_like(idx_ref, -1)
        z_ref[...] = jnp.full_like(z_ref, -jnp.inf)

    @pl.when(mask_ref[0] != 0)
    def _body():
        x0 = xs_ref[0, :]  # (TW,)
        y0 = ys_ref[0, :]  # (TH,)
        X = jnp.broadcast_to(x0[None, :], (TH, TW)).reshape(TH * TW, 1)
        Y = jnp.broadcast_to(y0[:, None], (TH, TW)).reshape(TH * TW, 1)

        ax = fvi_ref[0, :, 0][None, :]  # (1, FC)
        ay = fvi_ref[0, :, 1][None, :]
        bx = fvi_ref[0, :, 2][None, :]
        by = fvi_ref[0, :, 3][None, :]
        cx = fvi_ref[0, :, 4][None, :]
        cy = fvi_ref[0, :, 5][None, :]
        az = fvz_ref[0, :, 0][None, :]
        bz = fvz_ref[0, :, 1][None, :]
        cz = fvz_ref[0, :, 2][None, :]
        valid = valid_ref[0, :][None, :] > 0

        a_ex = ax - X  # (P, FC)
        a_ey = ay - Y
        b_ex = bx - X
        b_ey = by - Y
        c_ex = cx - X
        c_ey = cy - Y
        w0 = b_ex * c_ey - b_ey * c_ex
        w1 = c_ex * a_ey - c_ey * a_ex
        w2 = a_ex * b_ey - a_ey * b_ex
        norm = w0 + w1 + w2
        norm = norm + jnp.copysign(eps, norm)
        w0n = w0 / norm
        w1n = w1 / norm
        w2n = w2 / norm
        z0 = w0n * az + w1n * bz + w2n * cz
        ok = (w0n >= 0.) & (w1n >= 0.) & (w2n >= 0.) & valid
        z0 = jnp.where(ok, z0, -jnp.inf)

        chunk_best = jnp.max(z0, axis=1)                       # (P,)
        chunk_idx = jnp.argmax(z0, axis=1).astype(jnp.int32) + f * FC

        cur_z = z_ref[0].reshape(TH * TW)
        cur_idx = idx_ref[0].reshape(TH * TW)
        upd = chunk_best > cur_z
        z_ref[0] = jnp.where(upd, chunk_best, cur_z).reshape(TH, TW)
        idx_ref[0] = jnp.where(upd, chunk_idx, cur_idx).reshape(TH, TW)


@functools.partial(jax.jit, static_argnames=('height', 'width', 'eps'))
def selection_pallas(face_vertices_z, face_vertices_image_scaled,
                     valid_faces, xs, ys, height, width, eps=1e-8):
    """Winning-face selection on TPU.

    Args:
        face_vertices_z: ``(B, F, 3)``.
        face_vertices_image_scaled: ``(B, F, 3, 2)`` (multiplier applied).
        valid_faces: ``(B, F)`` bool.
        xs: ``(W,)`` pixel-center x coords; ys: ``(H,)``.

    Returns:
        ``(B, H, W)`` int32 face index (-1 = empty).
    """
    B, F = face_vertices_z.shape[:2]
    assert height % TH == 0 and width % TW == 0, \
        f"height/width must be multiples of ({TH}, {TW})"
    fpad = (-F) % FC
    Fp = F + fpad
    dtype = face_vertices_z.dtype
    fvz = jnp.pad(face_vertices_z, ((0, 0), (0, fpad), (0, 0)))
    fvi = jnp.pad(face_vertices_image_scaled,
                  ((0, 0), (0, fpad), (0, 0), (0, 0))).reshape(B, Fp, 6)
    valid = jnp.pad(valid_faces, ((0, 0), (0, fpad))).astype(jnp.int32)

    nI = height // TH
    nJ = width // TW
    nF = Fp // FC

    # ---- tile/chunk binning (XLA): any face in chunk overlaps tile? -----
    face_xmin = jnp.min(fvi[..., 0::2], axis=-1)  # (B, Fp)
    face_xmax = jnp.max(fvi[..., 0::2], axis=-1)
    face_ymin = jnp.min(fvi[..., 1::2], axis=-1)
    face_ymax = jnp.max(fvi[..., 1::2], axis=-1)
    # tile pixel-coordinate bounds; ys is descending in row index
    tile_xmin = xs.reshape(nJ, TW).min(axis=1)  # (nJ,)
    tile_xmax = xs.reshape(nJ, TW).max(axis=1)
    tile_ymin = ys.reshape(nI, TH).min(axis=1)  # (nI,)
    tile_ymax = ys.reshape(nI, TH).max(axis=1)
    ov_x = ((face_xmin[:, None, :] <= tile_xmax[None, :, None])
            & (face_xmax[:, None, :] >= tile_xmin[None, :, None]))
    ov_y = ((face_ymin[:, None, :] <= tile_ymax[None, :, None])
            & (face_ymax[:, None, :] >= tile_ymin[None, :, None]))
    ov_x = ov_x & (valid[:, None, :] > 0)
    # (B, nI, nJ, nF): chunk-wise any(face overlaps tile)
    ovx = ov_x.reshape(B, nJ, nF, FC)
    ovy = ov_y.reshape(B, nI, nF, FC)
    mask = jnp.einsum('bjfc,bifc->bijf', ovx.astype(jnp.int32),
                      ovy.astype(jnp.int32))
    mask = (mask > 0).astype(jnp.int32)

    grid = (B, nI, nJ, nF)
    kernel = pl.pallas_call(
        functools.partial(_selection_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1), lambda b, i, j, f: (b, i, j, f),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TW), lambda b, i, j, f: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH), lambda b, i, j, f: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FC, 3), lambda b, i, j, f: (b, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FC, 6), lambda b, i, j, f: (b, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, FC), lambda b, i, j, f: (b, f),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TH, TW), lambda b, i, j, f: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, TW), lambda b, i, j, f: (b, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, height, width), jnp.int32),
            jax.ShapeDtypeStruct((B, height, width), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * height * width * Fp * 20,
            bytes_accessed=B * (Fp * 9 * 4 + height * width * 8),
            transcendentals=0,
        ),
    )
    face_idx, _zbuf = kernel(mask, xs[None, :], ys[None, :], fvz, fvi, valid)
    return face_idx
