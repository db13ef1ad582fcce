"""Pallas TPU kernel for the rasterization selection pass.

Replaces the CUDA forward ``packed_rasterize_forward_cuda_kernel``
(``kaolin/csrc/render/mesh/rasterization_cuda.cu:43``): a z-buffer sweep
computing the winning face per pixel.

Kernel layout:

* grid = (batch, pixel_tile_rows, pixel_tile_cols, face_chunks); the face
  chunk axis is innermost, so the output tile (face index + z-buffer)
  stays resident in VMEM and accumulates across chunks — the classic
  matmul-k-loop pattern.
* compute stays strictly 2D for Mosaic friendliness: each of the TH pixel
  rows is an unrolled step evaluating (TW pixels x FC faces) edge
  functions as one (128, 128) VPU block.
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

TH = 8     # pixel tile height (rows, unrolled in-kernel)
TW = 128   # pixel tile width (lanes)
FC = 128   # faces per chunk (lanes of the (TW, FC) compute block)


def _selection_kernel(mask_ref, fvz_ref, fvi_ref, valid_ref,
                      idx_ref, z_ref, *, eps, height, width, multiplier):
    f = pl.program_id(3)

    @pl.when(f == 0)
    def _init():
        idx_ref[...] = jnp.full_like(idx_ref, -1)
        z_ref[...] = jnp.full_like(z_ref, -jnp.inf)

    @pl.when(mask_ref[0, 0, pl.program_id(2), f] != 0)
    def _body():
        i = pl.program_id(1)
        j = pl.program_id(2)
        fvi = fvi_ref[0]  # (FC, 6)
        ax = fvi[:, 0][None, :]  # (1, FC)
        ay = fvi[:, 1][None, :]
        bx = fvi[:, 2][None, :]
        by = fvi[:, 3][None, :]
        cx = fvi[:, 4][None, :]
        cy = fvi[:, 5][None, :]
        fvz = fvz_ref[0]  # (FC, 3)
        az = fvz[:, 0][None, :]
        bz = fvz[:, 1][None, :]
        cz = fvz[:, 2][None, :]
        valid = valid_ref[0][None, :] > 0  # (1, FC)

        # pixel-center x coords for this tile column
        # (rasterization_cuda.cu:85-86)
        wi = (j * TW + jax.lax.broadcasted_iota(
            jnp.int32, (TW, 1), 0)).astype(jnp.float32)
        X = (multiplier / width) * (2. * wi + 1. - width)  # (TW, 1)

        for r in range(TH):  # unrolled pixel rows
            hi = (i * TH + r)
            Y = (multiplier / height) * (height - 2. * hi - 1.)  # scalar

            a_ex = ax - X  # (TW, FC)
            a_ey = ay - Y
            b_ex = bx - X
            b_ey = by - Y
            c_ex = cx - X
            c_ey = cy - Y
            w0 = b_ex * c_ey - b_ey * c_ex
            w1 = c_ex * a_ey - c_ey * a_ex
            w2 = a_ex * b_ey - a_ey * b_ex
            norm = w0 + w1 + w2
            norm = norm + jnp.where(norm >= 0., eps, -eps)
            w0n = w0 / norm
            w1n = w1 / norm
            w2n = w2 / norm
            z0 = w0n * az + w1n * bz + w2n * cz
            ok = (w0n >= 0.) & (w1n >= 0.) & (w2n >= 0.) & valid
            z0 = jnp.where(ok, z0, -jnp.inf)

            chunk_best = jnp.max(z0, axis=1)                     # (TW,)
            chunk_idx = jnp.argmax(z0, axis=1).astype(jnp.int32) + f * FC

            cur_z = z_ref[0, r, :]
            cur_idx = idx_ref[0, r, :]
            upd = chunk_best > cur_z
            z_ref[0, r, :] = jnp.where(upd, chunk_best, cur_z)
            idx_ref[0, r, :] = jnp.where(upd, chunk_idx, cur_idx)


@functools.partial(jax.jit, static_argnames=(
    'height', 'width', 'multiplier', 'eps'))
def selection_pallas(face_vertices_z, face_vertices_image_scaled,
                     valid_faces, height, width, multiplier, eps=1e-8):
    """Winning-face selection on TPU.

    Args:
        face_vertices_z: ``(B, F, 3)``.
        face_vertices_image_scaled: ``(B, F, 3, 2)`` (multiplier applied).
        valid_faces: ``(B, F)`` bool.
        height, width: image size; multiplier: coordinate scale.

    Returns:
        ``(B, H, W)`` int32 face index (-1 = empty).
    """
    from kaolin_tpu.render.mesh.rasterization import pixel_coords
    B, F = face_vertices_z.shape[:2]
    xs, ys = pixel_coords(height, width, multiplier,
                          dtype=face_vertices_z.dtype)
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
        functools.partial(_selection_kernel, eps=eps, height=height,
                          width=width, multiplier=float(multiplier)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, nJ, nF), lambda b, i, j, f: (b, i, 0, 0),
                         memory_space=pltpu.SMEM),
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
    face_idx, _zbuf = kernel(mask, fvz, fvi, valid)
    return face_idx
