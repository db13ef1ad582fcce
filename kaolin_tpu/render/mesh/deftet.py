"""DefTet sparse volumetric renderer: a depth-sorted k-buffer rasterizer.

Parity: ``kaolin/render/mesh/deftet.py`` + CUDA kernel
``kaolin/csrc/render/mesh/deftet_cuda.cu`` (reference).

Same TPU-native split as :mod:`rasterization`: a non-differentiable
selection pass builds the per-pixel k-buffer of covering faces (the CUDA
warp-ballot lane allocation ``deftet_cuda.cu:50-60`` becomes a cumsum
scatter over face chunks, keeping the same first-knum-by-mesh-order
semantics), faces are sorted by depth in jnp (mirroring the reference's
host argsort, ``deftet.py:301-305``), and a differentiable epilogue
recomputes barycentric weights and interpolates features.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['deftet_sparse_render', '_naive_deftet_sparse_render']


@functools.partial(jax.jit, static_argnames=('knum', 'eps', 'pixel_chunk',
                                             'max_candidates'))
def _deftet_render_binned(pixel_coords, render_ranges, face_vertices_z,
                          face_vertices_image, face_features, valid_faces,
                          knum, eps, max_candidates, pixel_chunk=1024):
    """Spatially binned k-buffer render (single mesh) — selection AND
    interpolation in one pass, mirroring the CUDA kernel's shared-memory
    bbox tiles (``deftet_cuda.cu:62-100``) the TPU way:

    * faces are sorted by quantized bbox center and grouped into chunks
      of 64; per pixel chunk only face chunks whose bbox overlaps the
      pixel chunk's bbox are tested (gathered at chunk granularity — the
      only irregular access in the whole render);
    * the first ``knum`` covering faces per pixel IN MESH ORDER (the
      CUDA lane-allocation semantics) are extracted with argmin/one-hot
      passes whose masked sums carry the differentiable payload
      (barycentrics, depth, interpolated features) — no per-pixel
      gathers, no scatters, fwd or bwd;
    * slots are depth-sorted with a stable payload sort.

    ``max_candidates`` (static) caps candidate faces per pixel chunk;
    overflow drops whole face chunks (highest sort keys first) — size it
    to the scene (for a P-pixel image a face chunk overlaps a pixel
    chunk's bbox only if spatially close, so ``F / 4`` is generous for
    meshes with any locality).  Returns (feats (P, knum, D),
    face_idx (P, knum) depth-sorted, -1 pad).
    """
    F = face_vertices_z.shape[0]
    P = pixel_coords.shape[0]
    D = face_features.shape[-1]
    CKf = max(1, -(-int(max_candidates) // 64))
    fpad = (-F) % 64
    Fp = F + fpad
    nFc = Fp // 64
    CKf = min(CKf, nFc)
    C = CKf * 64
    BIG = jnp.int32(2 ** 30)

    fvi = jax.lax.stop_gradient(face_vertices_image)
    fmin = jnp.min(fvi, axis=1)                       # (F, 2)
    fmax = jnp.max(fvi, axis=1)

    # ---- spatial sort by quantized bbox center (row-major) -----------
    ctr = (fmin + fmax) * 0.5
    clo = jnp.min(ctr, axis=0)
    chi = jnp.max(ctr, axis=0)
    q = jnp.clip(((ctr - clo) / jnp.maximum(chi - clo, 1e-12)
                  * 1023.).astype(jnp.int32), 0, 1023)
    perm = jnp.argsort(q[:, 1] * 1024 + q[:, 0], stable=True)

    def pad64(a, fill=0.):
        return jnp.pad(a, ((0, fpad),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    fvi_s = pad64(face_vertices_image[perm])          # (Fp, 3, 2) diff
    fvz_s = pad64(face_vertices_z[perm])
    ff_s = pad64(face_features[perm])                 # (Fp, 3, D)
    fid_s = jnp.pad(perm.astype(jnp.int32), (0, fpad),
                    constant_values=BIG)
    valid_s = pad64(valid_faces[perm].astype(jnp.float32))
    bmin_s = pad64(fmin[perm], fill=jnp.inf)
    bmax_s = pad64(fmax[perm], fill=-jnp.inf)

    cb_lo = bmin_s.reshape(nFc, 64, 2).min(axis=1)    # (nFc, 2)
    cb_hi = bmax_s.reshape(nFc, 64, 2).max(axis=1)

    # chunked differentiable tables
    vt_g = jnp.concatenate([fvi_s.reshape(Fp, 6), fvz_s,
                            ff_s.reshape(Fp, 3 * D)], axis=-1)
    vt_g = vt_g.reshape(nFc, 64, 9 + 3 * D)
    vt_m = jnp.stack([bmin_s[:, 0], bmin_s[:, 1], bmax_s[:, 0],
                      bmax_s[:, 1], valid_s], -1).reshape(nFc, 64, 5)
    fid_c = fid_s.reshape(nFc, 64)

    # ---- pixel chunks + candidate face chunks ------------------------
    ppad = (-P) % pixel_chunk
    # pad pixels with a benign finite coord; their (0, 0) render range
    # is empty so they never select anything, and the tail is sliced off
    pc_all = jnp.pad(jax.lax.stop_gradient(pixel_coords),
                     ((0, ppad), (0, 0)))
    rr_all = jnp.pad(jax.lax.stop_gradient(render_ranges),
                     ((0, ppad), (0, 0)))
    nPc = (P + ppad) // pixel_chunk
    pcs = pc_all.reshape(nPc, pixel_chunk, 2)
    rrs = rr_all.reshape(nPc, pixel_chunk, 2)
    plo = jnp.min(pcs, axis=1)                                # (nPc, 2)
    phi = jnp.max(pcs, axis=1)
    ov = ((cb_lo[None, :, 0] <= phi[:, None, 0])
          & (cb_hi[None, :, 0] >= plo[:, None, 0])
          & (cb_lo[None, :, 1] <= phi[:, None, 1])
          & (cb_hi[None, :, 1] >= plo[:, None, 1]))           # (nPc, nFc)
    cidx = jax.lax.broadcasted_iota(jnp.int32, ov.shape, 1)
    top, _ = jax.lax.top_k(jnp.where(ov, nFc - cidx, 0), CKf)
    cand_ids = jnp.where(top > 0, nFc - top, nFc)             # (nPc, CKf)

    # dump chunk (all invalid)
    vt_g_f = jnp.concatenate([vt_g, jnp.zeros((1, 64, 9 + 3 * D))])
    vt_m_f = jnp.concatenate([vt_m, jnp.zeros((1, 64, 5))])
    fid_f = jnp.concatenate([fid_c, jnp.full((1, 64), BIG)])

    def select_slots(g_sg, m, fid, pcc, rrc):
        """Non-differentiable: per pixel, the first-knum covering faces
        IN MESH ORDER, as LOCAL candidate indices (pc, knum), -1 pad.
        No gradients flow -> the loop stores no reverse-mode residuals
        (a differentiable k-loop would checkpoint a (pc, C) carry per
        pass — 11GB at bench scale)."""
        x0 = pcc[:, 0:1]                                      # (pc, 1)
        y0 = pcc[:, 1:2]
        in_bbox = ((x0 >= m[None, :, 0]) & (x0 < m[None, :, 2])
                   & (y0 >= m[None, :, 1]) & (y0 < m[None, :, 3])
                   & (m[None, :, 4] > 0.))
        a_ex, a_ey = g_sg[None, :, 0] - x0, g_sg[None, :, 1] - y0
        b_ex, b_ey = g_sg[None, :, 2] - x0, g_sg[None, :, 3] - y0
        c_ex, c_ey = g_sg[None, :, 4] - x0, g_sg[None, :, 5] - y0
        w0 = b_ex * c_ey - b_ey * c_ex
        w1 = c_ex * a_ey - c_ey * a_ex
        w2 = a_ex * b_ey - a_ey * b_ex
        norm = w0 + w1 + w2
        norm = norm + jnp.where(norm >= 0., eps, -eps)
        w0, w1, w2 = w0 / norm, w1 / norm, w2 / norm
        inside = (w0 >= 0.) & (w1 >= 0.) & (w2 >= 0.)
        depth = (w0 * g_sg[None, :, 6] + w1 * g_sg[None, :, 7]
                 + w2 * g_sg[None, :, 8])
        covered = (in_bbox & inside & (depth > rrc[:, 0:1])
                   & (depth < rrc[:, 1:2]))                   # (pc, C)
        keys = jnp.where(covered, fid[None, :], BIG)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
        pc = pcc.shape[0]

        def extract(k, state):
            keys, out_s = state
            am = jnp.argmin(keys, axis=-1)
            live = jnp.min(keys, axis=-1) < BIG
            out_s = out_s.at[:, k].set(
                jnp.where(live, am.astype(jnp.int32), -1))
            keys = jnp.where((iota_c == am[:, None]) & live[:, None],
                             BIG, keys)
            return keys, out_s

        _, slots = jax.lax.fori_loop(
            0, knum, extract,
            (keys, jnp.full((pc, knum), -1, jnp.int32)))
        return slots

    def epilogue(g, fid, pcc, slots):
        """Differentiable: gather the selected candidates' rows with a
        one-hot MATMUL (MXU; its backward is a matmul — no (pc, knum, C)
        residual thanks to the remat wrapper), recompute barycentrics,
        depth-sort with payload."""
        pc = pcc.shape[0]
        live = slots >= 0
        oh = (slots[..., None]
              == jax.lax.broadcasted_iota(
                  jnp.int32, (pc, knum, C), 2)) & live[..., None]
        table = jnp.concatenate(
            [g, fid[:, None].astype(jnp.float32)], axis=-1)   # (C, 10+3D)
        rows = jax.lax.dot_general(
            oh.astype(jnp.float32).reshape(pc * knum, C), table,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        rows = rows.reshape(pc, knum, 10 + 3 * D)
        x0 = pcc[:, None, 0]
        y0 = pcc[:, None, 1]
        a_ex, a_ey = rows[..., 0] - x0, rows[..., 1] - y0     # (pc, knum)
        b_ex, b_ey = rows[..., 2] - x0, rows[..., 3] - y0
        c_ex, c_ey = rows[..., 4] - x0, rows[..., 5] - y0
        w0 = b_ex * c_ey - b_ey * c_ex
        w1 = c_ex * a_ey - c_ey * a_ex
        w2 = a_ex * b_ey - a_ey * b_ex
        norm = w0 + w1 + w2
        # sign(0) -> +1: dead slots have all-zero rows; 0/0 would poison
        # the gradients flowing back through the one-hot matmul
        norm = norm + jnp.where(norm >= 0., eps, -eps)
        w0, w1, w2 = w0 / norm, w1 / norm, w2 / norm
        depth = (w0 * rows[..., 6] + w1 * rows[..., 7]
                 + w2 * rows[..., 8])
        feats = (w0[..., None] * rows[..., 9:9 + D]
                 + w1[..., None] * rows[..., 9 + D:9 + 2 * D]
                 + w2[..., None] * rows[..., 9 + 2 * D:9 + 3 * D])
        feats = jnp.where(live[..., None], feats, 0.)
        fid_k = jnp.where(
            live, jax.lax.stop_gradient(rows[..., 9 + 3 * D])
            .astype(jnp.int32), -1)
        out_d = jnp.where(live, depth, -jnp.inf)

        # stable depth sort, near-to-far (descending; invalid -inf last)
        neg_d = jax.lax.stop_gradient(-out_d)
        key2 = jax.lax.broadcasted_iota(jnp.int32, fid_k.shape, 1)
        ops = jax.lax.sort(
            (neg_d, key2, fid_k) + tuple(
                feats[..., j] for j in range(D)),
            dimension=1, num_keys=2, is_stable=False)
        out_i = ops[2]
        out_f = jnp.stack(ops[3:], axis=-1)
        return out_f, out_i

    def chunk_step(args):
        ids, pcc, rrc = args            # (CKf,), (pc, 2), (pc, 2)
        g = vt_g_f[ids].reshape(C, 9 + 3 * D)                 # diff
        m = vt_m_f[ids].reshape(C, 5)
        fid = fid_f[ids].reshape(C)
        slots = jax.lax.stop_gradient(select_slots(
            jax.lax.stop_gradient(g), m, fid, pcc, rrc))
        return jax.checkpoint(epilogue)(g, fid, pcc, slots)

    feats, fidx = jax.lax.map(
        chunk_step, (cand_ids, pcs, rrs))
    feats = feats.reshape(-1, knum, D)[:P]
    fidx = fidx.reshape(-1, knum)[:P]
    return feats, fidx


@functools.partial(jax.jit, static_argnames=('knum', 'eps', 'pixel_chunk'))
def _deftet_select(pixel_coords, render_ranges, face_vertices_z,
                   face_vertices_image, valid_faces, knum, eps,
                   pixel_chunk=4096):
    """First-knum covering faces per pixel (single mesh), mesh order.

    One wide ``top_k`` over the full face axis per pixel chunk — the
    single-sort pattern the DIB-R selection uses (a running per-chunk
    top_k merge costs one sort pass per face chunk).

    Returns:
        (P, knum) int32 face ids (-1 pad).
    """
    F = face_vertices_z.shape[0]
    P = pixel_coords.shape[0]
    ppad = (-P) % pixel_chunk
    pc = jnp.pad(pixel_coords, ((0, ppad), (0, 0)))
    rr = jnp.pad(render_ranges, ((0, ppad), (0, 0)))
    num_pchunks = (P + ppad) // pixel_chunk

    face_min = jnp.min(face_vertices_image, axis=1)  # (F, 2)
    face_max = jnp.max(face_vertices_image, axis=1)
    ax, ay = face_vertices_image[:, 0, 0], face_vertices_image[:, 0, 1]
    bx, by = face_vertices_image[:, 1, 0], face_vertices_image[:, 1, 1]
    cx, cy = face_vertices_image[:, 2, 0], face_vertices_image[:, 2, 1]
    F_cap = F + 1

    def pixel_step(chunk):
        pcc, rrc = chunk
        x0 = pcc[:, 0:1]  # (pc, 1)
        y0 = pcc[:, 1:2]
        zmin = rrc[:, 0:1]
        zmax = rrc[:, 1:2]
        in_bbox = ((x0 >= face_min[None, :, 0]) & (x0 < face_max[None, :, 0])
                   & (y0 >= face_min[None, :, 1])
                   & (y0 < face_max[None, :, 1])
                   & valid_faces[None, :])  # (pc, F)
        a_ex, a_ey = ax[None] - x0, ay[None] - y0
        b_ex, b_ey = bx[None] - x0, by[None] - y0
        c_ex, c_ey = cx[None] - x0, cy[None] - y0
        w0 = b_ex * c_ey - b_ey * c_ex
        w1 = c_ex * a_ey - c_ey * a_ex
        w2 = a_ex * b_ey - a_ey * b_ex
        norm = w0 + w1 + w2
        norm = norm + eps * jnp.sign(norm)
        w0, w1, w2 = w0 / norm, w1 / norm, w2 / norm
        inside = (w0 >= 0.) & (w1 >= 0.) & (w2 >= 0.)
        depth = (w0 * face_vertices_z[None, :, 0]
                 + w1 * face_vertices_z[None, :, 1]
                 + w2 * face_vertices_z[None, :, 2])
        in_range = (depth > zmin) & (depth < zmax)
        covered = in_bbox & inside & in_range  # (pc, F)
        fids = jnp.arange(F, dtype=jnp.int32)[None, :]
        keys = jnp.where(covered, F_cap - fids, 0)
        best, _ = jax.lax.top_k(keys, min(knum, F))
        if knum > F:
            best = jnp.pad(best, ((0, 0), (0, knum - F)))
        return best

    best = jax.lax.map(
        pixel_step, (pc.reshape(num_pchunks, pixel_chunk, 2),
                     rr.reshape(num_pchunks, pixel_chunk, 2)))
    best = best.reshape(-1, knum)[:P]
    return jnp.where(best > 0, F_cap - best, -1)


def deftet_sparse_render(pixel_coords, render_ranges, face_vertices_z,
                         face_vertices_image, face_features, knum=300,
                         valid_faces=None, eps=1e-8, max_candidates=None,
                         pixel_chunk=1024):
    """Render all intersections per pixel, depth-sorted (k-buffer).

    Parity: ``kaolin/render/mesh/deftet.py:338``.

    Args:
        pixel_coords: ``(B, P, 2)`` image coords (not differentiable).
        render_ranges: ``(B, P, 2)`` (min_depth, max_depth) per pixel;
            camera-space depths are negative (closer = higher).
        face_vertices_z: ``(B, F, 3)``.
        face_vertices_image: ``(B, F, 3, 2)``.
        face_features: ``(B, F, 3, D)`` or list of such.
        knum: max intersections kept per pixel.
        valid_faces: optional ``(B, F)`` bool mask of faces to render
            (the DMTet pipeline masks tet faces here; reference
            ``deftet.py:338`` kwarg).
        eps: barycentric normalization epsilon.
        max_candidates: optional static cap enabling the spatially
            BINNED engine (:func:`_deftet_render_binned`): per pixel
            chunk only face chunks whose bbox overlaps the chunk's pixel
            bbox are tested, capped at ``max_candidates`` faces (rounded
            up to 64).  This is the fast path for large meshes (the
            default tests every face against every pixel).  The cap must
            cover the worst pixel chunk — overflow deterministically
            drops the face chunks with the highest spatial sort keys,
            like an undersized ``max_nuggets`` in the raytracer.
        pixel_chunk: pixels per processing chunk (binned path).

    Returns:
        (interpolated_features ``(B, P, knum, D)`` [or list],
        sorted_face_idx ``(B, P, knum)`` with -1 padding).
    """
    is_list = isinstance(face_features, (list, tuple))
    features = (jnp.concatenate(face_features, axis=-1) if is_list
                else face_features)
    B, F = face_vertices_z.shape[:2]
    valid = (jnp.ones((B, F), dtype=bool) if valid_faces is None
             else jnp.asarray(valid_faces, dtype=bool))

    if max_candidates is not None:
        feats, sorted_idx = jax.vmap(
            lambda pc, rr, fz, fi, ff, v: _deftet_render_binned(
                pc, rr, fz, fi, ff, v, knum=knum, eps=float(eps),
                max_candidates=int(max_candidates),
                pixel_chunk=int(pixel_chunk)))(
            pixel_coords, render_ranges, face_vertices_z,
            face_vertices_image, features, valid)
        if is_list:
            out, cur = [], 0
            for f in face_features:
                out.append(feats[..., cur:cur + f.shape[-1]])
                cur += f.shape[-1]
            feats = out
        return feats, sorted_idx

    kbuf = jax.vmap(lambda pc, rr, fz, fi, v: _deftet_select(
        pc, rr, fz, fi, v, knum=knum, eps=eps))(
        jax.lax.stop_gradient(pixel_coords),
        jax.lax.stop_gradient(render_ranges),
        jax.lax.stop_gradient(face_vertices_z),
        jax.lax.stop_gradient(face_vertices_image), valid)
    kbuf = jax.lax.stop_gradient(kbuf)  # (B, P, knum)

    def epilogue(kb, pc, fz, fi, ff):
        valid_k = kb >= 0
        sel = jnp.maximum(kb, 0)
        fv = fi[sel]        # (P, knum, 3, 2)
        fzk = fz[sel]       # (P, knum, 3)
        ffk = ff[sel]       # (P, knum, 3, D)
        x0 = pc[:, None, 0]
        y0 = pc[:, None, 1]
        a_ex = fv[..., 0, 0] - x0
        a_ey = fv[..., 0, 1] - y0
        b_ex = fv[..., 1, 0] - x0
        b_ey = fv[..., 1, 1] - y0
        c_ex = fv[..., 2, 0] - x0
        c_ey = fv[..., 2, 1] - y0
        w0 = b_ex * c_ey - b_ey * c_ex
        w1 = c_ex * a_ey - c_ey * a_ex
        w2 = a_ex * b_ey - a_ey * b_ex
        norm = w0 + w1 + w2
        norm = norm + eps * jnp.sign(norm)
        w0, w1, w2 = w0 / norm, w1 / norm, w2 / norm
        depth = w0 * fzk[..., 0] + w1 * fzk[..., 1] + w2 * fzk[..., 2]
        depth = jnp.where(valid_k, depth, -jnp.inf)
        # sort by depth descending (near-to-far; invalid -inf sinks last)
        order = jnp.argsort(-jax.lax.stop_gradient(depth), axis=-1,
                            stable=True)
        kb_sorted = jnp.take_along_axis(kb, order, axis=-1)
        w = jnp.stack([w0, w1, w2], axis=-1)
        w = jnp.take_along_axis(w, order[..., None], axis=1)
        valid_s = jnp.take_along_axis(valid_k, order, axis=-1)
        w = jnp.where(valid_s[..., None], w, 0.)
        ffs = jnp.take_along_axis(ffk, order[..., None, None], axis=1)
        feats = jnp.sum(w[..., None] * ffs, axis=-2)  # (P, knum, D)
        return feats, kb_sorted

    feats, sorted_idx = jax.vmap(epilogue)(
        kbuf, pixel_coords, face_vertices_z, face_vertices_image, features)

    if is_list:
        out = []
        cur = 0
        for f in face_features:
            out.append(feats[..., cur:cur + f.shape[-1]])
            cur += f.shape[-1]
        feats = out
    return feats, sorted_idx


def _naive_deftet_sparse_render(pixel_coords, render_ranges,
                                face_vertices_z, face_vertices_image,
                                face_features, knum=300, valid_faces=None,
                                eps=1e-8):
    """Naive dense reference implementation of
    :func:`deftet_sparse_render` (the reference keeps this in-library
    as the CUDA kernel's cross-check, ``render/mesh/deftet.py:101-267``;
    its rasterization gradient tests also compare against it).

    Differences from :func:`deftet_sparse_render`, matching the
    reference's: faces per pixel are the first ``knum`` by *depth*
    order (the k-buffer keeps the first ``knum`` by mesh order), so
    results agree whenever ``knum`` covers all intersections; and the
    interpolation uses the reference's k1/k2/k3 epilogue
    (``w0 = 1 - w1 - w2``).

    Fully dense (P, F) math — O(pixels x faces) memory.
    """
    is_list = isinstance(face_features, (list, tuple))
    features = (jnp.concatenate(face_features, axis=-1) if is_list
                else face_features)
    B, P = pixel_coords.shape[:2]
    F = face_vertices_z.shape[1]
    if valid_faces is None:
        valid_faces = jnp.ones((B, F), dtype=bool)

    def one_batch(pc, rr, fz, fi, ff, valid):
        x0 = pc[:, 0:1]
        y0 = pc[:, 1:2]
        fmin = jnp.min(fi, axis=1)
        fmax = jnp.max(fi, axis=1)
        in_bbox = ((x0 >= fmin[None, :, 0]) & (x0 < fmax[None, :, 0])
                   & (y0 >= fmin[None, :, 1]) & (y0 < fmax[None, :, 1])
                   & valid[None, :])
        ax, ay = fi[:, 0, 0], fi[:, 0, 1]
        bx, by = fi[:, 1, 0], fi[:, 1, 1]
        cx, cy = fi[:, 2, 0], fi[:, 2, 1]
        a_ex, a_ey = ax[None] - x0, ay[None] - y0
        b_ex, b_ey = bx[None] - x0, by[None] - y0
        c_ex, c_ey = cx[None] - x0, cy[None] - y0
        w0 = b_ex * c_ey - b_ey * c_ex
        w1 = c_ex * a_ey - c_ey * a_ex
        w2 = a_ex * b_ey - a_ey * b_ex
        norm = w0 + w1 + w2
        norm = norm + eps * jnp.sign(norm)
        w0n, w1n, w2n = w0 / norm, w1 / norm, w2 / norm
        inside = (w0n >= 0.) & (w1n >= 0.) & (w2n >= 0.)
        depth = (w0n * fz[None, :, 0] + w1n * fz[None, :, 1]
                 + w2n * fz[None, :, 2])
        covered = (in_bbox & inside
                   & (depth > rr[:, 0:1]) & (depth < rr[:, 1:2]))
        # first knum by depth (descending = near-to-far), tie -> face id
        key = jnp.where(covered, depth, -jnp.inf)
        if knum > key.shape[-1]:
            key = jnp.pad(key, ((0, 0), (0, knum - key.shape[-1])),
                          constant_values=-jnp.inf)
            covered = jnp.pad(covered,
                              ((0, 0), (0, knum - covered.shape[-1])))
        order = jnp.argsort(-key, axis=-1, stable=True)[:, :knum]
        sel_valid = jnp.take_along_axis(covered, order, axis=-1)
        order = jnp.minimum(order, fz.shape[0] - 1)
        fidx = jnp.where(sel_valid, order, -1)

        # reference epilogue: k1/k2/k3, w0 = 1 - w1 - w2 (deftet.py:199-257)
        sel = jnp.maximum(fidx, 0)
        _ax, _ay = ax[sel], ay[sel]
        _m = (bx - ax)[sel]
        _p = (by - ay)[sel]
        _n = (cx - ax)[sel]
        _q = (cy - ay)[sel]
        _k3 = (_m * _q - _n * _p)
        _k3 = jnp.where(sel_valid, _k3, 1.)
        _ax = jnp.where(sel_valid, _ax, 0.)
        _ay = jnp.where(sel_valid, _ay, 0.)
        _s = pc[:, 0:1] - _ax
        _t = pc[:, 1:2] - _ay
        _k1 = _s * _q - _n * _t
        _k2 = _m * _t - _s * _p
        norm_eps = eps * jnp.sign(_k3)
        w1k = _k1 / (_k3 + norm_eps)
        w2k = _k2 / (_k3 + norm_eps)
        w0k = 1. - w1k - w2k
        w = jnp.stack([w0k, w1k, w2k], axis=-1)
        w = jnp.where(sel_valid[..., None], w, 0.)
        ffk = jnp.where(sel_valid[..., None, None], ff[sel], 0.)
        feats = jnp.sum(ffk * w[..., None], axis=-2)
        return feats, fidx

    feats, fidx = jax.vmap(one_batch)(
        pixel_coords, render_ranges, face_vertices_z, face_vertices_image,
        features, valid_faces)
    if is_list:
        out, cur = [], 0
        for f in face_features:
            out.append(feats[..., cur:cur + f.shape[-1]])
            cur += f.shape[-1]
        feats = tuple(out)
    return feats, fidx
