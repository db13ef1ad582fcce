"""Prototype: flat gathers + custom-vjp scatters for the DIB-R epilogue."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = 1
H = W = 512
P = B * H * W
F = 10240
C = 5
T = 256

key = jax.random.key(0)
face_idx = jax.random.randint(jax.random.key(1), (B, H, W), -1, F)
fvi = jax.random.normal(jax.random.key(2), (B, F, 3, 2)) * 500.
feats = jax.random.normal(jax.random.key(3), (B, F, 3, C))
texture = jax.random.uniform(jax.random.key(4), (B, 3, T, T))
uvmap = jax.random.uniform(jax.random.key(5), (B, H, W, 2))


def timeit(label, fn, *a, iters=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'{label}: {dt*1000:.3f} ms', flush=True)
    return dt


# ---- row gather with hand-written scatter-add transpose --------------------
@jax.custom_vjp
def gather_rows(table, idx):
    """table (N, D), idx (P,) int32 in [0, N) -> (P, D)."""
    return jax.lax.optimization_barrier(table[idx])


def _gather_rows_fwd(table, idx):
    return jax.lax.optimization_barrier(table[idx]), (idx, table.shape)


def _gather_rows_bwd(res, g):
    idx, shape = res
    g = jax.lax.optimization_barrier(g)
    dt = jnp.zeros(shape, g.dtype).at[idx].add(g)
    return jax.lax.optimization_barrier(dt), None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def interp_fast(face_idx, fvi, feats, xs, ys, eps=1e-8):
    Bv, Fv = fvi.shape[:2]
    flat = face_idx.reshape(-1)
    boff = jnp.repeat(jnp.arange(Bv, dtype=jnp.int32) * Fv, H * W)
    gidx = jnp.clip(flat, 0, Fv - 1) + boff
    fv = gather_rows(fvi.reshape(Bv * Fv, 6), gidx).reshape(-1, 3, 2)
    ff = gather_rows(feats.reshape(Bv * Fv, 3 * C), gidx).reshape(-1, 3, C)
    x0 = jnp.tile(xs[None, :], (H, 1)).reshape(-1)
    y0 = jnp.tile(ys[:, None], (1, W)).reshape(-1)
    x0 = jnp.tile(x0, Bv)
    y0 = jnp.tile(y0, Bv)
    a_ex = fv[:, 0, 0] - x0
    a_ey = fv[:, 0, 1] - y0
    b_ex = fv[:, 1, 0] - x0
    b_ey = fv[:, 1, 1] - y0
    c_ex = fv[:, 2, 0] - x0
    c_ey = fv[:, 2, 1] - y0
    w0 = b_ex * c_ey - b_ey * c_ex
    w1 = c_ex * a_ey - c_ey * a_ex
    w2 = a_ex * b_ey - a_ey * b_ex
    norm = w0 + w1 + w2
    norm = norm + jnp.copysign(eps, norm)
    w = jnp.stack([w0 / norm, w1 / norm, w2 / norm], -1)
    w = jnp.where((flat >= 0)[:, None], w, 0.)
    out = jnp.einsum('pk,pkc->pc', w, ff)
    return out.reshape(Bv, H, W, C), w.reshape(Bv, H, W, 3)


from kaolin_tpu.render.mesh.rasterization import pixel_coords
xs, ys = pixel_coords(H, W, 1000.)

f_fast = jax.jit(lambda v, f: interp_fast(face_idx, v, f, xs, ys))
g_fast = jax.jit(jax.grad(
    lambda v, f: jnp.sum(f_fast(v, f)[0] ** 2), argnums=(0, 1)))
timeit('interp_fast fwd', f_fast, fvi, feats)
timeit('interp_fast fwd+bwd', g_fast, fvi, feats)

# compare against current implementation for correctness
from kaolin_tpu.render.mesh.rasterization import _interpolate_selected
f_ref = jax.jit(lambda v, f: jax.vmap(
    lambda i, vv, ff: _interpolate_selected(i, vv, ff, xs, ys, 1e-8)
)(face_idx, v, f))
out_ref = f_ref(fvi, feats)
out_fast = f_fast(fvi, feats)
print('fwd match:', bool(jnp.allclose(out_ref[0], out_fast[0], atol=1e-4)),
      bool(jnp.allclose(out_ref[1], out_fast[1], atol=1e-6)))
g_ref = jax.jit(jax.grad(
    lambda v, f: jnp.sum(f_ref(v, f)[0] ** 2), argnums=(0, 1)))
gr = g_ref(fvi, feats)
gf = g_fast(fvi, feats)
print('bwd match:',
      bool(jnp.allclose(gr[0], gf[0], rtol=1e-3, atol=1e-3)),
      bool(jnp.allclose(gr[1], gf[1], rtol=1e-3, atol=1e-3)))


# ---- texture bilinear with channels-last rows ------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def tex_bilinear(tex_rows, uv, TT):
    """tex_rows ((B*)T*T, 3) channels-last; uv (P, 2) in texel units."""
    out, _ = _tex_fwd_impl(tex_rows, uv, TT)
    return out


def _tex_fwd_impl(tex_rows, uv, TT):
    u0f = jnp.floor(uv[:, 0])
    v0f = jnp.floor(uv[:, 1])
    fu = (uv[:, 0] - u0f)[:, None]
    fv = (uv[:, 1] - v0f)[:, None]
    i00 = (v0f.astype(jnp.int32) * TT + u0f.astype(jnp.int32))
    t00, t01, t10, t11 = jax.lax.optimization_barrier(
        (tex_rows[i00], tex_rows[i00 + 1], tex_rows[i00 + TT],
         tex_rows[i00 + TT + 1]))
    out = (t00 * (1 - fu) * (1 - fv) + t01 * fu * (1 - fv)
           + t10 * (1 - fu) * fv + t11 * fu * fv)
    return out, (i00, fu, fv)


def _tex_fwd(tex_rows, uv, TT):
    out, res = _tex_fwd_impl(tex_rows, uv, TT)
    return out, (res, tex_rows.shape)


def _tex_bwd(TT, ress, g):
    (i00, fu, fv), shape = ress
    v00, v01, v10, v11 = jax.lax.optimization_barrier(
        (g * (1 - fu) * (1 - fv), g * fu * (1 - fv),
         g * (1 - fu) * fv, g * fu * fv))
    z = jnp.zeros(shape, g.dtype)
    z = z.at[i00].add(v00)
    z = z.at[i00 + 1].add(v01)
    z = z.at[i00 + TT].add(v10)
    z = z.at[i00 + TT + 1].add(v11)
    return jax.lax.optimization_barrier(z), None


tex_bilinear.defvjp(_tex_fwd, _tex_bwd)

uv_flat = uvmap.reshape(-1, 2) * (T - 2)
tex_rows = texture[0].transpose(1, 2, 0).reshape(T * T, 3)
tf = jax.jit(lambda t: tex_bilinear(t, uv_flat, T))
tg = jax.jit(jax.grad(lambda t: jnp.sum(tf(t) ** 2)))
timeit('tex_fast fwd', tf, tex_rows)
timeit('tex_fast fwd+bwd', tg, tex_rows)
