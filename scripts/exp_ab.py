"""A/B: why is the same gather fast in one harness and slow in another?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

P = 512 * 512
T = 256
uv = jax.random.uniform(jax.random.key(3), (P, 2)) * (T - 1)
tex = jax.random.uniform(jax.random.key(0), (T, T, 3))
tex_rows = tex.reshape(T * T, 3)


def timeit(label, fn, *a, iters=20):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'{label}: {dt*1000:.3f} ms', flush=True)
    return dt


def tex_gather(tex, uv):
    u0 = jnp.floor(uv[:, 0]).astype(jnp.int32)
    v0 = jnp.floor(uv[:, 1]).astype(jnp.int32)
    fu = uv[:, 0] - u0
    fv = uv[:, 1] - v0
    t = tex.reshape(T * T, 3)
    i00 = v0 * T + u0
    out = (t[i00] * ((1 - fu) * (1 - fv))[:, None]
           + t[i00 + 1] * (fu * (1 - fv))[:, None]
           + t[i00 + T] * ((1 - fu) * fv)[:, None]
           + t[i00 + T + 1] * (fu * fv)[:, None])
    return out


timeit('A: both args (T,T,3)', jax.jit(tex_gather), tex, uv)
timeit('B: uv captured', jax.jit(lambda t: tex_gather(t, uv)), tex)
timeit('C: rows arg, uv arg', jax.jit(lambda t, u: tex_gather(t, u)),
       tex_rows.reshape(T, T, 3), uv)

# D: pure single gather with computed index
timeit('D: single gather computed idx', jax.jit(
    lambda t, u: t.reshape(T * T, 3)[
        (jnp.floor(u[:, 1]).astype(jnp.int32) * T
         + jnp.floor(u[:, 0]).astype(jnp.int32))]), tex, uv)

# E: single gather with idx arg
idx = (jnp.floor(uv[:, 1]).astype(jnp.int32) * T
       + jnp.floor(uv[:, 0]).astype(jnp.int32))
timeit('E: single gather idx arg', jax.jit(lambda t, i: t[i]),
       tex_rows, idx)

# F: E but output multiplied elementwise
timeit('F: gather*weight', jax.jit(
    lambda t, i, w: t[i] * w[:, None]), tex_rows, idx, uv[:, 0])

# G: grad of D wrt t
timeit('G: grad(sum(D^2))', jax.jit(jax.grad(
    lambda t: jnp.sum(tex_gather(t, uv) ** 2))), tex)

# H: grad with precomputed cotangent (bwd only, separate jit)
g3 = jax.random.normal(jax.random.key(2), (P, 3))


def bwd_only(u, g):
    u0 = jnp.floor(u[:, 0]).astype(jnp.int32)
    v0 = jnp.floor(u[:, 1]).astype(jnp.int32)
    fu = (u[:, 0] - u0)[:, None]
    fv = (u[:, 1] - v0)[:, None]
    i00 = v0 * T + u0
    z = jnp.zeros((T * T, 3), g.dtype)
    z = z.at[i00].add(g * (1 - fu) * (1 - fv))
    z = z.at[i00 + 1].add(g * fu * (1 - fv))
    z = z.at[i00 + T].add(g * (1 - fu) * fv)
    z = z.at[i00 + T + 1].add(g * fu * fv)
    return z


timeit('H: hand bwd (args)', jax.jit(bwd_only), uv, g3)

# I: fwd+bwd via custom_vjp in ONE jit, cotangent from loss
import functools


@jax.custom_vjp
def texg(t, u):
    return tex_gather(t, u)


def texg_fwd(t, u):
    return tex_gather(t, u), u


def texg_bwd(u, g):
    return bwd_only(u, g), None


texg.defvjp(texg_fwd, texg_bwd)
timeit('I: custom_vjp fwd+bwd', jax.jit(jax.grad(
    lambda t: jnp.sum(texg(t, uv) ** 2))), tex)
