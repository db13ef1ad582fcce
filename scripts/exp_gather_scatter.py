"""Microbench: gather/scatter formulations on TPU for the DIB-R epilogue.

P = 262144 pixels gathering/scattering rows of a (F, D) face table.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

P = 512 * 512
F = 10240
key = jax.random.key(0)
idx = jax.random.randint(jax.random.key(1), (P,), 0, F)
g = jax.random.normal(jax.random.key(2), (P, 16))


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


for D in (8, 16, 128):
    tbl = jax.random.normal(key, (F, D))
    gather = jax.jit(lambda t, i: t[i])
    timeit(f'gather rows D={D}', gather, tbl, idx)

gD = g
# scatter-add variants into (F, 16)
scat = jax.jit(lambda i, v: jnp.zeros((F, 16)).at[i].add(v))
timeit('scatter-add .at[].add', scat, idx, gD)

seg = jax.jit(lambda i, v: jax.ops.segment_sum(v, i, num_segments=F))
timeit('segment_sum (unsorted)', seg, idx, gD)


def sort_seg(i, v):
    order = jnp.argsort(i)
    return jax.ops.segment_sum(v[order], i[order], num_segments=F,
                               indices_are_sorted=True)


timeit('sort + segment_sum', jax.jit(sort_seg), idx, gD)


def sort_seg2(i, v):
    si, order = jax.lax.sort_key_val(i, jnp.arange(P, dtype=jnp.int32))
    return jax.ops.segment_sum(v[order], si, num_segments=F,
                               indices_are_sorted=True)


timeit('sort_key_val + segment_sum', jax.jit(sort_seg2), idx, gD)


# one-hot matmul scatter: block over F
def onehot_scatter(i, v):
    oh = jax.nn.one_hot(i, F, dtype=jnp.bfloat16)  # (P, F)
    return jnp.einsum('pf,pd->fd', oh, v.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


timeit('one-hot matmul (bf16)', jax.jit(onehot_scatter), idx, gD)

# bilinear texture: gather 4 taps from 256^2 then scatter back
T = 256
uv = jax.random.uniform(jax.random.key(3), (P, 2)) * (T - 1)


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


tex = jax.random.uniform(key, (T, T, 3))
timeit('tex bilinear gather', jax.jit(tex_gather), tex, uv)
timeit('tex bilinear fwd+bwd', jax.jit(
    jax.grad(lambda t: jnp.sum(tex_gather(t, uv) ** 2))), tex)


def tex_onehot(tex, uv):
    # separable: out[p] = sum_uv U[p,u] T[u,v] V[p,v]
    u = uv[:, 0]
    v = uv[:, 1]
    iu = jnp.arange(T, dtype=jnp.float32)
    U = jnp.clip(1. - jnp.abs(u[:, None] - iu[None]), 0.)   # (P, T) hat
    V = jnp.clip(1. - jnp.abs(v[:, None] - iu[None]), 0.)
    tmp = jnp.einsum('pv,uvc->puc', V.astype(jnp.bfloat16),
                     tex.reshape(T, T, 3).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    out = jnp.einsum('pu,puc->pc', U.astype(jnp.bfloat16),
                     tmp.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out


timeit('tex separable-hat matmul fwd', jax.jit(tex_onehot), tex, uv)
timeit('tex separable-hat fwd+bwd', jax.jit(
    jax.grad(lambda t: jnp.sum(tex_onehot(t, uv) ** 2))), tex)
