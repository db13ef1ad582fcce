"""Isolate the texture_mapping gradient cost honestly."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_ = np.asarray(jnp.ones((8,)))   # poison -> sync dispatch mode

from kaolin_tpu.render.mesh.utils import texture_mapping

BASE = None


def timeit(label, fn, *a, iters=20):
    global BASE
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    tag = ' [baseline]' if BASE is None else f'  (net {dt - BASE:.3f})'
    if BASE is None:
        BASE = dt
    print(f'{label}: {dt:.3f} ms{tag}', flush=True)


timeit('trivial', jax.jit(lambda x: x * 2.0), jnp.ones((128, 128)))

B, H, W, T = 1, 512, 512, 256
texmap = jax.random.uniform(jax.random.key(0), (3, T, T))
uvmap = jax.random.uniform(jax.random.key(5), (B, H, W, 2))


def f(tm, uv):
    tex = jnp.broadcast_to(tm[None], (B,) + tm.shape)
    return texture_mapping(uv, tex, mode='bilinear')


timeit('tex fwd', jax.jit(f), texmap, uvmap)
timeit('grad wrt texmap', jax.jit(jax.grad(
    lambda tm, uv: jnp.sum(f(tm, uv) ** 2), argnums=0)), texmap, uvmap)
timeit('grad wrt uv', jax.jit(jax.grad(
    lambda tm, uv: jnp.sum(f(tm, uv) ** 2), argnums=1)), texmap, uvmap)
timeit('grad wrt both', jax.jit(jax.grad(
    lambda tm, uv: jnp.sum(f(tm, uv) ** 2), argnums=(0, 1))), texmap, uvmap)

# without the transpose: channels-last texture throughout
from kaolin_tpu.render.mesh.utils import _bilinear_sample


def f2(tm_rows, uv):
    u = jnp.clip(uv.reshape(-1, 2), 0., 1.)
    x = (u[:, 0] * 2. - 1. + 1.) * T / 2. - 0.5
    y = (-(u[:, 1] * 2. - 1.) + 1.) * T / 2. - 0.5
    return _bilinear_sample(tm_rows, x, y, (T, T, B, H * W))


tex_rows = jax.random.uniform(jax.random.key(0), (T * T, 3))
timeit('rows-direct fwd', jax.jit(f2), tex_rows, uvmap)
timeit('rows-direct grad both', jax.jit(jax.grad(
    lambda tm, uv: jnp.sum(f2(tm, uv) ** 2), argnums=(0, 1))),
    tex_rows, uvmap)
