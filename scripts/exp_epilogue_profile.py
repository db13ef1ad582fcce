"""Isolate the expensive ops in the DIB-R differentiable epilogue.

All device arrays passed as jit arguments (no captured device arrays —
they poison the axon tunnel's fast dispatch path).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

H = W = 512
F = 10000
C = 5
key = jax.random.key(0)
k1, k2, k3, k4, k5 = jax.random.split(key, 5)

face_idx = jax.random.randint(k1, (1, H, W), -1, F)
fvi = jax.random.normal(k2, (1, F, 3, 2)) * 500.
feats = jax.random.normal(k3, (1, F, 3, C))
texture = jax.random.uniform(k4, (1, 3, 256, 256))
uvmap = jax.random.uniform(k5, (1, H, W, 2))
normals = jax.random.normal(k1, (1, H, W, 3))
sh = jnp.zeros((1, 9)).at[:, 0].set(3.)

from kaolin_tpu.render.mesh.rasterization import (
    _interpolate_selected_batched, pixel_coords)
from kaolin_tpu.render.mesh.utils import texture_mapping
from kaolin_tpu.render.mesh.utils import spherical_harmonic_lighting

xs, ys = pixel_coords(H, W, 1000.)


def timeit(label, fn, *a, iters=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'{label}: {dt*1000:.2f} ms', flush=True)
    return dt


interp_f = jax.jit(lambda fi, fv, ff, x, y: _interpolate_selected_batched(
    fi, fv, ff, x, y, 1e-8)[0])
interp_g = jax.jit(jax.grad(
    lambda fv, ff, fi, x, y: jnp.sum(interp_f(fi, fv, ff, x, y)) ** 2,
    argnums=(0, 1)))
timeit('interp fwd', interp_f, face_idx, fvi, feats, xs, ys)
timeit('interp fwd+bwd', interp_g, fvi, feats, face_idx, xs, ys)

tex_f = jax.jit(lambda t, uv: texture_mapping(uv, t, mode='bilinear'))
tex_g = jax.jit(jax.grad(
    lambda t, uv: jnp.sum(tex_f(t, uv) ** 2), argnums=(0, 1)))
timeit('texture fwd', tex_f, texture, uvmap)
timeit('texture fwd+bwd', tex_g, texture, uvmap)

sh_f = jax.jit(lambda n, s: spherical_harmonic_lighting(n, s))
sh_g = jax.jit(jax.grad(lambda n, s: jnp.sum(sh_f(n, s) ** 2)))
timeit('sh fwd', sh_f, normals, sh)
timeit('sh fwd+bwd', sh_g, normals, sh)

# soft-mask custom-vjp fwd+bwd via full selection state
from kaolin_tpu.render.mesh import _fused as FU
fvz = jax.random.normal(k2, (1, F, 3)) - 2.
sel_fn = jax.jit(lambda z, i: FU.fused_selection(
    z, i, jnp.ones((1, F), bool), H, W, 1000.))
sel = jax.block_until_ready(sel_fn(fvz, fvi / 1000.))
cfg = (H, W, 1000., 7000.)
sm_g = jax.jit(jax.grad(lambda fv, s: jnp.sum(
    FU.softmask_fused(fv, s, cfg) ** 2)))
timeit('softmask custom fwd+bwd', sm_g, fvi, sel)
