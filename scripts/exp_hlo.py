"""Find the slow HLO in tex-bilinear backward and vmapped interp."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

P = 512 * 512
F = 10240
T = 256


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


uv = jax.random.uniform(jax.random.key(3), (P, 2)) * (T - 1)
tex = jax.random.uniform(jax.random.key(0), (T, T, 3))


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


# hand-written backward
def tex_bwd_hand(uv, g):
    u0 = jnp.floor(uv[:, 0]).astype(jnp.int32)
    v0 = jnp.floor(uv[:, 1]).astype(jnp.int32)
    fu = (uv[:, 0] - u0)[:, None]
    fv = (uv[:, 1] - v0)[:, None]
    i00 = v0 * T + u0
    z = jnp.zeros((T * T, 3))
    z = z.at[i00].add(g * (1 - fu) * (1 - fv))
    z = z.at[i00 + 1].add(g * fu * (1 - fv))
    z = z.at[i00 + T].add(g * (1 - fu) * fv)
    z = z.at[i00 + T + 1].add(g * fu * fv)
    return z


g3 = jax.random.normal(jax.random.key(2), (P, 3))
timeit('tex bwd hand-written', jax.jit(tex_bwd_hand), uv, g3)

gfn = jax.jit(jax.grad(lambda t: jnp.sum(tex_gather(t, uv) ** 2)))
timeit('tex fwd+bwd autodiff', gfn, tex)

# vmapped (B=1) gather as used in _interpolate_selected
idx2d = jax.random.randint(jax.random.key(1), (1, 512, 512), 0, F)
tblb = jax.random.normal(jax.random.key(0), (1, F, 3, 5))
vg = jax.jit(lambda t, i: jax.vmap(lambda tt, ii: tt[ii])(t, i))
timeit('vmap gather (1,F,3,5)[1,H,W]', vg, tblb, idx2d)

# and its grad (scatter with batch dim)
vgg = jax.jit(jax.grad(lambda t: jnp.sum(vg(t, idx2d) ** 2)))
timeit('vmap gather fwd+bwd', vgg, tblb)

comp = gfn.lower(tex).compile()
txt = comp.as_text()
import re
# print the fusions and scatters with their estimated shapes
for line in txt.splitlines():
    if 'scatter' in line and '=' in line:
        print(line.strip()[:200])
print('---cost analysis---')
ca = comp.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
for k in sorted(ca):
    if 'time' in k or k in ('flops', 'bytes accessed'):
        print(k, ca[k])
