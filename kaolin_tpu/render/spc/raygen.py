"""Primary / shadow ray generation (deprecated in the reference).

Parity: ``kaolin/csrc/render/spc/raytrace_cuda.cu:763-894``.  The
reference binds these CUDA kernels (``generate_primary_rays_cuda``,
``generate_shadow_rays_cuda``) but no longer exposes them through the
python API — they are kept here for completeness of the component
inventory (SURVEY.md §2.2), implemented as plain vector ops.
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['generate_primary_rays', 'generate_shadow_rays']


def generate_primary_rays(width, height, tf):
    """Camera-matrix primary rays, one per pixel.

    Matches ``generate_rays_cuda_kernel`` (``raytrace_cuda.cu:763-786``):
    for pixel index ``i``, ``px = i % width``, ``py = i // height`` (the
    reference divides by *height* — exact parity, only relevant for
    non-square images), ``ray_o = (0, 0, 1, 0) @ tf`` (same for every
    pixel) and ``ray_d = (px, py, 0, 1) @ tf``.

    Args:
        width, height: image size.
        tf: (4, 4) row-vector transform matrix.

    Returns:
        (ray_o (num, 3), ray_d (num, 3)) with ``num = width * height``.
    """
    tf = jnp.asarray(tf, jnp.float32)
    num = width * height
    # integer index arithmetic (the reference kernel uses integer
    # division); a float32 arange loses exact pixel ids past 2^24
    i = jnp.arange(num, dtype=jnp.int32)
    px = jnp.mod(i, width).astype(jnp.float32)
    py = (i // height).astype(jnp.float32)
    a = jnp.asarray([0., 0., 1., 0.]) @ tf
    b = jnp.stack([px, py, jnp.zeros_like(px), jnp.ones_like(px)],
                  axis=-1) @ tf
    ray_o = jnp.broadcast_to(a[:3], (num, 3))
    return ray_o, b[:, :3]


def generate_shadow_rays(ray_o, ray_d, light, plane):
    """Shadow rays toward a point light from ray/plane intersections.

    Matches ``generate_shadow_rays_cuda_impl``
    (``raytrace_cuda.cu:802-894``): each input ray is intersected with
    ``plane`` (``(4,)``: ax + by + cz + d = 0); hits with ``t > 0`` and
    non-grazing incidence (``|dir . n| > 1e-3``) are compacted, then
    each shadow ray starts at ``light`` pointing at the intersection.

    Args:
        ray_o, ray_d: (num, 3) primary rays.
        light: (3,) light position.
        plane: (4,) plane coefficients.

    Returns:
        (src (cnt, 3) — ``light`` replicated, dst (cnt, 3) — unit
        directions light -> intersection, map (cnt,) int32 — index of
        the originating primary ray).  Host-syncs on ``cnt`` (this is a
        deprecated convenience API, not a jit path).
    """
    ray_o = jnp.asarray(ray_o, jnp.float32)
    ray_d = jnp.asarray(ray_d, jnp.float32)
    light = jnp.asarray(light, jnp.float32)
    plane = jnp.asarray(plane, jnp.float32)

    a = ray_o @ plane[:3] + plane[3]
    b = ray_d @ plane[:3]
    safe_b = jnp.where(jnp.abs(b) > 1e-3, b, 1.)
    t = -a / safe_b
    hit = (jnp.abs(b) > 1e-3) & (t > 0.)
    pts = ray_o + t[:, None] * ray_d

    hit_np = np.asarray(hit)
    idx = np.nonzero(hit_np)[0].astype(np.int32)
    src_pts = jnp.asarray(pts)[jnp.asarray(idx)]
    dirs = src_pts - light
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    src = jnp.broadcast_to(light, src_pts.shape)
    return src, dirs, jnp.asarray(idx)
