"""Degree-3 spherical harmonics lighting.

Parity: ``kaolin/render/lighting/sh.py`` (reference).
"""

import math

import jax.numpy as jnp

__all__ = ['project_onto_sh9', 'sh9_irradiance', 'sh9_diffuse']


def project_onto_sh9(directions):
    """Project cartesian directions onto degree-3 SH basis coefficients.

    Parity: ``kaolin/render/lighting/sh.py:28``.

    Args:
        directions: array of shape ``(..., 3)`` or a list of 3 floats.

    Returns:
        array of shape ``(..., 9)``.
    """
    if isinstance(directions, (list, tuple)):
        directions = jnp.array(directions, dtype=jnp.float32)
    assert directions.shape[-1] == 3
    x = directions[..., 0:1]
    y = directions[..., 1:2]
    z = directions[..., 2:3]
    band0 = jnp.full_like(x, 0.28209479177)
    band1_m1 = -0.4886025119 * y
    band1_0 = 0.4886025119 * z
    band1_p1 = -0.4886025119 * x
    band2_m2 = 1.0925484305920792 * (x * y)
    band2_m1 = -1.0925484305920792 * (y * z)
    band2_0 = 0.94617469575 * (z * z) - 0.31539156525
    band2_p1 = -1.0925484305920792 * x * z
    band2_p2 = 0.5462742152960396 * (x * x - y * y)
    return jnp.concatenate([
        band0, band1_m1, band1_0, band1_p1,
        band2_m2, band2_m1, band2_0, band2_p1, band2_p2], axis=-1)


def sh9_irradiance(lights, normals):
    """Approximate incident irradiance from a degree-3 SH radiance lobe.

    Parity: ``kaolin/render/lighting/sh.py:78``.

    Args:
        lights: ``(9,)`` SH coefficients of incoming radiance.
        normals: ``(N, 3)`` surface normals.

    Returns:
        ``(N,)`` irradiance.
    """
    assert lights.shape == (9,)
    bands = project_onto_sh9(normals)
    scale = jnp.array(
        [math.pi] + [2. * math.pi / 3.] * 3 + [math.pi / 4.] * 5,
        dtype=bands.dtype)
    bands = bands * scale
    return jnp.sum(bands * lights[None, :], axis=-1)


def sh9_diffuse(directions, normals, albedo):
    """Lambertian diffuse radiance from a degree-3 SH light.

    Parity: ``kaolin/render/lighting/sh.py:104``.

    Args:
        directions: ``(3,)`` light direction.
        normals: ``(N, 3)``.
        albedo: ``(N, 3)``.

    Returns:
        ``(N, 3)`` radiance.
    """
    assert directions.shape == (3,)
    lights = project_onto_sh9(directions)
    irradiance = sh9_irradiance(lights, normals)
    return albedo * irradiance[..., None]
