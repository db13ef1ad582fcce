"""Coordinate system conversions.

Parity: ``kaolin/ops/coords.py`` (reference).
"""

import jax.numpy as jnp

__all__ = ['spherical2cartesian', 'cartesian2spherical']


def spherical2cartesian(azimuth, elevation, distance=None):
    """Convert spherical coordinates to cartesian.

    Assumes X toward camera, Z-up and Y-right — elevation measured from
    the xy-plane toward +z, azimuth around z from +x toward +y (matching
    reference ``kaolin/ops/coords.py:20``; verified against the SG
    golden renders, tests/test_sg_golden.py).

    Args:
        azimuth: azimuth angles (radians).
        elevation: elevation angles (radians).
        distance: radii; default 1.

    Returns:
        (x, y, z) arrays.

    Example:
        >>> import jax.numpy as jnp
        >>> x, y, z = spherical2cartesian(jnp.zeros(1), jnp.zeros(1))
        >>> (float(x[0]), float(y[0]), float(z[0]))
        (1.0, 0.0, 0.0)
    """
    if distance is None:
        distance = 1.
    z = jnp.sin(elevation) * distance
    temp = jnp.cos(elevation) * distance
    x = jnp.cos(azimuth) * temp
    y = jnp.sin(azimuth) * temp
    return x, y, z


def cartesian2spherical(x, y, z):
    """Convert cartesian coordinates to spherical.

    Parity: ``kaolin/ops/coords.py:44``.

    Returns:
        (azimuth, elevation, distance) arrays.
    """
    distance = jnp.sqrt(x * x + y * y + z * z)
    elevation = jnp.arcsin(z / distance)
    azimuth = jnp.arctan2(y, x)
    return azimuth, elevation, distance
