"""Coordinate system conversions.

Parity: ``kaolin/ops/coords.py`` (reference).
"""

import jax.numpy as jnp

__all__ = ['spherical2cartesian', 'cartesian2spherical']


def spherical2cartesian(azimuth, elevation, distance=None):
    """Convert spherical coordinates to cartesian.

    Assumes elevation measured from the xz-plane toward +y, azimuth around y
    in the xz-plane (matching reference ``kaolin/ops/coords.py:20``).

    Args:
        azimuth: azimuth angles (radians).
        elevation: elevation angles (radians).
        distance: radii; default 1.

    Returns:
        (x, y, z) arrays.
    """
    if distance is None:
        distance = 1.
    y = jnp.sin(elevation) * distance
    temp = jnp.cos(elevation) * distance
    x = jnp.sin(azimuth) * temp
    z = jnp.cos(azimuth) * temp
    return x, y, z


def cartesian2spherical(x, y, z):
    """Convert cartesian coordinates to spherical.

    Parity: ``kaolin/ops/coords.py:44``.

    Returns:
        (azimuth, elevation, distance) arrays.
    """
    distance = jnp.sqrt(x * x + y * y + z * z)
    elevation = jnp.arcsin(y / distance)
    azimuth = jnp.arctan2(x, z)
    return azimuth, elevation, distance
