"""Common coordinate-system basis-change matrices.

Parity: ``kaolin/render/camera/coordinates.py`` (reference).  The default
kaolin_tpu coordinate system is right-handed cartesian with y up, z
pointing outwards of the screen.
"""

import jax.numpy as jnp

__all__ = ['blender_coords', 'opengl_coords']


def blender_coords():
    """Blender world coords: right handed, z up.

    Parity: ``kaolin/render/camera/coordinates.py:32``.
    """
    return jnp.array([[1, 0, 0],
                      [0, 0, 1],
                      [0, -1, 0]])


def opengl_coords():
    """OpenGL-standard world coords: right handed, y up (the default).

    Parity: ``kaolin/render/camera/coordinates.py:48``.
    """
    return jnp.array([[1, 0, 0],
                      [0, 1, 0],
                      [0, 0, 1]])
