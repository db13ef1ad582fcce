"""Random structured test-data generators.

Parity: ``kaolin/ops/random.py`` (reference).  The reference seeds torch /
random / numpy global state; JAX uses explicit PRNG keys.  We keep a
module-level numpy Generator as the implicit state (used by all the helpers
below) so the reference's ``manual_seed`` / ``get_state`` / ``set_state``
workflow still works, and every helper also accepts an explicit ``key=``
(a ``jax.random`` key) for purely functional use.
"""

import math
import random as _pyrandom

import numpy as np
import jax.numpy as jnp

__all__ = [
    'manual_seed',
    'get_state',
    'set_state',
    'random_shape_per_tensor',
    'random_tensor',
    'random_spc_octrees',
    'sample_spherical_coords',
]

_rng = np.random.default_rng(0)


def manual_seed(seed, random_seed=None, numpy_seed=None):
    """Set the seed of the module RNG (and python/numpy globals).

    Parity: ``kaolin/ops/random.py:23``.
    """
    global _rng
    if random_seed is None:
        random_seed = seed
    if numpy_seed is None:
        numpy_seed = seed
    _pyrandom.seed(random_seed)
    np.random.seed(numpy_seed)
    _rng = np.random.default_rng(seed)


def get_state():
    """Return the current RNG states (module, python, numpy).

    Parity: ``kaolin/ops/random.py:58``.
    """
    return _rng.bit_generator.state, _pyrandom.getstate(), np.random.get_state()


def set_state(state, random_state=None, numpy_state=None):
    """Restore RNG states captured by :func:`get_state`.

    Parity: ``kaolin/ops/random.py:39``.
    """
    _rng.bit_generator.state = state
    if random_state is not None:
        _pyrandom.setstate(random_state)
    if numpy_state is not None:
        np.random.set_state(numpy_state)


def random_shape_per_tensor(batch_size, min_shape=None, max_shape=None):
    """Generate random ``shape_per_tensor`` metadata (host numpy).

    Parity: ``kaolin/ops/random.py:80``.

    Args:
        batch_size: number of sub-tensor shapes.
        min_shape: per-dim lower bounds (default: all 1).
        max_shape: per-dim upper bounds (inclusive).

    Returns:
        numpy int64 array ``(batch_size, len(max_shape))``.
    """
    if max_shape is None:
        raise ValueError("max_shape must be provided")
    max_shape = np.asarray(max_shape, dtype=np.int64)
    if min_shape is None:
        min_shape = np.ones_like(max_shape)
    else:
        min_shape = np.asarray(min_shape, dtype=np.int64)
    return _rng.integers(min_shape, max_shape + 1,
                         size=(batch_size, max_shape.shape[0]),
                         dtype=np.int64)


def random_tensor(low, high, shape, dtype=jnp.float32):
    """Generate a random array in [low, high].

    Parity: ``kaolin/ops/random.py:107``.
    """
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.floating):
        arr = _rng.uniform(low, high, size=shape)
        return jnp.asarray(arr, dtype=dtype)
    elif dtype == jnp.bool_:
        return jnp.asarray(_rng.integers(0, 2, size=shape).astype(bool))
    else:
        arr = _rng.integers(low, high + 1, size=shape)
        return jnp.asarray(arr, dtype=dtype)


def random_spc_octrees(batch_size, max_level, dtype=jnp.uint8):
    """Generate a batch of random SPC octrees (packed byte arrays).

    Each level's nodes get a random non-zero occupancy byte; children counts
    follow from popcount, exactly like the reference generator
    (``kaolin/ops/random.py:139``).

    Returns:
        (octrees, lengths): packed uint8 array of all octree bytes, and
        int32 numpy lengths per octree.
    """
    octrees = []
    lengths = []
    for _ in range(batch_size):
        octree_length = 0
        cur_num_nodes = 1
        for _level in range(max_level):
            cur_nodes = _rng.integers(1, 256, size=(cur_num_nodes,),
                                      dtype=np.uint8)
            cur_num_nodes = int(
                np.unpackbits(cur_nodes[:, None], axis=1).sum())
            octrees.append(cur_nodes)
            octree_length += cur_nodes.shape[0]
        lengths.append(octree_length)
    return (jnp.asarray(np.concatenate(octrees, axis=0), dtype=dtype),
            np.asarray(lengths, dtype=np.int32))


def sample_spherical_coords(shape,
                            azimuth_low=0., azimuth_high=math.pi * 2.,
                            elevation_low=0., elevation_high=math.pi * 0.5,
                            dtype=jnp.float32):
    """Sample spherical coordinates, uniform over the spherical cap.

    Azimuth is uniform in [low, high); elevation is sampled so directions are
    uniform on the sphere (uniform in sin(elevation), matching reference
    ``kaolin/ops/random.py:175``).

    Returns:
        (azimuth, elevation) arrays of the requested ``shape``.
    """
    rand = _rng.uniform(0., 1., size=(2,) + tuple(shape))
    azimuth = azimuth_low + rand[0] * (azimuth_high - azimuth_low)
    sin_lo, sin_hi = math.sin(elevation_low), math.sin(elevation_high)
    elevation = np.arcsin(sin_lo + rand[1] * (sin_hi - sin_lo))
    return (jnp.asarray(azimuth, dtype=dtype),
            jnp.asarray(elevation, dtype=dtype))
