"""Tensor checkers and test helpers.

Parity: ``kaolin/utils/testing.py`` (reference).  Operates on JAX / numpy
arrays instead of torch tensors.
"""

import functools
import logging

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.ops import random as _random

__all__ = [
    'BOOL_DTYPES', 'INT_DTYPES', 'FLOAT_DTYPES', 'NUM_DTYPES', 'ALL_DTYPES',
    'with_seed',
    'check_tensor',
    'check_packed_tensor',
    'check_padded_tensor',
    'check_spc_octrees',
    'tensor_info',
    'contained_allclose',
    'contained_equal',
    'check_allclose',
    'check_tensor_attribute_shapes',
    'print_dict_attributes',
    'print_namedtuple_attributes',
]

BOOL_DTYPES = [jnp.bool_]
INT_DTYPES = [jnp.uint8, jnp.int16, jnp.int32]
FLOAT_DTYPES = [jnp.float16, jnp.bfloat16, jnp.float32]
NUM_DTYPES = INT_DTYPES + FLOAT_DTYPES
ALL_DTYPES = NUM_DTYPES + BOOL_DTYPES


def with_seed(seed=0, random_seed=None, numpy_seed=None):
    """Decorator fixing the module RNG seed around a test function.

    Parity: ``kaolin/utils/testing.py:45``.
    """
    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            state = _random.get_state()
            _random.manual_seed(seed, random_seed, numpy_seed)
            try:
                return func(*args, **kwargs)
            finally:
                _random.set_state(*state)
        return wrapper
    return decorator


def check_tensor(tensor, shape=None, dtype=None, throw=True):
    """Check an array's shape (None entries = wildcard) and dtype.

    Parity: ``kaolin/utils/testing.py:64`` (the ``device`` argument is
    dropped — placement is managed by jax shardings, not per-tensor).
    """
    if shape is not None:
        if len(shape) != tensor.ndim:
            if throw:
                raise ValueError(
                    f"tensor is of rank {tensor.ndim} but expected {len(shape)}")
            return False
        for i, (s, exp) in enumerate(zip(tensor.shape, shape)):
            if exp is not None and s != exp:
                if throw:
                    raise ValueError(
                        f"tensor shape {tuple(tensor.shape)} does not match "
                        f"expected {tuple(shape)} at dim {i}")
                return False
    if dtype is not None:
        if jnp.dtype(tensor.dtype) != jnp.dtype(dtype):
            if throw:
                raise TypeError(
                    f"tensor dtype {tensor.dtype} != expected {dtype}")
            return False
    return True


def check_packed_tensor(tensor, total_numel=None, last_dim=None, dtype=None,
                        throw=True):
    """Check a packed tensor ``(total_numel, last_dim)``.

    Parity: ``kaolin/utils/testing.py:98``.
    """
    return check_tensor(tensor, shape=(total_numel, last_dim), dtype=dtype,
                        throw=throw)


def check_padded_tensor(tensor, padding_value=None, shape_per_tensor=None,
                        batch_size=None, max_shape=None, last_dim=None,
                        dtype=None, throw=True):
    """Check a padded tensor and (optionally) its padding values.

    Parity: ``kaolin/utils/testing.py:126``.
    """
    shape = None
    if batch_size is not None or max_shape is not None or last_dim is not None:
        if max_shape is None:
            shape = None
        else:
            shape = (batch_size,) + tuple(max_shape) + (last_dim,)
    if shape is not None and not check_tensor(tensor, shape=shape, dtype=dtype,
                                              throw=throw):
        return False
    if shape is None and dtype is not None and not check_tensor(
            tensor, dtype=dtype, throw=throw):
        return False
    if padding_value is not None and shape_per_tensor is not None:
        arr = np.asarray(tensor)
        shape_per_tensor = np.asarray(shape_per_tensor)
        for i in range(shape_per_tensor.shape[0]):
            sub = arr[i]
            mask = np.zeros(sub.shape[:-1], dtype=bool)
            mask[tuple(slice(0, int(s)) for s in shape_per_tensor[i])] = True
            if not np.all(sub[~mask] == padding_value):
                if throw:
                    raise ValueError(
                        f"padding of sub-tensor {i} is not {padding_value}")
                return False
    return True


def check_spc_octrees(octrees, lengths, batch_size=None, level=None,
                      throw=True):
    """Validate a packed batch of SPC octrees byte arrays.

    Walks each octree breadth-first from its root byte, checking that the
    number of bytes matches the popcount-derived node counts and that each
    octree reaches the expected ``level``.

    Parity: ``kaolin/utils/testing.py:184``.
    """
    octrees = np.asarray(octrees)
    lengths = np.asarray(lengths)
    if octrees.dtype != np.uint8:
        if throw:
            raise TypeError(f"octrees must be uint8, got {octrees.dtype}")
        return False
    if batch_size is not None and lengths.shape[0] != batch_size:
        if throw:
            raise ValueError(
                f"expected batch_size {batch_size}, got {lengths.shape[0]}")
        return False
    if octrees.shape[0] != lengths.sum():
        if throw:
            raise ValueError(
                f"octrees has {octrees.shape[0]} bytes but lengths sum to "
                f"{lengths.sum()}")
        return False
    start = 0
    for b, length in enumerate(lengths):
        octree = octrees[start:start + int(length)]
        cursor, num_nodes, cur_level = 0, 1, 0
        while cursor < octree.shape[0]:
            nodes = octree[cursor:cursor + num_nodes]
            cursor += num_nodes
            num_nodes = int(np.unpackbits(nodes).sum())
            cur_level += 1
        if cursor != octree.shape[0]:
            if throw:
                raise ValueError(f"octree {b} is malformed")
            return False
        if level is not None and cur_level != level:
            if throw:
                raise ValueError(
                    f"octree {b} has level {cur_level}, expected {level}")
            return False
        start += int(length)
    return True


def tensor_info(t, name='', print_stats=False, detailed=False):
    """One-line human-readable summary of an array.

    Parity: ``kaolin/utils/testing.py:222``.
    """
    if t is None:
        return f"{name}: None"
    info = f"{name}: {tuple(t.shape)} ({t.dtype})"
    if print_stats or detailed:
        arr = np.asarray(t)
        if arr.size > 0 and np.issubdtype(arr.dtype, np.number):
            info += (f" min={arr.min():.4g} max={arr.max():.4g}"
                     f" mean={arr.astype(np.float64).mean():.4g}")
    if detailed:
        arr = np.asarray(t)
        info += f" numel={arr.size}"
    return info


def contained_allclose(left, right, rtol=1e-5, atol=1e-8):
    """Recursively compare containers of arrays / scalars / strings.

    Parity: ``kaolin/utils/testing.py:287`` (``contained_torch_equal`` with
    approx=True semantics).
    """
    if type(left) is not type(right) and not (
            isinstance(left, (int, float)) and isinstance(right, (int, float))):
        if not (hasattr(left, 'shape') and hasattr(right, 'shape')):
            return False
    if isinstance(left, dict):
        if left.keys() != right.keys():
            return False
        return all(contained_allclose(left[k], right[k], rtol, atol)
                   for k in left)
    if isinstance(left, (list, tuple)):
        if len(left) != len(right):
            return False
        return all(contained_allclose(l, r, rtol, atol)
                   for l, r in zip(left, right))
    if isinstance(left, str) or left is None:
        return left == right
    if hasattr(left, 'shape') or isinstance(left, (int, float, bool)):
        left_arr, right_arr = np.asarray(left), np.asarray(right)
        if left_arr.shape != right_arr.shape:
            return False
        if np.issubdtype(left_arr.dtype, np.floating):
            return bool(np.allclose(left_arr, right_arr, rtol=rtol, atol=atol))
        return bool(np.array_equal(left_arr, right_arr))
    return left == right


def check_allclose(tensor, other, rtol=1e-5, atol=1e-8, equal_nan=False):
    """assert_allclose with a readable diff message.

    Parity: ``kaolin/utils/testing.py:364``.
    """
    tensor = np.asarray(tensor)
    other = np.asarray(other)
    if not np.allclose(tensor, other, rtol=rtol, atol=atol,
                       equal_nan=equal_nan):
        diff = np.abs(tensor.astype(np.float64) - other.astype(np.float64))
        close = np.isclose(tensor, other, rtol=rtol, atol=atol,
                           equal_nan=equal_nan)
        raise ValueError(
            f"Tensors are not close: max abs diff {diff.max()}, "
            f"{int((~close).sum())}/{close.size} mismatched elements")

def contained_equal(elem, other, approximate=False, rtol=1e-5, atol=1e-8):
    """Recursive exact (or allclose) comparison of containers of arrays.

    Parity: ``kaolin/utils/testing.py:287`` (``contained_torch_equal``);
    ``approximate=True`` matches the reference's allclose mode. Supports
    dicts, (named)tuples, lists, slotted objects, arrays and scalars.
    """
    if type(elem) is not type(other) and not (
            isinstance(elem, (int, float, bool))
            and isinstance(other, (int, float, bool))):
        if not (hasattr(elem, 'shape') and hasattr(other, 'shape')):
            return False
    if isinstance(elem, dict):
        if elem.keys() != other.keys():
            return False
        return all(contained_equal(elem[k], other[k], approximate, rtol, atol)
                   for k in elem)
    if isinstance(elem, tuple) and hasattr(elem, '_fields'):  # namedtuple
        if set(elem._fields) != set(other._fields):
            return False
        return all(contained_equal(getattr(elem, f), getattr(other, f),
                                   approximate, rtol, atol)
                   for f in elem._fields)
    if isinstance(elem, (list, tuple)):
        if len(elem) != len(other):
            return False
        return all(contained_equal(a, b, approximate, rtol, atol)
                   for a, b in zip(elem, other))
    if isinstance(elem, str) or elem is None:
        return elem == other
    if hasattr(elem, 'shape') or isinstance(elem, (int, float, bool)):
        a, b = np.asarray(elem), np.asarray(other)
        if a.shape != b.shape:
            return False
        if approximate and np.issubdtype(a.dtype, np.floating):
            return bool(np.allclose(a, b, rtol=rtol, atol=atol))
        return bool(np.array_equal(a, b))
    if hasattr(elem, '__slots__'):
        return contained_equal(
            {k: getattr(elem, k) for k in elem.__slots__ if hasattr(elem, k)},
            {k: getattr(other, k) for k in other.__slots__ if hasattr(other, k)},
            approximate, rtol, atol)
    return elem == other


def check_tensor_attribute_shapes(container, throw=True, **attribute_info):
    """Check shapes of named attributes (or dict keys) of ``container``.

    Parity: ``kaolin/utils/testing.py`` (``check_tensor_attribute_shapes``).
    """
    success = True
    for k, shape in attribute_info.items():
        val = container[k] if isinstance(container, dict) \
            else getattr(container, k)
        if not check_tensor(val, shape=shape, throw=False):
            success = False
            message = f'Attribute {k} has shape {val.shape} (expected {shape})'
            if throw:
                raise ValueError(message)
            logging.error(message)
    return success


def print_dict_attributes(in_dict, name='', prefix='', **tensor_info_kwargs):
    """Print a summary line per dict entry (tensor_info for arrays).

    Parity: ``kaolin/utils/testing.py`` (``print_dict_attributes``).
    """
    if len(name) > 0:
        print(f'\nAttributes of {name}:')
    for k, v in in_dict.items():
        recurse = False
        if hasattr(v, 'shape') and hasattr(v, 'dtype'):
            tinfo = tensor_info(v, **tensor_info_kwargs)
        elif isinstance(v, (str, int, float)):
            tinfo = v
        elif isinstance(v, dict):
            tinfo = f'{type(v)} of length {len(v)}'
            recurse = True
        elif isinstance(v, (list, tuple)):
            tinfo = f'{type(v)} of length {len(v)}'
        else:
            tinfo = type(v)
        print(f'   {prefix}{k}: {tinfo}')
        if recurse:
            print_dict_attributes(v, prefix='  ', **tensor_info_kwargs)


def print_namedtuple_attributes(ntuple, name='', prefix='',
                                **tensor_info_kwargs):
    """Same as :func:`print_dict_attributes` for a namedtuple."""
    print_dict_attributes(ntuple._asdict(), name=name, prefix=prefix,
                          **tensor_info_kwargs)
