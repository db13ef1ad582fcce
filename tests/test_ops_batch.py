import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops import batch


@pytest.fixture
def tensor_list():
    return [jnp.arange(6, dtype=jnp.float32).reshape(3, 2),
            jnp.arange(10, dtype=jnp.float32).reshape(5, 2) + 100.]


def test_list_to_packed_roundtrip(tensor_list):
    packed, spt = batch.list_to_packed(tensor_list)
    assert packed.shape == (8, 2)
    assert spt.tolist() == [[3], [5]]
    first_idx = batch.get_first_idx(batch.total_numel(spt))
    assert first_idx.tolist() == [0, 3, 8]
    out = batch.packed_to_list(packed, spt, first_idx)
    for a, b in zip(out, tensor_list):
        np.testing.assert_array_equal(a, b)


def test_list_to_padded_roundtrip(tensor_list):
    padded, spt = batch.list_to_padded(tensor_list, padding_value=-1.)
    assert padded.shape == (2, 5, 2)
    assert float(padded[0, 3, 0]) == -1.
    out = batch.padded_to_list(padded, spt)
    for a, b in zip(out, tensor_list):
        np.testing.assert_array_equal(a, b)


def test_packed_padded_conversions(tensor_list):
    packed, spt = batch.list_to_packed(tensor_list)
    first_idx = batch.get_first_idx(batch.total_numel(spt))
    padded = batch.packed_to_padded(packed, spt, first_idx, 0.)
    repacked = batch.padded_to_packed(padded, spt)
    np.testing.assert_array_equal(repacked, packed)


def test_tile_to_packed():
    values = jnp.array([2., 3.])
    out = batch.tile_to_packed(values, np.array([3, 2]))
    np.testing.assert_array_equal(
        np.asarray(out)[:, 0], [2., 2., 2., 3., 3.])


def test_fill_max_shape():
    spt = np.array([[3, 4], [5, 2]])
    np.testing.assert_array_equal(batch.fill_max_shape(spt), [5, 4])
    np.testing.assert_array_equal(
        batch.fill_max_shape(spt, [-1, 6]), [5, 6])
    with pytest.raises(ValueError):
        batch.fill_max_shape(spt, [4, 4])


def test_packed_simple_sum():
    from kaolin_tpu.ops.reduction import packed_simple_sum
    packed = jnp.arange(10, dtype=jnp.float32).reshape(5, 2)
    out = packed_simple_sum(packed, np.array([2, 3]))
    np.testing.assert_allclose(np.asarray(out), [6., 39.])
