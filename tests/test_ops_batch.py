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


# -- reference test_batch.py parity additions ------------------------------

def test_get_shape_per_tensor(tensor_list):
    out = batch.get_shape_per_tensor(tensor_list)
    np.testing.assert_array_equal(out, [[3], [5]])


def test_get_first_idx():
    out = batch.get_first_idx(np.array([3, 5, 2]))
    np.testing.assert_array_equal(out, [0, 3, 8, 10])


@pytest.mark.parametrize('ndim', [2, 3])
def test_roundtrip_higher_rank(ndim):
    rng = np.random.default_rng(ndim)
    shapes = [(2,) * (ndim - 1) + (4,), (3,) * (ndim - 1) + (4,)]
    tl = [jnp.asarray(rng.normal(size=s).astype(np.float32))
          for s in shapes]
    packed, spt = batch.list_to_packed(tl)
    first_idx = batch.get_first_idx(
        np.prod(spt, axis=1) if spt.ndim > 1 else spt)
    out = batch.packed_to_list(packed, spt, first_idx)
    for a, b in zip(out, tl):
        np.testing.assert_allclose(np.asarray(a),
                                   np.asarray(b).reshape(a.shape))


def test_list_to_padded_with_max_shape(tensor_list):
    padded, spt = batch.list_to_padded(tensor_list, -1., max_shape=(6,))
    assert padded.shape == (2, 6, 2)
    np.testing.assert_allclose(np.asarray(padded)[0, 3:], -1.)
    np.testing.assert_allclose(np.asarray(padded)[1, 5:], -1.)


def test_padded_to_packed_roundtrip(tensor_list):
    padded, spt = batch.list_to_padded(tensor_list, 0.)
    packed = batch.padded_to_packed(padded, spt)
    expected, _ = batch.list_to_packed(tensor_list)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(expected))


def test_tile_to_packed_values_broadcast():
    values = jnp.array([10., 20.])
    out = batch.tile_to_packed(values, np.array([2, 3]))
    np.testing.assert_allclose(np.asarray(out)[:, 0],
                               [10., 10., 20., 20., 20.])


def test_packed_simple_sum_matches_manual(tensor_list):
    packed, spt = batch.list_to_packed(tensor_list)
    from kaolin_tpu.ops.reduction import packed_simple_sum
    out = packed_simple_sum(packed, spt[:, 0])
    expected = [float(np.asarray(t).sum()) for t in tensor_list]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_list_to_packed_empty_and_single():
    single = [jnp.ones((2, 3))]
    packed, spt = batch.list_to_packed(single)
    assert packed.shape == (2, 3)
    np.testing.assert_array_equal(spt, [[2]])
