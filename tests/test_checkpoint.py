"""Checkpoint save/restore tests on the inverse-render model."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from kaolin_tpu.models import inverse_render as M
from kaolin_tpu.utils import checkpoint as ckpt


@pytest.fixture
def train_state():
    class _Mesh:
        vertices = jnp.asarray(
            np.random.RandomState(0).randn(12, 3).astype(np.float32))
    params = M.init_params(_Mesh(), texture_res=8)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    return params, opt_state


def _assert_trees_equal(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)), a, b)


def test_orbax_roundtrip(tmp_path, train_state):
    params, opt_state = train_state
    ckpt.save(str(tmp_path), {'params': params, 'opt': opt_state}, step=3)
    restored = ckpt.load(str(tmp_path),
                         {'params': params, 'opt': opt_state})
    _assert_trees_equal(restored['params'], params)
    _assert_trees_equal(restored['opt'], opt_state)


def test_orbax_latest_step(tmp_path, train_state):
    params, _ = train_state
    ckpt.save(str(tmp_path), params, step=1)
    ckpt.save(str(tmp_path), params, step=7)
    assert ckpt.latest_step(str(tmp_path)) == 7
    assert ckpt.latest_step(str(tmp_path / 'nope')) is None


def test_orbax_missing_raises(tmp_path, train_state):
    params, _ = train_state
    with pytest.raises(FileNotFoundError):
        ckpt.load(str(tmp_path / 'empty'), params)


def test_npz_roundtrip(tmp_path, train_state):
    params, opt_state = train_state
    path = str(tmp_path / 'state.npz')
    ckpt.save_npz(path, (params, opt_state))
    params2, opt2 = ckpt.load_npz(path)
    _assert_trees_equal(params2, params)
    _assert_trees_equal(opt2, opt_state)
    # NamedTuple structure is preserved
    assert isinstance(params2, M.InverseRenderParams)


def test_npz_resume_training_continues(tmp_path, train_state):
    """Restored state must continue producing identical updates."""
    params, opt_state = train_state
    opt = optax.adam(1e-3)

    @jax.jit
    def step(p, s):
        g = jax.tree_util.tree_map(jnp.ones_like, p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s

    p1, s1 = step(params, opt_state)
    path = str(tmp_path / 'state.npz')
    ckpt.save_npz(path, (p1, s1))
    p1b, s1b = ckpt.load_npz(path)
    p2a, _ = step(p1, s1)
    p2b, _ = step(p1b, s1b)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-6), p2a, p2b)
