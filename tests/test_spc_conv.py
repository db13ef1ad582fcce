import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops import spc as spc_ops


def dense_spc(level):
    octree, lengths = spc_ops.create_dense_spc(level)
    max_level, pyramids, exsum = spc_ops.scan_octrees(octree, lengths)
    ph = spc_ops.generate_points(octree, pyramids, exsum)
    return octree, lengths, pyramids, exsum, ph


def kernel_vectors_3x3x3():
    offs = np.stack(np.meshgrid(*[np.arange(-1, 2)] * 3, indexing='ij'),
                    axis=-1).reshape(-1, 3)
    return offs.astype(np.int16)


def test_conv3d_matches_dense_conv():
    level = 3
    res = 2 ** level
    rng = np.random.default_rng(0)
    octree, lengths, pyramids, exsum, ph = dense_spc(level)
    pyr = np.asarray(pyramids)[0]
    n = int(pyr[0, level])
    Cin, Cout = 4, 5
    feats = rng.normal(size=(n, Cin)).astype(np.float32)
    kv = kernel_vectors_3x3x3()
    weight = rng.normal(size=(27, Cin, Cout)).astype(np.float32)

    out, out_level = spc_ops.conv3d(
        octree, ph, level, pyramids, exsum, jnp.asarray(feats),
        jnp.asarray(weight), kv, jump=0)
    assert out_level == level
    # dense reference: scatter features to grid, direct convolution
    pts = np.asarray(spc_ops.unbatched_get_level_points(ph, pyr, level))
    grid = np.zeros((res, res, res, Cin), np.float32)
    grid[pts[:, 0], pts[:, 1], pts[:, 2]] = feats
    expected = np.zeros((n, Cout), np.float32)
    for k, (dx, dy, dz) in enumerate(kv):
        for i, (x, y, z) in enumerate(pts):
            xx, yy, zz = x + dx, y + dy, z + dz
            if 0 <= xx < res and 0 <= yy < res and 0 <= zz < res:
                expected[i] += grid[xx, yy, zz] @ weight[k]
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3,
                               atol=1e-3)


def test_conv3d_1x1_fast_path():
    level = 2
    octree, lengths, pyramids, exsum, ph = dense_spc(level)
    n = int(np.asarray(pyramids)[0, 0, level])
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    weight = jnp.asarray(rng.normal(size=(1, 3, 7)).astype(np.float32))
    kv = np.zeros((1, 3), np.int16)
    out, out_level = spc_ops.conv3d(octree, ph, level, pyramids, exsum,
                                    feats, weight, kv)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(feats @ weight[0]), rtol=1e-5)


def test_conv3d_jump_downsample():
    level = 3
    octree, lengths, pyramids, exsum, ph = dense_spc(level)
    pyr = np.asarray(pyramids)[0]
    n = int(pyr[0, level])
    n_out = int(pyr[0, level - 1])
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    # 2x2x2 kernel = average pooling-style downsample
    offs = np.stack(np.meshgrid(*[np.arange(2)] * 3, indexing='ij'),
                    axis=-1).reshape(-1, 3).astype(np.int16)
    weight = jnp.asarray(
        np.tile(np.eye(2, dtype=np.float32)[None] / 8., (8, 1, 1)))
    out, out_level = spc_ops.conv3d(octree, ph, level, pyramids, exsum,
                                    feats, weight, offs, jump=1)
    assert out_level == level - 1
    assert out.shape == (n_out, 2)
    # equals mean of the 8 children
    pts_out = np.asarray(spc_ops.unbatched_get_level_points(
        ph, pyr, level - 1))
    pts_in = np.asarray(spc_ops.unbatched_get_level_points(ph, pyr, level))
    lut = {tuple(p): i for i, p in enumerate(pts_in.tolist())}
    feats_np = np.asarray(feats)
    for i, p in enumerate(pts_out.tolist()):
        kids = [lut[(2 * p[0] + a, 2 * p[1] + b, 2 * p[2] + c)]
                for a in range(2) for b in range(2) for c in range(2)]
        expected = feats_np[kids].mean(axis=0)
        np.testing.assert_allclose(np.asarray(out)[i], expected, rtol=1e-4,
                                   atol=1e-5)


def test_conv_transpose3d_inverts_jump():
    level = 2
    octree, lengths, pyramids, exsum, ph = dense_spc(level)
    pyr = np.asarray(pyramids)[0]
    n_coarse = int(pyr[0, level - 1])
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(n_coarse, 2)).astype(np.float32))
    # nearest-neighbor upsample: 2x2x2 identity taps
    offs = np.stack(np.meshgrid(*[np.arange(2)] * 3, indexing='ij'),
                    axis=-1).reshape(-1, 3).astype(np.int16)
    weight = jnp.asarray(
        np.tile(np.eye(2, dtype=np.float32)[None], (8, 1, 1)))
    out, out_level = spc_ops.conv_transpose3d(
        octree, ph, level - 1, pyramids, exsum, feats, weight, offs, jump=1)
    assert out_level == level
    pts_out = np.asarray(spc_ops.unbatched_get_level_points(ph, pyr, level))
    pts_in = np.asarray(spc_ops.unbatched_get_level_points(
        ph, pyr, level - 1))
    lut = {tuple(p): i for i, p in enumerate(pts_in.tolist())}
    feats_np = np.asarray(feats)
    for i, p in enumerate(pts_out.tolist()):
        parent = lut[(p[0] // 2, p[1] // 2, p[2] // 2)]
        np.testing.assert_allclose(np.asarray(out)[i], feats_np[parent],
                                   rtol=1e-4, atol=1e-5)


def test_conv3d_gradients():
    level = 2
    octree, lengths, pyramids, exsum, ph = dense_spc(level)
    n = int(np.asarray(pyramids)[0, 0, level])
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32))
    kv = kernel_vectors_3x3x3()
    weight = jnp.asarray(rng.normal(size=(27, 2, 3)).astype(np.float32))

    def loss(x, w):
        out, _ = spc_ops.conv3d(octree, ph, level, pyramids, exsum, x, w,
                                kv)
        return jnp.sum(out ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(feats, weight)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.abs(np.asarray(gw)).sum() > 0


def test_conv3d_flax_module():
    level = 2
    octree, lengths, pyramids, exsum, ph = dense_spc(level)
    n = int(np.asarray(pyramids)[0, 0, level])
    feats = jnp.ones((n, 3))
    kv = tuple(map(tuple, kernel_vectors_3x3x3().tolist()))
    module = spc_ops.Conv3d(in_channels=3, out_channels=8,
                            kernel_vectors=kv)
    params = module.init(jax.random.key(0), octree, ph, level, pyramids,
                         exsum, feats)
    (out, out_level) = module.apply(params, octree, ph, level, pyramids,
                                    exsum, feats)
    assert out.shape == (n, 8)
