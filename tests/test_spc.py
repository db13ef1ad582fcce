import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops import spc
from kaolin_tpu.utils import testing


def build(points, level):
    points = np.asarray(points, dtype=np.int16)
    octree = spc.unbatched_points_to_octree(points, level)
    lengths = np.array([len(octree)], dtype=np.int32)
    max_level, pyramids, exsum = spc.scan_octrees(octree, lengths)
    ph = spc.generate_points(octree, pyramids, exsum)
    return octree, lengths, max_level, pyramids, exsum, ph


def test_octree_reference_doctest():
    # kaolin/ops/spc/spc.py:252 doctest
    octree, lengths, max_level, pyramids, exsum, ph = build(
        [[3, 2, 0], [3, 1, 1], [3, 3, 3]], 2)
    assert max_level == 2
    q = spc.unbatched_query(octree, exsum,
                            jnp.array([[3, 2, 0]], dtype=jnp.int16), 2)
    assert np.asarray(q).tolist() == [5]
    qp = spc.unbatched_query(octree, exsum,
                             jnp.array([[3, 2, 0]], dtype=jnp.int16), 2,
                             with_parents=True)
    assert np.asarray(qp).tolist() == [[0, 2, 5]]


def test_octree_roundtrip_random():
    rng = np.random.default_rng(0)
    level = 4
    pts = np.unique(rng.integers(0, 2 ** level, (100, 3)), axis=0)
    octree, lengths, max_level, pyramids, exsum, ph = build(pts, level)
    assert max_level == level
    testing.check_spc_octrees(np.asarray(octree), lengths,
                              batch_size=1, level=level)
    # points at the deepest level = input points sorted by morton
    leaf = spc.unbatched_get_level_points(ph, np.asarray(pyramids)[0], level)
    morton_in = np.sort(spc.points_to_morton(pts))
    morton_out = spc.points_to_morton(np.asarray(leaf))
    np.testing.assert_array_equal(morton_out, morton_in)
    # every input point is found by query, and queries outside return -1
    q = spc.unbatched_query(octree, exsum,
                            jnp.asarray(pts.astype(np.int16)), level)
    qpts = np.asarray(ph)[np.asarray(q)]
    np.testing.assert_array_equal(qpts, pts)
    all_coords = np.stack(np.meshgrid(*[np.arange(2 ** level)] * 3,
                                      indexing='ij'), axis=-1).reshape(-1, 3)
    occupied = set(map(tuple, pts.tolist()))
    q_all = np.asarray(spc.unbatched_query(
        octree, exsum, jnp.asarray(all_coords.astype(np.int16)), level))
    hits = q_all >= 0
    expected_hits = np.array([tuple(c) in occupied for c in all_coords])
    np.testing.assert_array_equal(hits, expected_hits)


def test_morton_roundtrip():
    rng = np.random.default_rng(1)
    pts = rng.integers(0, 2 ** 15, (1000, 3)).astype(np.int64)
    m = spc.points_to_morton(pts)
    back = spc.morton_to_points(m)
    np.testing.assert_array_equal(back, pts)


def test_points_to_corners_reference():
    pts = jnp.array([[0, 0, 0], [0, 2, 0]], dtype=jnp.int16)
    corners = np.asarray(spc.points_to_corners(pts))
    expected0 = [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
                 [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]]
    np.testing.assert_array_equal(corners[0], expected0)
    np.testing.assert_array_equal(corners[1][0], [0, 2, 0])


def test_dual_and_trinkets_doctest():
    octree, lengths, max_level, pyramids, exsum, ph = build(
        [[0, 0, 0], [0, 0, 1], [0, 1, 0]], 1)
    phd, pyr_d = spc.unbatched_make_dual(ph, np.asarray(pyramids)[0])
    l0 = np.asarray(spc.unbatched_get_level_points(phd, pyr_d, 0))
    expected = [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
                [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]]
    np.testing.assert_array_equal(l0, expected)
    l1 = np.asarray(spc.unbatched_get_level_points(phd, pyr_d, 1))
    expected1 = expected + [[0, 0, 2], [0, 1, 2], [1, 0, 2], [1, 1, 2],
                            [0, 2, 0], [0, 2, 1], [1, 2, 0], [1, 2, 1]]
    np.testing.assert_array_equal(l1, expected1)
    trinkets, parents = spc.unbatched_make_trinkets(
        ph, np.asarray(pyramids)[0], phd, pyr_d)
    assert np.asarray(trinkets).shape == (4, 8)
    np.testing.assert_array_equal(np.asarray(parents), [-1, 0, 0, 0])


def test_trilinear_interpolation_linear_field():
    # a linear function f(x,y,z)=x+2y+3z on corners is reproduced exactly
    level = 2
    pts = np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing='ij'),
                   axis=-1).reshape(-1, 3)
    octree, lengths, max_level, pyramids, exsum, ph = build(pts, level)
    pyr = np.asarray(pyramids)[0]
    phd, pyr_d = spc.unbatched_make_dual(ph, pyr)
    trinkets, _ = spc.unbatched_make_trinkets(ph, pyr, phd, pyr_d)
    dual_start = int(np.asarray(pyr_d)[1, level])
    dual_pts = np.asarray(spc.unbatched_get_level_points(phd, pyr_d, level))
    feats = (dual_pts[:, 0] + 2. * dual_pts[:, 1]
             + 3. * dual_pts[:, 2]).astype(np.float32)[:, None]

    rng = np.random.default_rng(2)
    coords = rng.uniform(-0.99, 0.99, (32, 1, 3)).astype(np.float32)
    pidx = spc.unbatched_query(octree, exsum,
                               jnp.asarray(coords[:, 0]), level)
    # trinkets at the deepest level are level-local; feats indexed locally
    trink_level = np.asarray(trinkets)[
        int(pyr[1, level]):int(pyr[1, level + 1])]
    out = spc.unbatched_interpolate_trilinear(
        jnp.asarray(coords), pidx.astype(jnp.int32) - int(pyr[1, level]),
        jnp.asarray(np.asarray(ph)[int(pyr[1, level]):].astype(np.int32)),
        jnp.asarray(trink_level), jnp.asarray(feats), level)
    grid = (coords[:, 0] * 0.5 + 0.5) * (2 ** level)
    expected = grid[:, 0] + 2 * grid[:, 1] + 3 * grid[:, 2]
    np.testing.assert_allclose(np.asarray(out)[:, 0, 0], expected,
                               rtol=1e-4, atol=1e-4)


def test_trilinear_gradients():
    level = 1
    pts = np.stack(np.meshgrid(*[np.arange(2)] * 3, indexing='ij'),
                   axis=-1).reshape(-1, 3)
    octree, lengths, max_level, pyramids, exsum, ph = build(pts, level)
    pyr = np.asarray(pyramids)[0]
    phd, pyr_d = spc.unbatched_make_dual(ph, pyr)
    trinkets, _ = spc.unbatched_make_trinkets(ph, pyr, phd, pyr_d)
    num_dual = int(np.asarray(pyr_d)[0, level])
    feats = jnp.asarray(
        np.random.default_rng(3).normal(size=(num_dual, 2)).astype(
            np.float32))
    coords = jnp.array([[[0.1, -0.2, 0.3]]])
    pidx = spc.unbatched_query(octree, exsum, coords[:, 0], level)
    trink_level = jnp.asarray(np.asarray(trinkets)[
        int(pyr[1, level]):int(pyr[1, level + 1])])
    ph_level = jnp.asarray(
        np.asarray(ph)[int(pyr[1, level]):].astype(np.int32))
    local_pidx = pidx.astype(jnp.int32) - int(pyr[1, level])

    def f(c, fe):
        return jnp.sum(spc.unbatched_interpolate_trilinear(
            c, local_pidx, ph_level, trink_level, fe, level) ** 2)

    gc, gf = jax.grad(f, argnums=(0, 1))(coords, feats)
    assert np.isfinite(np.asarray(gc)).all()
    assert np.abs(np.asarray(gf)).sum() > 0
    # finite difference on coords
    eps = 1e-3
    for d in range(3):
        dv = np.zeros(coords.shape, np.float32)
        dv[0, 0, d] = eps
        fd = (float(f(coords + dv, feats)) - float(f(coords - dv, feats))
              ) / (2 * eps)
        np.testing.assert_allclose(fd, np.asarray(gc)[0, 0, d], rtol=2e-2,
                                   atol=1e-3)


def test_to_dense_roundtrip():
    level = 2
    rng = np.random.default_rng(4)
    pts = np.unique(rng.integers(0, 4, (20, 3)), axis=0)
    octree, lengths, max_level, pyramids, exsum, ph = build(pts, level)
    pyr = np.asarray(pyramids)[0]
    n = int(pyr[0, level])
    feats = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    dense = spc.to_dense(ph, pyramids, feats, level)
    assert dense.shape == (1, 3, 4, 4, 4)
    leaf = np.asarray(spc.unbatched_get_level_points(ph, pyr, level))
    got = np.asarray(dense)[0, :, leaf[:, 0], leaf[:, 1], leaf[:, 2]]
    np.testing.assert_allclose(got, np.asarray(feats), rtol=1e-6)
    # everywhere else is zero
    total = np.abs(np.asarray(dense)).sum()
    np.testing.assert_allclose(total, np.abs(np.asarray(feats)).sum(),
                               rtol=1e-5)


def test_feature_grids_to_spc_roundtrip():
    rng = np.random.default_rng(5)
    grid = np.zeros((1, 2, 4, 4, 4), np.float32)
    mask = rng.uniform(size=(4, 4, 4)) < 0.3
    grid[0, :, mask] = rng.normal(size=(int(mask.sum()), 2))
    octrees, lengths, feats = spc.feature_grids_to_spc(jnp.asarray(grid))
    max_level, pyramids, exsum = spc.scan_octrees(octrees, lengths)
    ph = spc.generate_points(octrees, pyramids, exsum)
    dense = spc.to_dense(ph, pyramids, feats, max_level)
    np.testing.assert_allclose(np.asarray(dense), grid, rtol=1e-6)


def test_uint8_bit_ops():
    from kaolin_tpu.ops.spc import uint8_to_bits, bits_to_uint8, \
        uint8_bits_sum
    vals = jnp.arange(256, dtype=jnp.uint8)
    bits = uint8_to_bits(vals)
    back = bits_to_uint8(bits)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))
    sums = uint8_bits_sum(vals)
    expected = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                             axis=1).sum(1)
    np.testing.assert_array_equal(np.asarray(sums), expected)


def test_create_dense_spc():
    octree, lengths = spc.create_dense_spc(2)
    max_level, pyramids, exsum = spc.scan_octrees(octree, lengths)
    assert max_level == 2
    assert int(np.asarray(pyramids)[0, 0, 2]) == 64
