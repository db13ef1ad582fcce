"""Device-side SPC construction: exact parity with the host builders."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops.spc.device import (morton_i32, points_to_octree_device,
                                       pack_octree_host, mesh_to_spc_device)
from kaolin_tpu.ops.spc.points import (points_to_morton,
                                       unbatched_points_to_octree)
from kaolin_tpu.ops.conversions.trianglemesh import (
    unbatched_mesh_to_spc, unbatched_mesh_to_spc_device)


def test_morton_i32_matches_host():
    rng = np.random.RandomState(0)
    pts = rng.randint(0, 1024, (1000, 3))
    m_host = np.asarray(points_to_morton(pts)).astype(np.int64)
    m_dev = np.asarray(morton_i32(jnp.asarray(pts, jnp.int32)))
    np.testing.assert_array_equal(m_dev.astype(np.int64), m_host)


@pytest.mark.parametrize('level', [2, 4, 7])
def test_points_to_octree_device_parity(level):
    rng = np.random.RandomState(level)
    n = 500
    pts = rng.randint(0, 2 ** level, (n, 3))
    octree_h = np.asarray(unbatched_points_to_octree(pts, level))
    cap = 1024
    padded = np.zeros((cap, 3), np.int32)
    padded[:n] = pts
    valid = np.zeros(cap, bool)
    valid[:n] = True
    octree_p, counts, nbytes, leaf_m, leaf_n = points_to_octree_device(
        jnp.asarray(padded), jnp.asarray(valid), level, cap=cap)
    octree_d = pack_octree_host(octree_p, counts, cap)
    np.testing.assert_array_equal(octree_d, octree_h)
    assert int(nbytes) == octree_h.shape[0]
    # leaf morton = sorted unique morton codes ((hi, lo) word pairs)
    expected = np.unique(np.asarray(points_to_morton(pts)))
    lm = np.asarray(leaf_m)[:int(leaf_n)].astype(np.int64)
    combined = (lm[:, 0] << 30) | lm[:, 1]
    np.testing.assert_array_equal(combined, expected)


def _octa_mesh():
    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                      [0, 0, 1], [0, 0, -1]], np.float32) * 0.7
    faces = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    return verts[faces]


@pytest.mark.parametrize('level', [3, 5])
def test_mesh_to_spc_device_parity(level):
    fv = _octa_mesh()
    octree_h, pts_h, tri_h, bary_h = unbatched_mesh_to_spc(
        fv.astype(np.float64), level)
    octree_d, pts_d, tri_d, bary_d = unbatched_mesh_to_spc_device(
        fv, level, cap=2 ** 14)
    np.testing.assert_array_equal(np.asarray(octree_d),
                                  np.asarray(octree_h))
    np.testing.assert_array_equal(np.asarray(pts_d), np.asarray(pts_h))
    np.testing.assert_array_equal(np.asarray(tri_d), np.asarray(tri_h))
    np.testing.assert_allclose(np.asarray(bary_d), np.asarray(bary_h),
                               atol=1e-4)


def test_mesh_to_spc_device_raytraceable():
    """End-to-end: device-built octree feeds the raytracer."""
    from kaolin_tpu.ops.spc.spc import scan_octrees, generate_points
    from kaolin_tpu.render.spc.raytrace import unbatched_raytrace
    level = 4
    fv = _octa_mesh()
    octree, pts, tri, bary = unbatched_mesh_to_spc_device(fv, level,
                                                          cap=2 ** 12)
    max_level, pyramids, exsum = scan_octrees(
        octree, np.array([octree.shape[0]]))
    assert max_level == level
    ph = generate_points(octree, pyramids, exsum)
    n = 64
    origin = np.zeros((n, 3), np.float32)
    origin[:, 2] = -2.5
    origin[:, 0] = np.linspace(-0.6, 0.6, n)
    direction = np.zeros((n, 3), np.float32)
    direction[:, 2] = 1.
    ridx, pidx, depth = unbatched_raytrace(
        octree, ph, pyramids[0], exsum, jnp.asarray(origin),
        jnp.asarray(direction), level)
    assert int((np.asarray(ridx) >= 0).sum()) > 0


@pytest.mark.parametrize('level', [11, 12])
def test_points_to_octree_device_above_level10(level):
    """Two-word morton lifts the old level-10 limit (reference supports
    15, spc_math.h:37)."""
    rng = np.random.RandomState(level)
    n = 300
    pts = rng.randint(0, 2 ** level, (n, 3))
    octree_h = np.asarray(unbatched_points_to_octree(pts, level))
    cap = 512
    padded = np.zeros((cap, 3), np.int32)
    padded[:n] = pts
    valid = np.zeros(cap, bool)
    valid[:n] = True
    octree_p, counts, nbytes, leaf_m, leaf_n = points_to_octree_device(
        jnp.asarray(padded), jnp.asarray(valid), level, cap=cap)
    octree_d = pack_octree_host(octree_p, counts, cap)
    np.testing.assert_array_equal(octree_d, octree_h)
    expected = np.unique(np.asarray(points_to_morton(pts)))
    lm = np.asarray(leaf_m)[:int(leaf_n)].astype(np.int64)
    np.testing.assert_array_equal((lm[:, 0] << 30) | lm[:, 1], expected)


def test_mesh_to_spc_device_parity_level12():
    """A small triangle voxelized at level 12: device == host."""
    fv = np.array([[[0.01, 0.0, 0.0],
                    [0.0, 0.012, 0.0],
                    [0.0, 0.0, 0.009]]], np.float32)
    octree_h, pts_h, tri_h, bary_h = unbatched_mesh_to_spc(
        fv.astype(np.float64), 12)
    octree_d, pts_d, tri_d, bary_d = unbatched_mesh_to_spc_device(
        fv, 12, cap=2 ** 14)
    np.testing.assert_array_equal(np.asarray(octree_d),
                                  np.asarray(octree_h))
    np.testing.assert_array_equal(np.asarray(pts_d), np.asarray(pts_h))
    np.testing.assert_array_equal(np.asarray(tri_d), np.asarray(tri_h))
    np.testing.assert_allclose(np.asarray(bary_d), np.asarray(bary_h),
                               atol=1e-3)
