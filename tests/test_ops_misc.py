"""Tests for voxelgrid ops, check_sign, gcn, pointcloud, coords, random.

Naive cross-checks in the reference's test style (SURVEY.md §4.1) for the
subsystems that previously shipped untested.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops import voxelgrid as vg
from kaolin_tpu.ops import pointcloud as pc_ops
from kaolin_tpu.ops import coords as coords_ops
from kaolin_tpu.ops import gcn
from kaolin_tpu.ops import random as krandom
from kaolin_tpu.ops.mesh.check_sign import check_sign as check_sign_fn


# ---------------------------------------------------------------------------
# voxelgrid ops

@pytest.fixture
def sphere_grid():
    """A solid 16^3 ball."""
    idx = np.arange(16) - 7.5
    x, y, z = np.meshgrid(idx, idx, idx, indexing='ij')
    return jnp.asarray(((x ** 2 + y ** 2 + z ** 2) <= 36.)[None]
                       .astype(np.float32))


def test_downsample_averages_blocks(sphere_grid):
    out = vg.downsample(sphere_grid, 2)
    assert out.shape == (1, 8, 8, 8)
    g = np.asarray(sphere_grid[0])
    expected = g.reshape(8, 2, 8, 2, 8, 2).mean(axis=(1, 3, 5))
    np.testing.assert_allclose(np.asarray(out[0]), expected, rtol=1e-6)


def test_downsample_anisotropic(sphere_grid):
    out = vg.downsample(sphere_grid, [4, 2, 1])
    assert out.shape == (1, 4, 8, 16)


def test_downsample_validates():
    with pytest.raises(ValueError):
        vg.downsample(jnp.zeros((4, 4, 4)), 2)
    with pytest.raises(ValueError):
        vg.downsample(jnp.zeros((1, 4, 4, 4)), [0, 1, 1])
    with pytest.raises(ValueError):
        vg.downsample(jnp.zeros((1, 4, 4, 4)), [8, 1, 1])


def _naive_surface(g):
    """A voxel is interior iff all 26 (+self) neighbors are occupied."""
    G = np.asarray(g).astype(bool)
    padded = np.pad(G, 1)
    out = np.zeros_like(G)
    X, Y, Z = G.shape
    for i in range(X):
        for j in range(Y):
            for k in range(Z):
                if not G[i, j, k]:
                    continue
                block = padded[i:i + 3, j:j + 3, k:k + 3]
                out[i, j, k] = not block.all()
    return out


def test_extract_surface_wide_matches_naive(sphere_grid):
    out = vg.extract_surface(sphere_grid, mode='wide')
    np.testing.assert_array_equal(np.asarray(out[0]),
                                  _naive_surface(sphere_grid[0]))


def test_extract_surface_thin_subset_of_wide(sphere_grid):
    thin = np.asarray(vg.extract_surface(sphere_grid, mode='thin')[0])
    wide = np.asarray(vg.extract_surface(sphere_grid, mode='wide')[0])
    assert (thin & ~wide).sum() == 0          # thin ⊆ wide
    assert thin.sum() <= wide.sum()


def test_extract_surface_validates(sphere_grid):
    with pytest.raises(ValueError):
        vg.extract_surface(sphere_grid[0])
    with pytest.raises(ValueError):
        vg.extract_surface(sphere_grid, mode='bogus')


def test_fill_closes_hollow_shell(sphere_grid):
    shell = vg.extract_surface(sphere_grid, mode='wide')
    filled = vg.fill(shell)
    np.testing.assert_array_equal(np.asarray(filled),
                                  np.asarray(sphere_grid).astype(bool))


def test_extract_odms_simple():
    g = jnp.zeros((1, 4, 4, 4)).at[0, 1, 2, 3].set(1.)
    odms = np.asarray(vg.extract_odms(g))
    assert odms.shape == (1, 6, 4, 4)
    # single voxel at (x=1, y=2, z=3): the two z views see depths 0 and 3
    assert odms[0, 0, 1, 2] == 0 and odms[0, 1, 1, 2] == 3
    # y views at (x=1, z=3): depths 1 and 2; x views at (y=2, z=3)
    assert odms[0, 2, 1, 3] == 1 and odms[0, 3, 1, 3] == 2
    assert odms[0, 4, 2, 3] == 2 and odms[0, 5, 2, 3] == 1
    # empty columns report dim (=4)
    assert odms[0, 0, 0, 0] == 4


def test_project_odms_roundtrip(sphere_grid):
    """Carving an empty grid with the ball's ODMs reproduces its visual
    hull; for a convex solid that equals the ball itself."""
    odms = vg.extract_odms(sphere_grid)
    carved = vg.project_odms(odms)
    np.testing.assert_array_equal(np.asarray(carved),
                                  np.asarray(sphere_grid).astype(bool))


def test_project_odms_votes(sphere_grid):
    odms = vg.extract_odms(sphere_grid)
    # votes=6: keep voxels that at least one view keeps -> superset
    carved1 = np.asarray(vg.project_odms(odms, votes=1))
    carved6 = np.asarray(vg.project_odms(odms, votes=6))
    assert (carved1 & ~carved6).sum() == 0


def test_project_odms_validates():
    with pytest.raises(ValueError):
        vg.project_odms(jnp.zeros((1, 5, 4, 4)))
    with pytest.raises(ValueError):
        vg.project_odms(jnp.zeros((1, 6, 4, 4)),
                        jnp.zeros((2, 4, 4, 4)))


# ---------------------------------------------------------------------------
# check_sign

def _icosphere(subdiv=2):
    from kaolin_tpu.ops.mesh.trianglemesh import subdivide_trianglemesh
    t = (1. + np.sqrt(5.)) / 2.
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float32)
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
    v, f = jnp.asarray(verts[None]), jnp.asarray(faces)
    for _ in range(subdiv):
        v, f = subdivide_trianglemesh(v, f, 1)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v, f


def test_check_sign_sphere():
    verts, faces = _icosphere()
    rng = np.random.RandomState(0)
    pts = rng.randn(1, 200, 3).astype(np.float32) * 0.7
    inside = check_sign_fn(verts, faces, jnp.asarray(pts))
    r = np.linalg.norm(pts[0], axis=-1)
    # icosphere(2) radius deviates from 1 by <2%; skip the boundary band
    clear = (r < 0.95) | (r > 1.05)
    np.testing.assert_array_equal(np.asarray(inside[0])[clear],
                                  (r < 1.)[clear])


def test_check_sign_batch_broadcast_faces():
    verts, faces = _icosphere(subdiv=1)
    verts2 = jnp.concatenate([verts, verts * 0.5])
    pts = jnp.asarray(np.random.RandomState(1)
                      .randn(2, 64, 3).astype(np.float32) * 0.6)
    inside = check_sign_fn(verts2, faces, pts)
    r = np.linalg.norm(np.asarray(pts), axis=-1)
    # icosphere(1) radius deviates up to ~5%: skip the boundary bands
    clear0 = (r[0] < 0.92) | (r[0] > 1.08)
    clear1 = (r[1] < 0.46) | (r[1] > 0.54)
    np.testing.assert_array_equal(np.asarray(inside[0])[clear0],
                                  (r[0] < 1.)[clear0])
    np.testing.assert_array_equal(np.asarray(inside[1])[clear1],
                                  (r[1] < 0.5)[clear1])


def test_check_sign_box_analytic():
    # axis-aligned unit cube as 12 triangles
    from itertools import product
    corners = np.array(list(product([0., 1.], repeat=3)), np.float32)
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    # points chosen off the cube's face diagonals (the parity ray is
    # degenerate exactly on edges, as in the reference's ray casting)
    pts = jnp.asarray([[[0.47, 0.52, 0.58], [1.5, 0.52, 0.58],
                        [0.25, 0.93, 0.11], [-0.01, 0.52, 0.58]]])
    inside = check_sign_fn(jnp.asarray(corners[None]),
                           jnp.asarray(faces), pts)
    assert list(np.asarray(inside[0])) == [True, False, True, False]


# ---------------------------------------------------------------------------
# gcn

def test_normalize_adj_row_stochastic():
    adj = jnp.asarray(np.array([[0, 1, 1], [1, 0, 0], [1, 0, 0]],
                               np.float32))
    norm = gcn.normalize_adj(adj)
    np.testing.assert_allclose(np.asarray(norm).sum(-1), 1., rtol=1e-5)


def test_sparse_bmm_matches_dense():
    rng = np.random.RandomState(2)
    dense = (rng.rand(5, 5) < 0.4).astype(np.float32) * rng.rand(5, 5)
    batch = rng.randn(2, 5, 7).astype(np.float32)
    from jax.experimental import sparse as jsparse
    sp = jsparse.BCOO.fromdense(jnp.asarray(dense))
    out = gcn.sparse_bmm(sp, jnp.asarray(batch))
    np.testing.assert_allclose(np.asarray(out), dense @ batch, rtol=1e-5,
                               atol=1e-6)


def test_graph_conv_forward():
    rng = np.random.RandomState(3)
    conv = gcn.GraphConv(output_dim=8)
    feat = jnp.asarray(rng.randn(2, 6, 4).astype(np.float32))
    adj = jnp.asarray((rng.rand(6, 6) < 0.5).astype(np.float32))
    params = conv.init(jax.random.key(0), feat, adj)
    out = conv.apply(params, feat, adj)
    assert out.shape == (2, 6, 8)
    out0 = conv.apply(params, feat, jnp.zeros((6, 6)),
                      normalize_adj=False)
    assert out0.shape == (2, 6, 8)


# ---------------------------------------------------------------------------
# pointcloud / coords / random

def test_center_points():
    rng = np.random.RandomState(4)
    pts = jnp.asarray(rng.rand(3, 50, 3).astype(np.float32) * 7. + 2.)
    out = pc_ops.center_points(pts)
    mx = np.asarray(out).max(1)
    mn = np.asarray(out).min(1)
    np.testing.assert_allclose(mx + mn, 0., atol=1e-5)


def test_center_points_normalize():
    rng = np.random.RandomState(5)
    pts = jnp.asarray(rng.rand(2, 30, 3).astype(np.float32) * 11.)
    out = np.asarray(pc_ops.center_points(pts, normalize=True))
    assert out.max() <= 0.5 + 1e-5 and out.min() >= -0.5 - 1e-5
    # the largest extent maps exactly to [-0.5, 0.5]
    widths = out.max(1) - out.min(1)
    np.testing.assert_allclose(widths.max(-1), 1., rtol=1e-5)


def test_center_points_validates():
    with pytest.raises(ValueError):
        pc_ops.center_points(jnp.zeros((5, 3)))


def test_spherical_cartesian_roundtrip():
    rng = np.random.RandomState(6)
    az = jnp.asarray(rng.uniform(-np.pi, np.pi, 32).astype(np.float32))
    el = jnp.asarray(rng.uniform(-np.pi / 2 + 0.01, np.pi / 2 - 0.01, 32)
                     .astype(np.float32))
    dist = jnp.asarray(rng.uniform(0.5, 3., 32).astype(np.float32))
    x, y, z = coords_ops.spherical2cartesian(az, el, dist)
    az2, el2, d2 = coords_ops.cartesian2spherical(x, y, z)
    np.testing.assert_allclose(np.asarray(az2), np.asarray(az), atol=1e-4)
    np.testing.assert_allclose(np.asarray(el2), np.asarray(el), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(dist), rtol=1e-4)


def test_random_spc_octrees_valid():
    from kaolin_tpu.utils.testing import check_spc_octrees
    krandom.manual_seed(0)
    octrees, lengths = krandom.random_spc_octrees(3, 3)
    assert check_spc_octrees(octrees, lengths, batch_size=3)


def test_random_seed_reproducible():
    krandom.manual_seed(7)
    a = krandom.random_tensor(0., 1., (4, 4))
    krandom.manual_seed(7)
    b = krandom.random_tensor(0., 1., (4, 4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_spherical_coords_ranges():
    krandom.manual_seed(1)
    az, el = krandom.sample_spherical_coords(
        (2, 16), azimuth_low=0., azimuth_high=np.pi,
        elevation_low=0., elevation_high=np.pi / 4)
    a = np.asarray(az)
    e = np.asarray(el)
    assert a.shape == (2, 16) and e.shape == (2, 16)
    assert (a >= 0).all() and (a <= np.pi).all()
    assert (e >= 0).all() and (e <= np.pi / 4).all()
