"""Tests for kaolin_tpu.metrics: naive cross-checks + analytic cases.

Mirrors the reference test strategy (SURVEY.md §4.1): every fused/chunked
metric is compared against an independently written brute-force
implementation, plus closed-form cases.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.metrics import pointcloud as pc_metrics
from kaolin_tpu.metrics import trianglemesh as tm_metrics
from kaolin_tpu.metrics import tetmesh as tet_metrics
from kaolin_tpu.metrics import voxelgrid as vg_metrics
from kaolin_tpu.metrics import render as render_metrics


# ---------------------------------------------------------------------------
# pointcloud

def _naive_sided(p1, p2):
    """O(P1*P2) reference: squared dist + index of closest point."""
    d = ((p1[:, None, :] - p2[None, :, :]) ** 2).sum(-1)
    return d.min(1), d.argmin(1)


@pytest.fixture
def clouds():
    rng = np.random.RandomState(0)
    p1 = jnp.asarray(rng.randn(2, 57, 3).astype(np.float32))
    p2 = jnp.asarray(rng.randn(2, 83, 3).astype(np.float32))
    return p1, p2


def test_sided_distance_matches_naive(clouds):
    p1, p2 = clouds
    dist, idx = pc_metrics.sided_distance(p1, p2, chunk_size=16)
    for b in range(p1.shape[0]):
        nd, ni = _naive_sided(np.asarray(p1[b]), np.asarray(p2[b]))
        np.testing.assert_allclose(np.asarray(dist[b]), nd, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx[b]), ni)


def test_sided_distance_zero_for_identical(clouds):
    p1, _ = clouds
    dist, idx = pc_metrics.sided_distance(p1, p1)
    np.testing.assert_allclose(np.asarray(dist), 0., atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx),
                                  np.tile(np.arange(p1.shape[1]), (2, 1)))


def test_sided_distance_rejects_bad_rank(clouds):
    p1, p2 = clouds
    with pytest.raises(ValueError):
        pc_metrics.sided_distance(p1[0], p2)


def test_sided_distance_gradient_flows_to_both(clouds):
    p1, p2 = clouds

    def loss(a, b):
        return jnp.sum(pc_metrics.sided_distance(a, b)[0])

    g1, g2 = jax.grad(loss, argnums=(0, 1))(p1, p2)
    # analytic: d/dp1 sum||p1 - closest||^2 = 2 (p1 - closest)
    _, idx = pc_metrics.sided_distance(p1, p2)
    closest = jnp.take_along_axis(p2, idx[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(g1),
                               np.asarray(2. * (p1 - closest)), rtol=1e-5)
    assert float(jnp.abs(g2).sum()) > 0.


def test_chamfer_distance_matches_naive(clouds):
    p1, p2 = clouds
    cd = pc_metrics.chamfer_distance(p1, p2, w1=0.7, w2=1.3)
    for b in range(2):
        d12, _ = _naive_sided(np.asarray(p1[b]), np.asarray(p2[b]))
        d21, _ = _naive_sided(np.asarray(p2[b]), np.asarray(p1[b]))
        expected = 0.7 * d12.mean() + 1.3 * d21.mean()
        np.testing.assert_allclose(float(cd[b]), expected, rtol=1e-5)


def test_chamfer_distance_not_squared(clouds):
    p1, p2 = clouds
    cd = pc_metrics.chamfer_distance(p1, p2, squared=False)
    d12, _ = _naive_sided(np.asarray(p1[0]), np.asarray(p2[0]))
    d21, _ = _naive_sided(np.asarray(p2[0]), np.asarray(p1[0]))
    expected = np.sqrt(d12).mean() + np.sqrt(d21).mean()
    np.testing.assert_allclose(float(cd[0]), expected, rtol=1e-5)


def test_f_score_perfect_and_miss():
    pts = jnp.asarray(np.random.RandomState(1).rand(1, 40, 3)
                      .astype(np.float32))
    # identical clouds -> f_score ~= 1
    f = pc_metrics.f_score(pts, pts, radius=0.01)
    np.testing.assert_allclose(np.asarray(f), 1., atol=1e-4)
    # far-apart clouds -> f_score = 0 (nan-free)
    f0 = pc_metrics.f_score(pts, pts + 10., radius=0.01)
    np.testing.assert_allclose(np.asarray(f0), 0., atol=1e-6)


def test_f_score_matches_manual():
    rng = np.random.RandomState(2)
    gt = rng.rand(1, 30, 3).astype(np.float32)
    pred = gt + rng.randn(1, 30, 3).astype(np.float32) * 0.05
    radius = 0.05
    f = float(pc_metrics.f_score(jnp.asarray(gt), jnp.asarray(pred),
                                 radius=radius)[0])
    d_pred, _ = _naive_sided(gt[0], pred[0])
    d_gt, _ = _naive_sided(pred[0], gt[0])
    fn = (np.sqrt(d_pred) > radius).sum()
    fp = (np.sqrt(d_gt) > radius).sum()
    tp = gt.shape[1] - fp
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    expected = 2 * precision * recall / (precision + recall + 1e-8)
    np.testing.assert_allclose(f, expected, rtol=1e-4)


# ---------------------------------------------------------------------------
# trianglemesh

def _naive_point_to_tri(p, v1, v2, v3, samples=200000):
    """Distance lower-bounded via dense barycentric sampling (independent
    of the library's edge/vertex classification)."""
    rng = np.random.RandomState(3)
    r1 = rng.rand(samples, 1)
    r2 = rng.rand(samples, 1)
    flip = (r1 + r2) > 1.
    r1 = np.where(flip, 1. - r1, r1)
    r2 = np.where(flip, 1. - r2, r2)
    pts = v1 + r1 * (v2 - v1) + r2 * (v3 - v1)
    return ((pts - p) ** 2).sum(-1).min()


def test_point_to_mesh_distance_matches_sampling():
    rng = np.random.RandomState(4)
    fv = rng.randn(1, 5, 3, 3).astype(np.float32)
    pts = rng.randn(1, 7, 3).astype(np.float32)
    dist, fidx, dtype_ = tm_metrics.point_to_mesh_distance(
        jnp.asarray(pts), jnp.asarray(fv), chunk_size=4)
    for i in range(7):
        best = min(
            _naive_point_to_tri(pts[0, i], fv[0, f, 0], fv[0, f, 1],
                                fv[0, f, 2]) for f in range(5))
        # sampling gives an upper bound on the true distance
        assert float(dist[0, i]) <= best + 1e-4
        assert best <= float(dist[0, i]) * 1.05 + 1e-3


def test_point_to_mesh_distance_on_face_plane():
    # unit right triangle in z=0 plane; point straight above the interior
    fv = jnp.asarray([[[[0., 0., 0.], [4., 0., 0.], [0., 4., 0.]]]])
    pts = jnp.asarray([[[1., 1., 2.], [1., 1., -3.]]])
    dist, fidx, dist_type = tm_metrics.point_to_mesh_distance(pts, fv)
    np.testing.assert_allclose(np.asarray(dist[0]), [4., 9.], rtol=1e-6)
    assert list(np.asarray(dist_type[0])) == [0, 0]  # face-plane type


def test_point_to_mesh_distance_vertex_and_edge_types():
    fv = jnp.asarray([[[[0., 0., 0.], [2., 0., 0.], [0., 2., 0.]]]])
    pts = jnp.asarray([[[-1., -1., 0.],    # closest to vertex 1 (origin)
                        [1., -2., 0.],     # closest to edge v1-v2
                        [3., 0., 0.]]])    # closest to vertex 2
    dist, _, dist_type = tm_metrics.point_to_mesh_distance(pts, fv)
    np.testing.assert_allclose(np.asarray(dist[0]), [2., 4., 1.], rtol=1e-6)
    dt = list(np.asarray(dist_type[0]))
    assert dt[0] == 1 and dt[2] == 2  # vertex types
    assert dt[1] == 4                 # first edge type


def test_point_to_mesh_distance_gradient():
    fv = jnp.asarray([[[[0., 0., 0.], [4., 0., 0.], [0., 4., 0.]]]])
    pts = jnp.asarray([[[1., 1., 2.]]])

    g = jax.grad(lambda p: jnp.sum(
        tm_metrics.point_to_mesh_distance(p, fv)[0]))(pts)
    # d/dz (z^2) = 2z = 4 above the plane; no x/y gradient in the interior
    np.testing.assert_allclose(np.asarray(g[0, 0]), [0., 0., 4.],
                               atol=1e-5)


def test_average_edge_length():
    verts = jnp.asarray([[[0., 0., 0.], [3., 0., 0.], [0., 4., 0.]]])
    faces = jnp.asarray([[0, 1, 2]])
    ael = tm_metrics.average_edge_length(verts, faces)
    np.testing.assert_allclose(float(ael[0, 0]), (3. + 4. + 5.) / 3.,
                               rtol=1e-6)


def test_uniform_laplacian_smoothing_contracts():
    rng = np.random.RandomState(5)
    verts = jnp.asarray(rng.randn(1, 4, 3).astype(np.float32))
    faces = jnp.asarray([[0, 1, 2], [1, 2, 3], [0, 2, 3], [0, 1, 3]])
    out = tm_metrics.uniform_laplacian_smoothing(verts, faces)
    # complete graph: every vertex moves to the mean of the others
    v = np.asarray(verts[0])
    expected = np.stack([(v.sum(0) - v[i]) / 3. for i in range(4)])
    np.testing.assert_allclose(np.asarray(out[0]), expected, rtol=1e-5,
                               atol=1e-6)


# ---------------------------------------------------------------------------
# tetmesh

def _unit_tets():
    # unit right tet (volume 1/6) + a flipped copy (volume -1/6)
    t = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    flipped = t[[1, 0, 2, 3]]
    return jnp.asarray(np.stack([t, flipped])[None])


def test_tetrahedron_volume():
    # reference convention: (A-D).((B-D)x(C-D))/6 gives -1/6 for the
    # canonical unit right tet (kaolin/metrics/tetmesh.py:20)
    vols = tet_metrics.tetrahedron_volume(_unit_tets())
    np.testing.assert_allclose(np.asarray(vols[0]), [-1. / 6., 1. / 6.],
                               rtol=1e-6)


def test_tetrahedron_volume_invariance():
    rng = np.random.RandomState(6)
    tets = rng.randn(1, 10, 4, 3).astype(np.float32)
    v0 = tet_metrics.tetrahedron_volume(jnp.asarray(tets))
    v1 = tet_metrics.tetrahedron_volume(jnp.asarray(tets + 3.))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-4,
                               atol=1e-6)


def test_equivolume_zero_for_equal_volumes():
    t = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tets = jnp.asarray(np.stack([t, t + 5.])[None])
    loss = tet_metrics.equivolume(tets, pow=2)
    np.testing.assert_allclose(np.asarray(loss), 0., atol=1e-10)


def test_equivolume_positive_when_unequal():
    t = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tets = jnp.asarray(np.stack([t, t * 2.])[None])
    loss = tet_metrics.equivolume(tets, pow=2)
    assert float(loss[0, 0]) > 0.


def test_amips_identity_rest_pose():
    from kaolin_tpu.ops.mesh.tetmesh import inverse_vertices_offset
    rng = np.random.RandomState(7)
    tets = jnp.asarray(rng.randn(1, 6, 4, 3).astype(np.float32))
    inv = inverse_vertices_offset(tets)
    energy = tet_metrics.amips(tets, inv)
    # rest pose: jacobian == I for every tet (det = 1 > 0), so the energy
    # is exactly trace(I I^T) / (det I)^(2/3) = 3
    np.testing.assert_allclose(float(energy[0, 0]), 3., rtol=1e-3)


def test_amips_increases_with_distortion():
    from kaolin_tpu.ops.mesh.tetmesh import inverse_vertices_offset
    t = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                 np.float32)[None, None]
    rest = jnp.asarray(t)
    inv = inverse_vertices_offset(rest)
    base = float(tet_metrics.amips(rest, inv)[0, 0])
    squashed = rest * jnp.asarray([1., 1., 0.2])
    assert float(tet_metrics.amips(squashed, inv)[0, 0]) > base


# ---------------------------------------------------------------------------
# voxelgrid / render

def test_voxelgrid_iou_manual():
    a = jnp.zeros((1, 2, 2, 2)).at[0, 0].set(1.)
    b = jnp.zeros((1, 2, 2, 2)).at[0, :, 0].set(1.)
    # intersection = 2 voxels, union = 6 voxels
    np.testing.assert_allclose(float(vg_metrics.iou(a, b)[0]), 2. / 6.,
                               rtol=1e-6)


def test_voxelgrid_iou_shape_mismatch():
    with pytest.raises(ValueError):
        vg_metrics.iou(jnp.zeros((1, 2, 2, 2)), jnp.zeros((1, 3, 3, 3)))


def test_mask_iou_manual():
    a = jnp.zeros((1, 4, 4)).at[0, :2].set(1.)
    b = jnp.zeros((1, 4, 4)).at[0, 1:3].set(1.)
    # intersection 4, union 12 -> loss = 1 - 1/3
    np.testing.assert_allclose(float(render_metrics.mask_iou(a, b)),
                               1. - 4. / 12., rtol=1e-5)


def test_mask_iou_identical_is_zero():
    m = jnp.ones((2, 8, 8))
    np.testing.assert_allclose(float(render_metrics.mask_iou(m, m)), 0.,
                               atol=1e-6)
