import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops import mesh
from kaolin_tpu.ops import coords


def make_tet():
    vertices = jnp.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]],
                         dtype=jnp.float32)
    faces = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    return vertices, faces


def test_index_vertices_by_faces():
    vertices, faces = make_tet()
    fv = mesh.index_vertices_by_faces(vertices, jnp.asarray(faces))
    assert fv.shape == (1, 4, 3, 3)
    np.testing.assert_array_equal(fv[0, 0, 0], [0, 0, 0])
    np.testing.assert_array_equal(fv[0, 0, 1], [0, 1, 0])


def test_face_areas():
    vertices, faces = make_tet()
    areas = mesh.face_areas(vertices, faces)
    np.testing.assert_allclose(
        np.asarray(areas[0, :3]), [0.5, 0.5, 0.5], rtol=1e-6)
    # equilateral-ish diagonal face: area sqrt(3)/2
    np.testing.assert_allclose(
        float(areas[0, 3]), np.sqrt(3) / 2, rtol=1e-6)


def test_packed_face_areas():
    vertices, faces = make_tet()
    packed_verts = jnp.concatenate([vertices[0], vertices[0] * 2.])
    areas = mesh.packed_face_areas(
        packed_verts, np.array([0, 4, 8]),
        jnp.asarray(np.concatenate([faces, faces])), np.array([4, 4]))
    np.testing.assert_allclose(np.asarray(areas[4:]),
                               np.asarray(areas[:4]) * 4., rtol=1e-6)


def test_face_normals():
    vertices, faces = make_tet()
    fv = mesh.index_vertices_by_faces(vertices, jnp.asarray(faces))
    n = mesh.face_normals(fv, unit=True)
    np.testing.assert_allclose(np.asarray(n[0, 0]), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n[0, 1]), [0, -1, 0], atol=1e-6)


def test_compute_vertex_normals():
    vertices, faces = make_tet()
    fv = mesh.index_vertices_by_faces(vertices, jnp.asarray(faces))
    fn = mesh.face_normals(fv, unit=True)
    fn_per_corner = jnp.broadcast_to(fn[:, :, None, :], fv.shape)
    vn = mesh.compute_vertex_normals(jnp.asarray(faces), fn_per_corner, 4)
    assert vn.shape == (1, 4, 3)
    # vertex 0 participates in faces 0,1,2 -> average of their normals
    expected = np.asarray(fn[0, :3]).mean(axis=0)
    np.testing.assert_allclose(np.asarray(vn[0, 0]), expected, atol=1e-6)


def test_adjacency_and_laplacian():
    _, faces = make_tet()
    adj = mesh.adjacency_matrix(4, faces, sparse=False)
    expected = np.ones((4, 4)) - np.eye(4)
    np.testing.assert_array_equal(np.asarray(adj), expected)
    adj_sp = mesh.adjacency_matrix(4, faces, sparse=True)
    np.testing.assert_array_equal(np.asarray(adj_sp.todense()), expected)
    L = mesh.uniform_laplacian(4, faces)
    np.testing.assert_allclose(np.asarray(L),
                               expected / 3. - np.eye(4), atol=1e-6)


def test_sample_points_on_unit_square():
    # two triangles forming the unit square in z=0
    vertices = jnp.array(
        [[[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]], dtype=jnp.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    pts, choices = mesh.sample_points(vertices, faces, 4096,
                                      key=jax.random.key(0))
    pts = np.asarray(pts[0])
    assert pts.shape == (4096, 3)
    assert (pts[:, 0] >= 0).all() and (pts[:, 0] <= 1).all()
    assert np.abs(pts[:, 2]).max() == 0
    # uniform over the square: mean close to center, both faces used
    np.testing.assert_allclose(pts.mean(axis=0)[:2], [0.5, 0.5], atol=0.05)
    counts = np.bincount(np.asarray(choices[0]), minlength=2)
    assert counts.min() > 1500


def test_sample_points_with_features():
    vertices = jnp.array(
        [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], dtype=jnp.float32)
    faces = np.array([[0, 1, 2]])
    face_features = vertices[:, np.array(faces)][..., :2]  # xy as features
    pts, feats, _ = mesh.sample_points(
        vertices, faces, 128, face_features=face_features,
        key=jax.random.key(1))
    np.testing.assert_allclose(np.asarray(pts[0, :, :2]),
                               np.asarray(feats[0]), atol=1e-6)


def test_subdivide_trianglemesh_reference_values():
    vertices = jnp.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]],
                         dtype=jnp.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    alpha = jnp.zeros((1, 4))
    nv, nf = mesh.subdivide_trianglemesh(vertices, faces, 1, alpha)
    expected_v = np.array([
        [0., 0., 0.], [1., 0., 0.], [0., 1., 0.], [0., 0., 1.],
        [0.375, 0.125, 0.125], [0.125, 0.375, 0.125], [0.125, 0.125, 0.375],
        [0.375, 0.375, 0.125], [0.375, 0.125, 0.375], [0.125, 0.375, 0.375]])
    np.testing.assert_allclose(np.asarray(nv[0]), expected_v, atol=1e-6)
    assert np.asarray(nf).shape == (16, 3)
    # reference doctest first rows (kaolin/ops/mesh/trianglemesh.py:481)
    np.testing.assert_array_equal(np.asarray(nf[:4]),
                                  [[1, 7, 4], [0, 4, 5], [2, 5, 7], [5, 4, 7]])


def test_subdivide_trianglemesh_loop_default_alpha():
    vertices = jnp.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]],
                         dtype=jnp.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    nv, nf = mesh.subdivide_trianglemesh(vertices, faces, 2)
    assert np.asarray(nf).shape == (64, 3)
    assert nv.shape[1] == 4 + 6 + (10 + 24 - 10)  # V + E after 2 rounds


def test_subdivide_gradients_flow():
    vertices = jnp.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]],
                         dtype=jnp.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])

    def loss(v):
        nv, _ = mesh.subdivide_trianglemesh(v, faces, 1)
        return jnp.sum(nv ** 2)
    g = jax.grad(loss)(vertices)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_inverse_vertices_offset():
    tet = jnp.array([[[[-0.0500, 0.0000, 0.0500],
                       [-0.0250, -0.0500, 0.0000],
                       [0.0000, 0.0000, 0.0500],
                       [0.5000, 0.5000, 0.4500]]]])
    from kaolin_tpu.ops.mesh import inverse_vertices_offset
    inv = inverse_vertices_offset(tet)
    expected = np.array([[[[0.0000, 20.0000, 0.0000],
                           [79.9999, -149.9999, 10.0000],
                           [-99.9999, 159.9998, -10.0000]]]])
    np.testing.assert_allclose(np.asarray(inv), expected, rtol=1e-3,
                               atol=1e-4)


def test_subdivide_tetmesh_reference_values():
    from kaolin_tpu.ops.mesh import subdivide_tetmesh
    vertices = jnp.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]],
                         dtype=jnp.float32)
    tets = np.array([[0, 1, 2, 3]])
    sdf = jnp.array([[[-1.], [-1.], [0.5], [0.5]]])
    nv, nt, nsdf = subdivide_tetmesh(vertices, tets, sdf)
    expected_v = np.array([
        [0., 0., 0.], [1., 0., 0.], [0., 1., 0.], [0., 0., 1.],
        [0.5, 0., 0.], [0., 0.5, 0.], [0., 0., 0.5],
        [0.5, 0.5, 0.], [0.5, 0., 0.5], [0., 0.5, 0.5]])
    np.testing.assert_allclose(np.asarray(nv[0]), expected_v, atol=1e-6)
    expected_sdf = [-1., -1., 0.5, 0.5, -1., -0.25, -0.25, -0.25, -0.25, 0.5]
    np.testing.assert_allclose(np.asarray(nsdf[0, :, 0]), expected_sdf,
                               atol=1e-6)
    assert np.asarray(nt).shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(nt[0]), [0, 4, 5, 6])


def test_check_sign_sphere():
    from kaolin_tpu.ops.mesh import check_sign
    # icosphere-ish: use a cube mesh (watertight)
    verts = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                      for z in (0, 1)], dtype=np.float32)
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 1.5, size=(1, 512, 3)).astype(np.float32)
    inside = check_sign(jnp.asarray(verts[None]), jnp.asarray(faces),
                        jnp.asarray(pts))
    expected = ((pts > 0) & (pts < 1)).all(axis=-1)
    np.testing.assert_array_equal(np.asarray(inside), expected)


def test_coords_roundtrip():
    az = jnp.array([0.3, 1.2])
    el = jnp.array([0.1, -0.4])
    d = jnp.array([1.5, 2.0])
    x, y, z = coords.spherical2cartesian(az, el, d)
    az2, el2, d2 = coords.cartesian2spherical(x, y, z)
    np.testing.assert_allclose(np.asarray(az2), np.asarray(az), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(el2), np.asarray(el), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), rtol=1e-5)
