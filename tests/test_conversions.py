import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops import conversions


def test_marching_tetrahedra_single_tet():
    vertices = jnp.array([[[0., 0., 0.], [1., 0., 0.], [0., 1., 0.],
                           [0., 0., 1.]]])
    tets = np.array([[0, 1, 2, 3]])
    sdf = jnp.array([[-1., 1., 1., 1.]])  # vertex 0 inside
    verts, faces = conversions.marching_tetrahedra(vertices, tets, sdf)
    v = np.asarray(verts[0])
    f = np.asarray(faces[0])
    assert v.shape == (3, 3)   # crossings on the 3 edges from vertex 0
    assert f.shape == (1, 3)
    # crossing at midpoint (sdf -1 to 1)
    np.testing.assert_allclose(sorted(v.sum(axis=1).tolist()),
                               [0.5, 0.5, 0.5], atol=1e-6)


def test_marching_tetrahedra_gradients():
    vertices = jnp.array([[[0., 0., 0.], [1., 0., 0.], [0., 1., 0.],
                           [0., 0., 1.]]])
    tets = np.array([[0, 1, 2, 3]])

    def loss(sdf):
        verts, _ = conversions.marching_tetrahedra(vertices, tets, sdf)
        return jnp.sum(verts[0] ** 2)

    sdf = jnp.array([[-1., 1., 1., 1.]])
    g = jax.grad(loss)(sdf)
    assert np.abs(np.asarray(g)).sum() > 0


def test_voxelgrids_to_cubic_meshes_doctest():
    verts, faces = conversions.voxelgrids_to_cubic_meshes(
        jnp.ones((1, 1, 1, 1)))
    expected_v = np.array([[0., 0., 0.], [0., 0., 1.], [0., 1., 0.],
                           [0., 1., 1.], [1., 0., 0.], [1., 0., 1.],
                           [1., 1., 0.], [1., 1., 1.]])
    np.testing.assert_array_equal(np.asarray(verts[0]), expected_v)
    expected_f = np.array([
        [0, 1, 2], [5, 4, 7], [0, 4, 1], [6, 2, 7], [0, 2, 4], [3, 1, 7],
        [3, 2, 1], [6, 7, 4], [5, 1, 4], [3, 7, 2], [6, 4, 2], [5, 7, 1]])
    np.testing.assert_array_equal(np.asarray(faces[0]), expected_f)


def test_voxelgrids_to_cubic_meshes_internal_faces_removed():
    verts, faces = conversions.voxelgrids_to_cubic_meshes(
        jnp.ones((1, 2, 1, 1)))
    # two stacked voxels: 10 exterior quad faces = 20 triangles
    assert np.asarray(faces[0]).shape == (20, 3)


def test_voxelgrids_to_trianglemeshes_closed_surface():
    vox = jnp.zeros((1, 3, 3, 3)).at[0, 1, 1, 1].set(1.)
    verts, faces = conversions.voxelgrids_to_trianglemeshes(vox)
    v = np.asarray(verts[0])
    f = np.asarray(faces[0])
    assert v.shape[0] > 0 and f.shape[0] > 0
    # watertight: every edge shared by exactly 2 faces
    edges = np.sort(f[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    # vertices centered around voxel center (2, 2, 2) in padded frame
    np.testing.assert_allclose(v.mean(axis=0), [2, 2, 2], atol=0.2)


def test_pointclouds_to_voxelgrids_doctest():
    pts = jnp.array([[[0., 0., 0.], [1., 1., 1.], [2., 2., 2.]]])
    vg = conversions.pointclouds_to_voxelgrids(pts, 3)
    expected = np.zeros((3, 3, 3))
    expected[0, 0, 0] = expected[1, 1, 1] = expected[2, 2, 2] = 1.
    np.testing.assert_array_equal(np.asarray(vg[0]), expected)


def test_trianglemeshes_to_voxelgrids_doctest():
    vertices = jnp.array([[[0., 0., 0.], [1., 0., 0.], [0., 0., 1.]]])
    faces = np.array([[0, 1, 2]])
    vg = conversions.trianglemeshes_to_voxelgrids(vertices, faces, 3)
    expected = np.zeros((3, 3, 3))
    # triangle in y=0 plane covering x+z<=1 (from reference doctest)
    expected[0, 0, :] = 1.
    expected[1, 0, 0] = expected[1, 0, 1] = 1.
    expected[2, 0, 0] = 1.
    np.testing.assert_array_equal(np.asarray(vg[0]), expected)


def test_unbatched_pointcloud_to_spc():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (100, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(100, 4)).astype(np.float32))
    spc_obj = conversions.unbatched_pointcloud_to_spc(pts, 3, feats)
    assert spc_obj.max_level == 3
    num_leaf = int(np.asarray(spc_obj.pyramids)[0, 0, 3])
    assert spc_obj.features.shape == (num_leaf, 4)


def test_unbatched_mesh_to_spc():
    # single large triangle through the volume
    fv = jnp.array([[[-0.8, -0.8, 0.], [0.8, -0.8, 0.], [0., 0.8, 0.]]])
    octree, points, face_idx, bary = conversions.unbatched_mesh_to_spc(
        fv, 3)
    pts = np.asarray(points)
    assert pts.shape[0] > 0
    # voxels lie near the z=0 plane: quantized z in {3, 4} at level 3
    assert set(np.unique(pts[:, 2])) <= {3, 4}
    assert (np.asarray(face_idx) == 0).all()
    # roundtrip through scan
    from kaolin_tpu.ops import spc as spc_ops
    lengths = np.array([len(np.asarray(octree))], dtype=np.int32)
    max_level, pyramids, exsum = spc_ops.scan_octrees(octree, lengths)
    assert max_level == 3
    assert int(np.asarray(pyramids)[0, 0, 3]) == pts.shape[0]


def test_sdf_to_voxelgrids_sphere():
    def sphere(points):
        return jnp.sum(points ** 2, 1) ** 0.5 - 0.5

    vg = conversions.sdf_to_voxelgrids([sphere], init_res=4)
    v = np.asarray(vg[0])
    assert v.shape == (5, 5, 5)
    assert v[2, 2, 2] == 1.  # center inside
    assert v[0, 0, 0] == 0.  # corner outside
    # refinement yields same occupancy at shared points
    vg2 = conversions.sdf_to_voxelgrids([sphere], init_res=4,
                                        upsampling_steps=1)
    v2 = np.asarray(vg2[0])
    assert v2.shape == (9, 9, 9)
    np.testing.assert_array_equal(v2[::2, ::2, ::2], v)
