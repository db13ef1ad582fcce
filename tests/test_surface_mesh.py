import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.rep import SurfaceMesh


@pytest.fixture
def tri_mesh():
    vertices = jnp.array([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.],
                          [0., 0., 1.]])
    faces = jnp.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    return SurfaceMesh(vertices=vertices, faces=faces)


def test_auto_compute_face_vertices(tri_mesh):
    fv = tri_mesh.face_vertices
    assert fv.shape == (4, 3, 3)
    np.testing.assert_allclose(np.asarray(fv[0, 1]), [0., 1., 0.])
    # cached after first access
    assert tri_mesh.has_attribute('face_vertices')


def test_auto_compute_normals_chain(tri_mesh):
    fn = tri_mesh.face_normals
    assert fn.shape == (4, 3, 3)
    np.testing.assert_allclose(np.asarray(fn[0, 0]), [0., 0., -1.],
                               atol=1e-6)
    vn = tri_mesh.vertex_normals
    assert vn.shape == (4, 3)
    # unit length
    np.testing.assert_allclose(np.linalg.norm(np.asarray(vn), axis=1), 1.,
                               atol=1e-5)


def test_face_normals_from_authored_normals():
    vertices = jnp.array([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.]])
    faces = jnp.array([[0, 1, 2]])
    normals = jnp.array([[1., 0., 0.], [0., 1., 0.]])
    idx = jnp.array([[0, 0, 1]])
    mesh = SurfaceMesh(vertices=vertices, faces=faces, normals=normals,
                      face_normals_idx=idx)
    fn = mesh.face_normals
    np.testing.assert_allclose(np.asarray(fn[0, 0]), [1., 0., 0.])
    np.testing.assert_allclose(np.asarray(fn[0, 2]), [0., 1., 0.])


def test_face_uvs(tri_mesh):
    uvs = jnp.array([[0., 0.], [1., 0.], [0., 1.]])
    tri_mesh.uvs = uvs
    tri_mesh.face_uvs_idx = jnp.array([[0, 1, 2]] * 4)
    fu = tri_mesh.face_uvs
    assert fu.shape == (4, 3, 2)


def test_to_batched_and_cat(tri_mesh):
    tri_mesh.to_batched()
    assert tri_mesh.batching == SurfaceMesh.Batching.FIXED
    assert tri_mesh.vertices.shape == (1, 4, 3)
    assert tri_mesh.faces.shape == (4, 3)  # topology not unsqueezed

    other = SurfaceMesh(vertices=tri_mesh.vertices[0] * 2.,
                        faces=tri_mesh.faces)
    both = SurfaceMesh.cat([SurfaceMesh(
        vertices=tri_mesh.vertices[0], faces=tri_mesh.faces), other],
        fixed_topology=True)
    assert both.vertices.shape == (2, 4, 3)
    assert len(both) == 2


def test_cat_list_batching(tri_mesh):
    m2 = SurfaceMesh(vertices=jnp.zeros((7, 3)),
                     faces=jnp.zeros((2, 3), dtype=jnp.int32))
    both = SurfaceMesh.cat([tri_mesh, m2], fixed_topology=False)
    assert both.batching == SurfaceMesh.Batching.LIST
    assert len(both.vertices) == 2
    assert both.vertices[1].shape == (7, 3)


def test_convert_attribute_batching():
    x = jnp.ones((5, 3))
    out = SurfaceMesh.convert_attribute_batching(
        x, SurfaceMesh.Batching.NONE, SurfaceMesh.Batching.FIXED)
    assert out.shape == (1, 5, 3)
    back = SurfaceMesh.convert_attribute_batching(
        out, SurfaceMesh.Batching.FIXED, SurfaceMesh.Batching.NONE)
    assert back.shape == (5, 3)


def test_pytree_roundtrip(tri_mesh):
    leaves, treedef = jax.tree_util.tree_flatten(tri_mesh)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(np.asarray(rebuilt.vertices),
                                  np.asarray(tri_mesh.vertices))

    @jax.jit
    def scale(mesh):
        return mesh.vertices * 2.

    np.testing.assert_allclose(np.asarray(scale(tri_mesh)),
                               np.asarray(tri_mesh.vertices) * 2.)


def test_repr_and_describe(tri_mesh):
    r = repr(tri_mesh)
    assert 'batching strategy NONE' in r
    assert 'vertices' in r


def test_unset_returns_none():
    mesh = SurfaceMesh(vertices=jnp.zeros((3, 3)),
                       faces=jnp.zeros((1, 3), dtype=jnp.int32))
    assert mesh.uvs is None
    assert mesh.face_uvs is None  # cannot be computed either


# ---- API-parity additions (testing helpers, quaternions, dash3d wire) ----

def test_contained_equal():
    import collections
    import numpy as np
    from kaolin_tpu.utils.testing import contained_equal, \
        check_tensor_attribute_shapes
    NT = collections.namedtuple('NT', 'a b')
    assert contained_equal(NT(np.ones(3), 'x'), NT(np.ones(3), 'x'))
    assert not contained_equal(NT(np.ones(3), 'x'), NT(np.ones(3), 'y'))
    assert contained_equal({'a': 1.0}, {'a': 1.0 + 1e-9}, approximate=True)
    assert not contained_equal({'a': 1.0}, {'a': 1.1}, approximate=True)
    assert not contained_equal([1, 2], [1, 2, 3])
    assert check_tensor_attribute_shapes({'v': np.zeros((4, 3))}, v=(4, 3))


def test_quaternion_helpers_match_rotation_matrix():
    import numpy as np
    from kaolin_tpu.visualize.ipython import rotate_around_axis
    rng = np.random.default_rng(0)
    p = rng.normal(size=(5, 3))
    axis = np.tile(np.array([[0., 1., 0.]]), (5, 1))
    ang = 0.7
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    assert np.allclose(rotate_around_axis(p, ang, axis), p @ R.T, atol=1e-12)


def test_dash3d_reference_wire_format():
    import numpy as np
    from kaolin_tpu.experimental.dash3d.util import meshes_to_binary, \
        point_clouds_to_binary
    v = np.arange(9, dtype=np.float32).reshape(3, 3)
    f = np.array([[0, 1, 2]], dtype=np.int32)
    b = meshes_to_binary([v], [f])
    hdr = np.frombuffer(b[:16], np.int32)
    assert list(hdr) == [1, 0, 0, 0]
    nv, nf = np.frombuffer(b[16:24], np.int32)
    assert (nv, nf) == (3, 1)
    assert np.frombuffer(b[24:24 + 36], np.float32).reshape(3, 3) \
        .tolist() == v.tolist()
    pc = point_clouds_to_binary([v])
    npts = np.frombuffer(pc[16:20], np.int32)[0]
    assert npts == 3
    mins = np.frombuffer(pc[24:36], np.float32)
    assert mins.tolist() == v.min(0).tolist()


def test_usd_interpolation_getters():
    import numpy as np
    import pytest
    from kaolin_tpu.io.usd.mesh import get_face_uvs_idx, get_face_normals
    faces = np.array([[0, 1, 2], [2, 3, 0]])
    out = get_face_uvs_idx(faces, [3, 3], np.zeros((4, 2)), None, 'vertex')
    assert out.shape == (2, 3)
    out = get_face_uvs_idx(faces, [3, 3], None, None, 'faceVarying')
    assert (out == np.arange(6)).all()
    assert get_face_normals('N', 'faceVarying') == 'N'
    with pytest.raises(NotImplementedError):
        get_face_normals('N', 'vertex')


def test_material_manager():
    import pytest
    from kaolin_tpu.io.materials import MaterialManager, Material, \
        MaterialNotSupportedError
    MaterialManager.register_usd_reader(
        'TestShader', lambda p, t, tm: Material('x'))
    with pytest.raises(ValueError):
        MaterialManager.register_usd_reader('Bad', lambda a: None)
    with pytest.raises(MaterialNotSupportedError):
        MaterialManager.read_from_file('nonexistent.obj')


def test_camera_param_enums():
    from kaolin_tpu.render.camera.intrinsics_pinhole import (
        PinholeIntrinsics, PinholeParamsDefEnum)
    from kaolin_tpu.render.camera.intrinsics_ortho import OrthoParamsDefEnum
    from kaolin_tpu.render.camera.extrinsics_backends import (
        ExtrinsicsParamsDefEnum)
    # enum order must match the params column layout
    assert [e.name for e in PinholeParamsDefEnum] \
        == list(PinholeIntrinsics.param_names)
    assert OrthoParamsDefEnum.fov_distance == 0
    assert ExtrinsicsParamsDefEnum.R == 0 and ExtrinsicsParamsDefEnum.t == 1
