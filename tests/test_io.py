"""IO tests: obj/off imports against the reference sample files, USD(A)
export/import round-trips, materials, datasets.

Sample files: /root/reference/tests/samples (same fixtures the reference's
io tests assert against).
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.io import obj, off, usd
from kaolin_tpu.io.dataset import CachedDataset

SAMPLES = '/root/reference/tests/samples'
SIMPLE_OBJ = os.path.join(SAMPLES, 'simple_obj', 'model.obj')
SIMPLE_OFF = os.path.join(SAMPLES, 'simple_off', 'model.off')

EXPECTED_VERTICES = np.array([
    [-0.1, -0.1, -0.1],
    [0.1, -0.1, -0.1],
    [-0.1, 0.1, -0.1],
    [0.1, 0.1, -0.1],
    [-0.1, -0.1, 0.1],
    [0.1, -0.1, 0.1]], np.float32)


# ---------------------------------------------------------------------------
# obj

def test_obj_import_vertices_and_faces():
    mesh = obj.import_mesh(SIMPLE_OBJ)
    np.testing.assert_allclose(np.asarray(mesh.vertices),
                               EXPECTED_VERTICES, rtol=1e-6)
    # 2 quads
    assert mesh.faces.shape == (2, 4)
    np.testing.assert_array_equal(
        np.asarray(mesh.faces[0]), [0, 1, 3, 2])


def test_obj_import_triangulate():
    mesh = obj.import_mesh(SIMPLE_OBJ, triangulate=True)
    assert mesh.faces.shape == (4, 3)
    # fan triangulation of [0, 1, 3, 2] -> [0,1,3], [0,3,2]
    np.testing.assert_array_equal(np.asarray(mesh.faces[:2]),
                                  [[0, 1, 3], [0, 3, 2]])


def test_obj_import_uvs():
    mesh = obj.import_mesh(SIMPLE_OBJ)
    assert mesh.uvs.shape == (4, 2)
    np.testing.assert_allclose(
        np.asarray(mesh.uvs),
        [[0., 0.], [0., 1.], [1., 0.], [1., 1.]], rtol=1e-6)
    assert mesh.face_uvs_idx.shape == (2, 4)


def test_obj_import_normals():
    mesh = obj.import_mesh(SIMPLE_OBJ, with_normals=True)
    assert mesh.normals.shape == (4, 3)
    assert mesh.face_normals_idx.shape == (2, 4)


def test_obj_import_materials_skip_handler():
    mesh = obj.import_mesh(SIMPLE_OBJ, with_materials=True,
                           error_handler=obj.skip_error_handler)
    names = [m['material_name'] for m in mesh.materials]
    # Material.003 follows the last face and is assigned to nothing
    assert names[:2] == ['Material.001', 'Material.002']
    assert np.asarray(mesh.material_assignments).shape == (2,)
    # Kd values parsed
    np.testing.assert_allclose(mesh.materials[0]['Kd'],
                               [0.4, 0.3, 0.2], rtol=1e-6)
    # texture maps loaded where present
    assert mesh.materials[0]['map_Kd'].shape[-1] == 3


def test_obj_import_materials_default_handler_raises():
    from kaolin_tpu.io.materials import MaterialLoadError
    with pytest.raises(MaterialLoadError):
        obj.import_mesh(SIMPLE_OBJ, with_materials=True)


def test_obj_heterogeneous_triangulate():
    path = os.path.join(SAMPLES, 'simple_obj', 'model_heterogeneous.obj')
    mesh = obj.import_mesh(
        path, heterogeneous_mesh_handler=obj.mesh_handler_naive_triangulate
        if hasattr(obj, 'mesh_handler_naive_triangulate') else None,
        triangulate=True)
    assert mesh.faces.shape[-1] == 3


def test_obj_roundtrip_via_fox():
    mesh = obj.import_mesh('/root/reference/sample_data/meshes/fox.obj',
                           triangulate=True)
    assert mesh.vertices.shape[0] > 1000
    assert mesh.faces.shape == (10000, 3)
    assert int(mesh.faces.max()) < mesh.vertices.shape[0]


# ---------------------------------------------------------------------------
# off

def test_off_import():
    mesh = off.import_mesh(SIMPLE_OFF)
    np.testing.assert_allclose(np.asarray(mesh.vertices),
                               EXPECTED_VERTICES, rtol=1e-6)
    assert mesh.faces.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(mesh.faces),
                                  [[1, 2, 4, 3], [2, 1, 5, 6]])


def test_off_import_face_colors():
    mesh = off.import_mesh(SIMPLE_OFF, with_face_colors=True)
    np.testing.assert_array_equal(np.asarray(mesh.face_colors),
                                  [[128, 128, 128], [0, 0, 255]])


# ---------------------------------------------------------------------------
# usd(a)

@pytest.fixture
def tri_mesh():
    verts = jnp.asarray(EXPECTED_VERTICES)
    faces = jnp.asarray([[0, 1, 3], [0, 3, 2], [1, 5, 3]])
    return verts, faces


def test_usd_mesh_roundtrip(tmp_path, tri_mesh):
    verts, faces = tri_mesh
    path = str(tmp_path / 'mesh.usda')
    usd.export_mesh(path, vertices=verts, faces=faces)
    out = usd.import_mesh(path)
    np.testing.assert_allclose(np.asarray(out.vertices),
                               np.asarray(verts), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.faces),
                                  np.asarray(faces))


def test_usd_mesh_roundtrip_with_uvs(tmp_path, tri_mesh):
    verts, faces = tri_mesh
    uvs = jnp.asarray(np.random.RandomState(0).rand(9, 2)
                      .astype(np.float32))
    path = str(tmp_path / 'mesh_uv.usda')
    usd.export_mesh(path, vertices=verts, faces=faces, uvs=uvs)
    out = usd.import_mesh(path, with_normals=False)
    assert out.uvs is not None
    np.testing.assert_allclose(np.asarray(out.uvs).reshape(-1, 2),
                               np.asarray(uvs), rtol=1e-5)


def test_usd_export_import_meshes_multiple(tmp_path, tri_mesh):
    verts, faces = tri_mesh
    path = str(tmp_path / 'meshes.usda')
    usd.export_meshes(path, vertices=[verts, verts * 2.],
                      faces=[faces, faces])
    out = usd.import_meshes(path)
    assert len(out) == 2
    np.testing.assert_allclose(np.asarray(out[1].vertices),
                               np.asarray(verts) * 2., rtol=1e-6)


def test_usd_pointcloud_roundtrip(tmp_path):
    pts = jnp.asarray(np.random.RandomState(1).randn(100, 3)
                      .astype(np.float32))
    path = str(tmp_path / 'pc.usda')
    usd.export_pointcloud(path, pts)
    out = usd.import_pointcloud(
        path, scene_path='/World/PointClouds/pointcloud_0')
    np.testing.assert_allclose(np.asarray(out.points), np.asarray(pts),
                               rtol=1e-5)


def test_usd_voxelgrid_roundtrip(tmp_path):
    vg = np.zeros((8, 8, 8), bool)
    vg[2:5, 1:3, 6] = True
    path = str(tmp_path / 'vg.usda')
    usd.export_voxelgrid(path, jnp.asarray(vg))
    out = usd.import_voxelgrid(
        path, scene_path='/World/VoxelGrids/voxelgrid_0')
    np.testing.assert_array_equal(np.asarray(out), vg)


def test_usd_get_scene_paths(tmp_path, tri_mesh):
    verts, faces = tri_mesh
    path = str(tmp_path / 'paths.usda')
    usd.export_meshes(path, vertices=[verts, verts], faces=[faces, faces])
    paths = usd.get_scene_paths(path, prim_types=['Mesh'])
    assert len(paths) == 2


def test_usd_import_reference_golden():
    """Parse the reference's golden rocket usda (ascii codec)."""
    golden = os.path.join(SAMPLES, 'golden', 'rocket_homogenized.usda')
    mesh = usd.import_mesh(golden)
    assert mesh.vertices.shape[0] > 100
    assert mesh.faces.shape[-1] == 3


# ---------------------------------------------------------------------------
# datasets

def test_cached_dataset(tmp_path):
    calls = []

    class Source:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            calls.append(i)
            return {'x': np.full((3,), i, np.float32)}

    ds = CachedDataset(Source(), cache_dir=str(tmp_path / 'cache'))
    a = ds[2]
    b = ds[2]
    assert calls.count(2) == 1          # second access came from cache
    np.testing.assert_allclose(np.asarray(a['x']), np.asarray(b['x']))
    assert len(ds) == 4
