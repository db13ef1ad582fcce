"""OBJ/MTL mesh importer.

Parity: ``kaolin/io/obj.py`` (reference).  Host-side parsing with numpy;
returns a :class:`kaolin_tpu.rep.SurfaceMesh` of jnp arrays.
"""

import os
import warnings

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.io.materials import (
    MaterialLoadError, MaterialFileError, MaterialNotFoundError,
    process_materials_and_assignments)
from kaolin_tpu.io.utils import (
    NonHomogeneousMeshError, mesh_handler_naive_triangulate)
from kaolin_tpu.rep.surface_mesh import SurfaceMesh

__all__ = [
    'ignore_error_handler',
    'skip_error_handler',
    'create_missing_materials_error_handler',
    'default_error_handler',
    'import_mesh',
    'load_mtl',
]


def ignore_error_handler(error, **kwargs):
    """Simply ignore errors.  Parity: ``kaolin/io/obj.py:38``."""
    pass


def skip_error_handler(error, **kwargs):
    """Raise a warning and skip.  Parity: ``kaolin/io/obj.py:43``."""
    warnings.warn(str(error) + ' - skipping', UserWarning)


def create_missing_materials_error_handler(error, **kwargs):
    """On missing material, return a default material dict so assignments
    are kept.  Parity: ``kaolin/io/obj.py:49``.
    """
    if isinstance(error, MaterialNotFoundError):
        warnings.warn(str(error) + ' - creating default material',
                      UserWarning)
        return {'Kd': np.full((3,), 0.5, dtype=np.float32)}
    skip_error_handler(error, **kwargs)


def default_error_handler(error, **kwargs):
    """Raise the error.  Parity: ``kaolin/io/obj.py:63``."""
    raise error


def flatten_feature(feature):
    """Flatten a list of per-face features into a single list."""
    if feature is None or len(feature) == 0:
        return None
    return [item for sublist in feature for item in sublist]


def import_mesh(path, with_materials=False, with_normals=False,
                error_handler=None, heterogeneous_mesh_handler=None,
                triangulate=False, raw_materials=True):
    r"""Load an obj file as a single unbatched :class:`SurfaceMesh`.

    Parity: ``kaolin/io/obj.py:78``.

    Args:
        path: path to the .obj file.
        with_materials: load .mtl materials and material_assignments.
        with_normals: load vertex normals.
        error_handler: handles material errors
            (default :func:`default_error_handler` — raise).
        heterogeneous_mesh_handler: handles non-triangular meshes
            (default: raise :class:`NonHomogeneousMeshError`).
        triangulate: fan-triangulate any polygon faces.
        raw_materials: if True materials are dicts of mtl values; else
            converted to :class:`PBRMaterial`.

    Returns:
        unbatched :class:`SurfaceMesh`.
    """
    if error_handler is None:
        error_handler = default_error_handler
    triangulate_handler = (None if not triangulate
                           else mesh_handler_naive_triangulate)
    if heterogeneous_mesh_handler is None:
        heterogeneous_mesh_handler = triangulate_handler

    # fast path: native C++ tokenizer (csrc/obj_parser.cpp) when no
    # material bookkeeping is needed
    if not with_materials:
        from kaolin_tpu import _native
        parsed = None
        try:
            parsed = _native.parse_obj(path)
        except Exception:
            parsed = None
        if parsed is not None:
            return _mesh_from_native(parsed, with_normals,
                                     heterogeneous_mesh_handler, path)

    vertices = []
    faces = []
    uvs = []
    face_uvs_idx = []
    normals = []
    face_normals_idx = []
    face_vertex_counts = []
    mtl_materials = {}
    material_assignments_dict = {}
    active_material = None
    active_range_start = 0

    def close_range(num_faces_so_far):
        nonlocal active_material, active_range_start
        if active_material is not None and \
                num_faces_so_far > active_range_start:
            material_assignments_dict.setdefault(active_material, []).append(
                [active_range_start, num_faces_so_far])
        active_range_start = num_faces_so_far

    with open(path, 'r', encoding='utf-8', errors='replace') as f:
        for line in f:
            tokens = line.split()
            if not tokens:
                continue
            key = tokens[0]
            if key == 'v':
                vertices.append([float(x) for x in tokens[1:4]])
            elif key == 'vt':
                uvs.append([float(x) for x in tokens[1:3]])
            elif key == 'vn':
                normals.append([float(x) for x in tokens[1:4]])
            elif key == 'f':
                fv = tokens[1:]
                face_vertex_counts.append(len(fv))
                fidx, fuv, fn = [], [], []
                for corner in fv:
                    parts = corner.split('/')
                    fidx.append(int(parts[0]))
                    if len(parts) > 1 and parts[1] != '':
                        fuv.append(int(parts[1]))
                    if len(parts) > 2 and parts[2] != '':
                        fn.append(int(parts[2]))
                faces.append(fidx)
                if fuv:
                    face_uvs_idx.append(fuv)
                if fn:
                    face_normals_idx.append(fn)
            elif key == 'usemtl' and with_materials:
                close_range(len(face_vertex_counts))
                active_material = ' '.join(tokens[1:])
            elif key == 'mtllib' and with_materials:
                mtl_path = os.path.join(os.path.dirname(path),
                                        ' '.join(tokens[1:]))
                mats = load_mtl(mtl_path, error_handler)
                if mats:
                    mtl_materials.update(mats)
    close_range(len(face_vertex_counts))

    vertices = np.asarray(vertices, dtype=np.float32).reshape(-1, 3)
    face_vertex_counts = np.asarray(face_vertex_counts, dtype=np.int64)

    def fix_idx(flat, count):
        arr = np.asarray(flat, dtype=np.int64)
        return np.where(arr < 0, arr + count, arr - 1)

    flat_faces = fix_idx(flatten_feature(faces), len(vertices))
    flat_uvs_idx = flatten_feature(face_uvs_idx)
    flat_normals_idx = flatten_feature(face_normals_idx)
    uvs = (np.asarray(uvs, dtype=np.float32).reshape(-1, 2)
           if uvs else None)
    normals = (np.asarray(normals, dtype=np.float32).reshape(-1, 3)
               if normals else None)
    if flat_uvs_idx is not None:
        flat_uvs_idx = fix_idx(flat_uvs_idx, len(uvs) if uvs is not None
                               else 0)
    if flat_normals_idx is not None and with_normals:
        flat_normals_idx = fix_idx(flat_normals_idx,
                                   len(normals) if normals is not None else 0)

    # homogenize / triangulate: heterogeneous = MIXED face sizes (an
    # all-quad mesh is homogeneous, matching the reference and the native
    # fast path); triangulation routes any non-triangle mesh through the
    # handler
    is_heterogeneous = (
        face_vertex_counts.size > 0
        and not (face_vertex_counts == face_vertex_counts[0]).all())
    needs_triangulate = (triangulate and face_vertex_counts.size > 0
                         and not (face_vertex_counts == 3).all())
    if is_heterogeneous or needs_triangulate:
        handler = heterogeneous_mesh_handler
        if handler is None:
            raise NonHomogeneousMeshError(
                f"Mesh at {path} is non-homogeneous and no "
                f"heterogeneous_mesh_handler was provided")
        features = [flat_faces]
        feat_names = ['faces']
        if flat_uvs_idx is not None:
            features.append(flat_uvs_idx)
            feat_names.append('face_uvs_idx')
        if flat_normals_idx is not None and with_normals:
            features.append(flat_normals_idx)
            feat_names.append('face_normals_idx')
        assignments = ({k: np.asarray(v) for k, v in
                        material_assignments_dict.items()}
                       if material_assignments_dict else None)
        result = handler(vertices, face_vertex_counts, *features,
                         face_assignments=assignments)
        if result is None:
            return None
        vertices, face_vertex_counts = result[0], result[1]
        new_feats = result[2:2 + len(features)]
        feat_map = dict(zip(feat_names, new_feats))
        faces_arr = np.asarray(feat_map['faces']).reshape(-1, 3)
        uvs_idx_arr = (np.asarray(feat_map['face_uvs_idx']).reshape(-1, 3)
                       if 'face_uvs_idx' in feat_map else None)
        normals_idx_arr = (
            np.asarray(feat_map['face_normals_idx']).reshape(-1, 3)
            if 'face_normals_idx' in feat_map else None)
        if assignments is not None:
            material_assignments_dict = {
                k: v for k, v in result[-1].items()}
    else:
        fsz = int(face_vertex_counts[0]) if face_vertex_counts.size else 3
        faces_arr = flat_faces.reshape(-1, fsz)
        uvs_idx_arr = (flat_uvs_idx.reshape(-1, fsz)
                       if flat_uvs_idx is not None else None)
        normals_idx_arr = (flat_normals_idx.reshape(-1, fsz)
                           if (flat_normals_idx is not None and with_normals)
                           else None)
        material_assignments_dict = {
            k: np.asarray(v) for k, v in material_assignments_dict.items()}

    materials = None
    material_assignments = None
    if with_materials:
        materials, material_assignments = process_materials_and_assignments(
            mtl_materials, material_assignments_dict, error_handler,
            faces_arr.shape[0], error_context_str=path)
        if not raw_materials:
            from kaolin_tpu.io.materials import PBRMaterial
            materials = [_mtl_to_pbr(m) for m in materials]

    kwargs = dict(
        vertices=jnp.asarray(vertices),
        faces=jnp.asarray(faces_arr),
    )
    if uvs is not None:
        kwargs['uvs'] = jnp.asarray(uvs)
    if uvs_idx_arr is not None:
        kwargs['face_uvs_idx'] = jnp.asarray(uvs_idx_arr)
    if with_normals and normals is not None:
        kwargs['normals'] = jnp.asarray(normals)
        if normals_idx_arr is not None:
            kwargs['face_normals_idx'] = jnp.asarray(normals_idx_arr)
    if material_assignments is not None:
        kwargs['material_assignments'] = jnp.asarray(material_assignments)
    return SurfaceMesh(materials=materials, batching=SurfaceMesh.Batching.NONE,
                       strict_checks=False, **kwargs)


def _mesh_from_native(parsed, with_normals, heterogeneous_mesh_handler,
                      path):
    """Assemble a SurfaceMesh from the native tokenizer's raw output."""
    vertices = parsed['vertices']
    uvs = parsed['uvs'] if parsed['uvs'].size else None
    normals = parsed['normals'] if parsed['normals'].size else None
    counts = parsed['face_counts']

    def fix(flat, count):
        return np.where(flat < 0, flat + count, flat - 1)

    flat_faces = fix(parsed['face_v'], len(vertices))
    has_uv = uvs is not None and (parsed['face_vt'] != 0).any()
    has_n = (with_normals and normals is not None
             and (parsed['face_vn'] != 0).any())
    flat_uvs_idx = fix(parsed['face_vt'], len(uvs)) if has_uv else None
    flat_normals_idx = fix(parsed['face_vn'],
                           len(normals)) if has_n else None

    is_heterogeneous = counts.size > 0 and not (counts == counts[0]).all()
    if is_heterogeneous or (counts.size and counts[0] != 3
                            and heterogeneous_mesh_handler is not None):
        if heterogeneous_mesh_handler is None:
            raise NonHomogeneousMeshError(
                f"Mesh at {path} is non-homogeneous and no "
                f"heterogeneous_mesh_handler was provided")
        features = [flat_faces]
        if flat_uvs_idx is not None:
            features.append(flat_uvs_idx)
        if flat_normals_idx is not None:
            features.append(flat_normals_idx)
        result = heterogeneous_mesh_handler(vertices, counts, *features)
        if result is None:
            return None
        vertices, counts = result[0], result[1]
        flat_faces = np.asarray(result[2]).reshape(-1)
        cur = 3
        if flat_uvs_idx is not None:
            flat_uvs_idx = np.asarray(result[cur]).reshape(-1)
            cur += 1
        if flat_normals_idx is not None:
            flat_normals_idx = np.asarray(result[cur]).reshape(-1)
    fsize = int(counts[0]) if counts.size else 3
    kwargs = dict(
        vertices=jnp.asarray(vertices),
        faces=jnp.asarray(flat_faces.reshape(-1, fsize)))
    if uvs is not None:
        kwargs['uvs'] = jnp.asarray(uvs)
        if flat_uvs_idx is not None:
            kwargs['face_uvs_idx'] = jnp.asarray(
                flat_uvs_idx.reshape(-1, fsize))
    if with_normals and normals is not None:
        kwargs['normals'] = jnp.asarray(normals)
        if flat_normals_idx is not None:
            kwargs['face_normals_idx'] = jnp.asarray(
                flat_normals_idx.reshape(-1, fsize))
    return SurfaceMesh(batching=SurfaceMesh.Batching.NONE,
                       strict_checks=False, **kwargs)


def _mtl_to_pbr(mtl):
    """Convert a raw mtl dict to a PBRMaterial."""
    from kaolin_tpu.io.materials import PBRMaterial
    if not isinstance(mtl, dict):
        return mtl
    kwargs = {}
    if 'Kd' in mtl:
        kwargs['diffuse_color'] = tuple(np.asarray(mtl['Kd']).tolist())
    if 'map_Kd' in mtl:
        tex = np.asarray(mtl['map_Kd'])
        kwargs['diffuse_texture'] = jnp.asarray(
            tex.astype(np.float32) / 255.).transpose(2, 0, 1)
    return PBRMaterial(material_name=mtl.get('material_name', ''), **kwargs)


def load_mtl(mtl_path, error_handler=None):
    """Load a .mtl material library.

    Parity: ``kaolin/io/obj.py:311``.  Supports Kd / Ka / Ks values and
    map_Kd / map_Ka / map_Ks textures (loaded as uint8 HWC numpy arrays).

    Returns:
        dict of material name -> dict of properties.
    """
    if error_handler is None:
        error_handler = default_error_handler
    mtl_data = {}
    root_dir = os.path.dirname(mtl_path)

    try:
        f = open(mtl_path, 'r', encoding='utf-8', errors='replace')
    except Exception as e:
        error_handler(MaterialFileError(
            f"Failed to load material at path {mtl_path!r}:\n{e}"))
        return mtl_data
    with f:
        material_name = ''
        for line in f:
            tokens = line.split()
            if not tokens:
                continue
            key = tokens[0]
            if key == 'newmtl':
                material_name = ' '.join(tokens[1:])
                mtl_data[material_name] = {'material_name': material_name}
            elif material_name == '':
                continue
            elif key in ('map_Kd', 'map_Ka', 'map_Ks'):
                texture_path = os.path.join(root_dir, ' '.join(tokens[1:]))
                try:
                    from PIL import Image
                    img = np.asarray(Image.open(texture_path).convert('RGB'))
                    mtl_data[material_name][key] = img
                except Exception as e:
                    error_handler(MaterialLoadError(
                        f"Failed to load texture {texture_path!r} for "
                        f"material {material_name!r}:\n{e}"),
                        material_name=material_name)
            elif key in ('Kd', 'Ka', 'Ks'):
                mtl_data[material_name][key] = np.asarray(
                    [float(x) for x in tokens[1:4]], dtype=np.float32)
    return mtl_data
