"""I/O helpers: heterogeneous mesh handlers.

Parity: ``kaolin/io/utils.py`` (reference).  Operates on numpy (host-side
data loading), returning numpy arrays convertible to jnp.
"""

import warnings

import numpy as np

__all__ = [
    'NonHomogeneousMeshError',
    'heterogeneous_mesh_handler_skip',
    'heterogeneous_mesh_handler_naive_homogenize',
    'mesh_handler_naive_triangulate',
]


class NonHomogeneousMeshError(Exception):
    """Raised when expecting a homogeneous mesh but a heterogeneous mesh
    is encountered.  Parity: ``kaolin/io/utils.py:24``.
    """

    __slots__ = ['message']

    def __init__(self, message):
        self.message = message


def heterogeneous_mesh_handler_skip(*args, **kwargs):
    """Skip heterogeneous meshes (return None).

    Parity: ``kaolin/io/utils.py:36``.
    """
    return None


def heterogeneous_mesh_handler_naive_homogenize(*args, **kwargs):
    """Deprecated alias of :func:`mesh_handler_naive_triangulate`."""
    warnings.warn(
        "heterogeneous_mesh_handler_naive_homogenize is deprecated, please "
        "use kaolin_tpu.io.utils.mesh_handler_naive_triangulate instead",
        DeprecationWarning, stacklevel=2)
    return mesh_handler_naive_triangulate(*args, **kwargs)


def mesh_handler_naive_triangulate(vertices, face_vertex_counts, *features,
                                   face_assignments=None):
    """Fan-triangulate polygonal faces of varying vertex counts.

    Parity: ``kaolin/io/utils.py:51``.

    Args:
        vertices: (N, 3) array (passed through unchanged).
        face_vertex_counts: (M,) vertex count per face.
        features: flat per-face-vertex features (e.g. vertex / uv indices)
            each of shape (sum(face_vertex_counts),).
        face_assignments: optional dict of name -> (K,) face indices or
            (K, 2) [start, end) ranges, remapped to triangulated indices.

    Returns:
        (vertices, new_face_vertex_counts, *new_features[, new_assignments])
    """
    def _homogenize(attr, counts):
        if attr is None:
            return None
        attr = list(attr) if not isinstance(attr, list) else attr
        idx = 0
        new_attr = []
        for count in counts:
            face = attr[idx:idx + int(count)]
            idx += int(count)
            while len(face) >= 3:
                new_attr.append(face[:3])
                face.pop(1)
        return np.asarray(new_attr)

    def _homogenize_counts(counts, compute_mappings):
        mappings = []
        num_faces = 0
        for count in counts:
            remaining = int(count)
            new_indices = []
            while remaining >= 3:
                if compute_mappings:
                    new_indices.append(num_faces)
                num_faces += 1
                remaining -= 1
            if compute_mappings:
                mappings.append(new_indices)
        return np.full((num_faces,), 3, dtype=np.int64), mappings

    counts = list(np.asarray(face_vertex_counts).tolist())
    new_attrs = [_homogenize(a, counts) for a in features]
    new_counts, face_idx_mappings = _homogenize_counts(
        counts, face_assignments is not None and len(face_assignments) > 0)

    if face_assignments is None:
        return tuple([vertices, new_counts] + new_attrs)

    new_assignments = {}
    for k, v in face_assignments.items():
        v = np.asarray(v)
        if v.ndim == 1:
            new_idx = []
            for old_idx in v:
                new_idx.extend(face_idx_mappings[int(old_idx)])
            new_idx = np.asarray(new_idx, dtype=np.int64)
        else:
            assert v.ndim == 2 and v.shape[1] == 2, \
                'Expects shape (K,) or (K, 2) for face_assignments'
            new_idx = np.zeros_like(v)
            for row in range(v.shape[0]):
                new_idx[row, 0] = face_idx_mappings[int(v[row, 0])][0]
                new_idx[row, 1] = face_idx_mappings[int(v[row, 1]) - 1][-1] + 1
        new_assignments[k] = new_idx
    return tuple([vertices, new_counts] + new_attrs + [new_assignments])
