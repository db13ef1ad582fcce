"""Voxelgrid -> mesh conversions.

Parity: ``kaolin/ops/conversions/voxelgrid.py`` (reference).

* :func:`voxelgrids_to_cubic_meshes` — exact port of the boundary-face
  ("Cubify") construction (reference :56-155).
* :func:`voxelgrids_to_trianglemeshes` — iso-surface extraction via
  table-driven Lorensen marching cubes (jit-able XLA core in
  ``_mcube.py``), reproducing the reference CUDA op's unique-vertex
  output exactly (``csrc/ops/conversions/unbatched_mcube``).
* :func:`voxelgrids_to_trianglemeshes_mt` — the earlier marching-
  tetrahedra variant (6-tet cell decomposition; denser triangulation),
  kept as an alternative surface extractor.
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['voxelgrids_to_cubic_meshes', 'voxelgrids_to_trianglemeshes',
           'voxelgrids_to_trianglemeshes_mt', 'unbatched_marching_cubes']

_VERTS_TEMPLATE = np.array([
    [0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
    [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]], dtype=np.float32)
_FACES_TEMPLATE = np.array([[0, 2, 1, 3], [0, 1, 4, 5], [0, 4, 2, 6]])
_QUAD_FACE = np.array([[0, 1, 3, 2]])

# 6-tetrahedra decomposition of the unit cube (all sharing diagonal 0-7)
_CUBE_TETS = np.array([
    [0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7],
    [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]], dtype=np.int64)


def _faces_3x4x3():
    f = _VERTS_TEMPLATE[_FACES_TEMPLATE]  # (3, 4, 3)
    f = f.copy()
    for i in range(3):
        f[i, :, (i - 1) % 3] -= 1
        f[i, :, (i + 1) % 3] -= 1
    return f


def voxelgrids_to_cubic_meshes(voxelgrids, is_trimesh=True):
    """Convert binary voxelgrids to cuboid surface meshes ("Cubify").

    Parity: ``kaolin/ops/conversions/voxelgrid.py:56``.

    Args:
        voxelgrids: ``(B, X, Y, Z)`` binary occupancy.
        is_trimesh: triangles (True) or quads.

    Returns:
        (list of verts (V, 3), list of faces (F, 3|4)).
    """
    grids = np.asarray(voxelgrids).astype(np.float32)
    B = grids.shape[0]
    padded = np.pad(grids, ((0, 0), (1, 1), (1, 1), (1, 1)))
    faces3 = _faces_3x4x3()

    verts_batch, faces_batch = [], []
    for b in range(B):
        g = padded[b]
        all_faces_loc = []
        all_invert = []
        # boundary between cell (i-1) and cell (i) along each axis:
        # diff = g[i] - g[i-1]; +1 = face looking -axis, -1 = +axis
        for axis in range(3):
            d = np.diff(g, axis=axis)
            idx = np.nonzero(d)
            vals = d[idx]
            loc = np.stack(idx, axis=-1).astype(np.float32)
            # conv3d with flipped kernel offsets: positions line up with
            # the face anchor used by the reference template
            template = faces3[axis]  # (4, 3)
            # diff index along the axis IS the original-frame plane
            # coordinate; the template's -1 offsets on the other axes span
            # the right unit square
            quads = template[None] + loc[:, None, :]  # (n, 4, 3)
            all_faces_loc.append(quads)
            all_invert.append(vals < 0)
        if not all_faces_loc or sum(x.shape[0] for x in all_faces_loc) == 0:
            verts_batch.append(jnp.zeros((0, 3)))
            faces_batch.append(jnp.zeros((0, 3 if is_trimesh else 4),
                                         dtype=jnp.int32))
            continue
        faces_loc = np.concatenate(all_faces_loc, axis=0)  # (N, 4, 3)
        invert = np.concatenate(all_invert, axis=0)        # (N,)
        N = faces_loc.shape[0]
        verts = faces_loc.reshape(-1, 3)
        faces = _QUAD_FACE[None] + (np.arange(N)[:, None] * 4)[:, :, None]
        faces = faces.reshape(-1, 4)
        faces[invert] = faces[invert][:, ::-1]
        if is_trimesh:
            faces = np.concatenate(
                [faces[:, [0, 3, 1]], faces[:, [2, 1, 3]]], axis=0)
        uverts, inv = np.unique(verts, axis=0, return_inverse=True)
        faces = inv.reshape(-1)[faces.reshape(-1)].reshape(faces.shape)
        verts_batch.append(jnp.asarray(uverts))
        faces_batch.append(jnp.asarray(faces))
    return verts_batch, faces_batch


def _next_pow2(n):
    return 1 << max(4, int(n - 1).bit_length())


def voxelgrids_to_trianglemeshes(voxelgrids, iso_value=0.5):
    """Extract iso-surface triangle meshes via marching cubes.

    Parity: ``kaolin/ops/conversions/voxelgrid.py:169`` — matches the
    reference CUDA op's exact vertex/face ordering (unique-vertex
    Lorensen MC, see ``_mcube.py``).  Vertex coordinates live in the
    padded-grid frame (voxel (0, 0, 0) center at (1, 1, 1)).

    Args:
        voxelgrids: ``(B, X, Y, Z)`` occupancy / density values.
        iso_value: iso level in [0, 1].

    Returns:
        (list of verts (V, 3) float, list of faces (F, 3) int).
    """
    from kaolin_tpu.ops.conversions._mcube import (
        unbatched_marching_cubes, _CORNERS, _NPART, _NTRI)
    grids = np.asarray(voxelgrids).astype(np.float32)
    B = grids.shape[0]
    padded = np.pad(grids, ((0, 0), (1, 1), (1, 1), (1, 1)))
    verts_list, faces_list = [], []
    for b in range(B):
        g = padded[b]
        if np.all(grids[b] == 0):
            verts_list.append(jnp.zeros((0, 3)))
            faces_list.append(jnp.zeros((0, 3), dtype=jnp.int32))
            continue
        # host pre-count to size the static output buffers
        gext = np.pad(g, ((0, 1),) * 3, mode='edge')
        D0, D1, D2 = g.shape
        ci = np.zeros((D0, D1, D2), np.int32)
        for k, (o0, o1, o2) in enumerate(_CORNERS):
            ci |= (gext[o0:o0 + D0, o1:o1 + D1, o2:o2 + D2]
                   < iso_value).astype(np.int32) << k
        nv = int(_NPART[ci].sum())
        nf = int(_NTRI[ci].sum())
        verts, faces, _, _ = unbatched_marching_cubes(
            jnp.asarray(g), iso_value, _next_pow2(nv), _next_pow2(nf))
        verts_list.append(verts[:nv])
        faces_list.append(faces[:nf])
    return verts_list, faces_list


def voxelgrids_to_trianglemeshes_mt(voxelgrids, iso_value=0.5):
    """Iso-surface extraction by marching tetrahedra (6-tet cells).

    Alternative extractor: same surface as marching cubes but a denser
    triangulation with vertices also on cell diagonals.  Same coordinate
    convention as :func:`voxelgrids_to_trianglemeshes`.
    """
    from kaolin_tpu.ops.conversions.tetmesh import (
        _unbatched_marching_tetrahedra)
    grids = np.asarray(voxelgrids).astype(np.float32)
    B = grids.shape[0]
    padded = np.pad(grids, ((0, 0), (1, 1), (1, 1), (1, 1)))
    X, Y, Z = padded.shape[1:]
    verts_list, faces_list = [], []

    # grid vertices = padded voxel centers at integer coords
    coords = np.stack(np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z),
                                  indexing='ij'), axis=-1).reshape(-1, 3)
    # cell corner offsets in _VERTS_TEMPLATE order
    corner_off = _VERTS_TEMPLATE.astype(np.int64)
    cells = np.stack(np.meshgrid(np.arange(X - 1), np.arange(Y - 1),
                                 np.arange(Z - 1), indexing='ij'),
                     axis=-1).reshape(-1, 3)

    def vid(pts):
        return (pts[..., 0] * Y + pts[..., 1]) * Z + pts[..., 2]

    cell_corners = vid(cells[:, None, :] + corner_off[None])  # (C, 8)
    tets = cell_corners[:, _CUBE_TETS.reshape(-1)].reshape(-1, 4)

    for b in range(B):
        values = padded[b].reshape(-1)
        if np.all(values <= iso_value):
            verts_list.append(jnp.zeros((0, 3)))
            faces_list.append(jnp.zeros((0, 3), dtype=jnp.int32))
            continue
        occ = values - iso_value  # sdf-like: > 0 inside
        # only keep tets touching the surface to bound work
        occ_t = occ[tets] > 0
        n_in = occ_t.sum(1)
        active = (n_in > 0) & (n_in < 4)
        verts, faces = _unbatched_marching_tetrahedra(
            jnp.asarray(coords.astype(np.float32)), tets[active],
            jnp.asarray(occ), False)
        verts_list.append(verts)
        faces_list.append(faces.astype(jnp.int32))
    return verts_list, faces_list
