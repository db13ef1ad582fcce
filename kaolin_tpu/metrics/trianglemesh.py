"""Triangle mesh metrics: point-to-mesh distance, edge length, smoothing.

Parity: ``kaolin/metrics/trianglemesh.py`` (reference).  The CUDA
closest-feature classification (``unbatched_triangle_distance_cuda.cu``)
becomes a chunked vectorized sweep; selection (argmin face) is
non-differentiable, distance is recomputed on the selected face so the
backward is O(points) — exactly the trick the reference naive version uses
(``metrics/trianglemesh.py:226-231``).

Distance types (reference :143-151): 0 face plane, 1-3 vertices, 4-6 edges.
"""

import jax
import jax.numpy as jnp

from kaolin_tpu.ops.mesh.mesh import uniform_laplacian

__all__ = ['point_to_mesh_distance', 'average_edge_length',
           'uniform_laplacian_smoothing']


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _closest_point_on_tri(points, v1, v2, v3):
    """Closest point on triangle(s) + distance type.

    points: (..., 3); v1/v2/v3: (..., 3) broadcast-compatible.

    Returns:
        (closest (..., 3), dist_type (...,) int32).
    """
    e21 = v2 - v1
    e32 = v3 - v2
    e13 = v1 - v3
    normals = -jnp.cross(e21, e13)

    def proj_edge(v, e, p):
        return _dot(p - v, e) / _dot(e, e)

    uab = proj_edge(v1, e21, points)
    ubc = proj_edge(v2, e32, points)
    uca = proj_edge(v3, e13, points)

    def not_above(v, e, p):
        edge_norm = jnp.cross(normals, e)
        return _dot(edge_norm, p - v) <= 0

    is_type1 = (uca > 1.) & (uab < 0.)
    is_type2 = (uab > 1.) & (ubc < 0.)
    is_type3 = (ubc > 1.) & (uca < 0.)
    is_type4 = (uab >= 0.) & (uab <= 1.) & not_above(v1, e21, points)
    is_type5 = (ubc >= 0.) & (ubc <= 1.) & not_above(v2, e32, points)
    is_type6 = (uca >= 0.) & (uca <= 1.) & not_above(v3, e13, points)

    # additive composition matches the reference's dist_type output
    # (``metrics/trianglemesh.py:206-208``)
    all_types = (is_type1 * 1 + is_type2 * 2 + is_type3 * 3
                 + is_type4 * 4 + is_type5 * 5 + is_type6 * 6)

    unit_normal = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    plane_pt = points - unit_normal * _dot(points - v1, unit_normal)[..., None]

    def point_at(v, e, u):
        return v + e * u[..., None]

    # reference assigns closest points per type in order 0,1,...,6 with later
    # types overwriting — so higher types take priority on (degenerate)
    # overlaps; mirror that with a 6-first nested select
    closest = jnp.where(
        is_type6[..., None], point_at(v3, e13, uca), jnp.where(
            is_type5[..., None], point_at(v2, e32, ubc), jnp.where(
                is_type4[..., None], point_at(v1, e21, uab), jnp.where(
                    is_type3[..., None], v3, jnp.where(
                        is_type2[..., None], v2, jnp.where(
                            is_type1[..., None], v1, plane_pt))))))
    return closest, all_types.astype(jnp.int32)


def _unbatched_point_to_mesh(points, face_vertices, chunk_size=1024):
    P = points.shape[0]
    pad = (-P) % chunk_size
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    v1 = face_vertices[:, 0][None]  # (1, F, 3)
    v2 = face_vertices[:, 1][None]
    v3 = face_vertices[:, 2][None]

    def chunk_fn(p):  # (chunk, 3)
        closest, _ = _closest_point_on_tri(p[:, None, :], v1, v2, v3)
        d = jnp.sum((closest - p[:, None, :]) ** 2, axis=-1)  # (chunk, F)
        return jnp.argmin(d, axis=1)

    idx = jax.lax.map(chunk_fn, pts.reshape(-1, chunk_size, 3))
    idx = idx.reshape(-1)[:P]

    sel = face_vertices[idx]  # (P, 3, 3)
    closest, dist_type = _closest_point_on_tri(
        points, sel[:, 0], sel[:, 1], sel[:, 2])
    dist = jnp.sum((closest - points) ** 2, axis=-1)
    return dist, idx, dist_type


def point_to_mesh_distance(pointclouds, face_vertices, chunk_size=1024):
    """Squared distance from points to the closest mesh face, with the
    winning face index and the closest-feature type.

    Parity: ``kaolin/metrics/trianglemesh.py:20``.

    Args:
        pointclouds: ``(B, P, 3)``.
        face_vertices: ``(B, F, 3, 3)``.

    Returns:
        (distance ``(B, P)`` differentiable, face_idx ``(B, P)``,
        dist_type ``(B, P)`` int32).
    """
    return jax.vmap(
        lambda p, f: _unbatched_point_to_mesh(p, f, chunk_size)
    )(pointclouds, face_vertices)


def average_edge_length(vertices, faces):
    """Average of the three edge lengths per face.

    Parity: ``kaolin/metrics/trianglemesh.py:271``.
    """
    faces = jnp.asarray(faces)
    p1 = vertices[:, faces[:, 0]]
    p2 = vertices[:, faces[:, 1]]
    p3 = vertices[:, faces[:, 2]]
    el1 = jnp.linalg.norm(p2 - p1, axis=2)
    el2 = jnp.linalg.norm(p3 - p1, axis=2)
    el3 = jnp.linalg.norm(p2 - p3, axis=2)
    return (el1 + el2 + el3) / 3.


def uniform_laplacian_smoothing(vertices, faces):
    """One step of uniform laplacian smoothing: ``V + L V``.

    Parity: ``kaolin/metrics/trianglemesh.py:310``.
    """
    num_vertices = vertices.shape[1]
    L = uniform_laplacian(num_vertices, faces).astype(vertices.dtype)
    return jnp.matmul(L, vertices) + vertices
