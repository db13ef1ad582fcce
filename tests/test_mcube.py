"""Marching cubes tests.

Parity targets: the reference's exact expected tensors from
``tests/python/kaolin/ops/conversions/test_voxelgrid.py:254-480`` (the
CUDA ``unbatched_mcube`` vertex/face ordering), its rotation/flip
variation sweep (:1114-1128), plus gradient and non-binary iso tests
the reference lacks (its CUDA op has no backward).
"""
import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kaolin_tpu.ops.conversions.voxelgrid import (
    voxelgrids_to_trianglemeshes, voxelgrids_to_trianglemeshes_mt)
from kaolin_tpu.ops.conversions._mcube import unbatched_marching_cubes


def _run(vg):
    v, f = voxelgrids_to_trianglemeshes(np.asarray(vg, np.float32)[None])
    return np.asarray(v[0]), np.asarray(f[0])


CASES = []

CASES.append((  # reference test_voxelgrids_to_trianglemeshes_0
    [[[1, 0], [0, 0]], [[0, 0], [0, 0]]],
    [[1, 1, .5], [1, .5, 1], [.5, 1, 1], [1, 1, 1.5], [1, 1.5, 1],
     [1.5, 1, 1]],
    [[0, 1, 2], [3, 2, 1], [4, 0, 2], [4, 2, 3], [0, 5, 1], [5, 3, 1],
     [4, 5, 0], [5, 4, 3]]))

CASES.append((  # reference test 1
    [[[1, 1], [0, 0]], [[0, 0], [0, 0]]],
    [[1, 1, .5], [.5, 1, 1], [1, .5, 1], [1, .5, 2], [.5, 1, 2],
     [1, 1, 2.5], [1, 1.5, 1], [1, 1.5, 2], [1.5, 1, 1], [1.5, 1, 2]],
    [[0, 2, 1], [3, 4, 1], [3, 1, 2], [5, 4, 3], [6, 0, 1], [6, 1, 4],
     [6, 4, 7], [7, 4, 5], [0, 8, 2], [9, 3, 2], [9, 2, 8], [9, 5, 3],
     [6, 8, 0], [8, 6, 7], [8, 7, 9], [9, 7, 5]]))

CASES.append((  # reference test 2 (diagonal pair)
    [[[1, 0], [0, 0]], [[0, 1], [0, 0]]],
    [[1, 1, .5], [1, .5, 1], [.5, 1, 1], [1, 1, 1.5], [1, 1.5, 1],
     [2, 1, 1.5], [1.5, 1, 1], [2, .5, 2], [1.5, 1, 2], [2, 1, 2.5],
     [2, 1.5, 2], [2.5, 1, 2]],
    [[0, 1, 2], [3, 2, 1], [4, 0, 2], [4, 2, 3], [0, 6, 1], [1, 6, 5],
     [7, 1, 5], [1, 8, 3], [1, 7, 8], [9, 8, 7], [4, 6, 0], [10, 5, 6],
     [4, 10, 6], [10, 3, 8], [10, 4, 3], [10, 8, 9], [5, 11, 7],
     [11, 9, 7], [10, 11, 5], [11, 10, 9]]))

CASES.append((  # reference test 3 (L shape)
    [[[0, 1], [1, 1]], [[0, 0], [0, 0]]],
    [[1, 1, 1.5], [1, .5, 2], [.5, 1, 2], [1, 1, 2.5], [1, 2, .5],
     [1, 1.5, 1], [.5, 2, 1], [1, 2, 2.5], [.5, 2, 2], [1, 2.5, 1],
     [1, 2.5, 2], [1.5, 1, 2], [1.5, 2, 1], [1.5, 2, 2]],
    [[0, 1, 2], [3, 2, 1], [4, 5, 6], [6, 5, 0], [2, 6, 0], [8, 6, 2],
     [2, 3, 7], [2, 7, 8], [9, 4, 6], [9, 6, 8], [9, 8, 10], [10, 8, 7],
     [0, 11, 1], [11, 3, 1], [4, 12, 5], [11, 0, 5], [12, 11, 5],
     [13, 11, 12], [13, 7, 3], [13, 3, 11], [9, 12, 4], [12, 9, 10],
     [12, 10, 13], [13, 10, 7]]))

CASES.append((  # reference test 4 (full 2x2 slab)
    [[[1, 1], [1, 1]], [[0, 0], [0, 0]]],
    [[1, 1, .5], [.5, 1, 1], [1, .5, 1], [1, .5, 2], [.5, 1, 2],
     [1, 1, 2.5], [1, 2, .5], [.5, 2, 1], [1, 2, 2.5], [.5, 2, 2],
     [1, 2.5, 1], [1, 2.5, 2], [1.5, 1, 1], [1.5, 1, 2], [1.5, 2, 1],
     [1.5, 2, 2]],
    [[0, 2, 1], [3, 4, 1], [3, 1, 2], [5, 4, 3], [0, 1, 7], [0, 7, 6],
     [9, 1, 4], [7, 1, 9], [4, 5, 8], [4, 8, 9], [10, 6, 7], [10, 7, 9],
     [10, 9, 11], [11, 9, 8], [0, 12, 2], [13, 3, 2], [13, 2, 12],
     [13, 5, 3], [6, 14, 12], [6, 12, 0], [12, 15, 13], [12, 14, 15],
     [15, 8, 5], [15, 5, 13], [10, 14, 6], [14, 10, 11], [14, 11, 15],
     [15, 11, 8]]))


@pytest.mark.parametrize('case', range(len(CASES)))
def test_reference_exact(case):
    vg, ev, ef = CASES[case]
    v, f = _run(vg)
    np.testing.assert_array_equal(v, np.asarray(ev, np.float32))
    np.testing.assert_array_equal(f, np.asarray(ef))


@pytest.mark.parametrize('case', [0, 2, 3])
def test_all_variations(case):
    """Rotation/flip sweep: sorted vertex columns must transform with the
    grid (reference ``_all_variations_test``, test_voxelgrid.py:1114)."""
    vg, ev, _ = CASES[case]
    vg = np.asarray(vg, np.float32)
    ev = np.asarray(ev, np.float32)
    dims = np.asarray(vg.shape, np.float32)
    for perm in itertools.permutations(range(3)):
        pvg = np.transpose(vg, perm)
        pev = ev[:, list(perm)]
        pdims = dims[list(perm)]
        for flips in itertools.chain.from_iterable(
                itertools.combinations(range(3), r) for r in range(4)):
            fvg = pvg
            fev = pev.copy()
            for ax in flips:
                fvg = np.flip(fvg, axis=ax)
                fev[:, ax] = (pdims[ax] + 1.0) - fev[:, ax]
            got, _ = _run(fvg)
            np.testing.assert_allclose(np.sort(got, axis=0),
                                       np.sort(fev, axis=0), atol=1e-6)


def test_empty_and_batched():
    vg = np.zeros((3, 2, 2, 2), np.float32)
    vg[1, 0, 0, 0] = 1
    vg[2] = np.asarray(CASES[1][0])
    verts, faces = voxelgrids_to_trianglemeshes(vg)
    assert verts[0].shape == (0, 3) and faces[0].shape == (0, 3)
    np.testing.assert_array_equal(np.asarray(verts[1]),
                                  np.asarray(CASES[0][1], np.float32))
    np.testing.assert_array_equal(np.asarray(faces[2]),
                                  np.asarray(CASES[1][2]))


def test_non_binary_iso_interpolation():
    """Vertices interpolate the scalar field: t = (iso - f0) / (f1 - f0)."""
    vg = np.zeros((2, 2, 2), np.float32)
    vg[0, 0, 0] = 0.8  # other corners 0; iso 0.5
    v, f = _run(vg)
    # single occupied voxel -> 6 vertices; crossing at t where the field
    # goes 0.8 -> 0: vertex offset = (0.5 - 0.8) / (0.0 - 0.8) = 0.375
    assert v.shape == (6, 3)
    d = np.abs(v - 1.0)  # distance from the voxel center (1,1,1)
    np.testing.assert_allclose(np.sort(d, axis=1)[:, -1], 0.375, atol=1e-6)


def test_watertight_closed_surface():
    """Every undirected edge of a padded binary grid's MC mesh is shared
    by exactly two faces (closed 2-manifold)."""
    rng = np.random.RandomState(0)
    vg = (rng.rand(5, 5, 5) > 0.6).astype(np.float32)
    v, f = _run(vg)
    assert f.shape[0] > 0
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    assert (f < v.shape[0]).all() and (f >= 0).all()


def test_consistent_with_marching_tets_volume():
    """MC and marching-tet surfaces enclose the same voxels: both meshes'
    vertices lie on the same iso transitions (compare bounding boxes and
    vertex count scale)."""
    rng = np.random.RandomState(1)
    vg = (rng.rand(4, 4, 4) > 0.5).astype(np.float32)
    (vmc, fmc), (vmt, fmt) = (
        voxelgrids_to_trianglemeshes(vg[None]),
        voxelgrids_to_trianglemeshes_mt(vg[None]))
    vmc, vmt = np.asarray(vmc[0]), np.asarray(vmt[0])
    np.testing.assert_allclose(vmc.min(0), vmt.min(0), atol=1e-5)
    np.testing.assert_allclose(vmc.max(0), vmt.max(0), atol=1e-5)


def test_gradient_through_vertices():
    """Vertex positions are differentiable w.r.t. the grid values (the
    reference CUDA op has no backward; voxelgrid.py:165-167)."""
    g = jnp.zeros((4, 4, 4)).at[1, 1, 1].set(0.8).at[1, 1, 2].set(0.7)

    def loss(grid):
        v, f, nv, nf = unbatched_marching_cubes(grid, 0.5, 64, 128)
        return jnp.sum(v ** 2)

    grad = jax.grad(loss)(g)
    assert jnp.isfinite(grad).all()
    assert jnp.abs(grad[1, 1, 1]) > 0
    # grid cells far from the surface get no gradient
    assert grad[3, 3, 3] == 0


def test_jit_static_capacity_counts():
    """The jit core reports true counts and pads the rest."""
    g = jnp.asarray(np.pad(np.asarray(CASES[0][0], np.float32),
                           ((1, 1),) * 3))
    v, f, nv, nf = unbatched_marching_cubes(g, 0.5, 32, 32)
    assert int(nv) == 6 and int(nf) == 8
    assert (np.asarray(v[6:]) == 0).all()
