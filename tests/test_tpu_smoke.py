"""Opt-in real-TPU smoke tests (VERDICT r3 weak #6: nothing in CI ever
executed the compiled Mosaic kernels — interpret mode can't catch
Mosaic-specific regressions like the r02 90s-compile incident).

Run with ``KAOLIN_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py``
on a machine with a TPU attached; skipped everywhere else.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

tpu = pytest.mark.skipif(jax.default_backend() != 'tpu',
                         reason='needs a real TPU (KAOLIN_TPU_TESTS=1)')


@tpu
def test_fused_selection_compiles_at_512():
    """Compile + run the fused Pallas selection at the driver-config-#2
    shape (512^2, 10k faces) on real Mosaic."""
    from kaolin_tpu.render.mesh import fused_selection

    rng = np.random.default_rng(0)
    F = 10000
    centers = rng.uniform(-0.8, 0.8, (1, F, 1, 2))
    offsets = rng.uniform(-0.05, 0.05, (1, F, 3, 2))
    fvi = jnp.asarray((centers + offsets).astype(np.float32))
    fvz = jnp.asarray(-rng.uniform(1., 3., (1, F, 3)).astype(np.float32))
    valid = jnp.ones((1, F), bool)

    sel = fused_selection(fvz, fvi, valid, 512, 512)
    jax.block_until_ready(sel.face_idx)
    # one scalar readback = a true device fence + sanity signal
    covered = int(jnp.sum(sel.face_idx >= 0))
    assert sel.face_idx.shape == (1, 512, 512)
    assert covered > 0


@tpu
def test_chunked_raytrace_runs_level10():
    """Compile + run the chunked BFS on a small random level-10 octree."""
    from kaolin_tpu.ops.spc.points import unbatched_points_to_octree_np
    from kaolin_tpu.ops.spc.spc import scan_octrees
    from kaolin_tpu.render.spc.raytrace import unbatched_raytrace

    rng = np.random.default_rng(1)
    # volume "dust" octrees are the worst case for intermediate BFS
    # frontiers (a straight ray crosses ~5 occupied mid-level voxels per
    # 5k points) — keep the cloud small and the capacity generous
    pts = rng.integers(0, 1024, (1000, 3))
    octree = unbatched_points_to_octree_np(pts, 10)
    _, pyramids, exsum = scan_octrees(octree, np.array([octree.shape[0]]))
    n = 1 << 17
    origin = jnp.asarray(np.stack([
        rng.uniform(-0.9, 0.9, n), rng.uniform(-0.9, 0.9, n),
        np.full(n, -2.5)], -1).astype(np.float32))
    direction = jnp.asarray(np.broadcast_to(
        np.array([0., 0., 1.], np.float32), (n, 3)).copy())
    ridx, pidx, depths, info = unbatched_raytrace(
        octree, None, pyramids[0], exsum, origin, direction, 10,
        trim=False, return_info=True, chunk_rays=1 << 16,
        max_nuggets=16 * n)
    count = int(info.count)
    assert count > 0
    assert not bool(info.saturated)
