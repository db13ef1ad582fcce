"""Benchmark: DIB-R 512x512 fwd+bwd throughput + SPC raytrace throughput.

Prints JSON lines {"metric", "value", "unit", "vs_baseline", ...}; the
LAST stdout line is always the most complete result.  A provisional line
is emitted the moment the first (headline) number exists, so a driver
timeout can never lose the round's measurement again (BENCH_r03 was
rc=124 with zero output).

Structure (driver budget-proof):

* ``bench.py`` (no args) is a thin WATCHDOG: it spawns ``bench.py
  --phases`` as a child, forwards the child's output live, and on a
  hard deadline (BENCH_HARD_CAP_S, default 1200 s) kills the child and
  re-prints the last JSON seen (or an error line) so rc is always 0
  and stdout always ends in parseable JSON.
* ``--phases`` orders work by value-per-second: fused DIB-R first
  (headline Mpixels/s/chip, driver config #2), then SPC raytrace
  (config #3, rays/s), then the pure-XLA jnp baseline for
  ``vs_baseline`` — later phases are skipped when the soft budget
  (BENCH_BUDGET_S, default 900 s) runs out.

Workloads:
* DIB-R (config #2): fox.obj (10k faces) at 512^2 with UV textures +
  SH lighting, gradients to vertices/texture/lighting.  The step is the
  TPU-native two-program structure (selection passes + differentiable
  grad epilogue) used by the training loop itself.
* SPC (config #3): fox.obj voxelized to a level-10 octree via the
  jit-able DEVICE builder (host fallback), 1M camera rays traced by the
  Mosaic raster engine (``render/spc/raster.py``) at knum=192
  (non-saturating, exact per-ray counts; verified post-run).

``vs_baseline`` is the speedup of the fused selection backend over the
pure-XLA 'jnp' one on the same chip (the reference publishes no absolute
numbers — see BASELINE.md).  Extra keys: ``triangles_per_s`` (fox, 10k
faces) + ``triangles_per_s_168k``-style hires point (subdivided fox),
``spc_raytrace_rays_per_s``, ``deftet_pixels_per_s``, and
``dibr_phase_ms`` (per-phase roofline anchor).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T0 = time.perf_counter()
# generous caps: the tunneled TPU's control channel can stall 5-10 min
# at client startup (observed repeatedly right after a previous TPU
# process exits); the watchdog forwards every line live, so even if the
# DRIVER kills this process first, everything emitted so far is already
# in its captured tail
SOFT_BUDGET = float(os.environ.get('BENCH_BUDGET_S', '900'))
HARD_CAP = float(os.environ.get('BENCH_HARD_CAP_S', '1200'))


def _elapsed():
    return time.perf_counter() - T0


def _log(msg):
    print(f'[bench {_elapsed():6.1f}s] {msg}', file=sys.stderr, flush=True)


def _emit(out):
    print(json.dumps(out), flush=True)


# --------------------------------------------------------------------------
# phases (child process)
# --------------------------------------------------------------------------

def _result(mpix, vs_baseline, tris_per_s=None, rays_per_s=None, errors=None):
    out = {
        "metric": "dibr_fwd_bwd_512",
        "value": round(mpix, 3),
        "unit": "Mpixels/s/chip",
        "vs_baseline": round(vs_baseline, 3),
    }
    if tris_per_s is not None:
        out["triangles_per_s"] = round(tris_per_s)
    if rays_per_s is not None:
        out["spc_raytrace_rays_per_s"] = round(rays_per_s)
    if errors:
        out["errors"] = errors
    return out


def _load_mesh():
    import numpy as np
    from kaolin_tpu.io import obj
    mesh = obj.import_mesh('/root/reference/sample_data/meshes/fox.obj',
                           triangulate=True)
    _log(f'fox.obj loaded: {np.asarray(mesh.faces).shape[0]} faces')
    return mesh


def _build_dibr(mesh, backend, height, width):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from kaolin_tpu.models import inverse_render as M

    faces = jnp.asarray(np.asarray(mesh.faces))
    face_uvs = jnp.asarray(np.asarray(mesh.uvs)[np.asarray(mesh.face_uvs_idx)])
    params = M.init_params(mesh, texture_res=256)
    views = M.make_views(1)
    target_images = jnp.zeros((1, height, width, 3))
    target_masks = jnp.zeros((1, height, width))

    def selection_raw(p):
        return M.compute_selection(p, views, faces, height, width,
                                   backend=backend)

    grad_raw = jax.grad(
        lambda p, sel: M.render_loss(
            p, views, faces, face_uvs, target_images, target_masks,
            height, width, selection=sel))

    def step_raw(p):
        """One full training step ending in a params-shaped pytree, so
        K steps chain inside a fori_loop (gradient applied with weight
        1e-30 — an untouched trajectory in fp32, but not a multiply
        XLA can constant-fold away like 0.0)."""
        g = grad_raw(p, selection_raw(p))
        return jax.tree_util.tree_map(lambda a, b: a - 1e-30 * b, p, g)

    t0 = time.perf_counter()
    sel = jax.jit(selection_raw)(params)
    jax.block_until_ready(sel)
    _log(f'{backend} selection compiled+ran in {time.perf_counter()-t0:.1f}s')
    t0 = time.perf_counter()
    g = jax.jit(grad_raw)(params, sel)
    jax.block_until_ready(g)
    _log(f'{backend} grad epilogue compiled+ran in '
         f'{time.perf_counter()-t0:.1f}s')
    return step_raw, params, int(faces.shape[0])


def _fence(x):
    """True device fence: a 4-byte scalar readback.  On the tunneled TPU
    platform ``block_until_ready`` can return before the computation
    finishes (measured: it inflated throughput up to 100x), so the only
    reliable completion signal is a data readback."""
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0])


def _time_steps_scan(step_fn, params, K):
    """Latency-free step timing: run K dependency-chained steps inside
    ONE jitted fori_loop (single dispatch — a python-level chain pays a
    multi-RTT tunnel round trip per step, which dwarfs the compute), and
    fence with a scalar readback.  Returns (seconds_per_step, rtt)."""
    import jax

    @jax.jit
    def multi(p):
        return jax.lax.fori_loop(0, K, lambda i, q: step_fn(q), p)

    out = multi(params)              # compile + first run
    _fence(out)
    t0 = time.perf_counter()
    _fence(out)
    rtt = time.perf_counter() - t0   # readback round-trip to subtract
    t0 = time.perf_counter()
    out = multi(params)
    _fence(out)
    dt = time.perf_counter() - t0 - rtt
    return max(dt, 1e-9) / K, rtt


def _phase_spc(mesh):
    """Config #3: level-10 octree from fox.obj, 1M rays.

    The octree build goes through the jit-able DEVICE builder
    (``unbatched_mesh_to_spc_device``, the TPU redesign of
    ``mesh_to_spc_cuda.cu:309-456``) with the host builder as fallback;
    the trace uses the Mosaic raster engine (coherent camera rays,
    ``render/spc/raster.py``) with exact per-ray hit counts at
    knum=192 (> the scene's max 179 hits/ray).  Returns
    (rays/s, saturation flag (device), total-hit count (device)).
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from kaolin_tpu.ops.conversions.trianglemesh import (
        unbatched_mesh_to_spc, unbatched_mesh_to_spc_device)
    from kaolin_tpu.ops.spc.spc import scan_octrees, generate_points
    from kaolin_tpu.render.spc.raster import (
        build_cell_table, unbatched_raytrace_coherent, _block_order)

    level = 10
    v = np.asarray(mesh.vertices, np.float64)
    c = (v.min(0) + v.max(0)) / 2
    s = (v.max(0) - v.min(0)).max() / 2 * 1.05
    v = (v - c) / s
    fv = v[np.asarray(mesh.faces)]
    t0 = time.perf_counter()
    try:
        octree_d, points, face_idx, bary = unbatched_mesh_to_spc_device(
            jnp.asarray(fv, jnp.float32), level)
        octree = np.asarray(octree_d)   # ~330KB d2h: scan runs on host
        _log(f'mesh_to_spc DEVICE level={level}: '
             f'{time.perf_counter()-t0:.1f}s, {points.shape[0]} voxels')
    except Exception as e:
        _log(f'device builder failed ({type(e).__name__}: {e}); '
             'falling back to host')
        t0 = time.perf_counter()
        octree, points, face_idx, bary = unbatched_mesh_to_spc(fv, level)
        _log(f'mesh_to_spc host level={level}: '
             f'{time.perf_counter()-t0:.1f}s, {points.shape[0]} voxels')
    max_level, pyramids, exsum = scan_octrees(
        octree, np.array([octree.shape[0]]))
    pyr0 = np.asarray(pyramids)[0]
    point_hierarchy = generate_points(jnp.asarray(octree), pyramids, exsum)
    t0 = time.perf_counter()
    table = build_cell_table(point_hierarchy, pyr0, level)
    _log(f'cell table: {time.perf_counter()-t0:.1f}s')

    n_rays = 1024 * 1024
    side = 1024
    ys, xs = np.meshgrid(np.linspace(-0.9, 0.9, side),
                         np.linspace(-0.9, 0.9, side), indexing='ij')
    origin = np.stack(
        [xs.ravel(), ys.ravel(), np.full(side * side, -2.5)],
        -1).astype(np.float32)
    direction = np.stack([xs.ravel() * 0.1, ys.ravel() * 0.1,
                          np.ones(side * side)], -1)
    direction = (direction / np.linalg.norm(
        direction, axis=-1, keepdims=True)).astype(np.float32)
    # block tiling (4x4 pixel beams): permute once, outside the loop
    perm, _ = _block_order(side, side, 4, 4)
    origin = jnp.asarray(origin[perm])
    direction = jnp.asarray(direction[perm])

    # knum=256 > the scene's max hits/ray (179 per-column worst case)
    # and equals the kernel k-buffer, so the output slice is a no-op;
    # non-saturation is re-verified after the JSON is banked; all
    # settings are the best NON-SATURATING config from the on-chip
    # sweep (scripts/probe_r5_tune*.py: 10.0 Mrays/s, exact hit count)
    kwargs = dict(engine='mosaic', cell_table=table, knum=256,
                  with_exit=False, max_active_blocks=8192,
                  rays_per_tile=32, max_super_voxels=512 * 192,
                  segments=((512, 192), (1536, 48), (4096, 16),
                            (None, 4)))

    def rt_step(carry):
        o, sat, cnt = carry
        hits = unbatched_raytrace_coherent(
            octree, point_hierarchy, pyr0, exsum, o, direction, level,
            **kwargs)
        tn0 = jnp.where(jnp.isfinite(hits.t_near[:, :1]),
                        hits.t_near[:, :1], 0.)
        return (origin + 1e-30 * tn0, sat | hits.saturated,
                jnp.sum(hits.count))

    K = 4

    @jax.jit
    def multi(o):
        return jax.lax.fori_loop(
            0, K, lambda i, c: rt_step(c),
            (o, jnp.zeros((), bool), jnp.zeros((), jnp.int32)))

    t0 = time.perf_counter()
    out = multi(origin)
    _fence(out[0])
    _log(f'raytrace compiled+ran in {time.perf_counter()-t0:.1f}s')
    t0 = time.perf_counter()
    _fence(out[0])
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = multi(origin)
    _fence(out[0])
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / K
    _log(f'raytrace: {dt*1e3:.1f} ms/iter (fence rtt {rtt*1e3:.0f} ms)')
    return n_rays / dt, out[1], out[2]


def _post_spc_check(saturated, count=None):
    """Best-effort saturation report (tiny d2h) — runs after all JSON
    lines are banked, so a stalled readback costs nothing."""
    _log(f'spc saturated={bool(saturated)}'
         + ('' if count is None else f' total_hits={int(count)}'))


def _phase_dibr_breakdown(mesh, height, width):
    """Per-phase DIB-R timings (selection fwd / epilogue fwd / epilogue
    bwd) + achieved rates vs the fused kernels' own CostEstimate."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from kaolin_tpu.models import inverse_render as M

    faces = jnp.asarray(np.asarray(mesh.faces))
    face_uvs = jnp.asarray(
        np.asarray(mesh.uvs)[np.asarray(mesh.face_uvs_idx)])
    params = M.init_params(mesh, texture_res=256)
    views = M.make_views(1)
    target_images = jnp.zeros((1, height, width, 3))
    target_masks = jnp.zeros((1, height, width))

    def sel_step(p):
        sel = M.compute_selection(p, views, faces, height, width,
                                  backend='fused')
        s0 = sel[1].prod.reshape(-1)[0]
        return jax.tree_util.tree_map(lambda a: a - 1e-30 * s0, p)

    sel = jax.jit(lambda p: M.compute_selection(
        p, views, faces, height, width, backend='fused'))(params)

    def loss_step(p):
        val = M.render_loss(p, views, faces, face_uvs, target_images,
                            target_masks, height, width, selection=sel)
        return jax.tree_util.tree_map(lambda a: a - 1e-30 * val, p)

    grad_fn = jax.grad(lambda p: M.render_loss(
        p, views, faces, face_uvs, target_images, target_masks,
        height, width, selection=sel))

    def grad_step(p):
        g = grad_fn(p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-30 * b, p, g)

    t_sel, _ = _time_steps_scan(sel_step, params, K=16)
    t_fwd, _ = _time_steps_scan(loss_step, params, K=16)
    t_grad, _ = _time_steps_scan(grad_step, params, K=16)
    phases = {
        'selection_fwd_ms': round(t_sel * 1e3, 2),
        'epilogue_fwd_ms': round(t_fwd * 1e3, 2),
        'epilogue_bwd_ms': round(max(t_grad - t_fwd, 0.) * 1e3, 2),
    }
    # roofline anchor: the fused forward kernel's own CostEstimate at
    # this shape vs achieved time (v5e VPU ~3.5e12 f32 flop/s peak)
    from kaolin_tpu.render.mesh import _fused as F
    B, Fn = 1, int(faces.shape[0])
    nC = -(-Fn // F.FC)
    hp, wp = F._padded_dims(height, width)
    nI, nJ, TW = F._tile_dims(hp, wp)
    T = nI * nJ
    est_flops = B * T * F.PS * TW * nC * F.FC // 4
    phases['selection_est_gflop'] = round(est_flops / 1e9, 2)
    phases['selection_achieved_gflops'] = round(
        est_flops / max(t_sel, 1e-9) / 1e9, 1)
    _log(f'dibr phases: {phases}')
    return phases


def _phase_dibr_hires_faces(mesh, height, width):
    """Second triangles/s point: subdivided fox (~42k faces; one Loop
    iteration — the fused engine's SMEM chunk-bbox table caps out near
    ~160k faces / 2500 chunks on v5e's 1MB SMEM)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from kaolin_tpu.ops.mesh.trianglemesh import subdivide_trianglemesh
    from kaolin_tpu.models import inverse_render as M

    v = jnp.asarray(np.asarray(mesh.vertices))[None]
    f = jnp.asarray(np.asarray(mesh.faces))
    v2, f2 = subdivide_trianglemesh(v, f, 1)
    n_faces = int(f2.shape[0])

    class _M:
        pass
    m2 = _M()
    m2.vertices = v2[0]
    params = M.init_params(m2, texture_res=256)
    views = M.make_views(1)
    face_uvs = jnp.zeros((n_faces, 3, 2), jnp.float32)
    target_images = jnp.zeros((1, height, width, 3))
    target_masks = jnp.zeros((1, height, width))

    def selection_raw(p):
        return M.compute_selection(p, views, f2, height, width,
                                   backend='fused')

    grad_raw = jax.grad(
        lambda p, sel: M.render_loss(
            p, views, f2, face_uvs, target_images, target_masks,
            height, width, selection=sel))

    def step(p):
        g = grad_raw(p, selection_raw(p))
        return jax.tree_util.tree_map(lambda a, b: a - 1e-30 * b, p, g)

    dt, rtt = _time_steps_scan(step, params, K=8)
    _log(f'hires dibr ({n_faces} faces): {dt*1e3:.1f} ms/step -> '
         f'{n_faces/dt/1e6:.2f} Mtris/s')
    return n_faces / dt, n_faces


def _phase_deftet(mesh):
    """Config #4: DefTet sparse k-buffer render fwd+bwd at 256^2 over
    the fox face soup.  Returns pixels/s (k-buffer depth-sorted render
    + gradient to image-space vertices)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from kaolin_tpu.models import inverse_render as M
    from kaolin_tpu.render.mesh.deftet import deftet_sparse_render

    H = W = 256
    P = H * W
    knum = 30
    faces = jnp.asarray(np.asarray(mesh.faces))
    params = M.init_params(mesh, texture_res=16)
    views = M.make_views(1)
    fvc, fvi, fn = jax.lax.stop_gradient(M._prepare(params, views, faces))
    fvz = fvc[..., 2]
    ys, xs = jnp.meshgrid(jnp.linspace(-1., 1., H),
                          jnp.linspace(-1., 1., W), indexing='ij')
    pixel_coords = jnp.stack([xs.reshape(-1), ys.reshape(-1)],
                             -1)[None]                       # (1, P, 2)
    render_ranges = jnp.broadcast_to(
        jnp.asarray([[-1e4, 0.]]), (P, 2))[None]
    feats = jnp.broadcast_to(fn[:, :, None, :],
                             fn.shape[:2] + (3, 3))          # normals

    def step(x):
        def loss_fn(fvi_in):
            out, fidx = deftet_sparse_render(
                pixel_coords, render_ranges, fvz, fvi_in, feats,
                knum=knum, max_candidates=2048, pixel_chunk=1024)
            return jnp.sum(jnp.where((fidx >= 0)[..., None], out, 0.))
        g = jax.grad(loss_fn)(x)
        return x - 1e-30 * g

    dt, rtt = _time_steps_scan(step, fvi, K=4)
    _log(f'deftet: {dt*1e3:.1f} ms/step (rtt {rtt*1e3:.0f} ms) -> '
         f'{P/dt/1e6:.2f} Mpix/s, knum={knum}')
    return P / dt


def run_phases():
    height = width = 512
    errors = {}
    import jax
    on_tpu = jax.default_backend() == 'tpu'

    mesh = _load_mesh()

    # ---- phase 1: fused DIB-R (headline) -----------------------------
    mpix = 0.0
    tris_per_s = None
    backend = 'fused' if on_tpu else 'jnp'
    try:
        step, params, n_faces = _build_dibr(mesh, backend, height, width)
        dt, rtt = _time_steps_scan(step, params, K=16)
        mpix = (height * width / dt) / 1e6
        tris_per_s = n_faces / dt
        _log(f'{backend}: {dt*1e3:.1f} ms/step (fence rtt {rtt*1e3:.0f} '
             f'ms) -> {mpix:.3f} Mpix/s')
    except Exception as e:  # pragma: no cover - defensive
        errors[backend] = f'{type(e).__name__}: {e}'
        _log(f'{backend} FAILED: {errors[backend]}')
    # bank the headline number immediately
    _emit(_result(mpix, 0.0, tris_per_s, errors=errors or None))

    # ---- phase 1b: DIB-R phase breakdown + hires triangles point -----
    dibr_phases = None
    hires = None
    if on_tpu and mpix > 0 and _elapsed() < SOFT_BUDGET - 300:
        try:
            dibr_phases = _phase_dibr_breakdown(mesh, height, width)
        except Exception as e:
            errors['dibr_phases'] = f'{type(e).__name__}: {e}'
            _log(f'dibr breakdown FAILED: {errors["dibr_phases"]}')
        try:
            hires = _phase_dibr_hires_faces(mesh, height, width)
        except Exception as e:
            errors['dibr_hires'] = f'{type(e).__name__}: {e}'
            _log(f'dibr hires FAILED: {errors["dibr_hires"]}')

    # ---- phase 2: SPC raytrace (config #3) ---------------------------
    rays_per_s = None
    spc_info = None
    if _elapsed() < SOFT_BUDGET - 120:
        try:
            rays_per_s, spc_sat, spc_cnt = _phase_spc(mesh)
            spc_info = (spc_sat, spc_cnt)
            _log(f'spc raytrace: {rays_per_s/1e6:.2f} Mrays/s')
        except Exception as e:
            errors['spc'] = f'{type(e).__name__}: {e}'
            _log(f'spc FAILED: {errors["spc"]}')
        _emit(_result(mpix, 0.0, tris_per_s, rays_per_s,
                      errors=errors or None))
    else:
        _log('skipping SPC phase (soft budget)')

    # ---- phase 2b: DefTet k-buffer render (config #4) ----------------
    deftet_pix_per_s = None
    if on_tpu and _elapsed() < SOFT_BUDGET - 90:
        try:
            deftet_pix_per_s = _phase_deftet(mesh)
        except Exception as e:
            errors['deftet'] = f'{type(e).__name__}: {e}'
            _log(f'deftet FAILED: {errors["deftet"]}')
    else:
        _log('skipping deftet phase (soft budget / cpu)')

    # ---- phase 3: jnp baseline for vs_baseline -----------------------
    vs_baseline = 0.0
    if backend == 'jnp':
        vs_baseline = 1.0
    elif _elapsed() < SOFT_BUDGET - 60:
        try:
            step_j, params_j, _ = _build_dibr(mesh, 'jnp', height, width)
            dt_j, _ = _time_steps_scan(step_j, params_j, K=4)
            vs_baseline = dt_j * mpix * 1e6 / (height * width)
            _log(f'jnp: {dt_j*1e3:.1f} ms/step -> vs_baseline '
                 f'{vs_baseline:.2f}x')
        except Exception as e:
            errors['jnp'] = f'{type(e).__name__}: {e}'
            _log(f'jnp FAILED: {errors["jnp"]}')
    else:
        _log('skipping jnp baseline (soft budget)')

    out = _result(mpix, vs_baseline, tris_per_s, rays_per_s,
                  errors=errors or None)
    if deftet_pix_per_s is not None:
        out["deftet_pixels_per_s"] = round(deftet_pix_per_s)
    if dibr_phases is not None:
        out["dibr_phase_ms"] = dibr_phases
    if hires is not None:
        out["triangles_per_s_168k"] = round(hires[0])
        out["hires_faces"] = hires[1]
    _emit(out)
    if spc_info is not None:
        _post_spc_check(*spc_info)


# --------------------------------------------------------------------------
# watchdog (parent process)
# --------------------------------------------------------------------------

def run_watchdog():
    deadline = T0 + HARD_CAP
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), '--phases'],
        stdout=subprocess.PIPE, stderr=sys.stderr, text=True, bufsize=1)
    last_json = None
    import selectors
    sel = selectors.DefaultSelector()
    sel.register(child.stdout, selectors.EVENT_READ)
    buf = ''
    while True:
        timeout = deadline - time.perf_counter()
        if timeout <= 0:
            break
        if not sel.select(timeout=min(timeout, 1.0)):
            if child.poll() is not None:
                break
            continue
        chunk = child.stdout.readline()
        if chunk == '':
            break
        line = chunk.rstrip('\n')
        if line.startswith('{'):
            try:
                last_json = json.loads(line)
            except ValueError:
                pass
        print(line, flush=True)
    if child.poll() is None and time.perf_counter() >= deadline:
        _log(f'HARD CAP {HARD_CAP:.0f}s reached; killing child '
             f'{child.pid}')
        child.kill()
        child.wait()
        # re-print the freshest banked result as the final line
        if last_json is not None:
            _emit(last_json)
        else:
            _emit(_result(0.0, 0.0, errors={'watchdog': 'hard cap hit '
                                            'before any measurement'}))
    elif child.poll() is None:
        child.wait(timeout=60)  # clean EOF; let the child finish exiting
    child.stdout.close()


if __name__ == '__main__':
    if '--phases' in sys.argv:
        run_phases()
    else:
        run_watchdog()
