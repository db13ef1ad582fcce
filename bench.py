"""Benchmark: DIB-R 512x512 forward+backward throughput (Mpixels/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (driver config #2): textured-mesh inverse rendering — fox.obj
(10k faces) rendered at 512^2 with UV textures + SH lighting, gradients
back to vertex positions, texture and lighting.

The step is split into separately compiled programs (selection passes +
differentiable grad epilogue) — the TPU-native structure used by the
training loop itself.  ``vs_baseline`` is the speedup of the best
selection backend over the pure-XLA 'jnp' one on the same chip (the
reference publishes no absolute numbers — see BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build(backend, height, width):
    import jax
    import jax.numpy as jnp
    from kaolin_tpu.io import obj
    from kaolin_tpu.models import inverse_render as M

    mesh = obj.import_mesh('/root/reference/sample_data/meshes/fox.obj',
                           triangulate=True)
    faces = jnp.asarray(np.asarray(mesh.faces))
    face_uvs = jnp.asarray(
        np.asarray(mesh.uvs)[np.asarray(mesh.face_uvs_idx)])
    params = M.init_params(mesh, texture_res=256)
    views = M.make_views(1)
    target_images = jnp.zeros((1, height, width, 3))
    target_masks = jnp.zeros((1, height, width))

    # each phase is ONE jitted program: eager ops would round-trip
    # through the TPU tunnel per op
    selection = jax.jit(lambda p: M.compute_selection(
        p, views, faces, height, width, backend=backend))

    grad_fn = jax.jit(jax.grad(
        lambda p, sel: M.render_loss(
            p, views, faces, face_uvs, target_images, target_masks,
            height, width, selection=sel)))

    def step(p):
        sel = selection(p)
        return grad_fn(p, sel)

    def warmup(p):
        """Compile each phase separately, logging progress to stderr."""
        import jax
        t0 = time.perf_counter()
        fi, kb = selection(p)
        jax.block_until_ready((fi, kb))
        print(f'[bench] {backend} selection compiled+ran in '
              f'{time.perf_counter() - t0:.1f}s', file=sys.stderr,
              flush=True)
        t0 = time.perf_counter()
        g = grad_fn(p, (fi, kb))
        jax.block_until_ready(g)
        print(f'[bench] grad epilogue compiled+ran in '
              f'{time.perf_counter() - t0:.1f}s', file=sys.stderr,
              flush=True)

    step.warmup = warmup
    return step, params


def timed(step, params, iters=8):
    import jax
    t0 = time.perf_counter()
    if hasattr(step, 'warmup'):
        step.warmup(params)
    g = step(params)           # compile + warmup
    jax.block_until_ready(g)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(params)
    jax.block_until_ready(g)
    return (time.perf_counter() - t0) / iters, compile_s


def main():
    height = width = 512
    results = {}
    compile_times = {}
    errors = {}
    import jax
    backends = (('jnp', 'fused') if jax.default_backend() == 'tpu'
                else ('jnp',))
    for backend in backends:
        try:
            step, params = build(backend, height, width)
            results[backend], compile_times[backend] = timed(step, params)
        except Exception as e:
            errors[backend] = f"{type(e).__name__}: {e}"
    if not results:
        print(json.dumps({"metric": "dibr_fwd_bwd_512", "value": 0.0,
                          "unit": "Mpixels/s/chip", "vs_baseline": 0.0,
                          "errors": errors}))
        return
    best_backend = min(results, key=results.get)
    best = results[best_backend]
    mpix = (height * width / best) / 1e6
    base = results.get('jnp', best)
    out = {
        "metric": "dibr_fwd_bwd_512",
        "value": round(mpix, 3),
        "unit": "Mpixels/s/chip",
        "vs_baseline": round(base / best, 3),
    }
    print(json.dumps(out))
    print(f"step times (s): "
          f"{ {k: round(v, 4) for k, v in results.items()} }; "
          f"compile times (s): "
          f"{ {k: round(v, 1) for k, v in compile_times.items()} }; "
          f"best={best_backend}; errors={errors}", file=sys.stderr)


if __name__ == '__main__':
    main()
