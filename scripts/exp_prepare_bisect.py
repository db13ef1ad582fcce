"""Bisect the _prepare grad cost."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from kaolin_tpu.io import obj
from kaolin_tpu.models import inverse_render as M
from kaolin_tpu.render import camera as camera_fns
from kaolin_tpu.ops import mesh as mesh_ops

mesh = obj.import_mesh('/root/reference/sample_data/meshes/fox.obj',
                       triangulate=True)
faces = jnp.asarray(np.asarray(mesh.faces))
params = M.init_params(mesh, texture_res=256)
views = M.make_views(1)


def timeit(label, fn, *a, iters=20):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f'{label}: {(time.perf_counter()-t0)/iters*1000:.3f} ms',
          flush=True)


def staged(stage):
    def loss(verts, rot, trans, proj, f):
        B = rot.shape[0]
        v = jnp.broadcast_to(verts[None], (B,) + verts.shape)
        vc = camera_fns.rotate_translate_points(v, rot, trans)
        if stage == 'rotate':
            return jnp.sum(vc ** 2)
        vi = camera_fns.perspective_camera(vc, proj)
        if stage == 'project':
            return jnp.sum(vi ** 2)
        fvc = mesh_ops.index_vertices_by_faces(vc, f)
        fvi = mesh_ops.index_vertices_by_faces(vi, f)
        if stage == 'index':
            return jnp.sum(fvc ** 2) + jnp.sum(fvi ** 2)
        fn = mesh_ops.face_normals(fvc, unit=True)
        return jnp.sum(fvi ** 2) + jnp.sum(fn ** 2)
    return loss


for stage in ('rotate', 'project', 'index', 'normals'):
    g = jax.jit(jax.grad(staged(stage)))
    timeit(f'grad[{stage}]', g, params.vertices, views.camera_rot,
           views.camera_trans, views.camera_proj, faces)
    f = jax.jit(staged(stage))
    timeit(f'fwd [{stage}]', f, params.vertices, views.camera_rot,
           views.camera_trans, views.camera_proj, faces)
