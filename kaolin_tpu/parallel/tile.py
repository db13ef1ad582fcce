"""Pixel-tile (image-row) sharding of the rasterizer.

SURVEY.md §2.3 calls for a ``(data, tile)`` mesh: views data-parallel on
one axis, each view's pixel rows split over the other so a single huge
render (driver config #5: 1024^2 x 64 views) spreads across chips.
Rasterization is gather-only over the face set, so row slabs need no
halo exchange — each device sweeps every face against its rows and the
outputs concatenate along the row axis (``out_specs`` does the stitch;
no collective is needed until the backward pass psums parameter grads).
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

__all__ = ['tile_sharded_selection']


def _shard_map():
    try:
        from jax import shard_map

        def wrap(f, mesh, in_specs, out_specs):
            return shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except ImportError:  # jax < 0.8
        from jax.experimental.shard_map import shard_map

        def wrap(f, mesh, in_specs, out_specs):
            return shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False)
    return wrap


def tile_sharded_selection(mesh, face_vertices_z, face_vertices_image,
                           valid_faces, height, width, tile_axis='tile',
                           multiplier=1000., eps=1e-8):
    """Z-buffer selection with image rows sharded over ``tile_axis``.

    Each device renders its contiguous slab of ``height // ndev`` rows
    (faces replicated); results stitch to the full ``(B, H, W)`` image.
    Matches :func:`kaolin_tpu.render.mesh.rasterize_selection` with the
    'jnp' backend exactly (see tests/test_parallel.py).

    Args:
        mesh: a ``jax.sharding.Mesh`` containing ``tile_axis``.
        face_vertices_z: (B, F, 3) camera z.
        face_vertices_image: (B, F, 3, 2) image coords in [-1, 1].
        valid_faces: (B, F) bool.
        height, width: full image size; ``height`` must divide evenly by
            the tile-axis size.
        tile_axis: mesh axis name to shard rows over.

    Returns:
        (B, H, W) int32 winning-face image (-1 = background).
    """
    from kaolin_tpu.render.mesh.rasterization import (_selection_jnp,
                                                      pixel_coords)
    ndev = mesh.shape[tile_axis]
    if height % ndev:
        raise ValueError(f'height {height} not divisible by tile axis '
                         f'size {ndev}')
    rows_local = height // ndev
    fvi_scaled = face_vertices_image * multiplier
    dtype = face_vertices_z.dtype

    def local(fvz, fvi, valid):
        ti = jax.lax.axis_index(tile_axis)
        xs, ys = pixel_coords(height, width, multiplier, dtype=dtype)
        ys_local = jax.lax.dynamic_slice(ys, (ti * rows_local,),
                                         (rows_local,))
        return jax.lax.map(
            lambda ziv: _selection_jnp(
                ziv[0], ziv[1], ziv[2], xs, ys_local,
                height=rows_local, width=width, eps=eps),
            (jax.lax.stop_gradient(fvz), jax.lax.stop_gradient(fvi),
             valid))

    sharded = _shard_map()(
        local, mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(None, tile_axis, None))
    return sharded(face_vertices_z, fvi_scaled, valid_faces)
