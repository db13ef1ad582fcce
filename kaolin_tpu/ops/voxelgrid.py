"""Voxelgrid ops: downsample, surface extraction, fill, ODMs.

Parity: ``kaolin/ops/voxelgrid.py`` (reference).  Pooling uses
``lax.reduce_window`` (XLA fuses it); ``fill`` is host-side (scipy flood
fill, matching the reference's CPU-only behavior).
"""

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['downsample', 'extract_surface', 'fill', 'extract_odms',
           'project_odms']


def _avg_pool3d(x, kernel, stride=None, padding=0):
    """Mean pooling over the last 3 dims of (B, X, Y, Z)."""
    if isinstance(kernel, int):
        kernel = (kernel,) * 3
    if stride is None:
        stride = kernel
    elif isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = (padding,) * 3
    window = (1,) + tuple(kernel)
    strides = (1,) + tuple(stride)
    pads = ((0, 0),) + tuple((p, p) for p in padding)
    summed = jax.lax.reduce_window(x, 0., jax.lax.add, window, strides, pads)
    return summed / float(np.prod(kernel))


def downsample(voxelgrids, scale):
    """Downsample voxelgrids by average pooling (not thresholded).

    Parity: ``kaolin/ops/voxelgrid.py:21``.
    """
    if voxelgrids.ndim != 4:
        raise ValueError(
            f"Expected voxelgrids to have 4 dimensions but got {voxelgrids.ndim}")
    if isinstance(scale, (list, tuple)):
        if len(scale) != 3:
            raise ValueError(
                f"Expected scale to have 3 dimensions but got {len(scale)}")
        for i, s in enumerate(scale):
            if s < 1:
                raise ValueError(
                    f"Downsample ratio must be at least 1 along every "
                    f"dimension but got {s} at index {i}")
            if s > voxelgrids.shape[i + 1]:
                raise ValueError(
                    f"Downsample ratio must be less than voxelgrids shape of "
                    f"{voxelgrids.shape[i + 1]} at index {i}, but got {s}")
    voxelgrids = voxelgrids.astype(jnp.float32)
    return _avg_pool3d(voxelgrids, scale)


def extract_surface(voxelgrids, mode="wide"):
    """Remove internal voxels, keeping only the surface shell.

    Parity: ``kaolin/ops/voxelgrid.py:92``.
    """
    if voxelgrids.ndim != 4:
        raise ValueError(
            f"Expected voxelgrids to have 4 dimensions but got {voxelgrids.ndim}")
    occ = voxelgrids.astype(bool)
    x = voxelgrids.astype(jnp.float32)
    if mode == "wide":
        pooled = _avg_pool3d(x, (3, 3, 3), stride=1, padding=1)
        return (pooled < 1) & occ
    elif mode == "thin":
        px = _avg_pool3d(x, (3, 1, 1), stride=1, padding=(1, 0, 0))
        py = _avg_pool3d(x, (1, 3, 1), stride=1, padding=(0, 1, 0))
        pz = _avg_pool3d(x, (1, 1, 3), stride=1, padding=(0, 0, 1))
        return ((px < 1) | (py < 1) | (pz < 1)) & occ
    raise ValueError(f'mode "{mode}" is not supported.')


def fill(voxelgrids):
    """Fill internal holes (host-side flood fill; not differentiable).

    Parity: ``kaolin/ops/voxelgrid.py:143``.
    """
    if voxelgrids.ndim != 4:
        raise ValueError(
            f"Expected voxelgrids to have 4 dimensions but got {voxelgrids.ndim}")
    arr = np.asarray(voxelgrids).astype(bool)
    from scipy import ndimage
    out = np.stack([ndimage.binary_fill_holes(a) for a in arr])
    return jnp.asarray(out)


def extract_odms(voxelgrids):
    """Extract the 6 orthographic depth maps of binary voxelgrids.

    Face order: z_neg, z_pos, y_neg, y_pos, x_neg, x_pos.
    Parity: ``kaolin/ops/voxelgrid.py:208``.

    Returns:
        ``(N, 6, dim, dim)`` int32 depths.
    """
    occ = voxelgrids.astype(bool)
    dim = occ.shape[-1]
    mult = jnp.arange(1, dim + 1)
    rev = jnp.arange(dim, 0, -1)
    full = jnp.stack([mult, rev])  # (2, dim)

    z = occ[:, None] * full.reshape(1, 2, 1, 1, dim)
    z_vals = jnp.max(z, axis=4)
    y = occ[:, None] * full.reshape(1, 2, 1, dim, 1)
    y_vals = jnp.max(y, axis=3)
    x = occ[:, None] * full.reshape(1, 2, dim, 1, 1)
    x_vals = jnp.max(x, axis=2)
    return (dim - jnp.concatenate([z_vals, y_vals, x_vals], axis=1)
            ).astype(jnp.int32)


def project_odms(odms, voxelgrids=None, votes=1):
    """Carve voxelgrids using orthographic depth maps.

    A voxel survives if fewer than ``votes`` of the six ODMs mark it empty.
    Parity: ``kaolin/ops/voxelgrid.py:307``.
    """
    if odms.shape[1] != 6:
        raise ValueError(
            f"Expected odms' second dimension to be 6, but got {odms.shape[1]}")
    batch_size = odms.shape[0]
    dim = odms.shape[-1]
    if voxelgrids is None:
        voxelgrids = jnp.ones((batch_size, dim, dim, dim), dtype=bool)
    else:
        if voxelgrids.shape[0] != batch_size:
            raise ValueError(
                f"Expected voxelgrids and odms' batch size to be the same, "
                f"but got {batch_size} for odms and {voxelgrids.shape[0]}")
        for i in voxelgrids.shape[1:]:
            if i != dim:
                raise ValueError(
                    f"Expected voxelgrids and odms' dimension size to be the "
                    f"same, but got {dim} for odms and {i} for voxelgrid")
    od = odms.reshape(batch_size, 3, 2, dim, dim)
    od = od.at[:, :, 0].set(dim - od[:, :, 0])
    od = od.reshape(batch_size, 6, dim, dim)
    base = jnp.arange(dim)

    z_neg = (base.reshape(1, 1, 1, dim) >= od[:, 0][..., None]).astype(jnp.int32)
    z_pos = (base.reshape(1, 1, 1, dim) < od[:, 1][..., None]).astype(jnp.int32)
    y_neg = (base.reshape(1, 1, dim, 1) >= od[:, 2][..., None, :]).astype(jnp.int32)
    y_pos = (base.reshape(1, 1, dim, 1) < od[:, 3][..., None, :]).astype(jnp.int32)
    x_neg = (base.reshape(1, dim, 1, 1) >= od[:, 4][:, None]).astype(jnp.int32)
    x_pos = (base.reshape(1, dim, 1, 1) < od[:, 5][:, None]).astype(jnp.int32)

    total = z_neg + z_pos + y_neg + y_pos + x_neg + x_pos
    return (voxelgrids * votes - total) > 0
