"""USD voxelgrid import/export (stored as PointInstancer-style occupancy).

Parity: ``kaolin/io/usd/voxelgrid.py`` (reference): voxelgrids are stored
as the integer coordinates of occupied voxels plus the grid resolution.
"""

import os

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.io.usd.usda import UsdaStage, TimeSampled
from kaolin_tpu.io.usd.mesh import (_check_text_usd, _open_stage,
                                    create_stage, get_scene_paths)

__all__ = ['import_voxelgrid', 'import_voxelgrids', 'add_voxelgrid',
           'export_voxelgrid', 'export_voxelgrids']


def add_voxelgrid(stage, voxelgrid, scene_path, time=None):
    """Add a voxelgrid prim to a stage.

    Parity: ``kaolin/io/usd/voxelgrid.py:34``.
    """
    prim = stage.define_prim(scene_path, 'PointInstancer')
    occ = np.asarray(voxelgrid).astype(bool)
    coords = np.stack(np.nonzero(occ), axis=-1).astype(np.int64)

    def set_attr(name, value):
        if time is None:
            prim.attrs[name] = value
        else:
            if not isinstance(prim.attrs.get(name), TimeSampled):
                prim.attrs[name] = TimeSampled()
            prim.attrs[name][float(time)] = value

    set_attr('positions', coords)
    prim.attrs['gridResolution'] = int(occ.shape[0])
    return prim


def export_voxelgrid(file_path, voxelgrid,
                     scene_path='/World/VoxelGrids/voxelgrid_0', time=None):
    """Parity: ``kaolin/io/usd/voxelgrid.py:195``."""
    return export_voxelgrids(file_path, [voxelgrid], [scene_path],
                             times=None if time is None else [time])


def export_voxelgrids(file_path, voxelgrids, scene_paths=None, times=None):
    """Parity: ``kaolin/io/usd/voxelgrid.py:221``."""
    _check_text_usd(file_path)
    stage = (_open_stage(file_path) if os.path.exists(file_path)
             else create_stage(file_path))
    if scene_paths is None:
        scene_paths = [f'/World/VoxelGrids/voxelgrid_{i}'
                       for i in range(len(voxelgrids))]
    for i, (vg, sp) in enumerate(zip(voxelgrids, scene_paths)):
        add_voxelgrid(stage, vg, sp,
                      time=None if times is None else times[i])
    stage.save(file_path)
    return stage


def import_voxelgrid(file_path_or_stage, scene_path, time=None):
    """Parity: ``kaolin/io/usd/voxelgrid.py:118``."""
    return import_voxelgrids(file_path_or_stage, [scene_path],
                             time=time)[0]


def import_voxelgrids(file_path_or_stage, scene_paths=None, time=None):
    """Parity: ``kaolin/io/usd/voxelgrid.py:151``."""
    stage = (file_path_or_stage if isinstance(file_path_or_stage, UsdaStage)
             else _open_stage(file_path_or_stage))
    if scene_paths is None:
        scene_paths = get_scene_paths(stage, prim_types='PointInstancer')
    out = []
    for sp in scene_paths:
        prim = stage.get_prim(sp)
        if prim is None:
            raise ValueError(f'scene path {sp!r} not found')
        res = int(prim.attrs.get('gridResolution', 0))
        v = prim.attrs.get('positions')
        if isinstance(v, TimeSampled):
            key = (float(time) if time is not None and float(time) in v
                   else sorted(v.keys())[0])
            v = v[key]
        coords = np.asarray(v, dtype=np.int64).reshape(-1, 3)
        if res == 0:
            res = int(coords.max()) + 1 if coords.size else 1
        grid = np.zeros((res, res, res), dtype=bool)
        grid[coords[:, 0], coords[:, 1], coords[:, 2]] = True
        out.append(jnp.asarray(grid))
    return out
