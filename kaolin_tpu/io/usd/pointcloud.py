"""USD pointcloud import/export (as UsdGeom Points prims).

Parity: ``kaolin/io/usd/pointcloud.py`` (reference).
"""

import os
from collections import namedtuple

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.io.usd.usda import UsdaStage, TimeSampled
from kaolin_tpu.io.usd.mesh import (_check_text_usd, _open_stage,
                                    create_stage, get_scene_paths)

__all__ = ['import_pointcloud', 'import_pointclouds', 'add_pointcloud',
           'export_pointcloud', 'export_pointclouds',
           'get_pointcloud_scene_paths',
           'get_pointcloud_bracketing_time_samples']


def add_pointcloud(stage, points, scene_path, colors=None, time=None,
                   points_type='point_instancer'):
    """Add a pointcloud prim (Points) to a stage.

    Parity: ``kaolin/io/usd/pointcloud.py:81``.
    """
    prim = stage.define_prim(scene_path, 'Points')

    def set_attr(name, value):
        if time is None:
            prim.attrs[name] = value
        else:
            if not isinstance(prim.attrs.get(name), TimeSampled):
                prim.attrs[name] = TimeSampled()
            prim.attrs[name][float(time)] = value

    set_attr('points', np.asarray(points, dtype=np.float32))
    if colors is not None:
        set_attr('primvars:displayColor',
                 np.asarray(colors, dtype=np.float32))
    return prim


def export_pointcloud(file_path, pointcloud,
                      scene_path='/World/PointClouds/pointcloud_0',
                      colors=None, time=None, points_type='point_instancer'):
    """Parity: ``kaolin/io/usd/pointcloud.py:218``."""
    return export_pointclouds(file_path, [pointcloud], [scene_path],
                              colors=None if colors is None else [colors],
                              times=None if time is None else [time])


def export_pointclouds(file_path, pointclouds, scene_paths=None, colors=None,
                       times=None, points_type='point_instancer'):
    """Parity: ``kaolin/io/usd/pointcloud.py:252``."""
    _check_text_usd(file_path)
    stage = (_open_stage(file_path) if os.path.exists(file_path)
             else create_stage(file_path))
    if scene_paths is None:
        scene_paths = [f'/World/PointClouds/pointcloud_{i}'
                       for i in range(len(pointclouds))]
    for i, (pc, sp) in enumerate(zip(pointclouds, scene_paths)):
        add_pointcloud(stage, pc, sp,
                       colors=None if colors is None else colors[i],
                       time=None if times is None else times[i])
    stage.save(file_path)
    return stage


pointcloud_return_type = namedtuple(
    'pointcloud_return_type', ['points', 'colors', 'normals'])


def import_pointcloud(file_path_or_stage, scene_path, time=None):
    """Parity: ``kaolin/io/usd/pointcloud.py:143``.

    Returns:
        ``pointcloud_return_type(points (N, 3), colors, normals)``.
    """
    points, colors, normals = import_pointclouds(
        file_path_or_stage, [scene_path], time=time)
    return pointcloud_return_type(points[0], colors[0], normals[0])


def import_pointclouds(file_path_or_stage, scene_paths=None, time=None):
    """Parity: ``kaolin/io/usd/pointcloud.py:185``."""
    stage = (file_path_or_stage if isinstance(file_path_or_stage, UsdaStage)
             else _open_stage(file_path_or_stage))
    if scene_paths is None:
        scene_paths = get_scene_paths(stage, prim_types='Points')
    points_out, colors_out, normals_out = [], [], []
    for sp in scene_paths:
        prim = stage.get_prim(sp)
        if prim is None:
            raise ValueError(f'scene path {sp!r} not found')

        def get_attr(name):
            v = prim.attrs.get(name)
            if isinstance(v, TimeSampled):
                key = (float(time) if time is not None and
                       float(time) in v else sorted(v.keys())[0])
                return v[key]
            return v

        pts = get_attr('points')
        points_out.append(jnp.asarray(np.asarray(pts, np.float32))
                          if pts is not None else None)
        colors = get_attr('primvars:displayColor')
        colors_out.append(jnp.asarray(np.asarray(colors, np.float32))
                          if colors is not None else None)
        normals = get_attr('normals')
        normals_out.append(jnp.asarray(np.asarray(normals, np.float32))
                           if normals is not None else None)
    return points_out, colors_out, normals_out


def get_pointcloud_scene_paths(file_path_or_stage):
    """All pointcloud prim paths in a stage.

    Parity: ``kaolin/io/usd/pointcloud.py:40``.
    """
    stage = (file_path_or_stage if isinstance(file_path_or_stage, UsdaStage)
             else _open_stage(file_path_or_stage))
    return get_scene_paths(stage, prim_types=['Points', 'PointInstancer'])


def get_pointcloud_bracketing_time_samples(stage, scene_path, target_time):
    """(lower, upper) authored time samples around target_time.

    Parity: ``kaolin/io/usd/pointcloud.py:62``.
    """
    prim = stage.get_prim(scene_path) if isinstance(stage, UsdaStage) \
        else _open_stage(stage).get_prim(scene_path)
    times = set()
    for v in prim.attrs.values():
        if isinstance(v, TimeSampled):
            times.update(v.keys())
    if not times:
        return (target_time, target_time)
    lower = max([t for t in times if t <= target_time], default=min(times))
    upper = min([t for t in times if t >= target_time], default=max(times))
    return (lower, upper)
