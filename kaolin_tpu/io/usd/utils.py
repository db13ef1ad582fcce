"""USD stage utilities.

Parity: ``kaolin/io/usd/utils.py`` (reference).
"""

from kaolin_tpu.io.usd.mesh import create_stage, get_scene_paths, \
    _open_stage
from kaolin_tpu.io.usd.usda import TimeSampled, UsdaStage

__all__ = ['create_stage', 'get_scene_paths', 'get_authored_time_samples',
           'open_stage']


def open_stage(file_path):
    """Open (or create) a USD(A) stage."""
    return _open_stage(file_path)


def get_authored_time_samples(file_path_or_stage):
    """All time samples authored anywhere in the stage, sorted.

    Parity: ``kaolin/io/usd/utils.py:112``.
    """
    stage = (file_path_or_stage
             if isinstance(file_path_or_stage, UsdaStage)
             else _open_stage(file_path_or_stage))
    times = set()
    for prim in stage.prims():
        for v in prim.attrs.values():
            if isinstance(v, TimeSampled):
                times.update(v.keys())
    return sorted(times)
