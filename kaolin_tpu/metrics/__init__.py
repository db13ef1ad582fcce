from kaolin_tpu.metrics import pointcloud  # noqa: F401
from kaolin_tpu.metrics import render  # noqa: F401
from kaolin_tpu.metrics import tetmesh  # noqa: F401
from kaolin_tpu.metrics import trianglemesh  # noqa: F401
from kaolin_tpu.metrics import voxelgrid  # noqa: F401
