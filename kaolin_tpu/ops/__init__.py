from kaolin_tpu.ops import batch  # noqa: F401
from kaolin_tpu.ops import coords  # noqa: F401
from kaolin_tpu.ops import gcn  # noqa: F401
from kaolin_tpu.ops import mesh  # noqa: F401
from kaolin_tpu.ops import pointcloud  # noqa: F401
from kaolin_tpu.ops import random  # noqa: F401
from kaolin_tpu.ops import reduction  # noqa: F401
from kaolin_tpu.ops import voxelgrid  # noqa: F401
