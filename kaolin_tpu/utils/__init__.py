from kaolin_tpu.utils import testing  # noqa: F401
from kaolin_tpu.utils import profiler  # noqa: F401
