from kaolin_tpu.io import materials  # noqa: F401
from kaolin_tpu.io import obj  # noqa: F401
from kaolin_tpu.io import utils  # noqa: F401
