from kaolin_tpu.utils import testing  # noqa: F401
