from kaolin_tpu.models import inverse_render  # noqa: F401
