from kaolin_tpu.render.spc.raytrace import (  # noqa: F401
    unbatched_raytrace, mark_pack_boundaries, mark_first_hit, diff,
    sum_reduce, cumsum, cumprod, exponential_integration)
