from kaolin_tpu.parallel.sharding import (  # noqa: F401
    make_mesh, shard_views, replicate, multi_view_grad)
from kaolin_tpu.parallel import distributed  # noqa: F401
from kaolin_tpu.parallel.tile import tile_sharded_selection  # noqa: F401
