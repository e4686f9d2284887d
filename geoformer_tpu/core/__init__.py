from geoformer_tpu.core.capacity import (  # noqa: F401
    masked_select_capacity,
    topk_select,
)
from geoformer_tpu.core.mesh import make_mesh, shard_batch  # noqa: F401
