from geoformer_tpu.ops.attention import (  # noqa: F401
    full_attention,
    linear_attention,
    window_cross_attention,
)
from geoformer_tpu.ops.matching import dual_softmax  # noqa: F401
from geoformer_tpu.ops.resize import resize_bilinear_align_corners  # noqa: F401
