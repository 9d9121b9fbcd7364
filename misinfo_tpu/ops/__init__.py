from misinfo_tpu.ops.common import (  # noqa: F401
    Policy,
    dense,
    layer_norm,
    dense_init,
    layer_norm_init,
)
from misinfo_tpu.ops.attention import multi_head_attention  # noqa: F401
from misinfo_tpu.ops.image_ops import normalize_images  # noqa: F401
