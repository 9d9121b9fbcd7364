from misinfo_tpu.preprocess.tokenizer import (  # noqa: F401
    RobertaTokenizer,
    ClipTokenizer,
    HashTokenizer,
)
from misinfo_tpu.preprocess.image import (  # noqa: F401
    load_image_rgb,
    image_to_array,
    CLIP_MEAN,
    CLIP_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
