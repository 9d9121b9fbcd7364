"""On-device image normalization (first stage of the signal program).

The host ships uint8 NHWC batches; float conversion and per-channel
normalization happen inside the jit'd program so HBM traffic is 1 byte/px
on the host→device hop (4× less than shipping f32) and XLA fuses the
normalize into the first convolution's input read.

Stat sets replicate the reference exactly:
  * ImageNet stats for the EfficientNet forensics branch
    (reference misinfo_forensics.py:252)
  * CLIP stats for the CLIP towers (HF CLIPProcessor) and for the CIFAKE
    trainer's EfficientNet inputs (reference train_cifake_forensics.py:44,50)
"""

from __future__ import annotations

import jax.numpy as jnp

from misinfo_tpu.preprocess.image import (
    CLIP_MEAN, CLIP_STD, IMAGENET_MEAN, IMAGENET_STD,
)

_STATS = {
    "imagenet": (IMAGENET_MEAN, IMAGENET_STD),
    "clip": (CLIP_MEAN, CLIP_STD),
}


def normalize_images(images_u8: jnp.ndarray, stats: str = "imagenet",
                     dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8 [B,H,W,3] → normalized [B,H,W,3] in `dtype` (NHWC)."""
    mean, std = _STATS[stats]
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    inv_std = 1.0 / (jnp.asarray(std, jnp.float32) * 255.0)
    x = images_u8.astype(jnp.float32)
    return ((x - mean) * inv_std).astype(dtype)
