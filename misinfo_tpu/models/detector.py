"""The inference detector container — TPU analogue of the reference's
`MultiModalMisinfoDetector` (C1, reference misinfo_forensics.py:43-108).

Holds one param pytree with four branches:
  * ``roberta``      — RoBERTa-base backbone
  * ``ai_head`` / ``misinfo_head`` — dual 768→256→2 MLP heads
  * ``efficientnet`` — EfficientNet-B0 + 2-class classifier
  * ``fusion``       — 5→64→32→2 fusion judge

The CLIP tower lives in its own tree (as in the reference, where
`clip_model` sits beside the detector, misinfo_forensics.py:211). The
trainer variants of the reference (C16/C19, SURVEY.md §2.3) are treated as
training-time graphs over these same branch trees — the inference variant
is the source of truth.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax

from misinfo_tpu.models.roberta import RobertaConfig, head_init, roberta_init
from misinfo_tpu.models.clip import ClipConfig, clip_init
from misinfo_tpu.models.efficientnet import effnet_b0_init
from misinfo_tpu.models.fusion import fusion_init


@dataclass(frozen=True)
class DetectorConfig:
    roberta: RobertaConfig = field(default_factory=RobertaConfig)
    clip: ClipConfig = field(default_factory=ClipConfig)
    num_image_classes: int = 2

    @staticmethod
    def tiny() -> "DetectorConfig":
        return DetectorConfig(roberta=RobertaConfig.tiny(), clip=ClipConfig.tiny())


def detector_init(key, cfg: DetectorConfig = DetectorConfig()) -> Dict:
    ks = jax.random.split(key, 6)
    return {
        "roberta": roberta_init(ks[0], cfg.roberta),
        "ai_head": head_init(ks[1], cfg.roberta),
        "misinfo_head": head_init(ks[2], cfg.roberta),
        "efficientnet": effnet_b0_init(ks[3], cfg.num_image_classes),
        "fusion": fusion_init(ks[4]),
        "clip": clip_init(ks[5], cfg.clip),
    }
