"""Standalone CLIP similarity engine (C26, reference
clip_similarity_engine.py).

Match/Mismatch classification at the 0.25 cosine threshold (reference :18)
with the tiered textual explanations (strong/moderate/weak match, strong
mismatch < 0.1, reference :164-174). Batched: `analyze_pairs` scores many
(text, image) pairs in one fused forward.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from misinfo_tpu.core.config import PrecisionConfig
from misinfo_tpu.models.clip import clip_similarity
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.ops.common import Policy
from misinfo_tpu.ops.image_ops import normalize_images
from misinfo_tpu.preprocess.image import batch_images, image_to_array
from misinfo_tpu.preprocess.tokenizer import load_clip_tokenizer

MATCH_THRESHOLD = 0.25  # reference clip_similarity_engine.py:18


def tiered_explanation(sim: float, threshold: float = MATCH_THRESHOLD) -> str:
    """Tiered wording (reference :164-174)."""
    if sim >= threshold:
        if sim >= 0.35:
            return ("Strong match: the image content closely corresponds "
                    "to the text description.")
        if sim >= 0.30:
            return ("Moderate match: the image is consistent with the text, "
                    "with good semantic overlap.")
        return ("Weak match: the image plausibly relates to the text, but "
                "the connection is loose.")
    if sim < 0.10:
        return ("Strong mismatch: the image and text appear unrelated — "
                "possible out-of-context use.")
    return ("Mismatch: the image does not clearly support the text "
            "description.")


class ClipSimilarityEngine:
    """Self-contained dual-tower similarity scorer."""

    def __init__(self, det_cfg: Optional[DetectorConfig] = None,
                 params: Optional[Dict] = None,
                 checkpoint: Optional[str] = None,
                 threshold: float = MATCH_THRESHOLD,
                 precision: str = "float32"):
        self.det_cfg = det_cfg or DetectorConfig()
        self.policy = Policy(PrecisionConfig(compute_dtype=precision))
        self.threshold = threshold
        if params is None:
            params = detector_init(jax.random.PRNGKey(0), self.det_cfg)
            if checkpoint:
                from misinfo_tpu.checkpoints.io import load_checkpoint
                restored = load_checkpoint(checkpoint, params)
                if restored is not None:
                    params = restored
        self.params = params["clip"] if "clip" in params else params
        self.tokenizer = load_clip_tokenizer(None, self.det_cfg.clip.vocab_size)
        self._jit = jax.jit(
            lambda p, ids, mask, imgs: clip_similarity(
                p, ids, mask,
                normalize_images(imgs, "clip", self.policy.compute),
                self.det_cfg.clip, self.policy)[0])

    def analyze_pairs(self, texts: Sequence[str], images: Sequence
                      ) -> List[Dict]:
        size = self.det_cfg.clip.image_size
        ids, mask = self.tokenizer.batch(list(texts),
                                         self.det_cfg.clip.max_text_len)
        arrs = [image_to_array(im, "clip", size) for im in images]
        sims = np.asarray(self._jit(self.params, jnp.asarray(ids),
                                    jnp.asarray(mask),
                                    jnp.asarray(batch_images(arrs, size))))
        out = []
        for t, s in zip(texts, sims):
            s = float(s)
            out.append({
                "text": t,
                "similarity": s,
                "label": "Match" if s >= self.threshold else "Mismatch",
                "explanation": tiered_explanation(s, self.threshold),
            })
        return out

    def analyze(self, text: str, image) -> Dict:
        return self.analyze_pairs([text], [image])[0]


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Standalone CLIP similarity engine")
    p.add_argument("--text", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args(argv)
    result = ClipSimilarityEngine(checkpoint=args.checkpoint).analyze(
        args.text, args.image)
    print(f"{result['label']}  sim={result['similarity']:.4f}")
    print(result["explanation"])


if __name__ == "__main__":
    main()
