"""Feature-fusion training model (C19, reference training_pipeline.py).

The reference's third detector variant: frozen CLIP + RoBERTa backbones +
EfficientNet-B0, fused at the FEATURE level — input
`cat[clip_img(512), clip_txt(512), roberta_CLS(768), clip_sim(1),
deepfake_prob(1)] → Linear(1794,512) → ReLU → Dropout → Linear(512,256) →
ReLU → Linear(256,2)` (reference training_pipeline.py:51-59,115-124);
forward returns `(logits, clip_similarity, deepfake_probability)` (:115-124).
Includes the generic train/eval loops (:129-259) and the
`training_loop_example` demo (:262-331), all as one jit'd program per step.

This variant is a TRAINING-TIME graph only; the serving engine's source of
truth is the inference detector (SURVEY.md §7 'three divergent model
definitions'). Branch weights live in the same detector param tree, so a
model trained here serves directly.
"""

from __future__ import annotations

import argparse
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from misinfo_tpu.core.config import PrecisionConfig
from misinfo_tpu.models.clip import clip_image_features, clip_text_features
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.models.efficientnet import effnet_apply
from misinfo_tpu.models.roberta import roberta_cls
from misinfo_tpu.ops.common import Policy, dense, dense_init, l2_normalize, softmax_f32
from misinfo_tpu.ops.image_ops import normalize_images
from misinfo_tpu.train.harness import run_training
from misinfo_tpu.train.losses import binary_accuracy, cross_entropy
from misinfo_tpu.train.optim import OptimConfig, make_optimizer


def feature_fusion_head_init(key, det_cfg: DetectorConfig) -> Dict:
    """The 1794→512→256→2 feature-fusion head."""
    in_dim = (det_cfg.clip.projection_dim * 2
              + det_cfg.roberta.hidden_size + 2)
    k1, k2, k3 = jax.random.split(key, 3)
    return {"fc1": dense_init(k1, in_dim, 512),
            "fc2": dense_init(k2, 512, 256),
            "fc3": dense_init(k3, 256, 2)}


def feature_fusion_forward(
    params: Dict,                # detector tree + 'feature_fusion' head
    batch: Dict,
    det_cfg: DetectorConfig,
    policy: Policy,
    *,
    rng=None,
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """→ (logits [B,2], clip_similarity [B], deepfake_probability [B]) —
    the reference forward's triple return (training_pipeline.py:115-124)."""
    imgs_clip = normalize_images(batch["images_u8"], "clip", policy.compute)
    imgs_eff = normalize_images(batch["images_u8"], "imagenet", policy.compute)
    ci = clip_image_features(params["clip"], imgs_clip, det_cfg.clip, policy)
    ct = clip_text_features(params["clip"], batch["clip_ids"],
                            batch["clip_mask"], det_cfg.clip, policy)
    sim = jnp.sum(l2_normalize(ci) * l2_normalize(ct), axis=-1)
    rb = roberta_cls(params["roberta"], batch["input_ids"],
                     batch["attention_mask"], det_cfg.roberta, policy)
    eff_logits, _ = effnet_apply(params["efficientnet"], imgs_eff,
                                 policy=policy)
    deep_p = softmax_f32(eff_logits)[:, 1]

    feats = jnp.concatenate(
        [ci.astype(jnp.float32), ct.astype(jnp.float32),
         rb.astype(jnp.float32), sim[:, None], deep_p[:, None]], axis=1)
    h = params["feature_fusion"]
    x = jnp.maximum(dense(h["fc1"], feats.astype(policy.compute), policy), 0)
    if not deterministic and rng is not None:
        keep = jax.random.bernoulli(rng, 0.7, x.shape)
        x = jnp.where(keep, x / 0.7, 0.0).astype(x.dtype)
    x = jnp.maximum(dense(h["fc2"], x, policy), 0)
    logits = dense(h["fc3"], x, policy).astype(jnp.float32)
    return logits, sim, deep_p


def make_feature_fusion_step(tx, det_cfg: DetectorConfig, policy: Policy):
    def loss_fn(params, batch, rng):
        logits, _, _ = feature_fusion_forward(params, batch, det_cfg, policy,
                                              rng=rng, deterministic=False)
        loss = cross_entropy(logits, batch["labels"])
        return loss, binary_accuracy(logits, batch["labels"])

    @jax.jit
    def step(params, opt_state, batch, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return step


def freeze_backbones_mask(params: Dict) -> Dict:
    """Reference freeze_backbones (training_pipeline.py:154-173): CLIP and
    RoBERTa frozen; EfficientNet + fusion head trainable."""
    mask = {k: jax.tree_util.tree_map(lambda _: False, v)
            for k, v in params.items()}
    for k in ("efficientnet", "feature_fusion"):
        if k in params:
            mask[k] = jax.tree_util.tree_map(lambda _: True, params[k])
    return mask


def training_loop_example(num_steps: int = 5, batch_size: int = 4,
                          det_cfg: Optional[DetectorConfig] = None,
                          log=print):
    """Self-contained demo on synthetic data (reference
    training_pipeline.py:262-331)."""
    det_cfg = det_cfg or DetectorConfig.tiny()
    policy = Policy(PrecisionConfig.highest())
    key = jax.random.PRNGKey(0)
    params = detector_init(key, det_cfg)
    params["feature_fusion"] = feature_fusion_head_init(
        jax.random.PRNGKey(1), det_cfg)
    tx = make_optimizer(OptimConfig(lr=1e-3, total_steps=num_steps,
                                    warmup_fraction=0.0, clip_norm=1.0),
                        trainable_mask=freeze_backbones_mask(params))
    opt_state = tx.init(params)
    step = make_feature_fusion_step(tx, det_cfg, policy)

    rng = np.random.default_rng(0)
    s = det_cfg.clip.image_size
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(3, det_cfg.roberta.vocab_size, (batch_size, 12)),
            jnp.int32),
        "attention_mask": jnp.ones((batch_size, 12), jnp.int32),
        "clip_ids": jnp.asarray(
            rng.integers(1, det_cfg.clip.vocab_size - 2, (batch_size, 16)),
            jnp.int32),
        "clip_mask": jnp.ones((batch_size, 16), jnp.int32),
        "images_u8": jnp.asarray(
            rng.integers(0, 255, (batch_size, s, s, 3)), jnp.uint8),
        "labels": jnp.asarray(rng.integers(0, 2, (batch_size,)), jnp.int32),
    }
    for i in range(num_steps):
        params, opt_state, m = step(params, opt_state, batch,
                                    jax.random.PRNGKey(i))
        log(f"step {i}: loss={float(m['loss']):.4f} "
            f"acc={float(m['accuracy']):.2f}")
    return params


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="Feature-fusion training demo")
    p.add_argument("--steps", type=int, default=5)
    args = p.parse_args()
    training_loop_example(args.steps)
