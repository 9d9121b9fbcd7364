"""Jittable training steps for every reference trainer (C15-C20) plus a
joint full-detector step used by the multi-chip dryrun and scale tests.

Each step is a pure function (params, opt_state, batch, rng) → (params,
opt_state, metrics); under jit with sharded params/batch, XLA GSPMD turns
these into DP/TP programs (parallel/sharding.py) — gradient psums ride ICI.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from misinfo_tpu.models.detector import DetectorConfig
from misinfo_tpu.models.roberta import dual_head_logits
from misinfo_tpu.models.clip import clip_image_features, clip_text_features
from misinfo_tpu.models.efficientnet import effnet_apply
from misinfo_tpu.models.fusion import fusion_apply
from misinfo_tpu.ops.common import Policy, l2_normalize
from misinfo_tpu.ops.image_ops import normalize_images
from misinfo_tpu.train.losses import (
    binary_accuracy, clip_contrastive_loss, cross_entropy,
)


def _apply_updates(params, grads, opt_state, tx):
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


def make_text_head_step(tx, det_cfg: DetectorConfig, policy: Policy,
                        head: str = "misinfo_head"):
    """Dual-head text training step. With head='misinfo_head' this is the
    RoBERTa detective recipe (C15, reference train_roberta_detective.py);
    with head='ai_head' and a freeze mask it is the HC3 AI-head recipe
    (C16, loss on ai_logits only, reference train_ai_head.py:231-233)."""

    def loss_fn(params, batch, rng):
        ai, mis = dual_head_logits(
            params["roberta"], params["ai_head"], params["misinfo_head"],
            batch["input_ids"], batch["attention_mask"], det_cfg.roberta,
            policy, rng=rng, deterministic=False)
        logits = ai if head == "ai_head" else mis
        loss = cross_entropy(logits, batch["labels"])
        return loss, binary_accuracy(logits, batch["labels"])

    # donate params/opt_state: XLA applies the AdamW update in place,
    # saving a full copy of the train-state HBM traffic per step
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        params, opt_state = _apply_updates(params, grads, opt_state, tx)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return step


def make_packed_text_head_step(tx, det_cfg: DetectorConfig, policy: Policy,
                               head: str = "misinfo_head"):
    """Text-head step over PACKED batches (preprocess/packing.StreamPacker):
    ragged sequences share rows under block-diagonal segment attention, so
    step FLOPs track the token sum. Loss/accuracy weight by `slot_valid`
    (unfilled CLS slots contribute nothing). Opt-in via the trainers'
    ``pack=True`` — batch composition differs from the reference recipe, so
    it is a perf mode, not the parity default."""
    from misinfo_tpu.models.roberta import head_apply, roberta_encode
    from misinfo_tpu.train.losses import (weighted_accuracy,
                                          weighted_cross_entropy)

    def loss_fn(params, batch, rng):
        hidden = roberta_encode(
            params["roberta"], batch["input_ids"], batch["attention_mask"],
            det_cfg.roberta, policy, rng=rng, deterministic=False,
            position_ids=batch["position_ids"],
            segment_ids=batch["segment_ids"])
        pooled = hidden[batch["cls_rows"], batch["cls_cols"]]
        logits = head_apply(params[head], pooled, policy=policy,
                            dropout_rate=det_cfg.roberta.head_dropout)
        w = batch["slot_valid"]
        loss = weighted_cross_entropy(logits, batch["labels"], w)
        return loss, weighted_accuracy(logits, batch["labels"], w)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        params, opt_state = _apply_updates(params, grads, opt_state, tx)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return step


def make_effnet_step(tx, policy: Policy, stats: str = "clip"):
    """CIFAKE EfficientNet step (C17, reference train_cifake_forensics.py):
    CE on 2-class logits; BN runs in batch-stats mode and the running stats
    are folded back functionally. `stats='clip'` replicates the reference
    trainer's CLIP-stat normalization (train_cifake_forensics.py:44,50)."""
    from misinfo_tpu.models.efficientnet import merge_bn_updates

    def loss_fn(params, batch, rng):
        imgs = normalize_images(batch["images_u8"], stats, policy.compute)
        logits, bn_state = effnet_apply(params["efficientnet"], imgs,
                                        train=True, rng=rng, policy=policy)
        loss = cross_entropy(logits, batch["labels"])
        return loss, (binary_accuracy(logits, batch["labels"]), bn_state)

    # donate params/opt_state: XLA applies the AdamW update in place,
    # saving a full copy of the train-state HBM traffic per step
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        (loss, (acc, bn_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, rng)
        params, opt_state = _apply_updates(params, grads, opt_state, tx)
        params = dict(params)
        params["efficientnet"] = merge_bn_updates(params["efficientnet"], bn_state)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return step


def make_clip_step(tx, det_cfg: DetectorConfig, policy: Policy):
    """CLIPDetective step (C18, reference train_clip_detective.py):
    symmetric InfoNCE on matched pairs, trainable projections+logit_scale
    (freezing is expressed by the optimizer mask).

    Under a (data,) mesh the in-batch negatives are GLOBAL: the loss is
    written over the logical [B] batch, so the [B, B] similarity matrix
    spans all shards and GSPMD inserts the embedding all-gather over ICI —
    naive per-shard DP would silently shrink the negative set to B/D
    (VERDICT r2 #2; equality asserted in tests/test_trainers_mesh.py)."""

    def loss_fn(params, batch):
        te = clip_text_features(params["clip"], batch["input_ids"],
                                batch["attention_mask"], det_cfg.clip, policy)
        ie = clip_image_features(params["clip"],
                                 normalize_images(batch["images_u8"], "clip",
                                                  policy.compute),
                                 det_cfg.clip, policy)
        loss = clip_contrastive_loss(ie, te, params["clip"]["logit_scale"])
        sims = jnp.sum(l2_normalize(ie) * l2_normalize(te), axis=-1)
        return loss, jnp.mean(sims)

    # donate params/opt_state: XLA applies the AdamW update in place,
    # saving a full copy of the train-state HBM traffic per step
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        (loss, mean_sim), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        params, opt_state = _apply_updates(params, grads, opt_state, tx)
        return params, opt_state, {"loss": loss, "mean_matched_sim": mean_sim}

    return step


def make_fusion_step(tx):
    """Fusion-judge step (C20, reference train_fusion_judge.py) on a
    PRECOMPUTED 5-score matrix. The reference recomputes all frozen-branch
    scores per sample per epoch inside DataLoader __getitem__ (SURVEY.md
    §3.4 — its most wasteful loop); here branch scores are produced once by
    a batched engine sweep and the 2.6k-param MLP trains on them."""

    def loss_fn(params, batch, rng):
        logits = fusion_apply(params["fusion"], batch["score_vectors"],
                              rng=rng, deterministic=False)
        loss = cross_entropy(logits, batch["labels"])
        return loss, binary_accuracy(logits, batch["labels"])

    # donate params/opt_state: XLA applies the AdamW update in place,
    # saving a full copy of the train-state HBM traffic per step
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        params, opt_state = _apply_updates(params, grads, opt_state, tx)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return step


def make_full_step(tx, det_cfg: DetectorConfig, policy: Policy,
                   jit: bool = True):
    """Joint full-detector step: dual-head CE + EfficientNet CE + CLIP
    InfoNCE + fusion CE in ONE program. This is the flagship multi-chip
    training graph exercised by __graft_entry__.dryrun_multichip — all
    four branches' gradients flow in a single XLA program over the
    (data, model) mesh."""

    def loss_fn(params, batch, rng):
        r1, r2 = jax.random.split(rng)
        ai, mis = dual_head_logits(
            params["roberta"], params["ai_head"], params["misinfo_head"],
            batch["input_ids"], batch["attention_mask"], det_cfg.roberta,
            policy, rng=r1, deterministic=False)
        imgs_clip = normalize_images(batch["images_u8"], "clip", policy.compute)
        imgs_eff = normalize_images(batch["images_u8"], "imagenet", policy.compute)
        eff_logits, _ = effnet_apply(params["efficientnet"], imgs_eff,
                                     policy=policy)  # inference BN for stability
        te = clip_text_features(params["clip"], batch["clip_ids"],
                                batch["clip_mask"], det_cfg.clip, policy)
        ie = clip_image_features(params["clip"], imgs_clip, det_cfg.clip, policy)
        sims = jnp.sum(l2_normalize(ie) * l2_normalize(te), axis=-1)
        ai_p = jax.nn.softmax(ai, axis=-1)[:, 1]
        mis_p = jax.nn.softmax(mis, axis=-1)[:, 1]
        eff_p = jax.nn.softmax(eff_logits, axis=-1)[:, 1]
        vec = jnp.stack([ai_p, mis_p, eff_p, sims,
                         jnp.zeros_like(sims)], axis=1)
        fusion_logits = fusion_apply(params["fusion"], vec, rng=r2,
                                     deterministic=False)
        labels = batch["labels"]
        loss = (cross_entropy(mis, labels)
                + cross_entropy(ai, labels)
                + cross_entropy(eff_logits, labels)
                + clip_contrastive_loss(ie, te, params["clip"]["logit_scale"])
                + cross_entropy(fusion_logits, labels))
        return loss, binary_accuracy(fusion_logits, labels)

    def step(params, opt_state, batch, rng):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        params, opt_state = _apply_updates(params, grads, opt_state, tx)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return jax.jit(step, donate_argnums=(0, 1)) if jit else step
