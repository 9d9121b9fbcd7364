"""Training losses + metrics replicating the reference trainers' math.

* `cross_entropy` — standard CE used by every classifier trainer.
* `clip_contrastive_loss` — the CLIPDetective symmetric InfoNCE on
  matched pairs with in-batch negatives (reference
  train_clip_detective.py:129-166).
* `median_threshold_accuracy` — the reference's unusual per-batch
  median-threshold match/mismatch accuracy (reference :169-187), kept for
  comparability; `fixed_threshold_accuracy` is the sane companion metric
  (SURVEY.md §7 'quirks to preserve or consciously fix').
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy; logits [B,C] f32, labels [B] int."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def clip_contrastive_loss(image_embeds: jax.Array, text_embeds: jax.Array,
                          logit_scale: jax.Array) -> jax.Array:
    """Symmetric InfoNCE over in-batch negatives. Embeddings are
    L2-normalized here (idempotent if already normalized)."""
    ie = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    te = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
    scale = jnp.exp(logit_scale)
    logits_it = scale * ie @ te.T          # [B, B]
    labels = jnp.arange(ie.shape[0])
    loss_i = cross_entropy(logits_it, labels)
    loss_t = cross_entropy(logits_it.T, labels)
    return 0.5 * (loss_i + loss_t)


def median_threshold_accuracy(sims: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-batch median of cosine sims as the match/mismatch threshold
    (reference train_clip_detective.py:181-186): pred=1 (match) iff
    sim >= median(sims)."""
    med = jnp.median(sims)
    preds = (sims >= med).astype(jnp.int32)
    return jnp.mean((preds == labels).astype(jnp.float32))


def fixed_threshold_accuracy(sims: jax.Array, labels: jax.Array,
                             threshold: float = 0.25) -> jax.Array:
    """Companion metric at the standalone engine's 0.25 match threshold
    (reference clip_similarity_engine.py:18)."""
    preds = (sims >= threshold).astype(jnp.int32)
    return jnp.mean((preds == labels).astype(jnp.float32))


def binary_accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    preds = jnp.argmax(logits, axis=-1)
    return jnp.mean((preds == labels).astype(jnp.float32))


def weighted_cross_entropy(logits: jax.Array, labels: jax.Array,
                           weights: jax.Array) -> jax.Array:
    """CE averaged over weighted rows (packed-slot validity masking)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = weights.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def weighted_accuracy(logits: jax.Array, labels: jax.Array,
                      weights: jax.Array) -> jax.Array:
    preds = jnp.argmax(logits, axis=-1)
    w = weights.astype(jnp.float32)
    hits = (preds == labels).astype(jnp.float32) * w
    return jnp.sum(hits) / jnp.maximum(jnp.sum(w), 1.0)
