"""Fusion judge MLP: 5 forensic signals → REAL/FAKE logits.

Re-implements C6 of SURVEY.md §2.1 — the reference's
`Linear(5,64)→ReLU→Dropout(0.2)→Linear(64,32)→ReLU→Linear(32,2)`
(reference misinfo_forensics.py:83-90), consuming the signal vector
`[ai_score, misinfo_score, deepfake_score, clip_similarity,
vault_discrepancy]` (reference :586-593).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from misinfo_tpu.ops.common import (
    DEFAULT_POLICY, F32_POLICY, Policy, dense, dense_init)

FUSION_DIMS = (5, 64, 32, 2)
FUSION_DROPOUT = 0.2  # reference misinfo_forensics.py:86


def fusion_init(key) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fc1": dense_init(k1, FUSION_DIMS[0], FUSION_DIMS[1]),
        "fc2": dense_init(k2, FUSION_DIMS[1], FUSION_DIMS[2]),
        "fc3": dense_init(k3, FUSION_DIMS[2], FUSION_DIMS[3]),
    }


def fusion_apply(params: Dict, scores: jax.Array, *, rng=None,
                 deterministic: bool = True,
                 policy: Policy = DEFAULT_POLICY) -> jax.Array:
    """scores [B,5] → logits [B,2] f32. This MLP is tiny (2.6k params);
    it runs in f32 — the cost is negligible and score parity is exact."""
    x = scores.astype(jnp.float32)
    h = jnp.maximum(dense(params["fc1"], x, policy=F32_POLICY), 0)
    if not deterministic and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - FUSION_DROPOUT, h.shape)
        h = jnp.where(keep, h / (1.0 - FUSION_DROPOUT), 0.0)
    h = jnp.maximum(dense(params["fc2"], h, policy=F32_POLICY), 0)
    return dense(params["fc3"], h, policy=F32_POLICY).astype(jnp.float32)
