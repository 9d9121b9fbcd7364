"""RoBERTa-base encoder + dual classification heads, pure functional JAX.

Re-implements the text detective of the reference (C1/C2 in SURVEY.md §2.1):
HF `RobertaModel` backbone (reference misinfo_forensics.py:53) with CLS
pooling (reference :95) feeding `ai_head` and `misinfo_head`
(768→256→ReLU→Dropout(0.3)→256→2, reference :57-69).

Numerical semantics match HF exactly (validated by
tests/test_roberta_parity.py against a random-init torch RobertaModel):
  * position ids = cumsum(mask)·mask + padding_idx (RoBERTa offset rule)
  * post-LN encoder blocks, erf GELU, LayerNorm eps 1e-5
  * additive padding mask
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from misinfo_tpu.ops.common import (
    DEFAULT_POLICY, Policy, dense, dense_init, dropout as _dropout,
    gelu, layer_norm, layer_norm_init,
)
from misinfo_tpu.ops.attention import attention_init, multi_head_attention


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    head_hidden: int = 256
    head_dropout: float = 0.3   # reference misinfo_forensics.py:60,67

    @staticmethod
    def tiny() -> "RobertaConfig":
        """Small config for fast tests."""
        return RobertaConfig(vocab_size=1024, hidden_size=64, num_layers=2,
                             num_heads=4, intermediate_size=128,
                             max_position_embeddings=130)


def _layer_init(key, cfg: RobertaConfig) -> Dict:
    ks = jax.random.split(key, 3)
    return {
        "attn": attention_init(ks[0], cfg.hidden_size, cfg.num_heads),
        "attn_ln": layer_norm_init(cfg.hidden_size),
        "mlp_in": dense_init(ks[1], cfg.hidden_size, cfg.intermediate_size),
        "mlp_out": dense_init(ks[2], cfg.intermediate_size, cfg.hidden_size),
        "mlp_ln": layer_norm_init(cfg.hidden_size),
    }


def head_init(key, cfg: RobertaConfig) -> Dict:
    """One dual-head MLP: Linear(D,256)→ReLU→Dropout→Linear(256,2)."""
    k1, k2 = jax.random.split(key)
    return {"fc1": dense_init(k1, cfg.hidden_size, cfg.head_hidden),
            "fc2": dense_init(k2, cfg.head_hidden, 2)}


def head_apply(params: Dict, pooled: jax.Array, *, rng=None,
               deterministic: bool = True, dropout_rate: float = 0.3,
               policy: Policy = DEFAULT_POLICY) -> jax.Array:
    h = jnp.maximum(dense(params["fc1"], pooled, policy), 0)
    h = _dropout(rng, h, dropout_rate, deterministic)
    return dense(params["fc2"], h, policy).astype(jnp.float32)


def roberta_init(key, cfg: RobertaConfig = RobertaConfig()) -> Dict:
    ks = jax.random.split(key, cfg.num_layers + 4)
    emb_scale = 0.02
    params = {
        "embeddings": {
            "word": jax.random.normal(ks[0], (cfg.vocab_size, cfg.hidden_size)) * emb_scale,
            "position": jax.random.normal(ks[1], (cfg.max_position_embeddings, cfg.hidden_size)) * emb_scale,
            "token_type": jnp.zeros((cfg.type_vocab_size, cfg.hidden_size)),
            "ln": layer_norm_init(cfg.hidden_size),
        },
        "layers": [_layer_init(ks[3 + i], cfg) for i in range(cfg.num_layers)],
    }
    return params


def _position_ids(input_ids: jax.Array, pad_id: int) -> jax.Array:
    mask = (input_ids != pad_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_id


def roberta_encode(
    params: Dict,
    input_ids: jax.Array,        # [B, S] int32
    attention_mask: jax.Array,   # [B, S] int32
    cfg: RobertaConfig = RobertaConfig(),
    policy: Policy = DEFAULT_POLICY,
    *,
    rng=None,
    deterministic: bool = True,
    use_pallas: bool = False,
    position_ids: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """→ last_hidden_state [B, S, D] (compute dtype).

    ``position_ids``/``segment_ids`` support sequence packing: multiple
    requests share a row, positions restart per segment, and attention is
    block-diagonal (ops/attention.py). Host-side packing lives in
    preprocess/packing.py; scores are bitwise-independent of co-packed
    neighbours (tests/test_packing.py)."""
    emb = params["embeddings"]
    pos_ids = (position_ids if position_ids is not None
               else _position_ids(input_ids, cfg.pad_token_id))
    x = (jnp.take(emb["word"], input_ids, axis=0)
         + jnp.take(emb["position"], pos_ids, axis=0)
         + emb["token_type"][0])
    x = layer_norm(emb["ln"], x, cfg.layer_norm_eps, policy)
    if not deterministic:
        rng, k = jax.random.split(rng)
        x = _dropout(k, x, cfg.hidden_dropout, deterministic)
    x = x.astype(policy.compute)

    # use_pallas="ffn" fuses each layer's dense→GELU→dense into one Pallas
    # kernel (ops/pallas_ffn.py); attention stays on the XLA path there.
    ffn_fused = use_pallas == "ffn"
    attn_pallas = False if ffn_fused else use_pallas
    for layer in params["layers"]:
        attn_out = multi_head_attention(
            layer["attn"], x, cfg.num_heads,
            mask=None if segment_ids is not None else attention_mask,
            segment_ids=segment_ids,
            policy=policy, use_pallas=attn_pallas)
        if not deterministic:
            rng, k = jax.random.split(rng)
            attn_out = _dropout(k, attn_out, cfg.hidden_dropout, deterministic)
        x = layer_norm(layer["attn_ln"], x + attn_out, cfg.layer_norm_eps, policy)
        if "kernel_q" in layer["mlp_in"]:
            # int8 serving mode: the fused int8-MXU FFN kernel
            # (ops/pallas_int8.py) when enabled, XLA int8 chain otherwise.
            from misinfo_tpu.ops.pallas_int8 import int8_ffn_apply
            mlp = int8_ffn_apply(layer["mlp_in"], layer["mlp_out"], x,
                                 policy=policy, mode=policy.gelu_mode)
        elif ffn_fused and "kernel" in layer["mlp_in"]:
            from misinfo_tpu.ops.pallas_ffn import ffn_apply
            mlp = ffn_apply(layer["mlp_in"], layer["mlp_out"], x,
                            policy=policy, mode=policy.gelu_mode)
        else:
            mlp = gelu(dense(layer["mlp_in"], x, policy), policy)
            mlp = dense(layer["mlp_out"], mlp, policy)
        if not deterministic:
            rng, k = jax.random.split(rng)
            mlp = _dropout(k, mlp, cfg.hidden_dropout, deterministic)
        x = layer_norm(layer["mlp_ln"], x + mlp, cfg.layer_norm_eps, policy)
    return x


def roberta_cls(params, input_ids, attention_mask,
                cfg: RobertaConfig = RobertaConfig(),
                policy: Policy = DEFAULT_POLICY, **kw) -> jax.Array:
    """[CLS] pooling (position 0) — reference misinfo_forensics.py:95."""
    hidden = roberta_encode(params, input_ids, attention_mask, cfg, policy, **kw)
    return hidden[:, 0, :]


def dual_head_logits(
    backbone_params: Dict,
    ai_head_params: Dict,
    misinfo_head_params: Dict,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: RobertaConfig = RobertaConfig(),
    policy: Policy = DEFAULT_POLICY,
    **kw,
) -> Tuple[jax.Array, jax.Array]:
    """forward_text of the reference (misinfo_forensics.py:92-100):
    → (ai_logits [B,2], misinfo_logits [B,2]) in f32."""
    pooled = roberta_cls(backbone_params, input_ids, attention_mask, cfg, policy, **kw)
    ai = head_apply(ai_head_params, pooled, policy=policy,
                    dropout_rate=cfg.head_dropout)
    mis = head_apply(misinfo_head_params, pooled, policy=policy,
                     dropout_rate=cfg.head_dropout)
    return ai, mis
