"""CLIP ViT-B/32 dual tower, pure functional JAX.

Re-implements the consistency scorer / vault encoder of the reference
(C4/C5 in SURVEY.md §2.1): HF `CLIPModel` (reference misinfo_forensics.py:
210-212) with L2-normalized embeddings and cosine similarity (reference
:394-404). Semantics matched to HF (validated by tests/test_clip_parity.py):

  * text tower: pre-LN blocks, causal mask + padding mask, quick_gelu,
    pooled state at the *first* EOS position, `text_projection` (no bias)
  * vision tower: 32×32 patch conv (no bias) + class token + learned
    positions, pre-layernorm, post-layernorm on class token,
    `visual_projection` (no bias)
  * trainable `logit_scale` (used by the CLIPDetective trainer,
    reference train_clip_detective.py:89-117)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from misinfo_tpu.ops.common import (
    DEFAULT_POLICY, Policy, dense, dense_init, layer_norm, layer_norm_init,
    l2_normalize, quick_gelu,
)
from misinfo_tpu.ops.attention import attention_init, multi_head_attention


@dataclass(frozen=True)
class ClipConfig:
    # text tower
    vocab_size: int = 49408
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    text_mlp: int = 2048
    max_text_len: int = 77
    eos_token_id: int = 49407
    # vision tower
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vision_mlp: int = 3072
    # shared
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    logit_scale_init: float = 2.6592  # ln(1/0.07), HF default

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def tiny() -> "ClipConfig":
        return ClipConfig(vocab_size=512, text_width=64, text_layers=2,
                          text_heads=4, text_mlp=128, max_text_len=32,
                          eos_token_id=511, image_size=64, patch_size=16,
                          vision_width=96, vision_layers=2, vision_heads=4,
                          vision_mlp=192, projection_dim=64)


def _block_init(key, width: int, mlp: int) -> Dict:
    ks = jax.random.split(key, 3)
    return {
        "ln1": layer_norm_init(width),
        "attn": attention_init(ks[0], width, 1),
        "ln2": layer_norm_init(width),
        "mlp_in": dense_init(ks[1], width, mlp),
        "mlp_out": dense_init(ks[2], mlp, width),
    }


def _encoder_apply(blocks, x, num_heads, *, mask=None, causal=False,
                   eps=1e-5, policy=DEFAULT_POLICY, use_pallas=False):
    # use_pallas="ffn": fused dense→quick_gelu→dense (ops/pallas_ffn.py)
    ffn_fused = use_pallas == "ffn"
    attn_pallas = False if ffn_fused else use_pallas
    for blk in blocks:
        h = layer_norm(blk["ln1"], x, eps, policy)
        h = multi_head_attention(blk["attn"], h, num_heads, mask=mask,
                                 causal=causal, policy=policy,
                                 use_pallas=attn_pallas)
        x = x + h
        h = layer_norm(blk["ln2"], x, eps, policy)
        if "kernel_q" in blk["mlp_in"]:
            # int8 serving mode (ops/pallas_int8.py; quick_gelu variant)
            from misinfo_tpu.ops.pallas_int8 import int8_ffn_apply
            h = int8_ffn_apply(blk["mlp_in"], blk["mlp_out"], h,
                               policy=policy, mode="quick")
        elif ffn_fused and "kernel" in blk["mlp_in"]:
            from misinfo_tpu.ops.pallas_ffn import ffn_apply
            h = ffn_apply(blk["mlp_in"], blk["mlp_out"], h,
                          policy=policy, mode="quick")
        else:
            h = dense(blk["mlp_out"], quick_gelu(dense(blk["mlp_in"], h, policy)), policy)
        x = x + h
    return x


def clip_init(key, cfg: ClipConfig = ClipConfig()) -> Dict:
    ks = jax.random.split(key, cfg.text_layers + cfg.vision_layers + 8)
    i = 0

    def nk():
        nonlocal i
        i += 1
        return ks[i - 1]

    s = 0.02
    text = {
        "token_embedding": jax.random.normal(nk(), (cfg.vocab_size, cfg.text_width)) * s,
        "position_embedding": jax.random.normal(nk(), (cfg.max_text_len, cfg.text_width)) * s,
        "blocks": [_block_init(nk(), cfg.text_width, cfg.text_mlp)
                   for _ in range(cfg.text_layers)],
        "final_ln": layer_norm_init(cfg.text_width),
    }
    vision = {
        "class_embedding": jax.random.normal(nk(), (cfg.vision_width,)) * s,
        "patch_embedding": jax.random.normal(
            nk(), (cfg.patch_size, cfg.patch_size, 3, cfg.vision_width)) * s,
        "position_embedding": jax.random.normal(
            nk(), (cfg.num_patches + 1, cfg.vision_width)) * s,
        "pre_ln": layer_norm_init(cfg.vision_width),
        "blocks": [_block_init(nk(), cfg.vision_width, cfg.vision_mlp)
                   for _ in range(cfg.vision_layers)],
        "post_ln": layer_norm_init(cfg.vision_width),
    }
    return {
        "text": text,
        "vision": vision,
        "text_projection": {"kernel": jax.random.normal(nk(), (cfg.text_width, cfg.projection_dim)) * s},
        "visual_projection": {"kernel": jax.random.normal(nk(), (cfg.vision_width, cfg.projection_dim)) * s},
        "logit_scale": jnp.asarray(cfg.logit_scale_init, jnp.float32),
    }


def clip_text_features(
    params: Dict,
    input_ids: jax.Array,       # [B, 77]
    attention_mask: jax.Array,  # [B, 77]
    cfg: ClipConfig = ClipConfig(),
    policy: Policy = DEFAULT_POLICY,
    use_pallas: bool = False,
) -> jax.Array:
    """→ unnormalized text_embeds [B, proj] f32 (HF get_text_features)."""
    t = params["text"]
    S = input_ids.shape[1]
    x = jnp.take(t["token_embedding"], input_ids, axis=0)
    x = (x + t["position_embedding"][:S]).astype(policy.compute)
    x = _encoder_apply(t["blocks"], x, cfg.text_heads, mask=attention_mask,
                       causal=True, eps=cfg.layer_norm_eps, policy=policy,
                       use_pallas=use_pallas)
    x = layer_norm(t["final_ln"], x, cfg.layer_norm_eps, policy)
    # pool at the first EOS position (HF CLIPTextModel behavior)
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=1)
    pooled = x[jnp.arange(x.shape[0]), eos_pos]
    return dense(params["text_projection"], pooled, policy).astype(jnp.float32)


def clip_image_features(
    params: Dict,
    images: jax.Array,          # [B, H, W, 3] normalized, NHWC
    cfg: ClipConfig = ClipConfig(),
    policy: Policy = DEFAULT_POLICY,
    use_pallas: bool = False,
) -> jax.Array:
    """→ unnormalized image_embeds [B, proj] f32 (HF get_image_features)."""
    v = params["vision"]
    B = images.shape[0]
    # patchify via conv with stride=patch (maps onto the MXU as a matmul)
    # output dtype = policy.compute directly: conv's transpose rule
    # requires same-dtype operands, so an accum-dtype output from bf16
    # operands breaks every bf16 TRAINING step (same latent bug as
    # efficientnet._conv, found by tools/bench_train.py round 4; TPU
    # results identical — the MXU accumulates f32 internally either way,
    # and f32 parity mode has compute == accum)
    patches = jax.lax.conv_general_dilated(
        images.astype(policy.compute),
        v["patch_embedding"].astype(policy.compute),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=policy.compute,
        precision=policy.precision,
    ).astype(policy.compute)
    patches = patches.reshape(B, -1, cfg.vision_width)
    cls = jnp.broadcast_to(v["class_embedding"].astype(policy.compute),
                           (B, 1, cfg.vision_width))
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + v["position_embedding"].astype(policy.compute)
    x = layer_norm(v["pre_ln"], x, cfg.layer_norm_eps, policy)
    x = _encoder_apply(v["blocks"], x, cfg.vision_heads,
                       eps=cfg.layer_norm_eps, policy=policy,
                       use_pallas=use_pallas)
    pooled = layer_norm(v["post_ln"], x[:, 0], cfg.layer_norm_eps, policy)
    return dense(params["visual_projection"], pooled, policy).astype(jnp.float32)


def clip_similarity(
    params: Dict,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    images: jax.Array,
    cfg: ClipConfig = ClipConfig(),
    policy: Policy = DEFAULT_POLICY,
    use_pallas: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """→ (cosine_sim [B], text_embeds_norm, image_embeds_norm).

    Matches reference analyze_consistency (misinfo_forensics.py:394-404):
    L2-normalize both embeddings, per-pair dot product.
    """
    te = l2_normalize(clip_text_features(params, input_ids, attention_mask,
                                         cfg, policy, use_pallas))
    ie = l2_normalize(clip_image_features(params, images, cfg, policy, use_pallas))
    sim = jnp.sum(te * ie, axis=-1)
    return sim, te, ie
