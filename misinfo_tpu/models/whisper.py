"""Whisper encoder-decoder for video transcript extraction, pure JAX.

The reference dashboard lazily loads openai-whisper and merges the
transcript into the caption before analysis (C13, reference
forensics_dashboard.py:18-87,160-162). This module provides the
TPU-native model: log-mel frontend (preprocess/audio.py), conv-downsampled
encoder with sinusoidal positions, causal decoder with cross-attention and
greedy decoding via `lax.while_loop` (compiler-friendly, fixed max length).

Semantics match HF `WhisperModel` (validated by tests/test_whisper_parity.py
with a tiny random-init config): pre-LN blocks, GELU, learned decoder
positions, encoder positions fixed-sinusoidal.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from misinfo_tpu.ops.common import (
    DEFAULT_POLICY, Policy, dense, dense_init, gelu_exact, layer_norm,
    layer_norm_init,
)
from misinfo_tpu.ops.attention import attention_init, multi_head_attention


@dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 512            # base
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    max_source_positions: int = 1500
    max_target_positions: int = 448
    eos_token_id: int = 50257
    decoder_start_token_id: int = 50258

    @staticmethod
    def tiny() -> "WhisperConfig":
        return WhisperConfig(vocab_size=256, num_mel_bins=16, d_model=64,
                             encoder_layers=2, decoder_layers=2, num_heads=4,
                             ffn_dim=128, max_source_positions=64,
                             max_target_positions=32, eos_token_id=255,
                             decoder_start_token_id=254)


def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    """Whisper's fixed sinusoid table (interleaved sin/cos halves)."""
    log_timescale = np.log(10000.0) / (dim // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(dim // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def _enc_block_init(key, cfg):
    ks = jax.random.split(key, 3)
    return {
        "ln1": layer_norm_init(cfg.d_model),
        "attn": attention_init(ks[0], cfg.d_model, cfg.num_heads),
        "ln2": layer_norm_init(cfg.d_model),
        "mlp_in": dense_init(ks[1], cfg.d_model, cfg.ffn_dim),
        "mlp_out": dense_init(ks[2], cfg.ffn_dim, cfg.d_model),
    }


def _dec_block_init(key, cfg):
    ks = jax.random.split(key, 4)
    return {
        "ln1": layer_norm_init(cfg.d_model),
        "self_attn": attention_init(ks[0], cfg.d_model, cfg.num_heads),
        "ln_cross": layer_norm_init(cfg.d_model),
        "cross_attn": attention_init(ks[1], cfg.d_model, cfg.num_heads),
        "ln2": layer_norm_init(cfg.d_model),
        "mlp_in": dense_init(ks[2], cfg.d_model, cfg.ffn_dim),
        "mlp_out": dense_init(ks[3], cfg.ffn_dim, cfg.d_model),
    }


def whisper_init(key, cfg: WhisperConfig = WhisperConfig()) -> Dict:
    n = cfg.encoder_layers + cfg.decoder_layers + 8
    ks = iter(jax.random.split(key, n))
    s = 0.02
    return {
        "encoder": {
            "conv1": {"kernel": jax.random.normal(next(ks), (3, cfg.num_mel_bins, cfg.d_model)) * s,
                      "bias": jnp.zeros((cfg.d_model,))},
            "conv2": {"kernel": jax.random.normal(next(ks), (3, cfg.d_model, cfg.d_model)) * s,
                      "bias": jnp.zeros((cfg.d_model,))},
            "positions": jnp.asarray(
                sinusoidal_positions(cfg.max_source_positions, cfg.d_model)),
            "blocks": [_enc_block_init(next(ks), cfg)
                       for _ in range(cfg.encoder_layers)],
            "final_ln": layer_norm_init(cfg.d_model),
        },
        "decoder": {
            "token_embedding": jax.random.normal(
                next(ks), (cfg.vocab_size, cfg.d_model)) * s,
            "positions": jax.random.normal(
                next(ks), (cfg.max_target_positions, cfg.d_model)) * s,
            "blocks": [_dec_block_init(next(ks), cfg)
                       for _ in range(cfg.decoder_layers)],
            "final_ln": layer_norm_init(cfg.d_model),
        },
    }


def _conv1d(p: Dict, x: jax.Array, stride: int, policy: Policy) -> jax.Array:
    """1-D conv over time (kernel [K, Cin, Cout]), SAME padding.

    Output dtype = policy.compute directly (not accum-then-cast): conv's
    transpose rule requires same-dtype operands, so an accum-dtype output
    from bf16 operands breaks bf16 training (the efficientnet._conv bug,
    round 4); TPU forward results identical, f32 mode unchanged."""
    y = jax.lax.conv_general_dilated(
        x.astype(policy.compute), p["kernel"].astype(policy.compute),
        window_strides=(stride,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=policy.compute,
        precision=policy.precision).astype(policy.compute)
    return y + p["bias"].astype(policy.compute)


def whisper_encode(params: Dict, mel: jax.Array,
                   cfg: WhisperConfig = WhisperConfig(),
                   policy: Policy = DEFAULT_POLICY) -> jax.Array:
    """mel [B, T, n_mels] → encoder states [B, T//2, D]."""
    enc = params["encoder"]
    x = gelu_exact(_conv1d(enc["conv1"], mel, 1, policy))
    x = gelu_exact(_conv1d(enc["conv2"], x, 2, policy))
    x = x + enc["positions"][: x.shape[1]].astype(policy.compute)
    for blk in enc["blocks"]:
        h = layer_norm(blk["ln1"], x, policy=policy)
        x = x + multi_head_attention(blk["attn"], h, cfg.num_heads, policy=policy)
        h = layer_norm(blk["ln2"], x, policy=policy)
        x = x + dense(blk["mlp_out"], gelu_exact(dense(blk["mlp_in"], h, policy)), policy)
    return layer_norm(enc["final_ln"], x, policy=policy)


def whisper_decode_step(params: Dict, tokens: jax.Array, enc_out: jax.Array,
                        cfg: WhisperConfig = WhisperConfig(),
                        policy: Policy = DEFAULT_POLICY) -> jax.Array:
    """Full-prefix decoder forward → logits [B, S, V] (no KV cache; fine at
    transcript lengths ≤448)."""
    dec = params["decoder"]
    S = tokens.shape[1]
    x = (jnp.take(dec["token_embedding"], tokens, axis=0)
         + dec["positions"][:S]).astype(policy.compute)
    for blk in dec["blocks"]:
        h = layer_norm(blk["ln1"], x, policy=policy)
        x = x + multi_head_attention(blk["self_attn"], h, cfg.num_heads,
                                     causal=True, policy=policy)
        h = layer_norm(blk["ln_cross"], x, policy=policy)
        x = x + multi_head_attention(blk["cross_attn"], h, cfg.num_heads,
                                     kv=enc_out, policy=policy)
        h = layer_norm(blk["ln2"], x, policy=policy)
        x = x + dense(blk["mlp_out"], gelu_exact(dense(blk["mlp_in"], h, policy)), policy)
    x = layer_norm(dec["final_ln"], x, policy=policy)
    return jnp.dot(x, dec["token_embedding"].T.astype(policy.compute),
                   preferred_element_type=jnp.float32,
                   precision=policy.precision)


def _cached_decoder_step(params: Dict, token: jax.Array, pos: jax.Array,
                         enc_out: jax.Array, kv_cache: Dict,
                         cfg: WhisperConfig, policy: Policy,
                         pallas_ffn: bool = False,
                         pallas_self_attn: bool = False,
                         pallas_cross: bool = False,
                         pallas_layer: bool = False):
    """One decoder step with KV caching.

    token [B] int32, pos scalar int32 → (logits [B,V], updated cache).
    Self-attention K/V for the new position are written into fixed
    [B, H, max_target, Dh] cache buffers (static shapes, `lax`-friendly);
    cross-attention K/V are precomputed once per utterance in the SAME
    head-major layout. [B, H, S, Dh] is deliberate: the attention einsums
    contract it without transposing — the previous [B, S, H, Dh] layout
    made XLA re-transpose the full caches (6 MB cross K/V per layer)
    inside EVERY decode step, which profiling showed as the dominant
    async-copy/slice cost (docs/PERF.md round 3).
    """
    dec = params["decoder"]
    B = token.shape[0]
    D = cfg.d_model
    H = cfg.num_heads
    Dh = D // H

    if "token_embedding_q" in dec:
        # int8 streaming mode (quantize_whisper_decoder): the input lookup
        # dequantizes just the B gathered rows — token-dependent, so XLA
        # cannot hoist it into a full dequantized embedding
        emb = (jnp.take(dec["token_embedding_q"], token, axis=0)
               .astype(jnp.float32)
               * jnp.take(dec["emb_scale"], token)[:, None])
    else:
        emb = jnp.take(dec["token_embedding"], token, axis=0)
    x = (emb + dec["positions"][pos]).astype(policy.compute)  # [B, D]
    x = x[:, None, :]                                          # [B, 1, D]

    S_max = (kv_cache["self_k"][0].shape[1]
             if (pallas_self_attn or pallas_layer)
             else kv_cache["self_k"][0].shape[2])
    pos_mask = (jnp.arange(S_max)[None, :] <= pos).astype(jnp.float32)  # [1,S]

    new_cache = {"self_k": [], "self_v": []}
    for li, blk in enumerate(dec["blocks"]):
        if pallas_layer:
            # the whole layer as ONE kernel (ops/pallas_layer.py; int8
            # weights required — VMEM only fits with them)
            from misinfo_tpu.ops.pallas_layer import fused_layer_step
            x2, ck, cv = fused_layer_step(
                x[:, 0], blk, kv_cache["self_k"][li],
                kv_cache["self_v"][li], kv_cache["cross_k"][li],
                kv_cache["cross_v"][li], pos, enc_out.shape[1],
                n_heads=H, policy=policy)
            x = x2[:, None, :]
            new_cache["self_k"].append(ck)
            new_cache["self_v"].append(cv)
            continue
        if pallas_self_attn and "qkv" in blk["self_attn"]:
            # ONE kernel for the whole self-attention step (LN → QKV →
            # cache write → masked attention → output proj → residual);
            # ops/pallas_decode.py, opt-in per the CLAUDE.md kernel rule
            from misinfo_tpu.ops.pallas_decode import fused_self_attn_step
            x2, ck, cv = fused_self_attn_step(
                x[:, 0], blk["ln1"], blk["self_attn"]["qkv"],
                blk["self_attn"]["o"], kv_cache["self_k"][li],
                kv_cache["self_v"][li], pos, n_heads=H, policy=policy)
            x = x2[:, None, :]
            new_cache["self_k"].append(ck)
            new_cache["self_v"].append(cv)
        else:
            h = layer_norm(blk["ln1"], x, policy=policy)
            if "qkv" in blk["self_attn"]:
                # fused projection (fuse_whisper_decoder_qkv): one weight
                # stream + dispatch; the S=1 split is a trivial row slice
                qkv = dense(blk["self_attn"]["qkv"], h, policy)  # [B,1,3D]
                q = qkv[..., :D].reshape(B, 1, H, Dh)
                k_new = qkv[..., D:2 * D].reshape(B, H, Dh)
                v_new = qkv[..., 2 * D:].reshape(B, H, Dh)
            else:
                q = dense(blk["self_attn"]["q"], h, policy).reshape(B, 1, H, Dh)
                k_new = dense(blk["self_attn"]["k"], h, policy).reshape(B, H, Dh)
                v_new = dense(blk["self_attn"]["v"], h, policy).reshape(B, H, Dh)
            ck = jax.lax.dynamic_update_index_in_dim(
                kv_cache["self_k"][li], k_new, pos, axis=2)    # [B,H,S,Dh]
            cv = jax.lax.dynamic_update_index_in_dim(
                kv_cache["self_v"][li], v_new, pos, axis=2)
            new_cache["self_k"].append(ck)
            new_cache["self_v"].append(cv)
            scores = jnp.einsum("bqhd,bhsd->bhqs", q, ck,
                                preferred_element_type=jnp.float32,
                                precision=policy.precision) / np.sqrt(Dh)
            scores = scores + (1.0 - pos_mask)[None, None, :, :] * -1e9
            probs = jax.nn.softmax(scores, axis=-1).astype(policy.compute)
            ctx = jnp.einsum("bhqs,bhsd->bqhd", probs, cv,
                             preferred_element_type=policy.accum,
                             precision=policy.precision).astype(policy.compute)
            x = x + dense(blk["self_attn"]["o"], ctx.reshape(B, 1, D), policy)

        if pallas_cross:
            # ONE kernel for the layer's whole second half: LN → cross-attn
            # (merged-lane [B, T, D] K/V) → o proj → residual → LN → FFN →
            # residual (ops/pallas_cross_ffn.py; decode is kernel-chain-
            # bound — docs/PERF.md round 4)
            from misinfo_tpu.ops.pallas_cross_ffn import fused_cross_ffn_step
            msc = kv_cache.get("cross_k_mscale")
            x = fused_cross_ffn_step(
                x[:, 0], blk["ln_cross"], blk["cross_attn"]["q"],
                blk["cross_attn"]["o"], blk["ln2"], blk["mlp_in"],
                blk["mlp_out"], kv_cache["cross_k"][li],
                kv_cache["cross_v"][li], enc_out.shape[1], n_heads=H,
                policy=policy,
                k_scale=None if msc is None else msc[li],
                v_scale=(None if msc is None
                         else kv_cache["cross_v_mscale"][li]))[:, None, :]
            continue

        h = layer_norm(blk["ln_cross"], x, policy=policy)
        q = dense(blk["cross_attn"]["q"], h, policy).reshape(B, 1, H, Dh)
        ck_x = kv_cache["cross_k"][li]                          # [B,H,T,Dh]
        cv_x = kv_cache["cross_v"][li]
        if "cross_k_scale" in kv_cache:
            # int8 streaming mode: the K/V planes are int8 with per-row
            # scales (init_kv_cache quant=True); q and the attention probs
            # quantize per (batch, head) row in-loop (tiny VPU work) so both
            # einsums run int8×int8→int32 on the MXU and HBM streams half
            # the cache bytes. K row scales multiply onto the scores; V row
            # scales fold into the probs BEFORE their quantization.
            sk = kv_cache["cross_k_scale"][li]                  # [B,H,T] f32
            sv = kv_cache["cross_v_scale"][li]
            qf = q.astype(jnp.float32)
            sq = jnp.maximum(
                jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0, 1e-8)
            qq = jnp.clip(jnp.round(qf / sq), -127, 127).astype(jnp.int8)
            si = jnp.einsum("bqhd,bhsd->bhqs", qq, ck_x,
                            preferred_element_type=jnp.int32)
            scores = (si.astype(jnp.float32) * sq.transpose(0, 2, 1, 3)
                      * sk[:, :, None, :]) / np.sqrt(Dh)
            probs = jax.nn.softmax(scores, axis=-1)             # f32 [B,H,1,T]
            pv = probs * sv[:, :, None, :]
            sp = jnp.maximum(
                jnp.max(pv, axis=-1, keepdims=True) / 127.0, 1e-30)
            pq = jnp.clip(jnp.round(pv / sp), 0, 127).astype(jnp.int8)
            ci = jnp.einsum("bhqs,bhsd->bqhd", pq, cv_x,
                            preferred_element_type=jnp.int32)
            ctx = (ci.astype(jnp.float32)
                   * sp.transpose(0, 2, 1, 3)).astype(policy.compute)
        else:
            scores = jnp.einsum("bqhd,bhsd->bhqs", q, ck_x,
                                preferred_element_type=jnp.float32,
                                precision=policy.precision) / np.sqrt(Dh)
            probs = jax.nn.softmax(scores, axis=-1).astype(policy.compute)
            ctx = jnp.einsum("bhqs,bhsd->bqhd", probs, cv_x,
                             preferred_element_type=policy.accum,
                             precision=policy.precision).astype(policy.compute)
        x = x + dense(blk["cross_attn"]["o"], ctx.reshape(B, 1, D), policy)

        h = layer_norm(blk["ln2"], x, policy=policy)
        if pallas_ffn:
            # one Pallas kernel for dense→GELU→dense (ops/pallas_ffn.py):
            # the decode step is per-kernel-overhead-bound, so collapsing
            # the FFN's three dispatches into one pays even at M=B rows.
            # GELU mode: erf in f32 parity mode; tanh on the TPU serving
            # path (Mosaic has no erf lowering; the tanh-vs-erf activation
            # delta ≤4.7e-4 is below bf16 noise — same trade the text
            # towers make, core/config.py gelu_mode)
            from misinfo_tpu.ops.pallas_ffn import ffn_apply
            mode = ("erf" if policy.compute == jnp.dtype(jnp.float32)
                    else "tanh")
            x = x + ffn_apply(blk["mlp_in"], blk["mlp_out"], h,
                              policy=policy, mode=mode)
        else:
            x = x + dense(blk["mlp_out"],
                          gelu_exact(dense(blk["mlp_in"], h, policy)),
                          policy)

    x = layer_norm(params["decoder"]["final_ln"], x, policy=policy)[:, 0]
    if "token_embedding_q" in dec:
        # the [V, D] logits matmul is the single largest per-step stream
        # (~53 MB/step bf16 for base); int8 halves it and rides the
        # double-rate int8 MXU. x quantizes per row (B rows — trivial).
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-8)
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        li = jax.lax.dot_general(xq, dec["token_embedding_q"],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        logits = li.astype(jnp.float32) * sx * dec["emb_scale"][None, :]
    else:
        logits = jnp.dot(x, dec["token_embedding"].T.astype(policy.compute),
                         preferred_element_type=jnp.float32,
                         precision=policy.precision)
    kv_cache = {**kv_cache, "self_k": new_cache["self_k"],
                "self_v": new_cache["self_v"]}
    return logits, kv_cache


def fuse_whisper_decoder_qkv(params: Dict) -> Dict:
    """Fuse each decoder block's SELF-attention q/k/v into one [D, 3D]
    projection for the KV-cached decode step (cross-attention is left
    alone — its k/v project the encoder side and are precomputed).

    Unlike the tower-level QKV fusion rejected for serving (the [B, S, 3D]
    split re-materializes three big copies, docs/PERF.md), the decode step
    has S=1: the split slices a [B, 1, 3D] row — bytes are trivial, and the
    step saves two of its ~8 weight-streaming matmul dispatches per layer.
    Exact math (each output column is an independent dot product). Pure
    pytree rewrite; idempotent; composes with stack_whisper_decoder."""
    def fuse_block(blk: Dict) -> Dict:
        sa = blk["self_attn"]
        if "qkv" in sa:
            return blk
        if "kernel_q" in sa["q"]:
            # concatenating int8 kernels would mix per-channel scale groups;
            # the transform order is fuse THEN quantize (serve/transcript.py)
            raise ValueError(
                "fuse_whisper_decoder_qkv on int8-quantized params — apply "
                "quantize_whisper_decoder AFTER fusing")
        q, k, v = sa["q"], sa["k"], sa["v"]
        qkv = {"kernel": jnp.concatenate(
            [q["kernel"], k["kernel"], v["kernel"]], axis=1)}
        D = q["kernel"].shape[1]
        zeros = jnp.zeros((D,), q["kernel"].dtype)
        qkv["bias"] = jnp.concatenate([q.get("bias", zeros),
                                       k.get("bias", zeros),
                                       v.get("bias", zeros)])
        return {**blk, "self_attn": {"qkv": qkv, "o": sa["o"]}}

    dec = params["decoder"]
    if "blocks" in dec:
        dec = {**dec, "blocks": [fuse_block(b) for b in dec["blocks"]]}
    return {**params, "decoder": dec}


def stack_whisper_decoder(params: Dict) -> Dict:
    """Stack the decoder's per-layer block pytrees along a leading layer
    axis (``blocks`` list → ``blocks_stacked`` with [L, ...] leaves).

    This is the decode-latency transform (VERDICT r2 #3): the per-step
    decoder was measured per-op-latency-bound (~150 small ops/step for the
    6-layer base model, docs/PERF.md), and a `lax.scan` over a stacked
    layer axis emits the loop body ONCE — op count per step drops by ~L×.
    Pure pytree rewrite; `decode_transcript(scan_layers=True)` consumes it
    (and applies it on the fly when given unstacked params). Idempotent."""
    dec = params["decoder"]
    if "blocks_stacked" in dec:
        return params
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                     *dec["blocks"])
    dec = {k: v for k, v in dec.items() if k != "blocks"}
    dec["blocks_stacked"] = stacked
    return {**params, "decoder": dec}


def _scan_decoder_step(params: Dict, token: jax.Array, pos: jax.Array,
                       enc_out: jax.Array, kv_cache: Dict,
                       cfg: WhisperConfig, policy: Policy):
    """`_cached_decoder_step` over a STACKED layer axis: identical math,
    one `lax.scan` over [L, ...] block params and [L, B, H, S, Dh] caches
    instead of a Python loop that unrolls ~25 ops per layer into the
    while-loop body. Cache leaves are stacked (see init_kv_cache)."""
    dec = params["decoder"]
    B = token.shape[0]
    D, H = cfg.d_model, cfg.num_heads
    Dh = D // H

    x = (jnp.take(dec["token_embedding"], token, axis=0)
         + dec["positions"][pos]).astype(policy.compute)      # [B, D]
    x = x[:, None, :]                                          # [B, 1, D]

    S_max = kv_cache["self_k"].shape[3]
    pos_mask = (jnp.arange(S_max)[None, :] <= pos).astype(jnp.float32)

    def layer(x, inp):
        blk, ck_old, cv_old, ck_x, cv_x = inp
        h = layer_norm(blk["ln1"], x, policy=policy)
        if "qkv" in blk["self_attn"]:
            qkv = dense(blk["self_attn"]["qkv"], h, policy)     # [B,1,3D]
            q = qkv[..., :D].reshape(B, 1, H, Dh)
            k_new = qkv[..., D:2 * D].reshape(B, H, Dh)
            v_new = qkv[..., 2 * D:].reshape(B, H, Dh)
        else:
            q = dense(blk["self_attn"]["q"], h, policy).reshape(B, 1, H, Dh)
            k_new = dense(blk["self_attn"]["k"], h, policy).reshape(B, H, Dh)
            v_new = dense(blk["self_attn"]["v"], h, policy).reshape(B, H, Dh)
        ck = jax.lax.dynamic_update_index_in_dim(ck_old, k_new, pos, axis=2)
        cv = jax.lax.dynamic_update_index_in_dim(cv_old, v_new, pos, axis=2)
        scores = jnp.einsum("bqhd,bhsd->bhqs", q, ck,
                            preferred_element_type=jnp.float32,
                            precision=policy.precision) / np.sqrt(Dh)
        scores = scores + (1.0 - pos_mask)[None, None, :, :] * -1e9
        probs = jax.nn.softmax(scores, axis=-1).astype(policy.compute)
        ctx = jnp.einsum("bhqs,bhsd->bqhd", probs, cv,
                         preferred_element_type=policy.accum,
                         precision=policy.precision).astype(policy.compute)
        x = x + dense(blk["self_attn"]["o"], ctx.reshape(B, 1, D), policy)

        h = layer_norm(blk["ln_cross"], x, policy=policy)
        q = dense(blk["cross_attn"]["q"], h, policy).reshape(B, 1, H, Dh)
        scores = jnp.einsum("bqhd,bhsd->bhqs", q, ck_x,
                            preferred_element_type=jnp.float32,
                            precision=policy.precision) / np.sqrt(Dh)
        probs = jax.nn.softmax(scores, axis=-1).astype(policy.compute)
        ctx = jnp.einsum("bhqs,bhsd->bqhd", probs, cv_x,
                         preferred_element_type=policy.accum,
                         precision=policy.precision).astype(policy.compute)
        x = x + dense(blk["cross_attn"]["o"], ctx.reshape(B, 1, D), policy)

        h = layer_norm(blk["ln2"], x, policy=policy)
        x = x + dense(blk["mlp_out"],
                      gelu_exact(dense(blk["mlp_in"], h, policy)), policy)
        return x, (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(
        layer, x, (dec["blocks_stacked"], kv_cache["self_k"],
                   kv_cache["self_v"], kv_cache["cross_k"],
                   kv_cache["cross_v"]))
    x = layer_norm(dec["final_ln"], x, policy=policy)[:, 0]
    logits = jnp.dot(x, dec["token_embedding"].T.astype(policy.compute),
                     preferred_element_type=jnp.float32,
                     precision=policy.precision)
    return logits, {**kv_cache, "self_k": new_k, "self_v": new_v}


def init_kv_cache(params: Dict, enc_out: jax.Array, max_len: int,
                  cfg: WhisperConfig, policy: Policy,
                  merged_self: bool = False, quant: bool = False,
                  merged_cross: bool = False,
                  cross_int8: bool = False) -> Dict:
    """Allocate self-attention cache buffers and precompute cross K/V —
    everything in the head-major [B, H, S, Dh] layout the decode-step
    einsums contract without transposing (the cross K/V transpose happens
    ONCE here, outside the decode loop). Stacked-decoder params (see
    stack_whisper_decoder) get stacked [L, B, H, S, Dh] cache leaves for
    the scanned step.

    ``quant=True`` stores the cross K/V int8 with per-(batch, head,
    position) row scales (``cross_k_scale`` [B, H, T] f32 etc.) — the int8
    streaming-decode mode (WhisperDecodeConfig.quant): the cross caches
    are the largest per-step HBM stream after the params (~74 MB/step bf16
    for base at T=1500), and the step's einsums consume the int8 planes
    directly on the MXU's double-rate int8 path.

    ``merged_cross=True`` keeps the cross K/V heads merged in the lane
    dimension ([B, T, D], no head transpose) — the layout the fused
    cross-attention+FFN Pallas step consumes (ops/pallas_cross_ffn.py;
    lane-splitting reshapes don't lower in Mosaic).

    ``cross_int8=True`` (merged_cross only) stores the merged planes int8
    with per-(batch, position) row scales over the merged D lanes,
    transposed to [Tp, B] for the kernel's static [tile, 1] slices
    (``cross_k_mscale``/``cross_v_mscale``). At the round-5 fused-decode
    floor the cross planes are the step's LARGEST HBM stream (~75 MB/step
    bf16 for base — bigger than the now-int8 weights), and the streamed
    passes are DMA-bound, so halving the bytes halves the kernel's
    dominant term (docs/PERF.md round 5)."""
    dec = params["decoder"]
    B, T = enc_out.shape[0], enc_out.shape[1]
    H, Dh = cfg.num_heads, cfg.d_model // cfg.num_heads

    def cross_kv(blk, which):
        y = dense(blk["cross_attn"][which], enc_out, policy)
        if merged_cross:
            # [B, Tp, D]: tile-padded for the kernel's static-unroll DMA
            # loop; the kernel masks positions ≥ T before the softmax
            from misinfo_tpu.ops.pallas_cross_ffn import cross_cache_pad
            Tp = cross_cache_pad(T)
            return (jnp.pad(y, ((0, 0), (0, Tp - T), (0, 0)))
                    if Tp != T else y)
        return y.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)    # [B,H,T,Dh]

    def row_quant(y):
        yf = y.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(yf), axis=-1) / 127.0, 1e-8)
        q = jnp.clip(jnp.round(yf / s[..., None]), -127, 127).astype(jnp.int8)
        return q, s                                            # int8, [B,H,T]

    if quant and (merged_self or merged_cross or "blocks_stacked" in dec):
        raise ValueError("quant=True supports only the unstacked, "
                         "unmerged cache layout (no scan_layers / "
                         "pallas_self_attn / pallas_cross)")
    if cross_int8 and not merged_cross:
        raise ValueError("cross_int8 requires the merged_cross layout "
                         "(it is the fused kernel's cache quantization)")
    if "blocks_stacked" in dec:
        stacked = dec["blocks_stacked"]
        L = stacked["ln1"]["scale"].shape[0]
        return {
            "self_k": jnp.zeros((L, B, H, max_len, Dh), policy.compute),
            "self_v": jnp.zeros((L, B, H, max_len, Dh), policy.compute),
            "cross_k": jax.vmap(lambda blk: cross_kv(blk, "k"))(stacked),
            "cross_v": jax.vmap(lambda blk: cross_kv(blk, "v"))(stacked),
        }
    # merged_self: the fused Pallas step keeps heads merged in lanes
    # ([B, S, D]) — lane-splitting casts don't lower (ops/pallas_decode.py)
    self_shape = ((B, max_len, cfg.d_model) if merged_self
                  else (B, H, max_len, Dh))
    cache = {"self_k": [], "self_v": [], "cross_k": [], "cross_v": []}
    if quant:
        cache["cross_k_scale"] = []
        cache["cross_v_scale"] = []
    if cross_int8:
        cache["cross_k_mscale"] = []
        cache["cross_v_mscale"] = []

    def merged_row_quant(y):
        # per-(b, t) scale over the merged D lanes; scales transposed to
        # [Tp, B] so the kernel slices [tile, 1] columns statically
        yf = y.astype(jnp.float32)
        sc = jnp.maximum(jnp.max(jnp.abs(yf), axis=-1) / 127.0, 1e-8)
        q = jnp.clip(jnp.round(yf / sc[..., None]), -127,
                     127).astype(jnp.int8)
        return q, sc.T.astype(jnp.float32)          # int8 [B,Tp,D], [Tp,B]

    for blk in dec["blocks"]:
        cache["self_k"].append(jnp.zeros(self_shape, policy.compute))
        cache["self_v"].append(jnp.zeros(self_shape, policy.compute))
        if cross_int8:
            kq, ks = merged_row_quant(cross_kv(blk, "k"))
            vq, vs = merged_row_quant(cross_kv(blk, "v"))
            cache["cross_k"].append(kq)
            cache["cross_k_mscale"].append(ks)
            cache["cross_v"].append(vq)
            cache["cross_v_mscale"].append(vs)
            continue
        if quant:
            kq, ks = row_quant(cross_kv(blk, "k"))
            vq, vs = row_quant(cross_kv(blk, "v"))
            cache["cross_k"].append(kq)
            cache["cross_k_scale"].append(ks)
            cache["cross_v"].append(vq)
            cache["cross_v_scale"].append(vs)
        else:
            cache["cross_k"].append(cross_kv(blk, "k"))
            cache["cross_v"].append(cross_kv(blk, "v"))
    return cache


def decode_transcript(params: Dict, mel: Optional[jax.Array],
                      cfg: WhisperConfig = WhisperConfig(),
                      policy: Policy = DEFAULT_POLICY,
                      max_len: Optional[int] = None,
                      prompt_tokens: Optional[jax.Array] = None,
                      temperature=0.0,
                      rng: Optional[jax.Array] = None,
                      enc_out: Optional[jax.Array] = None,
                      nospeech_id: Optional[int] = None,
                      scan_layers: bool = False,
                      pallas_ffn: bool = False,
                      pallas_self_attn: bool = False,
                      pallas_cross: bool = False,
                      pallas_layer: bool = False,
                      quant: bool = False,
                      cross_int8: bool = False,
                      unroll: int = 1):
    """KV-cached transcript decoding, O(L) per step, early-exiting the
    decode loop once every batch row has emitted EOS (post-EOS stays EOS,
    so outputs are identical to running all ``max_len`` steps).

    ``temperature == 0`` is greedy argmax; > 0 samples categorically
    (gumbel-max over logits/T) — the retry rungs of the reference's
    `whisper.transcribe` fallback ladder (serve/transcript.py applies the
    compression-ratio / avg-logprob acceptance checks host-side, matching
    openai-whisper's defaults). A non-zero temperature may also be a traced
    scalar, so all retry rungs share ONE compiled program. Pass ``enc_out``
    to reuse an already-computed encoding across rungs (the encoder runs
    once per utterance, not once per temperature). Returns
    ``(tokens [B, max_len], avg_logprob [B])`` where avg_logprob averages
    the model's log-prob of each emitted token (EOS included, like
    whisper). With ``nospeech_id`` set, additionally returns
    ``p(<|nospeech|>)`` [B] captured from the decoder's position-0 step
    (the SOT logits openai-whisper's silence gate reads) — fused into the
    decode so the gate costs no extra device dispatch or compiled
    program.

    ``quant=True`` stores the cross-attention K/V caches int8
    (init_kv_cache) — one half of the int8 STREAMING decode
    (WhisperDecodeConfig.quant; the other half, int8 decoder params +
    token embedding, is ops/serving.quantize_whisper_decoder and is
    detected from the params). Composes only with the default unrolled
    step.

    ``unroll`` > 1 runs that many sequential decode steps per while-loop
    iteration (bit-identical outputs; the early-exit granularity
    coarsens, so a finished batch may pay up to ``unroll - 1`` masked
    extra steps). A fixed-cost amortization experiment — the weight
    streams repeat per step regardless (the layer stack must finish
    token t before token t+1 starts), so only loop/bookkeeping overhead
    is saved. Composes with every step variant."""
    if not 1 <= unroll <= 4:
        raise ValueError(f"unroll must be in [1, 4], got {unroll}")
    max_len = max_len or cfg.max_target_positions
    dec_p = params["decoder"]
    emb_q = "token_embedding_q" in dec_p
    # block-kernel quantization (quantize_whisper_decoder) vs the
    # embedding-only transform (quantize_whisper_embedding): only the
    # former pins the step to the plain unrolled form — the int8 embedding
    # lookup + logits matmul live OUTSIDE the Pallas kernels and compose
    blocks_q = bool(dec_p.get("blocks")) and any(
        isinstance(v, dict) and "kernel_q" in v
        for v in dec_p["blocks"][0]["self_attn"].values())
    if (quant or blocks_q) and (scan_layers or "blocks_stacked" in dec_p):
        # the scanned step reads f32/bf16 kernel leaves and stacked caches
        raise ValueError("int8 decode weights do not compose with the "
                         "stacked-layer scan decode — drop scan_layers")
    if pallas_layer:
        # the whole-layer kernel (ops/pallas_layer.py) subsumes both fused
        # halves and exists only for the int8-weight layout (VMEM fits
        # because the weights are int8)
        if not blocks_q:
            raise ValueError("pallas_layer needs int8 decode weights "
                             "(quant='kernels') — the bf16 layer does not "
                             "fit the VMEM budget")
        if pallas_ffn or pallas_self_attn or pallas_cross:
            raise ValueError("pallas_layer subsumes pallas_self_attn / "
                             "pallas_cross / pallas_ffn — drop them")
        if quant:
            raise ValueError("pallas_layer reads bf16 merged caches — it "
                             "does not compose with quant=True cache "
                             "streaming")
    if quant and (pallas_ffn or pallas_self_attn or pallas_cross):
        # int8 CACHE streaming (quant=True) uses its own int8 cache
        # layouts; the fused kernels read bf16 merged-lane caches. int8
        # WEIGHTS (blocks_q) DO compose with pallas_self_attn/pallas_cross
        # — the kernels carry int8-weight variants (quant="kernels" mode,
        # ops/pallas_decode.py / ops/pallas_cross_ffn.py)
        raise ValueError("int8 streaming decode (quant=True) composes only "
                         "with the default unrolled step — drop pallas_ffn "
                         "/ pallas_self_attn / pallas_cross")
    if blocks_q and pallas_ffn:
        raise ValueError("pallas_ffn reads unquantized FFN kernels — with "
                         "int8 decode weights use pallas_cross (its fused "
                         "step carries the int8 FFN)")
    if cross_int8 and not (pallas_cross and blocks_q):
        raise ValueError("cross_int8 is the fused kernel's cache "
                         "quantization — it requires pallas_cross AND "
                         "int8 decode weights (quant='kernels')")
    if emb_q and (scan_layers or "blocks_stacked" in dec_p):
        raise ValueError("int8 token embedding does not compose with the "
                         "stacked-layer scan decode")
    if pallas_cross and pallas_ffn:
        # the cross+FFN kernel already contains the FFN; pallas_self_attn
        # composes (disjoint stages — together the whole layer is 2 kernels)
        raise ValueError("pallas_cross subsumes the FFN — drop pallas_ffn")
    if enc_out is None:
        enc_out = whisper_encode(params, mel, cfg, policy)
    if scan_layers or "blocks_stacked" in params["decoder"]:
        if pallas_ffn or pallas_self_attn or pallas_cross:
            # refuse silently-ignored combinations: a benchmark or caller
            # would otherwise attribute its numbers to kernels that never
            # ran (the scanned step has no Pallas variants)
            raise ValueError(
                "scan_layers decoding does not implement pallas_ffn / "
                "pallas_self_attn / pallas_cross — drop one of the flags")
        # stacked-layer scan: one loop-body emission instead of L unrolled
        # layers per decode step (VERDICT r2 #3; measured in docs/PERF.md).
        # Stacking inside the traced call is a handful of concats hoisted
        # outside the decode loop; pre-stacked params skip even that.
        params = stack_whisper_decoder(params)
        step_fn = _scan_decoder_step
    else:
        import functools as _ft
        if pallas_self_attn:
            params = fuse_whisper_decoder_qkv(params)  # kernel's layout
        step_fn = (_ft.partial(_cached_decoder_step, pallas_ffn=pallas_ffn,
                               pallas_self_attn=pallas_self_attn,
                               pallas_cross=pallas_cross,
                               pallas_layer=pallas_layer)
                   if (pallas_ffn or pallas_self_attn or pallas_cross
                       or pallas_layer)
                   else _cached_decoder_step)
    B = enc_out.shape[0]
    sampled = not (isinstance(temperature, (int, float)) and temperature == 0)
    tokens = jnp.full((B, max_len), cfg.eos_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(cfg.decoder_start_token_id)
    start = 1
    if prompt_tokens is not None:
        P = prompt_tokens.shape[1]
        tokens = tokens.at[:, 1:1 + P].set(prompt_tokens)
        start = 1 + P
    cache0 = init_kv_cache(
        params, enc_out, max_len, cfg, policy,
        merged_self=(pallas_self_attn or pallas_layer) and not scan_layers,
        quant=quant,
        merged_cross=(pallas_cross or pallas_layer) and not scan_layers,
        cross_int8=cross_int8)
    # cross K/V are per-utterance constants: close over them instead of
    # threading them through the loop carry, so the loop state is only
    # the (small) self caches + tokens
    cross = {k: cache0.pop(k) for k in list(cache0)
             if k.startswith("cross_")}
    done0 = jnp.zeros((B,), jnp.bool_)
    if sampled and rng is None:
        rng = jax.random.PRNGKey(0)

    def _make_step(guard_range: bool):
        def step(carry):
            i, tokens, cache, done, sum_lp, cnt, ns = carry
            # feed token i-1, predict token i; cache pos i-1 gets written
            logits, cache = step_fn(
                params, tokens[:, i - 1], i - 1, enc_out, {**cache, **cross},
                cfg, policy)
            cache = {"self_k": cache["self_k"], "self_v": cache["self_v"]}
            logits = logits.astype(jnp.float32)
            if sampled:
                g = jax.random.gumbel(jax.random.fold_in(rng, i),
                                      logits.shape)
                nxt = jnp.argmax(logits / temperature + g, axis=-1)
            else:
                nxt = jnp.argmax(logits, axis=-1)
            nxt = nxt.astype(jnp.int32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            if nospeech_id is not None and start == 1:
                # promptless decode: the first body step IS the position-0
                # (SOT) step — capture the silence gate's probability from
                # the log_softmax already computed (no extra softmax)
                ns = jnp.where(i == 1, jnp.exp(logp[:, nospeech_id]), ns)
            tok_lp = jnp.take_along_axis(logp, nxt[:, None], axis=1)[:, 0]
            active = jnp.logical_not(done)
            if guard_range:
                # unrolled trailing steps can run with i == max_len: the
                # token write is dropped (scatter OOB), so freeze scoring
                # too — outputs stay bit-identical to the 1-step loop
                active = jnp.logical_and(active, i < max_len)
            sum_lp = sum_lp + jnp.where(active, tok_lp, 0.0)
            cnt = cnt + active.astype(jnp.float32)
            nxt = jnp.where(jnp.logical_not(active), cfg.eos_token_id, nxt)
            done = jnp.logical_or(done, nxt == cfg.eos_token_id)
            return (i + 1, tokens.at[:, i].set(nxt, mode="drop"), cache,
                    done, sum_lp, cnt, ns)
        return step

    if unroll > 1:
        # amortize the while-loop's per-iteration fixed costs over
        # `unroll` sequential decode steps. The first step of each
        # iteration is in-range by the loop condition; trailing steps
        # carry the range guard. Bit-identical outputs (tested).
        _first = _make_step(False)
        _rest = _make_step(True)

        def body(carry):
            carry = _first(carry)
            for _ in range(unroll - 1):
                carry = _rest(carry)
            return carry
    else:
        body = _make_step(False)

    def not_done(carry):
        i, _, _, done, _, _, _ = carry
        # early exit once every sequence emitted EOS: positions past the
        # exit are already EOS-filled and sum_lp/cnt freeze (active==0), so
        # results are bit-identical to running all max_len steps — but a
        # 10-token utterance no longer pays for 448 decoder passes
        return jnp.logical_and(i < max_len, jnp.logical_not(jnp.all(done)))

    # prompt positions must populate the cache before free-running decode
    def prefill(i, carry):
        tokens, cache, done, sum_lp, cnt, ns = carry
        logits, cache = step_fn(
            params, tokens[:, i], i, enc_out, {**cache, **cross},
            cfg, policy)
        cache = {"self_k": cache["self_k"], "self_v": cache["self_v"]}
        if nospeech_id is not None and start > 1:
            # prompted decode: position 0 (SOT fed) is prefill step i == 0
            ns = jnp.where(i == 0,
                           jax.nn.softmax(logits.astype(jnp.float32),
                                          axis=-1)[:, nospeech_id],
                           ns)
        return tokens, cache, done, sum_lp, cnt, ns

    zeros = jnp.zeros((B,), jnp.float32)
    carry = (tokens, cache0, done0, zeros, zeros, zeros)
    carry = jax.lax.fori_loop(0, start - 1, prefill, carry)
    tokens, cache0, done0, sum_lp, cnt, ns0 = carry
    _, tokens, _, _, sum_lp, cnt, ns = jax.lax.while_loop(
        not_done, body,
        (jnp.int32(start), tokens, cache0, done0, sum_lp, cnt, ns0))
    avg_lp = sum_lp / jnp.maximum(cnt, 1.0)
    if nospeech_id is not None:
        return tokens, avg_lp, ns
    return tokens, avg_lp


def no_speech_prob(params: Dict, enc_out: jax.Array, sot_id: int,
                   nospeech_id: int,
                   cfg: WhisperConfig = WhisperConfig(),
                   policy: Policy = DEFAULT_POLICY) -> jax.Array:
    """P(<|nospeech|>) from the logits at the SOT position — openai-whisper's
    silence gate (whisper/decoding.py no_speech_threshold, inherited by the
    reference's transcribe call at forensics_dashboard.py:80-83). One cached
    decoder step on the precomputed encoding; runs once per utterance,
    before the temperature ladder. Returns [B] f32."""
    B = enc_out.shape[0]
    cache = init_kv_cache(params, enc_out, 1, cfg, policy)
    token = jnp.full((B,), sot_id, jnp.int32)
    logits, _ = _cached_decoder_step(params, token, jnp.int32(0), enc_out,
                                     cache, cfg, policy)
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[:, nospeech_id]


def detect_language(params: Dict, enc_out: jax.Array, sot_id: int,
                    language_token_ids: jax.Array,
                    cfg: WhisperConfig = WhisperConfig(),
                    policy: Policy = DEFAULT_POLICY):
    """Spoken-language identification from the SOT-position logits —
    openai-whisper's ``model.detect_language`` (whisper/decoding.py
    detect_language), which the reference's ``transcribe(audio, fp16=False)``
    call (forensics_dashboard.py:80-83) runs implicitly whenever
    ``language`` is unset on a multilingual model: one decoder step on
    ``<|startoftranscript|>``, logits restricted to the language-token
    block, softmax over that block only.

    ``language_token_ids`` is the [L] int32 id array in canonical language
    order (preprocess/whisper_tokenizer.WHISPER_LANGUAGES; v3 layouts append
    Cantonese). Returns ``(argmax [B] int32 indices into that array,
    probs [B, L] f32)``. One cached decoder step on a precomputed encoding —
    same cost shape as :func:`no_speech_prob`."""
    B = enc_out.shape[0]
    cache = init_kv_cache(params, enc_out, 1, cfg, policy)
    token = jnp.full((B,), sot_id, jnp.int32)
    logits, _ = _cached_decoder_step(params, token, jnp.int32(0), enc_out,
                                     cache, cfg, policy)
    lang = jnp.take(logits.astype(jnp.float32),
                    jnp.asarray(language_token_ids, jnp.int32), axis=-1)
    return (jnp.argmax(lang, axis=-1).astype(jnp.int32),
            jax.nn.softmax(lang, axis=-1))


def greedy_decode(params: Dict, mel: jax.Array,
                  cfg: WhisperConfig = WhisperConfig(),
                  policy: Policy = DEFAULT_POLICY,
                  max_len: Optional[int] = None,
                  prompt_tokens: Optional[jax.Array] = None) -> jax.Array:
    """Greedy transcript decoding (temperature-0 rung of decode_transcript)."""
    tokens, _ = decode_transcript(params, mel, cfg, policy, max_len=max_len,
                                  prompt_tokens=prompt_tokens)
    return tokens
