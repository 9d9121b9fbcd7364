"""Serving-time parameter-pytree transforms (exact-math, inference-only).

Applied by the engine after checkpoint load (and by bench.py). Both are
pure pytree rewrites — models and call sites are unchanged:

* `fuse_qkv_params` — concatenates each attention layer's q/k/v projection
  kernels into one [D, 3D] matmul. Exact same math (every output column is
  an independent dot product), one MXU dispatch instead of three.
* `cast_big_kernels` — stores large 2-D kernels in the serving compute
  dtype (bf16). `dense` casts to bf16 before the matmul anyway, so this
  only removes the f32 weight read from HBM (~340 MB/batch across the
  towers); master f32 weights remain the checkpoint format.

Training and the f32 parity path keep the unfused f32 pytrees.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

# same size gate as ops.quant: towers yes, heads/fusion no
from misinfo_tpu.ops.quant import MIN_KERNEL_ELEMS


def _is_attn_params(d: Dict) -> bool:
    return (isinstance(d, dict) and all(k in d for k in ("q", "k", "v", "o"))
            and isinstance(d.get("q"), dict) and "kernel" in d["q"])


def fuse_qkv_params(tree):
    """Rewrite every attention param dict {q,k,v,o} → {qkv,o}.

    SELF-ATTENTION ONLY: a fused dict is invalid for cross-attention
    (k/v project the other operand; ops.attention asserts this). Safe on
    the detector pytree (all towers are self-attention); do NOT apply to
    Whisper decoder params, whose cross-attention blocks share the same
    {q,k,v,o} shape."""
    if isinstance(tree, dict):
        if _is_attn_params(tree):
            q, k, v = tree["q"], tree["k"], tree["v"]
            qkv = {"kernel": jnp.concatenate(
                [q["kernel"], k["kernel"], v["kernel"]], axis=1)}
            if "bias" in q:
                qkv["bias"] = jnp.concatenate(
                    [q["bias"], k["bias"], v["bias"]])
            return {"qkv": qkv, "o": tree["o"]}
        return {key: fuse_qkv_params(v) for key, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(fuse_qkv_params(v) for v in tree)
    return tree


def cast_big_kernels(tree, dtype=jnp.bfloat16,
                     min_elems: int = MIN_KERNEL_ELEMS):
    """Cast large 2-D dense kernels to the serving dtype (storage only)."""
    if isinstance(tree, dict):
        out = {}
        for key, v in tree.items():
            if (key == "kernel" and getattr(v, "ndim", 0) == 2
                    and v.size >= min_elems):
                out[key] = v.astype(dtype)
            else:
                out[key] = cast_big_kernels(v, dtype, min_elems)
        return out
    if isinstance(tree, (list, tuple)):
        return type(tree)(cast_big_kernels(v, dtype, min_elems) for v in tree)
    return tree


def unfuse_qkv_params(tree):
    """Inverse of fuse_qkv_params: {qkv,o} → {q,k,v,o}."""
    if isinstance(tree, dict):
        if "qkv" in tree and isinstance(tree["qkv"], dict) and "o" in tree:
            qkv = tree["qkv"]
            ks = jnp.split(qkv["kernel"], 3, axis=1)
            out = {n: {"kernel": k} for n, k in zip(("q", "k", "v"), ks)}
            if "bias" in qkv:
                bs = jnp.split(qkv["bias"], 3)
                for n, b in zip(("q", "k", "v"), bs):
                    out[n]["bias"] = b
            out["o"] = tree["o"]
            return out
        return {key: unfuse_qkv_params(v) for key, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(unfuse_qkv_params(v) for v in tree)
    return tree


def deoptimize_params(tree):
    """Return a pytree in the canonical checkpoint layout (detector_init
    structure, f32 kernels): unfuses QKV, upcasts bf16 kernels, and
    dequantizes int8 kernels (lossy — quantization error is baked in).
    Used before persisting params that passed through serving transforms.
    Dequantization runs BEFORE unfusing (a fused int8 dict carries
    `kernel_q`, which unfuse expects as `kernel`)."""

    def walk(t):
        if isinstance(t, dict):
            if "kernel_q" in t:
                out = {"kernel": (t["kernel_q"].astype(jnp.float32)
                                  * t["w_scale"])}
                if "bias" in t:
                    out["bias"] = t["bias"]
                return out
            return {k: walk(v) for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            return type(t)(walk(v) for v in t)
        if getattr(t, "dtype", None) == jnp.bfloat16:
            return t.astype(jnp.float32)
        return t

    return unfuse_qkv_params(walk(tree))


def optimize_whisper_for_serving(params, policy,
                                 min_elems: int = MIN_KERNEL_ELEMS):
    """Whisper's serving transform: bf16 storage for the big dense kernels
    AND the decoder token embedding.

    This is a MEMORY transform, not a throughput one: it halves the
    param HBM footprint (whisper-base 278→139 MB, large-v3 ~6.2→3.1 GB —
    room that the detector program shares the chip with). Decode
    throughput measured parity (77.1 f32 vs 75.5 bf16 utt/s, inside the
    ±3% relay band, docs/PERF.md): `dense` casts kernels to bf16 inside
    the decode `while_loop` anyway and XLA hoists that loop-invariant
    conversion, so the hot loop reads bf16 weights under either storage.
    Math is unchanged (the embedding-lookup add rounds the embedding row
    to bf16 before the f32 position add — below bf16 activation noise;
    greedy decode equality is asserted by tests/test_transcript_e2e.py).
    Never fuses QKV — Whisper's cross-attention shares the {q,k,v,o}
    shape that `fuse_qkv_params` would corrupt (see its docstring).
    No-op in f32 parity mode."""
    if policy.compute != jnp.dtype(jnp.bfloat16):
        return params
    params = cast_big_kernels(params, jnp.bfloat16, min_elems)
    dec = params.get("decoder", {})
    emb = dec.get("token_embedding")
    if emb is not None and emb.size >= min_elems:
        params = {**params,
                  "decoder": {**dec, "token_embedding": emb.astype(jnp.bfloat16)}}
    return params


def quantize_whisper_decoder(params):
    """int8 streaming-decode transform for Whisper (opt-in,
    `WhisperDecodeConfig.quant="int8"` / `WHISPER_QUANT=int8`).

    The KV-cached decode step is HBM-bandwidth-bound: every step re-reads
    all decoder dense kernels plus the [V, D] token embedding for the
    logits matmul (~96 MB/step bf16 for base — docs/PERF.md decode-floor
    accounting). A bf16 cast cannot shrink that stream further because XLA
    hoists the in-loop dequant conversion out of the while_loop; int8
    operands, by contrast, feed int8×int8→int32 MXU dots directly (double
    bf16 rate — the vault's measured int8 path, docs/PERF.md 4M-row row),
    so storing these tensors int8 genuinely halves the loop's weight
    traffic.

    Quantized (symmetric, ops/quant.py scheme):
      - per-block dense kernels the loop reads every step: self-attention
        q/k/v (or the fused qkv) + o, cross-attention q + o, both FFN
        kernels — per-output-channel scales;
      - the decoder token embedding → ``token_embedding_q`` int8 [V, D]
        with per-row ``emb_scale`` f32 [V] (the logits matmul consumes it
        transposed; the input lookup dequantizes the gathered rows).

    Deliberately NOT quantized: cross-attention k/v kernels (consumed once
    per utterance in init_kv_cache, OUTSIDE the loop — error for zero
    bandwidth payoff), the encoder (runs once per utterance), LayerNorms /
    biases / positions (precision-critical, latency-irrelevant). The
    cross-attention K/V *caches* are quantized separately at
    init_kv_cache(quant=True) — they are activations, not params.

    Apply AFTER fuse_whisper_decoder_qkv (fusing concatenates f32/bf16
    kernels; it raises on already-quantized blocks)."""
    from misinfo_tpu.ops.quant import quantize_dense

    dec = params.get("decoder")
    if dec is None or "token_embedding" not in dec:
        return params  # idempotent (already quantized) / not a decoder tree

    def q8(p: Dict) -> Dict:
        return quantize_dense(p) if "kernel" in p else p

    def quant_block(blk: Dict) -> Dict:
        out = dict(blk)
        out["self_attn"] = {k: q8(v) for k, v in blk["self_attn"].items()}
        out["cross_attn"] = {k: (q8(v) if k in ("q", "o") else v)
                             for k, v in blk["cross_attn"].items()}
        out["mlp_in"] = q8(blk["mlp_in"])
        out["mlp_out"] = q8(blk["mlp_out"])
        return out

    new_dec = dict(dec)
    new_dec["blocks"] = [quant_block(b) for b in dec["blocks"]]
    return quantize_whisper_embedding({**params, "decoder": new_dec})


def quantize_whisper_embedding(params):
    """int8 token embedding ONLY (`WhisperDecodeConfig.quant="embedding"` /
    `WHISPER_QUANT=embedding`): the [V, D] logits matmul is the single
    largest per-step stream of the fused-kernel decode (~53 MB/step bf16
    for base ≈ 30% of the 2-kernel step, docs/PERF.md round 4) and lives
    OUTSIDE the Pallas kernels — so unlike the full int8 streaming mode
    (block kernels + caches, which needs its own layouts), this transform
    COMPOSES with the pallas decode default. Same scheme as the full mode:
    symmetric per-row scales; the input lookup dequantizes the gathered
    rows, the logits matmul rides the double-rate int8 MXU."""
    dec = params.get("decoder")
    if dec is None or "token_embedding" not in dec:
        return params  # idempotent / not a decoder tree
    new_dec = dict(dec)
    emb = jnp.asarray(dec["token_embedding"], jnp.float32)
    se = jnp.maximum(jnp.max(jnp.abs(emb), axis=1) / 127.0, 1e-8)
    new_dec["token_embedding_q"] = jnp.clip(
        jnp.round(emb / se[:, None]), -127, 127).astype(jnp.int8)
    new_dec["emb_scale"] = se
    del new_dec["token_embedding"]
    return {**params, "decoder": new_dec}


def resolve_quant(quant: str, policy, mesh=None) -> str:
    """Resolve PrecisionConfig.quant="auto" (the default): int8_ffn on a
    single-chip real-TPU bf16 serving deployment — the configuration the
    +7.6% headline A/B measured (docs/PERF.md round 5) — and "none"
    everywhere else: f32 parity mode (exactness), CPU backends (no Mosaic
    lowering; the XLA int8 chain is slower than bf16), and meshes (GSPMD
    partitioning of the int8 kernels is unvalidated)."""
    if quant != "auto":
        return quant
    import jax.numpy as _jnp
    if policy.compute != _jnp.dtype(_jnp.bfloat16) or mesh is not None:
        return "none"
    import jax as _jax
    return "int8_ffn" if _jax.devices()[0].platform == "tpu" else "none"


def optimize_for_serving(params, policy, quant: str = "none",
                         fuse: bool = False, cast: bool = True,
                         mesh=None):
    """The engine's standard serving pipeline: optionally fuse QKV, then
    quantize (int8 mode) or cast big kernels to the compute dtype (bf16).

    QKV fusion is OFF by default: measured 628 vs 753 verdicts/s on the
    full bench — the post-matmul split of the [B,S,3D] output materializes
    three layout copies per layer, costing more than the saved dispatches
    (docs/PERF.md)."""
    quant = resolve_quant(quant, policy, mesh)
    if fuse:
        params = fuse_qkv_params(params)
    if quant == "int8":
        from misinfo_tpu.ops.quant import quantize_params
        return quantize_params(params)
    if quant == "int8_ffn":
        # FFN-only int8 (ops/quant.quantize_ffn_params): the FFNs ride the
        # fused int8-MXU Pallas kernel, everything else stays bf16 under
        # XLA's fusion — the measured winner over full int8 (docs/PERF.md
        # round 5)
        from misinfo_tpu.ops.quant import quantize_ffn_params
        params = quantize_ffn_params(params)
        if cast and policy.compute == jnp.dtype(jnp.bfloat16):
            params = cast_big_kernels(params, jnp.bfloat16)
        return params
    if cast and policy.compute == jnp.dtype(jnp.bfloat16):
        params = cast_big_kernels(params, jnp.bfloat16)
    return params
