"""Opt-in int8 quantized serving path (weights + dynamic activations).

The v5e MXU runs int8×int8→int32 at twice bf16 peak; the large dense
layers (RoBERTa/CLIP attention projections and FFNs) carry ~85% of the
serving FLOPs (docs/PERF.md), so quantizing just those roughly halves the
matmul-bound fraction of the program. This has no counterpart in the
reference (it serves f32 torch on CPU/GPU, misinfo_forensics.py:127) — it
is a production-serving extension, OFF by default:

    ForensicsConfig(precision=PrecisionConfig(quant="int8"))   # engine
    BENCH_QUANT=int8 python bench.py                           # benchmark

Scheme: symmetric per-output-channel int8 weights (quantized once at load
by `quantize_params`), symmetric per-token dynamic int8 activations
(max-abs over the feature dim, computed in-graph). Accumulation int32,
dequantize + bias in f32. Small layers (classifier heads, fusion MLP) and
everything non-2D (embeddings, convs, LayerNorms) stay in bf16/f32 — they
are latency-irrelevant and precision-critical.

`ops.common.dense` dispatches on the presence of `kernel_q`, so models and
call sites are unchanged; quantization is purely a parameter-pytree
transform.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

# Quantize only kernels with at least this many elements: includes the
# 768×768 projections, 768×3072 FFNs and 512×512/768 CLIP layers; excludes
# the 768×256 dual heads, the 5→64→32→2 fusion judge, and per-layer biases.
MIN_KERNEL_ELEMS = 262_144


def quantize_dense(p: Dict) -> Dict:
    """{kernel[f32 in×out], bias?} → {kernel_q[int8], w_scale[f32 out], bias?}."""
    w = jnp.asarray(p["kernel"], jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0) / 127.0, 1e-8)
    wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    out = {"kernel_q": wq, "w_scale": s}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_params(tree, min_elems: int = MIN_KERNEL_ELEMS):
    """Walk a param pytree, replacing every large dense-param dict
    ({kernel: 2-D, bias?}) with its int8-quantized form. Idempotent."""
    if isinstance(tree, dict):
        k = tree.get("kernel")
        if (k is not None and getattr(k, "ndim", 0) == 2
                and k.size >= min_elems):
            return quantize_dense(tree)
        return {key: quantize_params(v, min_elems) for key, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        t = type(tree)
        return t(quantize_params(v, min_elems) for v in tree)
    return tree


def quantize_ffn_params(tree, min_elems: int = MIN_KERNEL_ELEMS):
    """Quantize ONLY the tower FFN pairs (dicts carrying both `mlp_in` and
    `mlp_out` with large 2-D kernels); attention projections and heads
    stay bf16. This is the measured detector int8 serving mode
    (quant="int8_ffn"): the FFN runs as the fused int8-MXU Pallas kernel
    (ops/pallas_int8.py) whose kernel boundary is free (the bf16 Pallas
    FFN measured parity with XLA, docs/PERF.md), while the attention
    stack keeps XLA's cross-op fusion — the full-int8 mode measured
    SLOWER (838 vs 905 v/s) precisely because per-projection kernel
    boundaries broke those fusions."""
    if isinstance(tree, dict):
        out = {}
        for key, v in tree.items():
            if (key in ("mlp_in", "mlp_out") and isinstance(v, dict)
                    and getattr(v.get("kernel"), "ndim", 0) == 2
                    and v["kernel"].size >= min_elems
                    and "mlp_in" in tree and "mlp_out" in tree):
                out[key] = quantize_dense(v)
            else:
                out[key] = quantize_ffn_params(v, min_elems)
        return out
    if isinstance(tree, (list, tuple)):
        return type(tree)(quantize_ffn_params(v, min_elems) for v in tree)
    return tree


def dense_int8(params: Dict, x: jax.Array, out_dtype) -> jax.Array:
    """y = dequant(quant(x) @ kernel_q) + bias with per-token activation
    scales and per-channel weight scales; int32 accumulation on the MXU."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                     1e-8)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    yi = jax.lax.dot_general(
        xq, params["kernel_q"],
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = yi.astype(jnp.float32) * sx * params["w_scale"]
    if "bias" in params:
        y = y + params["bias"]
    return y.astype(out_dtype)
