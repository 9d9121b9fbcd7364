"""Shared compute primitives with an explicit TPU dtype policy.

Matmuls take bf16 inputs with f32 accumulation (`preferred_element_type`),
which is the MXU's native mode; normalizations and softmaxes run in f32.
Models are pure functions over plain nested-dict param pytrees — the flat,
named layout keeps the torch `.pth` converter (checkpoints/torch_convert.py)
a transparent key-mapping exercise.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from misinfo_tpu.core.config import PrecisionConfig


class Policy:
    """Resolved dtype policy used across the compute path.

    When compute dtype is float32 (parity/validation mode), matmuls and
    convs request `Precision.HIGHEST` — XLA otherwise lowers f32 contractions
    to fast bf16-pass math on both CPU and TPU, which breaks the ≤1e-3
    score-divergence target. bf16 serving mode uses default precision (the
    MXU's native bf16×bf16→f32)."""

    def __init__(self, cfg: Optional[PrecisionConfig] = None):
        cfg = cfg or PrecisionConfig()
        self.compute = jnp.dtype(cfg.compute_dtype)
        self.param = jnp.dtype(cfg.param_dtype)
        self.accum = jnp.dtype(cfg.accum_dtype)
        self.softmax = jnp.dtype(cfg.softmax_dtype)
        if cfg.score_dtype == "auto":
            self.score = (jnp.dtype(jnp.bfloat16)
                          if self.compute == jnp.dtype(jnp.bfloat16)
                          else jnp.dtype(jnp.float32))
        else:
            self.score = jnp.dtype(cfg.score_dtype)
        gm = getattr(cfg, "gelu_mode", "auto")
        if gm == "auto":
            gm = ("tanh" if self.compute == jnp.dtype(jnp.bfloat16)
                  else "erf")
        self.gelu_mode = gm
        self.precision = (jax.lax.Precision.HIGHEST
                          if self.compute == jnp.dtype(jnp.float32)
                          else jax.lax.Precision.DEFAULT)
        # int8-Pallas routing for quantized denses (ops/pallas_int8.py);
        # a plain string resolved lazily at dispatch (no device query here
        # — Policy is constructed at import time for DEFAULT_POLICY).
        self.quant_pallas = getattr(cfg, "quant_pallas", "auto")

    def cast(self, x):
        return x.astype(self.compute)


DEFAULT_POLICY = Policy()
F32_POLICY = Policy(PrecisionConfig.highest())


def dense_init(key, in_dim: int, out_dim: int, bias: bool = True,
               scale: Optional[float] = None) -> Dict:
    """Lecun-normal style init matching torch Linear's kaiming-uniform scale
    closely enough for fresh training; converted checkpoints overwrite it."""
    k1, _ = jax.random.split(key)
    bound = scale if scale is not None else 1.0 / np.sqrt(in_dim)
    p = {"kernel": jax.random.uniform(k1, (in_dim, out_dim), jnp.float32,
                                      -bound, bound)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def dense(params: Dict, x: jax.Array, policy: Policy = DEFAULT_POLICY) -> jax.Array:
    """y = x @ W + b with bf16 inputs, f32 accumulation.

    Params quantized by ops.quant.quantize_params (int8 serving mode)
    carry `kernel_q` instead of `kernel` and ride the MXU's double-rate
    int8 path."""
    if "kernel_q" in params:
        from misinfo_tpu.ops.pallas_int8 import dense_int8_dispatch
        return dense_int8_dispatch(params, x, policy)
    w = params["kernel"].astype(policy.compute)
    y = jnp.dot(x.astype(policy.compute), w,
                preferred_element_type=policy.accum,
                precision=policy.precision)
    if "bias" in params:
        y = y + params["bias"].astype(policy.accum)
    return y.astype(policy.compute)


def layer_norm_init(dim: int) -> Dict:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(params: Dict, x: jax.Array, eps: float = 1e-5,
               policy: Policy = DEFAULT_POLICY) -> jax.Array:
    """LayerNorm with f32 statistics.

    Serving (bf16) mode uses the single-pass E[x²]−E[x]² variance so both
    reductions read the input once (LN reductions are 17% of the profiled
    RoBERTa runtime, docs/PERF.md); parity (f32) mode keeps the two-pass
    subtract-then-square form that matches torch bit-for-bit closely."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    if policy.compute == jnp.bfloat16:
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
        var = jnp.maximum(var, 0.0)
    else:
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(policy.compute)


def gelu_exact(x: jax.Array) -> jax.Array:
    """erf-based GELU (HF RoBERTa's 'gelu')."""
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def gelu(x: jax.Array, policy: Policy = DEFAULT_POLICY) -> jax.Array:
    """Policy-dispatched GELU: erf (HF-exact, default) or the tanh
    approximation (max abs divergence ~3e-3 on activations — below bf16
    serving noise) for PrecisionConfig(gelu_mode='tanh')."""
    if policy.gelu_mode == "tanh":
        return jax.nn.gelu(x.astype(jnp.float32),
                           approximate=True).astype(x.dtype)
    return gelu_exact(x)


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's quick_gelu: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x.astype(jnp.float32)).astype(x.dtype)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def softmax_f32(x: jax.Array, axis: int = -1) -> jax.Array:
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis)


def dropout(key, x: jax.Array, rate: float, deterministic: bool) -> jax.Array:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    xf = x.astype(jnp.float32)
    n = jnp.linalg.norm(xf, axis=axis, keepdims=True)
    return xf / jnp.maximum(n, eps)
