"""Pallas TPU fused attention kernel.

One kernel per (batch, head) grid cell computes softmax(QKᵀ·scale + mask)·V
entirely in VMEM — scores never round-trip to HBM. At this workload's
sequence lengths (RoBERTa ≤512, CLIP ≤77/50; SURVEY.md §5 "long-context:
N/A") a single S×S tile fits comfortably in VMEM (512·512·4B = 1 MB), so no
online-softmax streaming is needed; the win over XLA's unfused lowering is
the elimination of the [B,H,S,S] HBM materialization between the two
matmuls and the softmax.

Supports padding masks and causal masking (CLIP text tower). bf16 inputs,
f32 score accumulation and softmax — same numerics contract as
ops.attention.multi_head_attention, which this kernel can replace via
`use_pallas=True` (validated by tests/test_pallas_kernels.py; falls back
to the XLA path on non-TPU backends).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float,
                 causal: bool):
    # block shapes: q/k/v [1, 1, S, D] → [S, D]; mask [1, 1, S_kv] → [S_kv]
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # [S, S_kv]
    if mask_ref is not None:
        m = mask_ref[0, 0, :].astype(jnp.float32)          # [S_kv]
        scores = scores + (1.0 - m)[None, :] * _NEG
    if causal:
        S, S_kv = scores.shape
        row = jax.lax.broadcasted_iota(jnp.int32, (S, S_kv), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, S_kv), 1)
        scores = jnp.where(row >= col, scores, _NEG)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        probs, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    mask: Optional[jax.Array] = None,
                    causal: bool = False) -> jax.Array:
    """q [B,S,H,D], k/v [B,S_kv,H,D], mask [B,S_kv] (1=valid) → [B,S,H,D].

    Internally transposed to [B,H,S,D] so each grid cell's block spans the
    full (S, D) trailing dims — Mosaic requires trailing block dims to be
    tile-aligned or equal to the array dims."""
    B, S, H, D = q.shape
    S_kv = k.shape[1]
    scale = 1.0 / (D ** 0.5)

    qt = q.transpose(0, 2, 1, 3)   # [B,H,S,D]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    qspec = pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, S_kv, D), lambda b, h: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [qspec, kvspec, kvspec]
    args = [qt, kt, vt]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, S_kv), lambda b, h: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask.astype(jnp.float32).reshape(B, 1, S_kv))
        kernel = functools.partial(_attn_kernel, scale=scale, causal=causal)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, orf, **kw: _attn_kernel(qr, kr, vr, None, orf, **kw),
            scale=scale, causal=causal)

    out = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=in_specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (S * S_kv * D * 2),
            bytes_accessed=B * H * (S * D + 2 * S_kv * D + S * D) * 2,
            transcendentals=B * H * S * S_kv,
        ),
    )(*args)
    return out.transpose(0, 2, 1, 3)


def fused_layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     eps: float = 1e-5) -> jax.Array:
    """Row-fused LayerNorm: mean/var/normalize/affine in one VMEM pass.
    x [.., S, D] flattened to rows; f32 math, input dtype out."""
    orig_shape = x.shape
    D = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, D)

    def kernel(x_ref, s_ref, b_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        o_ref[...] = (y * s_ref[...] + b_ref[...]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, D), x.dtype),
    )(x2, scale, bias)
    return out.reshape(orig_shape)
