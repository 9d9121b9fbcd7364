"""Multi-head attention for the RoBERTa / CLIP / Whisper towers.

Default path is plain XLA einsum attention — at these sequence lengths
(≤512 RoBERTa, ≤77 CLIP, SURVEY.md §5 "long-context: N/A") the whole
score matrix fits in VMEM and XLA fuses it well. A Pallas fused-attention
kernel (`misinfo_tpu.ops.pallas_attention`) can be enabled for the hot
serving path via ``use_pallas=True``; it falls back automatically when the
head configuration is unsupported.

Head-dimension sharding: the `q/k/v/o` kernels carry logical axes
(heads on the optional `model` mesh axis) — see parallel/sharding.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from misinfo_tpu.ops.common import DEFAULT_POLICY, Policy, dense, dense_init

_NEG_INF = -1e9  # additive mask value; matches HF min-dtype masking semantics


def attention_init(key, dim: int, num_heads: int, out_dim: Optional[int] = None) -> Dict:
    ks = jax.random.split(key, 4)
    out_dim = out_dim or dim
    return {
        "q": dense_init(ks[0], dim, dim),
        "k": dense_init(ks[1], dim, dim),
        "v": dense_init(ks[2], dim, dim),
        "o": dense_init(ks[3], dim, out_dim),
    }


def multi_head_attention(
    params: Dict,
    x: jax.Array,                       # [B, S, D] queries source
    num_heads: int,
    mask: Optional[jax.Array] = None,   # [B, S_kv] 1=valid, 0=pad
    causal: bool = False,
    kv: Optional[jax.Array] = None,     # [B, S_kv, D] for cross-attention
    policy: Policy = DEFAULT_POLICY,
    use_pallas: bool = False,
    segment_ids: Optional[jax.Array] = None,  # [B, S] int32, 0 = padding
) -> jax.Array:
    """Standard scaled-dot-product MHA, bf16 matmuls + f32 softmax.

    ``segment_ids`` enables sequence packing (block-diagonal attention):
    token i may attend to token j only when they belong to the same nonzero
    segment. Packing multiple ragged requests into one row keeps the MXU
    fed without paying bucket padding (engine text path, preprocess/packing).
    Mutually exclusive with ``mask``/``kv`` — packing is self-attention only.
    """
    B, S, D = x.shape
    kv = x if kv is None else kv
    S_kv = kv.shape[1]
    head_dim = D // num_heads

    if "qkv" in params:
        # serving-fused projection (ops/serving.py): one [D,3D] matmul;
        # exact same math as three separate projections. Only valid for
        # self-attention (k/v would need the other operand otherwise).
        assert kv is x, "fused qkv params require self-attention"
        qkv = dense(params["qkv"], x, policy)
        q, k, v = (t.reshape(B, S, num_heads, head_dim)
                   for t in jnp.split(qkv, 3, axis=-1))
    else:
        q = dense(params["q"], x, policy).reshape(B, S, num_heads, head_dim)
        k = dense(params["k"], kv, policy).reshape(B, S_kv, num_heads, head_dim)
        v = dense(params["v"], kv, policy).reshape(B, S_kv, num_heads, head_dim)

    if use_pallas == "flash" and S >= 128 and S % 128 == 0 and S == S_kv:
        # JAX's tuned TPU flash-attention (online softmax, no [S,S_kv]
        # materialization). TPU-only; callers fall back to the XLA path on
        # other backends (ops tested e2e — see docs/PERF.md).
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds, flash_attention)
        seg = None
        if segment_ids is not None:
            sids = segment_ids.astype(jnp.int32)
            seg = SegmentIds(q=sids, kv=sids)
        elif mask is not None:
            seg = SegmentIds(q=jnp.ones((B, S), jnp.int32),
                             kv=mask.astype(jnp.int32))
        ctx = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), segment_ids=seg, causal=causal,
            sm_scale=1.0 / (head_dim ** 0.5)).transpose(0, 2, 1, 3)
        return dense(params["o"], ctx.reshape(B, S, D), policy)
    if use_pallas and segment_ids is None:
        from misinfo_tpu.ops.pallas_attention import fused_attention
        pm = mask.astype(jnp.float32) if mask is not None else None
        ctx = fused_attention(q, k, v, mask=pm, causal=causal)
        return dense(params["o"], ctx.reshape(B, S, D), policy)

    scale = 1.0 / jnp.sqrt(head_dim).astype(jnp.float32)
    # [B, H, S, S_kv]. The materialized score/prob buffers are the hot HBM
    # traffic at S=512 (docs/PERF.md); `policy.score` makes them bf16 in
    # serving mode (MXU still accumulates f32 internally), f32 in parity
    # mode. Softmax math upcasts to f32 inside the fusion either way.
    sdt = policy.score
    scores = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=sdt,
                        precision=policy.precision) * jnp.asarray(scale, sdt)
    if segment_ids is not None:
        assert mask is None and kv is x, "segment packing is self-attn only"
        same = (segment_ids[:, :, None] == segment_ids[:, None, :])
        allowed = same & (segment_ids[:, None, :] > 0)     # [B, S, S_kv]
        scores = scores + ((~allowed[:, None]).astype(jnp.float32)
                           * _NEG_INF).astype(sdt)
    elif mask is not None:
        scores = scores + ((1.0 - mask[:, None, None, :].astype(jnp.float32))
                           * _NEG_INF).astype(sdt)
    if causal:
        idx = jnp.arange(S)
        cmask = (idx[:, None] >= jnp.arange(S_kv)[None, :]).astype(jnp.float32)
        scores = scores + ((1.0 - cmask)[None, None] * _NEG_INF).astype(sdt)
    # NB: a deferred-normalization variant (bf16 unnormalized exp-scores,
    # divide after PV) was benchmarked at 597 vs 682 verdicts/s — XLA's
    # native softmax+matmul fusion wins; keep the straightforward form.
    probs = jax.nn.softmax(scores.astype(jnp.float32),
                           axis=-1).astype(policy.compute)
    ctx = jnp.einsum("bhst,bthd->bshd", probs, v,
                     preferred_element_type=policy.accum,
                     precision=policy.precision).astype(policy.compute)
    return dense(params["o"], ctx.reshape(B, S, D), policy)
