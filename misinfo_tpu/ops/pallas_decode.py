"""Pallas TPU fused decoder SELF-ATTENTION step for KV-cached decoding.

The Whisper decode loop is per-kernel-overhead-bound at seq-len-1 shapes
(docs/PERF.md round 3: ~90 kernels/step, weight-bearing fusions ~15-20 µs
each). This kernel collapses one decoder layer's entire self-attention
step — pre-LN → fused QKV projection → KV-cache write at `pos` → masked
per-head softmax attention over the cache → output projection → residual
add — into ONE kernel. Everything fits VMEM at decode shapes (Wqkv
1.5 MB + Wo 0.5 MB + two [B, S, D] cache planes ≈ 0.5 MB each at S=128),
so the weights stream HBM→VMEM once per step with no intermediate HBM
round-trips.

Mosaic constraints shape the design: the cache planes keep heads MERGED
in the lane dimension ([B, S, D], not [B, H, S, Dh]) because lane-
splitting shape casts like (B, D)→(B, H, 1, Dh) fail vector-layout
inference; per-head attention is expressed as static lane slices
(h·Dh:(h+1)·Dh) with the head loop unrolled — all ops stay 2-D/3-D with
D or Dh in lanes.

Numerics mirror the XLA path cast-for-cast: LN and softmax in f32,
matmuls with f32 accumulation, intermediates rounded to the compute dtype
exactly where ops/common.dense does. Token-level equality vs the unfused
decode is asserted in interpret mode (tests/test_whisper_parity.py).

Verdict (docs/PERF.md round 3): **measured neutral-to-slightly-worse on
TPU** — 79.4 utt/s vs 80.7 for the unfused path at b4/128 steps. The
~7 saved dispatches per layer are repaid by the kernel's own cost: the
per-head attention must run as unrolled VPU mul-reduce loops (Mosaic
accepts neither batched dot_general at these ranks nor lane-splitting
reshapes), and the masked cache write touches the full plane. Kept as an
opt-in documented experiment (``decode_transcript(pallas_self_attn=True)``)
with interpret-mode token-equality coverage; the remaining decode head-
room is the cross-attention + FFN fusion with VMEM-resident weights,
bounded ~1.6× by the HBM weight-streaming floor.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from misinfo_tpu.ops.common import DEFAULT_POLICY, Policy


def _self_attn_step_kernel(pos_ref, x_ref, lns_ref, lnb_ref, wqkv_ref,
                           bqkv_ref, bqc_ref, wo_ref, bo_ref, ck_in_ref,
                           cv_in_ref, o_ref, ck_ref, cv_ref, *, n_heads: int,
                           precision, ln_single_pass: bool):
    B, D = x_ref.shape
    H = n_heads
    Dh = D // H
    S = ck_in_ref.shape[1]
    pos = pos_ref[0]

    x = x_ref[...]
    compute_dtype = x.dtype

    # pre-LN in f32, formula matched to ops/common.layer_norm per mode
    # (single-pass variance in bf16 serving, two-pass in f32 parity)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    if ln_single_pass:
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            - jnp.square(mu), 0.0)
    else:
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    h = (h * lns_ref[...] + lnb_ref[...]).astype(compute_dtype)

    # fused K/V projection, f32 accumulation (q is derived separately in
    # [D, B] layout below — the MXU attention form needs it transposed,
    # and re-deriving beats a Mosaic transpose)
    kv = jax.lax.dot_general(
        h, wqkv_ref[:, D:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    kv = (kv + bqkv_ref[..., D:].astype(jnp.float32)).astype(compute_dtype)
    k_new = kv[:, :D]
    v_new = kv[:, D:]

    # cache write at `pos` as a masked full-plane select: Mosaic cannot
    # prove alignment for a dynamic single-row sublane store, and the
    # [B, S, D] select is ~256K lanes of VPU work inside VMEM. (An
    # aligned-8-row-window variant relying on aliasing for the unwritten
    # rows measured the same on TPU — 79.7 vs 79.4 utt/s — and broke
    # interpret-mode semantics, so the simple full-plane form stays.)
    row_is_pos = (jax.lax.broadcasted_iota(jnp.int32, (B, S, D), 1) == pos)
    ck_ref[...] = jnp.where(row_is_pos, k_new[:, None, :], ck_in_ref[...])
    cv_ref[...] = jnp.where(row_is_pos, v_new[:, None, :], cv_in_ref[...])

    # masked per-head attention on the MXU via block-masked matmuls (the
    # round-4 rework that made the cross-attention kernel win,
    # ops/pallas_cross_ffn.py — the original per-head VPU mul-reduce form
    # measured 79.4 vs 80.7 utt/s): for each batch row b,
    # K_b · (q_bᵀ ⊙ blockmask) computes EXACTLY the per-head scores
    # because the mask zeroes every q lane outside head h's Dh block, and
    # probs_bᵀ · V_b followed by a masked head-reduce recovers the
    # merged-lane context — no lane-splitting reshapes, no batched
    # dot_general, no transposes (q is re-derived in [D, B] layout by
    # contracting Wqkv's input axis against h's feature axis).
    qT = jax.lax.dot_general(
        wqkv_ref[:, :D], h, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    qT = (qT + bqc_ref[...]).astype(compute_dtype)          # [D, B]
    dmask = (jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // Dh
             == jax.lax.broadcasted_iota(jnp.int32, (D, H), 1))
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // Dh
             == jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
             ).astype(jnp.float32)
    smask_col = (jax.lax.broadcasted_iota(jnp.int32, (S, H), 0)
                 > pos)                                     # [S, H]
    ctx_rows = []
    for b in range(B):
        qmask_b = (jax.lax.slice_in_dim(qT, b, b + 1, axis=1)
                   * dmask.astype(compute_dtype)).astype(compute_dtype)
        k_b = ck_ref[b].astype(compute_dtype)               # [S, D]
        v_b = cv_ref[b].astype(compute_dtype)
        scores = jax.lax.dot_general(
            k_b, qmask_b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) / np.sqrt(Dh)              # [S, H]
        scores = jnp.where(smask_col, -1e9, scores)
        scores = scores - jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores)
        probs = (e / jnp.sum(e, axis=0, keepdims=True)).astype(
            compute_dtype)
        hd = jax.lax.dot_general(
            probs, v_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                            # [H, D]
        ctx_rows.append(jnp.sum(hd * hmask, axis=0, keepdims=True))
    ctx = jnp.concatenate(ctx_rows, axis=0).astype(compute_dtype)

    out = jax.lax.dot_general(
        ctx, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    out = (out + bo_ref[...].astype(jnp.float32)).astype(compute_dtype)
    o_ref[...] = x + out


def _self_attn_step_kernel_i8(pos_ref, x_ref, lns_ref, lnb_ref, wqkv_ref,
                              sqkv_ref, bqkv_ref, sq_col_ref, bqc_ref,
                              wo_ref, so_ref, bo_ref, ck_in_ref, cv_in_ref,
                              o_ref, ck_ref, cv_ref, *, n_heads: int,
                              precision, ln_single_pass: bool):
    """int8-weight variant (WhisperDecodeConfig.quant="kernels"): Wqkv/Wo
    are int8 with per-output-channel scales — the decode step is
    bandwidth-bound on weights (docs/PERF.md decode-floor accounting), so
    halving the stream is the payoff; the [B, D] activation quantize is
    trivial VPU work and the dots ride the int8 MXU. Math mirrors
    ops/quant.dense_int8 (f32 abs-max rows, round, clip, f32 rescale)."""
    from misinfo_tpu.ops.pallas_int8 import _quantize_rows

    B, D = x_ref.shape
    H = n_heads
    Dh = D // H
    S = ck_in_ref.shape[1]
    pos = pos_ref[0]

    x = x_ref[...]
    compute_dtype = x.dtype

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    if ln_single_pass:
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            - jnp.square(mu), 0.0)
    else:
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    h = (h * lns_ref[...] + lnb_ref[...]).astype(compute_dtype)

    hq, sh = _quantize_rows(h.astype(jnp.float32))          # [B,D] i8, [B,1]

    kv_i32 = jax.lax.dot_general(
        hq, wqkv_ref[:, D:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    kv = (kv_i32.astype(jnp.float32) * sh * sqkv_ref[..., D:]
          + bqkv_ref[..., D:]).astype(compute_dtype)
    k_new = kv[:, :D]
    v_new = kv[:, D:]

    row_is_pos = (jax.lax.broadcasted_iota(jnp.int32, (B, S, D), 1) == pos)
    ck_ref[...] = jnp.where(row_is_pos, k_new[:, None, :], ck_in_ref[...])
    cv_ref[...] = jnp.where(row_is_pos, v_new[:, None, :], cv_in_ref[...])

    # q in [D, B] layout (same block-masked MXU attention as the bf16
    # kernel); per-column dequant happens in the unrolled b loop where the
    # per-row activation scale is a static (1,1) slice
    qT_i32 = jax.lax.dot_general(
        wqkv_ref[:, :D], hq, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                   # [D, B]
    dmask = (jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // Dh
             == jax.lax.broadcasted_iota(jnp.int32, (D, H), 1))
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // Dh
             == jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
             ).astype(jnp.float32)
    smask_col = (jax.lax.broadcasted_iota(jnp.int32, (S, H), 0) > pos)
    ctx_rows = []
    for b in range(B):
        q_col = (jax.lax.slice_in_dim(qT_i32, b, b + 1, axis=1)
                 .astype(jnp.float32) * sq_col_ref[...]
                 * jax.lax.slice(sh, (b, 0), (b + 1, 1))
                 + bqc_ref[...])                            # [D, 1] f32
        qmask_b = (q_col.astype(compute_dtype)
                   * dmask.astype(compute_dtype)).astype(compute_dtype)
        k_b = ck_ref[b].astype(compute_dtype)               # [S, D]
        v_b = cv_ref[b].astype(compute_dtype)
        scores = jax.lax.dot_general(
            k_b, qmask_b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) / np.sqrt(Dh)              # [S, H]
        scores = jnp.where(smask_col, -1e9, scores)
        scores = scores - jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores)
        probs = (e / jnp.sum(e, axis=0, keepdims=True)).astype(
            compute_dtype)
        hd = jax.lax.dot_general(
            probs, v_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                            # [H, D]
        ctx_rows.append(jnp.sum(hd * hmask, axis=0, keepdims=True))
    ctx = jnp.concatenate(ctx_rows, axis=0).astype(compute_dtype)

    cq, sc = _quantize_rows(ctx.astype(jnp.float32))
    out_i32 = jax.lax.dot_general(
        cq, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = (out_i32.astype(jnp.float32) * sc * so_ref[...]
           + bo_ref[...]).astype(compute_dtype)
    o_ref[...] = x + out


def fused_self_attn_step(x: jax.Array, ln: Dict, qkv: Dict, o: Dict,
                         cache_k: jax.Array, cache_v: jax.Array,
                         pos, *, n_heads: int,
                         policy: Policy = DEFAULT_POLICY):
    """One decoder layer's self-attention decode step in one kernel.

    x [B, D] (seq-len-1 squeezed), ln {scale, bias}, qkv {kernel [D, 3D],
    bias [3D]} (the fuse_whisper_decoder_qkv layout), o {kernel, bias},
    cache_k/cache_v [B, S, D] merged-head planes, pos scalar int32.
    Returns (x + self_attn(LN(x)), cache_k', cache_v') with position
    `pos` written. Cache buffers are input/output-aliased — no copy.
    """
    B, D = x.shape
    compute = policy.compute
    x = x.astype(compute)
    pos = jnp.asarray(pos, jnp.int32).reshape(1)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    if "kernel_q" in qkv:
        # int8-weight mode (quantize_whisper_decoder applied after the qkv
        # fuse): per-channel scales ride along; the q slice of the scale
        # vector is passed in column layout for the [D, B] q derivation
        kern = functools.partial(
            _self_attn_step_kernel_i8, n_heads=n_heads,
            precision=policy.precision,
            ln_single_pass=policy.compute == jnp.dtype(jnp.bfloat16))
        sqkv = qkv["w_scale"].astype(jnp.float32)
        out, ck, cv = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [vmem() for _ in range(13)],
            out_specs=[vmem(), vmem(), vmem()],
            out_shape=[
                jax.ShapeDtypeStruct((B, D), compute),
                jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
                jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
            ],
            input_output_aliases={12: 1, 13: 2},
        )(pos,
          x,
          ln["scale"].astype(jnp.float32), ln["bias"].astype(jnp.float32),
          qkv["kernel_q"],
          sqkv.reshape(1, 3 * D),
          qkv["bias"].astype(jnp.float32).reshape(1, 3 * D),
          sqkv[:D].reshape(D, 1),
          qkv["bias"].astype(jnp.float32)[:D].reshape(D, 1),
          o["kernel_q"],
          o["w_scale"].astype(jnp.float32).reshape(1, D),
          o["bias"].astype(jnp.float32).reshape(1, D),
          cache_k, cache_v)
        return out, ck, cv
    kern = functools.partial(
        _self_attn_step_kernel, n_heads=n_heads,
        precision=policy.precision,
        ln_single_pass=policy.compute == jnp.dtype(jnp.bfloat16))
    out, ck, cv = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pos
            vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(),
            vmem(), vmem(), vmem(),
        ],
        out_specs=[vmem(), vmem(), vmem()],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), compute),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        input_output_aliases={9: 1, 10: 2},          # caches update in place
    )(pos,
      x,
      ln["scale"].astype(jnp.float32), ln["bias"].astype(jnp.float32),
      qkv["kernel"].astype(compute), qkv["bias"].astype(jnp.float32),
      qkv["bias"].astype(jnp.float32)[:D].reshape(D, 1),  # q bias, column
      o["kernel"].astype(compute), o["bias"].astype(jnp.float32),
      cache_k, cache_v)
    return out, ck, cv
