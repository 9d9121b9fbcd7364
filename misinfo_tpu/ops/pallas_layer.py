"""Pallas TPU WHOLE-LAYER fused decoder step: one Mosaic kernel per layer.

Round-5 continuation of the decode-floor ladder (docs/PERF.md): after the
2-kernel layer (round 4) and the in-kernel int8 weights (round 5), the
per-step cost is ~150 µs at b4 with 12 kernel launches + XLA glue; the
serial kernel chain remains the binding term. This kernel merges one
decoder layer's ENTIRE step — pre-LN → fused int8 QKV → KV-cache write →
masked self-attention → output proj → residual → pre-LN → int8
cross-attention query → streamed cross-attention over the encoder K/V →
output proj → residual → pre-LN → int8 FFN → residual — into ONE kernel,
halving the launch count to 6/step for whisper-base.

VMEM accounting at base/b4/S=448/Tp=1536 (int8 weights): qkv 0.75 +
o/q/o 0.75 + FFN 2.0 MB weights; self K/V planes 3.7 MB
(input/output-aliased); double-buffered cross tiles 4.2 MB; score
scratch 0.2 MB; ≈ 11.6 MB + stack — inside the 16 MB core budget
exactly because the weights are int8 (the bf16 form would not fit,
which is why this exists only for the quant="kernels" layout).

Bodies are the proven int8 kernels verbatim (ops/pallas_decode.py
`_self_attn_step_kernel_i8` + ops/pallas_cross_ffn.py
`_cross_ffn_kernel_i8`) composed sequentially; numerics are identical
by construction and token equality vs the 2-kernel path is asserted in
interpret mode (tests/test_whisper_parity.py).

Reference workload: the dashboard transcript path
(/root/reference/forensics_dashboard.py:80-83). Enabled via
``decode_transcript(pallas_layer=True)`` / ``BENCH_PALLAS_LAYER=1``;
keep/reject lives in docs/PERF.md round 5.
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
from misinfo_tpu.ops.pallas_cross_ffn import _TILE


def _layer_step_kernel_i8(pos_ref, x_ref,
                          ln1s_ref, ln1b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                          sq_col_ref, bqc_ref, wo1_ref, so1_ref, bo1_ref,
                          lncs_ref, lncb_ref, wq2_ref, sq2_col_ref, bq2c_ref,
                          wo2_ref, so2_ref, bo2_ref,
                          ln2s_ref, ln2b_ref, w1_ref, s1_ref, b1_ref,
                          w2_ref, s2_ref, b2_ref,
                          ck_in_ref, cv_in_ref, cxk_ref, cxv_ref,
                          o_ref, ck_ref, cv_ref,
                          scores_ref, tile_ref, sem_ref, *,
                          n_heads: int, t_actual: int, precision,
                          ln_single_pass: bool, gelu_tanh: bool):
    from misinfo_tpu.ops.pallas_int8 import _quantize_rows

    B, D = x_ref.shape
    H = n_heads
    Dh = D // H
    S = ck_in_ref.shape[1]
    Tp = cxk_ref.shape[1]
    tile = tile_ref.shape[2]
    n_tiles = Tp // tile
    pos = pos_ref[0]

    x = x_ref[...]
    compute_dtype = x.dtype

    def ln(v, s_ref, b_ref):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, axis=-1, keepdims=True)
        if ln_single_pass:
            var = jnp.maximum(
                jnp.mean(jnp.square(vf), axis=-1, keepdims=True)
                - jnp.square(mu), 0.0)
        else:
            var = jnp.mean(jnp.square(vf - mu), axis=-1, keepdims=True)
        y = (vf - mu) * jax.lax.rsqrt(var + 1e-5)
        return (y * s_ref[...] + b_ref[...]).astype(compute_dtype)

    def dense_q(v, w_ref, s_ref, b_ref):
        vq, sv = _quantize_rows(v.astype(jnp.float32))
        y = jax.lax.dot_general(
            vq, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * sv * s_ref[...]
                + b_ref[...]).astype(compute_dtype)

    dmask = (jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // Dh
             == jax.lax.broadcasted_iota(jnp.int32, (D, H), 1))
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // Dh
             == jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
             ).astype(jnp.float32)

    # ---------------- first half: self-attention (pallas_decode.py i8)
    h = ln(x, ln1s_ref, ln1b_ref)
    hq, sh = _quantize_rows(h.astype(jnp.float32))

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

    qT_i32 = jax.lax.dot_general(
        wqkv_ref[:, :D], hq, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                   # [D, B]
    smask_col = (jax.lax.broadcasted_iota(jnp.int32, (S, H), 0) > pos)
    ctx_rows = []
    for b in range(B):
        q_col = (jax.lax.slice_in_dim(qT_i32, b, b + 1, axis=1)
                 .astype(jnp.float32) * sq_col_ref[...]
                 * jax.lax.slice(sh, (b, 0), (b + 1, 1))
                 + bqc_ref[...])                            # [D, 1]
        qmask_b = (q_col.astype(compute_dtype)
                   * dmask.astype(compute_dtype)).astype(compute_dtype)
        k_b = ck_ref[b].astype(compute_dtype)
        v_b = cv_ref[b].astype(compute_dtype)
        scores = jax.lax.dot_general(
            k_b, qmask_b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) / np.sqrt(Dh)              # [S, H]
        scores = jnp.where(smask_col, -1e9, scores)
        scores = scores - jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores)
        probs = (e / jnp.sum(e, axis=0, keepdims=True)).astype(compute_dtype)
        hd = jax.lax.dot_general(
            probs, v_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        ctx_rows.append(jnp.sum(hd * hmask, axis=0, keepdims=True))
    ctx = jnp.concatenate(ctx_rows, axis=0).astype(compute_dtype)
    x = x + dense_q(ctx, wo1_ref, so1_ref, bo1_ref)

    # ---------------- second half: cross-attention + FFN (pallas_cross_ffn)
    def tile_dma(src_ref, j, slot):
        return pltpu.make_async_copy(
            src_ref.at[:, j * tile:(j + 1) * tile, :],
            tile_ref.at[slot], sem_ref.at[slot])

    h2 = ln(x, lncs_ref, lncb_ref)
    h2q, sh2 = _quantize_rows(h2.astype(jnp.float32))
    qT2_i32 = jax.lax.dot_general(
        wq2_ref[...], h2q, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                   # [D, B]
    qmask = []
    for b in range(B):
        q_col = (jax.lax.slice_in_dim(qT2_i32, b, b + 1, axis=1)
                 .astype(jnp.float32) * sq2_col_ref[...]
                 * jax.lax.slice(sh2, (b, 0), (b + 1, 1))
                 + bq2c_ref[...])
        qmask.append((q_col.astype(compute_dtype)
                      * dmask.astype(compute_dtype)).astype(compute_dtype))

    tile_dma(cxk_ref, 0, 0).start()
    for j in range(n_tiles):
        slot = j % 2
        if j + 1 < n_tiles:
            tile_dma(cxk_ref, j + 1, (j + 1) % 2).start()
        tile_dma(cxk_ref, j, slot).wait()
        for b in range(B):
            kt_b = tile_ref[slot, b]
            part = jax.lax.dot_general(
                kt_b, qmask[b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision) / np.sqrt(Dh)
            scores_ref[j * tile:(j + 1) * tile, b * H:(b + 1) * H] = part

    scores = scores_ref[...]
    if t_actual < Tp:
        pad = (jax.lax.broadcasted_iota(jnp.int32, (Tp, B * H), 0)
               >= t_actual)
        scores = jnp.where(pad, -1e9, scores)
    scores = scores - jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores)
    probs = (e / jnp.sum(e, axis=0, keepdims=True)).astype(compute_dtype)

    ctx_rows = [jnp.zeros((1, D), jnp.float32) for _ in range(B)]
    tile_dma(cxv_ref, 0, 0).start()
    for j in range(n_tiles):
        slot = j % 2
        if j + 1 < n_tiles:
            tile_dma(cxv_ref, j + 1, (j + 1) % 2).start()
        tile_dma(cxv_ref, j, slot).wait()
        for b in range(B):
            vt_b = tile_ref[slot, b]
            pt_b = probs[j * tile:(j + 1) * tile, b * H:(b + 1) * H]
            hd = jax.lax.dot_general(
                pt_b, vt_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            ctx_rows[b] = ctx_rows[b] + jnp.sum(hd * hmask, axis=0,
                                                keepdims=True)
    ctx2 = jnp.concatenate(ctx_rows, axis=0).astype(compute_dtype)
    x2 = x + dense_q(ctx2, wo2_ref, so2_ref, bo2_ref)

    h3 = ln(x2, ln2s_ref, ln2b_ref)
    mid = dense_q(h3, w1_ref, s1_ref, b1_ref)
    g = jax.nn.gelu(mid.astype(jnp.float32),
                    approximate=gelu_tanh).astype(compute_dtype)
    o_ref[...] = x2 + dense_q(g, w2_ref, s2_ref, b2_ref)


def fused_layer_step(x: jax.Array, blk: Dict,
                     cache_k: jax.Array, cache_v: jax.Array,
                     cross_k: jax.Array, cross_v: jax.Array,
                     pos, t_actual: int, *, n_heads: int,
                     policy: Policy = DEFAULT_POLICY):
    """One decoder layer's WHOLE decode step in one kernel (int8-weight
    layout only: `blk` must carry the fused ``self_attn.qkv`` and the
    quantize_whisper_decoder ``kernel_q`` leaves). Returns
    ``(x_out, cache_k', cache_v')`` with position `pos` written; self
    caches update in place (input/output aliased)."""
    B, D = x.shape
    sa, ca = blk["self_attn"], blk["cross_attn"]
    if "kernel_q" not in sa["qkv"]:
        raise ValueError("fused_layer_step needs int8 decode weights "
                         "(quant='kernels'); got unquantized params")
    F = blk["mlp_in"]["kernel_q"].shape[1]
    Tp = cross_k.shape[1]
    tile = min(_TILE, Tp)
    while B * tile * D * 2 * 2 > 6 * 2 ** 20 and tile > 128 \
            and Tp % (tile // 2) == 0:
        tile //= 2
    assert Tp % tile == 0, (Tp, tile)
    compute = policy.compute
    x = x.astype(compute)
    pos = jnp.asarray(pos, jnp.int32).reshape(1)
    kern = functools.partial(
        _layer_step_kernel_i8, n_heads=n_heads, t_actual=t_actual,
        precision=policy.precision,
        ln_single_pass=policy.compute == jnp.dtype(jnp.bfloat16),
        gelu_tanh=policy.compute == jnp.dtype(jnp.bfloat16))
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)    # noqa: E731
    sqkv = sa["qkv"]["w_scale"].astype(jnp.float32)
    out, ck, cv = pl.pallas_call(
        kern,
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                  + [vmem() for _ in range(29)] + [hbm(), hbm()]),
        out_specs=[vmem(), vmem(), vmem()],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), compute),
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
        ],
        input_output_aliases={28: 1, 29: 2},
        scratch_shapes=[
            pltpu.VMEM((Tp, B * n_heads), jnp.float32),
            pltpu.VMEM((2, B, tile, D), cross_k.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (4 * D * D + 2 * D * F)
            + 4 * B * (t_actual + cache_k.shape[1]) * D,
            bytes_accessed=(4 * D * D + 2 * D * F)
            + 2 * Tp * D * B * cross_k.dtype.itemsize
            + 4 * B * cache_k.shape[1] * D * cache_k.dtype.itemsize,
            transcendentals=B * (Tp * n_heads + cache_k.shape[1] * n_heads
                                 + F),
        ),
    )(pos, x,
      blk["ln1"]["scale"].astype(jnp.float32),
      blk["ln1"]["bias"].astype(jnp.float32),
      sa["qkv"]["kernel_q"],
      sqkv.reshape(1, 3 * D),
      sa["qkv"]["bias"].astype(jnp.float32).reshape(1, 3 * D),
      sqkv[:D].reshape(D, 1),
      sa["qkv"]["bias"].astype(jnp.float32)[:D].reshape(D, 1),
      sa["o"]["kernel_q"],
      sa["o"]["w_scale"].astype(jnp.float32).reshape(1, D),
      sa["o"]["bias"].astype(jnp.float32).reshape(1, D),
      blk["ln_cross"]["scale"].astype(jnp.float32).reshape(1, D),
      blk["ln_cross"]["bias"].astype(jnp.float32).reshape(1, D),
      ca["q"]["kernel_q"],
      ca["q"]["w_scale"].astype(jnp.float32).reshape(D, 1),
      ca["q"]["bias"].astype(jnp.float32).reshape(D, 1),
      ca["o"]["kernel_q"],
      ca["o"]["w_scale"].astype(jnp.float32).reshape(1, D),
      ca["o"]["bias"].astype(jnp.float32).reshape(1, D),
      blk["ln2"]["scale"].astype(jnp.float32).reshape(1, D),
      blk["ln2"]["bias"].astype(jnp.float32).reshape(1, D),
      blk["mlp_in"]["kernel_q"],
      blk["mlp_in"]["w_scale"].astype(jnp.float32).reshape(1, F),
      blk["mlp_in"]["bias"].astype(jnp.float32).reshape(1, F),
      blk["mlp_out"]["kernel_q"],
      blk["mlp_out"]["w_scale"].astype(jnp.float32).reshape(1, D),
      blk["mlp_out"]["bias"].astype(jnp.float32).reshape(1, D),
      cache_k, cache_v, cross_k, cross_v)
    return out, ck, cv
