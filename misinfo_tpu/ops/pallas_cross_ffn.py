"""Pallas TPU fused decoder CROSS-ATTENTION + FFN step for KV-cached
decoding.

Round-4 decode-floor finding (docs/PERF.md): the Whisper decode loop is
bound by the serial per-step kernel chain (~90 kernels/step; the int8
streaming A/B falsified the HBM-bandwidth hypothesis — halving the weight
stream recovered 1.6 ms of a predicted 7.5), so the live lever is kernel
COUNT. This kernel collapses the entire second half of one decoder layer's
step — pre-LN → cross-attention query projection → per-head softmax
attention over the precomputed encoder K/V → output projection → residual
→ pre-LN → FFN (dense → GELU → dense) → residual — into ONE kernel,
removing ~8 XLA kernels (and their operand prefetch copies) per layer per
step. The profiled decode spends ~80% of its per-step time in async-copy /
slice ops (tools/profile_whisper.py), which is exactly what fewer, bigger
kernels attack.

The cross K/V planes (2 × [B, T, D] ≈ 12.6 MB/layer for base at T=1500)
do NOT fit VMEM next to the layer's weights (~5 MB) — the first, fully
VMEM-resident version of this kernel was rejected by Mosaic at 16.58 MB
scoped vmem vs the 16 MB core budget. So the caches stay in HBM
(``memory_space=ANY``) and stream through a double-buffered VMEM tile
scratch with explicit async copies: pass 1 streams K tiles and fills a
full [B·H, Tp] f32 score buffer (tiny — softmax needs no online trick),
pass 2 streams V tiles through the SAME scratch and accumulates the
context. The tile loop is a static Python unroll (3 tiles at T=1500), so
every slice is static — the layout rules that sank the self-attention
kernel (ops/pallas_decode.py: no lane-splitting reshapes, heads as static
lane slices, per-head VPU mul+reduce) are followed throughout, and
``init_kv_cache(merged_cross=True)`` produces the [B, Tp, D] merged-lane,
tile-padded planes this kernel consumes.

Numerics mirror the XLA path (models/whisper._cached_decoder_step)
cast-for-cast: LN statistics and softmax in f32 (single-pass variance in
bf16 serving mode, two-pass in f32 parity), matmuls with f32 accumulation,
intermediates rounded to the compute dtype exactly where ops/common.dense
does; padding positions are masked to -1e9 before the softmax. GELU
follows the decode-step Pallas rule (models/whisper.py): erf in f32 parity
mode, tanh on the bf16 TPU serving path (Mosaic has no erf lowering;
activation delta ≤4.7e-4 — below bf16 noise). Token-level equality vs the
unfused decode is asserted in interpret mode (tests/test_whisper_parity.py)
per the CLAUDE.md kernel rule.

Reference workload: the dashboard transcript path
(/root/reference/forensics_dashboard.py:80-83) → whisper's per-step
decoder. Enabled via ``decode_transcript(pallas_cross=True)`` /
``BENCH_PALLAS_CROSS=1`` (tools/bench_whisper.py); the keep/reject
decision and TPU numbers live in docs/PERF.md round 4.
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

# K/V stream tile along T. 512 rows × D=512 bf16 = 512 KB per batch row —
# two double-buffered [B, _TILE, D] slots ≈ 4.2 MB at base/b4, leaving the
# layer weights (~5 MB) comfortable headroom inside the 16 MB VMEM budget.
_TILE = 512


def pallas_decode_max_batch(d_model: int, ffn_dim: int,
                            max_len: int, t_enc: int,
                            budget_bytes: int = 13 * 2 ** 20,
                            int8_weights: bool = False) -> int:
    """Largest decode batch for which BOTH fused decode kernels fit the
    ~16 MB VMEM core budget (conservative 13 MB working budget), or 0 when
    the layer's weights alone don't fit (whisper-medium/large — their
    FFN pair is >20 MB bf16; a chunk-streamed FFN variant would be needed).

    Accounting (bf16 bytes): the cross+FFN kernel holds the four layer
    weights + double-buffered K/V tiles + the f32 score scratch; the
    self-attention kernel holds Wqkv/Wo + the [B, max_len, D] K/V planes,
    counted for both the input and the aliased output (Mosaic's scoped
    accounting is the binding constraint, not HBM). The transcriber uses
    this to resolve `WhisperDecodeConfig.pallas="auto"` PER jit signature
    — window buckets past the cap decode through the XLA path, small
    buckets (the 1-window dashboard case) get the fused kernels.

    ``int8_weights`` (the quant="kernels" serving default, round 5)
    halves the weight terms: whisper-medium's FFN pair no longer
    overflows the budget, so the fused decode reaches model sizes the
    bf16 layout could not."""
    D, F = d_model, ffn_dim
    if D % 128:
        # Mosaic lane alignment: the kernels' merged-lane cache slices
        # need a 128-multiple d_model on real hardware (a D=64 tiny model
        # fails in tpu.memref_slice — caught by the round-5 real-TPU
        # default-resolution smoke, tools/smoke_transcriber_tpu.py);
        # sub-lane models decode through the XLA path
        return 0
    wbytes = 1 if int8_weights else 2
    cross_weights = (2 * D * D + 2 * D * F) * wbytes
    self_weights = (3 * D * D + D * D) * wbytes
    tp = cross_cache_pad(t_enc)
    for b in range(16, 0, -1):
        tile = min(_TILE, tp)
        while b * tile * D * 2 * 2 > 6 * 2 ** 20 and tile > 128:
            tile //= 2
        cross = (cross_weights + 2 * b * tile * D * 2
                 + tp * b * 32 * 4)                    # tiles + scores(≤32h)
        self_k = self_weights + 4 * b * max_len * D * 2
        if max(cross, self_k) <= budget_bytes:
            return b
    return 0


def cross_cache_pad(t: int) -> int:
    """Padded T for the merged-lane cross caches this kernel consumes:
    a _TILE multiple when tiling engages, else a lane-aligned 128 multiple
    (small/test shapes run as a single tile)."""
    if t > _TILE:
        return -(-t // _TILE) * _TILE
    return -(-t // 128) * 128


def _cross_ffn_kernel(x_ref, lncs_ref, lncb_ref, wq_ref, bqc_ref,
                      wo_ref, bo_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref,
                      w2_ref, b2_ref, ck_ref, cv_ref, o_ref, scores_ref,
                      tile_ref, sem_ref, *, n_heads: int, t_actual: int,
                      precision, ln_single_pass: bool, gelu_tanh: bool):
    B, D = x_ref.shape
    H = n_heads
    Dh = D // H
    Tp = ck_ref.shape[1]
    tile = tile_ref.shape[2]                           # [2, B, tile, D]
    n_tiles = Tp // tile

    x = x_ref[...]
    compute_dtype = x.dtype

    def ln(v, s_ref, b_ref):
        # formula matched to ops/common.layer_norm per policy mode
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

    def dense(v, w_ref, b_ref):
        # ops/common.dense cast-for-cast: f32 accumulation, bias in f32,
        # result rounded to the compute dtype
        y = jax.lax.dot_general(
            v, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        return (y + b_ref[...]).astype(compute_dtype)

    def tile_dma(src_ref, j, slot):
        return pltpu.make_async_copy(
            src_ref.at[:, j * tile:(j + 1) * tile, :],
            tile_ref.at[slot], sem_ref.at[slot])

    # ---- cross-attention: LN → q proj, then two streamed passes over HBM.
    # Per-head math rides the MXU as block-masked matmuls (the VPU
    # mul-reduce form of the first version measured 66 vs 81 utt/s): for
    # each batch row b, scores[:, b·H:(b+1)·H] = K_b · (q_bᵀ ⊙ blockmask)
    # computes EXACTLY the per-head dot products because the mask zeroes
    # every q lane outside head h's Dh block — no lane-splitting reshapes,
    # no batched dot_general, no transposes (q is produced directly in
    # [D, B] layout by contracting Wq's input axis against h's feature
    # axis, with a column-layout copy of the bias).
    h = ln(x, lncs_ref, lncb_ref)
    # qT [D, B] f32→compute: same values as dense(h, Wq), transposed layout
    qT = jax.lax.dot_general(
        wq_ref[...], h, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    qT = (qT + bqc_ref[...]).astype(compute_dtype)
    # blockmask [D, H]: mask[d, h] = 1 iff lane d belongs to head h
    dmask = (jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // Dh
             == jax.lax.broadcasted_iota(jnp.int32, (D, H), 1))
    qmask = [(jax.lax.slice_in_dim(qT, b, b + 1, axis=1)
              * dmask.astype(compute_dtype)).astype(compute_dtype)
             for b in range(B)]                        # B × [D, H]

    # pass 1: stream K tiles, fill the [Tp, B·H] f32 score columns
    # (column-major per batch row so every store slice is static)
    tile_dma(ck_ref, 0, 0).start()
    for j in range(n_tiles):
        slot = j % 2
        if j + 1 < n_tiles:
            tile_dma(ck_ref, j + 1, (j + 1) % 2).start()
        tile_dma(ck_ref, j, slot).wait()
        for b in range(B):
            kt_b = tile_ref[slot, b]                   # [tile, D]
            part = jax.lax.dot_general(
                kt_b, qmask[b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision) / np.sqrt(Dh)     # [tile, H]
            scores_ref[j * tile:(j + 1) * tile, b * H:(b + 1) * H] = part

    # full-column softmax (f32) over the T axis (sublanes); padded
    # positions masked off — zero-padded K rows would otherwise
    # contribute exp(0) mass
    scores = scores_ref[...]
    if t_actual < Tp:
        pad = (jax.lax.broadcasted_iota(jnp.int32, (Tp, B * H), 0)
               >= t_actual)
        scores = jnp.where(pad, -1e9, scores)
    scores = scores - jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores)
    probs = (e / jnp.sum(e, axis=0, keepdims=True)).astype(
        compute_dtype)                                 # [Tp, B·H]

    # pass 2: stream V tiles through the SAME scratch; per batch row,
    # probs_bᵀ · V_b → [H, D], then the blockmask row-reduce collapses the
    # head axis onto the merged-lane context (disjoint blocks sum cleanly)
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // Dh
             == jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
             ).astype(jnp.float32)
    ctx_rows = [jnp.zeros((1, D), jnp.float32) for _ in range(B)]
    tile_dma(cv_ref, 0, 0).start()
    for j in range(n_tiles):
        slot = j % 2
        if j + 1 < n_tiles:
            tile_dma(cv_ref, j + 1, (j + 1) % 2).start()
        tile_dma(cv_ref, j, slot).wait()
        for b in range(B):
            vt_b = tile_ref[slot, b]                   # [tile, D]
            pt_b = probs[j * tile:(j + 1) * tile, b * H:(b + 1) * H]
            hd = jax.lax.dot_general(
                pt_b, vt_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)                   # [H, D]
            ctx_rows[b] = ctx_rows[b] + jnp.sum(hd * hmask, axis=0,
                                                keepdims=True)
    ctx = jnp.concatenate(ctx_rows, axis=0).astype(compute_dtype)  # [B, D]
    x2 = x + dense(ctx, wo_ref, bo_ref)

    # ---- FFN: LN → dense → GELU → dense, residual
    h2 = ln(x2, ln2s_ref, ln2b_ref)
    mid = dense(h2, w1_ref, b1_ref)
    g = jax.nn.gelu(mid.astype(jnp.float32),
                    approximate=gelu_tanh).astype(compute_dtype)
    o_ref[...] = x2 + dense(g, w2_ref, b2_ref)


def _cross_ffn_kernel_i8(x_ref, lncs_ref, lncb_ref, wq_ref, sq_col_ref,
                         bqc_ref, wo_ref, so_ref, bo_ref, ln2s_ref,
                         ln2b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                         b2_ref, ck_ref, cv_ref, o_ref, scores_ref,
                         tile_ref, sem_ref, *, n_heads: int, t_actual: int,
                         precision, ln_single_pass: bool, gelu_tanh: bool):
    """int8-weight variant (WhisperDecodeConfig.quant="kernels"): the four
    dense weights stream int8 (halving the step's largest HBM stream,
    docs/PERF.md decode-floor accounting) with per-output-channel scales;
    [B, *] activations quantize per row in VMEM (trivial at decode
    shapes) and the dots ride the int8 MXU. Cross K/V planes stay in the
    bf16 merged-lane layout — identical streaming to the bf16 kernel."""
    from misinfo_tpu.ops.pallas_int8 import _quantize_rows

    B, D = x_ref.shape
    H = n_heads
    Dh = D // H
    Tp = ck_ref.shape[1]
    tile = tile_ref.shape[2]
    n_tiles = Tp // tile

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
        # ops/quant.dense_int8 cast-for-cast: per-row activation scales,
        # int32 accumulation, f32 rescale + bias, round to compute dtype
        vq, sv = _quantize_rows(v.astype(jnp.float32))
        y = jax.lax.dot_general(
            vq, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * sv * s_ref[...]
                + b_ref[...]).astype(compute_dtype)

    def tile_dma(src_ref, j, slot):
        return pltpu.make_async_copy(
            src_ref.at[:, j * tile:(j + 1) * tile, :],
            tile_ref.at[slot], sem_ref.at[slot])

    # ---- cross-attention (same block-masked MXU form as the bf16 kernel;
    # q is derived in [D, B] layout from the int8 weight, dequantized per
    # batch column inside the unrolled b loop)
    h = ln(x, lncs_ref, lncb_ref)
    hq, sh = _quantize_rows(h.astype(jnp.float32))
    qT_i32 = jax.lax.dot_general(
        wq_ref[...], hq, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                  # [D, B]
    dmask = (jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // Dh
             == jax.lax.broadcasted_iota(jnp.int32, (D, H), 1))
    qmask = []
    for b in range(B):
        q_col = (jax.lax.slice_in_dim(qT_i32, b, b + 1, axis=1)
                 .astype(jnp.float32) * sq_col_ref[...]
                 * jax.lax.slice(sh, (b, 0), (b + 1, 1))
                 + bqc_ref[...])                           # [D, 1] f32
        qmask.append((q_col.astype(compute_dtype)
                      * dmask.astype(compute_dtype)).astype(compute_dtype))

    tile_dma(ck_ref, 0, 0).start()
    for j in range(n_tiles):
        slot = j % 2
        if j + 1 < n_tiles:
            tile_dma(ck_ref, j + 1, (j + 1) % 2).start()
        tile_dma(ck_ref, j, slot).wait()
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

    hmask = (jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // Dh
             == jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
             ).astype(jnp.float32)
    ctx_rows = [jnp.zeros((1, D), jnp.float32) for _ in range(B)]
    tile_dma(cv_ref, 0, 0).start()
    for j in range(n_tiles):
        slot = j % 2
        if j + 1 < n_tiles:
            tile_dma(cv_ref, j + 1, (j + 1) % 2).start()
        tile_dma(cv_ref, j, slot).wait()
        for b in range(B):
            vt_b = tile_ref[slot, b]
            pt_b = probs[j * tile:(j + 1) * tile, b * H:(b + 1) * H]
            hd = jax.lax.dot_general(
                pt_b, vt_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)
            ctx_rows[b] = ctx_rows[b] + jnp.sum(hd * hmask, axis=0,
                                                keepdims=True)
    ctx = jnp.concatenate(ctx_rows, axis=0).astype(compute_dtype)
    x2 = x + dense_q(ctx, wo_ref, so_ref, bo_ref)

    # ---- FFN: LN → int8 dense → GELU → int8 dense, residual
    h2 = ln(x2, ln2s_ref, ln2b_ref)
    mid = dense_q(h2, w1_ref, s1_ref, b1_ref)
    g = jax.nn.gelu(mid.astype(jnp.float32),
                    approximate=gelu_tanh).astype(compute_dtype)
    o_ref[...] = x2 + dense_q(g, w2_ref, s2_ref, b2_ref)


def _cross_ffn_kernel_i8cc(x_ref, lncs_ref, lncb_ref, wq_ref, sq_col_ref,
                           bqc_ref, wo_ref, so_ref, bo_ref, ln2s_ref,
                           ln2b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                           b2_ref, ksc_ref, vsc_ref, ck_ref, cv_ref, o_ref,
                           scores_ref, tile_ref, sem_ref, *, n_heads: int,
                           t_actual: int, precision, ln_single_pass: bool,
                           gelu_tanh: bool):
    """int8-weight AND int8-cross-cache variant: the K/V planes stream as
    int8 tiles (HALF the kernel's dominant DMA term, docs/PERF.md round
    5) with per-(batch, position) row scales resident in VMEM
    ([Tp, B] f32, ~24 KB). Both streamed passes stay int8 MXU dots: the
    q columns quantize per batch row (scalar scale), and the V pass
    folds the row scales into the probabilities BEFORE their (per-batch,
    per-tile scalar) quantization — the XLA int8 streaming mode's
    scheme (models/whisper.py :284-296) executed in-kernel."""
    from misinfo_tpu.ops.pallas_int8 import _quantize_rows

    B, D = x_ref.shape
    H = n_heads
    Dh = D // H
    Tp = ck_ref.shape[1]
    tile = tile_ref.shape[2]
    n_tiles = Tp // tile

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

    def tile_dma(src_ref, j, slot):
        return pltpu.make_async_copy(
            src_ref.at[:, j * tile:(j + 1) * tile, :],
            tile_ref.at[slot], sem_ref.at[slot])

    h = ln(x, lncs_ref, lncb_ref)
    hq, sh = _quantize_rows(h.astype(jnp.float32))
    qT_i32 = jax.lax.dot_general(
        wq_ref[...], hq, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                  # [D, B]
    dmask = (jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // Dh
             == jax.lax.broadcasted_iota(jnp.int32, (D, H), 1))
    qq = []       # per batch row: (int8 masked q [D, H], scalar scale (1,1))
    for b in range(B):
        q_col = (jax.lax.slice_in_dim(qT_i32, b, b + 1, axis=1)
                 .astype(jnp.float32) * sq_col_ref[...]
                 * jax.lax.slice(sh, (b, 0), (b + 1, 1))
                 + bqc_ref[...])                           # [D, 1] f32
        qmask_b = q_col * dmask.astype(jnp.float32)        # [D, H] f32
        sq_b = jnp.maximum(
            jnp.max(jnp.abs(qmask_b), keepdims=True), 1e-30) / 127.0
        qq_b = jnp.clip(jnp.round(qmask_b / sq_b), -127,
                        127).astype(jnp.int8)
        qq.append((qq_b, sq_b))

    # pass 1: int8 K tiles · int8 q — rescale by (row scale × q scale)
    tile_dma(ck_ref, 0, 0).start()
    for j in range(n_tiles):
        slot = j % 2
        if j + 1 < n_tiles:
            tile_dma(ck_ref, j + 1, (j + 1) % 2).start()
        tile_dma(ck_ref, j, slot).wait()
        ks_tile = ksc_ref[j * tile:(j + 1) * tile, :]       # [tile, B]
        for b in range(B):
            kt_b = tile_ref[slot, b]                        # [tile, D] int8
            qq_b, sq_b = qq[b]
            part = jax.lax.dot_general(
                kt_b, qq_b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)           # [tile, H]
            part = (part.astype(jnp.float32) * sq_b
                    * jax.lax.slice(ks_tile, (0, b), (tile, b + 1))
                    / np.sqrt(Dh))
            scores_ref[j * tile:(j + 1) * tile, b * H:(b + 1) * H] = part

    scores = scores_ref[...]
    if t_actual < Tp:
        pad = (jax.lax.broadcasted_iota(jnp.int32, (Tp, B * H), 0)
               >= t_actual)
        scores = jnp.where(pad, -1e9, scores)
    scores = scores - jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores)
    probs = e / jnp.sum(e, axis=0, keepdims=True)           # f32 [Tp, B·H]

    # pass 2: fold V row scales into the probs, quantize per (b, tile)
    # scalar, int8 dot, rescale — row scales cannot factor out of the
    # t-sum, the prob fold is the exact algebraic equivalent
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // Dh
             == jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
             ).astype(jnp.float32)
    ctx_rows = [jnp.zeros((1, D), jnp.float32) for _ in range(B)]
    tile_dma(cv_ref, 0, 0).start()
    for j in range(n_tiles):
        slot = j % 2
        if j + 1 < n_tiles:
            tile_dma(cv_ref, j + 1, (j + 1) % 2).start()
        tile_dma(cv_ref, j, slot).wait()
        vs_tile = vsc_ref[j * tile:(j + 1) * tile, :]       # [tile, B]
        for b in range(B):
            vt_b = tile_ref[slot, b]                        # [tile, D] int8
            pt_b = probs[j * tile:(j + 1) * tile, b * H:(b + 1) * H]
            pv = pt_b * jax.lax.slice(vs_tile, (0, b), (tile, b + 1))
            sp_b = jnp.maximum(jnp.max(pv, keepdims=True), 1e-30) / 127.0
            pq = jnp.clip(jnp.round(pv / sp_b), 0, 127).astype(jnp.int8)
            hd = jax.lax.dot_general(
                pq, vt_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)           # [H, D]
            ctx_rows[b] = ctx_rows[b] + jnp.sum(
                hd.astype(jnp.float32) * sp_b * hmask, axis=0,
                keepdims=True)
    ctx = jnp.concatenate(ctx_rows, axis=0).astype(compute_dtype)
    x2 = x + dense_q(ctx, wo_ref, so_ref, bo_ref)

    h2 = ln(x2, ln2s_ref, ln2b_ref)
    mid = dense_q(h2, w1_ref, s1_ref, b1_ref)
    g = jax.nn.gelu(mid.astype(jnp.float32),
                    approximate=gelu_tanh).astype(compute_dtype)
    o_ref[...] = x2 + dense_q(g, w2_ref, s2_ref, b2_ref)


def fused_cross_ffn_step(x: jax.Array, ln_cross: Dict, q: Dict, o: Dict,
                         ln2: Dict, mlp_in: Dict, mlp_out: Dict,
                         cache_k: jax.Array, cache_v: jax.Array,
                         t_actual: int, *, n_heads: int,
                         policy: Policy = DEFAULT_POLICY,
                         k_scale: jax.Array = None,
                         v_scale: jax.Array = None) -> jax.Array:
    """One decoder layer's cross-attention + FFN decode step in one kernel.

    x [B, D] (seq-len-1 squeezed), ln_cross/ln2 {scale, bias}, q/o the
    cross-attention query/output projections {kernel [D, D], bias [D]},
    mlp_in/mlp_out the FFN pair, cache_k/cache_v [B, Tp, D] merged-head,
    tile-padded encoder K/V planes (init_kv_cache(merged_cross=True)),
    t_actual the real encoder length (positions ≥ t_actual are masked).
    Returns x₃ = x₂ + FFN(LN(x₂)) where x₂ = x + crossAttn(LN(x)).
    """
    B, D = x.shape
    quant = "kernel_q" in q
    F = (mlp_in["kernel_q"] if quant else mlp_in["kernel"]).shape[1]
    Tp = cache_k.shape[1]
    tile = min(_TILE, Tp)
    # shrink the tile as B grows so the double-buffered scratch stays
    # ≤~6 MB (same rule as pallas_decode_max_batch's estimate); Tp is a
    # _TILE multiple when tiling engages, so halves keep dividing it
    while B * tile * D * 2 * 2 > 6 * 2 ** 20 and tile > 128 \
            and Tp % (tile // 2) == 0:
        tile //= 2
    assert Tp % tile == 0, (Tp, tile)
    compute = policy.compute
    x = x.astype(compute)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)    # noqa: E731
    scratch = [
        pltpu.VMEM((Tp, B * n_heads), jnp.float32),       # scores
        pltpu.VMEM((2, B, tile, D), cache_k.dtype),       # K/V tiles
        pltpu.SemaphoreType.DMA((2,)),
    ]
    cost = pl.CostEstimate(
        flops=2 * B * (2 * D * D + 2 * D * F)
        + 4 * B * t_actual * D,
        bytes_accessed=(2 * D * D + 2 * D * F) * (1 if quant else 2)
        + 2 * Tp * D * B * cache_k.dtype.itemsize,
        transcendentals=B * (Tp * n_heads + F),
    )
    if k_scale is not None:
        # int8 merged cross caches (init_kv_cache cross_int8=True); the
        # weights must be int8 too (the quant="kernels" layout)
        if not quant:
            raise ValueError("int8 cross caches require int8 decode "
                             "weights (quant='kernels')")
        kern = functools.partial(
            _cross_ffn_kernel_i8cc, n_heads=n_heads, t_actual=t_actual,
            precision=policy.precision,
            ln_single_pass=policy.compute == jnp.dtype(jnp.bfloat16),
            gelu_tanh=policy.compute == jnp.dtype(jnp.bfloat16))
        return pl.pallas_call(
            kern,
            in_specs=[vmem() for _ in range(19)] + [hbm(), hbm()],
            out_specs=vmem(),
            out_shape=jax.ShapeDtypeStruct((B, D), compute),
            scratch_shapes=[
                pltpu.VMEM((Tp, B * n_heads), jnp.float32),
                pltpu.VMEM((2, B, tile, D), cache_k.dtype),   # int8 tiles
                pltpu.SemaphoreType.DMA((2,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * (2 * D * D + 2 * D * F)
                + 4 * B * t_actual * D,
                bytes_accessed=(2 * D * D + 2 * D * F)
                + 2 * Tp * D * B,
                transcendentals=B * (Tp * n_heads + F),
            ),
        )(x,
          ln_cross["scale"].astype(jnp.float32).reshape(1, D),
          ln_cross["bias"].astype(jnp.float32).reshape(1, D),
          q["kernel_q"],
          q["w_scale"].astype(jnp.float32).reshape(D, 1),
          q["bias"].astype(jnp.float32).reshape(D, 1),
          o["kernel_q"],
          o["w_scale"].astype(jnp.float32).reshape(1, D),
          o["bias"].astype(jnp.float32).reshape(1, D),
          ln2["scale"].astype(jnp.float32).reshape(1, D),
          ln2["bias"].astype(jnp.float32).reshape(1, D),
          mlp_in["kernel_q"],
          mlp_in["w_scale"].astype(jnp.float32).reshape(1, F),
          mlp_in["bias"].astype(jnp.float32).reshape(1, F),
          mlp_out["kernel_q"],
          mlp_out["w_scale"].astype(jnp.float32).reshape(1, D),
          mlp_out["bias"].astype(jnp.float32).reshape(1, D),
          k_scale.astype(jnp.float32), v_scale.astype(jnp.float32),
          cache_k, cache_v)
    if quant:
        kern = functools.partial(
            _cross_ffn_kernel_i8, n_heads=n_heads, t_actual=t_actual,
            precision=policy.precision,
            ln_single_pass=policy.compute == jnp.dtype(jnp.bfloat16),
            gelu_tanh=policy.compute == jnp.dtype(jnp.bfloat16))
        return pl.pallas_call(
            kern,
            in_specs=[vmem() for _ in range(17)] + [hbm(), hbm()],
            out_specs=vmem(),
            out_shape=jax.ShapeDtypeStruct((B, D), compute),
            scratch_shapes=scratch,
            cost_estimate=cost,
        )(x,
          ln_cross["scale"].astype(jnp.float32).reshape(1, D),
          ln_cross["bias"].astype(jnp.float32).reshape(1, D),
          q["kernel_q"],
          q["w_scale"].astype(jnp.float32).reshape(D, 1),
          q["bias"].astype(jnp.float32).reshape(D, 1),
          o["kernel_q"],
          o["w_scale"].astype(jnp.float32).reshape(1, D),
          o["bias"].astype(jnp.float32).reshape(1, D),
          ln2["scale"].astype(jnp.float32).reshape(1, D),
          ln2["bias"].astype(jnp.float32).reshape(1, D),
          mlp_in["kernel_q"],
          mlp_in["w_scale"].astype(jnp.float32).reshape(1, F),
          mlp_in["bias"].astype(jnp.float32).reshape(1, F),
          mlp_out["kernel_q"],
          mlp_out["w_scale"].astype(jnp.float32).reshape(1, D),
          mlp_out["bias"].astype(jnp.float32).reshape(1, D),
          cache_k, cache_v)
    kern = functools.partial(
        _cross_ffn_kernel, n_heads=n_heads, t_actual=t_actual,
        precision=policy.precision,
        ln_single_pass=policy.compute == jnp.dtype(jnp.bfloat16),
        gelu_tanh=policy.compute == jnp.dtype(jnp.bfloat16))
    return pl.pallas_call(
        kern,
        in_specs=[vmem() for _ in range(13)] + [hbm(), hbm()],
        out_specs=vmem(),
        out_shape=jax.ShapeDtypeStruct((B, D), compute),
        scratch_shapes=scratch,
        cost_estimate=cost,
    )(x,
      ln_cross["scale"].astype(jnp.float32).reshape(1, D),
      ln_cross["bias"].astype(jnp.float32).reshape(1, D),
      q["kernel"].astype(compute),
      q["bias"].astype(jnp.float32).reshape(D, 1),   # column layout for qT
      o["kernel"].astype(compute), o["bias"].astype(jnp.float32).reshape(1, D),
      ln2["scale"].astype(jnp.float32).reshape(1, D),
      ln2["bias"].astype(jnp.float32).reshape(1, D),
      mlp_in["kernel"].astype(compute),
      mlp_in["bias"].astype(jnp.float32).reshape(1, F),
      mlp_out["kernel"].astype(compute),
      mlp_out["bias"].astype(jnp.float32).reshape(1, D),
      cache_k, cache_v)
