"""Pallas TPU int8-MXU serving kernels for the detector towers.

Round 1 measured XLA-level int8 serving (ops/quant.py dense_int8) at 621
vs 877 verdicts/s: the per-token activation quantize (abs-max reduce,
round, clip over [B·S, D]) and the f32 dequant run as standalone VPU
passes that round-trip HBM and serialize against the MXU, repaying the
double-rate int8 dots with interest. These kernels move that arithmetic
into VMEM where it belongs:

* ``int8_dense_pallas`` — one dense layer. Each row tile is quantized
  ONCE in VMEM (f32 abs-max → int8, stored in an int8 scratch), the int8
  dot rides the MXU at double bf16 rate, and the f32 rescale
  (``· sx · w_scale + bias``) is the kernel epilogue. Bit-identical to
  the XLA ``dense_int8`` path (same casts, same rounding) — asserted in
  interpret mode by tests/test_pallas_int8.py.

* ``int8_ffn_pallas`` — the whole FFN (dense → GELU → dense) in one
  kernel, the int8 sibling of ops/pallas_ffn.py: the [M, N] intermediate
  never touches HBM. The row tile's input is quantized once (j==0), each
  N-chunk computes ``g_j = act(dequant(xq @ W1q[:, j]))``, re-quantizes
  ``g_j`` per (token, chunk) in VMEM, and accumulates the int8
  ``g_jq @ W2q[j, :]`` dot into an f32 scratch; W2's per-channel scale
  and bias apply once on the last chunk. With a single chunk the math is
  bit-identical to the XLA chain ``dense_int8 → gelu → dense_int8``;
  chunked, the activation scales are per-(token, chunk) — strictly finer
  granularity than the XLA path's per-token-over-N.

Weights use the ops/quant.py format (``kernel_q`` int8 [K, N] +
``w_scale`` f32 [N], symmetric per-output-channel), so the XLA path
remains the fallback on every unaligned shape and non-TPU backend, and
`ops.serving.deoptimize_params` round-trips unchanged.

Routing: `quant_mode(policy)` resolves PrecisionConfig.quant_pallas
(default "auto" → both kernels on a real TPU, off elsewhere;
``MISINFO_TPU_INT8_PALLAS`` ∈ off|ffn|dense|all overrides for A/B). The
engine forces "off" under a device mesh — GSPMD partitioning of these
kernels is unvalidated; the XLA int8 path serves mesh deployments.

Reference hot path being accelerated: the RoBERTa/CLIP tower forwards,
/root/reference/misinfo_forensics.py:337-340 (text) and :354-408 (visual).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from misinfo_tpu.ops.common import DEFAULT_POLICY, Policy

# Row-tile target. 1024 needs the kernel's scoped-VMEM limit raised past
# Mosaic's 16 MB default (the worst case is ≈26 MB: blocks x/out 6 +
# weights 1.5 + scratch xq/acc 7.8 + i32/f32 stack ~11) — granted via
# CompilerParams below — and halves the weight re-fetch count vs 512
# (M/tm fetches of W1+W2 per layer). Measured A/B at b32/S=512 (same
# session, docs/PERF.md round 5): tm=1024 989.5 vs tm=512 961.2
# verdicts/s (+2.9%); tm=768 regressed (uneven 21.3-tile grid + padded
# rows). Row tiling does not change the math (activation scales are
# per-row, chunking is per-jc). MISINFO_TPU_INT8_FFN_TM overrides.
_TM = int(os.environ.get("MISINFO_TPU_INT8_FFN_TM", "1024"))
# FFN intermediate chunk target (columns of W1 per grid step).
_JC = 512


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def quant_mode(policy: Policy) -> str:
    """Resolve which int8 Pallas kernels are active: 'off', 'ffn',
    'dense', or 'all'. Env wins over policy; 'auto' means both kernels on
    a real TPU backend (the measured configuration), off elsewhere."""
    m = os.getenv("MISINFO_TPU_INT8_PALLAS", "") or getattr(
        policy, "quant_pallas", "auto")
    if m in ("auto", ""):
        return "all" if _on_tpu() else "off"
    if m in ("1", "on", "true"):
        return "all"
    if m in ("0", "none", "false"):
        return "off"
    return m


def ffn_kernel_enabled(policy: Policy) -> bool:
    return quant_mode(policy) in ("ffn", "all")


def dense_kernel_enabled(policy: Policy) -> bool:
    return quant_mode(policy) in ("dense", "all")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick(total: int, target: int, align: int) -> int:
    """Largest divisor of `total` ≤ target that is a multiple of `align`,
    else `total` (mirrors ops/pallas_ffn.py)."""
    for c in range(min(target, total), align - 1, -align):
        if total % c == 0 and c % align == 0:
            return c
    return total


def _quantize_rows(xf32: jax.Array):
    """Per-row symmetric int8: mirrors ops/quant.dense_int8 cast-for-cast
    (f32 abs-max, /127, round, clip)."""
    sx = jnp.maximum(
        jnp.max(jnp.abs(xf32), axis=-1, keepdims=True) / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf32 / sx), -127, 127).astype(jnp.int8)
    return xq, sx


# ---------------------------------------------------------------- dense

def _dense_kernel(x_ref, w_ref, s_ref, b_ref, o_ref, xq_ref, sx_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xq, sx = _quantize_rows(x_ref[...].astype(jnp.float32))
        xq_ref[...] = xq
        sx_ref[...] = sx

    yi = jax.lax.dot_general(
        xq_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = yi.astype(jnp.float32) * sx_ref[...] * s_ref[...] + b_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def int8_dense_pallas(x: jax.Array, wq: jax.Array, w_scale: jax.Array,
                      bias: Optional[jax.Array], *, out_dtype=jnp.bfloat16,
                      interpret: bool = False) -> jax.Array:
    """x [..., K] (bf16/f32) @ int8 wq [K, N] with in-kernel per-token
    quantization; f32 rescale + bias epilogue. K, N must be 128-aligned
    (the caller falls back to the XLA path otherwise)."""
    orig_shape = x.shape
    K = orig_shape[-1]
    N = wq.shape[1]
    M = 1
    for s in orig_shape[:-1]:
        M *= s
    x2 = x.reshape(M, K)

    # int8 scratch tiles are (32, 128); 32-row alignment covers the bf16
    # (16) and f32 (8) input tiles too.
    tm = min(_TM, _round_up(M, 32))
    Mp = _round_up(M, tm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    tn = _pick(N, 2048, 128)
    b = (bias.astype(jnp.float32) if bias is not None
         else jnp.zeros((N,), jnp.float32))

    out = pl.pallas_call(
        _dense_kernel,
        grid=(Mp // tm, N // tn),
        in_specs=[
            pl.BlockSpec((tm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, K), jnp.int8),
            pltpu.VMEM((tm, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=(Mp * K * x.dtype.itemsize + K * N
                            + Mp * N * jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, wq, w_scale.astype(jnp.float32).reshape(1, N), b.reshape(1, N))
    if Mp != M:
        out = out[:M]
    return out.reshape(*orig_shape[:-1], N)


_DENSE_MIN_ROWS = 256


def dense_int8_dispatch(params: Dict, x: jax.Array, policy: Policy) -> jax.Array:
    """`ops.common.dense`'s int8 route: the Pallas kernel when enabled,
    the shapes are MXU-aligned AND the row count is serving-scale, the
    XLA `dense_int8` otherwise. The row gate keeps tiny-M callers (the
    Whisper int8 streaming decode at B≤16 — a separately measured mode)
    on their unchanged XLA path: at a handful of rows the activation
    quantize is trivial and a kernel boundary only costs. Trace-time
    static dispatch (platform/env/shapes are all Python values)."""
    wq = params["kernel_q"]
    K, N = wq.shape
    M = 1
    for s in x.shape[:-1]:
        M *= s
    if (dense_kernel_enabled(policy) and K % 128 == 0 and N % 128 == 0
            and M >= _DENSE_MIN_ROWS and _on_tpu()):
        return int8_dense_pallas(x, wq, params["w_scale"],
                                 params.get("bias"),
                                 out_dtype=policy.compute)
    from misinfo_tpu.ops.quant import dense_int8
    return dense_int8(params, x, policy.compute)


# ------------------------------------------------------------------ ffn

def _act_f32(h32: jax.Array, compute_dtype, mode: str) -> jax.Array:
    """Dequantized f32 pre-activation → activation in compute dtype,
    mirroring the XLA chain cast-for-cast: dense_int8 rounds its f32
    output to the compute dtype, then ops/common upcasts to f32 inside
    the activation (gelu / quick_gelu)."""
    h = h32.astype(compute_dtype)
    hf = h.astype(jnp.float32)
    if mode == "quick":      # CLIP: x * sigmoid(1.702 x)
        return h * jax.nn.sigmoid(1.702 * hf).astype(compute_dtype)
    approx = mode == "tanh"
    return jax.nn.gelu(hf, approximate=approx).astype(compute_dtype)


def _ffn_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                o_ref, xq_ref, sx_ref, acc_ref, *, mode: str, n_chunks: int,
                compute_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xq, sx = _quantize_rows(x_ref[...].astype(jnp.float32))
        xq_ref[...] = xq
        sx_ref[...] = sx
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h_i32 = jax.lax.dot_general(
        xq_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    h32 = h_i32.astype(jnp.float32) * sx_ref[...] * s1_ref[...] + b1_ref[...]
    g = _act_f32(h32, compute_dtype, mode)
    gq, sg = _quantize_rows(g.astype(jnp.float32))
    y_i32 = jax.lax.dot_general(
        gq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_ref[...] += y_i32.astype(jnp.float32) * sg

    @pl.when(j == n_chunks - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s2_ref[...]
                      + b2_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("mode", "out_dtype", "interpret", "jc"))
def int8_ffn_pallas(x: jax.Array, w1q: jax.Array, s1: jax.Array,
                    b1: jax.Array, w2q: jax.Array, s2: jax.Array,
                    b2: jax.Array, *, mode: str = "tanh",
                    out_dtype=jnp.bfloat16, interpret: bool = False,
                    jc: Optional[int] = None) -> jax.Array:
    """Fused int8 FFN: quantize → int8 dot → dequant+bias → act →
    requant → int8 dot → f32 rescale, all within VMEM per row tile.
    `jc` pins the intermediate chunk width (tests use jc=N for the
    bit-exact single-chunk comparison against the XLA chain)."""
    orig_shape = x.shape
    K = orig_shape[-1]
    N = w1q.shape[1]
    K2 = w2q.shape[1]
    M = 1
    for s in orig_shape[:-1]:
        M *= s
    x2 = x.reshape(M, K)

    tm = min(_TM, _round_up(M, 32))
    Mp = _round_up(M, tm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    jc = jc or _pick(N, _JC, 128)
    n_chunks = N // jc

    comp = (pltpu.CompilerParams(
        vmem_limit_bytes=int(16 * 2 ** 20 * tm / 512))
        if tm > 512 else None)
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, mode=mode, n_chunks=n_chunks,
                          compute_dtype=x.dtype),
        compiler_params=comp,
        grid=(Mp // tm, n_chunks),
        in_specs=[
            pl.BlockSpec((tm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, jc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jc, K2), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, K2), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, K2), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tm, K), jnp.int8),
            pltpu.VMEM((tm, 1), jnp.float32),
            pltpu.VMEM((tm, K2), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * (K + K2),
            bytes_accessed=(Mp * (K + K2) * x.dtype.itemsize
                            + (Mp // tm) * N * (K + K2)),
            transcendentals=Mp * N,
        ),
        interpret=interpret,
    )(x2, w1q, s1.astype(jnp.float32).reshape(1, N),
      b1.astype(jnp.float32).reshape(1, N), w2q,
      s2.astype(jnp.float32).reshape(1, K2),
      b2.astype(jnp.float32).reshape(1, K2))
    if Mp != M:
        out = out[:M]
    return out.reshape(*orig_shape[:-1], K2)


def int8_ffn_xla(p_in: Dict, p_out: Dict, x: jax.Array,
                 policy: Policy, mode: str) -> jax.Array:
    """The XLA int8 FFN chain (dense_int8 → act → dense_int8) — the
    fallback on non-TPU backends / unaligned shapes, and the bit-exact
    single-chunk reference for the kernel's tests."""
    from misinfo_tpu.ops.common import gelu, quick_gelu
    from misinfo_tpu.ops.quant import dense_int8
    h = dense_int8(p_in, x, policy.compute)
    if mode == "quick":
        g = quick_gelu(h)
    else:
        g = jax.nn.gelu(h.astype(jnp.float32),
                        approximate=(mode == "tanh")).astype(policy.compute)
    return dense_int8(p_out, g, policy.compute)


def int8_ffn_apply(p_in: Dict, p_out: Dict, x: jax.Array, *,
                   policy: Policy = DEFAULT_POLICY,
                   mode: str = "tanh") -> jax.Array:
    """Tower FFN entry point for int8-quantized layers ({kernel_q,
    w_scale, bias}). Pallas kernel when enabled+aligned, XLA chain
    otherwise."""
    K, N = p_in["kernel_q"].shape
    K2 = p_out["kernel_q"].shape[1]
    if (ffn_kernel_enabled(policy) and _on_tpu()
            and K % 128 == 0 and N % 128 == 0 and K2 % 128 == 0):
        return int8_ffn_pallas(
            x.astype(policy.compute),
            p_in["kernel_q"], p_in["w_scale"], p_in["bias"],
            p_out["kernel_q"], p_out["w_scale"], p_out["bias"],
            mode=mode, out_dtype=policy.compute)
    return int8_ffn_xla(p_in, p_out, x, policy, mode)
