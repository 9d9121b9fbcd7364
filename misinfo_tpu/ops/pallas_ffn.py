"""Pallas TPU fused transformer FFN: dense → GELU → dense in one kernel.

The RoBERTa-512 FFNs are ~60% of the full-modality program's FLOPs and
profile at ~42% MXU under XLA (docs/PERF.md): the [M, 3072] GELU
intermediate round-trips to HBM between the two dots, and the GELU VPU
pass serializes against the MXU inside XLA's fusion. This kernel tiles the
row axis and the intermediate axis so the activation chunk lives entirely
in VMEM: for each (row-tile i, chunk j) it computes
``h_j = act(x_i @ W1[:, j] + b1[j])`` and accumulates ``h_j @ W2[j, :]``
into an f32 scratch, writing the output row-tile once on the last chunk.

Numerics mirror the XLA path (ops/common.dense + gelu) cast-for-cast:
f32 accumulation, intermediate rounded to the compute dtype before and
after the activation — so enabling the kernel changes scores by at most
the usual bf16 serving noise (tests/test_pallas_kernels.py checks exact
agreement in f32 and ≤2e-2 logit agreement in bf16, interpret mode).

Enabled per-call via ``use_pallas="ffn"`` on the towers (models/roberta.py,
models/clip.py) and `BENCH_PALLAS=ffn` in bench.py. Replaces the
reference's torch Linear/GELU stacks (misinfo_forensics.py:53-90 via HF
RobertaModel/CLIPModel internals); activation modes: "erf"/"tanh" GELU
(RoBERTa, PrecisionConfig.gelu_mode) and "quick" (CLIP's quick_gelu).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from misinfo_tpu.ops.common import DEFAULT_POLICY, Policy

# Row tile / intermediate chunk targets. TM=1024 rows keeps the weight
# re-streaming small (M/TM fetches of W1+W2 per layer: 16 × 9.4 MB at the
# serving shape) while the per-step VMEM footprint stays ≈13 MB:
# x 1.5 MB + W1/W2 chunks 2×(0.75×2buf) + acc(f32) 3 MB + h chunk 3 MB.
_TM = 1024
_JC = 512


def _act(h32: jax.Array, compute_dtype, mode: str) -> jax.Array:
    """Activation on the f32 pre-activation, mirroring ops/common.py:
    the XLA path rounds the dense output to the compute dtype first, then
    upcasts to f32 inside the activation."""
    h = h32.astype(compute_dtype)
    hf = h.astype(jnp.float32)
    if mode == "quick":      # CLIP: x * sigmoid(1.702 x)
        g = h * jax.nn.sigmoid(1.702 * hf).astype(compute_dtype)
        return g
    approx = mode == "tanh"
    return jax.nn.gelu(hf, approximate=approx).astype(compute_dtype)


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref, *,
                mode: str, n_chunks: int, precision):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h32 = jax.lax.dot_general(
        x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision) + b1_ref[...]
    g = _act(h32, x_ref.dtype, mode)
    acc_ref[...] += jax.lax.dot_general(
        g, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)

    @pl.when(j == n_chunks - 1)
    def _():
        o_ref[...] = (acc_ref[...] + b2_ref[...]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick(total: int, target: int, align: int) -> int:
    """Largest divisor of `total` that is ≤ target and a multiple of
    `align`, else `total` (small/test shapes run as one block)."""
    for c in range(min(target, total), align - 1, -align):
        if total % c == 0 and c % align == 0:
            return c
    return total


@functools.partial(jax.jit, static_argnames=("mode", "precision"))
def fused_ffn(x: jax.Array, w1: jax.Array, b1: jax.Array,
              w2: jax.Array, b2: jax.Array, *, mode: str = "tanh",
              precision=None) -> jax.Array:
    """x [..., K] @ w1 [K, N] (+b1) → act → @ w2 [N, K2] (+b2) → [..., K2].

    All operands should already be in the compute dtype; `precision` must
    carry the policy's contraction precision (HIGHEST in f32 parity mode —
    the MXU's default f32 math is bf16-pass, CLAUDE.md). The `ffn_apply`
    wrapper handles both."""
    orig_shape = x.shape
    K = orig_shape[-1]
    N = w1.shape[1]
    K2 = w2.shape[1]
    M = 1
    for s in orig_shape[:-1]:
        M *= s
    x2 = x.reshape(M, K)

    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    # row tile: sublane-aligned, capped at _TM; pad the row axis up to a
    # tile multiple (padded rows compute act(b1)·W2 garbage, sliced off)
    tm = min(_TM, _round_up(M, sublane))
    Mp = _round_up(M, tm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    jc = _pick(N, _JC, 128)
    n_chunks = N // jc

    out = pl.pallas_call(
        functools.partial(_ffn_kernel, mode=mode, n_chunks=n_chunks,
                          precision=precision),
        grid=(Mp // tm, n_chunks),
        in_specs=[
            pl.BlockSpec((tm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, jc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, jc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((jc, K2), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, K2), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, K2), x.dtype),
        scratch_shapes=[pltpu.VMEM((tm, K2), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * (K + K2),
            bytes_accessed=(Mp * (K + K2) * x.dtype.itemsize
                            + (Mp // tm) * N * (K + K2) * w1.dtype.itemsize),
            transcendentals=Mp * N,
        ),
    )(x2, w1, b1.reshape(1, N), w2, b2.reshape(1, K2))
    if Mp != M:
        out = out[:M]
    return out.reshape(*orig_shape[:-1], K2)


def ffn_apply(p_in: Dict, p_out: Dict, x: jax.Array, *,
              policy: Policy = DEFAULT_POLICY, mode: str = "tanh") -> jax.Array:
    """Policy-aware wrapper over `fused_ffn` for a {kernel, bias} param pair
    (same contract as gelu(dense(p_in, x)) → dense(p_out, ·))."""
    return fused_ffn(
        x.astype(policy.compute),
        p_in["kernel"].astype(policy.compute),
        p_in["bias"].astype(jnp.float32),
        p_out["kernel"].astype(policy.compute),
        p_out["bias"].astype(jnp.float32),
        mode=mode, precision=policy.precision)
