"""int4 vault storage: packed nibble rows + per-row scales + Pallas sims.

Doubles the articles-per-chip of the int8 capacity mode (vault/search.py
quantize_rows_int8) to 8× f32 — ~20M 512-d articles in a 16 GB HBM — for
the Truth Vault kNN the reference runs as host numpy over ~2,170 rows
(misinfo_forensics.py:443-464).

Design notes (TPU-first):

* **Per-row max scaling.** L2-normalized 512-d rows have elements of
  magnitude ~1/sqrt(512) ≈ 0.044. The int8 mode's fixed ±1 range is fine
  at 127 levels, but a fixed-range int4 grid (step 1/7 ≈ 0.143) would be
  3× coarser than the elements themselves. Scaling each row by
  ``max|row|/7`` (~0.15-0.2 for unit rows) keeps the grid matched to the
  row's actual range: measured cosine error ~1% RMS vs f32 (tests), on
  par with the documented int8 mode. The dot then needs one per-COLUMN
  rescale of the sims matrix — a broadcast multiply that fuses into the
  matmul epilogue.

* **Nibble packing.** Byte ``j`` of a packed row holds dimension ``j`` in
  its low nibble and dimension ``j + D/2`` in its high nibble (two's
  complement, values clipped to [-7, 7]). Unpacking is then two shifted
  copies concatenated on the feature axis — no interleave shuffle.

* **Pallas kernel.** XLA cannot keep a `convert(int4→wide)` fused into a
  dot's operand read — it would materialize the unpacked vault in HBM
  every call, forfeiting the bandwidth win. The kernel tiles the row axis,
  unpacks each packed tile in VMEM (VPU shifts), and feeds the nibbles to
  the MXU, so HBM traffic stays at the packed 0.5 byte/element. Two
  variants: bf16 operands (nibble values ≤ 7 are exactly representable —
  bit-matches the XLA path), and the default double-rate variant that
  also quantizes the query to int8 and runs int8×int8→int32 MXU dots
  (measured 2.23 vs 3.43 ms at 1M rows/b32; sim delta ≤ 2.2e-3). Below
  `_PALLAS_MIN_ROWS` (or off-TPU) a plain-XLA unpack+dot runs instead;
  all paths are equality/band-tested in interpret mode
  (tests/test_vault_int4.py).

Row-sharding composes: `vault_search_sharded` scores int4-packed shards
(per-shard scales ride the same row sharding), so >HBM vaults get ~25M
articles per chip per shard. IVF stays mutually exclusive (the probed
gather needs addressable unpacked rows; engine/forensics.py enforces it).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Row-tile for the Pallas kernel; also the row alignment the engine pads
# int4 vaults to (packed uint8 memory tiles are (32, 128); 2048 rows keep
# the per-step VMEM footprint ≈ 0.5 MB packed + 2×0.5 MB nibble planes).
INT4_TILE_ROWS = 2048
# Below this row count the plain-XLA path runs (kernel launch + padding
# overheads beat the bandwidth saving on small vaults).
_PALLAS_MIN_ROWS = 1 << 16

_QMAX = 7.0  # symmetric int4 grid [-7, 7]


class Int4Vault(NamedTuple):
    """Packed int4 embedding rows: ``packed[n, j]`` holds dim ``j`` (low
    nibble) and dim ``j + D/2`` (high nibble) of row ``n``; dequantized
    value = nibble · ``scale[n]``."""
    packed: np.ndarray   # [N, D//2] uint8
    scale: np.ndarray    # [N] f32 (0.0 for all-zero / padded rows)


def quantize_rows_int4(rows) -> Int4Vault:
    """Per-row symmetric int4 quantization of embedding rows (numpy, host
    side — runs once at vault prep). D must be even."""
    rows = np.asarray(rows, np.float32)
    n, d = rows.shape
    if d % 2:
        raise ValueError(f"int4 packing needs an even dim, got {d}")
    amax = np.abs(rows).max(axis=1)
    scale = (amax / _QMAX).astype(np.float32)          # 0.0 for zero rows
    safe = np.where(scale > 0, scale, 1.0)[:, None]
    q = np.clip(np.rint(rows / safe), -_QMAX, _QMAX).astype(np.int8)
    lo = q[:, : d // 2].astype(np.uint8) & 0xF
    hi = q[:, d // 2:].astype(np.uint8) & 0xF
    return Int4Vault(packed=(lo | (hi << 4)).astype(np.uint8), scale=scale)


def pad_int4_vault(v: Int4Vault, multiple: int = INT4_TILE_ROWS) -> Int4Vault:
    """Pad the row axis to a tile multiple (scale 0 ⇒ padded sims are 0;
    the engine pads ``row_valid`` alongside so they can never be top-k)."""
    n = v.packed.shape[0]
    pad = (-n) % multiple
    if not pad:
        return v
    return Int4Vault(
        packed=np.pad(v.packed, ((0, pad), (0, 0))),
        scale=np.pad(v.scale, (0, pad)))


def unpack_int4(packed: jax.Array) -> jax.Array:
    """[N, D/2] packed uint8 → [N, D] int32 nibble values in [-8, 7]
    (quantizer only emits [-7, 7]). ``(x ^ 8) - 8`` sign-extends a
    two's-complement nibble without a select."""
    p = packed.astype(jnp.int32)
    lo = ((p & 0xF) ^ 8) - 8
    hi = ((p >> 4) ^ 8) - 8
    return jnp.concatenate([lo, hi], axis=1)


def int4_sims_reference(query: jax.Array, packed: jax.Array,
                        scale: jax.Array) -> jax.Array:
    """Plain-XLA path: unpack + bf16 dot + per-column rescale. Correct on
    every backend; materializes the unpacked nibbles (fine on CPU/tests
    and small vaults, wasteful at capacity scale — the kernel's job)."""
    nib = unpack_int4(packed).astype(jnp.bfloat16)          # [N, D]
    s = jax.lax.dot_general(
        query.astype(jnp.bfloat16), nib, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [B, N]
    return s * scale[None, :].astype(jnp.float32)


def _int4_sims_kernel(q_ref, p_ref, s_ref, o_ref):
    p = p_ref[...].astype(jnp.int32)                         # [TN, D/2]
    lo = (((p & 0xF) ^ 8) - 8).astype(jnp.bfloat16)          # dims [0, D/2)
    hi = (((p >> 4) ^ 8) - 8).astype(jnp.bfloat16)           # dims [D/2, D)
    q = q_ref[...]                                           # [B, D] bf16
    d2 = lo.shape[1]
    acc = jax.lax.dot_general(q[:, :d2], lo, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(q[:, d2:], hi, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    o_ref[...] = acc * s_ref[...]                            # s_ref [1, TN]


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_sims_pallas(query: jax.Array, packed: jax.Array, scale: jax.Array,
                     *, interpret: bool = False) -> jax.Array:
    """Pallas TPU kernel: [B,D]·int4[N,D]ᵀ·diag(scale) with the packed
    rows streamed straight from HBM. Requires N % INT4_TILE_ROWS == 0
    (the engine pads at vault prep; `pad_int4_vault`)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D = query.shape
    N, D2 = packed.shape
    if D2 * 2 != D:
        raise ValueError(f"packed dim {D2} doesn't match query dim {D}")
    if N % INT4_TILE_ROWS:
        raise ValueError(f"int4 kernel needs rows % {INT4_TILE_ROWS} == 0 "
                         f"(got {N}); pad with pad_int4_vault")
    tn = INT4_TILE_ROWS
    return pl.pallas_call(
        _int4_sims_kernel,
        grid=(N // tn,),
        in_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, D2), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * N,
            bytes_accessed=N * D2 + B * D * 2 + B * N * 4 + N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(query.astype(jnp.bfloat16), packed,
      scale.astype(jnp.float32).reshape(1, N))


def _int4_sims_kernel_i8(q_ref, p_ref, s_ref, qs_ref, o_ref):
    """Double-rate variant: int8-lane unpack + int8×int8→int32 MXU dots.

    The bf16 kernel is compute-bound per tile at serving batch sizes
    (B ≤ 64 underfills the MXU's 128 rows); quantizing the query rows to
    int8 (per-row max scales, the int8 storage mode's own discipline)
    halves the MXU cycles. Unpack arithmetic stays in int32 lanes —
    Mosaic (v5e) cannot legalize int8-lane subi — with a final int32→int8
    cast feeding the dot."""
    p = p_ref[...].astype(jnp.int32)                         # [TN, D/2]
    lo = (((p & 0xF) ^ 8) - 8).astype(jnp.int8)
    hi = (((p >> 4) ^ 8) - 8).astype(jnp.int8)
    q = q_ref[...]                                           # [B, D] int8
    d2 = lo.shape[1]
    acc = jax.lax.dot_general(q[:, :d2], lo, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    acc = acc + jax.lax.dot_general(q[:, d2:], hi, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
    o_ref[...] = (acc.astype(jnp.float32) * s_ref[...]       # s_ref [1, TN]
                  * qs_ref[...])                             # qs_ref [B, 1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_sims_pallas_i8(query: jax.Array, packed: jax.Array,
                        scale: jax.Array, *,
                        interpret: bool = False) -> jax.Array:
    """Double-rate int8-MXU int4 sims: the query is quantized per-row to
    int8 inside the program (adds the int8 mode's ~0.5% query error on
    top of the rows' int4 grid). Same tiling contract as
    `int4_sims_pallas`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D = query.shape
    N, D2 = packed.shape
    if D2 * 2 != D:
        raise ValueError(f"packed dim {D2} doesn't match query dim {D}")
    if N % INT4_TILE_ROWS:
        raise ValueError(f"int4 kernel needs rows % {INT4_TILE_ROWS} == 0 "
                         f"(got {N}); pad with pad_int4_vault")
    q = query.astype(jnp.float32)
    qmax = jnp.maximum(jnp.abs(q).max(axis=1, keepdims=True), 1e-12)
    qi8 = jnp.clip(jnp.round(q * (127.0 / qmax)), -127, 127).astype(jnp.int8)
    tn = INT4_TILE_ROWS
    return pl.pallas_call(
        _int4_sims_kernel_i8,
        grid=(N // tn,),
        in_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, D2), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * D * N,
            bytes_accessed=N * D2 + B * D + B * N * 4 + N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qi8, packed, scale.astype(jnp.float32).reshape(1, N),
      qmax / 127.0)


def int4_vault_sims(query: jax.Array, packed: jax.Array,
                    scale: jax.Array) -> jax.Array:
    """Dispatch: Pallas kernel on TPU at capacity scale, plain XLA
    otherwise. The double-rate int8-MXU variant is the TPU default
    (same-session A/B at 1M rows/b32: 2.23 ms vs the bf16 kernel's
    3.43 ms, max sim delta 2.2e-3 — noise against the 0.85 gate).
    `MISINFO_TPU_INT4_PALLAS`: `i8`/`1` force the kernel variants,
    `bf16` the exact-query kernel, `0` the plain-XLA path."""
    env = os.getenv("MISINFO_TPU_INT4_PALLAS", "auto")
    n = packed.shape[0]
    on_tpu = jax.devices()[0].platform == "tpu"
    # forced kernels off-TPU run interpreted (Mosaic only lowers on TPU —
    # keeps the env var usable for numerics checks on the CPU backend)
    interp = not on_tpu
    if env in ("i8", "1", "on", "true") or (
            env == "auto" and on_tpu
            and n >= _PALLAS_MIN_ROWS and n % INT4_TILE_ROWS == 0):
        return int4_sims_pallas_i8(query, packed, scale, interpret=interp)
    if env == "bf16":
        return int4_sims_pallas(query, packed, scale, interpret=interp)
    return int4_sims_reference(query, packed, scale)
