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
  the MXU as bf16 (nibble values are integers ≤ 7 — exactly
  representable), so HBM traffic stays at the packed 0.5 byte/element.
  Below `_PALLAS_MIN_ROWS` (or off-TPU) a plain-XLA unpack+dot runs
  instead; both paths share the same cast discipline and agree to
  float-noise (tests/test_vault_int4.py, interpret mode).

Row-sharded (>HBM) vaults keep f32/bf16/int8 storage — int4 is a
single-chip capacity mode, mutually exclusive with IVF and row-sharding
(engine/forensics.py enforces this at vault prep).
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


def int4_vault_sims(query: jax.Array, packed: jax.Array,
                    scale: jax.Array) -> jax.Array:
    """Dispatch: Pallas kernel on TPU at capacity scale, plain XLA
    otherwise. `MISINFO_TPU_INT4_PALLAS` = 1/0 forces a side."""
    env = os.getenv("MISINFO_TPU_INT4_PALLAS", "auto")
    n = packed.shape[0]
    if env in ("1", "on", "true"):
        use = True
    elif env in ("0", "off", "false"):
        use = False
    else:
        use = (jax.devices()[0].platform == "tpu"
               and n >= _PALLAS_MIN_ROWS and n % INT4_TILE_ROWS == 0)
    if use:
        return int4_sims_pallas(query, packed, scale)
    return int4_sims_reference(query, packed, scale)
