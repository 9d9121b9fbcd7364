"""On-device vault kNN — one matmul + top-k inside the signal program.

Replaces the reference's host-side numpy brute force (misinfo_forensics.py:
443-449, which also re-normalized the whole vault per query) with a single
MXU matmul over the pre-normalized vault and `jax.lax.top_k`. Thresholding
matches the reference exactly: ``vault_discrepancy = max_sim if
max_sim > 0.85 else 0.0`` (:462-464), and the conditional caption-vs-headline
text similarity (:468-484) becomes a gather over precomputed title text
embeddings.

For vaults that outgrow one chip's HBM, `sharded_vault_sims` row-shards the
matmul over the `data` mesh axis and all-gathers per-shard top-k candidates
(SURVEY.md §2.5 consequence (c)).
"""

from __future__ import annotations

import os
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


# above this row count, route top-k through the two-stage chunked form
CHUNKED_TOPK_MIN_ROWS = 1 << 16
_CHUNK = 1024  # lane-aligned chunk width for stage 1

# Top-k implementation for large vaults: "auto" (default — iterative
# above CHUNKED_TOPK_MIN_ROWS, lax.top_k below), "iterative" (k passes of
# max+mask, sort-free, exact), "chunked" (two-stage exact), "mono" (one
# lax.top_k — a giant per-row sort), "approx" (TPU ApproxTopK custom call
# at recall_target=1.0 — exact per the XLA contract; CPU falls back to
# sort). Program-level at 1M rows (tools/bench_topk.py + BENCH_VAULT):
# iterative 40.5 ms/batch, chunked 56.1, approx 92.3, mono 99.4 — the
# masked re-max passes fuse with the sims buffer where sorts cannot.
TOPK_MODE = os.environ.get("MISINFO_TPU_TOPK", "auto")


def topk_chunked(sims: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact two-stage top-k over the last axis: per-chunk top-k (many
    short parallel sorts) then re-top-k over the n_chunks·k candidates.
    XLA lowers a monolithic `lax.top_k` over N≈1M columns to one huge
    per-row sort; chunking the same work is dramatically faster and is
    exact (any global top-k element is a top-k element of its chunk)."""
    B, N = sims.shape
    pad = (-N) % _CHUNK
    if pad:
        # -2.0 sits below any cosine similarity, matching the invalid-row fill
        sims = jnp.pad(sims, ((0, 0), (0, pad)), constant_values=-2.0)
    n_chunks = sims.shape[1] // _CHUNK
    s = sims.reshape(B, n_chunks, _CHUNK)
    loc_sims, loc_idx = jax.lax.top_k(s, k)                    # [B, nC, k]
    loc_idx = loc_idx + (jnp.arange(n_chunks) * _CHUNK)[None, :, None]
    top_s, pos = jax.lax.top_k(loc_sims.reshape(B, n_chunks * k), k)
    top_i = jnp.take_along_axis(loc_idx.reshape(B, n_chunks * k), pos, axis=1)
    return top_s, top_i


def topk_iterative(sims: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact sort-free top-k: k passes of (argmax → record → mask). Costs
    k reads + k writes of the sims matrix instead of a per-row sort; ties
    resolve to the lowest index, matching lax.top_k."""
    B, N = sims.shape
    col = jnp.arange(N)[None, :]
    vals, idxs = [], []
    cur = sims
    for _ in range(k):
        i = jnp.argmax(cur, axis=1)                          # [B]
        vals.append(jnp.max(cur, axis=1))
        idxs.append(i.astype(jnp.int32))
        cur = jnp.where(col == i[:, None], -jnp.inf, cur)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)


def topk_approx(sims: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """TPU ApproxTopK custom call. recall_target=1.0 requests exact results
    (XLA sizes the partial reduce for full recall); other backends fall back
    to a sort-based implementation."""
    vals, idx = jax.lax.approx_max_k(sims, k, recall_target=1.0)
    return vals, idx.astype(jnp.int32)


def _topk(sims: jax.Array, k: int,
          mode: Optional[str] = None) -> Tuple[jax.Array, jax.Array]:
    mode = mode or TOPK_MODE
    if mode == "auto":
        mode = ("iterative" if sims.shape[1] >= CHUNKED_TOPK_MIN_ROWS
                else "mono")
    if mode == "iterative":
        return topk_iterative(sims, k)
    if mode == "approx":
        return topk_approx(sims, k)
    if mode == "chunked" and sims.shape[1] >= CHUNKED_TOPK_MIN_ROWS:
        return topk_chunked(sims, k)
    return jax.lax.top_k(sims, k)


class VaultResult(NamedTuple):
    top_sims: jax.Array          # [B, K] f32
    top_idx: jax.Array           # [B, K] int32
    vault_discrepancy: jax.Array  # [B] f32
    text_similarity: jax.Array   # [B] f32


_INT8_SCALE = 127.0  # rows are L2-normalized → every element is in [-1, 1]


def quantize_rows_int8(rows) -> "jax.Array":
    """Symmetric per-tensor int8 quantization of L2-normalized embedding
    rows (|element| ≤ 1 → scale 127). 4× the articles per chip vs f32;
    cosine error ~0.5% RMS — see ServingConfig.vault_dtype."""
    import numpy as np
    return np.clip(np.round(np.asarray(rows, np.float32) * _INT8_SCALE),
                   -127, 127).astype(np.int8)


def _dequant(rows: jax.Array) -> jax.Array:
    if rows.dtype == jnp.int8:
        return rows.astype(jnp.float32) * (1.0 / _INT8_SCALE)
    return rows.astype(jnp.float32)


def vault_sims(query: jax.Array, vault_emb: jax.Array,
               row_scale: Optional[jax.Array] = None) -> jax.Array:
    """[B,D]×[N,D]ᵀ cosine sims, dtype-polymorphic over the vault storage:

    * f32 rows (default): `Precision.HIGHEST` — exact, the 0.85 gate
      depends on it (misinfo_forensics.py:462-464)
    * bf16 rows: MXU-native bf16×bf16→f32 at half the HBM read
    * int8 rows: query quantized to int8 too; int8×int8→int32 rides the
      MXU's double-rate path, rescaled to f32 sims (~0.5-1% error —
      capacity mode, documented in docs/SCALING.md)
    * packed int4 rows (uint8 storage + per-row scales): pass ``row_scale``
      — vault/int4.py unpacks nibbles in VMEM via a Pallas kernel so HBM
      reads stay at 0.5 byte/element (8× f32 capacity, ~1% sim error)
    """
    if row_scale is not None:
        from misinfo_tpu.vault.int4 import int4_vault_sims
        return int4_vault_sims(query, vault_emb, row_scale)
    if vault_emb.dtype == jnp.int8:
        q = jnp.clip(jnp.round(query.astype(jnp.float32) * _INT8_SCALE),
                     -127, 127).astype(jnp.int8)
        s = jax.lax.dot_general(
            q, vault_emb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return s.astype(jnp.float32) * (1.0 / (_INT8_SCALE * _INT8_SCALE))
    if vault_emb.dtype == jnp.bfloat16:
        return jnp.dot(query.astype(jnp.bfloat16), vault_emb.T,
                       preferred_element_type=jnp.float32)
    return jnp.dot(query, vault_emb.T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def vault_search(
    query_image_emb: jax.Array,   # [B, D] L2-normalized f32
    vault_emb: jax.Array,         # [N, D] L2-normalized, zero rows padded
    row_valid: jax.Array,         # [N] bool
    *,
    top_k: int = 5,
    reuse_threshold: float = 0.85,
    caption_text_emb: Optional[jax.Array] = None,  # [B, D] normalized
    vault_text_emb: Optional[jax.Array] = None,    # [N, D] normalized
    has_caption: Optional[jax.Array] = None,       # [B] bool
    ivf: Optional[Dict[str, jax.Array]] = None,    # ivf.py device arrays
    nprobe: int = 8,
    vault_scale: Optional[jax.Array] = None,       # [N] f32 → int4 mode
    vault_text_scale: Optional[jax.Array] = None,  # [N] f32 → int4 titles
) -> VaultResult:
    """Batched vault search; everything stays on device.

    With ``ivf`` (vault/ivf.py arrays), only the probed clusters' rows are
    scored — sub-linear in vault size, exact when the true neighbor's
    cluster is probed. Default is the exact full matmul. ``vault_scale``
    marks ``vault_emb`` as packed-int4 rows (vault/int4.py) and
    ``vault_text_scale`` likewise marks ``vault_text_emb``; int4 is
    mutually exclusive with IVF."""
    if ivf is not None and vault_scale is not None:
        raise ValueError("int4 vault storage and IVF are mutually "
                         "exclusive (engine enforces this at vault prep)")
    if ivf is not None:
        from misinfo_tpu.vault.ivf import ivf_topk
        top_sims, top_idx = ivf_topk(
            query_image_emb, vault_emb, row_valid,
            ivf["ivf_centroids"], ivf["ivf_lists"], ivf["ivf_spill"],
            top_k=top_k, nprobe=nprobe, emb16=ivf.get("ivf_emb16"))
    else:
        # f32 storage (default) computes at HIGHEST — a bf16-pass dot's
        # ~4e-3 error could flip the 0.85 reuse gate; bf16/int8 storage
        # (ServingConfig.vault_dtype capacity modes) trade that exactness
        # for 2×/4× more articles per chip
        sims = vault_sims(query_image_emb, vault_emb,
                          row_scale=vault_scale)              # [B, N]
        sims = jnp.where(row_valid[None, :], sims, -2.0)
        top_sims, top_idx = _topk(sims, top_k)

    return _gate_and_text(top_sims, top_idx, reuse_threshold,
                          caption_text_emb, vault_text_emb, has_caption,
                          vault_text_scale=vault_text_scale)


def _gate_and_text(top_sims, top_idx, reuse_threshold,
                   caption_text_emb=None, vault_text_emb=None,
                   has_caption=None, vault_text_scale=None) -> VaultResult:
    """Shared tail of every search flavor: the exact 0.85 reuse gate
    (reference misinfo_forensics.py:462-464) + the conditional
    caption-vs-headline text similarity (:468-484)."""
    max_sim = top_sims[:, 0]
    gate = max_sim > reuse_threshold
    vault_discrepancy = jnp.where(gate, max_sim, 0.0)

    if caption_text_emb is not None and vault_text_emb is not None:
        if vault_text_scale is not None:
            # int4-packed titles: gather only the B matched packed rows,
            # unpack inline (tiny — the capacity win is the [N, D/2]
            # storage plane, vault/int4.py)
            from misinfo_tpu.vault.int4 import unpack_int4
            matched_title_emb = (
                unpack_int4(vault_text_emb[top_idx[:, 0]]).astype(jnp.float32)
                * vault_text_scale[top_idx[:, 0]][:, None])
        else:
            matched_title_emb = _dequant(vault_text_emb[top_idx[:, 0]])
        tsim = jnp.sum(caption_text_emb * matched_title_emb, axis=-1)
        if has_caption is not None:
            gate = jnp.logical_and(gate, has_caption)
        text_similarity = jnp.where(gate, tsim, 0.0)
    else:
        text_similarity = jnp.zeros_like(max_sim)

    return VaultResult(top_sims, top_idx.astype(jnp.int32),
                       vault_discrepancy, text_similarity)


def vault_search_sharded(
    query_image_emb: jax.Array,   # [B, D] (batch-sharded on `axis` or not)
    vault_emb: jax.Array,         # [N, D] row-SHARDED on `axis`
    row_valid: jax.Array,         # [N] row-sharded
    *,
    mesh,
    top_k: int = 5,
    reuse_threshold: float = 0.85,
    caption_text_emb: Optional[jax.Array] = None,
    vault_text_emb: Optional[jax.Array] = None,  # row-sharded like vault_emb
    has_caption: Optional[jax.Array] = None,
    axis_name: str = "data",
    vault_scale: Optional[jax.Array] = None,       # [N] → int4-packed rows
    vault_text_scale: Optional[jax.Array] = None,  # [N] → int4 titles
) -> VaultResult:
    """The engine's >HBM vault path: the vault lives ROW-SHARDED across the
    mesh's data axis, each device scores the full query batch against its
    row shard and contributes only K candidates, and the final top-k merges
    O(K·devices) values instead of moving the N-row sims matrix
    (SURVEY.md §2.5 consequence (c); wired into signals_program when
    vault rows ≥ ServingConfig.vault_shard_min_rows).

    Runs as a `shard_map` region inside the jitted signal program; queries
    are all-gathered (B×D — tiny next to the vault), candidate merge rides
    ICI. Results are bitwise-identical to the exact replicated search for
    tie-free sims. Gating/text-sim tail is shared with `vault_search`.
    """
    from jax.sharding import PartitionSpec as P

    def body(q, v, valid, *scale):
        q = jax.lax.all_gather(q, axis_name, axis=0, tiled=True)     # [B, D]
        sims = vault_sims(q, v,                                      # [B, N/d]
                          row_scale=scale[0] if scale else None)
        sims = jnp.where(valid[None, :], sims, -2.0)
        k_local = min(top_k, v.shape[0])
        loc_s, loc_i = jax.lax.top_k(sims, k_local)
        loc_i = (loc_i + jax.lax.axis_index(axis_name) * v.shape[0]
                 ).astype(jnp.int32)
        all_s = jax.lax.all_gather(loc_s, axis_name, axis=1, tiled=True)
        all_i = jax.lax.all_gather(loc_i, axis_name, axis=1, tiled=True)
        top_s, pos = jax.lax.top_k(all_s, top_k)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        return top_s, top_i

    operands = [query_image_emb, vault_emb, row_valid]
    in_specs = [P(axis_name, None), P(axis_name, None), P(axis_name)]
    if vault_scale is not None:   # int4-packed shards (vault/int4.py)
        operands.append(vault_scale)
        in_specs.append(P(axis_name))
    sm_kw = dict(mesh=mesh, in_specs=tuple(in_specs),
                 out_specs=(P(None, None), P(None, None)))
    try:
        mapped = jax.shard_map(body, check_vma=False, **sm_kw)  # JAX ≥ 0.8
    except (AttributeError, TypeError):  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sm
        mapped = _sm(body, check_rep=False, **sm_kw)
    top_sims, top_idx = mapped(*operands)
    # text-sim gather runs at the GSPMD level: B indices into the
    # row-sharded title embeddings — a tiny cross-shard gather
    return _gate_and_text(top_sims, top_idx, reuse_threshold,
                          caption_text_emb, vault_text_emb, has_caption,
                          vault_text_scale=vault_text_scale)


def sharded_vault_sims(query: jax.Array, vault_shard: jax.Array,
                       shard_offset: jax.Array, row_valid_shard: jax.Array,
                       top_k: int, axis_name: str = "data"):
    """shard_map body: local matmul + local top-k, then all-gather the
    per-shard candidates and re-top-k — O(K·devices) gathered instead of N."""
    sims = vault_sims(query, vault_shard)
    sims = jnp.where(row_valid_shard[None, :], sims, -2.0)
    loc_sims, loc_idx = jax.lax.top_k(sims, top_k)
    loc_idx = loc_idx + shard_offset
    all_sims = jax.lax.all_gather(loc_sims, axis_name, axis=1)  # [B, S, K]
    all_idx = jax.lax.all_gather(loc_idx, axis_name, axis=1)
    B = all_sims.shape[0]
    flat_sims = all_sims.reshape(B, -1)
    flat_idx = all_idx.reshape(B, -1)
    top_sims, pos = jax.lax.top_k(flat_sims, top_k)
    top_idx = jnp.take_along_axis(flat_idx, pos, axis=1)
    return top_sims, top_idx
