"""IVF (inverted-file) index for production-scale Truth Vaults.

The exact kNN path (vault/search.py) reads every vault row per query batch
— one [B,512]×[512,N] matmul. That is the right call at the reference's
2,170 articles (misinfo_forensics.py:443-449) and stays cheap to ~1M rows,
but the read scales linearly with N (≈2 GB at 1M rows f32). This module
adds the standard sub-linear alternative, built TPU-first:

  * **build**: spherical k-means over the normalized vault embeddings —
    assignment runs as chunked on-device matmuls (MXU), centroid updates
    as `segment_sum`; cluster membership is materialized as a dense,
    lane-padded [C, L] row-id table plus a spill list for rows past the
    per-cluster cap, so every row lives in exactly one probe-able slot
    (no duplicates, nothing silently dropped).
  * **search**: runs INSIDE the fused signal program — query×centroid
    matmul → `top_k` probe selection → gather of the probed clusters'
    rows → exact f32 similarities on the gathered candidates. Per-batch
    HBM traffic is O(B · nprobe · L · D) instead of O(N · D).

Accuracy contract: results are exact whenever the true neighbor's cluster
is probed; with `nprobe == n_clusters` the search provably equals brute
force (asserted in tests/test_vault.py). The vault's 0.85 reuse gate
(misinfo_forensics.py:462-464) targets near-duplicates, whose cluster is
the query's top centroid almost surely — the regime where IVF recall is
strongest. Opt-in via `ServingConfig.vault_ivf` / `MISINFO_TPU_VAULT_IVF=1`
(`MISINFO_TPU_IVF_NPROBE` tunes recall↔speed); exact search stays the
default.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 128
_SUB = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class IVFIndex(NamedTuple):
    """Host-side index arrays (device transfer happens in the engine)."""

    centroids: np.ndarray   # [C, D] f32, L2-normalized
    lists: np.ndarray       # [C, L] int32 vault row ids, -1 = empty slot
    spill: np.ndarray       # [S] int32 rows past their cluster's cap (always probed)
    nprobe: int             # default probe count chosen at build time
    n_rows: int             # padded vault row count the index was built for
    digest: str             # sha1 of the valid embedding rows (staleness check)

    @property
    def n_clusters(self) -> int:
        return self.centroids.shape[0]

    def device_arrays(self) -> Dict[str, jax.Array]:
        """Keys the engine merges into program batches (prefix `ivf_`)."""
        return {
            "ivf_centroids": jnp.asarray(self.centroids),
            "ivf_lists": jnp.asarray(self.lists),
            "ivf_spill": jnp.asarray(self.spill),
        }

    # ------------------------------------------------------------- I/O

    def save(self, path: str) -> None:
        np.savez(path, centroids=self.centroids, lists=self.lists,
                 spill=self.spill, nprobe=np.int32(self.nprobe),
                 n_rows=np.int32(self.n_rows), digest=self.digest)

    @classmethod
    def load(cls, path: str) -> Optional["IVFIndex"]:
        try:
            data = np.load(path)
            return cls(data["centroids"], data["lists"], data["spill"],
                       int(data["nprobe"]), int(data["n_rows"]),
                       str(data["digest"]))
        except Exception:
            return None


def vault_digest(embeddings: np.ndarray, row_valid: np.ndarray) -> str:
    """Content digest of the valid rows — detects vault edits that keep the
    same padded shape (appends within a 128-row pad bucket, in-place row
    changes). ~0.5 GB/s, run once per engine start; far cheaper than a
    silently stale index or an unconditional k-means rebuild."""
    import hashlib

    h = hashlib.sha1()
    h.update(np.asarray(embeddings, np.float32)[np.asarray(row_valid)].tobytes())
    return h.hexdigest()


@functools.partial(jax.jit, static_argnames=("n_clusters",))
def _kmeans_stats(v3: jax.Array, valid3: jax.Array, centroids: jax.Array,
                  n_clusters: int):
    """One full Lloyd pass on device: scan over row chunks, accumulate
    per-cluster sums/counts. Only the [C, D] stats leave the device —
    per-chunk host round-trips would dominate on remote-attached TPUs."""

    def body(carry, xs):
        sums, counts = carry
        rows, ok = xs
        # rows arrive bf16 (halves the device-resident copy — at 4M×512
        # an f32 copy alone is 8 GB). bf16 sims can flip the argmax for
        # rows whose top-2 centroids sit within bf16 noise (~4e-3);
        # query-time probing at nprobe≥2 covers such boundary rows, since
        # both contending centroids then rank inside the probe set.
        # Means accumulate in f32.
        sims = jnp.dot(rows, centroids.astype(rows.dtype).T,
                       preferred_element_type=jnp.float32)
        a = jnp.argmax(sims, axis=1)
        a = jnp.where(ok, a, n_clusters)         # pad rows → dropped segment
        sums += jax.ops.segment_sum(rows.astype(jnp.float32), a,
                                    num_segments=n_clusters + 1)[:-1]
        counts += jax.ops.segment_sum(ok.astype(jnp.float32), a,
                                      num_segments=n_clusters + 1)[:-1]
        return (sums, counts), None

    init = (jnp.zeros((n_clusters, v3.shape[-1]), jnp.float32),
            jnp.zeros((n_clusters,), jnp.float32))
    (sums, counts), _ = jax.lax.scan(body, init, (v3, valid3))
    return sums, counts


@jax.jit
def _kmeans_assign(v3: jax.Array, centroids: jax.Array) -> jax.Array:
    """Final assignment pass against the FINAL centroids (lists must agree
    with the centroids the query-time probe ranks)."""

    def body(_, rows):
        sims = jnp.dot(rows, centroids.astype(rows.dtype).T,
                       preferred_element_type=jnp.float32)
        return None, jnp.argmax(sims, axis=1).astype(jnp.int32)

    _, assigns = jax.lax.scan(body, None, v3)
    return assigns


def build_ivf(
    embeddings: np.ndarray,      # [N, D] L2-normalized (pad rows are zero)
    row_valid: np.ndarray,       # [N] bool
    *,
    n_clusters: Optional[int] = None,
    iters: int = 8,
    cap_factor: float = 2.0,
    nprobe: Optional[int] = None,
    seed: int = 0,
    chunk_rows: int = 16384,
) -> IVFIndex:
    """Spherical k-means + dense list table. Offline; assignment matmuls
    run on the default JAX backend (MXU on TPU, CPU in tests)."""
    emb = np.asarray(embeddings, np.float32)
    valid_idx = np.flatnonzero(np.asarray(row_valid))
    n_valid = len(valid_idx)
    if n_valid == 0:
        raise ValueError("cannot build an IVF index over an empty vault "
                         "(no valid rows); callers should fall back to "
                         "exact search")
    if n_clusters is None:
        # ≈4·√N keeps lists ~√N/4 long; lane-align for the centroid matmul
        n_clusters = max(_LANE, _round_up(int(4 * np.sqrt(max(n_valid, 1))),
                                          _LANE))
    n_clusters = min(n_clusters, max(_SUB, _round_up(n_valid, _SUB)))
    rng = np.random.default_rng(seed)
    init = valid_idx[rng.choice(n_valid, size=min(n_clusters, n_valid),
                                replace=False)]
    centroids = emb[init]
    if len(init) < n_clusters:  # tiny vaults: duplicate-pad the centroid set
        reps = rng.choice(len(init), size=n_clusters - len(init))
        centroids = np.concatenate([centroids, centroids[reps]], axis=0)

    # ship the valid rows to the device ONCE as bf16 [T, chunk, D]; all
    # Lloyd passes scan device-side and return only [C, D] stats per
    # iteration (assignment is an argmax — bf16 sims don't change it
    # outside exact ties, and the final search uses the real vault rows)
    chunk = min(chunk_rows, _round_up(n_valid, _SUB))
    n_pad = _round_up(n_valid, chunk)
    v_np = np.zeros((n_pad, emb.shape[1]), np.float32)
    v_np[:n_valid] = emb[valid_idx]
    v3 = jnp.asarray(v_np.reshape(-1, chunk, emb.shape[1]), jnp.bfloat16)
    valid3 = jnp.asarray(
        (np.arange(n_pad) < n_valid).reshape(-1, chunk))
    for _ in range(max(iters, 1)):
        sums, counts = jax.tree_util.tree_map(
            np.asarray, _kmeans_stats(v3, valid3, jnp.asarray(centroids),
                                      n_clusters))
        new = sums / np.maximum(counts[:, None], 1.0)
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        # empty clusters keep their previous centroid (spherical k-means)
        centroids = np.where(norms > 1e-6, new / np.maximum(norms, 1e-12),
                             centroids)
    assign = np.asarray(_kmeans_assign(v3, jnp.asarray(centroids))
                        ).reshape(-1)[:n_valid]

    # dense [C, L] list table + spill
    mean = max(1.0, n_valid / n_clusters)
    cap = _round_up(int(np.ceil(cap_factor * mean)), _SUB)
    lists = np.full((n_clusters, cap), -1, np.int32)
    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order]
    starts = np.searchsorted(sorted_assign, np.arange(n_clusters))
    pos = np.arange(n_valid) - starts[sorted_assign]   # rank within cluster
    rows = valid_idx[order].astype(np.int32)
    in_cap = pos < cap
    lists[sorted_assign[in_cap], pos[in_cap]] = rows[in_cap]
    spill_arr = rows[~in_cap]
    if spill_arr.size % _SUB:
        spill_arr = np.concatenate(
            [spill_arr, np.full((_SUB - spill_arr.size % _SUB,), -1, np.int32)])
    if nprobe is None:
        nprobe = max(1, min(n_clusters, 8))
    return IVFIndex(centroids.astype(np.float32), lists, spill_arr, nprobe,
                    emb.shape[0], vault_digest(emb, row_valid))


def ivf_topk(
    query: jax.Array,        # [B, D] L2-normalized f32
    vault_emb: jax.Array,    # [N, D]
    row_valid: jax.Array,    # [N] bool
    centroids: jax.Array,    # [C, D]
    lists: jax.Array,        # [C, L] int32
    spill: jax.Array,        # [S] int32
    *,
    top_k: int,
    nprobe: int,
    emb16: Optional[jax.Array] = None,   # [N, D] bf16 copy (gather path)
) -> Tuple[jax.Array, jax.Array]:
    """Probed-cluster exact-rescore top-k; jittable, all on device.

    With ``emb16`` the candidate gather — the dominant cost, scattered HBM
    reads that don't coalesce (docs/PERF.md) — reads the bf16 copy at half
    the bytes; the bf16-ranked top-(k+8) shortlist is then re-scored
    exactly from the f32 rows, so the final similarities (and the 0.85
    reuse gate) stay f32-exact. bf16 row quantization perturbs a cosine by
    ~4e-3 RMS; the +8 margin makes a shortlist miss require an ~8-deep
    pileup of candidates within that noise of the k-th score."""
    B = query.shape[0]
    C = centroids.shape[0]
    nprobe = min(nprobe, C)
    # HIGHEST like every other query-path contraction (CLAUDE.md). NB the
    # build-side assignment runs in bf16 (memory, see _kmeans_stats), so a
    # boundary row can live one cluster over from the query's top-ranked
    # centroid — another reason nprobe≥2 is the sensible floor.
    csims = jnp.dot(query, centroids.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    _, probe = jax.lax.top_k(csims, nprobe)                  # [B, P]
    cand = lists[probe].reshape(B, -1)                       # [B, P·L]
    if spill.shape[0]:
        cand = jnp.concatenate(
            [cand, jnp.broadcast_to(spill[None, :], (B, spill.shape[0]))],
            axis=1)
    safe = jnp.maximum(cand, 0)
    ok = (cand >= 0) & row_valid[safe]
    if emb16 is not None:
        rows16 = emb16[safe]                                 # [B, M, D] bf16
        s16 = jnp.einsum("bd,bmd->bm", query.astype(jnp.bfloat16), rows16,
                         preferred_element_type=jnp.float32)
        s16 = jnp.where(ok, s16, -2.0)
        short = min(top_k + 8, s16.shape[1])
        _, pos16 = jax.lax.top_k(s16, short)
        cand = jnp.take_along_axis(cand, pos16, axis=1)      # [B, short]
        safe = jnp.maximum(cand, 0)
        ok = (cand >= 0) & row_valid[safe]
    rows = vault_emb[safe]                                   # [B, M|short, D]
    if rows.dtype == jnp.int8:   # capacity mode (ServingConfig.vault_dtype)
        rows = rows.astype(jnp.float32) * (1.0 / 127.0)
    sims = jnp.einsum("bd,bmd->bm", query, rows,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    sims = jnp.where(ok, sims, -2.0)
    k = min(top_k, sims.shape[1])
    top_s, pos = jax.lax.top_k(sims, k)
    top_i = jnp.take_along_axis(cand, pos, axis=1)
    if k < top_k:  # degenerate tiny index: pad to the requested k
        pad = top_k - k
        top_s = jnp.concatenate([top_s, jnp.full((B, pad), -2.0)], axis=1)
        top_i = jnp.concatenate([top_i, jnp.full((B, pad), -1, top_i.dtype)],
                                axis=1)
    return top_s, top_i.astype(jnp.int32)
