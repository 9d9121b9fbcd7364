"""MisinfoForensics — the serving facade (C8/L2, SURVEY.md §1-2).

API-compatible with the reference orchestrator (misinfo_forensics.py:111-927):
`analyze(text, image_path, video_path, verbose)` returns the identical report
dict `{verdict, verdict_text, confidence, scores, vault_matches, explanation}`,
and the per-signal methods (`analyze_text`, `analyze_image`,
`analyze_consistency`, `search_vault`, `analyze_video`, `fusion_verdict`)
are all present.

Internally everything is batched: single `analyze()` calls run through the
same fused XLA programs as `analyze_batch()` (batch size 1 is just the
smallest bucket), so the dashboard, CLI, trainers and benchmarks all drive
one engine (SURVEY.md §7 design move 2).
"""

from __future__ import annotations

import os
import threading
import time
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from misinfo_tpu.core.config import ForensicsConfig
from misinfo_tpu.engine.explain import Explainer
from misinfo_tpu.engine.signals import SignalOutput, SignalPrograms
from misinfo_tpu.models.clip import clip_text_features
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.ops.common import Policy, l2_normalize
from misinfo_tpu.preprocess.image import batch_images, image_to_array, load_image_rgb
from misinfo_tpu.preprocess.tokenizer import load_clip_tokenizer, load_roberta_tokenizer
from misinfo_tpu.vault.store import TruthVault


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


_UNSET = object()  # distinguishes "default to self.vault" from vault=None


class MisinfoForensics:
    """Batched TPU forensics engine."""

    def __init__(
        self,
        config: Optional[ForensicsConfig] = None,
        det_cfg: Optional[DetectorConfig] = None,
        params: Optional[Dict] = None,
        mesh=None,
        use_pallas: bool = False,
    ):
        self.cfg = config or ForensicsConfig.from_env()
        self.det_cfg = det_cfg or DetectorConfig()
        self.policy = Policy(self.cfg.precision)
        self.mesh = mesh
        if mesh is not None:
            # GSPMD partitioning of the int8 Pallas kernels is
            # unvalidated; mesh deployments serve quantized denses via
            # the XLA path (ops/pallas_int8.quant_mode).
            self.policy.quant_pallas = "off"
        t0 = time.perf_counter()
        try:
            from misinfo_tpu.core.cache import enable_compilation_cache
            enable_compilation_cache()
        except Exception:
            pass

        # tokenizers (parity-grade BPE when assets exist, hash fallback else)
        self.roberta_tokenizer = load_roberta_tokenizer(
            self.cfg.paths.roberta_tokenizer_dir,
            vocab_size=self.det_cfg.roberta.vocab_size)
        self.clip_tokenizer = load_clip_tokenizer(
            self.cfg.paths.clip_tokenizer_dir,
            vocab_size=self.det_cfg.clip.vocab_size)
        # parity grade is surfaced EVERYWHERE a checkpoint mode is
        # (load_report, startup banner, /healthz): hash-fallback serving is
        # functional but its scores are NOT comparable to the reference's
        self.tokenizer_grades = {
            "roberta": bool(getattr(self.roberta_tokenizer,
                                    "parity_grade", False)),
            "clip": bool(getattr(self.clip_tokenizer, "parity_grade", False)),
        }
        self.tokenizer_parity = all(self.tokenizer_grades.values())

        # detector params: init then overlay checkpoints. Cascade: native
        # orbax dir (our trainers' output) → reference torch .pth cascade
        # (C10) → fresh init.
        if params is None:
            params = detector_init(jax.random.PRNGKey(self.cfg.seed), self.det_cfg)
            native = None
            if self.cfg.paths.orbax_dir:
                from misinfo_tpu.checkpoints.io import (
                    load_checkpoint, load_metadata)
                native = load_checkpoint(self.cfg.paths.orbax_dir, params)
            if native is not None:
                params = native
                self.load_report = {
                    "mode": "native", "path": self.cfg.paths.orbax_dir,
                    **load_metadata(self.cfg.paths.orbax_dir)}
            else:
                try:
                    from misinfo_tpu.checkpoints.torch_convert import (
                        load_detector_from_reference_ckpts)
                    self.load_report = load_detector_from_reference_ckpts(
                        params, self.cfg.paths)
                except Exception as e:  # torch missing / unreadable → fresh init
                    self.load_report = {"mode": "init", "error": str(e)}
        else:
            self.load_report = {"mode": "provided"}
        self.load_report["tokenizer_parity"] = self.tokenizer_parity
        self.load_report["tokenizer_grades"] = dict(self.tokenizer_grades)
        # Serving transforms apply identically on the single-chip AND mesh
        # paths (VERDICT r2 #1): store big kernels in the serving dtype /
        # int8 (ops/serving.py), THEN shard — cast/quantize are per-leaf
        # pytree rewrites, so they commute with parameter placement, and
        # each chip of a mesh deployment reads the same bf16/int8 weights
        # the single-chip path measured (docs/PERF.md serving-dtype rows).
        from misinfo_tpu.ops.serving import optimize_for_serving
        params = optimize_for_serving(
            params, self.policy,
            quant=getattr(self.cfg.precision, "quant", "auto"), mesh=mesh)
        if mesh is not None:
            from misinfo_tpu.parallel.sharding import shard_params
            params = shard_params(mesh, params)
        self.params = params

        # Truth Vault (soft-fail, reference misinfo_forensics.py:243-246)
        self.vault = TruthVault.load(self.cfg.paths.vault_path)
        self.vault_loaded = self.vault is not None
        self._vault_device, self._vault_sharded = self._prepare_vault()
        self._warn_vault_capacity(self._vault_device, self._vault_sharded)
        self._prep_pool = None  # lazy image-prep thread pool (_image_batch)
        self._use_pallas = use_pallas
        self._reload_lock = threading.Lock()  # serializes reload_vault

        # Opt-in AOT executable registry (engine/aotcache.py): single-chip
        # only — sharded executables bake device assignments. The
        # fingerprint pins everything but the batch shapes, so a config
        # or quant-mode change is a clean cache miss.
        self._aot = None
        if self.cfg.serving.aot_cache and mesh is None:
            from misinfo_tpu.engine.aotcache import AotCache
            self._aot = AotCache(fingerprint=AotCache.environment_fingerprint(
                self.det_cfg, self.cfg, self.policy, use_pallas, params))
        self.programs = SignalPrograms(
            self.det_cfg, self.cfg, self.policy, use_pallas=use_pallas,
            vault_mesh=self.mesh if self._vault_sharded else None,
            data_mesh=self.mesh, aot=self._aot)
        # Results coalesce into ONE device buffer before the host fetch:
        # a SignalOutput pytree fetch pays a round trip per leaf (12×),
        # which dominates e2e latency on remote-attached TPUs
        from misinfo_tpu.engine.signals import pack_signal_output
        self._pack_out = jax.jit(pack_signal_output)
        self.explainer = Explainer(self.cfg.gemini_api_key,
                                   self.cfg.gemini_model,
                                   self.cfg.thresholds)
        self.gemini_available = self.explainer.available
        self._clip_text_jit = jax.jit(
            lambda p, ids, mask: l2_normalize(clip_text_features(
                p, ids, mask, self.det_cfg.clip, self.policy)))
        self.init_seconds = time.perf_counter() - t0
        if self.cfg.verbose:
            tok = ("parity" if self.tokenizer_parity else
                   "HASH-FALLBACK (scores not reference-comparable; "
                   "fetch vocab assets via serve/download.py)")
            print(f"MisinfoForensics ready in {self.init_seconds:.1f}s "
                  f"(devices={jax.device_count()}, "
                  f"vault={'loaded' if self.vault_loaded else 'absent'}, "
                  f"ckpt={self.load_report.get('mode')}, tokenizer={tok})")
            try:
                # host-prep sizing hint (VERDICT r3 #5): one ~0.3 s probe
                # so a fresh operator learns the image-traffic ceiling of
                # THIS host — and the knobs that move it — at boot instead
                # of from docs/PERF.md after the fact
                rec = self.host_prep_report()
                if rec["host_bound_at_probe_res"]:
                    print(f"host-prep notice: {rec['summary']}")
            except Exception:
                pass  # probe is advisory; never block engine construction

    # ----------------------------------------------------------- helpers

    def _data_axis_size(self) -> int:
        if self.mesh is None:
            return 1
        return int(self.mesh.shape[self.mesh.axis_names[0]])

    def _prepare_vault(self, vault=_UNSET, vault_path=_UNSET):
        """Build the device-resident vault arrays for ``vault`` (defaults
        to ``self.vault``; pass None explicitly for the empty dummy).
        ``vault_path`` locates the IVF / int4-prepack sidecars. Pure
        staging — returns ``(device_dict, sharded)`` without touching
        engine state, so `reload_vault` can do minutes of host
        quantization while the old vault serves."""
        vault = self.vault if vault is _UNSET else vault
        vault_path = (self.cfg.paths.vault_path
                      if vault_path is _UNSET else vault_path)
        # mesh serving: vaults beyond the single-chip comfort zone are
        # row-sharded across the data axis and searched via shard_map
        # (vault/search.py vault_search_sharded); smaller vaults replicate
        sharded = (
            self.mesh is not None and self._data_axis_size() > 1
            and vault is not None
            and vault.embeddings.shape[0]
            >= self.cfg.serving.vault_shard_min_rows)
        if vault is None:
            # 128-row dummy so program shapes stay static; row_valid all-False
            d = self.det_cfg.clip.projection_dim
            return self._place_vault({
                "vault_emb": jnp.zeros((128, d), jnp.float32),
                "vault_valid": jnp.zeros((128,), jnp.bool_),
                "vault_text_emb": jnp.zeros((128, d), jnp.float32),
            }, sharded), sharded
        # IVF index build FIRST (vault/ivf.py): the device-side k-means
        # needs a transient row copy, so it runs before the vault arrays
        # occupy HBM; the index is cached in a sidecar next to the vault
        # file and invalidated by a content digest (shape alone misses
        # edits within a 128-row pad bucket)
        index = None
        ivf_engages = (self.cfg.serving.vault_ivf
                       and vault.num_articles > 0
                       and not sharded)  # IVF and row-sharding
        # are mutually exclusive search strategies; sharding wins at scale
        if ivf_engages and self.cfg.serving.vault_dtype == "int4":
            # refuse only when IVF would actually run — a sharded/empty
            # vault ignores vault_ivf exactly as the other dtypes do
            raise ValueError(
                "vault_dtype='int4' and vault_ivf are mutually exclusive "
                "— the IVF gather needs addressable rows; pick one (exact "
                "int4 already beats IVF at every measured single-chip "
                "size, docs/PERF.md)")
        if ivf_engages:
            from misinfo_tpu.vault.ivf import IVFIndex, build_ivf, vault_digest
            sidecar = (vault_path + ".ivf.npz") if vault_path else None
            index = IVFIndex.load(sidecar) if sidecar else None
            if (index is None
                    or index.n_rows != vault.embeddings.shape[0]
                    or index.digest != vault_digest(vault.embeddings,
                                                    vault.row_valid)):
                index = build_ivf(vault.embeddings, vault.row_valid)
                if sidecar:
                    try:
                        index.save(sidecar)
                    except Exception:
                        pass  # read-only vault dir — rebuild next start

        # capacity modes (ServingConfig.vault_dtype): the host-side vault
        # stays f32 (IVF build + digest use it); only the device copies are
        # bf16/int8-quantized
        vdt = self.cfg.serving.vault_dtype
        if vdt == "int4":
            # packed-nibble capacity mode (vault/int4.py): 8× f32 articles
            # per chip across BOTH planes — image rows feed the Pallas
            # sims kernel, title rows are only ever a [B]-row gather in
            # _gate_and_text and unpack inline. Rows pad to the kernel
            # tile so the fast path engages; under row-sharding, to
            # tile × data-axis so every shard stays tile-aligned.
            from misinfo_tpu.vault.int4 import (INT4_TILE_ROWS, Int4Vault,
                                                pad_int4_vault)
            from misinfo_tpu.vault.prepack import get_or_build
            mult = INT4_TILE_ROWS * (self._data_axis_size()
                                     if sharded else 1)
            # quantization is host-bound O(N·D) (~40 s/M rows on a 1-core
            # host) — the digest-validated <vault>.int4.npz sidecar makes
            # it a one-time cost (vault/prepack.py; padding stays here
            # since the multiple depends on the mesh)
            pre = get_or_build(vault_path, vault)
            q4 = pad_int4_vault(pre.image, multiple=mult)
            n_pad = q4.packed.shape[0]
            valid = np.zeros((n_pad,), bool)
            valid[: vault.row_valid.shape[0]] = vault.row_valid
            if pre.text is not None:
                t4 = pad_int4_vault(pre.text, multiple=mult)
            else:
                # no titles: the packed-zero plane directly — don't
                # materialize an [N, D] f32 zeros array through the
                # quantizer at capacity scale
                t4 = Int4Vault(
                    packed=np.zeros_like(q4.packed),
                    scale=np.zeros((n_pad,), np.float32))
            return self._place_vault({
                "vault_emb": jnp.asarray(q4.packed),
                "vault_scale": jnp.asarray(q4.scale),
                "vault_valid": jnp.asarray(valid),
                "vault_text_emb": jnp.asarray(t4.packed),
                "vault_text_scale": jnp.asarray(t4.scale),
            }, sharded), sharded
        if vdt == "int8":
            from misinfo_tpu.vault.search import quantize_rows_int8
            cast = quantize_rows_int8
        elif vdt == "bfloat16":
            cast = lambda a: jnp.asarray(a, jnp.bfloat16)  # noqa: E731
        else:
            cast = lambda a: a  # noqa: E731
        out = {
            "vault_emb": jnp.asarray(cast(vault.embeddings)),
            "vault_valid": jnp.asarray(vault.row_valid),
        }
        if vault.text_embeddings is not None:
            out["vault_text_emb"] = jnp.asarray(cast(vault.text_embeddings))
        else:
            out["vault_text_emb"] = jnp.zeros_like(out["vault_emb"])
        if index is not None:
            out.update(index.device_arrays())
            if self.cfg.serving.ivf_bf16_gather:
                out["ivf_emb16"] = jnp.asarray(vault.embeddings,
                                               jnp.bfloat16)
        return self._place_vault(out, sharded), sharded

    def _place_vault(self, out: Dict, sharded: bool) -> Dict:
        """Pin vault array placement once at prep time: row-sharded across
        `data` when the vault outgrows one chip (rows are 128-aligned,
        divisible by any power-of-two data axis), replicated otherwise."""
        if self.mesh is None:
            return out
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = self.mesh.axis_names[0]
        for k in list(out):
            if sharded and k in ("vault_emb", "vault_valid",
                                 "vault_text_emb", "vault_scale",
                                 "vault_text_scale"):
                spec = P(axis, *([None] * (out[k].ndim - 1)))
            else:
                spec = P()
            out[k] = jax.device_put(out[k], NamedSharding(self.mesh, spec))
        return out

    # warn when per-device vault residency crosses this fraction of the
    # reported HBM limit (the 16M-row ceiling probe sat at ~56%,
    # docs/PERF.md; past ~70% the 2× headroom a staged reload_vault needs
    # is gone and batch activations start fighting the allocator)
    _VAULT_HBM_WARN_FRACTION = 0.7

    @staticmethod
    def _device0_bytes(v) -> int:
        """Actual per-device residency of one placed array: equals the
        global bytes for replicated arrays, global/D for row-sharded ones.
        Shared by memory_report and the capacity guardrail."""
        try:
            sh = v.addressable_shards[0].data
            return int(np.prod(sh.shape) * sh.dtype.itemsize)
        except Exception:
            return int(np.prod(v.shape) * v.dtype.itemsize)

    def _warn_vault_capacity(self, dev: Dict, sharded: bool) -> None:
        """Operator guardrail: log when the vault's per-device footprint
        approaches the HBM limit, naming the cheaper capacity mode
        (SCALING.md decision table). Pure diagnostics — behavior is
        unchanged; the allocator, not this check, is the hard limit."""
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
        except Exception:
            return  # backend reports nothing (CPU) — nothing to warn about
        limit = stats.get("bytes_limit")
        if not limit:
            return
        per_dev = sum(self._device0_bytes(v) for v in dev.values())
        if per_dev <= self._VAULT_HBM_WARN_FRACTION * limit:
            return
        vdt = self.cfg.serving.vault_dtype
        if vdt == "int4":
            nxt = ("a wider data axis (more chips)" if sharded else
                   "row-sharding across chips (MisinfoForensics(mesh=…))")
        else:
            nxt = {"int8": 'vault_dtype="int4" (2× more capacity)'}.get(
                vdt, 'vault_dtype="int8" (4× capacity) or "int4" (8×)')
        import logging
        logging.getLogger("misinfo_tpu.engine").warning(
            "vault occupies %.0f%% of device HBM (%.2f GB of %.2f GB, "
            "dtype=%s%s); hot reload_vault needs ~2× headroom (or "
            "drop_first=True) — consider %s (docs/SCALING.md)",
            100.0 * per_dev / limit, per_dev / 2**30, limit / 2**30, vdt,
            ", row-sharded" if sharded else "", nxt)

    def _publish_vault(self, vault, dev: Dict, sharded: bool) -> None:
        """Swap the serving vault in a few reference assignments (atomic
        under the GIL); a shard-threshold flip rebuilds the programs."""
        rebuild = sharded != self._vault_sharded
        self.vault_loaded = vault is not None
        self.vault = vault
        self._vault_device = dev
        self._vault_sharded = sharded
        if rebuild:
            self.programs = SignalPrograms(
                self.det_cfg, self.cfg, self.policy,
                use_pallas=self._use_pallas,
                vault_mesh=self.mesh if sharded else None,
                data_mesh=self.mesh, aot=self._aot)

    def reload_vault(self, path: Optional[str] = None,
                     drop_first: bool = False) -> Dict:
        """Hot-swap the Truth Vault without restarting the engine.

        Production archives grow continuously; the reference loads its
        pickle once at init (misinfo_forensics.py:216-246) and needs a
        process restart to pick up new articles. Here the replacement is
        fully STAGED first — host load, normalization, quantization /
        IVF / sidecar via `_prepare_vault` (minutes at capacity scale) —
        while requests keep serving the old vault; only then do a few
        atomic assignments publish it (and, for an explicit ``path``, the
        engine config — a failed reload leaves both untouched). Vaults
        whose rows pad to the same 128-aligned bucket reuse every
        compiled program (no recompile for same-bucket growth); a larger
        bucket jits fresh signatures on first use, and a flip across
        `vault_shard_min_rows` rebuilds the program set. Concurrent
        reloads serialize on a lock.

        HBM: the default staged swap holds BOTH vaults' device arrays
        briefly, so it needs headroom for 2× the vault footprint
        (`memory_report()` shows the current one). At capacity scale
        pass ``drop_first=True`` to free the old planes before staging —
        requests during the swap then soft-degrade to vault-less serving
        (exactly the missing-vault mode) instead of OOMing.

        Consistency: a batch already in flight during the swap may map
        its scores onto the NEW metadata (scores computed against the old
        rows) — append-only growth keeps existing indices stable so this
        is benign; full row reshuffles briefly mis-title matches for that
        one batch. Returns ``{articles, rows, sharded}``.
        """
        import dataclasses as _dc
        with self._reload_lock:
            new_path = path if path is not None else self.cfg.paths.vault_path
            new_vault = TruthVault.load(new_path)
            if drop_first:
                dev0, sh0 = self._prepare_vault(None, vault_path=None)
                self._publish_vault(None, dev0, sh0)
            dev, sharded = self._prepare_vault(new_vault,
                                               vault_path=new_path)
            self._warn_vault_capacity(dev, sharded)
            if path is not None:  # publish config only after staging worked
                self.cfg = self.cfg.replace(
                    paths=_dc.replace(self.cfg.paths, vault_path=path))
            self._publish_vault(new_vault, dev, sharded)
            return {"articles": (0 if new_vault is None
                                 else new_vault.num_articles),
                    "rows": int(dev["vault_emb"].shape[0]),
                    "sharded": bool(sharded)}

    _TEXT_BUCKETS = (64, 128, 256, 512)

    def _req_bucket(self, n: int, buckets: Sequence[int]) -> int:
        """Bucket a request count; under a mesh the batch axis must divide
        evenly across the data axis, so sub-data-size buckets round up."""
        b = _bucket(n, buckets)
        d = self._data_axis_size()
        if b % d:
            b = ((b + d - 1) // d) * d
        return b

    def _place_batch(self, batch: Dict) -> Dict:
        """Mesh serving: host-built request tensors shard their batch axis
        on `data` (classic DP); vault tensors were pinned at startup."""
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = self.mesh.axis_names[0]
        return {k: jax.device_put(
                    v, NamedSharding(self.mesh,
                                     P(axis, *([None] * (v.ndim - 1)))))
                for k, v in batch.items()}

    @property
    def _rb_max(self) -> int:
        """Effective RoBERTa row length: the configured max clamped to the
        position table (-2 for the reference's pad-offset rows). The single
        definition every tokenize/pack/warmup path shares."""
        return min(self.cfg.seq.roberta_max_len,
                   self.det_cfg.roberta.max_position_embeddings - 2)

    @property
    def _cl_len(self) -> int:
        """Effective CLIP text length (config clamp vs model max)."""
        return min(self.cfg.seq.clip_max_len, self.det_cfg.clip.max_text_len)

    def _tokenize_batch(self, texts: List[str], bucket: int):
        rb_max, cl_len = self._rb_max, self._cl_len
        padded = texts + [""] * (bucket - len(texts))
        rb_ids, rb_mask = self.roberta_tokenizer.batch(padded, rb_max)
        # length bucketing: pad to the smallest bucket covering the batch's
        # longest sequence instead of always paying the 512-token worst case
        # (padding invariance of scores is guaranteed by the attention mask
        # and asserted in tests/test_roberta_parity.py)
        longest = int(rb_mask.sum(axis=1).max()) if len(padded) else rb_max
        rb_len = next((b for b in self._TEXT_BUCKETS
                       if b >= longest and b <= rb_max), rb_max)
        rb_ids, rb_mask = rb_ids[:, :rb_len], rb_mask[:, :rb_len]
        cl_ids, cl_mask = self.clip_tokenizer.batch(padded, cl_len)
        return rb_ids, rb_mask, cl_ids, cl_mask

    def _text_pack_plan(self, texts: List[str]):
        """Tokenize once and pick the packed row length; shared by the
        packing path and the auto-pack decision."""
        from misinfo_tpu.preprocess.packing import trim_padded
        rb_max = self._rb_max
        ids, mask = self.roberta_tokenizer.batch(texts, rb_max)
        seqs = trim_padded(ids, mask)
        longest = max((len(s) for s in seqs), default=1)
        row_len = next((b for b in self._TEXT_BUCKETS
                        if longest <= b <= rb_max), rb_max)
        return seqs, row_len

    def _packed_rows_bucketed(self, seqs, row_len: int, n_slots: int):
        """Pack once → (PackedTextBatch, bucketed row count). The packed
        arrays are carried in the auto-pack plan and reused (row-padded)
        when packing wins — never packed twice (ADVICE r1)."""
        from misinfo_tpu.preprocess.packing import pack_token_rows
        packed = pack_token_rows(seqs, row_len,
                                 self.det_cfg.roberta.pad_token_id,
                                 n_slots=n_slots)
        # under a mesh the packed row axis is data-sharded, so the row
        # bucket rounds up to a data-axis multiple like every batch axis
        return packed, self._req_bucket(packed.ids.shape[0],
                                        self.cfg.serving.batch_buckets)

    def _pack_text_batch(self, texts: List[str], n_slots: int,
                         plan=None) -> Dict:
        """Packed text-only batch (preprocess/packing.py): rows hold several
        ragged requests each; jit signatures stay bucketed via row-length
        buckets × row-count buckets × CLS-slot buckets. ``plan`` is the
        auto-pack decision's (seqs, row_len, PackedTextBatch, bucketed
        rows) — the trial pack is reused, only row padding is added."""
        from misinfo_tpu.preprocess.packing import pad_packed_rows
        if plan is not None:
            _, _, packed, rows = plan
        else:
            seqs, row_len = self._text_pack_plan(texts)
            packed, rows = self._packed_rows_bucketed(seqs, row_len, n_slots)
        packed = pad_packed_rows(packed, rows,
                                 self.det_cfg.roberta.pad_token_id)
        return {
            "roberta_ids": jnp.asarray(packed.ids),
            "roberta_mask": jnp.asarray(packed.mask),
            "roberta_pos": jnp.asarray(packed.position_ids),
            "roberta_seg": jnp.asarray(packed.segment_ids),
            "cls_rows": jnp.asarray(packed.cls_rows),
            "cls_cols": jnp.asarray(packed.cls_cols),
        }

    def _pool(self):
        """Lazy shared host-prep thread pool (cv2/PIL release the GIL, so
        decode/resize scale with host cores; 1-core hosts degrade
        gracefully)."""
        if self._prep_pool is None:
            import concurrent.futures as cf
            self._prep_pool = cf.ThreadPoolExecutor(
                max_workers=min(16, (os.cpu_count() or 1)))
        return self._prep_pool

    def _prep_map(self, fn, items: List) -> List:
        if len(items) > 1:
            return list(self._pool().map(fn, items))
        return [fn(x) for x in items]

    def _stage_images(self, arrays: List, bucket: int) -> Dict:
        """Device-resize path: decoded frames (+ None padding to ``bucket``)
        → staged uint8 planes + per-image resize params; both 224px flavors
        are derived on device (ops/resize.py)."""
        from misinfo_tpu.preprocess.image import (choose_staging_bucket,
                                                  stage_image_batch)
        size = self.cfg.seq.image_size
        arrays = arrays + [None] * (bucket - len(arrays))
        max_dim = max((max(a.shape[:2]) for a in arrays if a is not None),
                      default=size)
        S = choose_staging_bucket(max_dim,
                                  self.cfg.serving.image_staging_buckets)
        staged, params = stage_image_batch(arrays, S, size,
                                           prep_map=self._prep_map)
        return {"image_staged": jnp.asarray(staged),
                "resize_params": jnp.asarray(params)}

    def _image_batch(self, images: List, bucket: int) -> Dict:
        """Image tensors for one request group: host decode always; resize
        on host (cv2/PIL, two 224px flavors) or on device
        (ServingConfig.device_resize → staged frames, halving per-image
        host prep — 4.6 → 2.4 ms/image single-core, docs/PERF.md)."""
        size = self.cfg.seq.image_size
        from misinfo_tpu.preprocess.image import decode_rgb
        fast = self.cfg.serving.fast_decode
        if self.cfg.serving.device_resize:
            arrs = self._prep_map(
                lambda im: None if im is None else decode_rgb(im, fast=fast),
                images)
            return self._stage_images(arrs, bucket)

        def prep(im):
            if im is None:
                return None, None
            arr = decode_rgb(im, fast=fast)  # decode once, resize twice
            return (image_to_array(arr, "effnet", size),
                    image_to_array(arr, "clip", size))

        pairs = self._prep_map(prep, images)
        pad = bucket - len(images)
        eff = [p[0] for p in pairs] + [None] * pad
        clp = [p[1] for p in pairs] + [None] * pad
        return {"image_effnet": jnp.asarray(batch_images(eff, size)),
                "image_clip": jnp.asarray(batch_images(clp, size))}

    # ------------------------------------------------------------ warmup

    _WARMUP_VARIANTS = ("full", "text_only", "visual_only")

    def memory_report(self) -> Dict:
        """Device-memory accounting for capacity planning (docs/SCALING.md
        sizing tables): detector params, vault planes by key, and — where
        the backend reports it (TPU) — per-device HBM in-use/limit.
        Array sizes are GLOBAL logical bytes (divide sharded entries by
        the data-axis size for per-device residency). The reference has
        no analogue (host torch; its vault is host numpy)."""
        def _tree_bytes(tree) -> int:
            return int(sum(
                np.prod(x.shape) * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(tree)
                if hasattr(x, "shape")))

        vault_by_key = {k: int(np.prod(v.shape) * v.dtype.itemsize)
                        for k, v in self._vault_device.items()}

        out = {
            "params_bytes": _tree_bytes(self.params),
            "vault_bytes": sum(vault_by_key.values()),
            # actual per-device residency from the placed shards — the
            # 1/D scaling SCALING.md claims (shared _device0_bytes helper)
            "vault_bytes_per_device": sum(
                self._device0_bytes(v)
                for v in self._vault_device.values()),
            "vault_bytes_by_key": vault_by_key,
            "vault_dtype": self.cfg.serving.vault_dtype,
            "vault_articles": (self.vault.num_articles
                               if self.vault is not None else 0),
            "vault_rows_padded": int(
                self._vault_device["vault_emb"].shape[0]),
            "vault_sharded": bool(self._vault_sharded),
            "devices": jax.device_count(),
        }
        stats = {}
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
        except Exception:
            pass  # CPU/interpret backends report nothing
        if stats:
            out["hbm_in_use_bytes"] = int(stats.get("bytes_in_use", 0))
            if "bytes_limit" in stats:
                out["hbm_limit_bytes"] = int(stats["bytes_limit"])
                out["hbm_headroom_bytes"] = (out["hbm_limit_bytes"]
                                             - out["hbm_in_use_bytes"])
        return out

    def host_prep_report(self) -> Dict:
        """Measured image-prep capacity of THIS host and the policy
        recommendation (VERDICT r3 #5): one cached ~0.3 s probe of the
        exact `_image_batch` path (preprocess/hostprobe.py). Surfaced in
        the verbose boot banner and /metrics so a fresh operator learns
        whether image traffic is host-bound — and which knobs move the
        ceiling — without reading docs/PERF.md. Includes the knobs
        currently in effect so the /metrics reader sees probe AND state."""
        from misinfo_tpu.preprocess.hostprobe import recommend
        rec = dict(recommend())
        rec["active"] = {
            "fast_decode": self.cfg.serving.fast_decode,
            "device_resize": self.cfg.serving.device_resize,
            "prep_pool_workers": min(16, (os.cpu_count() or 1)),
        }
        # link probe numbers (VERDICT r4 #6) when one has been taken —
        # never triggered from /metrics itself (a cold probe moves MBs
        # through the link); HOST_POLICY=auto takes it at boot
        from misinfo_tpu.preprocess import hostprobe
        if hostprobe._link_cache is not None:
            rec["link"] = dict(hostprobe._link_cache)
        return rec

    def warmup(self, batch_sizes: Optional[Sequence[int]] = None,
               text_buckets: Optional[Sequence[int]] = None,
               variants: Sequence[str] = _WARMUP_VARIANTS,
               videos: Optional[Sequence[int]] = None,
               packed: Optional[bool] = None,
               full_grid: bool = False,
               parallel: Optional[int] = None,
               progress=None) -> List[tuple]:
        """Precompile serving signatures before traffic arrives.

        Cold TPU compiles of the fused programs take minutes through this
        image's remote tunnel (docs/PERF.md) and a novel
        (variant × batch bucket × text bucket [× packed rows]) shape pays
        that price mid-request. Production deployments call this once at
        startup (CLI/API ``--warmup``): synthetic batches with exactly the
        shapes ``_dispatch_group`` builds run through the REAL jitted
        programs, so every warmed signature lands in the in-process jit
        cache AND the persistent XLA compilation cache (core/cache.py)
        shared across process restarts.

        Defaults warm the endpoints of each axis — batch buckets
        ``(1, max)`` (the single-request latency path and the max-
        throughput path), every reachable text bucket (including the
        ``rb_max`` fallback length ``_tokenize_batch`` emits), the three
        request variants, and video buckets ``(1, max)``. Text layouts
        follow the routing ``pack_text`` makes deterministic: ``True`` →
        packed only, ``False`` → dense only, ``"auto"`` → dense by default
        because the packed row count is data-dependent — a packed burst can
        still compile on first use unless ``packed=True``/``full_grid=True``
        warms every row bucket auto-pack can route to. Intermediate batch
        buckets likewise compile on first use unless ``full_grid=True``
        warms EVERY combination the engine can emit (tens of signatures —
        a one-time cost thanks to the persistent cache). ``videos=()``
        skips the video programs; ``variants`` takes only the three
        request variants (video programs are selected via ``videos``).
        ``parallel`` (or ``MISINFO_TPU_WARMUP_PARALLEL``) compiles that
        many signatures concurrently: the per-signature long pole is IO
        (persistent-cache load or the compile RPC), so overlapping it
        cuts the full-grid wall time on remote-attached deployments;
        0/1 keeps the serial order. Returns the warmed
        ``(variant, batch, text_len, packed_rows)``
        signatures (``packed_rows=0`` ⇒ dense). With
        ``serving.device_resize`` every image-bearing program is warmed
        once per ``image_staging_buckets`` entry and signatures gain a
        fifth element (the staging size; 0 for image-less programs).
        """
        bad = set(variants) - set(self._WARMUP_VARIANTS)
        if bad:
            raise ValueError(
                f"unknown warmup variants {sorted(bad)}; valid: "
                f"{self._WARMUP_VARIANTS} (video programs are warmed via "
                "videos=[V, ...], which covers both video and video_text)")
        rb_max, cl_len = self._rb_max, self._cl_len
        size = self.cfg.seq.image_size
        buckets = self.cfg.serving.batch_buckets
        vbuckets = self.cfg.serving.video_batch_buckets
        if full_grid:
            batch_sizes = buckets if batch_sizes is None else batch_sizes
            videos = vbuckets if videos is None else videos
        if batch_sizes is None:
            batch_sizes = (1, buckets[-1])
        if videos is None:
            videos = (1, vbuckets[-1])
        if text_buckets is None:
            # every length _tokenize_batch can emit: buckets under rb_max
            # plus the rb_max fallback itself (forensics._tokenize_batch)
            text_buckets = [b for b in self._TEXT_BUCKETS if b < rb_max] \
                + [rb_max]
        pack_mode = self.cfg.serving.pack_text
        if packed is None:
            # warm what the routing makes deterministic; "auto" opts in
            # via packed=True / full_grid (see docstring)
            packed = pack_mode is True or (full_grid and bool(pack_mode))
        dense_text = pack_mode is not True  # True-mode never serves dense
        if parallel is None:
            parallel = int(os.environ.get("MISINFO_TPU_WARMUP_PARALLEL",
                                          "0") or 0)
        done: List[tuple] = []
        seen = set()
        outs = []
        tasks: List[tuple] = []   # (variant, make_batch, sig) — deferred

        def _mark(sig):
            done.append(sig)
            if progress is not None:
                # serve-while-warming progress hook (serve/api.py); kept
                # outside the worker threads' hot path exceptions
                try:
                    progress(sig)
                except Exception:
                    pass

        def _run_one(variant, make_batch, sig):
            # synthetic inputs are BUILT here, not at dispatch time, so a
            # deferred (parallel) grid holds at most one flush-slice worth
            # of batches in HBM at once — not the whole grid's image/video
            # planes (ADVICE r4)
            batch = self._place_batch(make_batch())
            batch.update(self._vault_device)
            return self._pack_out(
                self.programs.warm(variant, self.params, batch))

        def _dispatch(variant, make_batch, sig):
            if sig in seen:   # e.g. two batch_sizes rounding to one bucket
                return
            seen.add(sig)
            if parallel > 1:
                tasks.append((variant, make_batch, sig))
                return
            outs.append(_run_one(variant, make_batch, sig))
            _mark(sig)

        def _flush_tasks():
            """Compile/load the queued signatures ``parallel`` at a time.
            The per-signature long pole is IO — the persistent-cache load
            or the remote compile RPC (docs/PERF.md: minutes through this
            image's relay) — so concurrent jit calls on DIFFERENT
            signatures overlap those round trips. Slices bound the number
            of in-flight synthetic batches (inputs are built inside
            `_run_one`); ``self.programs.get`` is pre-warmed per variant
            so worker threads never race the program-cache dict."""
            if not tasks:
                return
            import concurrent.futures as cf
            for v in {v for v, _, _ in tasks}:
                self.programs.get(v)
            step = max(8, 2 * parallel)
            with cf.ThreadPoolExecutor(max_workers=parallel) as ex:
                for lo in range(0, len(tasks), step):
                    chunk = tasks[lo:lo + step]
                    for (variant, _, sig), out in zip(
                            chunk, ex.map(lambda t: _run_one(*t), chunk)):
                        outs.append(out)
                        _mark(sig)
            tasks.clear()

        def _clip_tokens(n):
            return {"clip_ids": jnp.zeros((n, cl_len), jnp.int32),
                    "clip_mask": jnp.ones((n, cl_len), jnp.int32)}

        # device_resize adds a staging-size axis to every image-bearing
        # signature (one jit per staging bucket); sigs then carry a 5th
        # element (staging size, 0 for image-less programs)
        staging = (self.cfg.serving.image_staging_buckets
                   if self.cfg.serving.device_resize else None)

        def _sig(variant, B, L, r, S=0):
            return ((variant, B, L, r) if staging is None
                    else (variant, B, L, r, S))

        def _image_sets(n):
            """[(make_img_dict, staging_size)] — builders, not arrays, so
            nothing is allocated until the signature actually runs."""
            if staging is None:
                return [((lambda n=n: {
                    "image_effnet": jnp.zeros((n, size, size, 3), jnp.uint8),
                    "image_clip": jnp.zeros((n, size, size, 3), jnp.uint8),
                }), 0)]
            from misinfo_tpu.preprocess.image import resize_param_row
            row = resize_param_row(size, size, size)
            return [((lambda n=n, S=S: {
                "image_staged": jnp.zeros((n, S, S, 3), jnp.uint8),
                "resize_params": jnp.asarray(np.tile(row, (n, 1)))}), S)
                for S in staging]

        for variant in variants:
            for n in batch_sizes:
                B = self._req_bucket(n, buckets)
                if variant == "visual_only":
                    for mk_img, S in _image_sets(B):
                        _dispatch(variant, mk_img, _sig(variant, B, 0, 0, S))
                    continue
                img_sets = (_image_sets(B) if variant == "full"
                            else [((lambda: {}), 0)])
                for mk_img, S in img_sets:
                    for L in text_buckets:
                        if dense_text:
                            def mk_dense(B=B, L=L, mk_img=mk_img):
                                return {
                                    "roberta_ids": jnp.zeros((B, L), jnp.int32),
                                    "roberta_mask": jnp.ones((B, L), jnp.int32),
                                    **_clip_tokens(B), **mk_img(),
                                }
                            _dispatch(variant, mk_dense,
                                      _sig(variant, B, L, 0, S))
                        if not packed:
                            continue
                        # row counts dispatch can actually emit: bucketed AND
                        # rounded to the data axis (_packed_rows_bucketed)
                        for r in sorted({self._req_bucket(r0, buckets)
                                         for r0 in buckets}):
                            # rows auto-pack can actually route to this
                            # bucket: any r ≤ B when pack_text is forced
                            # True, else only row counts that win the
                            # 25%-margin test (_dispatch_group:
                            # rows*4 <= bucket*3)
                            if r > B or (pack_mode is not True
                                         and r * 4 > B * 3):
                                continue

                            def mk_packed(B=B, L=L, r=r, mk_img=mk_img,
                                          variant=variant):
                                return {
                                    "roberta_ids": jnp.zeros((r, L), jnp.int32),
                                    "roberta_mask": jnp.ones((r, L), jnp.int32),
                                    "roberta_pos": jnp.zeros((r, L), jnp.int32),
                                    "roberta_seg": jnp.zeros((r, L), jnp.int32),
                                    "cls_rows": jnp.zeros((B,), jnp.int32),
                                    "cls_cols": jnp.zeros((B,), jnp.int32),
                                    **(_clip_tokens(B) if variant == "full"
                                       else {}),
                                    **mk_img(),
                                }
                            _dispatch(variant, mk_packed,
                                      _sig(variant, B, L, r, S))
        F = self.cfg.video.max_frames
        for n in videos:
            V = self._req_bucket(n, vbuckets)
            for mk_img, S in _image_sets(V * F):
                def mk_video(V=V, mk_img=mk_img):
                    return {**mk_img(),
                            "frame_valid": jnp.ones((V, F), jnp.bool_)}
                _dispatch("video", mk_video, _sig("video", V, 0, 0, S))
                for L in text_buckets:
                    def mk_video_text(V=V, L=L, mk_video=mk_video):
                        return {
                            **mk_video(),
                            "roberta_ids": jnp.zeros((V, L), jnp.int32),
                            "roberta_mask": jnp.ones((V, L), jnp.int32),
                            **_clip_tokens(V),
                        }
                    _dispatch("video_text", mk_video_text,
                              _sig("video_text", V, L, 0, S))
        # flush BEFORE the vault branch so the returned signature order is
        # identical in serial and parallel modes whatever the vault's
        # schema (ADVICE r4; asserted by test_warmup_grid)
        _flush_tasks()
        vault = self.vault
        if vault is not None and vault.text_embeddings is None:
            # vaults WITHOUT precomputed title embeddings compute the
            # caption-vs-headline similarity on demand (reference :468-484
            # parity path, _caption_title_similarity) through a separate
            # [2, cl_len] clip-text jit — warm it, or the first >0.85
            # match in production pays a mid-request compile
            outs.append(self._clip_text_jit(
                self.params["clip"], jnp.zeros((2, cl_len), jnp.int32),
                jnp.ones((2, cl_len), jnp.int32)))
            _mark(_sig("caption_title_sim", 2, cl_len, 0))
        from misinfo_tpu.utils.timing import sync_fetch
        sync_fetch(outs)  # data sync: relay block_until_ready can ack early
        if self.cfg.verbose:
            def _fmt(sig):
                v, b, s, r = sig[:4]
                st = f"/st{sig[4]}" if len(sig) > 4 and sig[4] else ""
                return f"{v}/b{b}/S{s}" + (f"/r{r}" if r else "") + st
            print(f"warmup: {len(done)} signatures compiled "
                  + ", ".join(_fmt(sig) for sig in done))
        return done

    # ------------------------------------------------- per-signal methods
    # API parity with reference MisinfoForensics; each rides the batched
    # engine (these are conveniences — the fused program is the hot path).

    def analyze_text(self, text: str) -> Dict[str, float]:
        """Reference analyze_text (misinfo_forensics.py:319-352)."""
        out = self._analyze_batch_internal([{"text": text}])[0]
        return {"ai_score": out["scores"]["ai_score"],
                "misinfo_score": out["scores"]["misinfo_score"]}

    def analyze_image(self, image_path) -> Dict[str, float]:
        """Reference analyze_image (misinfo_forensics.py:354-373)."""
        out = self._analyze_batch_internal([{"image": image_path}])[0]
        return {"deepfake_score": out["scores"]["deepfake_score"]}

    def analyze_consistency(self, text: str, image_path) -> Dict[str, float]:
        """Reference analyze_consistency (misinfo_forensics.py:375-408)."""
        out = self._analyze_batch_internal([{"text": text, "image": image_path}])[0]
        return {"clip_similarity": out["scores"]["clip_similarity"]}

    def search_vault(self, image_path, user_caption: Optional[str] = None,
                     top_k: Optional[int] = None) -> Dict:
        """Reference search_vault (misinfo_forensics.py:410-491)."""
        if not self.vault_loaded:
            return TruthVault.empty_result()
        req = {"image": image_path}
        if user_caption:
            req["text"] = user_caption
        out = self._analyze_batch_internal([req])[0]
        return {
            "vault_discrepancy": out["scores"]["vault_discrepancy"],
            "matches": out["vault_matches"],
            "vault_available": True,
            "text_similarity": out["scores"]["text_similarity"],
        }

    def fusion_verdict(self, scores: Dict[str, float]) -> Dict:
        """Reference fusion_verdict (misinfo_forensics.py:575-615)."""
        from misinfo_tpu.models.fusion import fusion_apply
        vec = jnp.asarray([[
            scores.get("ai_score", 0.0),
            scores.get("misinfo_score", 0.0),
            scores.get("deepfake_score", 0.0),
            scores.get("clip_similarity", 0.0),
            scores.get("vault_discrepancy", 0.0),
        ]], jnp.float32)
        probs = np.asarray(jax.nn.softmax(
            fusion_apply(self.params["fusion"], vec), axis=-1))[0]
        real_p, fake_p = float(probs[0]), float(probs[1])
        verdict = 1 if fake_p > self.cfg.thresholds.fake_decision else 0
        return {"verdict": verdict,
                "confidence": fake_p if verdict == 1 else real_p,
                "fake_probability": fake_p,
                "real_probability": real_p}

    # --------------------------------------------------------- analyze()

    def analyze(self, text: Optional[str] = None,
                image_path: Optional[str] = None,
                video_path: Optional[str] = None,
                verbose: bool = True) -> Dict:
        """Complete forensic pipeline; report dict identical to reference
        analyze (misinfo_forensics.py:767-927)."""
        if not text and not image_path and not video_path:
            raise ValueError("Provide at least one of: text, image_path, or video_path")
        req: Dict = {}
        if text:
            req["text"] = text
        if image_path is not None:
            req["image"] = image_path
        if video_path is not None:
            req["video"] = video_path
        report = self._analyze_batch_internal([req], explanations=True)[0]
        if verbose:
            self._print_report(req, report)
        return report

    def analyze_batch(self, requests: List[Dict],
                      explanations: bool = False) -> List[Dict]:
        """Batched analyze: list of {text?, image?, video?} dicts. Requests
        are grouped per modality-variant and padded to bucket sizes, so the
        whole batch runs in a handful of fused program invocations."""
        return self._analyze_batch_internal(requests, explanations)

    def analyze_stream(self, requests, batch_size: Optional[int] = None,
                       explanations: bool = False):
        """Pipelined bulk analyze: iterate `requests` (any iterable of
        request dicts), run them in `batch_size` groups with ONE batch in
        flight, and yield report dicts in input order.

        While batch N executes on device, batch N+1's host prep
        (tokenize, image decode) and dispatch proceed — the
        `analyze_batch_async` overlap that measured +63% over synchronous
        `analyze_batch` through a remote-attached TPU (docs/PERF.md). The
        throughput surface for offline sweeps and `--batch-file`-style
        callers; concurrent online callers use engine.batching instead."""
        import itertools

        batch_size = batch_size or max(self.cfg.serving.batch_buckets)
        it = iter(requests)
        pending = None
        while True:
            chunk = list(itertools.islice(it, batch_size))
            nxt = (self.analyze_batch_async(chunk, explanations)
                   if chunk else None)
            if pending is not None:
                yield from pending()
            pending = nxt
            if nxt is None:
                return

    def _analyze_batch_internal(self, requests: List[Dict],
                                explanations: bool = False) -> List[Dict]:
        from misinfo_tpu.utils.tracing import stage_timer
        _t = stage_timer("analyze", n_requests=len(requests))
        _t.__enter__()
        try:
            return self.__analyze_batch_body(requests, explanations)
        finally:
            _t.__exit__(None, None, None)

    def __analyze_batch_body(self, requests: List[Dict],
                             explanations: bool = False) -> List[Dict]:
        dispatches, results = self._dispatch_batch(requests)
        return self._finalize_batch(dispatches, results, requests, explanations)

    def analyze_batch_async(self, requests: List[Dict],
                            explanations: bool = False):
        """Pipelined form of analyze_batch: enqueues all device programs
        WITHOUT synchronizing and returns a zero-arg `finalize()` that
        blocks on completion and yields the report list. Lets a serving
        loop prep batch N+1 while batch N executes (engine/batching.py);
        matters doubly on remote-attached TPUs where each sync pays a full
        round trip (docs/PERF.md)."""
        from misinfo_tpu.utils.tracing import GLOBAL_TRACER
        t0 = time.perf_counter()
        dispatches, results = self._dispatch_batch(requests)

        def finalize() -> List[Dict]:
            out = self._finalize_batch(dispatches, results, requests,
                                       explanations)
            # async path feeds the same analyze counters as the sync one
            # (dispatch→finalize wall time; /metrics reads these)
            GLOBAL_TRACER.event("analyze", time.perf_counter() - t0,
                                n_requests=len(requests))
            return out

        return finalize

    def _dispatch_batch(self, requests: List[Dict]):
        """Group → prep → enqueue device programs (no host sync). Video
        requests batch into video_batch_buckets-sized groups and enqueue
        async like every other variant (host frame decode happens here;
        the device sync waits for _finalize_batch)."""
        groups: Dict[str, List[int]] = {}
        for i, r in enumerate(requests):
            if "video" in r:
                v = "video_text" if r.get("text") else "video"
            elif r.get("text") and "image" in r:
                v = "full"
            elif r.get("text"):
                v = "text_only"
            elif "image" in r:
                v = "visual_only"
            else:
                raise ValueError(f"request {i} has no modality")
            groups.setdefault(v, []).append(i)

        results: List[Optional[Dict]] = [None] * len(requests)
        dispatches = []
        for variant, group_idxs in groups.items():
            if variant.startswith("video"):
                # videos batch too: V videos → one [V·F]-frame program,
                # enqueued async like every other variant (host frame
                # decode happens here; device sync waits for finalize)
                vb = self.cfg.serving.video_batch_buckets
                for lo in range(0, len(group_idxs), vb[-1]):
                    chunk = group_idxs[lo:lo + vb[-1]]
                    out = self._analyze_video_group(
                        [requests[i] for i in chunk], variant)
                    dispatches.append((variant, out, chunk))
                continue
            # oversize groups split at the largest bucket — every chunk then
            # hits a known jit signature instead of minting a fresh
            # minutes-long TPU compile per novel batch size (VERDICT r1 #3)
            maxb = self.cfg.serving.batch_buckets[-1]
            for lo in range(0, len(group_idxs), maxb):
                idxs = group_idxs[lo:lo + maxb]
                dispatches.append(self._dispatch_group(requests, variant, idxs))
        return dispatches, results

    def _dispatch_group(self, requests: List[Dict], variant: str,
                        idxs: List[int]):
        """Prep + enqueue one ≤max-bucket group of same-variant requests."""
        reqs = [requests[i] for i in idxs]
        bucket = self._req_bucket(len(reqs), self.cfg.serving.batch_buckets)
        pack_mode = self.cfg.serving.pack_text
        pack = pack_mode is True and variant in ("full", "text_only")
        plan = None
        if pack_mode == "auto" and variant in ("full", "text_only"):
            # pack only when it strictly beats the dense bucketed layout
            # in padded tokens (same row length either way, so the test
            # is the bucketed packed row count vs the request bucket,
            # with a 25% margin for the packed program's gather
            # overhead). The plan (tokenized seqs + trial packed batch)
            # is reused by whichever layout wins — no re-tokenization,
            # no re-packing.
            texts = [r.get("text", "") for r in reqs]
            seqs, row_len = self._text_pack_plan(texts)
            packed, rows = self._packed_rows_bucketed(seqs, row_len, bucket)
            plan = (seqs, row_len, packed, rows)
            pack = rows * 4 <= bucket * 3
        batch: Dict = {}
        if pack:
            texts = [r.get("text", "") for r in reqs]
            batch.update(self._pack_text_batch(texts, bucket, plan=plan))
            if variant == "full":   # CLIP rows stay per-request (77 tok)
                cl_len = self._cl_len
                cl_ids, cl_mask = self.clip_tokenizer.batch(
                    texts + [""] * (bucket - len(texts)), cl_len)
                batch.update(clip_ids=jnp.asarray(cl_ids),
                             clip_mask=jnp.asarray(cl_mask))
        elif variant in ("full", "text_only"):
            texts = [r.get("text", "") for r in reqs]
            if plan is not None:     # auto decided dense: reuse tokens
                from misinfo_tpu.preprocess.packing import (
                    dense_rows_from_seqs)
                rb_ids, rb_mask = dense_rows_from_seqs(
                    plan[0], bucket, plan[1],
                    self.det_cfg.roberta.pad_token_id)
                cl_len = self._cl_len
                cl_ids, cl_mask = self.clip_tokenizer.batch(
                    texts + [""] * (bucket - len(texts)), cl_len)
            else:
                rb_ids, rb_mask, cl_ids, cl_mask = self._tokenize_batch(
                    texts, bucket)
            batch.update(roberta_ids=jnp.asarray(rb_ids),
                         roberta_mask=jnp.asarray(rb_mask),
                         clip_ids=jnp.asarray(cl_ids),
                         clip_mask=jnp.asarray(cl_mask))
        if variant in ("full", "visual_only"):
            batch.update(self._image_batch(
                [r.get("image") for r in reqs], bucket))
        batch = self._place_batch(batch)
        batch.update(self._vault_device)
        out = self._pack_out(
            self.programs.call(variant, self.params, batch))  # async
        return variant, out, idxs

    def _finalize_batch(self, dispatches, results, requests: List[Dict],
                        explanations: bool = False) -> List[Dict]:
        from misinfo_tpu.utils.tracing import stage_timer
        from misinfo_tpu.engine.signals import unpack_signal_output
        for variant, out, idxs in dispatches:
            with stage_timer(f"program_{variant}", batch_size=len(idxs)):
                out = unpack_signal_output(np.asarray(out))  # ONE transfer
            for row, i in enumerate(idxs):
                results[i] = self._format_report(out, row, requests[i])

        if explanations:
            for r in results:
                r["explanation"] = self.explainer.explain(r["scores"],
                                                          r["vault_matches"])
        else:
            for r in results:
                r.setdefault("explanation", "")
        return results

    def _analyze_video_group(self, reqs: List[Dict], variant: str):
        """V video requests → ONE [V·F]-frame program launch → packed
        result buffer. Frame sampling/decoding runs per video on host
        threads; padded videos carry all-invalid frame masks (their rows
        are discarded)."""
        from misinfo_tpu.preprocess.video import sample_video_frames
        F = self.cfg.video.max_frames
        V = self._req_bucket(len(reqs), self.cfg.serving.video_batch_buckets)
        size = self.cfg.seq.image_size

        def sample(req):
            if req is None:
                return [], np.zeros((F,), np.bool_)
            return sample_video_frames(req["video"], F,
                                       self.cfg.video.stride_seconds,
                                       self.cfg.video.fps_fallback)

        padded_reqs = list(reqs) + [None] * (V - len(reqs))
        sampled = self._prep_map(sample, padded_reqs)

        valids = [np.asarray(valid, np.bool_) for _, valid in sampled]
        if self.cfg.serving.device_resize:
            # stage raw frames; both 224px flavors derive on device —
            # saves 2 host resizes × V·F frames (ops/resize.py)
            raw = []
            for frames, _ in sampled:
                raw += ([np.asarray(f, np.uint8) for f in frames]
                        + [None] * (F - len(frames)))
            batch: Dict = self._stage_images(raw, V * F)
        else:
            eff_frames, clip_frames = [], []
            for frames, _ in sampled:
                pad = [None] * (F - len(frames))
                eff_frames += [image_to_array(f, "effnet", size)
                               for f in frames] + pad
                clip_frames += [image_to_array(f, "clip", size)
                                for f in frames] + pad
            batch = {
                "image_effnet": jnp.asarray(batch_images(eff_frames, size)),
                "image_clip": jnp.asarray(batch_images(clip_frames, size)),
            }
        batch["frame_valid"] = jnp.asarray(np.stack(valids))   # [V, F]
        if variant == "video_text":
            texts = [r.get("text", "") if r else "" for r in padded_reqs]
            rb_ids, rb_mask, cl_ids, cl_mask = self._tokenize_batch(texts, V)
            batch.update(roberta_ids=jnp.asarray(rb_ids),
                         roberta_mask=jnp.asarray(rb_mask),
                         clip_ids=jnp.asarray(cl_ids),
                         clip_mask=jnp.asarray(cl_mask))
        batch = self._place_batch(batch)
        batch.update(self._vault_device)
        return self._pack_out(
            self.programs.call(variant, self.params, batch))  # async

    # ------------------------------------------------------- formatting

    def _format_report(self, out: SignalOutput, row: int, req: Dict) -> Dict:
        scores = {
            "ai_score": float(out.ai_score[row]),
            "misinfo_score": float(out.misinfo_score[row]),
            "deepfake_score": float(out.deepfake_score[row]),
            "clip_similarity": float(out.clip_similarity[row]),
            "vault_discrepancy": float(out.vault_discrepancy[row]),
            "text_similarity": float(out.text_similarity[row]),
        }
        matches: List[Dict] = []
        vault = self.vault  # snapshot: hot reload may swap it mid-request
        if vault is not None and ("image" in req or "video" in req):
            idxs = out.vault_top_idx[row]
            sims = out.vault_top_sims[row]
            if idxs[0] >= 0:
                matches = vault.matches_from_indices(idxs, sims)
        # on-demand caption-vs-headline similarity when the vault lacks
        # precomputed title text embeddings (reference :468-484 parity path)
        if (matches and req.get("text")
                and scores["vault_discrepancy"] > self.cfg.thresholds.vault_reuse
                and vault.text_embeddings is None):
            scores["text_similarity"] = self._caption_title_similarity(
                req["text"], matches[0]["title"])
        verdict = int(out.verdict[row])
        scores.update({
            "verdict": verdict,
            "confidence": float(out.confidence[row]),
            "fake_probability": float(out.fake_probability[row]),
            "real_probability": float(out.real_probability[row]),
        })
        return {
            "verdict": verdict,
            "verdict_text": "FAKE" if verdict == 1 else "REAL",
            "confidence": float(out.confidence[row]),
            "scores": scores,
            "vault_matches": matches,
        }

    def _caption_title_similarity(self, caption: str, title: str) -> float:
        cl_len = self._cl_len
        ids, mask = self.clip_tokenizer.batch([caption, title], cl_len)
        emb = np.asarray(self._clip_text_jit(self.params["clip"],
                                             jnp.asarray(ids), jnp.asarray(mask)))
        return float(np.dot(emb[0], emb[1]))

    def _print_report(self, req: Dict, report: Dict) -> None:
        """Step-by-step forensic report, same six-step structure as the
        reference's verbose analyze() (misinfo_forensics.py:785-918)."""
        s = report["scores"]
        has_text = bool(req.get("text"))
        has_visual = req.get("image") is not None or bool(req.get("video"))
        print("\n" + "=" * 70)
        print("MISINFORMATION FORENSICS ANALYSIS (TPU engine)")
        print("=" * 70)
        print("\n[Step 1] Text Analysis (RoBERTa Dual Heads)...")
        if has_text:
            print(f"  - AI-Generated Score: {s['ai_score']:.2%}")
            print(f"  - Misinfo/Propaganda Score: {s['misinfo_score']:.2%}")
        else:
            print("  - Skipped (no text provided)")
        step2 = ("Video Forensics (Frame Sampling)" if req.get("video")
                 else "Visual Forensics (EfficientNet)")
        print(f"\n[Step 2] {step2}...")
        if has_visual:
            print(f"  - Deepfake Probability: {s['deepfake_score']:.2%}")
        else:
            print("  - Skipped (no image/video provided)")
        print("\n[Step 3] Image-Text Consistency (CLIP)...")
        if has_text and has_visual:
            print(f"  - CLIP Similarity: {s['clip_similarity']:.4f}")
        else:
            print("  - Skipped (missing modality)")
        print("\n[Step 4] Truth Vault Search...")
        if has_visual and self.vault_loaded:
            print(f"  - Historical Discrepancy: {s['vault_discrepancy']:.2%}")
            if report["vault_matches"]:
                m = report["vault_matches"][0]
                print(f"  - Top Match: \"{m['title']}\"")
                print(f"    Image Similarity: {m['similarity']:.1%}")
                if s.get("text_similarity", 0.0) > 0:
                    print(f"    Text Similarity: {s['text_similarity']:.2%}")
        elif has_visual:
            print("  - Vault not available")
        else:
            print("  - Skipped (no image/video provided)")
        print("\n[Step 5] Verdict...")
        print(f"  Final Verdict: {report['verdict_text']}")
        print(f"  - Confidence: {report['confidence']:.1%}")
        if report.get("explanation"):
            print("\n[Step 6] Forensic Summary...")
            print("=" * 70)
            print(report["explanation"])
        print("=" * 70)
