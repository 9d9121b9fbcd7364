"""The fused 5-signal XLA programs — the serving hot path.

The reference runs five sequential PyTorch calls with a host↔device round
trip each plus a host numpy kNN (call stack at SURVEY.md §3.2). Here each
modality combination is ONE jit'd program (SURVEY.md §7 design move 1):

    (roberta tokens, clip tokens, clip image, effnet image, vault)
        → (5 scores, verdict, probabilities, top-k matches)

Three static variants replicate the reference's gating arithmetic exactly
(reference misinfo_forensics.py:879-899):

  * ``full``        — text AND visual → fusion MLP verdict
  * ``text_only``   — fake_prob = misinfo_score
  * ``visual_only`` — fake_prob = max(deepfake, vault_discrepancy)

plus a ``video`` program that treats sampled frames as a batch axis and
applies the reference's mean/mean/max aggregation (reference :563-573)
on device before the verdict.

All branches execute back-to-back inside one XLA program; uint8 images are
normalized on device; the vault matmul rides the MXU.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from misinfo_tpu.core.config import ForensicsConfig
from misinfo_tpu.models.detector import DetectorConfig
from misinfo_tpu.models.roberta import dual_head_logits
from misinfo_tpu.models.clip import clip_text_features, clip_image_features
from misinfo_tpu.models.efficientnet import effnet_apply
from misinfo_tpu.models.fusion import fusion_apply
from misinfo_tpu.ops.common import Policy, l2_normalize, softmax_f32
from misinfo_tpu.ops.image_ops import normalize_images
from misinfo_tpu.vault.search import vault_search


class SignalOutput(NamedTuple):
    """Score vector + verdict per request. Field names mirror the
    reference's report dict keys (misinfo_forensics.py:866-872, 920-927)."""

    ai_score: jax.Array            # [B]
    misinfo_score: jax.Array       # [B]
    deepfake_score: jax.Array      # [B]
    clip_similarity: jax.Array     # [B]
    vault_discrepancy: jax.Array   # [B]
    text_similarity: jax.Array     # [B]
    verdict: jax.Array             # [B] int32 (1=FAKE)
    confidence: jax.Array          # [B]
    fake_probability: jax.Array    # [B]
    real_probability: jax.Array    # [B]
    vault_top_sims: jax.Array      # [B, K]
    vault_top_idx: jax.Array       # [B, K]


# Columns of the packed result layout: the ten per-request vectors of
# SignalOutput, in field order, ahead of the K top-sims and K top-idx.
_N_VEC_FIELDS = 10


def pack_signal_output(out: SignalOutput) -> jax.Array:
    """Coalesce a SignalOutput into ONE f32 array ``[B, 10 + 2K]``.

    The engine fetches program results to host per batch; a pytree fetch
    pays one device->host round trip PER LEAF (12 for SignalOutput —
    ~25 ms each on a relay-attached TPU, docs/PERF.md), so results are
    packed on device into a single buffer and fetched with a single
    transfer. Scores cast to f32 (bf16 serving buffers widen losslessly);
    ``vault_top_idx`` is int32 BITCAST to f32 — exact for every index
    value, unlike a value cast which would corrupt row ids past 2^24 in
    billion-row sharded vaults. ``unpack_signal_output`` inverts this on
    host.
    """
    vecs = jnp.stack([
        out.ai_score, out.misinfo_score, out.deepfake_score,
        out.clip_similarity, out.vault_discrepancy, out.text_similarity,
        out.verdict.astype(jnp.float32), out.confidence,
        out.fake_probability, out.real_probability,
    ], axis=1).astype(jnp.float32)                                 # [B, 10]
    idx_f = jax.lax.bitcast_convert_type(
        out.vault_top_idx.astype(jnp.int32), jnp.float32)          # [B, K]
    return jnp.concatenate(
        [vecs, out.vault_top_sims.astype(jnp.float32), idx_f], axis=1)


def unpack_signal_output(arr) -> SignalOutput:
    """Host-side inverse of ``pack_signal_output`` (numpy in, numpy out)."""
    import numpy as np

    arr = np.asarray(arr, np.float32)
    K = (arr.shape[1] - _N_VEC_FIELDS) // 2
    v = arr[:, :_N_VEC_FIELDS]
    sims = arr[:, _N_VEC_FIELDS:_N_VEC_FIELDS + K]
    idx = np.ascontiguousarray(
        arr[:, _N_VEC_FIELDS + K:]).view(np.int32)
    return SignalOutput(
        ai_score=v[:, 0], misinfo_score=v[:, 1], deepfake_score=v[:, 2],
        clip_similarity=v[:, 3], vault_discrepancy=v[:, 4],
        text_similarity=v[:, 5], verdict=v[:, 6].astype(np.int32),
        confidence=v[:, 7], fake_probability=v[:, 8],
        real_probability=v[:, 9], vault_top_sims=sims, vault_top_idx=idx)


def _text_branch(params, batch, det_cfg, policy, use_pallas,
                 mesh_gather: bool = False):
    if "roberta_seg" in batch:
        # packed rows (preprocess/packing.py): block-diagonal attention,
        # per-segment positions, CLS scores gathered per request
        from misinfo_tpu.models.roberta import head_apply, roberta_encode
        hidden = roberta_encode(
            params["roberta"], batch["roberta_ids"], batch["roberta_mask"],
            det_cfg.roberta, policy, use_pallas=use_pallas,
            position_ids=batch["roberta_pos"],
            segment_ids=batch["roberta_seg"])
        if mesh_gather:
            # Mesh serving (VERDICT r2 #1): the (row, col) CLS gather
            # crosses shard boundaries when rows are data-sharded, which
            # GSPMD resolves by all-gathering the FULL [R, L, D] hidden
            # states (~R·L·D·2 bytes over ICI). A one-hot contraction is
            # the collective-friendly form: each shard contracts its local
            # rows and GSPMD reduces only the [N, D] result. Exact math —
            # one nonzero per one-hot row selects the value unchanged.
            R, L, D = hidden.shape
            flat_idx = batch["cls_rows"] * L + batch["cls_cols"]   # [N]
            onehot = jax.nn.one_hot(flat_idx, R * L, dtype=hidden.dtype)
            # policy precision: f32 parity mode must not round the selected
            # CLS values through a default-precision (bf16-pass) contraction
            pooled = jnp.dot(onehot, hidden.reshape(R * L, D),
                             precision=policy.precision).astype(hidden.dtype)
        else:
            pooled = hidden[batch["cls_rows"], batch["cls_cols"]]  # [N, D]
        ai_logits = head_apply(params["ai_head"], pooled, policy=policy)
        mis_logits = head_apply(params["misinfo_head"], pooled, policy=policy)
    else:
        ai_logits, mis_logits = dual_head_logits(
            params["roberta"], params["ai_head"], params["misinfo_head"],
            batch["roberta_ids"], batch["roberta_mask"],
            det_cfg.roberta, policy, use_pallas=use_pallas)
    ai_score = softmax_f32(ai_logits)[:, 1]
    misinfo_score = softmax_f32(mis_logits)[:, 1]
    return ai_score, misinfo_score


def _visual_branch(params, batch, det_cfg, cfg, policy, use_pallas,
                   caption_text_emb=None, has_caption=None, mesh=None):
    if "image_staged" in batch:
        # on-device resize (ops/resize.py): the host shipped one padded
        # frame per image; both 224px flavors are derived here as part of
        # the fused program (ServingConfig.device_resize)
        from misinfo_tpu.ops.resize import device_resize_pair
        eff_u8, clip_u8 = device_resize_pair(
            batch["image_staged"], batch["resize_params"],
            out_size=cfg.seq.image_size)
    else:
        eff_u8, clip_u8 = batch["image_effnet"], batch["image_clip"]
    img_eff = normalize_images(eff_u8, "imagenet", policy.compute)
    img_clip = normalize_images(clip_u8, "clip", policy.compute)
    logits, _ = effnet_apply(params["efficientnet"], img_eff, policy=policy)
    deepfake_score = softmax_f32(logits)[:, 1]
    image_emb = l2_normalize(clip_image_features(
        params["clip"], img_clip, det_cfg.clip, policy, use_pallas))
    if mesh is not None:
        # >HBM vault: rows live sharded across the mesh's data axis;
        # shard_map local-topk + candidate merge (vault/search.py)
        from misinfo_tpu.vault.search import vault_search_sharded
        vr = vault_search_sharded(
            image_emb, batch["vault_emb"], batch["vault_valid"],
            mesh=mesh, top_k=cfg.seq.vault_top_k,
            reuse_threshold=cfg.thresholds.vault_reuse,
            caption_text_emb=caption_text_emb,
            vault_text_emb=batch.get("vault_text_emb"),
            has_caption=has_caption,
            vault_scale=batch.get("vault_scale"),
            vault_text_scale=batch.get("vault_text_scale"))
        return deepfake_score, image_emb, vr
    ivf = ({k: batch[k]
            for k in ("ivf_centroids", "ivf_lists", "ivf_spill", "ivf_emb16")
            if k in batch}
           if "ivf_centroids" in batch else None)
    vr = vault_search(
        image_emb, batch["vault_emb"], batch["vault_valid"],
        top_k=cfg.seq.vault_top_k,
        reuse_threshold=cfg.thresholds.vault_reuse,
        caption_text_emb=caption_text_emb,
        vault_text_emb=batch.get("vault_text_emb"),
        has_caption=has_caption,
        ivf=ivf, nprobe=cfg.serving.ivf_nprobe,
        vault_scale=batch.get("vault_scale"),
        vault_text_scale=batch.get("vault_text_scale"))
    return deepfake_score, image_emb, vr


def _verdict_from_fusion(params, scores_vec):
    logits = fusion_apply(params["fusion"], scores_vec)
    probs = softmax_f32(logits)
    real_p, fake_p = probs[:, 0], probs[:, 1]
    verdict = (fake_p > 0.5).astype(jnp.int32)
    confidence = jnp.where(verdict == 1, fake_p, real_p)
    return verdict, confidence, fake_p, real_p


def _verdict_from_prob(fake_p):
    """Fallback verdict arithmetic (reference misinfo_forensics.py:890-899)."""
    fake_p = jnp.clip(fake_p, 0.0, 1.0)
    real_p = 1.0 - fake_p
    verdict = (fake_p > 0.5).astype(jnp.int32)
    confidence = jnp.where(verdict == 1, fake_p, real_p)
    return verdict, confidence, fake_p, real_p


def signals_program(
    params: Dict,
    batch: Dict[str, jax.Array],
    *,
    variant: str,                       # 'full' | 'text_only' | 'visual_only'
    det_cfg: DetectorConfig,
    cfg: ForensicsConfig,
    policy: Policy,
    use_pallas: bool = False,
    vault_mesh=None,
    mesh_gather: bool = False,
) -> SignalOutput:
    B = (batch["cls_rows"].shape[0] if "cls_rows" in batch  # packed: N requests
         else batch["roberta_ids"].shape[0] if "roberta_ids" in batch
         else batch["image_staged"].shape[0] if "image_staged" in batch
         else batch["image_clip"].shape[0])
    zeros = jnp.zeros((B,), jnp.float32)
    K = cfg.seq.vault_top_k

    if variant == "text_only":
        ai, mis = _text_branch(params, batch, det_cfg, policy, use_pallas,
                               mesh_gather=mesh_gather)
        verdict, conf, fake_p, real_p = _verdict_from_prob(mis)
        return SignalOutput(ai, mis, zeros, zeros, zeros, zeros,
                            verdict, conf, fake_p, real_p,
                            jnp.zeros((B, K)), jnp.full((B, K), -1, jnp.int32))

    if variant == "visual_only":
        deep, _, vr = _visual_branch(params, batch, det_cfg, cfg, policy,
                                     use_pallas, mesh=vault_mesh)
        fake_p = jnp.maximum(deep, vr.vault_discrepancy)
        verdict, conf, fake_p, real_p = _verdict_from_prob(fake_p)
        return SignalOutput(zeros, zeros, deep, zeros, vr.vault_discrepancy,
                            vr.text_similarity, verdict, conf, fake_p, real_p,
                            vr.top_sims, vr.top_idx)

    if variant == "full":
        ai, mis = _text_branch(params, batch, det_cfg, policy, use_pallas,
                               mesh_gather=mesh_gather)
        cap_emb = l2_normalize(clip_text_features(
            params["clip"], batch["clip_ids"], batch["clip_mask"],
            det_cfg.clip, policy, use_pallas))
        deep, img_emb, vr = _visual_branch(
            params, batch, det_cfg, cfg, policy, use_pallas,
            caption_text_emb=cap_emb,
            has_caption=jnp.ones((B,), jnp.bool_), mesh=vault_mesh)
        clip_sim = jnp.sum(cap_emb * img_emb, axis=-1)
        scores_vec = jnp.stack([ai, mis, deep, clip_sim,
                                vr.vault_discrepancy], axis=1)
        verdict, conf, fake_p, real_p = _verdict_from_fusion(params, scores_vec)
        return SignalOutput(ai, mis, deep, clip_sim, vr.vault_discrepancy,
                            vr.text_similarity, verdict, conf, fake_p, real_p,
                            vr.top_sims, vr.top_idx)

    raise ValueError(f"unknown variant {variant!r}")


def packed_text_program(
    params: Dict,
    batch: Dict[str, jax.Array],
    *,
    det_cfg: DetectorConfig,
    cfg: ForensicsConfig,
    policy: Policy,
    use_pallas: bool = False,
    mesh_gather: bool = False,
) -> SignalOutput:
    """text_only variant over a PACKED token matrix (preprocess/packing.py):
    multiple ragged requests per row, block-diagonal attention, per-segment
    positions, CLS scores gathered at (cls_rows, cls_cols). Verdict
    semantics identical to `text_only` (reference misinfo_forensics.py:
    883-889: fake_prob = misinfo_score). The packed keys in ``batch`` route
    `_text_branch` onto the packed path, so `full` batches may carry them
    too (engine pack_text handles both)."""
    return signals_program(params, batch, variant="text_only",
                           det_cfg=det_cfg, cfg=cfg, policy=policy,
                           use_pallas=use_pallas, mesh_gather=mesh_gather)


def video_program(
    params: Dict,
    batch: Dict[str, jax.Array],
    *,
    has_text: bool,
    det_cfg: DetectorConfig,
    cfg: ForensicsConfig,
    policy: Policy,
    use_pallas: bool = False,
    vault_mesh=None,
    mesh_gather: bool = False,
) -> SignalOutput:
    """Video forensics: frames stacked on the batch axis (SURVEY.md §7
    design move 3), generalized to V videos per launch. `frame_valid` is
    [F] (single video, legacy shape) or [V, F]; images are [V·F, H, W, 3]
    and text tensors [V, S]. Per-video aggregation matches reference
    analyze_video (misinfo_forensics.py:563-573): mean deepfake, mean
    clip-sim, MAX vault discrepancy (that frame's matches win); then the
    standard verdict gating. Outputs are [V].
    """
    fv_in = batch["frame_valid"]
    fv = (fv_in[None, :] if fv_in.ndim == 1 else fv_in).astype(jnp.float32)
    V, F = fv.shape
    n = jnp.maximum(jnp.sum(fv, axis=1), 1.0)               # [V]

    if has_text:
        ai, mis = _text_branch(params, batch, det_cfg, policy, use_pallas,
                               mesh_gather=mesh_gather)
        ai, mis = ai[:V], mis[:V]
        cap_emb = l2_normalize(clip_text_features(
            params["clip"], batch["clip_ids"], batch["clip_mask"],
            det_cfg.clip, policy, use_pallas))[:V]          # [V, D]
        cap_per_frame = jnp.repeat(cap_emb, F, axis=0)      # [V·F, D]
    else:
        ai = mis = jnp.zeros((V,), jnp.float32)
        cap_emb = cap_per_frame = None

    deep, img_emb, vr = _visual_branch(
        params, batch, det_cfg, cfg, policy, use_pallas,
        caption_text_emb=cap_per_frame,
        has_caption=(jnp.ones((V * F,), jnp.bool_) if has_text else None),
        mesh=vault_mesh)

    deep_mean = jnp.sum(deep.reshape(V, F) * fv, axis=1) / n
    if cap_emb is not None:
        sims = jnp.sum(img_emb * cap_per_frame, axis=-1).reshape(V, F)
        clip_mean = jnp.sum(sims * fv, axis=1) / n
    else:
        clip_mean = jnp.zeros((V,), jnp.float32)

    vd = jnp.where(fv > 0, vr.vault_discrepancy.reshape(V, F), -1.0)
    best_f = jnp.argmax(vd, axis=1)                         # [V]
    rows = jnp.arange(V)
    vault_disc = jnp.maximum(vd[rows, best_f], 0.0)
    text_sim = vr.text_similarity.reshape(V, F)[rows, best_f]
    K = vr.top_sims.shape[-1]
    top_sims = vr.top_sims.reshape(V, F, K)[rows, best_f]
    top_idx = vr.top_idx.reshape(V, F, K)[rows, best_f]

    if has_text:
        scores_vec = jnp.stack([ai, mis, deep_mean, clip_mean, vault_disc], axis=1)
        verdict, conf, fake_p, real_p = _verdict_from_fusion(params, scores_vec)
    else:
        verdict, conf, fake_p, real_p = _verdict_from_prob(
            jnp.maximum(deep_mean, vault_disc))
    return SignalOutput(ai, mis, deep_mean, clip_mean, vault_disc, text_sim,
                        verdict, conf, fake_p, real_p, top_sims, top_idx)


class SignalPrograms:
    """Compiled program cache: one jit per (variant, batch bucket)."""

    def __init__(self, det_cfg: DetectorConfig, cfg: ForensicsConfig,
                 policy: Policy, use_pallas: bool = False,
                 vault_mesh=None, data_mesh=None, aot=None):
        self.det_cfg = det_cfg
        self.cfg = cfg
        self.policy = policy
        self.use_pallas = use_pallas
        self.vault_mesh = vault_mesh  # set → vault rows are mesh-sharded
        # set → request batches are data-sharded: packed CLS extraction
        # switches to the collective-friendly one-hot contraction
        self.data_mesh = data_mesh
        self._jitted: Dict[str, object] = {}
        # AOT-serialized executable registry (engine/aotcache.py): warmed
        # signatures loaded from disk dispatch through these callables —
        # they never enter the jit caches, so `call()` must consult this
        # dict first. None ⇒ the feature is off and call() is exactly
        # get()(…).
        self.aot = aot
        self._aot_loaded: Dict[tuple, object] = {}

    def get(self, variant: str):
        if variant not in self._jitted:
            if variant.startswith("video"):
                has_text = variant == "video_text"
                fn = functools.partial(
                    video_program, has_text=has_text, det_cfg=self.det_cfg,
                    cfg=self.cfg, policy=self.policy,
                    use_pallas=self.use_pallas, vault_mesh=self.vault_mesh,
                    mesh_gather=self.data_mesh is not None)
            elif variant == "text_packed":
                fn = functools.partial(
                    packed_text_program, det_cfg=self.det_cfg,
                    cfg=self.cfg, policy=self.policy,
                    use_pallas=self.use_pallas,
                    mesh_gather=self.data_mesh is not None)
            else:
                fn = functools.partial(
                    signals_program, variant=variant, det_cfg=self.det_cfg,
                    cfg=self.cfg, policy=self.policy,
                    use_pallas=self.use_pallas, vault_mesh=self.vault_mesh,
                    mesh_gather=self.data_mesh is not None)
            self._jitted[variant] = jax.jit(fn)
        return self._jitted[variant]

    def call(self, variant: str, params, batch):
        """Serving dispatch: an AOT-loaded executable when the signature
        was warmed from the disk registry, else the jit path. The shape-key
        probe is a few µs of host work against a ≥ms device program, and
        only runs when the opt-in cache is active."""
        if self.aot is not None:
            from misinfo_tpu.engine.aotcache import shape_key
            ex = self._aot_loaded.get((variant, shape_key(batch)))
            if ex is not None:
                return ex(params, batch)
        return self.get(variant)(params, batch)

    def warm(self, variant: str, params, batch):
        """Warmup-time load-or-compile for one signature.

        AOT hit: deserialize_and_load skips trace+lower+compile entirely
        (the measured −40%/signature restart lever, docs/PERF.md). Miss:
        lower+compile through the normal path (persistent compile cache
        applies) and serialize the executable for the next boot. Either
        way the resulting callable is registered for `call()` and executed
        once here — warmup's contract is that the first real request pays
        nothing."""
        if self.aot is None:
            return self.get(variant)(params, batch)
        from misinfo_tpu.engine.aotcache import shape_key
        key = (variant, shape_key(batch))
        ex = self._aot_loaded.get(key)
        if ex is not None:
            return ex(params, batch)
        digest = self.aot.digest(variant, batch)
        ex = self.aot.load(digest)
        if ex is not None:
            # registration is gated on one successful SYNCHRONOUS
            # execution: dispatch is async, so a stale executable that
            # deserializes but cannot run (seen on the XLA:CPU backend
            # cross-process — missing-function dispatch errors) only
            # surfaces its error at the data fetch. One warmup-time fetch
            # per loaded signature keeps such executables off the serving
            # path.
            try:
                out = ex(params, batch)
                from misinfo_tpu.utils.timing import sync_fetch
                sync_fetch(out)
                self._aot_loaded[key] = ex
                return out
            except Exception as e:
                self.aot.invalidate(digest, e)
        ex = self.get(variant).lower(params, batch).compile()
        self.aot.save(digest, ex)
        self._aot_loaded[key] = ex
        return ex(params, batch)
