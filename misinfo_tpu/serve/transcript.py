"""Whisper transcript extraction for the dashboard (C13, reference
forensics_dashboard.py:18-87).

Same soft-fail contract as the reference: returns the transcript text,
`""` when the capability is unavailable (no weights / no audio decoder /
detected silence), or a bracketed `[transcript error: ...]` string on
failure. The model size comes from the WHISPER_MODEL env var (reference
:48); the engine is lazily constructed and cached globally (reference
:15,46-49).

End-to-end path: audio decode (ffmpeg, or the stdlib WAV reader on
ffmpeg-less images) → log-mel → ONE encoder pass → no-speech gate →
temperature-fallback ladder sharing that encoding (greedy rung + one
traced-temperature sampled program, so retries never recompile) → byte-level
BPE decode via preprocess/whisper_tokenizer.py. Weights load from a native
checkpoint dir (checkpoints/io.py; metadata.json self-describes the model
config) or an HF-format torch file (checkpoints/torch_convert.convert_whisper).
"""

from __future__ import annotations

import os
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_engine = None
_engine_failed = False

_SIZES = {
    "tiny": dict(d_model=384, encoder_layers=4, decoder_layers=4, num_heads=6,
                 ffn_dim=1536),
    "base": dict(d_model=512, encoder_layers=6, decoder_layers=6, num_heads=8,
                 ffn_dim=2048),
    "small": dict(d_model=768, encoder_layers=12, decoder_layers=12,
                  num_heads=12, ffn_dim=3072),
    "medium": dict(d_model=1024, encoder_layers=24, decoder_layers=24,
                   num_heads=16, ffn_dim=4096),
    "large": dict(d_model=1280, encoder_layers=32, decoder_layers=32,
                  num_heads=20, ffn_dim=5120),
}


# The reference inherits openai-whisper's transcribe() defaults
# (forensics_dashboard.py:80-83): retry at rising temperatures when the
# decode looks degenerate (too-compressible = repetitive loops) or
# low-confidence; the last rung is accepted unconditionally. The constants
# live in core/config.py (WhisperDecodeConfig) like every other reference
# behavioral constant.
from misinfo_tpu.core.config import WhisperDecodeConfig

_DECODE_DEFAULTS = WhisperDecodeConfig()


def needs_fallback(text: str, avg_logprob: float,
                   compression_ratio_threshold: float =
                   _DECODE_DEFAULTS.compression_ratio_threshold,
                   logprob_threshold: float =
                   _DECODE_DEFAULTS.logprob_threshold) -> bool:
    """whisper/transcribe.py acceptance test: retry when the transcript
    compresses too well (token loops) or the mean token log-prob is low."""
    import zlib

    raw = text.encode("utf-8")
    if raw:
        ratio = len(raw) / max(len(zlib.compress(raw)), 1)
        if ratio > compression_ratio_threshold:
            return True
    return avg_logprob < logprob_threshold


class WhisperTranscriber:
    """Log-mel frontend + JAX Whisper decoding with whisper's
    temperature-fallback ladder and no-speech gate."""

    def __init__(self, checkpoint_dir: Optional[str] = None,
                 size: Optional[str] = None,
                 tokenizer_dir: Optional[str] = None,
                 decode_cfg: WhisperDecodeConfig = _DECODE_DEFAULTS,
                 mesh=None):
        import jax

        from misinfo_tpu.checkpoints.io import load_metadata
        from misinfo_tpu.models.whisper import WhisperConfig, whisper_init
        from misinfo_tpu.preprocess.whisper_tokenizer import (
            load_whisper_tokenizer, specials_for_vocab)

        self.decode_cfg = decode_cfg
        # tokenizer first: its special-token layout pins the decoder ids
        if tokenizer_dir is None and checkpoint_dir and os.path.isdir(
                os.path.join(str(checkpoint_dir), "tokenizer")):
            tokenizer_dir = os.path.join(str(checkpoint_dir), "tokenizer")
        self.tokenizer = load_whisper_tokenizer(tokenizer_dir)
        sp = self.tokenizer.specials

        size = size or os.getenv("WHISPER_MODEL", "base")
        kw = dict(_SIZES.get(size, _SIZES["base"]))
        meta = (load_metadata(str(checkpoint_dir))
                if checkpoint_dir and os.path.isdir(str(checkpoint_dir))
                else {})
        if isinstance(meta.get("whisper_config"), dict):
            # native checkpoints self-describe their architecture
            kw = {k: v for k, v in meta["whisper_config"].items()
                  if k in WhisperConfig.__dataclass_fields__}
        sd = None
        if checkpoint_dir and os.path.isfile(str(checkpoint_dir)):
            # HF torch file: the checkpoint's OWN shapes pin the
            # architecture. Building the model from a fallback tokenizer's
            # vocab instead would silently shape-skip the real token
            # embedding while the rest applies — a 'loaded' model that
            # decodes garbage (torch_convert.whisper_config_from_torch)
            from misinfo_tpu.checkpoints.torch_convert import (
                whisper_config_from_torch, whisper_state_dict)
            try:
                sd = whisper_state_dict(str(checkpoint_dir))
                kw.update(whisper_config_from_torch(sd))
            except Exception:
                sd = None
        kw.setdefault("vocab_size", sp.vocab_size)
        if kw["vocab_size"] == sp.vocab_size:
            kw.setdefault("eos_token_id", sp.eot)
            kw.setdefault("decoder_start_token_id", sp.sot)
        else:
            # checkpoint vocab ≠ loaded tokenizer: decoder ids follow the
            # canonical layout for that vocab (transcribe() stays gated
            # off by tokenizer_compatible below)
            csp = specials_for_vocab(kw["vocab_size"])
            kw.setdefault("eos_token_id", csp.eot)
            kw.setdefault("decoder_start_token_id", csp.sot)
        self.cfg = WhisperConfig(**kw)

        self.params = whisper_init(jax.random.PRNGKey(0), self.cfg)
        self.has_weights = False
        if sd is not None:
            from misinfo_tpu.checkpoints.torch_convert import (
                apply_updates, convert_whisper)
            try:
                applied, skipped = apply_updates(self.params,
                                                 convert_whisper(sd))
                # the token embedding is load-bearing for decode: a
                # conversion that skipped it did not produce a usable model
                emb_skipped = any(p == ("decoder", "token_embedding")
                                  for p, _ in skipped)
                self.has_weights = applied > 0 and not emb_skipped
            except Exception:
                self.has_weights = False
        elif checkpoint_dir and os.path.isdir(str(checkpoint_dir)):
            from misinfo_tpu.checkpoints.io import load_checkpoint
            restored = load_checkpoint(str(checkpoint_dir), self.params)
            if restored is not None:
                self.params = restored
                self.has_weights = True
        # the decoder can only emit text the tokenizer can spell: a
        # byte-fallback tokenizer against a 51865-vocab model (or any other
        # mismatch) is NOT a working capability
        self.tokenizer_compatible = (sp.vocab_size == self.cfg.vocab_size)
        # serving dtype discipline (same rule as the engine): bf16 storage
        # for the big kernels + token embedding — the KV-cached decoder
        # re-reads all of them every step (ops/serving.py; no-op in f32
        # parity mode)
        from misinfo_tpu.ops.common import DEFAULT_POLICY
        from misinfo_tpu.ops.serving import optimize_whisper_for_serving
        self.params = optimize_whisper_for_serving(self.params, DEFAULT_POLICY)
        # fused self-attn QKV for the decode step: exact math, one weight
        # stream instead of three per layer — measured +6.7% decode
        # throughput with the head-major cache layout (docs/PERF.md r3;
        # token-equality tested in tests/test_whisper_parity.py)
        from misinfo_tpu.models.whisper import fuse_whisper_decoder_qkv
        self.params = fuse_whisper_decoder_qkv(self.params)
        # fused Pallas decode step (WhisperDecodeConfig.pallas): the whole
        # decoder layer as two kernels — measured 113.2 vs 80.9 utt/s at b4
        # (docs/PERF.md round 4). "auto" → on for a real TPU backend with
        # no mesh and no int8 mode (Mosaic kernels; GSPMD has no
        # partitioning rules for them; quant keeps its own cache layouts).
        # Resolved BEFORE quant: the quant default depends on it.
        quant_req = decode_cfg.quant
        if quant_req not in ("auto", "", "none", "embedding", "int8",
                             "kernels"):
            # 'auto' gates a default behavioral mode, so a typo'd opt-in
            # ('in8', 'int4', …) silently resolving to exact decode would
            # be indistinguishable from 'none' — fail loudly instead
            raise ValueError(
                f"WhisperDecodeConfig.quant / WHISPER_QUANT: unknown value "
                f"{quant_req!r} (expected auto|none|embedding|int8|kernels)")
        if decode_cfg.pallas not in ("auto", "", "on", "off"):
            raise ValueError(
                f"WhisperDecodeConfig.pallas / WHISPER_PALLAS: unknown value "
                f"{decode_cfg.pallas!r} (expected auto|on|off)")
        if decode_cfg.pallas == "on":
            pallas = True
        elif decode_cfg.pallas == "off":
            pallas = False
        else:
            pallas = (quant_req != "int8" and mesh is None
                      and jax.devices()[0].platform == "tpu")
        # quant="auto" (the default): int8 weights INSIDE the fused
        # kernels + int8 embedding ("kernels") — exactly in the MEASURED
        # configuration: fused kernels active on a real TPU. Same-session
        # A/B at the fused baseline (docs/PERF.md round 5): kernels 148.6
        # vs embedding-only 122.5 utt/s (+21%; decode 25.1 → 19.5 ms at
        # b4). Fidelity: trained-model transcript equality under the
        # composition (tests/test_transcript_e2e.py,
        # tests/test_whisper_parity.py token equality), and the mode's
        # quantization is a strict SUBSET of the int8 streaming mode
        # (weights only, bf16 caches), whose token A/B measured 0/66
        # diverged with Δavg_logprob ≤4e-4 (round 4).
        if quant_req in ("auto", ""):
            quant_req = ("kernels"
                         if pallas and jax.devices()[0].platform == "tpu"
                         else "none")
        # "int8" = full int8 STREAMING decode (opt-in): dense kernels, the
        # [V, D] logits embedding, and (at cache init) the cross K/V store
        # int8 and feed double-rate int8 MXU dots. Applied AFTER the qkv
        # fuse (ops/serving.quantize_whisper_decoder).
        self.quant = quant_req == "int8"
        # "embedding": int8 token embedding + logits matmul ONLY; composes
        # with the pallas kernels (ops/serving.quantize_whisper_embedding)
        self.quant_embedding = quant_req == "embedding"
        # "kernels": int8 decoder weights INSIDE the fused Pallas kernels
        # (+ the int8 embedding) — halves the per-step weight stream that
        # remains the largest HBM term at the fused-decode floor
        # (docs/PERF.md round 4). Same param transform as the streaming
        # mode; the CACHES stay bf16 merged-lane (the kernels' layout) and
        # the decode flag `quant` stays False.
        self.quant_kernels = quant_req == "kernels"
        if self.quant or self.quant_kernels:
            from misinfo_tpu.ops.serving import quantize_whisper_decoder
            self.params = quantize_whisper_decoder(self.params)
        elif self.quant_embedding:
            from misinfo_tpu.ops.serving import quantize_whisper_embedding
            self.params = quantize_whisper_embedding(self.params)
        self.pallas = pallas
        if self.pallas and self.quant:
            raise ValueError("WhisperDecodeConfig: pallas='on' does not "
                             "compose with quant='int8' (pick one)")
        # optional jax.sharding.Mesh: params replicate across it and
        # multi-window decodes shard the window-batch axis over 'data'
        # (same DP story as the engine, §2.5; long clips batch 30 s
        # windows, so the batch axis is real work, not padding)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.params = jax.device_put(self.params,
                                         NamedSharding(mesh, P()))
        self._fns = None  # jitted programs, built lazily on first use
        # language of the most recent transcribe() (detected or pinned);
        # None until the first clip
        self.last_language: Optional[str] = None

    def _place(self, mel, prompt=None):
        """Mesh placement for one window batch: shard the batch axis over
        the mesh's 'data' axis when it divides evenly, else replicate
        (the 1-window dashboard case). No-op without a mesh."""
        if self.mesh is None:
            return mel, prompt
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = ("data" if "data" in self.mesh.axis_names
                else self.mesh.axis_names[0])
        b = axis if mel.shape[0] % self.mesh.shape[axis] == 0 else None
        mel = jax.device_put(mel, NamedSharding(self.mesh, P(b, None, None)))
        if prompt is not None:
            prompt = jax.device_put(prompt,
                                    NamedSharding(self.mesh, P(b, None)))
        return mel, prompt

    # -------------------------------------------------------- programs

    def _programs(self):
        if self._fns is not None:
            return self._fns
        import jax

        from misinfo_tpu.models.whisper import decode_transcript, whisper_encode
        from misinfo_tpu.ops.common import DEFAULT_POLICY

        cfg, policy = self.cfg, DEFAULT_POLICY
        sp = self.tokenizer.specials

        encode = jax.jit(lambda p, mel: whisper_encode(p, mel, cfg, policy))
        # both decode programs also return p(<|nospeech|>) captured from
        # the position-0 step inside the decode loop — the silence gate
        # costs no separate dispatch or compiled program
        quant = self.quant
        pallas = self.pallas

        def use_pallas(enc) -> bool:
            # resolved PER jit signature (the window batch is static at
            # trace time): the fused kernels' VMEM need scales with
            # batch × max_len × d_model, so big window buckets and big
            # models decode through the XLA path while the 1-window
            # dashboard case gets the kernels
            # (ops/pallas_cross_ffn.pallas_decode_max_batch)
            if not pallas:
                return False
            from misinfo_tpu.ops.pallas_cross_ffn import \
                pallas_decode_max_batch
            return enc.shape[0] <= pallas_decode_max_batch(
                cfg.d_model, cfg.ffn_dim, cfg.max_target_positions,
                enc.shape[1],
                # int8 decode weights (quant="kernels", the TPU default)
                # halve the kernels' weight VMEM — whisper-medium fits
                int8_weights=self.quant_kernels)

        def _greedy(p, enc, prompt):
            pk = use_pallas(enc)
            return decode_transcript(
                p, None, cfg, policy, prompt_tokens=prompt, enc_out=enc,
                nospeech_id=sp.no_speech, quant=quant,
                pallas_cross=pk, pallas_self_attn=pk)

        def _sampled(p, enc, prompt, t, rng):
            pk = use_pallas(enc)
            return decode_transcript(
                p, None, cfg, policy, prompt_tokens=prompt, temperature=t,
                rng=rng, enc_out=enc, nospeech_id=sp.no_speech, quant=quant,
                pallas_cross=pk, pallas_self_attn=pk)

        greedy = jax.jit(_greedy)
        # temperature is a TRACED scalar: every sampled rung reuses one
        # compiled program (TPU compiles are minutes; 5 rungs, 1 compile)
        sampled = jax.jit(_sampled)
        detect = None
        if sp.multilingual:
            from misinfo_tpu.models.whisper import detect_language
            import jax.numpy as jnp
            lang_ids = jnp.asarray([sp.language_ids[l] for l in sp.languages],
                                   jnp.int32)
            detect = jax.jit(lambda p, enc: detect_language(
                p, enc, sp.sot, lang_ids, cfg, policy))
        self._fns = (encode, greedy, sampled, detect)
        return self._fns

    # -------------------------------------------------------- warmup

    def warmup(self, buckets=(1,)) -> list:
        """Precompile the transcription programs for the given window
        buckets (encoder, greedy + sampled decode — the no-speech gate is
        fused into the decodes).

        Mirrors the engine's ``warmup()`` contract: cold TPU compiles take
        minutes through this image's remote tunnel, and the first
        video-with-audio request would otherwise pay that mid-request.
        Default warms only the 1-window bucket (a dashboard video ≤30 s);
        pass more buckets for long-clip deployments. No-op when the
        capability is degraded (no weights / tokenizer mismatch)."""
        if not self.has_weights or not self.tokenizer_compatible:
            return []
        import jax
        import jax.numpy as jnp

        from misinfo_tpu.utils.timing import sync_fetch

        if os.environ.get("MISINFO_TPU_TRANSCRIPT_ISOLATION",
                          "auto") not in ("0", "off", "false"):
            # pre-spawn the host-prep worker so the first transcript
            # request doesn't pay the process start (~1-2 s)
            self._host_pool()

        frames = 2 * self.cfg.max_source_positions
        encode, greedy, sampled, detect = self._programs()
        warmed = []
        for b in buckets:
            mel = jnp.zeros((b, frames, self.cfg.num_mel_bins), jnp.float32)
            prompt = jnp.asarray(
                [self.tokenizer.sot_sequence()[1:]] * b, jnp.int32)
            mel, prompt = self._place(mel, prompt)
            enc = encode(self.params, mel)
            greedy(self.params, enc, prompt)
            out = sampled(self.params, enc, prompt, jnp.float32(1.0),
                          jax.random.PRNGKey(0))
            # one scalar fetch of the LAST enqueued program syncs the whole
            # in-order stream (utils/timing.py relay semantics)
            sync_fetch(out)
            warmed.append(b)
        if detect is not None and not self.decode_cfg.language:
            # auto-detection runs on a 1-window encode: warm that signature
            # even when the caller only asked for wider buckets
            mel1, _ = self._place(
                jnp.zeros((1, frames, self.cfg.num_mel_bins), jnp.float32))
            sync_fetch(detect(self.params, encode(self.params, mel1)))
        return warmed

    # -------------------------------------------------------- transcribe

    def _host_prep(self, media_path: str):
        """Audio decode → windowing → log-mel: the transcript's host-side
        heavy half (preprocess/audio.prep_mel_windows). By default this
        runs in an ISOLATED low-priority worker process
        (`MISINFO_TPU_TRANSCRIPT_ISOLATION=auto|1|0`): on a 1-core host
        the in-thread version's numpy/ffmpeg CPU bursts starve the
        serving collector through the GIL and the shared core — measured
        as a ~30 s p50 for ALL traffic classes from ONE concurrent
        transcript (docs/PERF.md round 4) — while an os.nice'd subprocess
        is preempted at OS granularity and holds no GIL. Device steps
        stay in-process. Falls back inline if the worker can't spawn."""
        from misinfo_tpu.preprocess.audio import prep_mel_windows

        frames = 2 * self.cfg.max_source_positions
        max_w = self.decode_cfg.max_windows
        mode = os.environ.get("MISINFO_TPU_TRANSCRIPT_ISOLATION", "auto")
        if mode not in ("0", "off", "false"):
            pool = self._host_pool()
            if pool is not None:
                try:
                    mels, full = pool.submit(
                        prep_mel_windows, media_path, frames, max_w).result()
                except Exception:
                    import logging
                    logging.getLogger(__name__).warning(
                        "transcript host worker failed; running inline",
                        exc_info=True)
                    type(self)._POOL = None
                    type(self)._POOL_BROKEN = True
                    mels, full = prep_mel_windows(media_path, frames, max_w)
            else:
                mels, full = prep_mel_windows(media_path, frames, max_w)
        else:
            mels, full = prep_mel_windows(media_path, frames, max_w)
        if mels is not None and full > mels.shape[0]:
            import logging
            from misinfo_tpu.preprocess.audio import HOP_LENGTH
            logging.getLogger(__name__).warning(
                "transcribe: audio is %d windows but max_windows=%d — "
                "transcript truncated to the first %.0f s",
                full, max_w, mels.shape[0] * frames * HOP_LENGTH / 16000)
        return mels

    def _window_mels(self, audio: np.ndarray) -> np.ndarray:
        """In-memory variant of the host prep (tests / direct callers):
        same windowing as the worker path (preprocess/audio.mel_windows),
        max_windows cap applied, truncation logged."""
        from misinfo_tpu.preprocess.audio import mel_windows

        frames = 2 * self.cfg.max_source_positions
        mels, full = mel_windows(audio, frames, self.decode_cfg.max_windows)
        if full > mels.shape[0]:
            import logging
            logging.getLogger(__name__).warning(
                "transcribe: audio is %d windows but max_windows=%d",
                full, self.decode_cfg.max_windows)
        return mels

    _POOL = None
    _POOL_BROKEN = False

    @classmethod
    def _host_pool(cls):
        """Shared 1-worker spawn-context ProcessPoolExecutor (lazy).
        `spawn`, not fork: the parent holds a live JAX runtime and forked
        children deadlock in it. The child imports only numpy-side
        modules (preprocess/audio has no device deps) and drops its OS
        priority (_isolation_worker_init)."""
        if cls._POOL is None and not cls._POOL_BROKEN:
            try:
                import concurrent.futures as cf
                import multiprocessing as mp

                from misinfo_tpu.preprocess.audio import \
                    _isolation_worker_init
                cls._POOL = cf.ProcessPoolExecutor(
                    max_workers=1, mp_context=mp.get_context("spawn"),
                    initializer=_isolation_worker_init)
            except Exception:
                cls._POOL_BROKEN = True
        return cls._POOL

    def transcribe(self, media_path: str) -> str:
        """Transcribe a media file's audio track.

        Long audio is split into successive 30 s windows like
        whisper/transcribe.py's seek loop — but decoded as ONE batched
        program (single encoder pass + one batched KV-cached decode with
        EOS early-exit) rather than sequentially. Conscious divergence:
        no ``condition_on_previous_text`` prompt carry — a varying-length
        prev-text prompt would force a fresh minutes-long TPU compile per
        window, and dropping it is whisper's own recommended mitigation
        for repetition loops. The temperature ladder, acceptance checks,
        and no-speech gate apply PER WINDOW, exactly as whisper applies
        them per segment."""
        if not self.has_weights or not self.tokenizer_compatible:
            return ""  # capability absent → empty transcript (reference :32-34)
        mels = self._host_prep(media_path)
        if mels is None:
            return ""
        try:
            language = self._resolve_language(mels)
            dc = self.decode_cfg
            # chunk at the largest bucket so no clip length ever mints a
            # novel jit signature (same rule as the engine's video path)
            step = max(dc.window_buckets)
            kept: list = []
            for off in range(0, mels.shape[0], step):
                kept.extend(self._decode_window_batch(mels[off:off + step],
                                                      language))
            return " ".join(x for x in kept if x).strip()
        except Exception as e:
            return f"[transcript error: {e}]"

    def _resolve_language(self, mels: np.ndarray) -> str:
        """Language for this clip's decoder prompts.

        whisper/transcribe.py semantics, inherited by the reference's
        ``transcribe(audio, fp16=False)`` call (forensics_dashboard.py:
        80-83): a pinned ``decode_cfg.language`` wins; English-only (.en)
        layouts are always "en"; otherwise run ``detect_language`` on the
        FIRST 30 s window and condition every window of the clip on the
        detected language (whisper detects once per clip, not per
        segment)."""
        import jax.numpy as jnp

        sp = self.tokenizer.specials
        if self.decode_cfg.language:
            self.last_language = self.decode_cfg.language
            return self.decode_cfg.language
        if not sp.multilingual:
            self.last_language = "en"
            return "en"
        encode, _, _, detect = self._programs()
        mel1, _ = self._place(jnp.asarray(mels[:1]))
        idx, probs = detect(self.params, encode(self.params, mel1))
        i = int(np.asarray(idx)[0])
        lang = sp.languages[i]
        self.last_language = lang
        import logging
        logging.getLogger(__name__).info(
            "whisper: detected language %r (p=%.2f)",
            lang, float(np.asarray(probs)[0, i]))
        return lang

    def _decode_window_batch(self, mels: np.ndarray,
                             language: Optional[str] = None) -> list:
        """Temperature ladder + acceptance + silence gate over ≤bucket-max
        windows in one batched decode; returns the per-window texts that
        survive whisper's silence rule. ``language`` conditions the decoder
        prompt (clip-level, from :meth:`_resolve_language`)."""
        import jax
        import jax.numpy as jnp

        dc = self.decode_cfg
        n_w = mels.shape[0]
        # round the window batch up to a known jit signature; padding
        # windows repeat the last real window (decodes like speech →
        # early-exits; outputs discarded)
        bucket = min(b for b in dc.window_buckets if b >= n_w)
        if bucket > n_w:
            mels = np.concatenate(
                [mels, np.repeat(mels[-1:], bucket - n_w, axis=0)])
        encode, greedy, sampled, _ = self._programs()
        prompt = jnp.asarray(
            [self.tokenizer.sot_sequence(language=language)[1:]] * bucket,
            jnp.int32)
        mels_j, prompt = self._place(jnp.asarray(mels), prompt)
        enc = encode(self.params, mels_j)

        texts: list = [None] * n_w
        final_lp = np.zeros(n_w, np.float32)
        # p(<|nospeech|>) rides along with the first decode rung (fused
        # into the decode's position-0 step — identical for every rung)
        no_speech = None
        for t in dc.fallback_temperatures:
            if t == 0.0:
                tokens, lp, ns = greedy(self.params, enc, prompt)
                tokens, lp = np.asarray(tokens), np.asarray(lp)
                if no_speech is None:
                    no_speech = np.asarray(ns)
            else:
                # whisper's best_of: independent candidates per window,
                # keep the highest-avg-logprob one. Repeated calls of ONE
                # compiled program (not a wider batch) so retries never
                # mint a new jit signature.
                tokens, lp = None, None
                for draw in range(max(dc.best_of, 1)):
                    dt, dlp, ns = sampled(self.params, enc, prompt,
                                          jnp.float32(t),
                                          jax.random.PRNGKey(
                                              int(t * 10) * 131 + draw))
                    dt, dlp = np.asarray(dt), np.asarray(dlp)
                    if no_speech is None:
                        no_speech = np.asarray(ns)
                    if tokens is None:
                        tokens, lp = dt.copy(), dlp.copy()
                    else:
                        better = dlp > lp
                        tokens[better] = dt[better]
                        lp[better] = dlp[better]
            last_rung = t == dc.fallback_temperatures[-1]
            for w in range(n_w):
                if texts[w] is not None:
                    continue
                cand = self.tokenizer.decode(
                    [int(x) for x in tokens[w]]).strip()
                if last_rung or not needs_fallback(
                        cand, float(lp[w]),
                        dc.compression_ratio_threshold,
                        dc.logprob_threshold):
                    texts[w] = cand
                    final_lp[w] = lp[w]
            if all(x is not None for x in texts):
                break
        # whisper's silence rule (transcribe.py): a confidently no-speech
        # segment is dropped UNLESS its accepted result's avg_logprob
        # clears the threshold — decided per window with the FINAL
        # accepted rung's logprob, exactly as openai-whisper decides it
        # per segment
        return [texts[w] for w in range(n_w)
                if not (no_speech[w] > dc.no_speech_threshold
                        and final_lp[w] <= dc.logprob_threshold)]


def merge_into_caption(text: Optional[str], video_path: Optional[str]
                       ) -> Optional[str]:
    """Dashboard caption-merge rule (reference forensics_dashboard.py:
    160-162): caption + blank line + transcript, unless the transcript is
    empty or an error string. Shared by the dashboard, CLI --transcribe,
    and the REST API's per-request "transcribe" option."""
    if not video_path:
        return text
    transcript = extract_transcript(video_path)
    if transcript and not transcript.startswith("[transcript error"):
        return ((text or "") + "\n\n" + transcript).strip()
    return text


_default_mesh = None


def set_transcriber_mesh(mesh) -> None:
    """Make the lazily-built module transcriber ride the given device mesh
    (the CLI/API ``--mesh`` path plumbs this so transcription shards
    alongside the engine). Applies to the next ``_get_engine`` build; call
    ``reset_transcriber()`` first if one already exists."""
    global _default_mesh
    with _lock:
        _default_mesh = mesh


def _get_engine() -> Optional[WhisperTranscriber]:
    """Lazily build (once) and return the module-cached transcriber, or
    None when construction failed (failure is latched like the reference's
    global whisper model cache, forensics_dashboard.py:15,46-49)."""
    global _engine, _engine_failed
    with _lock:
        if _engine is None and not _engine_failed:
            try:
                import dataclasses
                # WHISPER_LANGUAGE pins the decode language (skips the
                # auto-detection step); unset → whisper's language=None
                # default (detect per clip on multilingual layouts)
                dc = dataclasses.replace(
                    _DECODE_DEFAULTS,
                    language=os.getenv("WHISPER_LANGUAGE") or None,
                    # WHISPER_QUANT=auto|embedding|int8|none — "auto"
                    # (default) = int8 logits embedding when the fused
                    # TPU path is active; "int8" = full streaming decode
                    # (opt-in); core/config.py WhisperDecodeConfig.quant
                    quant=os.getenv("WHISPER_QUANT", _DECODE_DEFAULTS.quant),
                    # WHISPER_PALLAS=auto|on|off → fused 2-kernel decode
                    # step (TPU default via "auto"; docs/PERF.md round 4)
                    pallas=os.getenv("WHISPER_PALLAS",
                                     _DECODE_DEFAULTS.pallas))
                _engine = WhisperTranscriber(os.getenv("WHISPER_CHECKPOINT"),
                                             decode_cfg=dc,
                                             mesh=_default_mesh)
            except Exception:
                _engine_failed = True
        return _engine


def extract_transcript(media_path: Optional[str]) -> str:
    """Module-level cached extraction (reference _extract_transcript)."""
    if not media_path:
        return ""
    engine = _get_engine()
    if engine is None:
        return ""
    try:
        return engine.transcribe(media_path)
    except Exception as e:
        return f"[transcript error: {e}]"


def warmup_transcriber(buckets=(1,)) -> list:
    """Build the cached transcriber (WHISPER_CHECKPOINT env) and precompile
    its programs; called from the CLI/API ``--warmup`` path alongside
    ``engine.warmup()``. Returns the warmed buckets ([] when the transcript
    capability is degraded or unconfigured)."""
    engine = _get_engine()
    return engine.warmup(buckets) if engine is not None else []


def reset_transcriber() -> None:
    """Drop the cached engine AND the default mesh (tests / checkpoint
    swaps). Clearing the mesh matters: without it a mesh set once via
    ``set_transcriber_mesh`` would leak into every later rebuild for the
    life of the process, with no way back to the no-mesh default."""
    global _engine, _engine_failed, _default_mesh
    with _lock:
        _engine = None
        _engine_failed = False
        _default_mesh = None
