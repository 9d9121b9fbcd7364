"""Whisper transcript extraction for the dashboard (C13, reference
forensics_dashboard.py:18-87).

Same soft-fail contract as the reference: returns the transcript text,
`""` when the capability is unavailable (no ffmpeg / no weights), or a
bracketed `[transcript error: ...]` string on failure. The model size comes
from the WHISPER_MODEL env var (reference :48); the engine is lazily
constructed and cached globally (reference :15,46-49).

Without converted Whisper weights + a tokenizer vocab this degrades to ""
exactly like the reference does without openai-whisper installed.
"""

from __future__ import annotations

import os
import threading
from typing import Dict, Optional

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
}


# openai-whisper's transcribe() defaults, which the reference inherits
# (forensics_dashboard.py:80-83): retry at rising temperatures when the
# decode looks degenerate (too-compressible = repetitive loops) or
# low-confidence; the last rung is accepted unconditionally.
_FALLBACK_TEMPERATURES = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
_COMPRESSION_RATIO_THRESHOLD = 2.4
_LOGPROB_THRESHOLD = -1.0


def needs_fallback(text: str, avg_logprob: float,
                   compression_ratio_threshold: float = _COMPRESSION_RATIO_THRESHOLD,
                   logprob_threshold: float = _LOGPROB_THRESHOLD) -> bool:
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
    temperature-fallback ladder."""

    def __init__(self, checkpoint_dir: Optional[str] = None,
                 size: Optional[str] = None):
        import jax

        from misinfo_tpu.models.whisper import WhisperConfig, whisper_init

        size = size or os.getenv("WHISPER_MODEL", "base")
        kw = _SIZES.get(size, _SIZES["base"])
        self.cfg = WhisperConfig(**kw)
        self.params = whisper_init(jax.random.PRNGKey(0), self.cfg)
        self.has_weights = False
        if checkpoint_dir:
            from misinfo_tpu.checkpoints.io import load_checkpoint
            restored = load_checkpoint(checkpoint_dir, self.params)
            if restored is not None:
                self.params = restored
                self.has_weights = True
        self.tokenizer = None  # byte-level BPE vocab required for text output

    def transcribe(self, media_path: str) -> str:
        from misinfo_tpu.preprocess.audio import (
            ffmpeg_decode_audio, log_mel_spectrogram, pad_or_trim_mel)

        if not self.has_weights or self.tokenizer is None:
            return ""  # capability absent → empty transcript (reference :32-34)
        audio = ffmpeg_decode_audio(media_path)
        if audio is None:
            return ""
        try:
            import jax
            import jax.numpy as jnp

            from misinfo_tpu.models.whisper import decode_transcript

            mel = pad_or_trim_mel(log_mel_spectrogram(audio))
            text = ""
            for t in _FALLBACK_TEMPERATURES:
                tokens, avg_lp = decode_transcript(
                    self.params, jnp.asarray(mel[None]), self.cfg,
                    temperature=t,
                    rng=jax.random.PRNGKey(int(t * 10)) if t > 0 else None)
                ids = [int(x) for x in np.asarray(tokens)[0]
                       if int(x) != self.cfg.eos_token_id]
                text = self.tokenizer.decode(ids).strip()
                if not needs_fallback(text, float(avg_lp[0])):
                    break
            return text
        except Exception as e:
            return f"[transcript error: {e}]"


def extract_transcript(media_path: Optional[str]) -> str:
    """Module-level cached extraction (reference _extract_transcript)."""
    global _engine, _engine_failed
    if not media_path:
        return ""
    with _lock:
        if _engine is None and not _engine_failed:
            try:
                ckpt = os.getenv("WHISPER_CHECKPOINT")
                _engine = WhisperTranscriber(ckpt)
            except Exception:
                _engine_failed = True
        if _engine is None:
            return ""
    try:
        return _engine.transcribe(media_path)
    except Exception as e:
        return f"[transcript error: {e}]"
