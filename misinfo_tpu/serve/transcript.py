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


class WhisperTranscriber:
    """Log-mel frontend + JAX Whisper greedy decoding."""

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
            import jax.numpy as jnp

            from misinfo_tpu.models.whisper import greedy_decode

            mel = pad_or_trim_mel(log_mel_spectrogram(audio))
            tokens = greedy_decode(self.params, jnp.asarray(mel[None]),
                                   self.cfg)
            ids = [int(t) for t in np.asarray(tokens)[0]
                   if int(t) != self.cfg.eos_token_id]
            return self.tokenizer.decode(ids).strip()
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
