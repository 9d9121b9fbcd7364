"""Whisper transcription END-TO-END (VERDICT r1 #1): byte-level tokenizer +
a tiny whisper trained to transcribe a synthetic waveform + a real WAV file
on disk → WhisperTranscriber produces non-empty transcript text, which the
dashboard merges into the caption (reference forensics_dashboard.py:18-87,
160-162). Also covers the temperature-ladder acceptance logic and the
special-token id layout."""

import dataclasses
import os
import wave

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from misinfo_tpu.core.config import PrecisionConfig
from misinfo_tpu.models.whisper import (
    WhisperConfig, whisper_decode_step, whisper_encode, whisper_init,
)
from misinfo_tpu.ops.common import Policy
from misinfo_tpu.preprocess.audio import (
    decode_audio, log_mel_spectrogram, pad_or_trim_mel,
)
from misinfo_tpu.preprocess.whisper_tokenizer import (
    ByteWhisperTokenizer, _WhisperSpecials, load_whisper_tokenizer,
)

F32 = Policy(PrecisionConfig.highest())
TEXT = "hello world"
SR = 16000


def _make_audio() -> np.ndarray:
    """1.28 s deterministic two-tone waveform (fits a 64-position tiny
    encoder: 2*64 mel frames at 10 ms hop)."""
    t = np.arange(int(1.28 * SR)) / SR
    return (0.4 * np.sin(2 * np.pi * 440.0 * t)
            + 0.3 * np.sin(2 * np.pi * 660.0 * t)).astype(np.float32)


@pytest.fixture(scope="module")
def trained_whisper(tmp_path_factory):
    """Train a tiny whisper to memorize audio→TEXT, save it as a native
    checkpoint (self-describing metadata), and write the WAV next to it."""
    import optax

    tok = ByteWhisperTokenizer()
    sp = tok.specials
    cfg = WhisperConfig(
        vocab_size=sp.vocab_size, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2, num_heads=4, ffn_dim=128,
        max_source_positions=64, max_target_positions=32,
        eos_token_id=sp.eot, decoder_start_token_id=sp.sot)

    audio = _make_audio()
    mel = pad_or_trim_mel(log_mel_spectrogram(audio),
                          2 * cfg.max_source_positions)[None]
    target = tok.sot_sequence() + tok.encode(TEXT) + [sp.eot]
    toks = np.full((1, cfg.max_target_positions), sp.eot, np.int32)
    toks[0, : len(target)] = target
    # teacher forcing: input tokens[:-1] predict tokens[1:]; loss on every
    # position through the first EOS
    inp = jnp.asarray(toks[:, :-1])
    lbl = jnp.asarray(toks[:, 1:])
    weight = jnp.asarray(
        (np.arange(cfg.max_target_positions - 1) < len(target) - 1)[None]
        .astype(np.float32))

    params = whisper_init(jax.random.PRNGKey(0), cfg)
    mel_j = jnp.asarray(mel)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    def loss_fn(p):
        enc = whisper_encode(p, mel_j, cfg, F32)
        logits = whisper_decode_step(p, inp, enc, cfg, F32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, lbl[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * weight) / jnp.sum(weight)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, l

    loss = None
    for _ in range(250):
        params, opt_state, loss = step(params, opt_state)
        if float(loss) < 0.01:
            break
    assert float(loss) < 0.5, f"tiny whisper failed to memorize ({loss})"

    tmp = tmp_path_factory.mktemp("whisper_ckpt")
    ckpt_dir = str(tmp / "ckpt")
    from misinfo_tpu.checkpoints.io import save_checkpoint
    save_checkpoint(ckpt_dir, params,
                    metadata={"whisper_config": dataclasses.asdict(cfg),
                              "tokenizer": "byte"})

    wav_path = str(tmp / "speech.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())
    return ckpt_dir, wav_path


def test_transcriber_end_to_end(trained_whisper):
    """A media file with an audio track produces real transcript text."""
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, wav_path = trained_whisper
    tr = WhisperTranscriber(ckpt_dir)
    assert tr.has_weights and tr.tokenizer_compatible
    text = tr.transcribe(wav_path)
    assert text == TEXT


def test_extract_transcript_feeds_dashboard_caption(trained_whisper,
                                                    monkeypatch):
    """Module-level cascade (reference _extract_transcript) + the dashboard
    caption merge rule (reference :160-162)."""
    from misinfo_tpu.serve import transcript as T

    ckpt_dir, wav_path = trained_whisper
    monkeypatch.setenv("WHISPER_CHECKPOINT", ckpt_dir)
    T.reset_transcriber()
    try:
        out = T.extract_transcript(wav_path)
        assert out == TEXT
        # dashboard merge semantics
        caption = "user caption"
        combined = caption
        if out and not out.startswith("[transcript error"):
            combined = (combined + "\n\n" + out).strip()
        assert combined == f"user caption\n\n{TEXT}"
    finally:
        T.reset_transcriber()


def test_transcriber_without_weights_degrades(tmp_path):
    """No checkpoint → '' (reference soft-fail :32-34), never an error."""
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    tr = WhisperTranscriber(None, size="tiny")
    assert not tr.has_weights
    assert tr.transcribe("/nonexistent.wav") == ""


def test_wav_reader_fallback(trained_whisper):
    """decode_audio reads PCM WAVs via the stdlib on ffmpeg-less images."""
    _, wav_path = trained_whisper
    audio = decode_audio(wav_path)
    assert audio is not None and audio.dtype == np.float32
    ref = _make_audio()
    assert abs(len(audio) - len(ref)) < 4
    np.testing.assert_allclose(audio[:1000], ref[:1000], atol=2e-4)


def test_temperature_ladder_acceptance(trained_whisper, monkeypatch):
    """When the greedy rung fails the acceptance test, higher-temperature
    rungs run (traced-temperature program) and the last result is kept."""
    from misinfo_tpu.serve import transcript as T

    ckpt_dir, wav_path = trained_whisper
    tr = T.WhisperTranscriber(ckpt_dir)
    calls = []
    real_needs = T.needs_fallback

    def spy(text, lp, *a, **kw):
        calls.append((text, lp))
        return len(calls) < 3  # force two retries, accept the third rung
    monkeypatch.setattr(T, "needs_fallback", spy)
    text = tr.transcribe(wav_path)
    assert len(calls) == 3
    assert text == calls[-1][0]
    # sanity: the real acceptance fn passes a clean decode
    assert not real_needs(TEXT, -0.1)


def test_no_speech_prob_is_probability(trained_whisper):
    from misinfo_tpu.models.whisper import no_speech_prob

    # random-init model: just assert the probe is a valid probability
    tok = ByteWhisperTokenizer()
    sp = tok.specials
    cfg = WhisperConfig(
        vocab_size=sp.vocab_size, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2, num_heads=4, ffn_dim=128,
        max_source_positions=64, max_target_positions=32,
        eos_token_id=sp.eot, decoder_start_token_id=sp.sot)
    params = whisper_init(jax.random.PRNGKey(1), cfg)
    mel = jnp.asarray(np.zeros((1, 128, 80), np.float32))
    enc = whisper_encode(params, mel, cfg, F32)
    p = float(np.asarray(no_speech_prob(params, enc, sp.sot, sp.no_speech,
                                        cfg, F32))[0])
    assert 0.0 <= p <= 1.0


# ---------------------------------------------------------- tokenizer layout

def test_multilingual_special_layout_matches_openai():
    """The multilingual asset layout (base vocab 50257) must land on
    openai-whisper's published ids — the converter's decode depends on it."""
    sp = _WhisperSpecials(eot=50257)
    assert sp.sot == 50258
    assert sp.language_ids["en"] == 50259
    assert sp.translate == 50358
    assert sp.transcribe == 50359
    assert sp.no_speech == 50362
    assert sp.no_timestamps == 50363
    assert sp.timestamp_begin == 50364
    assert sp.vocab_size == 51865  # == WhisperConfig().vocab_size
    assert sp.vocab_size == WhisperConfig().vocab_size
    assert sp.sot_sequence("en", "transcribe") == [50258, 50259, 50359, 50363]


def test_byte_tokenizer_roundtrip_and_specials():
    tok = ByteWhisperTokenizer()
    ids = tok.encode("héllo, wörld!")
    assert all(0 <= i < 256 for i in ids)
    assert tok.decode(ids) == "héllo, wörld!"
    # specials are skipped on decode
    seq = tok.sot_sequence() + tok.encode("x") + [tok.specials.eot] * 3
    assert tok.decode(seq) == "x"


def test_load_whisper_tokenizer_fallback():
    tok = load_whisper_tokenizer(None)
    assert isinstance(tok, ByteWhisperTokenizer)
    assert tok.parity_grade is False


def test_whisper_tokenizer_from_assets(tmp_path):
    """A GPT-2-style vocab.json+merges.txt directory loads as the
    parity-grade tokenizer with the id layout anchored at <|endoftext|>."""
    import json

    # micro vocab: enough structure to exercise the BPE plumbing
    vocab = {"h": 0, "e": 1, "l": 2, "o": 3, "he": 4, "ll": 5, "llo": 6,
             "hello": 7, "<|endoftext|>": 8}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\nh e\nl l\nll o\nhe llo\n")
    from misinfo_tpu.preprocess.whisper_tokenizer import WhisperTokenizer

    tok = WhisperTokenizer.from_dir(str(tmp_path))
    assert tok.parity_grade is True
    assert tok.specials.eot == 8
    assert tok.specials.sot == 9
    assert tok.vocab_size == 8 + 1 + 1 + 99 + 6 + 1501
    assert tok.encode("hello") == [7]
    assert tok.decode([7, tok.specials.eot, tok.specials.sot]) == "hello"


def test_torch_checkpoint_pins_architecture(tmp_path):
    """Round-2 review regression: an HF torch checkpoint whose vocab
    disagrees with the loaded tokenizer must NOT yield a 'loaded' model
    whose token embedding was silently shape-skipped. The checkpoint's own
    shapes pin WhisperConfig (torch_convert.whisper_config_from_torch) and
    the vocab mismatch gates transcribe() off entirely."""
    torch = pytest.importorskip("torch")
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    sd = {
        "decoder.embed_tokens.weight": torch.zeros(1900, 64),
        "decoder.embed_positions.weight": torch.zeros(16, 64),
        "encoder.embed_positions.weight": torch.zeros(32, 64),
    }
    p = tmp_path / "whisper_foreign.pt"
    torch.save(sd, str(p))
    tr = WhisperTranscriber(str(p))
    # architecture follows the checkpoint, not the byte-fallback tokenizer
    assert tr.cfg.vocab_size == 1900 and tr.cfg.d_model == 64
    assert tr.cfg.max_source_positions == 32
    assert tr.has_weights       # embed_tokens applied at its TRUE shape
    assert not tr.tokenizer_compatible
    assert tr.transcribe("/nonexistent.wav") == ""  # soft-fail, no garbage


def test_whisper_config_from_torch_inference():
    """Shape-derived config covers both bare and `model.`-prefixed HF
    state dicts; num_heads follows whisper's universal head_dim 64."""
    from misinfo_tpu.checkpoints.torch_convert import whisper_config_from_torch

    sd = {
        "model.decoder.embed_tokens.weight": np.zeros((51865, 512)),
        "model.decoder.embed_positions.weight": np.zeros((448, 512)),
        "model.encoder.embed_positions.weight": np.zeros((1500, 512)),
        "model.encoder.layers.0.fc1.weight": np.zeros((2048, 512)),
        "model.encoder.layers.5.fc1.weight": np.zeros((2048, 512)),
        "model.decoder.layers.5.fc1.weight": np.zeros((2048, 512)),
    }
    got = whisper_config_from_torch(sd)
    assert got == dict(vocab_size=51865, d_model=512, num_heads=8,
                       encoder_layers=6, decoder_layers=6, ffn_dim=2048,
                       max_source_positions=1500, max_target_positions=448)
    assert whisper_config_from_torch({"unrelated": np.zeros((3,))}) == {}


def test_audio_padding_matches_whisper_silence_value():
    """Silence enters at the RAW-audio level (round-2 review): the padded
    region of the normalized log-mel equals max − 2 — whisper's
    (log_spec.max() − 8 + 4) / 4 — never 0.0."""
    from misinfo_tpu.preprocess.audio import (
        log_mel_spectrogram, pad_or_trim_audio)

    audio = _make_audio()[: SR // 2]            # 0.5 s of tone
    padded = pad_or_trim_audio(audio, 4 * SR)   # → 4 s window
    assert len(padded) == 4 * SR
    mel = log_mel_spectrogram(padded)
    tail = mel[-200:]                           # fully inside the padding
    assert np.allclose(tail, mel.max() - 2.0, atol=1e-4)
    assert float(np.abs(tail).min()) > 0.1      # i.e. NOT zero-padding
    # trim mode: long audio is cut, not padded
    assert len(pad_or_trim_audio(padded, SR)) == SR


def test_quant_streaming_decode_token_fidelity(trained_whisper):
    """int8 streaming decode (WhisperDecodeConfig.quant="int8"): on a
    trained model the quantized transcriber reproduces the exact
    transcript — int8 weight/embedding/cache error stays below the
    trained logit margins. Math-level error bounds live in
    tests/test_whisper_quant.py; throughput in docs/PERF.md."""
    import dataclasses

    from misinfo_tpu.core.config import WhisperDecodeConfig
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, wav_path = trained_whisper
    tr = WhisperTranscriber(
        ckpt_dir,
        decode_cfg=dataclasses.replace(WhisperDecodeConfig(), quant="int8"))
    assert tr.quant
    # the transform actually applied: the logits embedding is int8
    assert tr.params["decoder"]["token_embedding_q"].dtype == jnp.int8
    assert tr.transcribe(wav_path) == TEXT


def test_pallas_decode_mode_resolution_and_equality(trained_whisper):
    """WhisperDecodeConfig.pallas: 'auto' resolves OFF on the CPU backend
    (Mosaic kernels are TPU programs), 'on' forces the 2-kernel fused
    decode step — which must reproduce the exact transcript (run here
    under interpret mode) — and 'on'+quant='int8' is refused."""
    import dataclasses as _dc

    from jax.experimental.pallas import tpu as pltpu

    from misinfo_tpu.core.config import WhisperDecodeConfig
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, wav_path = trained_whisper
    tr_auto = WhisperTranscriber(ckpt_dir)
    assert tr_auto.pallas is False  # CPU backend
    # quant="auto" (the default) follows the same gate: embedding-int8
    # only in the measured fused-TPU configuration, so exact decode here
    assert not tr_auto.quant and not tr_auto.quant_embedding

    tr_on = WhisperTranscriber(
        ckpt_dir, decode_cfg=_dc.replace(WhisperDecodeConfig(), pallas="on"))
    assert tr_on.pallas is True
    with pltpu.force_tpu_interpret_mode():
        assert tr_on.transcribe(wav_path) == TEXT
        assert tr_on.warmup() == [1]

    with pytest.raises(ValueError, match="pallas"):
        WhisperTranscriber(ckpt_dir, decode_cfg=_dc.replace(
            WhisperDecodeConfig(), pallas="on", quant="int8"))
    # int8 + auto resolves to the quant layouts, no conflict
    tr_q = WhisperTranscriber(ckpt_dir, decode_cfg=_dc.replace(
        WhisperDecodeConfig(), quant="int8"))
    assert tr_q.pallas is False

    # quant="embedding" (int8 token embedding/logits only) COMPOSES with
    # the pallas kernels — the transcript must survive the composition
    tr_eq = WhisperTranscriber(ckpt_dir, decode_cfg=_dc.replace(
        WhisperDecodeConfig(), quant="embedding", pallas="on"))
    assert tr_eq.quant_embedding and not tr_eq.quant and tr_eq.pallas
    assert tr_eq.params["decoder"]["token_embedding_q"].dtype == jnp.int8
    # block kernels stay unquantized (the pallas kernels read them)
    sa = tr_eq.params["decoder"]["blocks"][0]["self_attn"]
    assert all("kernel_q" not in v for v in sa.values()
               if isinstance(v, dict))
    with pltpu.force_tpu_interpret_mode():
        assert tr_eq.transcribe(wav_path) == TEXT


def test_quant_kernels_mode_transcript_fidelity(trained_whisper):
    """quant="kernels" (int8 weights inside the fused Pallas decode
    kernels + int8 embedding): on a trained model the transcript must
    survive the composition — run under interpret mode with pallas
    forced on, and via the XLA fallback path (pallas off), both against
    the exact transcript."""
    import dataclasses as _dc

    from jax.experimental.pallas import tpu as pltpu

    from misinfo_tpu.core.config import WhisperDecodeConfig
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, wav_path = trained_whisper
    tr = WhisperTranscriber(ckpt_dir, decode_cfg=_dc.replace(
        WhisperDecodeConfig(), quant="kernels", pallas="on"))
    assert tr.quant_kernels and not tr.quant and not tr.quant_embedding
    blk = tr.params["decoder"]["blocks"][0]
    assert blk["self_attn"]["qkv"]["kernel_q"].dtype == jnp.int8
    assert blk["mlp_in"]["kernel_q"].dtype == jnp.int8
    assert tr.params["decoder"]["token_embedding_q"].dtype == jnp.int8
    with pltpu.force_tpu_interpret_mode():
        assert tr.transcribe(wav_path) == TEXT

    # pallas unavailable (CPU auto) → the same quantized params decode
    # through the XLA dense_int8 path
    tr_cpu = WhisperTranscriber(ckpt_dir, decode_cfg=_dc.replace(
        WhisperDecodeConfig(), quant="kernels"))
    assert tr_cpu.quant_kernels and tr_cpu.pallas is False
    assert tr_cpu.transcribe(wav_path) == TEXT


def test_transcript_host_isolation_matches_inline(trained_whisper,
                                                  monkeypatch):
    """VERDICT r4 #2: the transcript's host-side work (audio decode +
    log-mel) runs in an isolated low-priority worker process by default;
    the transcript must be identical to the inline path, and the pool
    must survive repeated requests."""
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, wav_path = trained_whisper
    monkeypatch.setenv("MISINFO_TPU_TRANSCRIPT_ISOLATION", "0")
    tr = WhisperTranscriber(ckpt_dir)
    assert tr.transcribe(wav_path) == TEXT

    monkeypatch.setenv("MISINFO_TPU_TRANSCRIPT_ISOLATION", "1")
    assert tr.transcribe(wav_path) == TEXT      # worker-process prep
    assert tr.transcribe(wav_path) == TEXT      # pool reuse
    assert WhisperTranscriber._POOL is not None


def test_typod_quant_or_pallas_value_is_refused(trained_whisper):
    """A typo'd WHISPER_QUANT/WHISPER_PALLAS value must raise, not
    silently resolve to exact decode — with 'auto' gating a default
    behavioral mode, a typo'd opt-in/opt-out would otherwise be
    indistinguishable from 'none' (ADVICE r4)."""
    import dataclasses as _dc

    from misinfo_tpu.core.config import WhisperDecodeConfig
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, _ = trained_whisper
    with pytest.raises(ValueError, match="WHISPER_QUANT.*'in8'"):
        WhisperTranscriber(ckpt_dir, decode_cfg=_dc.replace(
            WhisperDecodeConfig(), quant="in8"))
    with pytest.raises(ValueError, match="WHISPER_PALLAS.*'yes'"):
        WhisperTranscriber(ckpt_dir, decode_cfg=_dc.replace(
            WhisperDecodeConfig(), pallas="yes"))


def test_pallas_vmem_gate_per_signature(trained_whisper, monkeypatch):
    """The fused decode kernels' VMEM need scales with batch × max_len ×
    d_model: the cap helper rejects whisper-medium outright and bounds the
    window batch for base; the transcriber resolves the flag PER jit
    signature, so an over-cap bucket silently decodes through the XLA
    path (never a Mosaic OOM mid-request) while small buckets keep the
    kernels."""
    import dataclasses as _dc

    from jax.experimental.pallas import tpu as pltpu

    from misinfo_tpu.core.config import WhisperDecodeConfig
    from misinfo_tpu.ops.pallas_cross_ffn import pallas_decode_max_batch
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    # base fits a handful of windows; medium's FFN weights alone overflow
    assert 4 <= pallas_decode_max_batch(512, 2048, 448, 1500) <= 8
    assert pallas_decode_max_batch(1024, 4096, 448, 1500) == 0
    # int8 decode weights (quant="kernels", the round-5 default) halve
    # the weight VMEM: whisper-medium's 1-window dashboard case now fits
    assert pallas_decode_max_batch(1024, 4096, 448, 1500,
                                   int8_weights=True) >= 1
    assert pallas_decode_max_batch(1280, 5120, 448, 1500,
                                   int8_weights=True) == 0  # large still not
    # sub-lane d_model (tiny/test configs): Mosaic's memref slices need a
    # 128-multiple — the gate rejects so real hardware falls back to XLA
    # (interpret-mode tests drive the kernels with explicit flags instead);
    # found by tools/smoke_transcriber_tpu.py on the real chip
    assert pallas_decode_max_batch(64, 128, 32, 128) == 0
    assert pallas_decode_max_batch(128, 256, 32, 128) >= 16  # lane-aligned tiny

    ckpt_dir, wav_path = trained_whisper
    tr = WhisperTranscriber(
        ckpt_dir, decode_cfg=_dc.replace(WhisperDecodeConfig(), pallas="on"))
    seen = {}
    import misinfo_tpu.models.whisper as W
    import misinfo_tpu.ops.pallas_cross_ffn as PCF
    real_decode = W.decode_transcript
    monkeypatch.setattr(PCF, "pallas_decode_max_batch",
                        lambda *a, **k: 1)

    def spy(params, mel, *a, **kw):
        enc = kw.get("enc_out")
        seen[enc.shape[0]] = kw.get("pallas_cross")
        return real_decode(params, mel, *a, **kw)
    monkeypatch.setattr(W, "decode_transcript", spy)
    # rebuild programs against the spy; transcribe a 2-window clip with
    # buckets (1, 2): bucket 2 exceeds the (patched) cap, bucket 1 fits
    import wave as _wave
    audio = _make_audio()
    p2 = wav_path.replace("speech.wav", "speech_gate.wav")
    with _wave.open(p2, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(np.tile((audio * 32767).astype(np.int16), 2).tobytes())
    tr.decode_cfg = _dc.replace(tr.decode_cfg, window_buckets=(1, 2))
    with pltpu.force_tpu_interpret_mode():
        assert tr.transcribe(p2) == " ".join([TEXT] * 2)   # bucket 2, XLA
        assert tr.transcribe(wav_path) == TEXT             # bucket 1, pallas
    assert seen[2] is False
    assert seen[1] is True


def test_multi_window_transcription(trained_whisper):
    """Audio longer than one encoder window transcribes EVERY window
    (whisper/transcribe.py's seek loop; previously only the first 30 s
    survived). Windows decode as one batched program; the count is rounded
    to a window bucket with repeated-last-window padding (discarded)."""
    import wave as _wave

    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, wav_path = trained_whisper
    audio = _make_audio()
    long_path = wav_path.replace("speech.wav", "speech_long.wav")
    with _wave.open(long_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(np.tile((audio * 32767).astype(np.int16), 3).tobytes())
    tr = WhisperTranscriber(ckpt_dir)
    text = tr.transcribe(long_path)
    assert text == " ".join([TEXT] * 3)


def test_window_mels_shape_and_cap(trained_whisper):
    """_window_mels: window split, max_windows cap, global-max mel norm."""
    import dataclasses as _dc

    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, _ = trained_whisper
    tr = WhisperTranscriber(ckpt_dir)
    frames = 2 * tr.cfg.max_source_positions
    window = frames * 160
    audio = _make_audio()
    assert tr._window_mels(audio).shape == (1, frames, 80)
    assert tr._window_mels(np.tile(audio, 5)).shape == (5, frames, 80)
    # half-window tail rounds up to one extra window
    assert tr._window_mels(
        np.concatenate([audio, audio[: window // 2]])).shape[0] == 2
    tr.decode_cfg = _dc.replace(tr.decode_cfg, max_windows=2)
    assert tr._window_mels(np.tile(audio, 5)).shape == (2, frames, 80)


def test_window_chunking_beyond_largest_bucket(trained_whisper):
    """More windows than the largest jit bucket → the decode runs in
    chunks of that bucket (no novel jit signature), and every window's
    text still lands in the transcript."""
    import dataclasses as _dc
    import wave as _wave

    from misinfo_tpu.core.config import WhisperDecodeConfig
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, wav_path = trained_whisper
    audio = _make_audio()
    p = wav_path.replace("speech.wav", "speech_5x.wav")
    with _wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(np.tile((audio * 32767).astype(np.int16), 5).tobytes())
    tr = WhisperTranscriber(
        ckpt_dir, decode_cfg=_dc.replace(WhisperDecodeConfig(),
                                         window_buckets=(1, 2)))
    seen = []
    orig = tr._decode_window_batch

    def spy(mels, *a, **kw):
        seen.append(mels.shape[0])
        return orig(mels, *a, **kw)
    tr._decode_window_batch = spy
    text = tr.transcribe(p)
    assert text == " ".join([TEXT] * 5)
    assert seen == [2, 2, 1]  # chunks of the largest bucket


def test_serving_cast_preserves_decode(trained_whisper):
    """bf16 weight storage (ops/serving.optimize_whisper_for_serving, the
    transcriber's serving transform) leaves the greedy transcript unchanged:
    matmul inputs are cast to bf16 in bf16 serving mode anyway. The tiny
    model sits below the size gate, so the cast is forced with min_elems=1
    here; the no-op-below-gate behavior is asserted alongside."""
    from misinfo_tpu.ops.common import DEFAULT_POLICY
    from misinfo_tpu.ops.serving import optimize_whisper_for_serving
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, wav_path = trained_whisper
    tr = WhisperTranscriber(ckpt_dir)
    # below the size gate nothing is cast (default transcriber path here)
    assert tr.params["decoder"]["token_embedding"].dtype == jnp.float32
    base = tr.transcribe(wav_path)

    tr.params = optimize_whisper_for_serving(tr.params, DEFAULT_POLICY,
                                             min_elems=1)
    assert tr.params["decoder"]["token_embedding"].dtype == jnp.bfloat16
    assert (tr.params["decoder"]["blocks"][0]["mlp_in"]["kernel"].dtype
            == jnp.bfloat16)
    tr._fns = None  # retrace against the cast pytree
    assert tr.transcribe(wav_path) == base == TEXT

    # f32 parity policy: transform must be a no-op at ANY threshold
    f32_kept = optimize_whisper_for_serving(
        WhisperTranscriber(ckpt_dir).params, F32, min_elems=1)
    assert f32_kept["decoder"]["token_embedding"].dtype == jnp.float32


def test_mesh_sharded_transcription(trained_whisper):
    """WhisperTranscriber(mesh=...): params replicate over the mesh and a
    multi-window decode shards the window-batch axis across 'data' (the
    same DP story as the engine, SURVEY §2.5) with an identical
    transcript. The 1-window dashboard case (batch not divisible by the
    data axis) replicates and still works; a model>1 mesh axis is benign
    (whisper params are not tensor-sharded)."""
    import wave as _wave

    from misinfo_tpu.core.config import MeshConfig
    from misinfo_tpu.core.mesh import make_mesh
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, wav_path = trained_whisper
    audio = _make_audio()
    p = wav_path.replace("speech.wav", "speech_4x.wav")
    with _wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(np.tile((audio * 32767).astype(np.int16), 4).tobytes())

    mesh = make_mesh(MeshConfig(model=2), devices=jax.devices()[:8])  # 4×2
    tr = WhisperTranscriber(ckpt_dir, mesh=mesh)

    # placement: a 4-window batch shards over data=4 (all 8 devices hold
    # a piece), a 1-window batch replicates
    mel4, pr4 = tr._place(
        jnp.zeros((4, 2 * tr.cfg.max_source_positions, 80)),
        jnp.zeros((4, 3), jnp.int32))
    assert not mel4.sharding.is_fully_replicated
    assert len(mel4.sharding.device_set) == 8
    mel1, _ = tr._place(
        jnp.zeros((1, 2 * tr.cfg.max_source_positions, 80)),
        jnp.zeros((1, 3), jnp.int32))
    assert mel1.sharding.is_fully_replicated

    assert tr.transcribe(p) == " ".join([TEXT] * 4)
    assert tr.transcribe(wav_path) == TEXT  # replicated 1-window path
    assert tr.warmup(buckets=(4,)) == [4]


def test_reset_transcriber_clears_default_mesh():
    """A mesh set via set_transcriber_mesh must not outlive
    reset_transcriber(): without the clear, one --mesh invocation leaks
    its mesh into every later module-transcriber build in the process."""
    from misinfo_tpu.core.config import MeshConfig
    from misinfo_tpu.core.mesh import make_mesh
    from misinfo_tpu.serve import transcript as T

    mesh = make_mesh(MeshConfig(model=1), devices=jax.devices()[:2])
    T.set_transcriber_mesh(mesh)
    assert T._default_mesh is mesh
    T.reset_transcriber()
    assert T._default_mesh is None


def test_warmup_transcriber(trained_whisper, monkeypatch):
    """--warmup precompiles the transcript programs; degraded installs
    (no checkpoint) warm nothing instead of erroring."""
    from misinfo_tpu.serve import transcript as T

    ckpt_dir, _ = trained_whisper
    monkeypatch.setenv("WHISPER_CHECKPOINT", ckpt_dir)
    T.reset_transcriber()
    try:
        assert T.warmup_transcriber() == [1]
        tr = T.WhisperTranscriber(ckpt_dir)
        assert tr.warmup(buckets=(1, 2)) == [1, 2]
        tr_none = T.WhisperTranscriber(None, size="tiny")
        assert tr_none.warmup() == []
    finally:
        T.reset_transcriber()


def test_best_of_sampled_rung(trained_whisper, monkeypatch):
    """When a rung fails acceptance, the sampled retry draws best_of
    candidates through the SAME compiled program and keeps one (whisper's
    GreedyDecoder best_of semantics)."""
    import dataclasses as _dc

    from misinfo_tpu.core.config import WhisperDecodeConfig
    from misinfo_tpu.serve import transcript as T

    ckpt_dir, wav_path = trained_whisper
    tr = T.WhisperTranscriber(
        ckpt_dir, decode_cfg=_dc.replace(WhisperDecodeConfig(), best_of=3))
    calls = []

    def spy(text, lp, *a, **kw):
        calls.append(lp)
        return len(calls) == 1  # greedy rung fails, first retry accepted
    monkeypatch.setattr(T, "needs_fallback", spy)
    encode, greedy, sampled, detect = tr._programs()
    n = {"sampled": 0}

    def counting_sampled(*a, **kw):
        n["sampled"] += 1
        return sampled(*a, **kw)
    tr._fns = (encode, greedy, counting_sampled, detect)
    text = tr.transcribe(wav_path)
    assert n["sampled"] == 3        # one rung × best_of draws
    assert len(calls) == 2          # greedy + the rung's best candidate
    assert not text.startswith("[transcript error")


def test_fused_no_speech_matches_standalone(trained_whisper):
    """The silence-gate probability fused into the decode loop (position-0
    capture) must equal the standalone SOT-step probe for both the
    prompted and promptless decode layouts."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from misinfo_tpu.models.whisper import (decode_transcript,
                                            no_speech_prob, whisper_encode)
    from misinfo_tpu.ops.common import DEFAULT_POLICY
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, _ = trained_whisper
    tr = WhisperTranscriber(ckpt_dir)
    sp = tr.tokenizer.specials
    # eager (unjitted) decode needs device arrays, not the checkpoint's numpy
    params = jax.tree_util.tree_map(jnp.asarray, tr.params)
    mels = jnp.asarray(tr._window_mels(_make_audio()))
    enc = whisper_encode(params, mels, tr.cfg, DEFAULT_POLICY)
    ref = np.asarray(no_speech_prob(params, enc, sp.sot, sp.no_speech,
                                    tr.cfg, DEFAULT_POLICY))
    # prompted (the serving layout: sot_sequence prompt → prefill capture)
    prompt = jnp.asarray([tr.tokenizer.sot_sequence()[1:]], jnp.int32)
    _, _, ns_p = decode_transcript(params, None, tr.cfg, DEFAULT_POLICY,
                                   prompt_tokens=prompt, enc_out=enc,
                                   nospeech_id=sp.no_speech)
    np.testing.assert_allclose(np.asarray(ns_p), ref, atol=2e-3)
    # promptless (start == 1: first body step is the position-0 capture)
    _, _, ns_b = decode_transcript(params, None, tr.cfg, DEFAULT_POLICY,
                                   max_len=8, enc_out=enc,
                                   nospeech_id=sp.no_speech)
    np.testing.assert_allclose(np.asarray(ns_b), ref, atol=2e-3)


# ---------------------------------------------------------------------------
# VERDICT r2 #4: quantify the no-prev-text divergence. The production
# transcriber decodes every 30 s window WITHOUT whisper's
# condition_on_previous_text prompt carry (serve/transcript.py conscious
# divergence). This A/B runs the SAME trained model over synthetic
# multi-window audio through (a) the production promptless batched decode
# and (b) whisper's seek-loop layout ([<|startofprev|>, prev tokens,
# sot_sequence, ...]) and measures token-level divergence. The measured
# number is recorded in docs/MIGRATION.md.
# ---------------------------------------------------------------------------

TEXT_A = "hello world"
TEXT_B = "good day"


def _tone(freqs, seconds=1.28):
    t = np.arange(int(seconds * SR)) / SR
    return sum(0.35 * np.sin(2 * np.pi * f * t) for f in freqs).astype(
        np.float32)


@pytest.fixture(scope="module")
def prompt_trained_whisper(tmp_path_factory):
    """Tiny whisper trained on TWO utterances in BOTH decoder layouts —
    promptless ([sot_seq, text, eot]) and prev-text-conditioned
    ([sot_prev, prev tokens, sot_seq, text, eot]) — so the prompted
    seek-loop decode is in-distribution and the A/B measures the decode
    PATH difference, not prompt-naivety of the toy model."""
    import optax

    tok = ByteWhisperTokenizer()
    sp = tok.specials
    cfg = WhisperConfig(
        vocab_size=sp.vocab_size, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2, num_heads=4, ffn_dim=128,
        max_source_positions=64, max_target_positions=32,
        eos_token_id=sp.eot, decoder_start_token_id=sp.sot)

    wave_a = _tone((440.0, 660.0))
    wave_b = _tone((550.0, 880.0))
    frames = 2 * cfg.max_source_positions

    def mel_of(w):
        return pad_or_trim_mel(log_mel_spectrogram(w), frames)

    sot_seq = tok.sot_sequence()
    tok_a, tok_b = tok.encode(TEXT_A), tok.encode(TEXT_B)

    def example(mel, text_toks, prev_toks):
        if prev_toks is None:
            seq = sot_seq + text_toks + [sp.eot]
            loss_from = 0
        else:
            prefix = [sp.sot_prev] + prev_toks
            seq = prefix + sot_seq + text_toks + [sp.eot]
            loss_from = len(prefix)  # prompt is given, not predicted
        toks = np.full((cfg.max_target_positions,), sp.eot, np.int32)
        toks[: len(seq)] = seq
        w = np.zeros((cfg.max_target_positions - 1,), np.float32)
        w[max(loss_from - 1, 0): len(seq) - 1] = 1.0
        return mel, toks, w

    exs = [example(mel_of(wave_a), tok_a, None),
           example(mel_of(wave_b), tok_b, None),
           example(mel_of(wave_a), tok_a, tok_b),
           example(mel_of(wave_b), tok_b, tok_a)]
    mels = jnp.asarray(np.stack([e[0] for e in exs]))
    toks = np.stack([e[1] for e in exs])
    inp = jnp.asarray(toks[:, :-1])
    lbl = jnp.asarray(toks[:, 1:])
    weight = jnp.asarray(np.stack([e[2] for e in exs]))

    params = whisper_init(jax.random.PRNGKey(1), cfg)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    def loss_fn(p):
        enc = whisper_encode(p, mels, cfg, F32)
        logits = whisper_decode_step(p, inp, enc, cfg, F32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, lbl[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * weight) / jnp.sum(weight)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, l

    loss = None
    for _ in range(600):
        params, opt_state, loss = step(params, opt_state)
        if float(loss) < 0.01:
            break
    assert float(loss) < 0.5, f"tiny whisper failed to memorize ({loss})"

    tmp = tmp_path_factory.mktemp("whisper_prev")
    ckpt_dir = str(tmp / "ckpt")
    from misinfo_tpu.checkpoints.io import save_checkpoint
    save_checkpoint(ckpt_dir, params,
                    metadata={"whisper_config": dataclasses.asdict(cfg),
                              "tokenizer": "byte"})
    long_audio = np.concatenate([wave_a, wave_b, wave_a])
    wav_path = str(tmp / "long.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((long_audio * 32767).astype(np.int16).tobytes())
    return params, cfg, tok, ckpt_dir, wav_path, [wave_a, wave_b, wave_a]


def _token_edit_distance(a, b):
    m, n = len(a), len(b)
    d = np.zeros((m + 1, n + 1), np.int32)
    d[:, 0] = np.arange(m + 1)
    d[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return int(d[m, n])


def test_prev_text_divergence_quantified(prompt_trained_whisper):
    """A/B: production promptless batched decode vs whisper's prev-text
    seek-loop on 3-window audio. The divergence IS the number recorded in
    docs/MIGRATION.md — keep the doc in sync if this changes."""
    from misinfo_tpu.models.whisper import decode_transcript
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    params, cfg, tok, ckpt_dir, wav_path, waves = prompt_trained_whisper
    sp = tok.specials
    expected = [TEXT_A, TEXT_B, TEXT_A]

    # (a) production path: the real transcriber (batched, promptless)
    tr = WhisperTranscriber(ckpt_dir)
    assert tr.has_weights and tr.tokenizer_compatible
    production = tr.transcribe(wav_path)
    assert production == " ".join(expected)

    # (b) whisper seek-loop: sequential windows, window w>0 prompted with
    # [<|startofprev|>, tokens(prev window text), *sot_sequence]
    frames = 2 * cfg.max_source_positions
    per_window_prod, per_window_seek = [], []
    prev_text = None
    for w, wave_w in enumerate(waves):
        mel = jnp.asarray(
            pad_or_trim_mel(log_mel_spectrogram(wave_w), frames)[None])
        if prev_text is None:
            prompt = jnp.asarray([tok.sot_sequence()[1:]], jnp.int32)
            dcfg = cfg
        else:
            prompt = jnp.asarray(
                [tok.encode(prev_text) + tok.sot_sequence()], jnp.int32)
            dcfg = dataclasses.replace(cfg,
                                       decoder_start_token_id=sp.sot_prev)
        tokens, _ = decode_transcript(params, mel, dcfg, F32,
                                      prompt_tokens=prompt)
        gen = [int(x) for x in np.asarray(tokens)[0][1 + prompt.shape[1]:]]
        text = tok.decode(gen).strip()
        per_window_seek.append(text)
        prev_text = text

        # promptless single-window decode (what production does per window)
        tokens, _ = decode_transcript(
            params, mel, cfg, F32,
            prompt_tokens=jnp.asarray([tok.sot_sequence()[1:]], jnp.int32))
        gen = [int(x) for x in np.asarray(tokens)[0]]
        per_window_prod.append(tok.decode(gen).strip())

    assert per_window_seek == expected    # the seek-loop layout works
    total_tokens = sum(len(tok.encode(t)) for t in per_window_seek)
    dist = sum(_token_edit_distance(tok.encode(a), tok.encode(b))
               for a, b in zip(per_window_prod, per_window_seek))
    rate = dist / max(total_tokens, 1)
    print(f"prev-text divergence: {dist}/{total_tokens} tokens "
          f"({rate:.1%}) across {len(waves)} windows")
    # docs/MIGRATION.md records this measurement
    assert dist == 0, (
        f"prev-text conditioning changed {dist}/{total_tokens} tokens — "
        "update the measured number in docs/MIGRATION.md")


# ---------------------------------------------------------------------------
# VERDICT r3 #6: the int8 streaming decode's fidelity as a NUMBER, not a
# bound. Token-level A/B of the int8 transcriber (quant="int8": int8 decoder
# params + logits embedding + int8 cross K/V caches) against the default
# streaming transcriber, across the FULL temperature ladder (greedy rung +
# every sampled rung with production's rng keys) and the language-detect
# path. The measured divergence is recorded in docs/MIGRATION.md next to the
# prev-text number — keep the doc in sync if this changes.
# ---------------------------------------------------------------------------


def test_int8_streaming_divergence_quantified(trained_whisper):
    import dataclasses as _dc

    from misinfo_tpu.core.config import WhisperDecodeConfig
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, wav_path = trained_whisper
    tr_f = WhisperTranscriber(ckpt_dir)
    tr_q = WhisperTranscriber(
        ckpt_dir,
        decode_cfg=_dc.replace(WhisperDecodeConfig(), quant="int8"))
    assert tr_q.quant and not tr_f.quant
    tok = tr_f.tokenizer

    mels = jnp.asarray(tr_f._window_mels(_make_audio()))
    prompt = jnp.asarray([tok.sot_sequence()[1:]], jnp.int32)
    enc_fn_f, greedy_f, sampled_f, detect_f = tr_f._programs()
    enc_fn_q, greedy_q, sampled_q, detect_q = tr_q._programs()
    enc_f = enc_fn_f(tr_f.params, mels)
    enc_q = enc_fn_q(tr_q.params, mels)  # encoder params are NOT quantized

    total = dist = 0
    max_lp_delta = 0.0
    per_rung = []
    for t in tr_f.decode_cfg.fallback_temperatures:
        if t == 0.0:
            tok_f, lp_f, _ = greedy_f(tr_f.params, enc_f, prompt)
            tok_q, lp_q, _ = greedy_q(tr_q.params, enc_q, prompt)
        else:
            # production's draw-0 key for this rung (_decode_window_batch)
            rng = jax.random.PRNGKey(int(t * 10) * 131)
            tok_f, lp_f, _ = sampled_f(tr_f.params, enc_f, prompt,
                                       jnp.float32(t), rng)
            tok_q, lp_q, _ = sampled_q(tr_q.params, enc_q, prompt,
                                       jnp.float32(t), rng)
        a = tok.encode(tok.decode([int(x) for x in np.asarray(tok_f)[0]])
                       .strip())
        b = tok.encode(tok.decode([int(x) for x in np.asarray(tok_q)[0]])
                       .strip())
        d = _token_edit_distance(a, b)
        total += len(a)
        dist += d
        max_lp_delta = max(max_lp_delta,
                           abs(float(np.asarray(lp_f)[0])
                               - float(np.asarray(lp_q)[0])))
        per_rung.append((t, d, len(a)))

    # language-detect path runs the SAME quantized decoder step
    idx_f, probs_f = detect_f(tr_f.params, enc_f)
    idx_q, probs_q = detect_q(tr_q.params, enc_q)
    assert int(np.asarray(idx_f)[0]) == int(np.asarray(idx_q)[0])
    detect_delta = float(np.max(np.abs(np.asarray(probs_f)
                                       - np.asarray(probs_q))))

    print(f"int8 streaming divergence: {dist}/{total} tokens across "
          f"{len(per_rung)} ladder rungs {per_rung}; "
          f"max |Δavg_logprob|={max_lp_delta:.4f}; "
          f"detect max |Δp|={detect_delta:.4f}")
    # docs/MIGRATION.md records these measurements
    assert dist == 0, (
        f"int8 streaming changed {dist}/{total} tokens — update the "
        "measured number in docs/MIGRATION.md")
    assert max_lp_delta < 0.05
    assert detect_delta < 0.02


# ---------------------------------------------------------------- language
# whisper/transcribe.py: language=None on a multilingual model triggers
# detect_language() on the first 30 s window — the reference's
# transcribe(audio, fp16=False) call (forensics_dashboard.py:80-83)
# inherits that default. serve/transcript.py mirrors it.


def test_detect_language_matches_masked_full_softmax(trained_whisper):
    """models/whisper.detect_language == softmax over the language block of
    the full SOT-position logits (openai-whisper's mask construction)."""
    import jax.numpy as jnp

    from misinfo_tpu.models.whisper import detect_language, whisper_encode
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, _ = trained_whisper
    tr = WhisperTranscriber(ckpt_dir)
    sp = tr.tokenizer.specials
    mel = jnp.asarray(
        pad_or_trim_mel(log_mel_spectrogram(_make_audio()),
                        2 * tr.cfg.max_source_positions)[None])
    enc = whisper_encode(tr.params, mel, tr.cfg, F32)
    lang_ids = jnp.asarray([sp.language_ids[l] for l in sp.languages],
                           jnp.int32)
    idx, probs = detect_language(tr.params, enc, sp.sot, lang_ids,
                                 tr.cfg, F32)
    assert probs.shape == (1, len(sp.languages))
    np.testing.assert_allclose(np.asarray(probs).sum(axis=-1), 1.0,
                               rtol=1e-5)
    # reference construction: full-prefix forward at SOT, -inf everywhere
    # except the language tokens
    logits = whisper_decode_step(
        tr.params, jnp.asarray([[sp.sot]], jnp.int32), enc, tr.cfg, F32)
    full = np.asarray(logits, np.float32)[0, 0]
    mask = np.full_like(full, -np.inf)
    ids = np.asarray(lang_ids)
    mask[ids] = full[ids]
    assert ids[int(np.asarray(idx)[0])] == int(np.argmax(mask))
    exp = np.exp(full[ids] - full[ids].max())
    np.testing.assert_allclose(np.asarray(probs)[0], exp / exp.sum(),
                               rtol=1e-4)


def test_auto_detection_picks_trained_language(trained_whisper):
    """The tiny model was trained to emit <|en|> after SOT, so the default
    (language=None) transcribe path detects 'en' and produces the same
    transcript as an explicit pin."""
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, wav_path = trained_whisper
    tr = WhisperTranscriber(ckpt_dir)
    assert tr.decode_cfg.language is None  # whisper's default
    assert tr.transcribe(wav_path) == TEXT
    assert tr.last_language == "en"


def test_pinned_language_skips_detection(trained_whisper, monkeypatch):
    """decode_cfg.language set → no detection step runs and the decoder
    prompt carries the pinned language token."""
    import dataclasses as _dc

    from misinfo_tpu.core.config import WhisperDecodeConfig
    from misinfo_tpu.serve import transcript as T

    ckpt_dir, wav_path = trained_whisper
    tr = T.WhisperTranscriber(
        ckpt_dir, decode_cfg=WhisperDecodeConfig(language="de"))
    encode, greedy, sampled, detect = tr._programs()

    def boom(*a, **kw):
        raise AssertionError("detection ran despite a pinned language")
    tr._fns = (encode, greedy, sampled, boom)

    prompts = []
    real = tr.tokenizer.sot_sequence

    def spy(notimestamps=True, language=None):
        seq = real(notimestamps=notimestamps, language=language)
        prompts.append(seq)
        return seq
    monkeypatch.setattr(tr.tokenizer, "sot_sequence", spy)
    out = tr.transcribe(wav_path)
    assert not out.startswith("[transcript error")
    assert tr.last_language == "de"
    sp = tr.tokenizer.specials
    assert all(seq[1] == sp.language_ids["de"] for seq in prompts)


def test_english_only_layout_skips_detection(trained_whisper):
    """.en layouts carry no language tokens: _resolve_language pins 'en'
    without touching the detection program (openai-whisper transcribe.py
    does the same for non-multilingual models)."""
    from misinfo_tpu.serve.transcript import WhisperTranscriber

    ckpt_dir, _ = trained_whisper
    tr = WhisperTranscriber(ckpt_dir)
    tr.tokenizer.specials.multilingual = False
    tr._fns = None

    def boom():
        raise AssertionError("_programs built during .en language resolve")
    tr._programs = boom
    mels = np.zeros((1, 2 * tr.cfg.max_source_positions,
                     tr.cfg.num_mel_bins), np.float32)
    assert tr._resolve_language(mels) == "en"
    assert tr.last_language == "en"


def test_whisper_language_env_pins_module_engine(trained_whisper,
                                                 monkeypatch):
    """WHISPER_LANGUAGE env → the module-cached transcriber's decode config
    pins that language (operator override; unset keeps whisper's
    auto-detect default)."""
    from misinfo_tpu.serve import transcript as T

    ckpt_dir, wav_path = trained_whisper
    monkeypatch.setenv("WHISPER_CHECKPOINT", ckpt_dir)
    monkeypatch.setenv("WHISPER_LANGUAGE", "en")
    T.reset_transcriber()
    try:
        assert T.extract_transcript(wav_path) == TEXT
        assert T._get_engine().decode_cfg.language == "en"
        assert T._get_engine().last_language == "en"
    finally:
        T.reset_transcriber()
