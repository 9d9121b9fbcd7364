"""Real-TPU smoke of the transcriber's DEFAULT mode resolution.

The bench exercises the fused int8 kernels via explicit flags; this
drives the PRODUCT path end-to-end on the real chip with no overrides:
train a tiny whisper to memorize a waveform (CPU-fast either way), save
a native checkpoint, build `WhisperTranscriber` with defaults, and
assert (a) `quant="auto"` resolved to the "kernels" mode (pallas on,
int8 block weights + embedding), and (b) the transcript is exact.
The CLAUDE.md kernel rule's real-TPU half for the round-5 default."""

import dataclasses
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEXT = "hello world"
SR = 16000


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from misinfo_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from misinfo_tpu.checkpoints.io import save_checkpoint
    from misinfo_tpu.core.config import PrecisionConfig
    from misinfo_tpu.models.whisper import (
        WhisperConfig, whisper_decode_step, whisper_encode, whisper_init)
    from misinfo_tpu.ops.common import Policy
    from misinfo_tpu.preprocess.audio import (log_mel_spectrogram,
                                              pad_or_trim_mel)
    from misinfo_tpu.preprocess.whisper_tokenizer import ByteWhisperTokenizer

    print("platform:", jax.devices()[0].platform)
    F32 = Policy(PrecisionConfig.highest())
    tok = ByteWhisperTokenizer()
    sp = tok.specials
    cfg = WhisperConfig(
        vocab_size=sp.vocab_size, num_mel_bins=80, d_model=64,
        encoder_layers=2, decoder_layers=2, num_heads=4, ffn_dim=128,
        max_source_positions=64, max_target_positions=32,
        eos_token_id=sp.eot, decoder_start_token_id=sp.sot)

    t = np.arange(int(1.28 * SR)) / SR
    audio = (0.4 * np.sin(2 * np.pi * 440.0 * t)
             + 0.3 * np.sin(2 * np.pi * 660.0 * t)).astype(np.float32)
    mel = pad_or_trim_mel(log_mel_spectrogram(audio),
                          2 * cfg.max_source_positions)[None]
    target = tok.sot_sequence() + tok.encode(TEXT) + [sp.eot]
    toks = np.full((1, cfg.max_target_positions), sp.eot, np.int32)
    toks[0, : len(target)] = target
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
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    loss = None
    for i in range(250):
        params, opt_state, loss = step(params, opt_state)
        if float(loss) < 0.01:
            break
    print(f"trained: {i + 1} steps, loss {float(loss):.4f}")
    assert float(loss) < 0.5

    os.makedirs("/tmp/whisper_smoke", exist_ok=True)
    ckpt_dir = "/tmp/whisper_smoke/ckpt"
    save_checkpoint(ckpt_dir, params,
                    metadata={"whisper_config": dataclasses.asdict(cfg),
                              "tokenizer": "byte"})
    wav_path = "/tmp/whisper_smoke/speech.wav"
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())

    from misinfo_tpu.serve.transcript import WhisperTranscriber
    tr = WhisperTranscriber(ckpt_dir)   # ALL defaults — the product path
    print("resolved: pallas =", tr.pallas, "| quant_kernels =",
          tr.quant_kernels, "| quant_embedding =", tr.quant_embedding)
    assert tr.pallas is True, "auto should resolve pallas ON on TPU"
    assert tr.quant_kernels, "auto should resolve quant='kernels' on TPU"
    blk = tr.params["decoder"]["blocks"][0]
    assert blk["self_attn"]["qkv"]["kernel_q"].dtype == jnp.int8
    out = tr.transcribe(wav_path)
    print(f"transcript: {out!r}")
    assert out == TEXT, out
    print("TPU default-resolution smoke OK")


if __name__ == "__main__":
    main()
