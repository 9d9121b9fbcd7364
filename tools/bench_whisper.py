"""Whisper serving benchmark: encoder throughput + KV-cached decode rate.

The transcript path (serve/transcript.py, reference
forensics_dashboard.py:18-87) costs one encoder pass over the 30 s log-mel
window plus L cached decoder steps per utterance. This measures both on
the attached device with data-synced timing (utils/timing.py):

    python tools/bench_whisper.py                     # base preset, TPU
    WHISPER_MODEL=tiny BENCH_BATCH=8 python tools/bench_whisper.py
    BENCH_DECODE_LEN=448 python tools/bench_whisper.py  # full-window decode

Prints one JSON line: encode ms/utterance, decode steps/s, and the
utterances/s the combined pipeline sustains at the benchmarked decode
length. The decode while_loop exits early once every row emits EOS; with
random-init weights EOS is (essentially) never the argmax, so the bench
measures the full max_len decode — the worst case. Real transcripts stop
at EOS, so production utterances/s is ≥ this number.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = os.environ.get("WHISPER_MODEL", "base")
BATCH = int(os.environ.get("BENCH_BATCH", "4"))
DECODE_LEN = int(os.environ.get("BENCH_DECODE_LEN", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))


def main():
    import jax
    import jax.numpy as jnp

    from misinfo_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.models.whisper import (WhisperConfig, decode_transcript,
                                            whisper_encode, whisper_init)
    from misinfo_tpu.ops.common import Policy
    from misinfo_tpu.serve.transcript import _SIZES
    from misinfo_tpu.utils.timing import time_program

    cfg = WhisperConfig(**_SIZES[SIZE])
    policy = Policy(ForensicsConfig().precision)
    params = whisper_init(jax.random.PRNGKey(0), cfg)
    if os.environ.get("BENCH_SERVING_CAST", "1") != "0":
        # same transform the transcriber applies (bf16 weight storage —
        # the decoder is weight-bandwidth-bound); =0 measures f32 storage
        from misinfo_tpu.ops.serving import optimize_whisper_for_serving
        params = optimize_whisper_for_serving(params, policy)

    rng = np.random.default_rng(0)
    # 30 s window → 3000 mel frames (conv stride 2 → 1500 encoder positions)
    T = cfg.max_source_positions * 2
    mel = jnp.asarray(rng.standard_normal(
        (BATCH, T, cfg.num_mel_bins)).astype(np.float32))

    enc_fn = jax.jit(lambda p, m: whisper_encode(p, m, cfg, policy))
    dt_enc, enc_out = time_program(lambda: enc_fn(params, mel), ITERS)
    enc_ms = dt_enc / ITERS * 1000.0

    fuse_qkv = os.environ.get("BENCH_FUSE_QKV", "0") == "1"
    if fuse_qkv:
        from misinfo_tpu.models.whisper import fuse_whisper_decoder_qkv
        params = fuse_whisper_decoder_qkv(params)
    scan_layers = os.environ.get("BENCH_SCAN_LAYERS", "0") == "1"
    if scan_layers:
        # pre-stack once (the transcriber's serving form); the scanned
        # decode step emits ONE loop body instead of L unrolled layers
        from misinfo_tpu.models.whisper import stack_whisper_decoder
        params = stack_whisper_decoder(params)
    pallas_ffn = os.environ.get("BENCH_PALLAS_FFN", "0") == "1"
    pallas_self_attn = os.environ.get("BENCH_PALLAS_ATTN", "0") == "1"
    pallas_cross = os.environ.get("BENCH_PALLAS_CROSS", "0") == "1"
    qmode = os.environ.get("BENCH_QUANT", "")
    quant = qmode == "int8"
    if quant:
        # int8 streaming decode (WhisperDecodeConfig.quant): int8 decoder
        # params + logits embedding (after the qkv fuse, like the
        # transcriber) + int8 cross K/V caches via quant=True below
        from misinfo_tpu.models.whisper import fuse_whisper_decoder_qkv
        from misinfo_tpu.ops.serving import quantize_whisper_decoder
        params = quantize_whisper_decoder(fuse_whisper_decoder_qkv(params))
    elif qmode == "embedding":
        # int8 token embedding/logits only — composes with the pallas flags
        from misinfo_tpu.ops.serving import quantize_whisper_embedding
        params = quantize_whisper_embedding(params)
    elif qmode == "kernels":
        # int8 decoder weights INSIDE the fused Pallas kernels (+ int8
        # embedding); caches stay bf16 — the quant="kernels" serving mode
        from misinfo_tpu.models.whisper import fuse_whisper_decoder_qkv
        from misinfo_tpu.ops.serving import quantize_whisper_decoder
        params = quantize_whisper_decoder(fuse_whisper_decoder_qkv(params))
    unroll = int(os.environ.get("BENCH_UNROLL", "1"))
    pallas_layer = os.environ.get("BENCH_PALLAS_LAYER", "0") == "1"
    cross_int8 = os.environ.get("BENCH_CROSS_INT8", "0") == "1"
    dec_fn = jax.jit(lambda p, e: decode_transcript(
        p, None, cfg, policy, max_len=DECODE_LEN, enc_out=e,
        pallas_ffn=pallas_ffn, pallas_self_attn=pallas_self_attn,
        pallas_cross=pallas_cross, pallas_layer=pallas_layer,
        quant=quant, cross_int8=cross_int8, unroll=unroll))
    dt_dec, _ = time_program(lambda: dec_fn(params, enc_out), ITERS)
    dec_ms = dt_dec / ITERS * 1000.0
    # random-init weights never argmax EOS → all (max_len - 1) steps run
    steps = (DECODE_LEN - 1) * BATCH
    utt_s = BATCH * ITERS / (dt_enc + dt_dec)

    print(json.dumps({
        "metric": f"whisper_{SIZE}_transcribe",
        "value": round(utt_s, 2),
        "unit": f"utterances/sec (30s window, {DECODE_LEN}-token decode)",
        "batch": BATCH,
        "encode_ms_per_batch": round(enc_ms, 2),
        "decode_ms_per_batch": round(dec_ms, 2),
        "decode_steps_per_sec": round(steps / (dt_dec / ITERS), 1),
        "scan_layers": scan_layers,
        "fuse_qkv": fuse_qkv,
        "pallas_ffn": pallas_ffn,
        "pallas_self_attn": pallas_self_attn,
        "pallas_cross": pallas_cross,
        "pallas_layer": pallas_layer,
        "cross_int8": cross_int8,
        "quant": qmode or "none",
        "unroll": unroll,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
