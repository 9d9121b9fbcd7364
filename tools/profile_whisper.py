"""Op-level TPU profile of the Whisper KV-cached decode loop.

    python tools/profile_whisper.py            # base model, b4, 128 steps

Prints the top self-time ops inside the decode `while_loop` — the ground
truth for choosing decode-step fusions (docs/PERF.md round-3 decode-floor
accounting). Uses the same xplane wire-format reader as
tools/profile_program.py.
"""

from __future__ import annotations

import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = os.environ.get("WHISPER_MODEL", "base")
BATCH = int(os.environ.get("BENCH_BATCH", "4"))
DECODE_LEN = int(os.environ.get("BENCH_DECODE_LEN", "128"))
ITERS = int(os.environ.get("PROFILE_ITERS", "3"))
TOP_N = int(os.environ.get("PROFILE_TOP", "40"))
LOG_DIR = os.environ.get("PROFILE_DIR", "/tmp/whisper_profile")
SCAN = os.environ.get("BENCH_SCAN_LAYERS", "0") == "1"


def main():
    import jax
    import jax.numpy as jnp

    from misinfo_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.models.whisper import (WhisperConfig, decode_transcript,
                                            whisper_encode, whisper_init)
    from misinfo_tpu.ops.common import Policy
    from misinfo_tpu.ops.serving import optimize_whisper_for_serving
    from misinfo_tpu.serve.transcript import _SIZES
    from misinfo_tpu.utils.timing import sync_fetch

    cfg = WhisperConfig(**_SIZES[SIZE])
    policy = Policy(ForensicsConfig().precision)
    params = optimize_whisper_for_serving(
        whisper_init(jax.random.PRNGKey(0), cfg), policy)
    if SCAN:
        from misinfo_tpu.models.whisper import stack_whisper_decoder
        params = stack_whisper_decoder(params)
    # same knobs as tools/bench_whisper.py so profiles match bench configs
    quant = os.environ.get("BENCH_QUANT", "") == "int8"
    if os.environ.get("BENCH_FUSE_QKV", "0") == "1" or quant:
        from misinfo_tpu.models.whisper import fuse_whisper_decoder_qkv
        params = fuse_whisper_decoder_qkv(params)
    if quant:
        from misinfo_tpu.ops.serving import quantize_whisper_decoder
        params = quantize_whisper_decoder(params)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (BATCH, cfg.max_source_positions * 2, cfg.num_mel_bins))
        .astype(np.float32))
    enc = jax.jit(lambda p, m: whisper_encode(p, m, cfg, policy))(params, mel)
    dec = jax.jit(lambda p, e: decode_transcript(
        p, None, cfg, policy, max_len=DECODE_LEN, enc_out=e, quant=quant))
    sync_fetch(dec(params, enc))     # compile outside the trace

    import shutil
    shutil.rmtree(LOG_DIR, ignore_errors=True)
    with jax.profiler.trace(LOG_DIR):
        out = None
        for _ in range(ITERS):
            out = dec(params, enc)
        sync_fetch(out)

    xplanes = glob.glob(os.path.join(LOG_DIR, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print(json.dumps({"error": "no xplane captured"}))
        return 1
    from tools.xplane_parse import op_totals
    rows = op_totals(xplanes, plane_filter="TPU")
    total = sum(r["total_ms"] for r in rows)
    print(f"# decode profile {SIZE} b{BATCH} L{DECODE_LEN} scan={SCAN}: "
          f"{len(rows)} distinct ops, {total:.1f} ms total over {ITERS} iters")
    for r in rows[:TOP_N]:
        print(f"{r['total_ms']:9.2f} ms  x{r['occurrences']:<6} "
              f"{r['op'][:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
