"""End-to-end serving benchmark THROUGH the facade: host preprocessing
(BPE tokenize, PIL decode/resize) + device program + report formatting.

Complements bench.py (pure program throughput) with the number a service
operator sees. Prints one JSON line.

    python tools/bench_e2e.py            # TPU
    MISINFO_TPU_PLATFORM=cpu python tools/bench_e2e.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))
# BENCH_PIPELINE=1 measures the pipelined serving loop
# (engine.analyze_batch_async, the path BatchingEngine drives): batch N+1
# is prepped + dispatched while batch N executes/fetches, so the tunnel
# RTT that bounds the synchronous path overlaps with device work.
PIPELINE = os.environ.get("BENCH_PIPELINE", "0") == "1"
# BENCH_JPEG_RES=<short side px> feeds JPEG FILE paths at that resolution
# (16:9) instead of in-memory 480p PIL images — the traffic shape where
# MISINFO_TPU_FAST_DECODE=1 (reduced JPEG decode) engages.
JPEG_RES = int(os.environ.get("BENCH_JPEG_RES", "0"))


def main():
    from PIL import Image

    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.forensics import MisinfoForensics
    from misinfo_tpu.utils.tracing import GLOBAL_TRACER

    # from_env → serving knobs (MISINFO_TPU_DEVICE_RESIZE,
    # MISINFO_TPU_PACK_TEXT, vault modes) A/B through this bench too
    cfg = ForensicsConfig.from_env(verbose=False)
    engine = MisinfoForensics(config=cfg)

    rng = np.random.default_rng(0)
    words = ["breaking", "news", "report", "officials", "study", "claims",
             "shocking", "reveals", "yesterday", "according", "sources"]
    requests = []
    for i in range(BATCH):
        text = " ".join(rng.choice(words, size=18))
        if JPEG_RES:
            h, w = JPEG_RES, JPEG_RES * 16 // 9
            y = np.linspace(0, 255, h, dtype=np.float32)[:, None]
            x = np.linspace(0, 255, w, dtype=np.float32)[None, :]
            rgb = np.stack([y + 0 * x, 0 * y + x, (y + x) / 2],
                           -1).astype(np.uint8)
            rgb ^= rng.integers(0, 16, rgb.shape).astype(np.uint8)
            img = f"/tmp/misinfo_bench_{JPEG_RES}_{i}.jpg"
            Image.fromarray(rgb).save(img, quality=90)
        else:
            img = Image.fromarray(
                rng.integers(0, 255, (480, 640, 3)).astype(np.uint8))
        requests.append({"text": text, "image": img})

    engine.analyze_batch(requests)  # warmup/compile
    base = GLOBAL_TRACER.summary()  # exclude warmup from the fraction
    t0 = time.perf_counter()
    if PIPELINE:
        pending = None
        for _ in range(ITERS):
            fin = engine.analyze_batch_async(requests)
            if pending is not None:
                out = pending()
            pending = fin
        out = pending()
    else:
        for _ in range(ITERS):
            out = engine.analyze_batch(requests)
    dt = time.perf_counter() - t0

    # host-only cost of the same batch (tokenize + decode/resize), no device
    texts = [r["text"] for r in requests]
    images = [r["image"] for r in requests]
    engine._tokenize_batch(texts, BATCH)
    engine._image_batch(images, BATCH)
    t1 = time.perf_counter()
    for _ in range(ITERS):
        engine._tokenize_batch(texts, BATCH)
        engine._image_batch(images, BATCH)
    host_ms = (time.perf_counter() - t1) / ITERS * 1000.0

    throughput = BATCH * ITERS / dt
    summary = GLOBAL_TRACER.summary()
    # pipelined analyze spans overlap (finalize(N) runs after dispatch(N+1)),
    # so their sum exceeds wall time; use the loop's wall clock as the
    # denominator there — "device busy fraction of the run"
    prog_s = (summary.get("program_full_seconds", 0.0)
              - base.get("program_full_seconds", 0.0))
    analyze_s = (summary.get("analyze_seconds", 0.0)
                 - base.get("analyze_seconds", 0.0))
    device_frac = prog_s / (dt if PIPELINE else max(1e-9, analyze_s))
    print(json.dumps({
        "metric": ("analyze_batch_e2e_pipelined" if PIPELINE
                   else "analyze_batch_e2e_throughput"),
        "value": round(throughput, 2),
        "unit": "verdicts/sec (incl host preprocessing)",
        "batch": BATCH,
        "p50_request_latency_ms": round(1000 * dt / (ITERS * BATCH), 3),
        "device_time_fraction": round(device_frac, 3),
        # NB: through the axon tunnel every analyze_batch pays a full
        # remote round trip; on a co-located TPU host the ceiling is
        # max(host_prep, device_program) per batch.
        "host_prep_ms_per_batch": round(host_ms, 2),
        "host_prep_ceiling_verdicts_per_sec": round(BATCH / host_ms * 1000, 1),
    }))


if __name__ == "__main__":
    main()
