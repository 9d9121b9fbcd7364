"""Mixed-traffic serving load benchmark with latency percentiles
(VERDICT r3 #3: the serving story under a realistic arrival process, not a
single-variant steady-state loop).

Poisson arrivals over a configurable mix — short text, long text, full
modality (text+image), image-only, a mid-run VIDEO BURST, and (optionally)
a Whisper transcript request sharing the chip — drive
``engine.batching.BatchingEngine`` (the concurrent-caller surface the REST
API rides) after a full-grid warmup. Reports sustained verdicts/s plus
p50/p95/p99 submit→result latency per traffic class, and asserts the run
minted NO new jit signature (a novel shape would be a minutes-long
mid-request TPU compile — the thing ``--warmup full`` exists to prevent).

    python tools/bench_serve.py                       # TPU, 30 s window
    BENCH_RPS=300 BENCH_SECONDS=60 python tools/bench_serve.py
    BENCH_TRANSCRIBE=0 python tools/bench_serve.py    # detector-only mix
    BENCH_WARMUP=endpoints python tools/bench_serve.py  # quick warmup

Contrast: the reference dashboard is strictly serial — one global engine,
one request at a time (/root/reference/forensics_dashboard.py:91-94); its
"load" behavior is a queue. Numbers land in docs/PERF.md "serving under
load".
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RPS = float(os.environ.get("BENCH_RPS", "200"))
SECONDS = float(os.environ.get("BENCH_SECONDS", "30"))
WARMUP = os.environ.get("BENCH_WARMUP", "full")       # full | endpoints
TRANSCRIBE = os.environ.get("BENCH_TRANSCRIBE", "1") == "1"
VIDEO_BURST = int(os.environ.get("BENCH_VIDEO_BURST", "8"))
SEED = int(os.environ.get("BENCH_SEED", "0"))

# traffic mix: (class, weight). Weights approximate a news-forensics feed:
# headline checks dominate, a third carry the article image, long articles
# and image-only checks trail.
MIX = [("text_short", 0.45), ("text_long", 0.15),
       ("full", 0.30), ("visual", 0.10)]

_WORDS = ("breaking news report officials study claims shocking reveals "
          "yesterday according sources government health experts warn "
          "data shows alleged viral photo").split()


def _percentiles(xs):
    """Nearest-rank percentiles, same convention as utils/tracing.py."""
    if not xs:
        return {}
    s = sorted(xs)
    pick = lambda p: s[min(len(s) - 1, max(0, -(-int(p * len(s)) // 1) - 1))]  # noqa: E731
    return {"p50": round(pick(0.50) * 1000, 1),
            "p95": round(pick(0.95) * 1000, 1),
            "p99": round(pick(0.99) * 1000, 1),
            "n": len(s)}


def _jit_cache_sizes(eng) -> dict:
    # same accounting as tests/test_warmup_grid.py, but per-fn so a mid-run
    # mint NAMES the program with the warmup hole
    d = {"pack_out": eng._pack_out._cache_size(),
         "clip_text": eng._clip_text_jit._cache_size()}
    for name, fn in eng.programs._jitted.items():
        d[name] = fn._cache_size()
    return d


def _make_video(path: str) -> bool:
    try:
        import cv2
    except ImportError:
        return False
    w, h, fps = 192, 128, 10.0
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
    if not writer.isOpened():
        return False
    rng = np.random.default_rng(SEED)
    for i in range(40):
        frame = np.full((h, w, 3), (i * 6) % 255, np.uint8)
        frame[:, : w // 2] = rng.integers(0, 255, (h, w // 2, 3))
        writer.write(frame)
    writer.release()
    return True


def _make_whisper_ckpt(tmpdir: str) -> str:
    """Random-init base-dims Whisper with the byte tokenizer's vocab, saved
    as a native checkpoint — lets the transcript path run end-to-end on the
    chip without pretrained weights (zero-egress image)."""
    import dataclasses

    import jax

    from misinfo_tpu.checkpoints.io import save_checkpoint
    from misinfo_tpu.models.whisper import WhisperConfig, whisper_init
    from misinfo_tpu.preprocess.whisper_tokenizer import ByteWhisperTokenizer
    from misinfo_tpu.serve.transcript import _SIZES

    sp = ByteWhisperTokenizer().specials
    cfg = WhisperConfig(**_SIZES["base"], vocab_size=sp.vocab_size,
                        eos_token_id=sp.eot, decoder_start_token_id=sp.sot)
    params = whisper_init(jax.random.PRNGKey(0), cfg)
    ckpt = os.path.join(tmpdir, "whisper_ckpt")
    save_checkpoint(ckpt, params,
                    metadata={"whisper_config": dataclasses.asdict(cfg),
                              "tokenizer": "byte"})
    return ckpt


def _make_wav(path: str) -> None:
    import wave

    sr = 16000
    t = np.arange(2 * sr) / sr
    audio = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())


def main():
    from PIL import Image

    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.batching import BatchingEngine
    from misinfo_tpu.engine.forensics import MisinfoForensics

    cfg = ForensicsConfig.from_env(verbose=False)
    engine = MisinfoForensics(config=cfg)
    rng = np.random.default_rng(SEED)

    # ---- fixture pools (kept tiny so the generator thread stays cheap)
    texts_short = [" ".join(rng.choice(_WORDS, size=int(n)))
                   for n in rng.integers(10, 22, 8)]
    texts_long = [" ".join(rng.choice(_WORDS, size=320)) for _ in range(4)]
    images = [Image.fromarray(rng.integers(0, 255, (480, 640, 3))
                              .astype(np.uint8)) for _ in range(8)]
    video_path = "/tmp/misinfo_bench_serve.mp4"
    have_video = VIDEO_BURST > 0 and _make_video(video_path)
    wav_path = "/tmp/misinfo_bench_serve.wav"

    def make_request(kind: str):
        if kind == "text_short":
            return {"text": texts_short[rng.integers(len(texts_short))]}
        if kind == "text_long":
            return {"text": texts_long[rng.integers(len(texts_long))]}
        if kind == "full":
            return {"text": texts_short[rng.integers(len(texts_short))],
                    "image": images[rng.integers(len(images))]}
        return {"image": images[rng.integers(len(images))]}

    # ---- warmup: the production rule — no request may mint a signature
    t_w = time.perf_counter()
    # videos=None under full_grid warms EVERY video bucket — required
    # because the micro-batcher can drain a burst into any group size
    # (e.g. 8 burst requests split by variant into two groups of 4 →
    # V-bucket-4 signatures for video AND video_text; measured round 4:
    # restricting warmup to (1, VIDEO_BURST) minted exactly those two
    # mid-run, and the mid-run compiles pushed p50 to ~86 s)
    warmed = engine.warmup(
        full_grid=WARMUP == "full",
        videos=(None if (WARMUP == "full" and have_video)
                else ((1, VIDEO_BURST) if have_video else ())))
    transcriber = None
    if TRANSCRIBE:
        from misinfo_tpu.serve import transcript as T
        _make_wav(wav_path)
        os.environ["WHISPER_CHECKPOINT"] = _make_whisper_ckpt("/tmp")
        T.reset_transcriber()
        T.warmup_transcriber()
        transcriber = T
    warmup_s = time.perf_counter() - t_w
    sig0 = _jit_cache_sizes(engine)

    # per-cycle attribution: split each collector batch into dispatch
    # (host prep + enqueue, no device sync) vs finalize (device wait +
    # relay fetch + report formatting) — names the binding constraint
    # when sustained throughput lands below the single-variant rows
    cycle_stats: list = []
    orig_async = engine.analyze_batch_async

    def timed_async(reqs, explanations=False):
        t0 = time.perf_counter()
        fin = orig_async(reqs, explanations)
        t_disp = time.perf_counter() - t0

        def fin2():
            t1 = time.perf_counter()
            out = fin()
            cycle_stats.append((len(reqs), t_disp,
                                time.perf_counter() - t1))
            return out

        return fin2

    engine.analyze_batch_async = timed_async

    server = BatchingEngine(engine)
    records = []          # (kind, t_submit, future)
    lock = threading.Lock()

    done_at = {}          # id(future) → perf_counter at set_result time

    def submit(kind, req):
        fut = server.submit(req)
        # stamp completion WHEN THE FUTURE RESOLVES (done callbacks run
        # on the finalizer thread at set_result), not when the drain loop
        # below happens to reach it — the round-4/round-5 latency
        # percentiles measured with the drain-loop clock were artifacts:
        # every mid-window completion read as (window_end − t_submit),
        # which is exactly a p50 ≈ window/2 signature (docs/PERF.md
        # round-5 correction)
        fut.add_done_callback(
            lambda f: done_at.__setitem__(id(f), time.perf_counter()))
        with lock:
            records.append((kind, time.perf_counter(), fut))

    kinds = [k for k, _ in MIX]
    weights = np.asarray([w for _, w in MIX])
    weights = weights / weights.sum()

    stop = threading.Event()

    def generator():
        deadline = time.perf_counter() + SECONDS
        while time.perf_counter() < deadline and not stop.is_set():
            time.sleep(rng.exponential(1.0 / RPS))
            kind = kinds[rng.choice(len(kinds), p=weights)]
            submit(kind, make_request(kind))

    burst_result = {}

    def video_burst():
        time.sleep(SECONDS * 0.5)
        if not have_video:
            return
        t0 = time.perf_counter()
        futs = []
        for i in range(VIDEO_BURST):
            req = {"video": video_path}
            if i % 2 == 0:
                req["text"] = texts_short[i % len(texts_short)]
            futs.append(server.submit(req))
        for f in futs:
            f.result()
        burst_result["videos"] = VIDEO_BURST
        burst_result["burst_wall_ms"] = round(
            (time.perf_counter() - t0) * 1000, 1)

    transcript_result = {}

    def transcript():
        time.sleep(SECONDS / 3)
        t0 = time.perf_counter()
        out = transcriber.extract_transcript(wav_path)
        transcript_result["latency_ms"] = round(
            (time.perf_counter() - t0) * 1000, 1)
        transcript_result["ok"] = not out.startswith("[transcript error")

    threads = [threading.Thread(target=generator, daemon=True)]
    if have_video:
        threads.append(threading.Thread(target=video_burst, daemon=True))
    if transcriber is not None:
        threads.append(threading.Thread(target=transcript, daemon=True))
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        # unconditional join: abandoning a worker inside a device call is
        # what forced the old os._exit teardown dodge (VERDICT r4 #7);
        # the workloads are finite, so a hang here is a real bug and
        # should be loud, not raced past
        th.join()

    # drain: every submitted request completes (reports by-class latency
    # including queueing + micro-batching + device + fetch)
    lat = {k: [] for k in kinds}
    failed = 0
    t_last = t0
    for kind, t_sub, fut in records:
        try:
            fut.result(timeout=300)
            # true completion time from the done callback; fall back to
            # now only if the callback somehow didn't fire
            t_done = done_at.get(id(fut), time.perf_counter())
            lat[kind].append(t_done - t_sub)
            t_last = max(t_last, t_done)
        except Exception:
            failed += 1
    server.close()
    n_done = sum(len(v) for v in lat.values())
    wall = max(t_last - t0, 1e-9)
    sig1 = _jit_cache_sizes(engine)
    minted = {k: sig1[k] - sig0.get(k, 0) for k in sig1
              if sig1[k] != sig0.get(k, 0)}
    n_minted = sum(minted.values())

    all_lat = [x for v in lat.values() for x in v]
    cycles = None
    if cycle_stats:
        ns = [n for n, _, _ in cycle_stats]
        disp = [d for _, d, _ in cycle_stats]
        fin = [f for _, _, f in cycle_stats]
        cycles = {"batches": len(ns),
                  "mean_batch": round(float(np.mean(ns)), 1),
                  "dispatch_ms": _percentiles(disp),
                  "finalize_ms": _percentiles(fin)}
    print(json.dumps({
        "metric": "serving_under_load",
        "value": round(n_done / wall, 1),
        "unit": "verdicts/sec (Poisson mixed traffic through BatchingEngine)",
        "offered_rps": RPS,
        "window_s": SECONDS,
        "completed": n_done,
        "failed": failed,
        "latency_ms": {k: _percentiles(v) for k, v in lat.items() if v},
        "latency_ms_all": _percentiles(all_lat),
        "video_burst": burst_result or None,
        "transcript": transcript_result or None,
        "collector_cycles": cycles,
        "new_jit_signatures": n_minted,
        "minted_by_program": minted or None,
        "warmup": {"mode": WARMUP, "signatures": len(warmed),
                   "seconds": round(warmup_s, 1)},
    }))
    if n_minted:
        print(f"WARNING: {n_minted} jit signature(s) minted mid-run "
              f"({minted}) — the warmup grid has a hole", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    # normal teardown: BatchingEngine.close() now drains (every finalize
    # ends in a device fetch) and the worker threads above are joined
    # without timeout, so no thread can be inside a device call at
    # interpreter exit — the round-4 os._exit dodge is gone (VERDICT r4
    # #7; clean-exit repetitions recorded in docs/PERF.md round 5).
    sys.exit(main())
