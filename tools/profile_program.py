"""Op-level TPU profile of a serving program (jax.profiler → xplane →
op table via tensorboard_plugin_profile).

    PROFILE_VARIANT=video_text BENCH_VIDEOS=8 python tools/profile_program.py
    PROFILE_VARIANT=visual_only BENCH_BATCH=96 python tools/profile_program.py

Prints the top-N self-time ops (name, category, ms, %) — the ground truth
for deciding whether a fusion/pass-count optimization is worth building
(docs/PERF.md round-2: component ablations say the towers are near their
ceilings; this shows WHERE inside each tower the time goes).
"""

from __future__ import annotations

import functools
import glob
import json
import os
import sys

# tensorboard_plugin_profile ships stale *_pb2.py files that the upb
# protobuf runtime in this image rejects; the pure-Python runtime accepts
# them. Must be set before anything imports google.protobuf.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANT = os.environ.get("PROFILE_VARIANT", "visual_only")
BATCH = int(os.environ.get("BENCH_BATCH", "32"))
VIDEOS = int(os.environ.get("BENCH_VIDEOS", "8"))
ITERS = int(os.environ.get("PROFILE_ITERS", "5"))
TOP_N = int(os.environ.get("PROFILE_TOP", "30"))
LOG_DIR = os.environ.get("PROFILE_DIR", "/tmp/misinfo_profile")


def _build(cfg, det, policy, params):
    import jax
    import jax.numpy as jnp

    from misinfo_tpu.engine.signals import signals_program, video_program

    rng = np.random.default_rng(0)
    vault_rows = 2176
    vault = jnp.asarray(rng.standard_normal((vault_rows, 512),
                                            dtype=np.float32))
    common = {
        "vault_emb": vault,
        "vault_valid": jnp.ones((vault_rows,), jnp.bool_),
        "vault_text_emb": vault,
    }
    if VARIANT.startswith("video"):
        V, F = VIDEOS, cfg.video.max_frames
        batch = {
            "image_effnet": jnp.asarray(
                rng.integers(0, 255, (V * F, 224, 224, 3)), jnp.uint8),
            "image_clip": jnp.asarray(
                rng.integers(0, 255, (V * F, 224, 224, 3)), jnp.uint8),
            "frame_valid": jnp.ones((V, F), jnp.bool_), **common}
        if VARIANT == "video_text":
            S = int(os.environ.get("BENCH_SEQ", "512"))
            batch.update(
                roberta_ids=jnp.asarray(
                    rng.integers(3, 50000, (V, S)), jnp.int32),
                roberta_mask=jnp.ones((V, S), jnp.int32),
                clip_ids=jnp.asarray(
                    rng.integers(1, 49000, (V, 77)), jnp.int32),
                clip_mask=jnp.ones((V, 77), jnp.int32))
        fn = functools.partial(video_program,
                               has_text=VARIANT == "video_text",
                               det_cfg=det, cfg=cfg, policy=policy)
        return jax.jit(fn), batch
    B = BATCH
    batch = {
        "image_effnet": jnp.asarray(
            rng.integers(0, 255, (B, 224, 224, 3)), jnp.uint8),
        "image_clip": jnp.asarray(
            rng.integers(0, 255, (B, 224, 224, 3)), jnp.uint8), **common}
    if VARIANT == "full":
        S = int(os.environ.get("BENCH_SEQ", "512"))
        batch.update(
            roberta_ids=jnp.asarray(rng.integers(3, 50000, (B, S)), jnp.int32),
            roberta_mask=jnp.ones((B, S), jnp.int32),
            clip_ids=jnp.asarray(rng.integers(1, 49000, (B, 77)), jnp.int32),
            clip_mask=jnp.ones((B, 77), jnp.int32))
    fn = functools.partial(signals_program, variant=VARIANT, det_cfg=det,
                           cfg=cfg, policy=policy)
    return jax.jit(fn), batch


def main():
    import jax

    from misinfo_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.ops.common import Policy
    from misinfo_tpu.ops.serving import optimize_for_serving

    cfg = ForensicsConfig(verbose=False)
    det = DetectorConfig()
    policy = Policy(cfg.precision)
    params = optimize_for_serving(
        detector_init(jax.random.PRNGKey(0), det), policy)
    fn, batch = _build(cfg, det, policy, params)

    from misinfo_tpu.utils.timing import sync_fetch

    out = fn(params, batch)          # compile outside the trace
    sync_fetch(out)

    import shutil
    shutil.rmtree(LOG_DIR, ignore_errors=True)
    with jax.profiler.trace(LOG_DIR):
        for _ in range(ITERS):
            out = fn(params, batch)
        sync_fetch(out)  # data sync — block_until_ready can ack early here

    xplanes = glob.glob(os.path.join(LOG_DIR, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print(json.dumps({"error": "no xplane captured",
                          "log_dir": LOG_DIR}))
        return 1
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
    except Exception as e:  # noqa: BLE001 — broken pywrap/proto gen in image
        print(f"# plugin converter unavailable ({type(e).__name__}); "
              "using tools/xplane_parse.py wire-format reader")
        return _fallback_op_table(xplanes)
    try:
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            xplanes, "framework_op_stats", {})
    except Exception as e:  # noqa: BLE001
        print(f"# plugin converter failed ({type(e).__name__}: {e}); "
              "using tools/xplane_parse.py wire-format reader")
        return _fallback_op_table(xplanes)
    # tool returns CSV-ish JSON; fall back to dumping raw for inspection
    try:
        table = json.loads(data)
    except Exception:
        open(os.path.join(LOG_DIR, "op_stats_raw.txt"), "w").write(
            data if isinstance(data, str) else repr(data))
        print(json.dumps({"note": "unparsed tool output saved",
                          "path": os.path.join(LOG_DIR, "op_stats_raw.txt")}))
        return 0

    # gviz table format: {cols: [...], rows: [{c: [{v:..}..]}..]}
    def rows_of(t):
        cols = [c.get("label") or c.get("id") for c in t["cols"]]
        for r in t["rows"]:
            yield dict(zip(cols, [c.get("v") for c in r["c"]]))

    tbl = table[0] if isinstance(table, list) else table
    rows = list(rows_of(tbl))
    key_time = next((k for k in rows[0]
                     if k and "self" in str(k).lower()
                     and "time" in str(k).lower()), None)
    rows.sort(key=lambda r: -(r.get(key_time) or 0))
    print(f"variant={VARIANT} iters={ITERS} top {TOP_N} ops by {key_time}:")
    for r in rows[:TOP_N]:
        print(json.dumps(r, default=str))
    return 0


def _fallback_op_table(xplanes):
    """Aggregate device-plane op durations via the wire-format reader."""
    from tools.xplane_parse import op_totals

    rows = op_totals(xplanes, plane_filter="TPU", line_filter="XLA Ops")
    scope = "plane~TPU line~'XLA Ops'"
    if not rows:  # line naming varies by runtime; widen progressively
        rows = op_totals(xplanes, plane_filter="TPU", line_filter="")
        scope = "plane~TPU all lines"
    if not rows:
        rows = op_totals(xplanes, plane_filter="", line_filter="")
        scope = "all planes"
    total = sum(r["total_ms"] for r in rows)
    print(f"variant={VARIANT} iters={ITERS} scope={scope} "
          f"total {total:.2f} ms ({total / ITERS:.2f} ms/iter); "
          f"top {TOP_N} ops:")
    for r in rows[:TOP_N]:
        print(json.dumps({**r, "total_ms": round(r["total_ms"], 3),
                          "pct": round(100 * r["total_ms"] / total, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
