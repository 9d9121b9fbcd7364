"""Per-branch timing of the batched video program (V videos × F frames):
which tower owns the milliseconds? Drives the same module fns the fused
video_program composes (engine/signals.py), each jitted standalone at the
video batch shapes, plus the fused program itself — the difference is
XLA's cross-branch fusion benefit.

    BENCH_VIDEOS=8 python tools/bench_video_split.py

Component timings at b≈96 are tens of ms — reliably timeable through the
axon relay (docs/PERF.md caveat: only sub-ms microbenchmarks lie).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = int(os.environ.get("BENCH_VIDEOS", "8"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))
SEQ = int(os.environ.get("BENCH_SEQ", "512"))
VAULT_ROWS = int(os.environ.get("BENCH_VAULT", "2176"))


def _time(fn, *args):
    from misinfo_tpu.utils.timing import time_program
    dt, _ = time_program(lambda: fn(*args), ITERS)
    return dt / ITERS * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from misinfo_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.signals import video_program
    from misinfo_tpu.models.clip import clip_image_features, clip_text_features
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.models.efficientnet import effnet_apply
    from misinfo_tpu.models.roberta import dual_head_logits
    from misinfo_tpu.ops.common import Policy, l2_normalize
    from misinfo_tpu.ops.image_ops import normalize_images
    from misinfo_tpu.ops.serving import optimize_for_serving
    from misinfo_tpu.vault.search import vault_search

    cfg = ForensicsConfig(verbose=False)
    det = DetectorConfig()
    policy = Policy(cfg.precision)
    params = optimize_for_serving(
        detector_init(jax.random.PRNGKey(0), det), policy)

    rng = np.random.default_rng(0)
    F = cfg.video.max_frames
    BF = V * F
    img = jnp.asarray(rng.integers(0, 255, (BF, 224, 224, 3)), jnp.uint8)
    ids = jnp.asarray(rng.integers(3, 50000, (V, SEQ)), jnp.int32)
    mask = jnp.ones((V, SEQ), jnp.int32)
    cids = jnp.asarray(rng.integers(1, 49000, (V, 77)), jnp.int32)
    cmask = jnp.ones((V, 77), jnp.int32)
    vault = jnp.asarray(rng.standard_normal((VAULT_ROWS, 512),
                                            dtype=np.float32))
    valid = jnp.ones((VAULT_ROWS,), jnp.bool_)
    q = l2_normalize(jnp.asarray(
        rng.standard_normal((BF, 512), dtype=np.float32)))

    timings = {}
    timings["effnet"] = _time(jax.jit(lambda p, im: effnet_apply(
        p["efficientnet"], normalize_images(im, "imagenet", policy.compute),
        policy=policy)[0]), params, img)
    timings["clip_image"] = _time(jax.jit(lambda p, im: l2_normalize(
        clip_image_features(p["clip"],
                            normalize_images(im, "clip", policy.compute),
                            det.clip, policy))), params, img)
    timings["roberta_text"] = _time(jax.jit(lambda p, i, m: dual_head_logits(
        p["roberta"], p["ai_head"], p["misinfo_head"], i, m,
        det.roberta, policy)), params, ids, mask)
    timings["clip_text"] = _time(jax.jit(lambda p, i, m: l2_normalize(
        clip_text_features(p["clip"], i, m, det.clip, policy))),
        params, cids, cmask)
    timings["vault"] = _time(jax.jit(lambda qq, v, rv: vault_search(
        qq, v, rv, top_k=cfg.seq.vault_top_k)), q, vault, valid)

    batch = {
        "image_effnet": img, "image_clip": img,
        "frame_valid": jnp.ones((V, F), jnp.bool_),
        "roberta_ids": ids, "roberta_mask": mask,
        "clip_ids": cids, "clip_mask": cmask,
        "vault_emb": vault, "vault_valid": valid,
        "vault_text_emb": vault,
    }
    fused = jax.jit(functools.partial(
        video_program, has_text=True, det_cfg=det, cfg=cfg, policy=policy))
    timings["fused_video_text"] = _time(fused, params, batch)

    comp_sum = sum(v for k, v in timings.items() if k != "fused_video_text")
    print(json.dumps({
        "videos": V, "frames": F, "seq": SEQ,
        **{k: round(v, 2) for k, v in timings.items()},
        "component_sum_ms": round(comp_sum, 2),
        "videos_per_sec_fused": round(V / timings["fused_video_text"] * 1000, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
