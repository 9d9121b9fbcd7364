"""Restart-to-ready attribution (VERDICT r4 #3a/#3b).

A fully-cached full-grid warmup still measured 1448-1757 s (~5-8 s per
cached signature) through this image's relay. This tool splits ONE
signature's cost into its phases so the floor is attributable:

  trace+lower  — host Python/StableHLO work (pure local CPU)
  compile()    — persistent-cache read + backend compile RPC *or* cached
                 executable load onto the device (the relay-sensitive part)
  first run    — dispatch + execute + data fetch

and then measures the AOT path: `jax.experimental.serialize_executable`
(serialize a compiled executable to bytes; deserialize_and_load on a
fresh function) — if deserialize+load is much cheaper than compile(),
shipping serialized executables beats re-walking the compile path on
restart; if it costs the same, the floor is the device-side executable
LOAD through the relay and no host-side caching can cut it.

Run on the TPU (default) and on the CPU backend
(`MISINFO_TPU_PLATFORM=cpu`) — the CPU numbers are the local-work
baseline; the TPU-minus-CPU gap is the relay/device term.

Output: one JSON line per phase set.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIGS = os.environ.get("BENCH_RESTART_SIGS", "full:32:512,full:64:128,"
                      "text_only:32:512").split(",")


def main():
    import jax
    import jax.numpy as jnp

    from misinfo_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.signals import signals_program
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.ops.common import Policy
    from misinfo_tpu.utils.timing import sync_fetch
    import functools

    cfg = ForensicsConfig(verbose=False)
    det_cfg = DetectorConfig()
    policy = Policy(cfg.precision)
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    from misinfo_tpu.ops.serving import optimize_for_serving
    params = optimize_for_serving(params, policy)

    rng = np.random.default_rng(0)
    size = cfg.seq.image_size
    C = cfg.seq.clip_max_len

    def make_batch(variant, B, S):
        batch = {
            "roberta_ids": jnp.asarray(rng.integers(3, 1000, (B, S)),
                                       jnp.int32),
            "roberta_mask": jnp.ones((B, S), jnp.int32),
            "clip_ids": jnp.asarray(rng.integers(1, 500, (B, C)), jnp.int32),
            "clip_mask": jnp.ones((B, C), jnp.int32),
        }
        if variant == "full":
            batch["image_effnet"] = jnp.asarray(
                rng.integers(0, 255, (B, size, size, 3)), jnp.uint8)
            batch["image_clip"] = batch["image_effnet"]
        vault = 2176
        batch["vault_emb"] = jnp.asarray(
            rng.normal(size=(vault, det_cfg.clip.projection_dim)),
            jnp.float32)
        batch["vault_valid"] = jnp.ones((vault,), jnp.bool_)
        return batch

    results = []
    for spec in SIGS:
        variant, B, S = spec.split(":")
        B, S = int(B), int(S)
        batch = make_batch(variant, B, S)
        fn = jax.jit(functools.partial(
            signals_program, variant=variant, det_cfg=det_cfg, cfg=cfg,
            policy=policy))

        t0 = time.perf_counter()
        lowered = fn.lower(params, batch)
        t_lower = time.perf_counter() - t0

        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = compiled(params, batch)
        sync_fetch(out)
        t_exec = time.perf_counter() - t0

        row = {"sig": spec, "lower_s": round(t_lower, 2),
               "compile_s": round(t_compile, 2),
               "first_exec_s": round(t_exec, 2)}

        # AOT: serialize the compiled executable, then deserialize+load it
        # as a fresh callable — the restart path that skips compile()
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load, serialize)
            t0 = time.perf_counter()
            payload, in_tree, out_tree = serialize(compiled)
            t_ser = time.perf_counter() - t0
            t0 = time.perf_counter()
            loaded = deserialize_and_load(payload, in_tree, out_tree)
            t_deser = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = loaded(params, batch)
            sync_fetch(out)
            t_exec2 = time.perf_counter() - t0
            row.update(aot_bytes=len(payload),
                       aot_serialize_s=round(t_ser, 2),
                       aot_load_s=round(t_deser, 2),
                       aot_first_exec_s=round(t_exec2, 2))
        except Exception as e:  # API unavailable on this jax/backend
            row["aot_error"] = f"{type(e).__name__}: {e}"
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "metric": "restart_attribution",
        "device": str(jax.devices()[0]),
        "rows": results,
    }))


if __name__ == "__main__":
    main()
