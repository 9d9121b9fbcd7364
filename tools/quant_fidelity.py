"""Score-level fidelity of the int8_ffn serving mode (VERDICT r4 #1).

Default-flip evidence: runs the full-modality signal program at the
serving shapes under (a) bf16 serving mode and (b) bf16 + int8_ffn on
IDENTICAL inputs/weights and reports max per-signal score deltas. The
yardstick is the bf16-serving-vs-f32-parity delta on the same inputs
(the noise class every serving default already accepts) — measured on
the CPU backend where f32 parity math is exact. If the int8_ffn↔bf16
delta sits within that class, the quantized FFN changes nothing the
serving mode hadn't already traded.

Run on TPU for the operative A/B; `MISINFO_TPU_PLATFORM=cpu` adds the
f32 yardstick rows.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
SEQ = int(os.environ.get("BENCH_SEQ", "512"))


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from misinfo_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from misinfo_tpu.core.config import ForensicsConfig, PrecisionConfig
    from misinfo_tpu.engine.signals import signals_program
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.ops.common import Policy
    from misinfo_tpu.ops.serving import optimize_for_serving

    cfg = ForensicsConfig(verbose=False)
    det_cfg = DetectorConfig()
    params = detector_init(jax.random.PRNGKey(0), det_cfg)

    rng = np.random.default_rng(0)
    B, S, C = BATCH, SEQ, cfg.seq.clip_max_len
    size = cfg.seq.image_size
    vault = 2176
    batch = {
        "roberta_ids": jnp.asarray(rng.integers(3, 1000, (B, S)), jnp.int32),
        "roberta_mask": jnp.ones((B, S), jnp.int32),
        "clip_ids": jnp.asarray(rng.integers(1, 500, (B, C)), jnp.int32),
        "clip_mask": jnp.ones((B, C), jnp.int32),
        "image_effnet": jnp.asarray(
            rng.integers(0, 255, (B, size, size, 3)), jnp.uint8),
        "image_clip": jnp.asarray(
            rng.integers(0, 255, (B, size, size, 3)), jnp.uint8),
        "vault_emb": jnp.asarray(
            rng.normal(size=(vault, det_cfg.clip.projection_dim)),
            jnp.float32),
        "vault_valid": jnp.ones((vault,), jnp.bool_),
    }

    def run(quant: str, precision: PrecisionConfig):
        policy = Policy(precision)
        p = optimize_for_serving(params, policy, quant=quant)
        fn = jax.jit(functools.partial(
            signals_program, variant="full", det_cfg=det_cfg, cfg=cfg,
            policy=policy))
        out = fn(p, batch)
        return {name: np.asarray(getattr(out, name), np.float32)
                for name in ("ai_score", "misinfo_score", "deepfake_score",
                             "clip_similarity", "vault_discrepancy",
                             "fake_probability")}

    def delta(a, b):
        return {k: round(float(np.max(np.abs(a[k] - b[k]))), 6) for k in a}

    bf16 = run("none", PrecisionConfig())
    i8f = run("int8_ffn", PrecisionConfig())
    rows = {"int8_ffn_vs_bf16": delta(i8f, bf16)}
    if jax.devices()[0].platform != "tpu":
        f32 = run("none", PrecisionConfig.highest())
        rows["bf16_vs_f32_yardstick"] = delta(bf16, f32)
        rows["int8_ffn_vs_f32"] = delta(i8f, f32)
    print(json.dumps({
        "metric": "int8_ffn_score_fidelity",
        "batch": B, "seq": S,
        "device": str(jax.devices()[0]),
        "max_abs_score_delta": rows,
    }))


if __name__ == "__main__":
    main()
