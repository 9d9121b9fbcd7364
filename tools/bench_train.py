"""Training-throughput benchmark: the RoBERTa detective step (C15,
reference train_roberta_detective.py semantics — AdamW, cosine schedule,
grad clip 1.0) on TPU. Prints one JSON line with steps/s and examples/s.

The reference trains this recipe on a 6 GB consumer GPU with AMP at
batch 16 / max_len 256 (train_roberta_detective.py:4,155-165); this
measures the same-shape jit'd step on one TPU chip.

    python tools/bench_train.py            # TPU
    BENCH_BATCH=32 BENCH_SEQ=256 python tools/bench_train.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
SEQ = int(os.environ.get("BENCH_SEQ", "256"))
STEPS = int(os.environ.get("BENCH_STEPS", "20"))


def main():
    import jax
    import jax.numpy as jnp

    from misinfo_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from misinfo_tpu.core.config import PrecisionConfig
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.ops.common import Policy
    from misinfo_tpu.train.optim import OptimConfig, branch_mask, make_optimizer
    from misinfo_tpu.train.steps import make_text_head_step

    det_cfg = DetectorConfig()
    policy = Policy(PrecisionConfig(gelu_mode="erf"))  # training numerics
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    # same freeze mask as the real trainer (clip/effnet branches carry no
    # grads in this recipe; masking skips their optimizer-moment traffic)
    tx = make_optimizer(
        OptimConfig(total_steps=1000),
        trainable_mask=branch_mask(params, ["roberta", "ai_head",
                                            "misinfo_head"]))
    opt_state = tx.init(params)
    step = make_text_head_step(tx, det_cfg, policy)

    rng = np.random.default_rng(0)
    batches = []
    for i in range(4):  # distinct buffers (relay memoization caveat)
        batches.append({
            "input_ids": jnp.asarray(rng.integers(3, 50000, (BATCH, SEQ)),
                                     jnp.int32),
            "attention_mask": jnp.ones((BATCH, SEQ), jnp.int32),
            "labels": jnp.asarray(rng.integers(0, 2, (BATCH,)), jnp.int32),
        })

    key = jax.random.PRNGKey(0)
    params, opt_state, m = step(params, opt_state, batches[0], key)
    jax.block_until_ready(m["loss"])  # compile + warmup

    t0 = time.perf_counter()
    for i in range(STEPS):
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state,
                                    batches[i % len(batches)], k)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "roberta_detective_train_step",
        "value": round(STEPS / dt, 2),
        "unit": "steps/sec (batch %d, seq %d)" % (BATCH, SEQ),
        "examples_per_sec": round(BATCH * STEPS / dt, 1),
        "step_ms": round(dt / STEPS * 1000, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
