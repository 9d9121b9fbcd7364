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
PACK = os.environ.get("BENCH_PACK", "0") == "1"  # packed ragged batches


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

    rng = np.random.default_rng(0)
    batches = []
    n_examples_per_step = BATCH
    if PACK:
        # ragged lengths U[32,SEQ) packed into BATCH rows of SEQ tokens —
        # the trainer's --pack mode (train/steps.make_packed_text_head_step)
        from misinfo_tpu.preprocess.packing import StreamPacker
        from misinfo_tpu.train.steps import make_packed_text_head_step
        step = make_packed_text_head_step(tx, det_cfg, policy)
        n_slots = BATCH * 4
        packer = StreamPacker(SEQ, det_cfg.roberta.pad_token_id,
                              n_rows=BATCH, n_slots=n_slots)
        counts = []
        while len(batches) < 4:
            seq = rng.integers(3, 50000, (int(rng.integers(32, SEQ)),)).astype(np.int32)
            out = packer.add(seq, meta=int(rng.integers(0, 2)))
            if out is None:
                continue
            packed, metas = out
            labels = np.zeros(n_slots, np.int32)
            labels[: len(metas)] = metas
            valid = np.zeros(n_slots, np.float32)
            valid[: len(metas)] = 1.0
            batches.append({k: jnp.asarray(v) for k, v in {
                "input_ids": packed.ids, "attention_mask": packed.mask,
                "position_ids": packed.position_ids,
                "segment_ids": packed.segment_ids,
                "cls_rows": packed.cls_rows, "cls_cols": packed.cls_cols,
                "labels": labels, "slot_valid": valid}.items()})
            counts.append(len(metas))
        n_examples_per_step = float(np.mean(counts))
    else:
        step = make_text_head_step(tx, det_cfg, policy)
        for i in range(4):  # distinct buffers (relay memoization caveat)
            batches.append({
                "input_ids": jnp.asarray(rng.integers(3, 50000, (BATCH, SEQ)),
                                         jnp.int32),
                "attention_mask": jnp.ones((BATCH, SEQ), jnp.int32),
                "labels": jnp.asarray(rng.integers(0, 2, (BATCH,)), jnp.int32),
            })

    from misinfo_tpu.utils.timing import sync_fetch

    key = jax.random.PRNGKey(0)
    params, opt_state, m = step(params, opt_state, batches[0], key)
    sync_fetch(m["loss"])  # compile + warmup (data sync — see utils/timing.py)

    t0 = time.perf_counter()
    for i in range(STEPS):
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state,
                                    batches[i % len(batches)], k)
    sync_fetch(m["loss"])
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": ("roberta_detective_train_step_packed" if PACK
                   else "roberta_detective_train_step"),
        "value": round(STEPS / dt, 2),
        "unit": "steps/sec (batch %d, seq %d)" % (BATCH, SEQ),
        "examples_per_sec": round(n_examples_per_step * STEPS / dt, 1),
        "examples_per_step": round(n_examples_per_step, 1),
        "step_ms": round(dt / STEPS * 1000, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
