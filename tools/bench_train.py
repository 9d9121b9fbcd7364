"""Training-throughput benchmark for the jit'd trainer steps on TPU.
Prints one JSON line with steps/s and examples/s.

    python tools/bench_train.py                        # RoBERTa detective (C15)
    BENCH_TRAINER=effnet python tools/bench_train.py   # CIFAKE EffNet (C17)
    BENCH_TRAINER=clip python tools/bench_train.py     # CLIP InfoNCE (C18)
    BENCH_BATCH=32 BENCH_SEQ=256 python tools/bench_train.py

Reference shapes: the RoBERTa detective trains at batch 16 / max_len 256
on a 6 GB consumer GPU with AMP (train_roberta_detective.py:4,155-165);
the CIFAKE trainer full-model-trains EfficientNet-B0 at batch 16 / 224 px
(train_cifake_forensics.py:276-385); the CLIP detective trains
projections+logit_scale with symmetric InfoNCE at batch 16
(train_clip_detective.py:129-166). None publish throughput (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAINER = os.environ.get("BENCH_TRAINER", "roberta")  # roberta|effnet|clip
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
SEQ = int(os.environ.get("BENCH_SEQ", "256"))
STEPS = int(os.environ.get("BENCH_STEPS", "20"))
PACK = os.environ.get("BENCH_PACK", "0") == "1"  # packed ragged batches


def _bench_loop(step, params, opt_state, batches, n_examples, metric,
                unit_note):
    import jax

    from misinfo_tpu.utils.timing import sync_fetch

    key = jax.random.PRNGKey(0)
    params, opt_state, m = step(params, opt_state, batches[0], key)
    sync_fetch(m["loss"])  # compile + warmup (data sync — utils/timing.py)

    t0 = time.perf_counter()
    for i in range(STEPS):
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state,
                                    batches[i % len(batches)], k)
    sync_fetch(m["loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": metric,
        "value": round(STEPS / dt, 2),
        "unit": f"steps/sec ({unit_note})",
        "examples_per_sec": round(n_examples * STEPS / dt, 1),
        "examples_per_step": round(float(n_examples), 1),
        "step_ms": round(dt / STEPS * 1000, 2),
        "device": str(jax.devices()[0]),
    }))


def _bench_effnet():
    """CIFAKE EffNet step (C17): full-model conv/BN training with
    functional running-stat merge — a different unit mix from the
    RoBERTa step (VERDICT r3 #4)."""
    import jax
    import jax.numpy as jnp

    from misinfo_tpu.core.config import PrecisionConfig
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.ops.common import Policy
    from misinfo_tpu.train.optim import (OptimConfig, branch_mask,
                                         make_optimizer)
    from misinfo_tpu.train.steps import make_effnet_step

    det_cfg = DetectorConfig()
    policy = Policy(PrecisionConfig(gelu_mode="erf"))
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    tx = make_optimizer(
        OptimConfig(lr=1e-3, weight_decay=0.0, warmup_fraction=0.0,
                    total_steps=1000, clip_norm=None, schedule="constant"),
        trainable_mask=branch_mask(params, ["efficientnet"]))
    opt_state = tx.init(params)
    step = make_effnet_step(tx, policy, stats="clip")

    rng = np.random.default_rng(0)
    size = det_cfg.clip.image_size
    batches = [{
        "images_u8": jnp.asarray(
            rng.integers(0, 255, (BATCH, size, size, 3)), jnp.uint8),
        "labels": jnp.asarray(rng.integers(0, 2, (BATCH,)), jnp.int32),
    } for _ in range(4)]
    _bench_loop(step, params, opt_state, batches, BATCH,
                "cifake_effnet_train_step", f"batch {BATCH}, {size}px")


def _bench_clip():
    """CLIP detective InfoNCE step (C18): both CLIP towers forward, grads
    only on projections+logit_scale (the reference's freeze)."""
    import jax
    import jax.numpy as jnp

    from misinfo_tpu.core.config import PrecisionConfig
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.ops.common import Policy
    from misinfo_tpu.train.clip_detective import clip_trainable_mask
    from misinfo_tpu.train.optim import OptimConfig, make_optimizer
    from misinfo_tpu.train.steps import make_clip_step

    det_cfg = DetectorConfig()
    policy = Policy(PrecisionConfig(gelu_mode="erf"))
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    tx = make_optimizer(OptimConfig(lr=1e-4, weight_decay=0.01,
                                    warmup_fraction=0.0, total_steps=1000,
                                    clip_norm=1.0),
                        trainable_mask=clip_trainable_mask(params))
    opt_state = tx.init(params)
    step = make_clip_step(tx, det_cfg, policy)

    rng = np.random.default_rng(0)
    size = det_cfg.clip.image_size
    L = det_cfg.clip.max_text_len
    batches = [{
        "input_ids": jnp.asarray(
            rng.integers(3, det_cfg.clip.vocab_size - 1, (BATCH, L)),
            jnp.int32),
        "attention_mask": jnp.ones((BATCH, L), jnp.int32),
        "images_u8": jnp.asarray(
            rng.integers(0, 255, (BATCH, size, size, 3)), jnp.uint8),
    } for _ in range(4)]
    _bench_loop(step, params, opt_state, batches, BATCH,
                "clip_detective_train_step",
                f"batch {BATCH}, {size}px, text {L}")


def main():
    import jax
    import jax.numpy as jnp

    from misinfo_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    if TRAINER == "effnet":
        return _bench_effnet()
    if TRAINER == "clip":
        return _bench_clip()

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

    _bench_loop(step, params, opt_state, batches, n_examples_per_step,
                ("roberta_detective_train_step_packed" if PACK
                 else "roberta_detective_train_step"),
                "batch %d, seq %d" % (BATCH, SEQ))


if __name__ == "__main__":
    main()
