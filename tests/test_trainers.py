"""Trainer smoke tests on tiny configs + synthetic data: every reference
trainer recipe (C15-C20) runs end-to-end, loss decreases or stays finite,
freeze masks hold, checkpoints land."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from misinfo_tpu.core.config import PrecisionConfig
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.ops.common import Policy
from misinfo_tpu.train.optim import OptimConfig, branch_mask, make_optimizer
from misinfo_tpu.train.steps import (
    make_clip_step, make_effnet_step, make_fusion_step, make_full_step,
    make_text_head_step,
)

DET = DetectorConfig.tiny()
F32 = Policy(PrecisionConfig.highest())


def _params():
    return detector_init(jax.random.PRNGKey(0), DET)


def _text_batch(B=4, S=12):
    rng = np.random.default_rng(0)
    return {
        "input_ids": jnp.asarray(rng.integers(3, DET.roberta.vocab_size, (B, S)),
                                 jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32),
    }


def _image_batch(B=4):
    rng = np.random.default_rng(1)
    s = DET.clip.image_size
    return {
        "images_u8": jnp.asarray(rng.integers(0, 255, (B, s, s, 3)), jnp.uint8),
        "labels": jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32),
    }


def test_text_head_step_trains_and_freezes():
    params = _params()
    tx = make_optimizer(OptimConfig(lr=1e-3, total_steps=10, clip_norm=1.0),
                        trainable_mask=branch_mask(params, ["misinfo_head"]))
    opt_state = tx.init(params)
    step = make_text_head_step(tx, DET, F32, head="misinfo_head")
    batch = _text_batch()
    frozen_before = np.asarray(params["roberta"]["embeddings"]["word"]).copy()
    ai_before = np.asarray(params["ai_head"]["fc1"]["kernel"]).copy()

    losses = []
    for i in range(10):
        params, opt_state, m = step(params, opt_state, batch,
                                    jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    # dropout makes per-step loss noisy; require overall improvement
    assert min(losses[5:]) < losses[0]
    # freeze mask: backbone and ai_head untouched
    np.testing.assert_array_equal(
        np.asarray(params["roberta"]["embeddings"]["word"]), frozen_before)
    np.testing.assert_array_equal(
        np.asarray(params["ai_head"]["fc1"]["kernel"]), ai_before)


def test_effnet_step_bf16_policy_runs():
    """Regression (round 4): the CIFAKE trainer's DEFAULT precision is
    bfloat16 (train_cifake_efficientnet.py train(precision="bfloat16")),
    but every prior test used the f32 parity policy — and _conv's old
    accum-dtype output made the conv TRANSPOSE rule fail on the
    f32-cotangent/bf16-kernel pair, so bf16 EffNet training crashed at
    trace time. The step must run and produce a finite f32 loss."""
    params = _params()
    tx = make_optimizer(OptimConfig(lr=1e-3, total_steps=10, clip_norm=None,
                                    schedule="constant"),
                        trainable_mask=branch_mask(params, ["efficientnet"]))
    opt_state = tx.init(params)
    bf16 = Policy(PrecisionConfig(compute_dtype="bfloat16"))
    step = make_effnet_step(tx, bf16, stats="clip")
    params, opt_state, m = step(params, opt_state, _image_batch(),
                                jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    # master weights stay f32 (param_dtype) through the bf16 step
    assert params["efficientnet"]["stem"]["conv"].dtype == jnp.float32


def test_effnet_step_updates_bn_stats():
    params = _params()
    tx = make_optimizer(OptimConfig(lr=1e-3, total_steps=10, clip_norm=None,
                                    schedule="constant"),
                        trainable_mask=branch_mask(params, ["efficientnet"]))
    opt_state = tx.init(params)
    step = make_effnet_step(tx, F32, stats="clip")
    batch = _image_batch()
    mean_before = np.asarray(params["efficientnet"]["stem"]["bn"]["mean"]).copy()
    params, opt_state, m = step(params, opt_state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    mean_after = np.asarray(params["efficientnet"]["stem"]["bn"]["mean"])
    assert not np.allclose(mean_before, mean_after)  # running stats moved


def test_clip_step_only_projections_move():
    from misinfo_tpu.train.clip_detective import clip_trainable_mask

    params = _params()
    tx = make_optimizer(OptimConfig(lr=1e-2, total_steps=10, clip_norm=1.0,
                                    warmup_fraction=0.0),
                        trainable_mask=clip_trainable_mask(params))
    opt_state = tx.init(params)
    step = make_clip_step(tx, DET, F32)
    rng = np.random.default_rng(2)
    s = DET.clip.image_size
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(1, DET.clip.vocab_size - 2, (4, 16)), jnp.int32),
        "attention_mask": jnp.ones((4, 16), jnp.int32),
        "images_u8": jnp.asarray(rng.integers(0, 255, (4, s, s, 3)), jnp.uint8),
    }
    tower_before = np.asarray(
        params["clip"]["text"]["token_embedding"]).copy()
    proj_before = np.asarray(
        params["clip"]["text_projection"]["kernel"]).copy()
    scale_before = float(params["clip"]["logit_scale"])
    params, opt_state, m = step(params, opt_state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    np.testing.assert_array_equal(
        np.asarray(params["clip"]["text"]["token_embedding"]), tower_before)
    assert not np.allclose(
        np.asarray(params["clip"]["text_projection"]["kernel"]), proj_before)
    assert float(params["clip"]["logit_scale"]) != scale_before


def test_fusion_step_overfits_score_matrix():
    params = _params()
    tx = make_optimizer(OptimConfig(lr=1e-2, total_steps=50, clip_norm=None),
                        trainable_mask=branch_mask(params, ["fusion"]))
    opt_state = tx.init(params)
    step = make_fusion_step(tx)
    rng = np.random.default_rng(3)
    vecs = rng.uniform(0, 1, (32, 5)).astype(np.float32)
    labels = (vecs[:, 1] > 0.5).astype(np.int32)  # separable on misinfo axis
    batch = {"score_vectors": jnp.asarray(vecs), "labels": jnp.asarray(labels)}
    accs = []
    for i in range(40):
        params, opt_state, m = step(params, opt_state, batch,
                                    jax.random.PRNGKey(i))
        accs.append(float(m["accuracy"]))
    assert accs[-1] >= 0.9


def test_fusion_judge_train_on_scores(tmp_path):
    from misinfo_tpu.train.fusion_judge import train_on_scores

    rng = np.random.default_rng(4)
    vecs = rng.uniform(0, 1, (64, 5)).astype(np.float32)
    labels = (vecs[:, 0] + vecs[:, 2] > 1.0).astype(np.int32)
    params = _params()
    res = train_on_scores(vecs, labels, params,
                          out_dir=str(tmp_path / "fusion_ckpt"),
                          epochs=8, batch_size=16, log=lambda *_: None)
    assert res.best_metric > 0.5
    assert os.path.isdir(str(tmp_path / "fusion_ckpt"))


def test_full_step_multiaxis():
    params = _params()
    tx = make_optimizer(OptimConfig(lr=1e-4, total_steps=5, clip_norm=1.0))
    opt_state = tx.init(params)
    step = make_full_step(tx, DET, F32, jit=True)
    rng = np.random.default_rng(5)
    s = DET.clip.image_size
    B = 4
    batch = {
        "input_ids": jnp.asarray(rng.integers(3, DET.roberta.vocab_size, (B, 12)),
                                 jnp.int32),
        "attention_mask": jnp.ones((B, 12), jnp.int32),
        "clip_ids": jnp.asarray(rng.integers(1, DET.clip.vocab_size - 2, (B, 16)),
                                jnp.int32),
        "clip_mask": jnp.ones((B, 16), jnp.int32),
        "images_u8": jnp.asarray(rng.integers(0, 255, (B, s, s, 3)), jnp.uint8),
        "labels": jnp.asarray(rng.integers(0, 2, (B,)), jnp.int32),
    }
    params, opt_state, m = step(params, opt_state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_harness_early_stopping():
    from misinfo_tpu.train.harness import run_training

    calls = {"n": 0}

    def step(params, opt_state, batch, rng):
        return params, opt_state, {"loss": 1.0}

    def eval_fn(params):
        calls["n"] += 1
        return {"loss": 1.0 + calls["n"] * 0.1}  # monotonically worse

    res = run_training({}, None, step, lambda: iter([{"x": 1}]), eval_fn,
                       epochs=10, select_metric="loss", select_mode="min",
                       early_stop_patience=3, log=lambda *_: None)
    assert res.best_epoch == 0
    assert len(res.history) == 4  # 1 best + 3 patience


def test_small_val_split_still_evaluates(tmp_path):
    """A val split smaller than one batch must produce real metrics, not
    silent zeros (the reference's validate() always runs)."""
    import pandas as pd

    from misinfo_tpu.train.roberta_detective import train

    rng = np.random.default_rng(0)
    rows = [{"text": f"headline {i} words", "label": int(rng.integers(0, 2))}
            for i in range(20)]          # 20 samples → val split of 4 < batch 16
    csv = tmp_path / "t.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    logs = []
    train(str(csv), str(tmp_path / "ck"), epochs=1, batch_size=16,
          max_len=12, det_cfg=DET, precision="float32",
          log=lambda m, **k: logs.append(m))
    val_lines = [l for l in logs if "val_loss" in str(l)]
    assert val_lines and "val_loss=0.0000" not in str(val_lines[-1])


def test_eval_batches_fallback_helper():
    """Shared sub-batch val fallback (used by all trainers' eval paths)."""
    from misinfo_tpu.train.harness import eval_batches

    def batches_fn(bs):   # mimics drop_remainder batchers: 10 items
        for s in range(0, 10 - bs + 1, bs):
            yield {"size": bs}

    # split >= one batch: normal full-size batches, no fallback
    assert [b["size"] for b in eval_batches(batches_fn, 10, 4)] == [4, 4]
    # split smaller than one batch: one whole-split batch
    assert [b["size"] for b in eval_batches(batches_fn, 10, 16)] == [10]
    # empty split: nothing
    assert list(eval_batches(batches_fn, 0, 16)) == []
