"""VERDICT r2 #2: `--mesh` for the remaining trainers, with GLOBAL-batch
InfoNCE semantics for the CLIP detective.

The key assertion: one training step with params/batches sharded over the
8-virtual-device CPU mesh produces the SAME loss and SAME updated params
as the single-device step on identical data — i.e. the in-batch negative
set spans the global batch (GSPMD all-gathers the embeddings), it does not
silently shrink to per-shard negatives, and EfficientNet's BN batch stats
reduce over the global batch."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from misinfo_tpu.core.config import MeshConfig, PrecisionConfig
from misinfo_tpu.core.mesh import make_mesh, place_train_batch
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.ops.common import Policy
from misinfo_tpu.parallel.sharding import shard_params
from misinfo_tpu.train.optim import OptimConfig, branch_mask, make_optimizer

DET = DetectorConfig.tiny()
F32 = Policy(PrecisionConfig.highest())
B = 16  # divisible by the 8-wide data axis


def _params(seed=0):
    return detector_init(jax.random.PRNGKey(seed), DET)


def _copy(tree):
    return jax.tree_util.tree_map(jnp.array, tree)


def _clip_batch():
    rng = np.random.default_rng(0)
    s = DET.clip.image_size
    return {
        "input_ids": np.asarray(
            rng.integers(1, DET.clip.vocab_size - 2, (B, 12)), np.int32),
        "attention_mask": np.ones((B, 12), np.int32),
        "images_u8": rng.integers(0, 255, (B, s, s, 3)).astype(np.uint8),
        "labels": np.zeros((B,), np.int32),
    }


def _assert_trees_close(a, b, atol):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for (path, xa), xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(xa, np.float32), np.asarray(xb, np.float32),
            atol=atol, err_msg=jax.tree_util.keystr(path))


def test_clip_step_global_negatives_match_single():
    """DP-sharded InfoNCE == single-device InfoNCE on the same batch.
    A per-shard-negatives implementation CANNOT pass this: the control
    below shows local negatives give a measurably different loss."""
    from misinfo_tpu.train.clip_detective import clip_trainable_mask
    from misinfo_tpu.train.losses import clip_contrastive_loss
    from misinfo_tpu.train.steps import make_clip_step

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    batch = _clip_batch()
    p0 = _params()

    def run(mesh):
        params = _copy(p0)
        tx = make_optimizer(OptimConfig(lr=1e-3, total_steps=4),
                            trainable_mask=clip_trainable_mask(params))
        if mesh is not None:
            params = shard_params(mesh, params)
        opt_state = tx.init(params)
        step = make_clip_step(tx, DET, F32)
        metrics = None
        for i in range(2):
            params, opt_state, metrics = step(
                params, opt_state, place_train_batch(mesh, batch),
                jax.random.PRNGKey(i))
        return params, metrics

    p_single, m_single = run(None)
    mesh = make_mesh(MeshConfig(model=1))  # data=8
    p_mesh, m_mesh = run(mesh)
    np.testing.assert_allclose(float(m_mesh["loss"]),
                               float(m_single["loss"]), atol=1e-5)
    _assert_trees_close(p_single["clip"], p_mesh["clip"], atol=1e-5)

    # control: the loss over PER-SHARD negatives differs — proving the
    # equality above actually discriminates global from local negatives
    from misinfo_tpu.models.clip import clip_image_features, clip_text_features
    from misinfo_tpu.ops.image_ops import normalize_images
    te = clip_text_features(p0["clip"], jnp.asarray(batch["input_ids"]),
                            jnp.asarray(batch["attention_mask"]),
                            DET.clip, F32)
    ie = clip_image_features(
        p0["clip"], normalize_images(jnp.asarray(batch["images_u8"]),
                                     "clip", F32.compute), DET.clip, F32)
    global_loss = float(clip_contrastive_loss(ie, te,
                                              p0["clip"]["logit_scale"]))
    local = np.mean([
        float(clip_contrastive_loss(ie[s:s + 2], te[s:s + 2],
                                    p0["clip"]["logit_scale"]))
        for s in range(0, B, 2)])
    assert abs(local - global_loss) > 1e-2


def test_effnet_step_matches_single_incl_bn_stats():
    """DP-sharded EfficientNet step: gradients AND the BN running-stat
    updates (batch means/vars) reduce over the GLOBAL batch."""
    from misinfo_tpu.train.steps import make_effnet_step

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(1)
    s = DET.clip.image_size
    batch = {"images_u8": rng.integers(0, 255, (B, s, s, 3)).astype(np.uint8),
             "labels": np.asarray(rng.integers(0, 2, (B,)), np.int32)}
    p0 = _params(1)

    def run(mesh):
        params = _copy(p0)
        tx = make_optimizer(
            OptimConfig(lr=1e-3, total_steps=2, clip_norm=None,
                        schedule="constant"),
            trainable_mask=branch_mask(params, ["efficientnet"]))
        if mesh is not None:
            params = shard_params(mesh, params)
        opt_state = tx.init(params)
        step = make_effnet_step(tx, F32, stats="clip")
        params, opt_state, m = step(params, opt_state,
                                    place_train_batch(mesh, batch),
                                    jax.random.PRNGKey(0))
        return params, m

    p_single, m_single = run(None)
    p_mesh, m_mesh = run(make_mesh(MeshConfig(model=1)))
    np.testing.assert_allclose(float(m_mesh["loss"]),
                               float(m_single["loss"]), atol=1e-5)
    # post-Adam tolerance is 2×lr: Adam normalizes each gradient by
    # sqrt(v), so for near-zero gradients the f32 reduction-order noise of
    # the DP psum can swing a single element's update by up to ±lr — that
    # is inherent to summation order, not a per-shard-statistics bug (the
    # tight loss equality above is the semantic check)
    _assert_trees_close(p_single["efficientnet"], p_mesh["efficientnet"],
                        atol=2.1e-3)


def test_fusion_step_matches_single():
    from misinfo_tpu.train.steps import make_fusion_step

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(2)
    batch = {"score_vectors": rng.random((B, 5)).astype(np.float32),
             "labels": np.asarray(rng.integers(0, 2, (B,)), np.int32)}
    p0 = _params(2)

    def run(mesh):
        params = _copy(p0)
        tx = make_optimizer(OptimConfig(lr=1e-3, total_steps=2,
                                        weight_decay=0.01),
                            trainable_mask=branch_mask(params, ["fusion"]))
        if mesh is not None:
            params = shard_params(mesh, params)
        opt_state = tx.init(params)
        step = make_fusion_step(tx)
        # deterministic rng; dropout mask identical single vs mesh
        params, opt_state, m = step(params, opt_state,
                                    place_train_batch(mesh, batch),
                                    jax.random.PRNGKey(3))
        return params, m

    p_single, m_single = run(None)
    p_mesh, m_mesh = run(make_mesh(MeshConfig(model=1)))
    np.testing.assert_allclose(float(m_mesh["loss"]),
                               float(m_single["loss"]), atol=1e-6)
    _assert_trees_close(p_single["fusion"], p_mesh["fusion"], atol=1e-6)


def test_clip_trainer_mesh_flag_end_to_end(tmp_path):
    """clip_detective.train(mesh_spec='data=8') runs a real epoch with
    sharded params/batches and writes an engine-loadable checkpoint
    (the C18 companion to the C15 test in test_multichip.py)."""
    import pandas as pd
    from PIL import Image

    from misinfo_tpu.train.clip_detective import train

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(0)
    s = DET.clip.image_size
    rows = []
    for i in range(24):
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (s, s, 3))
                        .astype(np.uint8)).save(p)
        rows.append({"image_path": str(p),
                     "text": f"matching caption number {i}",
                     "label": int(i % 2)})
    csv = tmp_path / "clip_train.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    out = str(tmp_path / "ckpt")
    res = train(str(csv), out_dir=out, epochs=1, batch_size=8,
                det_cfg=DET, precision="float32", mesh_spec="data=8",
                log=lambda *a, **k: None)
    assert np.isfinite(res.best_metric)

    from misinfo_tpu.checkpoints.io import load_checkpoint
    loaded = load_checkpoint(out, detector_init(jax.random.PRNGKey(9), DET))
    assert loaded is not None


def test_fusion_trainer_mesh_flag(tmp_path):
    """train_on_scores(mesh_spec='data=8'): the precomputed-score recipe
    under DP writes an engine-loadable checkpoint."""
    from misinfo_tpu.train.fusion_judge import train_on_scores

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(1)
    vecs = rng.random((64, 5)).astype(np.float32)
    labels = (vecs.sum(axis=1) > 2.5).astype(np.int32)
    out = str(tmp_path / "fusion_ckpt")
    res = train_on_scores(vecs, labels, _params(3), out_dir=out, epochs=2,
                          batch_size=16, mesh_spec="data=8",
                          log=lambda *a, **k: None)
    assert res.best_metric > 0.4   # learnable rule, sanity floor
    from misinfo_tpu.checkpoints.io import load_checkpoint
    assert load_checkpoint(out, _params(4)) is not None
