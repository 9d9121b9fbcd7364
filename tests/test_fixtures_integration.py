"""Integration over the reference-named fixtures (text_only.json /
image_only.json / final_test.json — the BASELINE configs key off these,
SURVEY.md §4/§6), driven through the engine's batched path, plus the
feature-fusion (C19) training demo."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def engine():
    from misinfo_tpu.core.config import ForensicsConfig, PrecisionConfig
    from misinfo_tpu.engine.forensics import MisinfoForensics
    from misinfo_tpu.models.detector import DetectorConfig, detector_init

    det = DetectorConfig.tiny()
    cfg = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    cfg = cfg.replace(seq=cfg.seq.__class__(roberta_max_len=48,
                                            image_size=det.clip.image_size))
    return MisinfoForensics(config=cfg, det_cfg=det,
                            params=detector_init(jax.random.PRNGKey(0), det))


def _load(name):
    with open(os.path.join(REPO, "examples", name)) as f:
        reqs = json.load(f)
    for r in reqs:
        if "image" in r:
            r["image"] = os.path.join(REPO, r["image"])
    return reqs


def test_text_only_fixture(engine):
    reports = engine.analyze_batch(_load("text_only.json"), explanations=True)
    assert len(reports) == 3
    for rep in reports:
        s = rep["scores"]
        assert rep["verdict_text"] in ("REAL", "FAKE")
        assert abs(s["fake_probability"] - s["misinfo_score"]) < 1e-6
        assert rep["explanation"]


def test_image_only_fixture(engine):
    reports = engine.analyze_batch(_load("image_only.json"))
    s = reports[0]["scores"]
    assert s["ai_score"] == 0.0
    assert abs(s["fake_probability"]
               - min(1.0, max(s["deepfake_score"], s["vault_discrepancy"]))) < 1e-6


def test_final_test_fixture(engine):
    reports = engine.analyze_batch(_load("final_test.json"), explanations=True)
    for rep in reports:
        s = rep["scores"]
        assert abs(s["fake_probability"] + s["real_probability"] - 1.0) < 1e-5
        assert -1.0 <= s["clip_similarity"] <= 1.0
        assert rep["explanation"]


def test_mixed_variant_batch(engine):
    """One analyze_batch call mixing all three modality variants."""
    reqs = _load("text_only.json")[:1] + _load("image_only.json") \
        + _load("final_test.json")[:1]
    reports = engine.analyze_batch(reqs)
    assert len(reports) == 3
    assert reports[0]["scores"]["deepfake_score"] == 0.0   # text-only row
    assert reports[1]["scores"]["ai_score"] == 0.0         # image-only row


def test_feature_fusion_demo():
    from misinfo_tpu.train.feature_fusion import training_loop_example

    params = training_loop_example(num_steps=2, log=lambda *_: None)
    assert "feature_fusion" in params


def test_feature_fusion_triple_return():
    from misinfo_tpu.core.config import PrecisionConfig
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.ops.common import Policy
    from misinfo_tpu.train.feature_fusion import (
        feature_fusion_forward, feature_fusion_head_init)

    det = DetectorConfig.tiny()
    params = detector_init(jax.random.PRNGKey(0), det)
    params["feature_fusion"] = feature_fusion_head_init(jax.random.PRNGKey(1), det)
    rng = np.random.default_rng(0)
    s = det.clip.image_size
    batch = {
        "input_ids": np.asarray(rng.integers(3, det.roberta.vocab_size, (2, 10)),
                                np.int32),
        "attention_mask": np.ones((2, 10), np.int32),
        "clip_ids": np.asarray(rng.integers(1, det.clip.vocab_size - 2, (2, 12)),
                               np.int32),
        "clip_mask": np.ones((2, 12), np.int32),
        "images_u8": rng.integers(0, 255, (2, s, s, 3)).astype(np.uint8),
    }
    import jax.numpy as jnp
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    logits, sim, deep = feature_fusion_forward(
        params, batch, det, Policy(PrecisionConfig.highest()))
    assert logits.shape == (2, 2)
    assert sim.shape == (2,) and deep.shape == (2,)
    assert np.all((np.asarray(deep) >= 0) & (np.asarray(deep) <= 1))
