"""Fusion-judge pipeline (C20): precompute_scores batched engine sweep +
training on the cached matrix, end to end on a tiny engine."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def tiny_engine():
    from misinfo_tpu.core.config import ForensicsConfig, PrecisionConfig
    from misinfo_tpu.engine.forensics import MisinfoForensics
    from misinfo_tpu.models.detector import DetectorConfig, detector_init

    det = DetectorConfig.tiny()
    cfg = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    cfg = cfg.replace(seq=cfg.seq.__class__(roberta_max_len=32,
                                            image_size=det.clip.image_size))
    return MisinfoForensics(config=cfg, det_cfg=det,
                            params=detector_init(jax.random.PRNGKey(0), det))


def test_precompute_and_train(tiny_engine, tmp_path):
    from PIL import Image

    from misinfo_tpu.train.fusion_judge import precompute_scores, train_on_scores

    rng = np.random.default_rng(0)
    img_paths = []
    for i in range(4):
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)).save(p)
        img_paths.append(p)

    rows = [{"text": f"claim {i}", "image": img_paths[i % 4],
             "label": i % 2} for i in range(8)]
    rows.append({"text": "no image row", "image": "/missing.jpg", "label": 1})

    vectors, labels = precompute_scores(tiny_engine, rows, batch_size=4,
                                        log=lambda *_: None)
    assert vectors.shape == (9, 5)
    assert (vectors[-1] == 0).all()        # missing image → zeros vector
    assert np.isfinite(vectors).all()
    assert (np.abs(vectors[:8]) > 0).any()  # analyzable rows got real scores

    res = train_on_scores(vectors, labels, tiny_engine.params,
                          out_dir=str(tmp_path / "ckpt"), epochs=3,
                          batch_size=4, log=lambda *_: None)
    assert np.isfinite(res.best_metric)
    assert os.path.isdir(str(tmp_path / "ckpt"))


def test_load_fusion_csv(tmp_path):
    import pandas as pd

    from misinfo_tpu.train.fusion_judge import load_fusion_csv

    csv = tmp_path / "f.csv"
    pd.DataFrame([{"text": "a", "image_path": "x.jpg", "label": 1},
                  {"text": "b", "image_path": "", "label": 0}]).to_csv(
        csv, index=False)
    rows = load_fusion_csv(str(csv))
    assert len(rows) == 2
    assert rows[0]["image"] == "x.jpg"
    assert rows[0]["label"] == 1
