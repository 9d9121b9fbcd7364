"""CLIP-detective auxiliary surfaces: image-mode vault search and the HPO
random-search fallback (C18, reference train_clip_detective.py:427-454,
610-688)."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_search_similar_articles_both_modes(tmp_path):
    from PIL import Image

    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.train.clip_detective import build_vault, search_similar_articles

    det = DetectorConfig.tiny()
    params = detector_init(jax.random.PRNGKey(0), det)
    rng = np.random.default_rng(0)

    arts = []
    for i in range(4):
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)).save(p)
        arts.append({"article_id": f"g{i}", "text_content": f"headline {i}",
                     "image_local_path": p, "url": f"u{i}", "date": "2024"})
    seed = str(tmp_path / "seed.json")
    with open(seed, "w") as f:
        json.dump(arts, f)
    vault_path = str(tmp_path / "vault.npz")
    v = build_vault(seed, vault_path, det_cfg=det, params=params,
                    batch_size=4, log=lambda *_: None)
    assert v is not None and v.num_articles == 4
    assert os.path.exists(str(tmp_path / "vault_summary.json"))

    # text-mode query: exact headline should rank itself first
    m = search_similar_articles(vault_path, query_text="headline 2",
                                det_cfg=det, params=params)
    assert m[0]["title"] == "headline 2"
    assert m[0]["similarity"] > 0.99

    # image-mode query: the article's own image ranks first
    m2 = search_similar_articles(vault_path,
                                 query_image_path=arts[1]["image_local_path"],
                                 det_cfg=det, params=params)
    assert m2[0]["title"] == "headline 1"
    assert m2[0]["similarity"] > 0.99


def test_hpo_random_search_fallback(monkeypatch, tmp_path):
    import misinfo_tpu.train.clip_detective as cd

    calls = []

    class _Res:
        best_metric = 0.5

    def fake_train(train_csv, val_csv=None, out_dir=None, epochs=None,
                   batch_size=None, lr=None, log=None, **kw):
        calls.append((lr, batch_size))
        r = _Res()
        r.best_metric = 0.5 + 0.1 * (lr == 1e-4)
        return r

    monkeypatch.setattr(cd, "train", fake_train)
    # force the ImportError path (random search) even if optuna exists
    import builtins
    real_import = builtins.__import__

    def no_optuna(name, *a, **k):
        if name == "optuna":
            raise ImportError
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_optuna)
    best = cd.hpo_search("dummy.csv", n_trials=4, log=lambda *_: None)
    assert len(calls) == 4
    assert "lr" in best and "batch_size" in best
    assert best["metric"] >= 0.5
