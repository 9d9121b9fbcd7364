"""VERDICT r2 #6: the parity gate's checkpoint modes, exercised in CI.

`tools/parity_check.py --fusion-ckpt / --reference-ckpt` are manual paths;
this test keeps the torch round-trip from rotting silently: train briefly
(tiny config), save a NATIVE checkpoint, export it through the reference
torch key layout (checkpoints/torch_convert.export_reference_state_dicts),
write reference-layout `.pth` files, load them back through the C10
cascade (reference misinfo_forensics.py:174-204), and assert the serving
ENGINE produces identical scores from both checkpoint modes."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from misinfo_tpu.core.config import ForensicsConfig, PrecisionConfig
from misinfo_tpu.engine.forensics import MisinfoForensics
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.ops.common import Policy

DET = DetectorConfig.tiny()
F32 = Policy(PrecisionConfig.highest())


def _train_briefly(params, steps=4):
    """A few real optimizer steps on the misinfo head (the reference's C15
    recipe shape) so the exported weights are TRAINED, not init."""
    from misinfo_tpu.train.optim import OptimConfig, branch_mask, make_optimizer
    from misinfo_tpu.train.steps import make_text_head_step

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(3, DET.roberta.vocab_size, (4, 12)), jnp.int32),
        "attention_mask": jnp.ones((4, 12), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 2, (4,)), jnp.int32),
    }
    tx = make_optimizer(OptimConfig(lr=1e-3, total_steps=steps),
                        trainable_mask=branch_mask(params, ["misinfo_head"]))
    opt_state = tx.init(params)
    step = make_text_head_step(tx, DET, F32, head="misinfo_head")
    for i in range(steps):
        params, opt_state, m = step(params, opt_state, batch,
                                    jax.random.PRNGKey(i))
        assert np.isfinite(float(m["loss"]))
    return params


def _cfg(tmp_path, **path_overrides):
    cfg = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    paths = {f.name: getattr(cfg.paths, f.name)
             for f in cfg.paths.__dataclass_fields__.values()}
    # nonexistent defaults so only the overridden files load
    for k in ("fusion_weights", "ai_head_weights", "misinfo_head_weights",
              "efficientnet_weights", "clip_weights", "vault_path"):
        paths[k] = str(tmp_path / f"absent_{k}")
    paths.update(path_overrides)
    return cfg.replace(
        paths=cfg.paths.__class__(**paths),
        seq=cfg.seq.__class__(roberta_max_len=32,
                              image_size=DET.clip.image_size))


def _img(seed):
    from PIL import Image
    rng = np.random.default_rng(seed)
    s = DET.clip.image_size
    return Image.fromarray(
        rng.integers(0, 255, size=(s, s, 3)).astype(np.uint8))


def _reqs():
    return [{"text": "a trained claim about events", "image": _img(1)},
            {"text": "text only request"},
            {"image": _img(2)}]


def test_trained_ckpt_roundtrips_through_reference_layout(tmp_path):
    from misinfo_tpu.checkpoints.io import load_checkpoint, save_checkpoint
    from misinfo_tpu.checkpoints.torch_convert import (
        export_reference_state_dicts)

    trained = _train_briefly(detector_init(jax.random.PRNGKey(0), DET))

    # native checkpoint (what the trainers emit) → engine mode "native"
    native_dir = str(tmp_path / "native_ckpt")
    save_checkpoint(native_dir, trained, metadata={"epoch": 1})
    eng_native = MisinfoForensics(
        config=_cfg(tmp_path, orbax_dir=native_dir), det_cfg=DET)
    assert eng_native.load_report["mode"] == "native"

    # export THROUGH the reference torch key layout and write the exact
    # files the reference ships (README.md:37,174)
    restored = load_checkpoint(native_dir,
                               detector_init(jax.random.PRNGKey(1), DET))
    full_sd, clip_sd = export_reference_state_dicts(restored)
    fusion_pth = str(tmp_path / "forensics_master_final.pth")
    clip_pth = str(tmp_path / "clip_detective_best.pth")
    torch.save({"full_model_state_dict":
                {k: torch.tensor(v) for k, v in full_sd.items()},
                "epoch": 1, "accuracy": 0.5}, fusion_pth)
    torch.save({"model_state_dict":
                {k: torch.tensor(v) for k, v in clip_sd.items()}}, clip_pth)

    # C10 cascade load (monolithic branch) → identical serving scores
    eng_pth = MisinfoForensics(
        config=_cfg(tmp_path, fusion_weights=fusion_pth,
                    clip_weights=clip_pth), det_cfg=DET)
    assert eng_pth.load_report["mode"] == "monolithic"
    assert eng_pth.load_report["applied"] > 0

    a = eng_native.analyze_batch(_reqs())
    b = eng_pth.analyze_batch(_reqs())
    for ra, rb in zip(a, b):
        for k in ("ai_score", "misinfo_score", "deepfake_score",
                  "clip_similarity", "fake_probability"):
            np.testing.assert_allclose(ra["scores"][k], rb["scores"][k],
                                       atol=1e-5, err_msg=k)
        assert ra["verdict"] == rb["verdict"]


def test_trained_ckpt_roundtrips_per_branch_cascade(tmp_path):
    """The cascade's FALLBACK branch (no monolithic file): per-branch
    `.pth` files in the trainers' save layout (model_state_dict with
    branch prefixes) overlay individually — reference
    misinfo_forensics.py:191-204,260-317."""
    from misinfo_tpu.checkpoints.torch_convert import (
        export_head, export_reference_state_dicts)

    trained = _train_briefly(detector_init(jax.random.PRNGKey(2), DET))
    full_sd, clip_sd = export_reference_state_dicts(trained)

    ai_pth = str(tmp_path / "ai_head_best.pth")
    mis_pth = str(tmp_path / "roberta_detective_best.pth")
    eff_pth = str(tmp_path / "efficientnet_cifake_best.pth")
    clip_pth = str(tmp_path / "clip_detective_best.pth")
    sub = lambda pre: {k: torch.tensor(v) for k, v in full_sd.items()
                       if k.startswith(pre)}
    torch.save({"model_state_dict": sub("ai_head.")}, ai_pth)
    torch.save({"model_state_dict": sub("misinfo_head.")}, mis_pth)
    # raw state_dict (the reference CIFAKE trainer saves model.state_dict()
    # directly, train_cifake_forensics.py:374)
    torch.save(sub("efficientnet."), eff_pth)
    torch.save({"model_state_dict":
                {k: torch.tensor(v) for k, v in clip_sd.items()}}, clip_pth)

    eng = MisinfoForensics(
        config=_cfg(tmp_path, ai_head_weights=ai_pth,
                    misinfo_head_weights=mis_pth,
                    efficientnet_weights=eff_pth, clip_weights=clip_pth),
        det_cfg=DET)
    assert eng.load_report["mode"] == "individual"
    assert eng.load_report["applied"] > 0

    # the overlaid heads must equal the trained tree exactly
    got = np.asarray(eng.params["misinfo_head"]["fc1"]["kernel"],
                     np.float32)
    want = np.asarray(trained["misinfo_head"]["fc1"]["kernel"], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)
    exported_back = export_head(eng.params["ai_head"], "ai_head.")
    for k, v in exported_back.items():
        np.testing.assert_allclose(v, full_sd[k], atol=1e-6, err_msg=k)
