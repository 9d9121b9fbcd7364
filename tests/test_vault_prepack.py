"""Pre-packed int4 vault sidecars (vault/prepack.py): round-trip,
digest staleness, engine fast-boot via the sidecar, and the CLI."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from misinfo_tpu.vault import prepack
from misinfo_tpu.vault.store import TruthVault


def _vault(tmp_path, n=30, d=512, text=True, seed=3):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    meta = [{"title": f"t{i}", "url": "u", "date": "d"} for i in range(n)]
    v = TruthVault(emb, meta,
                   rng.normal(size=(n, d)).astype(np.float32)
                   if text else None)
    p = str(tmp_path / "vault.npz")
    v.save(p)
    return p, TruthVault.load(p)


def test_roundtrip(tmp_path):
    p, v = _vault(tmp_path)
    pre = prepack.build_prepacked(v)
    prepack.save_prepacked(p, pre)
    got = prepack.load_prepacked(p, v)
    assert got is not None
    np.testing.assert_array_equal(got.image.packed, pre.image.packed)
    np.testing.assert_array_equal(got.image.scale, pre.image.scale)
    np.testing.assert_array_equal(got.text.packed, pre.text.packed)
    assert got.digest == pre.digest and got.text_digest == pre.text_digest


def test_no_text_plane(tmp_path):
    p, v = _vault(tmp_path, text=False)
    prepack.save_prepacked(p, prepack.build_prepacked(v))
    got = prepack.load_prepacked(p, v)
    assert got is not None and got.text is None and got.text_digest == ""


def test_stale_sidecar_rejected(tmp_path):
    p, v = _vault(tmp_path)
    prepack.save_prepacked(p, prepack.build_prepacked(v))
    # edit the vault in place (same shape — shape checks alone would miss
    # it; the content digest must catch it)
    p2, v2 = _vault(tmp_path, seed=4)
    assert prepack.load_prepacked(p, v2) is None
    # corrupt file → None, not an exception
    with open(prepack.sidecar_path(p), "wb") as f:
        f.write(b"not an npz")
    assert prepack.load_prepacked(p, v) is None


def test_get_or_build_persists_and_reuses(tmp_path, monkeypatch):
    p, v = _vault(tmp_path)
    pre = prepack.get_or_build(p, v)
    import os
    assert os.path.exists(prepack.sidecar_path(p))
    # second call must come from the sidecar: building again would raise
    monkeypatch.setattr(prepack, "build_prepacked",
                        lambda _: (_ for _ in ()).throw(AssertionError(
                            "rebuilt despite fresh sidecar")))
    again = prepack.get_or_build(p, v)
    np.testing.assert_array_equal(again.image.packed, pre.image.packed)


def test_engine_boot_uses_sidecar(tmp_path, monkeypatch):
    """Two int4 engine boots: the first writes the sidecar, the second
    must load it (quantizer forbidden)."""
    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.forensics import MisinfoForensics
    from misinfo_tpu.models.detector import DetectorConfig

    det = DetectorConfig.tiny()
    p, _ = _vault(tmp_path, d=det.clip.projection_dim)
    cfg = ForensicsConfig(verbose=False)
    cfg = cfg.replace(
        paths=dataclasses.replace(cfg.paths, vault_path=p),
        seq=cfg.seq.__class__(roberta_max_len=32, image_size=64),
        serving=dataclasses.replace(cfg.serving, vault_dtype="int4"))
    eng1 = MisinfoForensics(config=cfg, det_cfg=det)
    import os
    assert os.path.exists(prepack.sidecar_path(p))
    monkeypatch.setattr(prepack, "build_prepacked",
                        lambda _: (_ for _ in ()).throw(AssertionError(
                            "engine re-quantized despite sidecar")))
    eng2 = MisinfoForensics(config=cfg, det_cfg=det)
    np.testing.assert_array_equal(
        np.asarray(eng1._vault_device["vault_emb"]),
        np.asarray(eng2._vault_device["vault_emb"]))
    np.testing.assert_array_equal(
        np.asarray(eng1._vault_device["vault_text_scale"]),
        np.asarray(eng2._vault_device["vault_text_scale"]))


def test_cli(tmp_path, capsys):
    p, _ = _vault(tmp_path)
    prepack.main([p])
    assert "packed 30 articles" in capsys.readouterr().out
    prepack.main([p])
    assert "fresh" in capsys.readouterr().out
    prepack.main([p, "--force"])
    assert "packed 30 articles" in capsys.readouterr().out
