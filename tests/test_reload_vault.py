"""Hot vault reload (engine.reload_vault + POST /reload_vault): swapped
matches, soft-fail on missing files, shard-threshold flips, and staging
(old vault serves until the replacement is fully built)."""

import dataclasses
import json
import urllib.request

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from misinfo_tpu.core.config import ForensicsConfig, MeshConfig
from misinfo_tpu.core.mesh import make_mesh
from misinfo_tpu.engine.forensics import MisinfoForensics
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.vault.store import TruthVault

DET = DetectorConfig.tiny()


def _vault(tmp_path, name, prefix, n=40, seed=0):
    rng = np.random.default_rng(seed)
    d = DET.clip.projection_dim
    emb = rng.normal(size=(n, d)).astype(np.float32)
    meta = [{"title": f"{prefix}{i}", "url": "u", "date": "d"}
            for i in range(n)]
    p = str(tmp_path / name)
    TruthVault(emb, meta, emb.copy()).save(p)
    return p


def _cfg(vault_path, **serving):
    cfg = ForensicsConfig(verbose=False)
    return cfg.replace(
        paths=dataclasses.replace(cfg.paths, vault_path=vault_path),
        seq=cfg.seq.__class__(roberta_max_len=32,
                              image_size=DET.clip.image_size),
        serving=dataclasses.replace(cfg.serving, **serving))


def _img(tmp_path, seed=5):
    from PIL import Image
    rng = np.random.default_rng(seed)
    s = DET.clip.image_size
    p = tmp_path / f"img{seed}.png"
    Image.fromarray(rng.integers(0, 255, (s, s, 3)).astype(np.uint8)).save(p)
    return str(p)


@pytest.fixture(scope="module")
def shared_params():
    return detector_init(jax.random.PRNGKey(0), DET)


def test_reload_swaps_matches_and_soft_fails(tmp_path, shared_params):
    pa = _vault(tmp_path, "a.npz", "alpha-", seed=1)
    pb = _vault(tmp_path, "b.npz", "beta-", seed=2)
    eng = MisinfoForensics(config=_cfg(pa), det_cfg=DET,
                           params=shared_params)
    img = _img(tmp_path)
    before = eng.analyze(image_path=img, verbose=False)
    assert before["vault_matches"][0]["title"].startswith("alpha-")

    info = eng.reload_vault(path=pb)
    assert info["articles"] == 40 and info["sharded"] is False
    after = eng.analyze(image_path=img, verbose=False)
    assert after["vault_matches"][0]["title"].startswith("beta-")
    # fresh engine on vault B must agree exactly (same params)
    fresh = MisinfoForensics(config=_cfg(pb), det_cfg=DET,
                             params=shared_params)
    ref = fresh.analyze(image_path=img, verbose=False)
    assert after["vault_matches"][0]["title"] == ref["vault_matches"][0]["title"]
    np.testing.assert_allclose(after["scores"]["vault_discrepancy"],
                               ref["scores"]["vault_discrepancy"], atol=1e-5)

    # missing path → soft-fail exactly like a missing vault at init: the
    # device arrays become the all-invalid dummy (not a silently
    # re-staged copy of the old vault), so discrepancy is 0 too
    info = eng.reload_vault(path=str(tmp_path / "missing.npz"))
    assert info["articles"] == 0 and not eng.vault_loaded
    assert info["rows"] == 128  # the dummy, not vault B's rows
    rep = eng.analyze(image_path=img, verbose=False)
    assert rep["vault_matches"] == []
    assert rep["scores"]["vault_discrepancy"] == 0.0


def test_reload_drop_first_frees_before_staging(tmp_path, shared_params):
    """drop_first=True publishes the vault-less dummy before staging the
    replacement (1× HBM headroom instead of 2×), then serves the new
    vault normally."""
    pa = _vault(tmp_path, "a.npz", "alpha-", seed=1)
    pb = _vault(tmp_path, "b.npz", "beta-", seed=2)
    eng = MisinfoForensics(config=_cfg(pa), det_cfg=DET,
                           params=shared_params)
    img = _img(tmp_path)
    info = eng.reload_vault(path=pb, drop_first=True)
    assert info["articles"] == 40
    rep = eng.analyze(image_path=img, verbose=False)
    assert rep["vault_matches"][0]["title"].startswith("beta-")


def test_reload_staging_keeps_old_vault_on_failure(tmp_path, shared_params,
                                                   monkeypatch):
    """A reload that blows up mid-staging must leave the serving state
    untouched (the publish happens only after _prepare_vault returns)."""
    pa = _vault(tmp_path, "a.npz", "alpha-", seed=1)
    pb = _vault(tmp_path, "b.npz", "beta-", seed=2)
    eng = MisinfoForensics(config=_cfg(pa), det_cfg=DET,
                           params=shared_params)
    img = _img(tmp_path)
    old_dev = eng._vault_device
    monkeypatch.setattr(eng, "_prepare_vault",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("staging boom")))
    with pytest.raises(RuntimeError, match="staging boom"):
        eng.reload_vault(path=pb)
    assert eng._vault_device is old_dev
    assert eng.cfg.paths.vault_path == pa  # config publishes only on success
    assert eng.analyze(image_path=img,
                       verbose=False)["vault_matches"][0]["title"].startswith(
        "alpha-")


def test_reload_flips_shard_threshold(tmp_path, shared_params):
    """Reload across vault_shard_min_rows rebuilds the program set and
    matches a fresh sharded engine."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    small = _vault(tmp_path, "small.npz", "s-", n=20, seed=3)
    big = _vault(tmp_path, "big.npz", "b-", n=300, seed=4)
    mesh = make_mesh(MeshConfig(model=1))
    eng = MisinfoForensics(config=_cfg(small, vault_shard_min_rows=200),
                           det_cfg=DET, params=shared_params, mesh=mesh)
    assert eng._vault_sharded is False
    info = eng.reload_vault(path=big)
    assert info["sharded"] is True and eng._vault_sharded is True
    img = _img(tmp_path)
    got = eng.analyze(image_path=img, verbose=False)
    fresh = MisinfoForensics(config=_cfg(big, vault_shard_min_rows=200),
                             det_cfg=DET, params=shared_params, mesh=mesh)
    ref = fresh.analyze(image_path=img, verbose=False)
    assert got["vault_matches"][0]["title"] == ref["vault_matches"][0]["title"]
    np.testing.assert_allclose(got["scores"]["vault_discrepancy"],
                               ref["scores"]["vault_discrepancy"], atol=1e-5)


def test_rest_reload_endpoint(tmp_path, shared_params):
    from misinfo_tpu.serve.api import ForensicsAPI, serve

    pa = _vault(tmp_path, "a.npz", "alpha-", seed=1)
    pb = _vault(tmp_path, "b.npz", "beta-", seed=2)
    eng = MisinfoForensics(config=_cfg(pa), det_cfg=DET,
                           params=shared_params)
    # mutation endpoint is 403 unless the operator opted in
    api = ForensicsAPI(engine=eng)
    httpd = serve(api, port=0)
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/reload_vault"

        def post(payload):
            req = urllib.request.Request(
                url, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, body = post({"path": pb})
        assert code == 403 and "allow-reload" in body["error"]
        assert eng.cfg.paths.vault_path == pa  # untouched
    finally:
        httpd.shutdown()
        api.close()

    api = ForensicsAPI(engine=eng, allow_reload=True)
    httpd = serve(api, port=0)
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/reload_vault"
        req = urllib.request.Request(
            url, data=json.dumps({"path": pb}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.loads(r.read())
        assert body["articles"] == 40
        assert eng.cfg.paths.vault_path == pb
    finally:
        httpd.shutdown()
        api.close()


def test_vault_capacity_guardrail_warns(tmp_path, caplog, monkeypatch):
    """The HBM guardrail fires (with the next capacity mode named) when
    the vault footprint crosses the warn fraction, and stays silent below
    it. memory_stats is mocked — CPU reports none."""
    import logging

    import numpy as np

    from misinfo_tpu.vault.store import TruthVault

    d = DET.clip.projection_dim
    rng = np.random.default_rng(0)
    vault = TruthVault(
        rng.normal(size=(256, d)).astype(np.float32),
        [{"title": f"t{i}", "url": "u", "date": "d"} for i in range(256)],
        rng.normal(size=(256, d)).astype(np.float32))
    p = str(tmp_path / "v.npz")
    vault.save(p)
    eng = MisinfoForensics(config=_cfg(p), det_cfg=DET,
                           params=detector_init(jax.random.PRNGKey(0), DET))

    real_bytes = sum(
        int(np.prod(v.shape) * v.dtype.itemsize)
        for v in eng._vault_device.values())

    class _Dev:
        def __init__(self, limit):
            self._limit = limit

        def memory_stats(self):
            return {"bytes_limit": self._limit, "bytes_in_use": 0}

    import jax as _jax

    # limit just under the footprint → warn names the int8/int4 modes
    monkeypatch.setattr(_jax, "local_devices",
                        lambda: [_Dev(int(real_bytes / 0.9))])
    with caplog.at_level(logging.WARNING, logger="misinfo_tpu.engine"):
        eng._warn_vault_capacity(eng._vault_device, False)
    assert any("int8" in r.getMessage() and "HBM" in r.getMessage()
               for r in caplog.records)

    # plenty of headroom → silent
    caplog.clear()
    monkeypatch.setattr(_jax, "local_devices",
                        lambda: [_Dev(real_bytes * 100)])
    with caplog.at_level(logging.WARNING, logger="misinfo_tpu.engine"):
        eng._warn_vault_capacity(eng._vault_device, False)
    assert not caplog.records
