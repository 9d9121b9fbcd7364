"""Host-prep capacity probe + auto-policy (VERDICT r3 #5,
preprocess/hostprobe.py): the measured-ceiling plumbing that lets a fresh
operator land near this host's best config without reading docs/PERF.md."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def test_probe_measures_and_caches():
    from misinfo_tpu.preprocess import hostprobe

    hostprobe._cache = None
    p = hostprobe.probe_host_prep(res=480, trials=1)
    assert p["cores"] >= 1
    assert p["exact_ms_per_image"] > 0
    assert p["fast_ms_per_image"] > 0
    assert p["exact_ceiling_images_per_s"] == pytest.approx(
        p["cores"] * 1000.0 / p["exact_ms_per_image"], rel=0.01)
    # cached per process: a second call returns the same object
    assert hostprobe.probe_host_prep(res=480) is p
    hostprobe._cache = None


def test_recommend_host_bound_branches():
    from misinfo_tpu.preprocess.hostprobe import recommend

    fast_helps = {"cores": 1, "probe_resolution": 1080,
                  "exact_ms_per_image": 75.0, "fast_ms_per_image": 34.0,
                  "exact_ceiling_images_per_s": 13.3,
                  "fast_ceiling_images_per_s": 29.4}
    rec = recommend(fast_helps)
    assert rec["host_bound_at_probe_res"]
    assert rec["fast_decode_recommended"]
    assert "MISINFO_TPU_FAST_DECODE=1" in rec["summary"]
    assert "MISINFO_TPU_DEVICE_RESIZE=1" in rec["summary"]

    # host already clears the device ceiling → nothing recommended
    big_host = dict(fast_helps, cores=96,
                    exact_ceiling_images_per_s=1280.0,
                    fast_ceiling_images_per_s=2800.0)
    rec2 = recommend(big_host)
    assert not rec2["host_bound_at_probe_res"]
    assert not rec2["fast_decode_recommended"]

    # host-bound but fast decode doesn't help (non-JPEG-ish ratio) →
    # recommended only the manual knobs
    no_gain = dict(fast_helps, fast_ms_per_image=70.0,
                   fast_ceiling_images_per_s=14.3)
    rec3 = recommend(no_gain)
    assert rec3["host_bound_at_probe_res"]
    assert not rec3["fast_decode_recommended"]


def test_host_policy_auto_flips_fast_decode(monkeypatch):
    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.preprocess import hostprobe

    slow_probe = {"cores": 1, "probe_resolution": 1080,
                  "exact_ms_per_image": 75.0, "fast_ms_per_image": 34.0,
                  "exact_ceiling_images_per_s": 13.3,
                  "fast_ceiling_images_per_s": 29.4}
    monkeypatch.setattr(hostprobe, "probe_host_prep", lambda *a, **k: slow_probe)
    monkeypatch.setenv("MISINFO_TPU_HOST_POLICY", "auto")
    cfg = ForensicsConfig.from_env(verbose=False)
    assert cfg.serving.fast_decode is True

    # an explicit operator setting always beats the auto policy
    monkeypatch.setenv("MISINFO_TPU_FAST_DECODE", "0")
    cfg2 = ForensicsConfig.from_env(verbose=False)
    assert cfg2.serving.fast_decode is False


def test_engine_host_prep_report(monkeypatch):
    from misinfo_tpu.core.config import ForensicsConfig, PrecisionConfig
    from misinfo_tpu.engine.forensics import MisinfoForensics
    from misinfo_tpu.models.detector import DetectorConfig
    from misinfo_tpu.preprocess import hostprobe

    probe = {"cores": 2, "probe_resolution": 1080,
             "exact_ms_per_image": 40.0, "fast_ms_per_image": 15.0,
             "exact_ceiling_images_per_s": 50.0,
             "fast_ceiling_images_per_s": 133.3}
    monkeypatch.setattr(hostprobe, "probe_host_prep", lambda *a, **k: probe)
    det = DetectorConfig.tiny()
    cfg = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    cfg = cfg.replace(
        paths=cfg.paths.__class__(vault_path="/nonexistent/vault.pkl"),
        seq=cfg.seq.__class__(roberta_max_len=64,
                              image_size=det.clip.image_size))
    eng = MisinfoForensics(config=cfg, det_cfg=det)
    rep = eng.host_prep_report()
    assert rep["host_bound_at_probe_res"]
    assert rep["probe"] is probe
    assert rep["active"] == {"fast_decode": False, "device_resize": False,
                             "prep_pool_workers": rep["active"]
                             ["prep_pool_workers"]}
    assert rep["active"]["prep_pool_workers"] >= 1


def test_probe_link_measures_and_caches():
    from misinfo_tpu.preprocess import hostprobe

    hostprobe._link_cache = None
    link = hostprobe.probe_link(staging=320, image_size=64, iters=3)
    assert link is not None
    assert link["platform"] == "cpu"           # test backend
    assert link["staged_h2d_ms_per_image"] >= 0
    assert link["crops_h2d_ms_per_image"] >= 0
    assert hostprobe.probe_link() is link      # cached
    hostprobe._link_cache = None


def test_auto_policy_device_resize_link_gate(monkeypatch):
    """VERDICT r4 #6: auto flips device_resize only on a TPU backend whose
    measured link delta is under half the host resize saving; a relay-class
    link (big delta) and an explicit env both leave it off."""
    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.preprocess import hostprobe

    probe = {"cores": 1, "probe_resolution": 1080,
             "exact_ms_per_image": 75.0, "fast_ms_per_image": 34.0,
             "decode_ms_per_image": 45.0,     # resize work = 30 ms/image
             "exact_ceiling_images_per_s": 13.3,
             "fast_ceiling_images_per_s": 29.4}
    monkeypatch.setattr(hostprobe, "probe_host_prep", lambda *a, **k: probe)

    class _Dev:
        platform = "tpu"
    monkeypatch.setattr(jax, "devices", lambda *a: [_Dev()])

    # PCIe-class link: 1 ms extra per staged frame < 15 ms margin → ON
    pcie = {"platform": "tpu", "staging": 640,
            "staged_h2d_ms_per_image": 1.2, "crops_h2d_ms_per_image": 0.2,
            "delta_ms_per_image": 1.0}
    monkeypatch.setattr(hostprobe, "probe_link", lambda *a, **k: pcie)
    out = hostprobe.auto_policy()
    assert out.get("device_resize") is True and out.get("fast_decode") is True

    # relay-class link: 40 ms extra > the 15 ms margin → OFF
    relay = dict(pcie, staged_h2d_ms_per_image=45.0, delta_ms_per_image=40.0)
    monkeypatch.setattr(hostprobe, "probe_link", lambda *a, **k: relay)
    out2 = hostprobe.auto_policy()
    assert "device_resize" not in out2

    # explicit env suppresses the knob even on a PCIe link
    monkeypatch.setattr(hostprobe, "probe_link", lambda *a, **k: pcie)
    monkeypatch.setenv("MISINFO_TPU_HOST_POLICY", "auto")
    monkeypatch.setenv("MISINFO_TPU_DEVICE_RESIZE", "0")
    cfg = ForensicsConfig.from_env(verbose=False)
    assert cfg.serving.device_resize is False
    assert cfg.serving.fast_decode is True     # the other knob still applies


def test_auto_policy_cpu_backend_never_flips_device_resize(monkeypatch):
    from misinfo_tpu.preprocess import hostprobe

    probe = {"cores": 1, "probe_resolution": 1080,
             "exact_ms_per_image": 75.0, "fast_ms_per_image": 34.0,
             "decode_ms_per_image": 45.0,
             "exact_ceiling_images_per_s": 13.3,
             "fast_ceiling_images_per_s": 29.4}
    monkeypatch.setattr(hostprobe, "probe_host_prep", lambda *a, **k: probe)
    out = hostprobe.auto_policy()              # real (cpu) backend
    assert "device_resize" not in out
