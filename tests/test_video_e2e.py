"""Video path end-to-end: synthesize a real mp4 with cv2, run the engine's
analyze(video_path=...) and the frame samplers (reference analyze_video
semantics, misinfo_forensics.py:493-573)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("video")
    path = str(tmp / "clip.mp4")
    w, h, fps = 96, 64, 10.0
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        pytest.skip("no mp4 encoder available")
    rng = np.random.default_rng(0)
    for i in range(40):  # 4 seconds at 10 fps
        frame = np.full((h, w, 3), (i * 6) % 255, np.uint8)
        frame[:, : w // 2] = rng.integers(0, 255, (h, w // 2, 3))
        writer.write(frame)
    writer.release()
    return path


def test_frame_sampler_stride(video_path):
    from misinfo_tpu.preprocess.video import sample_video_frames

    frames, valid = sample_video_frames(video_path, max_frames=12,
                                        stride_seconds=1.0)
    # 4 s of video at 1 fps sampling → 4 frames
    assert 3 <= len(frames) <= 5
    assert valid.sum() == len(frames)
    assert valid.shape == (12,)


def test_equidistant_frames(video_path):
    from misinfo_tpu.preprocess.video import equidistant_frames

    frames = equidistant_frames(video_path, 3)
    assert frames is not None and len(frames) == 3
    assert all(f is not None for f in frames)


def test_engine_video_analysis(video_path):
    from misinfo_tpu.core.config import ForensicsConfig, PrecisionConfig
    from misinfo_tpu.engine.forensics import MisinfoForensics
    from misinfo_tpu.models.detector import DetectorConfig, detector_init

    det = DetectorConfig.tiny()
    cfg = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    cfg = cfg.replace(
        seq=cfg.seq.__class__(roberta_max_len=32, image_size=det.clip.image_size),
        video=cfg.video.__class__(max_frames=6))
    engine = MisinfoForensics(config=cfg, det_cfg=det,
                              params=detector_init(jax.random.PRNGKey(0), det))

    rep = engine.analyze(text="a colorful test pattern", video_path=video_path,
                         verbose=False)
    s = rep["scores"]
    assert rep["verdict_text"] in ("REAL", "FAKE")
    assert 0.0 <= s["deepfake_score"] <= 1.0
    assert -1.0 <= s["clip_similarity"] <= 1.0
    assert abs(s["fake_probability"] + s["real_probability"] - 1.0) < 1e-5

    # video without text → fallback verdict arithmetic
    rep2 = engine.analyze(video_path=video_path, verbose=False)
    s2 = rep2["scores"]
    assert s2["ai_score"] == 0.0
    assert abs(s2["fake_probability"]
               - min(1.0, max(s2["deepfake_score"], s2["vault_discrepancy"]))) < 1e-6


def test_metrics_module_matches_sklearn():
    from misinfo_tpu.train.metrics import classification_report, confusion_matrix

    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 2, 200)
    y_pred = rng.integers(0, 2, 200)
    cm = confusion_matrix(y_true, y_pred)
    rep = classification_report(y_true, y_pred, ["REAL", "FAKE"])
    try:
        from sklearn.metrics import (classification_report as sk_report,
                                     confusion_matrix as sk_cm)
    except ImportError:
        assert cm.sum() == 200
        return
    np.testing.assert_array_equal(cm, sk_cm(y_true, y_pred))
    sk = sk_report(y_true, y_pred, output_dict=True)
    assert rep["accuracy"] == pytest.approx(sk["accuracy"], abs=1e-9)
    assert rep["REAL"]["f1"] == pytest.approx(sk["0"]["f1-score"], abs=1e-9)
    assert rep["FAKE"]["recall"] == pytest.approx(sk["1"]["recall"], abs=1e-9)


@pytest.fixture(scope="module")
def video_path2(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("video2")
    path = str(tmp / "clip2.mp4")
    w, h, fps = 96, 64, 10.0
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        pytest.skip("no mp4 encoder available")
    rng = np.random.default_rng(7)
    for i in range(25):
        writer.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    writer.release()
    return path


def test_batched_videos_match_single_requests(video_path, video_path2,
                                              tmp_path):
    """V videos in one analyze_batch run through ONE program launch and
    return the same reports as per-request analyze() calls."""
    from misinfo_tpu.core.config import ForensicsConfig, PrecisionConfig
    from misinfo_tpu.engine.forensics import MisinfoForensics
    from misinfo_tpu.models.detector import DetectorConfig, detector_init

    det_cfg = DetectorConfig.tiny()
    cfg = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    cfg = cfg.replace(
        paths=cfg.paths.__class__(vault_path=str(tmp_path / "missing.npz")),
        seq=cfg.seq.__class__(roberta_max_len=32, image_size=64))
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    eng = MisinfoForensics(config=cfg, det_cfg=det_cfg, params=params)

    reqs = [{"video": video_path, "text": "first clip caption"},
            {"video": video_path2, "text": "second clip different words"},
            {"video": video_path2}]        # no-text variant in the same call
    batched = eng.analyze_batch(reqs)
    singles = [eng.analyze(text=r.get("text"), video_path=r["video"],
                           verbose=False) for r in reqs]
    for b, s in zip(batched, singles):
        assert b["verdict"] == s["verdict"]
        for k in ("deepfake_score", "clip_similarity", "misinfo_score",
                  "fake_probability", "vault_discrepancy"):
            assert abs(b["scores"][k] - s["scores"][k]) < 1e-4, k
