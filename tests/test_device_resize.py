"""On-device image resize (ops/resize.py + ServingConfig.device_resize).

The op claims PIL-faithful antialiased resampling as MXU matmuls: both
224px flavors (torchvision bilinear squash, reference
misinfo_forensics.py:249-253; CLIPProcessor shortest-edge bicubic + crop)
derived on device from one staged uint8 frame. These tests pin:
  * pixel-level parity vs the PIL ground truth across geometries
    (downscale, upscale, extreme aspect, identity, 1×1);
  * engine score equality vs the PIL host-resize path;
  * the missing-media zero-fill contract and the oversize host-shrink
    fallback;
  * video frames staged through the same path;
  * mesh serving equality (staged planes data-shard like dense images);
  * warmup covering the staged signatures (jit caches frozen).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from misinfo_tpu.core.config import ForensicsConfig, MeshConfig, PrecisionConfig
from misinfo_tpu.engine.forensics import MisinfoForensics
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.ops.resize import device_resize_pair
from misinfo_tpu.preprocess.image import (
    choose_staging_bucket, resize_center_crop, resize_squash,
    stage_image_batch,
)

DET = DetectorConfig.tiny()


@pytest.fixture(scope="module")
def shared_params():
    return detector_init(jax.random.PRNGKey(0), DET)


def _cfg(**serving):
    cfg = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    return cfg.replace(
        paths=cfg.paths.__class__(vault_path="/nonexistent/vault.npz"),
        seq=cfg.seq.__class__(roberta_max_len=32,
                              image_size=DET.clip.image_size),
        serving=cfg.serving.__class__(**serving))


import contextlib


@contextlib.contextmanager
def _pil_backend():
    """Pin the HOST resize backend to PIL for the duration (the backend is
    read at analyze time, not engine construction)."""
    import misinfo_tpu.preprocess.image as I
    I.set_image_backend("pil")
    try:
        yield
    finally:
        I.set_image_backend("auto")


GEOMETRIES = [(480, 640), (640, 480), (224, 224), (100, 150), (31, 900),
              (257, 256), (1, 1), (223, 225), (16, 16)]


def test_device_resize_matches_pil():
    """Both flavors match PIL within ≤2 uint8 levels on a vanishing pixel
    fraction (f32-vs-fixed-point rounding ties; the cv2 host fast path
    diverges by ~50 levels on ~95% of pixels — docs/PERF.md)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    arrs = [rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            for h, w in GEOMETRIES]
    staged, params = stage_image_batch(arrs, 900, 224)
    eff_d, clip_d = jax.jit(device_resize_pair)(staged, params)
    eff_d, clip_d = np.asarray(eff_d), np.asarray(clip_d)
    for i, (h, w) in enumerate(GEOMETRIES):
        img = Image.fromarray(arrs[i])
        for dev, pil, name in ((eff_d[i], resize_squash(img), "effnet"),
                               (clip_d[i], resize_center_crop(img), "clip")):
            diff = np.abs(dev.astype(int) - pil.astype(int))
            assert diff.max() <= 2, (name, (h, w), diff.max())
            assert (diff > 0).mean() <= 0.05, (name, (h, w))


def test_device_resize_identity_is_exact():
    """A 224×224 frame resamples to itself bit-exactly in both flavors
    (scale-1 weights are a one-hot row: no rounding at all)."""
    rng = np.random.default_rng(1)
    a = rng.integers(0, 255, (224, 224, 3)).astype(np.uint8)
    staged, params = stage_image_batch([a], 256, 224)
    eff, clp = jax.jit(device_resize_pair)(staged, params)
    np.testing.assert_array_equal(np.asarray(eff)[0], a)
    np.testing.assert_array_equal(np.asarray(clp)[0], a)


def test_stage_batch_zero_fill_and_oversize():
    """None entries stage as zero frames with identity params (the
    missing-media zero-fill contract, reference
    misinformation_dataset.py:186-189); frames beyond the staging size
    host-shrink to fit."""
    rng = np.random.default_rng(2)
    big = rng.integers(0, 255, (700, 900, 3)).astype(np.uint8)
    staged, params = stage_image_batch([None, big], 256, 224)
    assert staged.shape == (2, 256, 256, 3)
    assert not staged[0].any()
    h, w = int(params[1, 0]), int(params[1, 1])
    assert (h, w) == (199, 256)          # aspect-preserving shrink
    assert staged[1, :h, :w].any()
    eff, clp = jax.jit(device_resize_pair)(staged, params)
    assert not np.asarray(eff)[0].any() and not np.asarray(clp)[0].any()
    assert np.asarray(eff)[1].any() and np.asarray(clp)[1].any()


def test_choose_staging_bucket():
    assert choose_staging_bucket(100, (320, 640)) == 320
    assert choose_staging_bucket(320, (320, 640)) == 320
    assert choose_staging_bucket(321, (320, 640)) == 640
    assert choose_staging_bucket(9999, (320, 640)) == 640   # shrink path


def test_engine_scores_match_pil_host_path(shared_params):
    """device_resize engine ≈ PIL-backend host-resize engine on mixed
    traffic (images of several geometries, text-only rows, missing
    images). The ≤2-level pixel divergence moves even the RANDOM tiny()
    towers' scores by <1e-3 (measured ~1e-5); a cv2-backend comparison
    would diverge by ~50 pixel levels — the backend is pinned to PIL for
    the whole host run."""
    from PIL import Image

    rng = np.random.default_rng(3)
    imgs = [Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
            for h, w in [(100, 160), (64, 64), (300, 200), (500, 700)]]
    reqs = [{"text": f"claim number {i}", "image": im}
            for i, im in enumerate(imgs)]
    reqs += [{"image": imgs[2]}, {"text": "a text only claim"}]

    with _pil_backend():
        host = MisinfoForensics(config=_cfg(), det_cfg=DET,
                                params=shared_params)
        out_host = host.analyze_batch(reqs)
    dev = MisinfoForensics(
        config=_cfg(device_resize=True, image_staging_buckets=(128, 512, 768)),
        det_cfg=DET, params=shared_params)
    for a, b in zip(out_host, dev.analyze_batch(reqs)):
        for k, va in a["scores"].items():
            np.testing.assert_allclose(va, b["scores"][k], atol=1e-3,
                                       err_msg=k)
        assert a["verdict"] == b["verdict"]


def test_video_frames_stage_through_device_resize(shared_params, tmp_path):
    """Video requests stage raw frames (24 host resizes/video eliminated);
    scores match the host-resize video path."""
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "clip.mp4")
    w, h, fps = 96, 64, 10.0
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    if not writer.isOpened():
        pytest.skip("no mp4 encoder available")
    rng = np.random.default_rng(4)
    for _ in range(25):
        writer.write(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    writer.release()

    reqs = [{"video": path, "text": "a video caption"}, {"video": path}]
    with _pil_backend():
        host = MisinfoForensics(config=_cfg(), det_cfg=DET,
                                params=shared_params)
        out_host = host.analyze_batch(reqs)
    dev = MisinfoForensics(
        config=_cfg(device_resize=True, image_staging_buckets=(128,)),
        det_cfg=DET, params=shared_params)
    for a, b in zip(out_host, dev.analyze_batch(reqs)):
        for k, va in a["scores"].items():
            np.testing.assert_allclose(va, b["scores"][k], atol=1e-3,
                                       err_msg=k)


def test_device_resize_under_mesh_matches_single(shared_params):
    """Staged planes + params data-shard like dense image batches: the
    meshed device_resize engine equals the unmeshed one."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from PIL import Image

    from misinfo_tpu.core.mesh import make_mesh

    rng = np.random.default_rng(5)
    imgs = [Image.fromarray(rng.integers(0, 255, (120 + 7 * i, 90, 3))
                            .astype(np.uint8)) for i in range(5)]
    reqs = [{"text": f"claim {i}", "image": im}
            for i, im in enumerate(imgs)] + [{"image": imgs[0]}]
    kw = dict(device_resize=True, image_staging_buckets=(160,))
    single = MisinfoForensics(config=_cfg(**kw), det_cfg=DET,
                              params=shared_params)
    meshed = MisinfoForensics(config=_cfg(**kw), det_cfg=DET,
                              params=shared_params,
                              mesh=make_mesh(MeshConfig(model=1)))
    for a, b in zip(single.analyze_batch(reqs), meshed.analyze_batch(reqs)):
        for k, va in a["scores"].items():
            np.testing.assert_allclose(va, b["scores"][k], atol=1e-4,
                                       err_msg=k)
        assert a["verdict"] == b["verdict"]


def test_full_grid_warmup_freezes_staged_signatures(shared_params):
    """With device_resize on, full-grid warmup covers every
    (variant × batch × text × staging) signature — traffic across image
    geometries and modality mixes mints no new jit entry."""
    from PIL import Image

    eng = MisinfoForensics(
        config=_cfg(device_resize=True, image_staging_buckets=(96, 256),
                    batch_buckets=(1, 4), pack_text=False),
        det_cfg=DET, params=shared_params)
    sigs = eng.warmup(full_grid=True, videos=())
    assert any(len(s) == 5 and s[4] for s in sigs)  # staged sigs present

    def cache_size():
        n = eng._pack_out._cache_size() + eng._clip_text_jit._cache_size()
        return n + sum(f._cache_size()
                       for f in eng.programs._jitted.values())

    n0 = cache_size()
    rng = np.random.default_rng(6)

    def img(h, w):
        return Image.fromarray(
            rng.integers(0, 255, (h, w, 3)).astype(np.uint8))

    eng.analyze_batch([{"text": "t", "image": img(50, 80)}])
    eng.analyze_batch([{"image": img(200, 100)}, {"image": img(30, 30)}])
    eng.analyze_batch([{"text": "a", "image": img(640, 480)},  # shrink path
                       {"text": "b"}, {"image": img(96, 96)}])
    assert cache_size() == n0
