"""Host image frontend backends (preprocess/image.py): the cv2 fast path
must stay pixel-close to the PIL reference path (which replicates
torchvision/CLIPProcessor filters exactly) and must honor backend pinning.
"""

import numpy as np
import pytest

from misinfo_tpu.preprocess import image as I

cv2 = pytest.importorskip("cv2")


@pytest.fixture(autouse=True)
def _restore_backend():
    yield
    I.set_image_backend("auto")


def _rand_img(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 255, (h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("mode", ["effnet", "clip"])
@pytest.mark.parametrize("shape", [(480, 640), (120, 90), (224, 224)])
def test_cv2_close_to_pil(mode, shape):
    arr = _rand_img(*shape)
    I.set_image_backend("pil")
    ref = I.image_to_array(arr, mode).astype(np.int16)
    I.set_image_backend("cv2")
    fast = I.image_to_array(arr, mode).astype(np.int16)
    assert ref.shape == fast.shape == (224, 224, 3)
    # random noise is the worst case for filter differences; natural images
    # land much closer. Bound the mean divergence, not the max.
    mad = float(np.mean(np.abs(ref - fast)))
    assert mad < 20.0, (mode, shape, mad)


def test_backend_pinning_and_file_decode(tmp_path):
    from PIL import Image

    p = str(tmp_path / "x.jpg")
    Image.fromarray(_rand_img(64, 48, 1)).save(p, quality=95)
    I.set_image_backend("cv2")
    a = I.image_to_array(p, "effnet")
    I.set_image_backend("pil")
    b = I.image_to_array(p, "effnet")
    assert a.shape == b.shape == (224, 224, 3)
    # JPEG decoders (libjpeg-turbo via both) must agree closely
    assert float(np.mean(np.abs(a.astype(np.int16) - b.astype(np.int16)))) < 25.0
    with pytest.raises(ValueError):
        I.set_image_backend("nope")


def test_missing_file_raises_cv2():
    I.set_image_backend("cv2")
    with pytest.raises(FileNotFoundError):
        I.image_to_array("/does/not/exist.jpg", "effnet")


def test_pil_center_crop_matches_hf_clip_processor():
    """The PIL path must be bit-exact with HF's CLIPImageProcessor —
    including the TRUNCATING long-edge formula int(size*long/short)
    (round-2 review: a rounded scale-multiply differed by one pixel on
    e.g. 640x480, shifting the whole crop window)."""
    tr = pytest.importorskip("transformers")
    from PIL import Image

    proc = tr.CLIPImageProcessor(size={"shortest_edge": 224},
                                 crop_size={"height": 224, "width": 224})
    rng = np.random.default_rng(0)
    for (w, h) in [(640, 480), (480, 640), (333, 500), (224, 224),
                   (1023, 311), (200, 300)]:
        img = Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
        hf = proc(img, return_tensors="np")["pixel_values"][0]
        ours = I.resize_center_crop(img, 224).astype(np.float32) / 255.0
        ours = ((ours - np.array(I.CLIP_MEAN)) / np.array(I.CLIP_STD))
        assert np.abs(hf - ours.transpose(2, 0, 1)).max() < 1e-5, (w, h)


def test_hf_resize_dims_truncates():
    assert I._hf_resize_dims(640, 480, 224) == (298, 224)   # int(224*640/480)
    assert I._hf_resize_dims(480, 640, 224) == (224, 298)
    assert I._hf_resize_dims(224, 224, 224) == (224, 224)


# ---------------------------------------------------------------- fast decode


def _save_jpeg(tmp_path, h, w, name="f.jpg", seed=3, quality=92):
    from PIL import Image

    # smooth gradient content: JPEG-compressible and representative of the
    # low-pass behavior the reduced decode exploits (noise has no spectrum
    # below Nyquist/2 to preserve)
    y = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    x = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    rgb = np.stack([y + 0 * x, 0 * y + x, (y + x) / 2], -1).astype(np.uint8)
    rgb ^= np.random.default_rng(seed).integers(
        0, 8, rgb.shape).astype(np.uint8)
    p = str(tmp_path / name)
    Image.fromarray(rgb).save(p, quality=quality)
    return p


def test_reduced_factor_selection(tmp_path):
    # short side ≥ 448·k picks k; JPEG only
    assert I._reduced_factor(_save_jpeg(tmp_path, 480, 640, "a.jpg")) == 1
    assert I._reduced_factor(_save_jpeg(tmp_path, 1080, 1920, "b.jpg")) == 2
    assert I._reduced_factor(_save_jpeg(tmp_path, 3000, 4000, "c.jpg")) == 4
    assert I._reduced_factor(_save_jpeg(tmp_path, 3600, 6400, "d.jpg")) == 8
    from PIL import Image

    png = str(tmp_path / "x.png")
    Image.fromarray(_rand_img(2048, 2048)).save(png)
    assert I._reduced_factor(png) == 1          # non-JPEG → exact decode
    assert I._reduced_factor("/does/not/exist.jpg") == 1


@pytest.mark.parametrize("backend", ["cv2", "pil"])
def test_fast_decode_small_jpeg_identical(tmp_path, backend):
    """Frames below the reduction floor must decode bit-identically with
    fast on/off (the flag is a no-op there)."""
    p = _save_jpeg(tmp_path, 480, 640)
    I.set_image_backend(backend)
    assert np.array_equal(I.decode_rgb(p, fast=True),
                          I.decode_rgb(p, fast=False))


@pytest.mark.parametrize("backend", ["cv2", "pil"])
def test_fast_decode_reduced_shape_and_fidelity(tmp_path, backend):
    """1080p JPEG: fast decode halves both dims (k=2) and the final 224px
    model inputs stay pixel-close to the full-decode path."""
    p = _save_jpeg(tmp_path, 1080, 1920)
    I.set_image_backend(backend)
    red = I.decode_rgb(p, fast=True)
    full = I.decode_rgb(p, fast=False)
    assert red.shape == (540, 960, 3) and full.shape == (1080, 1920, 3)
    for mode in ("effnet", "clip"):
        a = I.image_to_array(red, mode).astype(np.int16)
        b = I.image_to_array(full, mode).astype(np.int16)
        mad = float(np.mean(np.abs(a - b)))
        assert mad < 4.0, (backend, mode, mad)


def test_fast_decode_module_default(tmp_path):
    p = _save_jpeg(tmp_path, 1080, 1920)
    I.set_fast_decode(True)
    try:
        assert I.decode_rgb(p).shape == (540, 960, 3)
    finally:
        I.set_fast_decode(False)
    assert I.decode_rgb(p).shape == (1080, 1920, 3)
    # array/PIL inputs never take the reduced path
    arr = _rand_img(1024, 1024)
    assert np.array_equal(I.decode_rgb(arr, fast=True), arr)


def test_fast_decode_config_env(monkeypatch):
    from misinfo_tpu.core.config import ForensicsConfig

    assert ForensicsConfig.from_env().serving.fast_decode is False
    monkeypatch.setenv("MISINFO_TPU_FAST_DECODE", "1")
    assert ForensicsConfig.from_env().serving.fast_decode is True
