"""End-to-end engine tests on tiny configs: all modality variants of the
fused signal program + the analyze() report contract
(fixture shapes follow final_test.json / text_only.json / image_only.json,
SURVEY.md §4)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from misinfo_tpu.core.config import ForensicsConfig, PrecisionConfig
from misinfo_tpu.engine.forensics import MisinfoForensics
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.vault.store import TruthVault


@pytest.fixture(scope="module")
def tiny_engine(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vault")
    det_cfg = DetectorConfig.tiny()
    rng = np.random.default_rng(0)
    d = det_cfg.clip.projection_dim
    vault = TruthVault(
        image_embeddings=rng.normal(size=(3, d)).astype(np.float32),
        metadata=[{"title": f"Guardian article {i}", "url": f"u{i}",
                   "date": "2024-01-01"} for i in range(3)],
        text_embeddings=rng.normal(size=(3, d)).astype(np.float32),
    )
    vpath = str(tmp / "vault.npz")
    vault.save(vpath)

    cfg = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    cfg = cfg.replace(paths=cfg.paths.__class__(vault_path=vpath),
                      seq=cfg.seq.__class__(roberta_max_len=32, image_size=64))
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    return MisinfoForensics(config=cfg, det_cfg=det_cfg, params=params)


def _img(seed=0, size=64):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(size, size, 3)).astype(np.uint8)


def test_text_only(tiny_engine):
    rep = tiny_engine.analyze(text="Breaking news shocking claim", verbose=False)
    s = rep["scores"]
    assert rep["verdict"] in (0, 1)
    assert rep["verdict_text"] in ("REAL", "FAKE")
    # fallback verdict arithmetic: fake_prob == misinfo_score
    assert abs(s["fake_probability"] - s["misinfo_score"]) < 1e-6
    assert s["deepfake_score"] == 0.0 and s["clip_similarity"] == 0.0
    assert rep["vault_matches"] == []
    assert 0.0 <= rep["confidence"] <= 1.0


def test_visual_only(tiny_engine):
    from PIL import Image
    rep = tiny_engine.analyze(image_path=Image.fromarray(_img(1)), verbose=False)
    s = rep["scores"]
    assert s["ai_score"] == 0.0 and s["misinfo_score"] == 0.0
    expected = max(s["deepfake_score"], s["vault_discrepancy"])
    assert abs(s["fake_probability"] - min(1.0, expected)) < 1e-6
    assert len(rep["vault_matches"]) == 3  # top-k capped by 3 valid rows


def test_full(tiny_engine):
    from PIL import Image
    rep = tiny_engine.analyze(text="A caption for the image",
                              image_path=Image.fromarray(_img(2)),
                              verbose=False)
    s = rep["scores"]
    for k in ("ai_score", "misinfo_score", "deepfake_score"):
        assert 0.0 <= s[k] <= 1.0
    assert -1.0 <= s["clip_similarity"] <= 1.0
    assert abs(s["fake_probability"] + s["real_probability"] - 1.0) < 1e-5
    assert rep["explanation"]  # rule-based explanation text present


def test_fusion_verdict_method(tiny_engine):
    v = tiny_engine.fusion_verdict({"ai_score": 0.9, "misinfo_score": 0.8,
                                    "deepfake_score": 0.7,
                                    "clip_similarity": 0.1,
                                    "vault_discrepancy": 0.9})
    assert v["verdict"] in (0, 1)
    assert abs(v["fake_probability"] + v["real_probability"] - 1.0) < 1e-5
    assert v["confidence"] >= 0.5  # confidence is prob of predicted class


def test_batch_matches_single(tiny_engine):
    from PIL import Image
    img = Image.fromarray(_img(3))
    single = tiny_engine.analyze(text="hello world", image_path=img, verbose=False)
    batch = tiny_engine.analyze_batch(
        [{"text": "hello world", "image": img},
         {"text": "other caption", "image": Image.fromarray(_img(4))}])
    np.testing.assert_allclose(
        batch[0]["scores"]["fake_probability"],
        single["scores"]["fake_probability"], atol=1e-5)


def test_vault_gating_threshold(tiny_engine):
    """vault_discrepancy is 0 unless max similarity > 0.85 (reference :464)."""
    from PIL import Image
    rep = tiny_engine.analyze(image_path=Image.fromarray(_img(5)), verbose=False)
    s = rep["scores"]
    top_sim = rep["vault_matches"][0]["similarity"]
    if top_sim > 0.85:
        assert abs(s["vault_discrepancy"] - top_sim) < 1e-5
    else:
        assert s["vault_discrepancy"] == 0.0


def test_edge_inputs(tiny_engine):
    """Hostile-but-legal inputs must produce valid reports: emoji/CJK
    text, text far beyond the max sequence length (truncates), RGBA and
    grayscale images (converted to RGB), and a 1×1 image (resized)."""
    from PIL import Image

    for text in ["🚨🔥 ШОК! 突发新闻 ‮ reversed", "word " * 5000, " "]:
        rep = tiny_engine.analyze(text=text, verbose=False)
        assert rep["verdict_text"] in ("REAL", "FAKE")
        assert 0.0 <= rep["confidence"] <= 1.0

    rgba = Image.fromarray(
        np.dstack([_img(3), np.full((64, 64), 128, np.uint8)]), "RGBA")
    gray = Image.fromarray(_img(4)[:, :, 0], "L")
    tiny = Image.fromarray(_img(5, size=1))
    for img in (rgba, gray, tiny):
        rep = tiny_engine.analyze(image_path=img, verbose=False)
        assert rep["verdict_text"] in ("REAL", "FAKE")
        assert 0.0 <= rep["scores"]["deepfake_score"] <= 1.0


def test_requires_modality(tiny_engine):
    with pytest.raises(ValueError):
        tiny_engine.analyze(verbose=False)


def test_caption_title_similarity_fallback(tmp_path):
    """Vaults WITHOUT precomputed title text embeddings trigger the
    on-demand caption-vs-headline CLIP text similarity — the reference's
    conditional path (misinfo_forensics.py:468-484): computed only when a
    caption exists AND max image similarity > 0.85, else 0.0."""
    det_cfg = DetectorConfig.tiny()
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    size = det_cfg.clip.image_size

    base = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    base = base.replace(
        seq=base.seq.__class__(roberta_max_len=32, image_size=size))

    # compute the query image's CLIP embedding with the same weights the
    # engine will serve, then plant it in the vault → similarity 1.0 > 0.85
    from PIL import Image

    from misinfo_tpu.models.clip import clip_image_features
    from misinfo_tpu.ops.common import Policy, l2_normalize
    from misinfo_tpu.ops.image_ops import normalize_images
    from misinfo_tpu.preprocess.image import batch_images, image_to_array

    img = Image.fromarray(_img(11, size))
    arr = batch_images([image_to_array(img, "clip", size)], size)
    policy = Policy(PrecisionConfig.highest())
    emb = np.asarray(l2_normalize(clip_image_features(
        params["clip"], normalize_images(jax.numpy.asarray(arr), "clip",
                                         policy.compute),
        det_cfg.clip, policy)))[0]

    rng = np.random.default_rng(5)
    others = rng.normal(size=(2, emb.shape[0])).astype(np.float32)
    others /= np.linalg.norm(others, axis=1, keepdims=True)
    vault = TruthVault(
        image_embeddings=np.stack([emb, *others]),
        metadata=[{"title": f"headline {i}", "url": f"u{i}",
                   "date": "2024-01-01"} for i in range(3)],
        text_embeddings=None)           # ← forces the on-demand path
    vpath = str(tmp_path / "vault_no_text.pkl")
    vault.save(vpath)

    cfg = base.replace(paths=base.paths.__class__(vault_path=vpath))
    eng = MisinfoForensics(config=cfg, det_cfg=det_cfg, params=params)
    assert eng.vault.text_embeddings is None

    rep = eng.analyze(text="a caption about the scene",
                      image_path=img, verbose=False)
    s = rep["scores"]
    assert s["vault_discrepancy"] > 0.85          # planted exact match
    assert rep["vault_matches"][0]["title"] == "headline 0"
    assert s["text_similarity"] != 0.0
    # value equals the direct CLIP caption-vs-title similarity
    expected = eng._caption_title_similarity("a caption about the scene",
                                             "headline 0")
    np.testing.assert_allclose(s["text_similarity"], expected, atol=1e-5)

    # below the 0.85 gate → similarity NOT computed (reference :468)
    rep2 = eng.analyze(text="a caption about the scene",
                       image_path=Image.fromarray(_img(12, size)),
                       verbose=False)
    if rep2["scores"]["vault_discrepancy"] == 0.0:
        assert rep2["scores"]["text_similarity"] == 0.0

    # no caption → no text similarity even on an exact match
    rep3 = eng.analyze(image_path=img, verbose=False)
    assert rep3["scores"]["vault_discrepancy"] > 0.85
    assert rep3["scores"]["text_similarity"] == 0.0


def test_oversize_batch_chunks_at_max_bucket():
    """A request group larger than the biggest batch bucket must split into
    max-bucket chunks (known jit signatures only) instead of minting a novel
    batch-size signature per call (VERDICT r1 #3). 13 requests with buckets
    (1,2,4) → chunks of 4,4,4,1; every program launch shape is a bucket."""
    det_cfg = DetectorConfig.tiny()
    cfg = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    cfg = cfg.replace(
        seq=cfg.seq.__class__(roberta_max_len=32, image_size=64),
        serving=cfg.serving.__class__(batch_buckets=(1, 2, 4),
                                      pack_text=False))
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    eng = MisinfoForensics(config=cfg, det_cfg=det_cfg, params=params)
    reqs = [{"text": f"request number {i} with a few words"}
            for i in range(13)]
    dispatches, _ = eng._dispatch_batch(reqs)
    assert [len(idxs) for _, _, idxs in dispatches] == [4, 4, 4, 1]
    for _, out, _ in dispatches:
        # dispatches carry the PACKED [B, 10+2K] result buffer
        assert out.shape[0] in (1, 2, 4)
    reports = eng.analyze_batch(reqs)
    assert len(reports) == 13
    assert all(r["verdict"] in (0, 1) for r in reports)
    # chunking must preserve per-request scores exactly
    solo = eng.analyze(text=reqs[9]["text"], verbose=False)
    np.testing.assert_allclose(reports[9]["scores"]["misinfo_score"],
                               solo["scores"]["misinfo_score"], atol=1e-5)


def test_warmup_precompiles_serving_signatures():
    """engine.warmup() compiles the serving signature grid up front; real
    traffic in the warmed buckets then mints NO new jit signatures (the
    production guard against minutes-long mid-request TPU compiles)."""
    from PIL import Image

    det_cfg = DetectorConfig.tiny()
    cfg = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    cfg = cfg.replace(seq=cfg.seq.__class__(roberta_max_len=32, image_size=64))
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    eng = MisinfoForensics(config=cfg, det_cfg=det_cfg, params=params)

    sigs = eng.warmup(batch_sizes=(1,), videos=(1,))
    variants = ("full", "text_only", "visual_only", "video", "video_text")
    assert {v for v, _, _, _ in sigs} == set(variants)
    # warmup(batch_sizes=(1, 1)) must not re-dispatch a bucket
    assert len(sigs) == len(set(sigs))
    fns = {v: eng.programs.get(v) for v in variants}
    if not hasattr(fns["full"], "_cache_size"):
        pytest.skip("jit cache introspection not available on this jax")
    sizes = {v: f._cache_size() for v, f in fns.items()}
    assert all(n >= 1 for n in sizes.values())

    img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    out = eng.analyze_batch([
        {"text": "short text", "image": img},   # full, bucket 1
        {"text": "another short text"},          # text_only, bucket 1
        {"image": img},                          # visual_only, bucket 1
    ])
    assert len(out) == 3
    assert {v: f._cache_size() for v, f in fns.items()} == sizes

    with pytest.raises(ValueError):
        eng.warmup(variants=("full", "video"))   # videos= selects those


def test_warmup_covers_packed_signatures():
    """With pack_text enabled, warmup also compiles the packed-text
    layouts _dispatch_group routes buckets to — packed traffic after
    warmup mints no new signature either."""
    det_cfg = DetectorConfig.tiny()
    cfg = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    cfg = cfg.replace(
        seq=cfg.seq.__class__(roberta_max_len=32, image_size=64),
        serving=cfg.serving.__class__(pack_text=True))
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    eng = MisinfoForensics(config=cfg, det_cfg=det_cfg, params=params)

    sigs = eng.warmup(batch_sizes=(4,), variants=("text_only",), videos=())
    packed_rows = {r for _, _, _, r in sigs if r}
    assert packed_rows == {1, 2, 4}   # every row bucket ≤ the batch bucket
    fn = eng.programs.get("text_only")
    if not hasattr(fn, "_cache_size"):
        pytest.skip("jit cache introspection not available on this jax")
    size0 = fn._cache_size()
    out = eng.analyze_batch([{"text": f"short claim {i}"} for i in range(3)])
    assert len(out) == 3
    assert fn._cache_size() == size0


def test_signal_output_pack_roundtrip():
    """pack_signal_output/unpack_signal_output: exact for scores, verdicts,
    and vault indices — including row ids past 2^24 (f32 value-cast would
    corrupt those; the packer bitcasts)."""
    import jax.numpy as jnp
    import numpy as np

    from misinfo_tpu.engine.signals import (SignalOutput, pack_signal_output,
                                            unpack_signal_output)

    B, K = 3, 4
    rng = np.random.default_rng(0)
    vecs = rng.uniform(-1, 1, (10, B)).astype(np.float32)
    idx = np.array([[0, 1, 2, 3],
                    [2**24 + 1, 2**30 - 7, -1, 5],
                    [7, 8, 9, 10]], np.int32)
    out = SignalOutput(
        *[jnp.asarray(v) for v in vecs[:6]],
        verdict=jnp.asarray([1, 0, 1], jnp.int32),
        confidence=jnp.asarray(vecs[7]),
        fake_probability=jnp.asarray(vecs[8]),
        real_probability=jnp.asarray(vecs[9]),
        vault_top_sims=jnp.asarray(rng.uniform(-1, 1, (B, K)), jnp.float32),
        vault_top_idx=jnp.asarray(idx))
    packed = np.asarray(pack_signal_output(out))
    assert packed.shape == (B, 10 + 2 * K)
    back = unpack_signal_output(packed)
    for name in ("ai_score", "misinfo_score", "deepfake_score",
                 "clip_similarity", "vault_discrepancy", "text_similarity",
                 "confidence", "fake_probability", "real_probability",
                 "vault_top_sims"):
        np.testing.assert_array_equal(np.asarray(getattr(back, name)),
                                      np.asarray(getattr(out, name)),
                                      err_msg=name)
    assert back.verdict.dtype == np.int32
    np.testing.assert_array_equal(back.verdict, [1, 0, 1])
    assert back.vault_top_idx.dtype == np.int32
    np.testing.assert_array_equal(back.vault_top_idx, idx)
