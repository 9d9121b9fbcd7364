"""VERDICT r2 #7: `--warmup full` must close the compile gap completely —
after a full-grid warmup, NO analyze_batch request mix may mint a new jit
signature (a novel shape means a minutes-long mid-request TPU compile in
production). The assertion is on the actual jit caches across a sweep of
request counts / text lengths / modality mixes, with auto-pack routing
live."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from misinfo_tpu.core.config import ForensicsConfig, PrecisionConfig
from misinfo_tpu.engine.forensics import MisinfoForensics
from misinfo_tpu.models.detector import DetectorConfig

DET = DetectorConfig.tiny()


def _engine(**serving):
    cfg = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    cfg = cfg.replace(
        paths=cfg.paths.__class__(vault_path="/nonexistent/vault.pkl"),
        seq=cfg.seq.__class__(roberta_max_len=64,
                              image_size=DET.clip.image_size),
        serving=cfg.serving.__class__(batch_buckets=(1, 4, 8), **serving))
    return MisinfoForensics(config=cfg, det_cfg=DET)


def _jit_cache_size(eng) -> int:
    n = eng._pack_out._cache_size() + eng._clip_text_jit._cache_size()
    for fn in eng.programs._jitted.values():
        n += fn._cache_size()
    return n


def _img(seed):
    from PIL import Image
    rng = np.random.default_rng(seed)
    s = DET.clip.image_size
    return Image.fromarray(
        rng.integers(0, 255, size=(s, s, 3)).astype(np.uint8))


def _traffic():
    """Request mixes spanning counts, ragged lengths, and variants —
    including counts that are NOT bucket values (3, 5, 9 → rounding) and
    an oversize burst (10 > max bucket 8 → split)."""
    short = "a short claim"
    mid = "a medium length claim about some breaking news event today"
    long = "many words " * 25                       # > half the 64 bucket
    yield [{"text": short}]
    yield [{"text": long}, {"text": short}, {"text": mid}]
    yield [{"text": short} for _ in range(5)]
    yield [{"text": mid} for _ in range(9)] + [{"text": short}]
    yield [{"image": _img(1)}, {"image": _img(2)}, {"image": _img(3)}]
    yield [{"text": short, "image": _img(4)},
           {"text": long, "image": _img(5)}]
    yield [{"text": short}, {"image": _img(6)},
           {"text": mid, "image": _img(7)}, {"text": long},
           {"text": short, "image": _img(8)}]


@pytest.mark.parametrize("pack_text", ["auto", True, False])
def test_full_grid_warmup_freezes_jit_signatures(pack_text):
    eng = _engine(pack_text=pack_text)
    sigs = eng.warmup(full_grid=True, videos=())
    assert sigs, "full-grid warmup compiled nothing"
    n0 = _jit_cache_size(eng)
    assert n0 > 0
    for reqs in _traffic():
        out = eng.analyze_batch(reqs)
        assert len(out) == len(reqs)
        assert _jit_cache_size(eng) == n0, (
            f"request mix {[(list(r)) for r in reqs]} minted a new jit "
            f"signature after full-grid warmup (pack_text={pack_text})")


def test_parallel_warmup_matches_serial_grid():
    """warmup(parallel=N) compiles the SAME signature set as the serial
    path (order preserved) and freezes the jit caches just as hard —
    the pool only overlaps the per-signature compile/cache-load IO."""
    eng_s = _engine(pack_text="auto")
    sigs_s = eng_s.warmup(full_grid=True, videos=())
    eng_p = _engine(pack_text="auto")
    sigs_p = eng_p.warmup(full_grid=True, videos=(), parallel=4)
    assert sigs_p == sigs_s
    n0 = _jit_cache_size(eng_p)
    assert n0 == _jit_cache_size(eng_s)
    for reqs in _traffic():
        out = eng_p.analyze_batch(reqs)
        assert len(out) == len(reqs)
        assert _jit_cache_size(eng_p) == n0, (
            f"request mix {[(list(r)) for r in reqs]} minted a new jit "
            "signature after parallel full-grid warmup")


def test_parallel_warmup_order_matches_serial_with_vault(tmp_path):
    """ADVICE r4: with a vault lacking text_embeddings, the extra
    caption_title_sim warm must land at the SAME position in serial and
    parallel signature lists (the deferred grid flushes before the vault
    branch)."""
    from misinfo_tpu.vault.store import TruthVault

    rng = np.random.default_rng(0)
    embs = rng.normal(size=(8, DET.clip.projection_dim)).astype(np.float32)
    vp = str(tmp_path / "v.npz")
    TruthVault(embs, [{"title": f"t{i}", "url": "u", "date": "d"}
                      for i in range(8)]).save(vp)

    def mk():
        cfg = ForensicsConfig(verbose=False).replace(
            precision=PrecisionConfig.highest())
        cfg = cfg.replace(
            paths=cfg.paths.__class__(vault_path=vp),
            seq=cfg.seq.__class__(roberta_max_len=64,
                                  image_size=DET.clip.image_size),
            serving=cfg.serving.__class__(batch_buckets=(1, 4),
                                          pack_text=False))
        return MisinfoForensics(config=cfg, det_cfg=DET)

    eng_s, eng_p = mk(), mk()
    assert eng_s.vault.text_embeddings is None
    sigs_s = eng_s.warmup(full_grid=True, videos=())
    sigs_p = eng_p.warmup(full_grid=True, videos=(), parallel=4)
    assert any(v == "caption_title_sim" for v, *_ in sigs_s)
    assert sigs_p == sigs_s


def test_default_warmup_covers_endpoint_shapes():
    """The default (endpoint) warmup covers batch buckets 1 and max with
    every text bucket — single requests and max-size bursts then reuse
    warmed signatures (intermediate buckets are documented to compile on
    first use; --warmup full is the production preset)."""
    eng = _engine(pack_text=False)
    eng.warmup(videos=())
    n0 = _jit_cache_size(eng)
    eng.analyze_batch([{"text": "one short request"}])
    eng.analyze_batch([{"text": f"req {i}"} for i in range(8)])
    assert _jit_cache_size(eng) == n0


def test_full_grid_warmup_covers_caption_title_similarity(tmp_path):
    """Vaults WITHOUT precomputed title embeddings compute the
    caption-vs-headline similarity on demand through a separate clip-text
    jit; full-grid warmup must cover it so the first >0.85 match doesn't
    compile mid-request."""
    import jax.numpy as jnp

    from misinfo_tpu.core.config import ForensicsConfig, PrecisionConfig
    from misinfo_tpu.models.clip import clip_image_features
    from misinfo_tpu.models.detector import detector_init
    from misinfo_tpu.ops.common import Policy, l2_normalize
    from misinfo_tpu.ops.image_ops import normalize_images
    from misinfo_tpu.preprocess.image import (batch_images, decode_rgb,
                                              image_to_array)
    from misinfo_tpu.vault.store import TruthVault

    params = detector_init(jax.random.PRNGKey(0), DET)
    cfg = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    policy = Policy(cfg.precision)

    # plant the query image's own embedding as a vault row so the 0.85
    # reuse gate fires; NO text_embeddings → on-demand title similarity
    img = _img(42)
    size = DET.clip.image_size
    arr = batch_images([image_to_array(decode_rgb(img), "clip", size)], size)
    emb = np.asarray(l2_normalize(clip_image_features(
        params["clip"], normalize_images(jnp.asarray(arr), "clip",
                                         policy.compute),
        DET.clip, policy)))[0]
    rng = np.random.default_rng(1)
    embs = rng.normal(size=(16, DET.clip.projection_dim)).astype(np.float32)
    embs[0] = emb
    vp = str(tmp_path / "v.npz")
    TruthVault(embs, [{"title": f"t{i}", "url": "u", "date": "d"}
                      for i in range(16)]).save(vp)

    cfg = cfg.replace(
        paths=cfg.paths.__class__(vault_path=vp),
        seq=cfg.seq.__class__(roberta_max_len=64, image_size=size),
        serving=cfg.serving.__class__(batch_buckets=(1, 4),
                                      pack_text=False))
    eng = MisinfoForensics(config=cfg, det_cfg=DET, params=params)
    assert eng.vault.text_embeddings is None
    sigs = eng.warmup(full_grid=True, videos=())
    assert any(v == "caption_title_sim" for v, *_ in sigs)
    n0 = _jit_cache_size(eng)
    out = eng.analyze_batch([{"text": "a caption", "image": img}])
    assert out[0]["scores"]["vault_discrepancy"] > 0.85   # gate fired
    assert out[0]["scores"]["text_similarity"] != 0.0     # on-demand path ran
    assert _jit_cache_size(eng) == n0
