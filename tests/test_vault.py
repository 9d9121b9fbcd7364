"""Truth Vault tests: dual-schema loading, on-device search semantics,
threshold gating, sharded search equivalence on the virtual 8-device mesh."""

import pickle

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from misinfo_tpu.vault.store import TruthVault
from misinfo_tpu.vault.search import vault_search, sharded_vault_sims


def _mk_vault(n=10, d=64, seed=0, with_text=True):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    meta = [{"title": f"article {i}", "url": f"u{i}", "date": "2024"}
            for i in range(n)]
    te = rng.normal(size=(n, d)).astype(np.float32) if with_text else None
    return TruthVault(emb, meta, te)


def test_rows_padded_and_normalized():
    v = _mk_vault(10, 64)
    assert v.embeddings.shape[0] == 128  # padded to lane multiple
    norms = np.linalg.norm(v.embeddings[:10], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert v.row_valid[:10].all() and not v.row_valid[10:].any()


def test_reference_pickle_schemas(tmp_path):
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(4, 32)).astype(np.float32)

    # schema A: embeddings + metadata (reference misinfo_forensics.py:222-224)
    pa = tmp_path / "a.pkl"
    with open(pa, "wb") as f:
        pickle.dump({"embeddings": emb,
                     "metadata": [{"title": f"t{i}"} for i in range(4)]}, f)
    va = TruthVault.load(str(pa))
    assert va is not None and va.num_articles == 4

    # schema B: image_embeddings + text_contents + image_paths (:225-234)
    pb = tmp_path / "b.pkl"
    with open(pb, "wb") as f:
        pickle.dump({"image_embeddings": emb,
                     "text_contents": [f"headline {i}" for i in range(4)],
                     "image_paths": [f"p{i}.jpg" for i in range(4)],
                     "text_embeddings": emb}, f)
    vb = TruthVault.load(str(pb))
    assert vb is not None and vb.num_articles == 4
    assert vb.metadata[0]["title"] == "headline 0"
    assert vb.text_embeddings is not None

    # unknown schema → None (reference :236)
    pc = tmp_path / "c.pkl"
    with open(pc, "wb") as f:
        pickle.dump({"weird": 1}, f)
    assert TruthVault.load(str(pc)) is None
    # missing file → None (reference :243-246)
    assert TruthVault.load(str(tmp_path / "nope.pkl")) is None


def test_npz_roundtrip(tmp_path):
    v = _mk_vault(6, 32)
    p = str(tmp_path / "v.npz")
    v.save(p)
    v2 = TruthVault.load(p)
    assert v2.num_articles == 6
    np.testing.assert_allclose(v2.embeddings, v.embeddings, atol=1e-6)
    assert v2.metadata[3]["title"] == "article 3"


def test_search_matches_reference_numpy_semantics():
    """On-device result == the reference's numpy argsort brute force
    (misinfo_forensics.py:443-449)."""
    v = _mk_vault(20, 64, seed=2)
    rng = np.random.default_rng(3)
    q = rng.normal(size=(3, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    res = vault_search(jnp.asarray(q), jnp.asarray(v.embeddings),
                       jnp.asarray(v.row_valid), top_k=5)
    # reference numpy path
    vn = v.embeddings[:20]
    for b in range(3):
        sims = vn @ q[b]
        top = np.argsort(sims)[-5:][::-1]
        np.testing.assert_array_equal(np.asarray(res.top_idx[b]), top)
        np.testing.assert_allclose(np.asarray(res.top_sims[b]), sims[top],
                                   atol=1e-5)
        expected_vd = sims[top[0]] if sims[top[0]] > 0.85 else 0.0
        assert abs(float(res.vault_discrepancy[b]) - expected_vd) < 1e-5


def test_threshold_gate_and_text_similarity():
    v = _mk_vault(8, 32, seed=4)
    # craft a query identical to row 5 → similarity 1.0 > 0.85
    q = v.embeddings[5][None]
    cap = np.asarray(v.text_embeddings[2][None])
    res = vault_search(jnp.asarray(q), jnp.asarray(v.embeddings),
                       jnp.asarray(v.row_valid), top_k=3,
                       caption_text_emb=jnp.asarray(cap),
                       vault_text_emb=jnp.asarray(v.text_embeddings),
                       has_caption=jnp.asarray([True]))
    assert int(res.top_idx[0, 0]) == 5
    assert float(res.vault_discrepancy[0]) > 0.99
    expected_tsim = float(cap[0] @ v.text_embeddings[5])
    assert abs(float(res.text_similarity[0]) - expected_tsim) < 1e-5

    # below-gate query → discrepancy 0 and text similarity 0
    rng = np.random.default_rng(9)
    q2 = rng.normal(size=(1, 32)).astype(np.float32)
    q2 /= np.linalg.norm(q2)
    res2 = vault_search(jnp.asarray(q2), jnp.asarray(v.embeddings),
                        jnp.asarray(v.row_valid), top_k=3,
                        caption_text_emb=jnp.asarray(cap),
                        vault_text_emb=jnp.asarray(v.text_embeddings),
                        has_caption=jnp.asarray([True]))
    if float(res2.top_sims[0, 0]) <= 0.85:
        assert float(res2.vault_discrepancy[0]) == 0.0
        assert float(res2.text_similarity[0]) == 0.0


def test_sharded_search_equivalence():
    """Row-sharded top-k over the 8-device mesh == single-device result."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devices = jax.devices()[:8]
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.asarray(devices), ("data",))

    v = _mk_vault(120, 64, seed=6)  # pads to 128 = 8 shards of 16 rows
    rng = np.random.default_rng(7)
    q = rng.normal(size=(4, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    N = v.embeddings.shape[0]
    shard_rows = N // 8
    offsets = (np.arange(8, dtype=np.int32) * shard_rows)[:, None]

    fn = shard_map(
        lambda qq, vs, off, rv: sharded_vault_sims(qq, vs, off[0], rv,
                                                   top_k=5),
        mesh=mesh,
        in_specs=(P(), P("data", None), P("data", None), P("data")),
        out_specs=(P(), P()),
        check_vma=False)
    top_sims, top_idx = fn(jnp.asarray(q), jnp.asarray(v.embeddings),
                           jnp.asarray(offsets), jnp.asarray(v.row_valid))

    ref = vault_search(jnp.asarray(q), jnp.asarray(v.embeddings),
                       jnp.asarray(v.row_valid), top_k=5)
    np.testing.assert_allclose(np.asarray(top_sims), np.asarray(ref.top_sims),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(top_idx), np.asarray(ref.top_idx))


def test_topk_chunked_exact_vs_lax():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from misinfo_tpu.vault.search import topk_chunked

    rng = np.random.default_rng(0)
    for n in (70_000, 65_536, 70_001):   # padded and exact-multiple cases
        sims = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
        ref_s, ref_i = jax.lax.top_k(sims, 5)
        got_s, got_i = topk_chunked(sims, 5)
        np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(got_s))
        np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


def test_topk_modes_exact_vs_lax():
    """iterative and approx(recall=1.0) modes must agree with lax.top_k
    (values exactly; indices exactly for distinct values)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from misinfo_tpu.vault.search import topk_approx, topk_iterative

    rng = np.random.default_rng(3)
    sims = jnp.asarray(rng.normal(size=(4, 9000)).astype(np.float32))
    ref_s, ref_i = jax.lax.top_k(sims, 5)
    for fn in (topk_iterative, topk_approx):
        got_s, got_i = fn(sims, 5)
        np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(got_s))
        np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


def test_topk_iterative_tie_breaks_low_index():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from misinfo_tpu.vault.search import topk_iterative

    sims = jnp.asarray(np.array([[1.0, 3.0, 3.0, 2.0, 0.5]], np.float32))
    ref_s, ref_i = jax.lax.top_k(sims, 3)
    got_s, got_i = topk_iterative(sims, 3)
    np.testing.assert_array_equal(np.asarray(ref_s), np.asarray(got_s))
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


# ------------------------------------------------------------------ IVF


def _ivf_setup(n=300, d=32, seed=5, **build_kw):
    from misinfo_tpu.vault.ivf import build_ivf

    v = _mk_vault(n, d, seed=seed)
    idx = build_ivf(v.embeddings, v.row_valid, n_clusters=16, seed=0,
                    **build_kw)
    return v, idx


def test_ivf_full_probe_equals_brute_force():
    """nprobe == n_clusters covers every row → provably exact."""
    from misinfo_tpu.vault.ivf import ivf_topk

    v, idx = _ivf_setup()
    rng = np.random.default_rng(9)
    q = rng.normal(size=(4, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qj = jnp.asarray(q)

    exact = vault_search(qj, jnp.asarray(v.embeddings),
                         jnp.asarray(v.row_valid), top_k=5)
    s, i = ivf_topk(qj, jnp.asarray(v.embeddings), jnp.asarray(v.row_valid),
                    jnp.asarray(idx.centroids), jnp.asarray(idx.lists),
                    jnp.asarray(idx.spill), top_k=5, nprobe=idx.n_clusters)
    np.testing.assert_allclose(np.asarray(s), np.asarray(exact.top_sims),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(exact.top_idx))


def test_ivf_every_row_probeable_exactly_once():
    v, idx = _ivf_setup(cap_factor=1.0)  # small cap → spill exercised
    members = idx.lists[idx.lists >= 0].tolist() + idx.spill[idx.spill >= 0].tolist()
    assert sorted(members) == list(range(v.num_articles))


def test_ivf_near_duplicate_recall():
    """The 0.85-reuse-gate regime: near-duplicate queries find their row."""
    from misinfo_tpu.vault.ivf import ivf_topk

    v, idx = _ivf_setup(n=400)
    rng = np.random.default_rng(11)
    rows = rng.choice(v.num_articles, size=16, replace=False)
    q = v.embeddings[rows] + 0.02 * rng.normal(size=(16, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s, i = ivf_topk(jnp.asarray(q), jnp.asarray(v.embeddings),
                    jnp.asarray(v.row_valid), jnp.asarray(idx.centroids),
                    jnp.asarray(idx.lists), jnp.asarray(idx.spill),
                    top_k=5, nprobe=idx.nprobe)
    hit = (np.asarray(i)[:, 0] == rows)
    assert hit.mean() >= 0.95, f"near-duplicate recall {hit.mean():.2f}"


def test_ivf_sidecar_roundtrip(tmp_path):
    from misinfo_tpu.vault.ivf import IVFIndex

    _, idx = _ivf_setup()
    p = str(tmp_path / "v.ivf.npz")
    idx.save(p)
    back = IVFIndex.load(p)
    assert back is not None and back.n_rows == idx.n_rows
    np.testing.assert_array_equal(back.lists, idx.lists)
    np.testing.assert_allclose(back.centroids, idx.centroids)


def test_vault_search_ivf_path_gate_semantics():
    """vault_search(ivf=...) keeps the 0.85 gate + title-text gather."""
    v, idx = _ivf_setup()
    dev = {f"ivf_{k}": jnp.asarray(getattr(idx, k))
           for k in ("centroids", "lists", "spill")}
    q = jnp.asarray(v.embeddings[3:4])  # exact duplicate of row 3 → sim 1.0
    cap = jnp.asarray(v.text_embeddings[7:8])
    r = vault_search(q, jnp.asarray(v.embeddings), jnp.asarray(v.row_valid),
                     top_k=5, caption_text_emb=cap,
                     vault_text_emb=jnp.asarray(v.text_embeddings),
                     has_caption=jnp.ones((1,), jnp.bool_),
                     ivf=dev, nprobe=idx.nprobe)
    assert int(r.top_idx[0, 0]) == 3
    assert float(r.vault_discrepancy[0]) > 0.99
    expect = float(np.dot(v.text_embeddings[7], v.text_embeddings[3]))
    np.testing.assert_allclose(float(r.text_similarity[0]), expect, atol=1e-5)


def test_engine_ivf_end_to_end(tmp_path):
    """Engine with MISINFO_TPU_VAULT_IVF: vault matches flow through the
    fused program; sidecar index is written next to the vault."""
    import os
    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.forensics import MisinfoForensics
    from misinfo_tpu.models.detector import DetectorConfig

    det = DetectorConfig.tiny()
    d = det.clip.projection_dim
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(40, d)).astype(np.float32)
    meta = [{"title": f"t{i}", "url": "u", "date": "d"} for i in range(40)]
    vp = str(tmp_path / "vault.npz")
    TruthVault(emb, meta, emb.copy()).save(vp)

    import dataclasses
    cfg = ForensicsConfig.from_env(verbose=False)
    cfg = cfg.replace(
        paths=dataclasses.replace(cfg.paths, vault_path=vp),
        serving=dataclasses.replace(cfg.serving, vault_ivf=True,
                                    ivf_nprobe=4),
        seq=cfg.seq.__class__(roberta_max_len=32, image_size=64))
    eng = MisinfoForensics(config=cfg, det_cfg=det)
    assert eng.vault_loaded
    assert "ivf_centroids" in eng._vault_device
    assert os.path.exists(vp + ".ivf.npz")

    from PIL import Image
    img = tmp_path / "q.png"
    Image.fromarray(
        (rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(img)
    rep = eng.analyze(text="headline", image_path=str(img), verbose=False)
    assert "vault_discrepancy" in rep["scores"]
    assert isinstance(rep["vault_matches"], list)


def test_matches_from_indices_filters_negative_sentinels():
    """IVF empty-slot sentinels (-1) must not python-wrap into real
    articles (code-review regression)."""
    v = _mk_vault(5, 32)
    matches = v.matches_from_indices(
        np.asarray([3, -1, -1, 200]), np.asarray([0.9, -2.0, -2.0, -2.0]))
    assert len(matches) == 1 and matches[0]["title"] == "article 3"


def test_build_ivf_empty_vault_raises_and_engine_skips(tmp_path):
    from misinfo_tpu.vault.ivf import build_ivf

    emb = np.zeros((128, 16), np.float32)
    with pytest.raises(ValueError):
        build_ivf(emb, np.zeros((128,), np.bool_))


def test_ivf_sidecar_invalidated_by_content_change(tmp_path):
    """Same padded shape, different content → digest mismatch forces a
    rebuild (shape-only checks miss edits within a 128-row pad bucket)."""
    from misinfo_tpu.vault.ivf import IVFIndex, build_ivf, vault_digest

    v = _mk_vault(40, 32, seed=1)
    idx = build_ivf(v.embeddings, v.row_valid, n_clusters=8)
    assert idx.digest == vault_digest(v.embeddings, v.row_valid)
    v2 = _mk_vault(41, 32, seed=1)   # one more article, same 128-row pad
    assert v2.embeddings.shape == v.embeddings.shape
    assert idx.digest != vault_digest(v2.embeddings, v2.row_valid)
    p = str(tmp_path / "i.npz")
    idx.save(p)
    back = IVFIndex.load(p)
    assert back.digest == idx.digest


def test_ivf_bf16_gather_matches_f32_path():
    """bf16 candidate gather + exact rescore: same top indices and
    f32-exact final similarities as the f32-gather IVF path."""
    from misinfo_tpu.vault.ivf import ivf_topk

    v, idx = _ivf_setup(n=400)
    rng = np.random.default_rng(13)
    rows = rng.choice(v.num_articles, size=8, replace=False)
    q = v.embeddings[rows] + 0.05 * rng.normal(size=(8, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    args = (jnp.asarray(q), jnp.asarray(v.embeddings),
            jnp.asarray(v.row_valid), jnp.asarray(idx.centroids),
            jnp.asarray(idx.lists), jnp.asarray(idx.spill))
    s32, i32 = ivf_topk(*args, top_k=5, nprobe=idx.n_clusters)
    s16, i16 = ivf_topk(*args, top_k=5, nprobe=idx.n_clusters,
                        emb16=jnp.asarray(v.embeddings, jnp.bfloat16))
    np.testing.assert_array_equal(np.asarray(i16), np.asarray(i32))
    # final sims come from the f32 rows in both paths → exact agreement
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), atol=1e-6)


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_quantized_vault_storage_modes(dtype):
    """Capacity modes (ServingConfig.vault_dtype): same top match as f32
    on separated data; duplicate-query sims within the documented error."""
    from misinfo_tpu.vault.search import quantize_rows_int8

    v = _mk_vault(64, 64, seed=21)
    q = jnp.asarray(v.embeddings[5:9])      # exact duplicates of rows 5..8
    exact = vault_search(q, jnp.asarray(v.embeddings),
                         jnp.asarray(v.row_valid), top_k=3)
    if dtype == "int8":
        dev = jnp.asarray(quantize_rows_int8(v.embeddings))
        tol = 0.02
    else:
        dev = jnp.asarray(v.embeddings, jnp.bfloat16)
        tol = 0.01
    got = vault_search(q, dev, jnp.asarray(v.row_valid), top_k=3)
    np.testing.assert_array_equal(np.asarray(got.top_idx[:, 0]),
                                  np.asarray(exact.top_idx[:, 0]))
    np.testing.assert_allclose(np.asarray(got.top_sims),
                               np.asarray(exact.top_sims), atol=tol)
    # duplicate queries still clear the 0.85 reuse gate
    assert (np.asarray(got.vault_discrepancy) > 0.95).all()


def test_engine_vault_dtype_int8(tmp_path, monkeypatch):
    """MISINFO_TPU_VAULT_DTYPE=int8 flows through from_env into the
    device vault; reports still carry real matches."""
    import dataclasses
    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.forensics import MisinfoForensics
    from misinfo_tpu.models.detector import DetectorConfig

    det = DetectorConfig.tiny()
    d = det.clip.projection_dim
    rng = np.random.default_rng(4)
    emb = rng.normal(size=(30, d)).astype(np.float32)
    meta = [{"title": f"t{i}", "url": "u", "date": "d"} for i in range(30)]
    vp = str(tmp_path / "vault.npz")
    TruthVault(emb, meta, emb.copy()).save(vp)

    monkeypatch.setenv("MISINFO_TPU_VAULT_DTYPE", "int8")
    cfg = ForensicsConfig.from_env(verbose=False)
    assert cfg.serving.vault_dtype == "int8"
    cfg = cfg.replace(
        paths=dataclasses.replace(cfg.paths, vault_path=vp),
        seq=cfg.seq.__class__(roberta_max_len=32, image_size=64))
    eng = MisinfoForensics(config=cfg, det_cfg=det)
    assert eng._vault_device["vault_emb"].dtype == jnp.int8

    from PIL import Image
    img = tmp_path / "q.png"
    Image.fromarray(
        (rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(img)
    rep = eng.analyze(text="hello", image_path=str(img), verbose=False)
    assert isinstance(rep["vault_matches"], list)


def test_ivf_with_int8_vault():
    """IVF probing over an int8 device vault: gathered rows dequantize."""
    from misinfo_tpu.vault.ivf import ivf_topk
    from misinfo_tpu.vault.search import quantize_rows_int8

    v, idx = _ivf_setup(n=300)
    q = jnp.asarray(v.embeddings[7:10])
    s, i = ivf_topk(q, jnp.asarray(quantize_rows_int8(v.embeddings)),
                    jnp.asarray(v.row_valid), jnp.asarray(idx.centroids),
                    jnp.asarray(idx.lists), jnp.asarray(idx.spill),
                    top_k=3, nprobe=idx.n_clusters)
    np.testing.assert_array_equal(np.asarray(i[:, 0]), [7, 8, 9])
    assert (np.asarray(s[:, 0]) > 0.98).all()
