"""int4 vault capacity mode (vault/int4.py): packing round-trip, sim error
bounds, Pallas-vs-XLA agreement (interpret mode, CLAUDE.md kernel rule),
reuse-gate semantics, and the engine's vault_dtype='int4' path."""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from misinfo_tpu.vault.int4 import (
    INT4_TILE_ROWS, Int4Vault, int4_sims_pallas, int4_sims_reference,
    pad_int4_vault, quantize_rows_int4, unpack_int4)
from misinfo_tpu.vault.search import vault_search
from misinfo_tpu.vault.store import TruthVault


def _rows(n, d=512, seed=0):
    r = np.random.default_rng(seed).standard_normal((n, d)).astype(np.float32)
    return r / np.linalg.norm(r, axis=1, keepdims=True)


def test_pack_unpack_roundtrip_exact():
    """unpack(pack(x)) recovers the quantized grid exactly: every
    dequantized element is within scale/2 of the original."""
    rows = _rows(32, 512, seed=1)
    q = quantize_rows_int4(rows)
    nib = np.asarray(unpack_int4(jnp.asarray(q.packed)))
    assert nib.min() >= -7 and nib.max() <= 7
    deq = nib * q.scale[:, None]
    assert np.abs(deq - rows).max() <= (q.scale.max() / 2) + 1e-7


def test_zero_rows_quantize_to_zero():
    v = quantize_rows_int4(np.zeros((4, 512), np.float32))
    assert (v.scale == 0).all() and (np.asarray(
        unpack_int4(jnp.asarray(v.packed))) == 0).all()


def test_sim_error_within_documented_band():
    """Cosine sims vs exact f32: ~1% RMS, <5% max (the documented int4
    band; per-row max scaling is what makes this hold — a fixed ±1 grid
    would be 3× coarser than the elements of a unit 512-d row)."""
    v, q = _rows(4096, 512, seed=2), _rows(16, 512, seed=3)
    exact = q @ v.T
    i4 = quantize_rows_int4(v)
    got = np.asarray(int4_sims_reference(
        jnp.asarray(q), jnp.asarray(i4.packed), jnp.asarray(i4.scale)))
    err = got - exact
    assert np.sqrt((err ** 2).mean()) < 0.02
    assert np.abs(err).max() < 0.05


def test_pallas_kernel_matches_reference_interpret():
    """Interpret-mode kernel vs the XLA path (CLAUDE.md: every new kernel
    needs this before being enabled by default). Both paths share the
    bf16 cast discipline, so agreement is float-noise only."""
    n = 2 * INT4_TILE_ROWS
    v, q = _rows(n, 512, seed=4), _rows(8, 512, seed=5)
    i4 = quantize_rows_int4(v)
    args = (jnp.asarray(q), jnp.asarray(i4.packed), jnp.asarray(i4.scale))
    ref = np.asarray(int4_sims_reference(*args))
    ker = np.asarray(int4_sims_pallas(*args, interpret=True))
    np.testing.assert_allclose(ker, ref, atol=1e-5)


def test_pallas_i8_variant_within_band_interpret():
    """Double-rate int8-MXU variant: query quantization adds ~0.5% on top
    of the rows' int4 grid — still inside the documented band vs exact
    f32, and close to the bf16 kernel."""
    from misinfo_tpu.vault.int4 import int4_sims_pallas_i8
    n = INT4_TILE_ROWS
    v, q = _rows(n, 512, seed=6), _rows(8, 512, seed=8)
    i4 = quantize_rows_int4(v)
    args = (jnp.asarray(q), jnp.asarray(i4.packed), jnp.asarray(i4.scale))
    got = np.asarray(int4_sims_pallas_i8(*args, interpret=True))
    exact = q @ v.T
    err = got - exact
    assert np.sqrt((err ** 2).mean()) < 0.02
    assert np.abs(err).max() < 0.05
    bf16 = np.asarray(int4_sims_pallas(*args, interpret=True))
    assert np.abs(got - bf16).max() < 0.03


def test_pallas_rejects_unpadded_rows():
    v, q = _rows(100, 512), _rows(2, 512)
    i4 = quantize_rows_int4(v)
    with pytest.raises(ValueError, match="pad"):
        int4_sims_pallas(jnp.asarray(q), jnp.asarray(i4.packed),
                         jnp.asarray(i4.scale), interpret=True)


def test_pad_int4_vault_alignment():
    i4 = pad_int4_vault(quantize_rows_int4(_rows(100, 512)))
    assert i4.packed.shape[0] == INT4_TILE_ROWS
    assert (i4.scale[100:] == 0).all()


def test_vault_search_int4_gate_semantics():
    """Planted near-duplicates clear the 0.85 reuse gate through the int4
    path; unrelated queries don't (reference misinfo_forensics.py:462-464
    semantics preserved across storage modes)."""
    emb = _rows(256, 512, seed=7)
    q = jnp.asarray(emb[10:14])            # exact duplicates of rows 10..13
    i4 = quantize_rows_int4(emb)
    exact = vault_search(q, jnp.asarray(emb),
                         jnp.ones((256,), bool), top_k=3)
    got = vault_search(q, jnp.asarray(i4.packed), jnp.ones((256,), bool),
                       top_k=3, vault_scale=jnp.asarray(i4.scale))
    np.testing.assert_array_equal(np.asarray(got.top_idx[:, 0]),
                                  np.asarray(exact.top_idx[:, 0]))
    np.testing.assert_allclose(np.asarray(got.top_sims),
                               np.asarray(exact.top_sims), atol=0.05)
    assert (np.asarray(got.vault_discrepancy) > 0.9).all()
    # int4-packed titles: caption-vs-headline sim within the band of the
    # f32-title path (the gate is open for these near-duplicate queries)
    titles = _rows(256, 512, seed=17)
    t4 = quantize_rows_int4(titles)
    cap = jnp.asarray(_rows(4, 512, seed=18))
    f32_r = vault_search(q, jnp.asarray(emb), jnp.ones((256,), bool),
                         top_k=3, caption_text_emb=cap,
                         vault_text_emb=jnp.asarray(titles))
    i4_r = vault_search(q, jnp.asarray(i4.packed), jnp.ones((256,), bool),
                        top_k=3, vault_scale=jnp.asarray(i4.scale),
                        caption_text_emb=cap,
                        vault_text_emb=jnp.asarray(t4.packed),
                        vault_text_scale=jnp.asarray(t4.scale))
    np.testing.assert_allclose(np.asarray(i4_r.text_similarity),
                               np.asarray(f32_r.text_similarity), atol=0.05)
    # far query: random unit vector, sims ≈ N(0, 1/sqrt(512)) — gate closed
    far = vault_search(jnp.asarray(_rows(2, 512, seed=99)),
                       jnp.asarray(i4.packed), jnp.ones((256,), bool),
                       top_k=3, vault_scale=jnp.asarray(i4.scale))
    assert (np.asarray(far.vault_discrepancy) == 0.0).all()


def test_vault_search_sharded_int4_equals_replicated():
    """Row-sharded shard_map search over int4-packed shards (per-shard
    scales ride the same sharding) equals the replicated int4 search —
    the >HBM ~25M-articles/chip/shard combo in docs/SCALING.md."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from misinfo_tpu.core.config import MeshConfig
    from misinfo_tpu.core.mesh import make_mesh
    from misinfo_tpu.vault.search import vault_search_sharded

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(MeshConfig(model=1))
    N, B, K = 1024, 8, 5
    emb, temb = _rows(N, 512, seed=21), _rows(N, 512, seed=22)
    q = jnp.asarray(emb[100:100 + B])     # planted duplicates
    cap = jnp.asarray(_rows(B, 512, seed=23))
    i4, t4 = quantize_rows_int4(emb), quantize_rows_int4(temb)
    valid = np.arange(N) < 1000

    exact = vault_search(q, jnp.asarray(i4.packed), jnp.asarray(valid),
                         top_k=K, vault_scale=jnp.asarray(i4.scale),
                         caption_text_emb=cap,
                         vault_text_emb=jnp.asarray(t4.packed),
                         vault_text_scale=jnp.asarray(t4.scale))

    put = lambda a, spec: jax.device_put(jnp.asarray(a),
                                         NamedSharding(mesh, spec))
    sharded = jax.jit(lambda qq, v, rv, s, c, t, ts: vault_search_sharded(
        qq, v, rv, mesh=mesh, top_k=K, vault_scale=s,
        caption_text_emb=c, vault_text_emb=t, vault_text_scale=ts))(
            put(q, P("data", None)), put(i4.packed, P("data", None)),
            put(valid, P("data")), put(i4.scale, P("data")),
            put(cap, P("data", None)), put(t4.packed, P("data", None)),
            put(t4.scale, P("data")))

    np.testing.assert_array_equal(np.asarray(sharded.top_idx),
                                  np.asarray(exact.top_idx))
    np.testing.assert_allclose(np.asarray(sharded.top_sims),
                               np.asarray(exact.top_sims), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.text_similarity),
                               np.asarray(exact.text_similarity), atol=1e-5)


def test_int4_ivf_mutually_exclusive():
    with pytest.raises(ValueError, match="exclusive"):
        vault_search(jnp.asarray(_rows(2, 512)), jnp.zeros((8, 256), jnp.uint8),
                     jnp.ones((8,), bool), vault_scale=jnp.zeros((8,)),
                     ivf={"ivf_centroids": None, "ivf_lists": None,
                          "ivf_spill": None})


def test_engine_vault_dtype_int4(tmp_path, monkeypatch):
    """MISINFO_TPU_VAULT_DTYPE=int4 end-to-end: padded device arrays,
    int8 title embeddings, analyze() still returns real matches, and the
    IVF combination is refused."""
    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.forensics import MisinfoForensics
    from misinfo_tpu.models.detector import DetectorConfig

    det = DetectorConfig.tiny()
    d = det.clip.projection_dim
    rng = np.random.default_rng(11)
    emb = rng.normal(size=(30, d)).astype(np.float32)
    meta = [{"title": f"t{i}", "url": "u", "date": "d"} for i in range(30)]
    vp = str(tmp_path / "vault.npz")
    TruthVault(emb, meta, emb.copy()).save(vp)

    monkeypatch.setenv("MISINFO_TPU_VAULT_DTYPE", "int4")
    cfg = ForensicsConfig.from_env(verbose=False)
    assert cfg.serving.vault_dtype == "int4"
    cfg = cfg.replace(
        paths=dataclasses.replace(cfg.paths, vault_path=vp),
        seq=cfg.seq.__class__(roberta_max_len=32, image_size=64))
    eng = MisinfoForensics(config=cfg, det_cfg=det)
    dev = eng._vault_device
    assert dev["vault_emb"].dtype == jnp.uint8
    assert dev["vault_emb"].shape == (INT4_TILE_ROWS, d // 2)
    assert dev["vault_scale"].shape == (INT4_TILE_ROWS,)
    assert dev["vault_text_emb"].dtype == jnp.uint8          # packed titles
    assert dev["vault_text_emb"].shape == (INT4_TILE_ROWS, d // 2)
    assert dev["vault_text_scale"].shape == (INT4_TILE_ROWS,)
    assert not np.asarray(dev["vault_valid"])[30:].any()

    from PIL import Image
    img = tmp_path / "q.png"
    Image.fromarray(
        (rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(img)
    rep = eng.analyze(text="hello", image_path=str(img), verbose=False)
    assert isinstance(rep["vault_matches"], list)

    bad = cfg.replace(serving=dataclasses.replace(
        cfg.serving, vault_ivf=True))
    with pytest.raises(ValueError, match="exclusive"):
        MisinfoForensics(config=bad, det_cfg=det)
