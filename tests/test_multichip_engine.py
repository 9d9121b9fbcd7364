"""Engine-LEVEL mesh serving (VERDICT r1 #2): `MisinfoForensics(mesh=...)`
on the 8-virtual-device CPU mesh must match the single-device engine across
modality variants (text / full / video), and the row-sharded >HBM vault
path (vault/search.py vault_search_sharded) must equal the exact replicated
search through the real dispatch/bucketing/vault-prep machinery."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from misinfo_tpu.core.config import (
    ForensicsConfig, MeshConfig, PrecisionConfig,
)
from misinfo_tpu.core.mesh import make_mesh
from misinfo_tpu.engine.forensics import MisinfoForensics
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.vault.store import TruthVault

DET = DetectorConfig.tiny()
N_VAULT = 300  # pads to 384 rows — divisible by any power-of-two data axis


def _cfg(vault_path, precision=None, **serving_overrides):
    cfg = ForensicsConfig(verbose=False).replace(
        precision=precision or PrecisionConfig.highest())
    return cfg.replace(
        paths=cfg.paths.__class__(vault_path=vault_path),
        seq=cfg.seq.__class__(roberta_max_len=32,
                              image_size=DET.clip.image_size),
        serving=cfg.serving.__class__(**serving_overrides))


@pytest.fixture(scope="module")
def vault_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mesh_vault")
    rng = np.random.default_rng(7)
    d = DET.clip.projection_dim
    vault = TruthVault(
        image_embeddings=rng.normal(size=(N_VAULT, d)).astype(np.float32),
        metadata=[{"title": f"article {i}", "url": f"u{i}",
                   "date": "2024-01-01"} for i in range(N_VAULT)],
        text_embeddings=rng.normal(size=(N_VAULT, d)).astype(np.float32))
    p = str(tmp / "vault.npz")
    vault.save(p)
    return p


@pytest.fixture(scope="module")
def shared_params():
    return detector_init(jax.random.PRNGKey(0), DET)


def _img(seed):
    from PIL import Image
    rng = np.random.default_rng(seed)
    s = DET.clip.image_size
    return Image.fromarray(
        rng.integers(0, 255, size=(s, s, 3)).astype(np.uint8))


def _requests():
    return [
        {"text": "breaking news about a shocking event", "image": _img(1)},
        {"text": "just a plain text claim with no media"},
        {"image": _img(2)},
        {"text": "second caption for the second image", "image": _img(3)},
    ]


def _copy(tree):
    return jax.tree_util.tree_map(lambda x: x, tree)


def _assert_reports_match(a, b, atol=1e-4):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        for k in ("ai_score", "misinfo_score", "deepfake_score",
                  "clip_similarity", "vault_discrepancy", "fake_probability"):
            np.testing.assert_allclose(ra["scores"][k], rb["scores"][k],
                                       atol=atol, err_msg=k)
        assert ra["verdict"] == rb["verdict"]
        assert [m["title"] for m in ra["vault_matches"]] == \
            [m["title"] for m in rb["vault_matches"]]


@pytest.mark.parametrize("mesh_cfg", [MeshConfig(model=1),
                                      MeshConfig(model=2)])
def test_engine_mesh_matches_single_device(vault_path, shared_params,
                                           mesh_cfg):
    """The REAL engine constructed with a mesh — dispatch, bucketing,
    tokenization, vault prep and programs all under DP(+TP) sharding —
    equals the single-device engine on mixed-variant traffic."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    single = MisinfoForensics(config=_cfg(vault_path), det_cfg=DET,
                              params=_copy(shared_params))
    mesh = make_mesh(mesh_cfg)
    meshed = MisinfoForensics(config=_cfg(vault_path), det_cfg=DET,
                              params=_copy(shared_params), mesh=mesh)
    assert meshed._vault_sharded is False  # below the row threshold
    reqs = _requests()
    _assert_reports_match(single.analyze_batch(reqs),
                          meshed.analyze_batch(reqs))


def test_engine_sharded_vault_matches_exact(vault_path, shared_params):
    """vault_shard_min_rows below the vault size → the engine row-shards
    the vault and serves through vault_search_sharded; scores and match
    lists must equal the exact replicated engine."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    single = MisinfoForensics(config=_cfg(vault_path), det_cfg=DET,
                              params=_copy(shared_params))
    mesh = make_mesh(MeshConfig(model=1))   # data=8
    meshed = MisinfoForensics(
        config=_cfg(vault_path, vault_shard_min_rows=64), det_cfg=DET,
        params=_copy(shared_params), mesh=mesh)
    assert meshed._vault_sharded is True
    reqs = _requests()
    _assert_reports_match(single.analyze_batch(reqs),
                          meshed.analyze_batch(reqs))
    # per-signal convenience API rides the same sharded program
    sv = meshed.search_vault(_img(5))
    se = single.search_vault(_img(5))
    np.testing.assert_allclose(sv["vault_discrepancy"],
                               se["vault_discrepancy"], atol=1e-4)
    assert [m["title"] for m in sv["matches"]] == \
        [m["title"] for m in se["matches"]]


def test_engine_mesh_video_matches_single(vault_path, shared_params,
                                          tmp_path_factory):
    """Video variant under the mesh: frames-as-batch [V·F] shards across
    data; per-video mean/mean/max aggregation must match single-device."""
    cv2 = pytest.importorskip("cv2")
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    tmp = tmp_path_factory.mktemp("mesh_video")
    path = str(tmp / "clip.mp4")
    s = DET.clip.image_size
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (s, s))
    if not writer.isOpened():
        pytest.skip("no mp4 encoder available")
    rng = np.random.default_rng(0)
    for i in range(30):
        writer.write(rng.integers(0, 255, (s, s, 3)).astype(np.uint8))
    writer.release()

    def mk(mesh=None):
        cfg = _cfg(vault_path)
        cfg = cfg.replace(video=cfg.video.__class__(max_frames=4))
        return MisinfoForensics(config=cfg, det_cfg=DET,
                                params=_copy(shared_params), mesh=mesh)

    single = mk()
    meshed = mk(make_mesh(MeshConfig(model=2)))
    req = [{"text": "a caption about the clip", "video": path}]
    _assert_reports_match(single.analyze_batch(req),
                          meshed.analyze_batch(req))


def test_engine_sharded_vault_int8_combo(vault_path, shared_params):
    """Row sharding composes with the int8 capacity mode: 4× articles per
    chip per shard — the ~10M-articles/chip/shard story in docs/SCALING.md.
    int8 quantization error (~0.5-1% sims) means we compare the sharded
    int8 engine against the REPLICATED int8 engine (identical quantized
    rows), which must match exactly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(MeshConfig(model=1))
    int8_rep = MisinfoForensics(
        config=_cfg(vault_path, vault_dtype="int8"), det_cfg=DET,
        params=_copy(shared_params))
    int8_shard = MisinfoForensics(
        config=_cfg(vault_path, vault_dtype="int8", vault_shard_min_rows=64),
        det_cfg=DET, params=_copy(shared_params), mesh=mesh)
    assert int8_shard._vault_sharded
    assert int8_shard._vault_device["vault_emb"].dtype == jnp.int8
    reqs = [{"image": _img(7)}, {"image": _img(8)}]
    _assert_reports_match(int8_rep.analyze_batch(reqs),
                          int8_shard.analyze_batch(reqs))


def test_engine_sharded_vault_int4_combo(vault_path, shared_params):
    """Row sharding composes with the int4 capacity mode: ~25M articles
    per chip per shard (docs/SCALING.md). As with int8, quantization
    error means the sharded int4 engine is compared against the
    REPLICATED int4 engine (identical packed rows) — exact match.
    Shards stay INT4_TILE_ROWS-aligned (engine pads to tile × data)."""
    from misinfo_tpu.vault.int4 import INT4_TILE_ROWS

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(MeshConfig(model=1))
    rep = MisinfoForensics(
        config=_cfg(vault_path, vault_dtype="int4"), det_cfg=DET,
        params=_copy(shared_params))
    shard = MisinfoForensics(
        config=_cfg(vault_path, vault_dtype="int4", vault_shard_min_rows=64),
        det_cfg=DET, params=_copy(shared_params), mesh=mesh)
    assert shard._vault_sharded
    dev = shard._vault_device
    assert dev["vault_emb"].dtype == jnp.uint8
    assert dev["vault_emb"].shape[0] % (INT4_TILE_ROWS * 8) == 0
    assert dev["vault_scale"].shape == (dev["vault_emb"].shape[0],)
    reqs = [{"image": _img(7)}, {"image": _img(8)},
            {"text": "caption for the vault image", "image": _img(9)}]
    _assert_reports_match(rep.analyze_batch(reqs),
                          shard.analyze_batch(reqs))


def test_vault_search_sharded_function_equals_exact():
    """Direct function-level equality: row-sharded shard_map search vs the
    exact replicated vault_search on identical inputs."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from misinfo_tpu.vault.search import vault_search, vault_search_sharded

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(MeshConfig(model=1))
    rng = np.random.default_rng(3)
    N, D, B, K = 1024, 64, 8, 5
    emb = rng.normal(size=(N, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    temb = rng.normal(size=(N, D)).astype(np.float32)
    temb /= np.linalg.norm(temb, axis=1, keepdims=True)
    valid = np.arange(N) < 1000
    q = rng.normal(size=(B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    cap = rng.normal(size=(B, D)).astype(np.float32)
    cap /= np.linalg.norm(cap, axis=1, keepdims=True)

    exact = vault_search(jnp.asarray(q), jnp.asarray(emb), jnp.asarray(valid),
                         top_k=K, reuse_threshold=0.0,
                         caption_text_emb=jnp.asarray(cap),
                         vault_text_emb=jnp.asarray(temb))

    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    sharded = jax.jit(lambda qq, v, rv, c, t: vault_search_sharded(
        qq, v, rv, mesh=mesh, top_k=K, reuse_threshold=0.0,
        caption_text_emb=c, vault_text_emb=t))(
            put(jnp.asarray(q), P("data", None)),
            put(jnp.asarray(emb), P("data", None)),
            put(jnp.asarray(valid), P("data")),
            put(jnp.asarray(cap), P("data", None)),
            put(jnp.asarray(temb), P("data", None)))

    np.testing.assert_array_equal(np.asarray(sharded.top_idx),
                                  np.asarray(exact.top_idx))
    np.testing.assert_allclose(np.asarray(sharded.top_sims),
                               np.asarray(exact.top_sims), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.text_similarity),
                               np.asarray(exact.text_similarity), atol=1e-5)


# ---------------------------------------------------------------------------
# VERDICT r2 #1: mesh serving runs WITH the single-chip serving
# optimizations (serving-dtype kernel storage, int8 quant, packed text)
# ---------------------------------------------------------------------------


def _leaf_dtypes(tree):
    import jax.tree_util as jtu
    return {jtu.keystr(p): x.dtype
            for p, x in jtu.tree_flatten_with_path(tree)[0]}


@pytest.mark.parametrize("mesh_cfg", [MeshConfig(model=1),
                                      MeshConfig(model=2)])
def test_engine_mesh_packed_text_matches_single(vault_path, shared_params,
                                                mesh_cfg):
    """pack_text=True under a mesh: packed rows data-shard, the CLS
    extraction runs as the one-hot contraction (signals._text_branch
    mesh_gather), and scores equal the single-chip packed engine exactly
    (f32 parity mode)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    single = MisinfoForensics(config=_cfg(vault_path, pack_text=True),
                              det_cfg=DET, params=_copy(shared_params))
    meshed = MisinfoForensics(config=_cfg(vault_path, pack_text=True),
                              det_cfg=DET, params=_copy(shared_params),
                              mesh=make_mesh(mesh_cfg))
    reqs = [
        {"text": "a short claim"},
        {"text": "a much longer claim " * 20},
        {"text": "medium length text about some news event", "image": _img(4)},
        {"text": "another short one"},
        {"text": "fifth request with middling length text here"},
    ]
    _assert_reports_match(single.analyze_batch(reqs),
                          meshed.analyze_batch(reqs))


def test_engine_mesh_serving_dtype_matches_single(vault_path, shared_params):
    """Default (bf16 serving) precision under a mesh: big kernels are
    stored bf16 on every shard — byte-identical values to the single-chip
    serving pytree — and scores match the single-chip bf16 engine to
    within GSPMD reduction-order noise."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    bf16 = PrecisionConfig()
    single = MisinfoForensics(config=_cfg(vault_path, precision=bf16),
                              det_cfg=DET, params=_copy(shared_params))
    meshed = MisinfoForensics(
        config=_cfg(vault_path, precision=bf16, vault_shard_min_rows=64),
        det_cfg=DET, params=_copy(shared_params),
        mesh=make_mesh(MeshConfig(model=2)))
    assert meshed._vault_sharded is True
    # the serving-dtype transform applied before sharding: same dtypes
    # leaf-for-leaf as the single-chip serving pytree (the tiny model's
    # kernels sit below the cast size gate — the cast+shard composition
    # itself is asserted by test_cast_then_shard_composition below)
    assert _leaf_dtypes(meshed.params) == _leaf_dtypes(single.params)
    a = single.analyze_batch(_requests())
    b = meshed.analyze_batch(_requests())
    _assert_reports_match(a, b, atol=2e-2)


def test_cast_then_shard_composition():
    """cast_big_kernels → shard_params composition: bf16 storage survives
    TP placement, specs are the Megatron layout, and a sharded matmul
    equals the unsharded one."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from misinfo_tpu.ops.common import dense
    from misinfo_tpu.ops.serving import cast_big_kernels
    from misinfo_tpu.parallel.sharding import detector_pspecs, shard_params

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(MeshConfig(model=2))
    rng = np.random.default_rng(0)
    D, Dm = 64, 128
    mk = lambda i, o: {"kernel": jnp.asarray(
        rng.normal(size=(i, o)).astype(np.float32)),
        "bias": jnp.zeros((o,), jnp.float32)}
    tree = {"layers": [{"attn": {"q": mk(D, D), "k": mk(D, D),
                                 "v": mk(D, D), "o": mk(D, D)},
                        "mlp_in": mk(D, Dm), "mlp_out": mk(Dm, D)}]}
    cast = cast_big_kernels(tree, jnp.bfloat16, min_elems=1)
    specs = detector_pspecs(cast)
    lay = specs["layers"][0]
    assert lay["attn"]["q"]["kernel"] == P(None, "model")
    assert lay["attn"]["o"]["kernel"] == P("model", None)
    assert lay["mlp_in"]["kernel"] == P(None, "model")
    assert lay["mlp_out"]["kernel"] == P("model", None)
    sharded = shard_params(mesh, cast)
    q = sharded["layers"][0]["attn"]["q"]
    assert q["kernel"].dtype == jnp.bfloat16   # cast survives placement
    x = jnp.asarray(rng.normal(size=(8, D)).astype(np.float32))
    y_ref = np.asarray(dense(cast["layers"][0]["mlp_in"], x))
    y_tp = np.asarray(jax.jit(
        lambda p, xx: dense(p["layers"][0]["mlp_in"], xx))(sharded, x))
    np.testing.assert_allclose(y_tp, y_ref, atol=1e-5)


def test_int8_tp_sharding_composition():
    """quantize_params → shard_params composition (VERDICT r2 #1):
    kernel_q shards like kernel, w_scale like an output-dim bias, and the
    TP-sharded int8 matmul equals the unsharded one exactly (int32
    accumulation makes the contraction psum exact)."""
    from jax.sharding import PartitionSpec as P

    from misinfo_tpu.ops.common import dense
    from misinfo_tpu.ops.quant import quantize_params
    from misinfo_tpu.parallel.sharding import detector_pspecs, shard_params

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(MeshConfig(model=2))
    rng = np.random.default_rng(1)
    D, Dm = 64, 128
    mk = lambda i, o: {"kernel": jnp.asarray(
        rng.normal(size=(i, o)).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(size=(o,)).astype(np.float32))}
    tree = {"layers": [{"attn": {"q": mk(D, D), "k": mk(D, D),
                                 "v": mk(D, D), "o": mk(D, D)},
                        "mlp_in": mk(D, Dm), "mlp_out": mk(Dm, D)}]}
    q = quantize_params(tree, min_elems=1)
    lay_q = q["layers"][0]
    assert "kernel_q" in lay_q["attn"]["q"]
    specs = detector_pspecs(q)
    lay = specs["layers"][0]
    assert lay["attn"]["q"]["kernel_q"] == P(None, "model")
    assert lay["attn"]["q"]["w_scale"] == P("model")
    assert lay["attn"]["o"]["kernel_q"] == P("model", None)
    assert lay["attn"]["o"]["w_scale"] == P()
    assert lay["mlp_in"]["kernel_q"] == P(None, "model")
    assert lay["mlp_in"]["w_scale"] == P("model")
    assert lay["mlp_out"]["kernel_q"] == P("model", None)
    assert lay["mlp_out"]["w_scale"] == P()
    sharded = shard_params(mesh, q)
    x = jnp.asarray(rng.normal(size=(8, D)).astype(np.float32))
    for name in (("attn", "q"), ("attn", "o"), ("mlp_in",), ("mlp_out",)):
        pick = lambda t: (t["layers"][0][name[0]][name[1]]
                          if len(name) == 2 else t["layers"][0][name[0]])
        xx = x if pick(q)["kernel_q"].shape[0] == D else jnp.asarray(
            rng.normal(size=(8, Dm)).astype(np.float32))
        y_ref = np.asarray(dense(pick(q), xx))
        y_tp = np.asarray(jax.jit(
            lambda p, v, pk=pick: dense(pk(p), v))(sharded, xx))
        np.testing.assert_allclose(y_tp, y_ref, atol=1e-5, err_msg=str(name))


@pytest.mark.parametrize("d", [2, 4, 8])
def test_mesh_scaling_sweep_scores_and_vault_memory(vault_path,
                                                    shared_params, d):
    """VERDICT r2 #8: data=2/4/8 sweep — scores invariant across mesh
    widths, and per-device vault residency of the sharded planes scales
    as 1/D (docs/SCALING.md's '~linear in chips' shape-check)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    single = MisinfoForensics(config=_cfg(vault_path), det_cfg=DET,
                              params=_copy(shared_params))
    mesh = make_mesh(MeshConfig(data=d, model=1),
                     devices=jax.devices()[:d])
    meshed = MisinfoForensics(
        config=_cfg(vault_path, vault_shard_min_rows=64), det_cfg=DET,
        params=_copy(shared_params), mesh=mesh)
    assert meshed._vault_sharded is True
    _assert_reports_match(single.analyze_batch(_requests()),
                          meshed.analyze_batch(_requests()))
    rep = meshed.memory_report()
    # every vault plane row-shards, so device residency is global/D
    assert rep["vault_bytes_per_device"] * d == rep["vault_bytes"]
    assert rep["vault_sharded"] is True


def test_engine_mesh_auto_pack_engages_and_matches(vault_path,
                                                   shared_params):
    """pack_text='auto' under a mesh: heavily packable traffic (many short
    texts) must actually route to the packed program (rows rounded to the
    data axis) and score-match the single-device auto engine."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    single = MisinfoForensics(config=_cfg(vault_path, pack_text="auto"),
                              det_cfg=DET, params=_copy(shared_params))
    mesh = make_mesh(MeshConfig(data=2, model=1),
                     devices=jax.devices()[:2])
    meshed = MisinfoForensics(config=_cfg(vault_path, pack_text="auto"),
                              det_cfg=DET, params=_copy(shared_params),
                              mesh=mesh)
    reqs = [{"text": f"short {i}"} for i in range(16)]
    # the auto margin must fire for this traffic on BOTH engines: 16 short
    # texts pack into ≤4 rows ≤ 3/4 of the 16-bucket
    texts = [r["text"] for r in reqs]
    seqs, row_len = meshed._text_pack_plan(texts)
    _, rows = meshed._packed_rows_bucketed(seqs, row_len, 16)
    assert rows * 4 <= 16 * 3, "fixture traffic must trigger auto-pack"
    assert rows % 2 == 0, "packed rows must round to the data axis"
    _assert_reports_match(single.analyze_batch(reqs),
                          meshed.analyze_batch(reqs))
