"""Serving-time param transforms (ops/serving.py): fused QKV projection and
bf16 kernel storage must be exact-math / tolerance-neutral rewrites."""

import jax
import jax.numpy as jnp
import numpy as np

from misinfo_tpu.ops.attention import attention_init, multi_head_attention
from misinfo_tpu.ops.common import DEFAULT_POLICY, F32_POLICY
from misinfo_tpu.ops.serving import (
    cast_big_kernels, fuse_qkv_params, optimize_for_serving)


def test_fused_qkv_matches_unfused_f32():
    rng = np.random.default_rng(0)
    p = attention_init(jax.random.PRNGKey(0), 64, 4)
    pf = fuse_qkv_params({"attn": p})["attn"]
    assert "qkv" in pf and "q" not in pf
    x = jnp.asarray(rng.normal(size=(2, 16, 64)), jnp.float32)
    mask = jnp.asarray(rng.random((2, 16)) > 0.3, jnp.int32)
    y0 = multi_head_attention(p, x, 4, mask=mask, policy=F32_POLICY)
    y1 = multi_head_attention(pf, x, 4, mask=mask, policy=F32_POLICY)
    assert float(jnp.max(jnp.abs(y0 - y1))) < 1e-5


def test_fused_qkv_matches_unfused_bf16_serving():
    rng = np.random.default_rng(1)
    p = attention_init(jax.random.PRNGKey(1), 64, 4)
    pf = fuse_qkv_params(p)
    x = jnp.asarray(rng.normal(size=(2, 16, 64)), jnp.bfloat16)
    y0 = multi_head_attention(p, x, 4, policy=DEFAULT_POLICY)
    y1 = multi_head_attention(pf, x, 4, policy=DEFAULT_POLICY)
    # same math, but bf16 rounding of the concat matmul may differ by 1 ulp
    diff = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                 - y1.astype(jnp.float32))))
    assert diff < 2e-2, diff


def test_cast_big_kernels_selective():
    tree = {
        "big": {"kernel": jnp.zeros((768, 3072), jnp.float32),
                "bias": jnp.zeros((3072,), jnp.float32)},
        "small": {"kernel": jnp.zeros((64, 64), jnp.float32)},
        "emb": {"word": jnp.zeros((1000, 768), jnp.float32)},
    }
    out = cast_big_kernels(tree)
    assert out["big"]["kernel"].dtype == jnp.bfloat16
    assert out["big"]["bias"].dtype == jnp.float32     # biases stay f32
    assert out["small"]["kernel"].dtype == jnp.float32
    assert out["emb"]["word"].dtype == jnp.float32


def test_deoptimize_roundtrip():
    """fuse→deoptimize restores the canonical layout and values; bf16 cast
    and int8 quantization deoptimize to f32 within their rounding error."""
    from misinfo_tpu.ops.quant import quantize_dense
    from misinfo_tpu.ops.serving import deoptimize_params

    p = {"attn": attention_init(jax.random.PRNGKey(2), 64, 4)}
    rt = deoptimize_params(fuse_qkv_params(p))
    for name in ("q", "k", "v", "o"):
        np.testing.assert_allclose(rt["attn"][name]["kernel"],
                                   p["attn"][name]["kernel"], atol=1e-7)
        np.testing.assert_allclose(rt["attn"][name]["bias"],
                                   p["attn"][name]["bias"], atol=1e-7)
    big = {"kernel": jnp.asarray(
        np.random.default_rng(0).normal(size=(64, 64)) * 0.02, jnp.float32)}
    deq = deoptimize_params({"m": quantize_dense(big)})["m"]["kernel"]
    assert deq.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(deq - big["kernel"]))) < 2e-3
    casted = deoptimize_params({"m": {"kernel": big["kernel"].astype(jnp.bfloat16)}})
    assert casted["m"]["kernel"].dtype == jnp.float32
    # fused + quantized combo must dequantize before unfusing
    fq = fuse_qkv_params(p)
    fq["attn"]["qkv"] = quantize_dense({
        "kernel": fq["attn"]["qkv"]["kernel"],
        "bias": fq["attn"]["qkv"]["bias"]})
    rt2 = deoptimize_params(fq)
    assert set(rt2["attn"]) == {"q", "k", "v", "o"}
    np.testing.assert_allclose(rt2["attn"]["q"]["kernel"],
                               p["attn"]["q"]["kernel"], atol=2e-3)


def test_engine_native_checkpoint_load(tmp_path):
    """Train→serve loop: a checkpoint dir saved by the trainers loads into
    a fresh engine via ModelPaths.orbax_dir (takes precedence over .pth)."""
    from misinfo_tpu.checkpoints.io import save_checkpoint
    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.forensics import MisinfoForensics
    from misinfo_tpu.models.detector import DetectorConfig, detector_init

    det_cfg = DetectorConfig.tiny()
    trained = detector_init(jax.random.PRNGKey(7), det_cfg)
    ckpt_dir = str(tmp_path / "native_ckpt")
    save_checkpoint(ckpt_dir, trained, None, {"trainer": "test", "epoch": 3})

    cfg = ForensicsConfig(verbose=False)
    cfg = cfg.replace(paths=cfg.paths.__class__(
        **{**cfg.paths.__dict__, "orbax_dir": ckpt_dir}))
    eng = MisinfoForensics(config=cfg, det_cfg=det_cfg)
    assert eng.load_report["mode"] == "native"
    assert eng.load_report.get("epoch") == 3
    # fusion MLP is small → untouched by serving transforms; must match
    np.testing.assert_allclose(
        np.asarray(eng.params["fusion"]["fc1"]["kernel"], np.float32),
        np.asarray(trained["fusion"]["fc1"]["kernel"], np.float32))


def test_optimize_for_serving_full_detector_scores_stable():
    """Tiny detector through the full signal program: optimized params must
    reproduce the unoptimized serving scores (same policy) closely."""
    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.signals import signals_program
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.ops.common import Policy

    det_cfg = DetectorConfig.tiny()
    cfg = ForensicsConfig(verbose=False)
    policy = Policy(cfg.precision)
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    params_opt = optimize_for_serving(params, policy)

    rng = np.random.default_rng(0)
    B, S, C, vault = 2, 16, 16, 64
    batch = {
        "roberta_ids": jnp.asarray(rng.integers(3, 900, (B, S)), jnp.int32),
        "roberta_mask": jnp.ones((B, S), jnp.int32),
        "clip_ids": jnp.asarray(rng.integers(1, 500, (B, C)), jnp.int32),
        "clip_mask": jnp.ones((B, C), jnp.int32),
        "image_effnet": jnp.asarray(rng.integers(0, 255, (B, 64, 64, 3)), jnp.uint8),
        "image_clip": jnp.asarray(rng.integers(0, 255, (B, 64, 64, 3)), jnp.uint8),
        "vault_emb": jnp.asarray(
            rng.normal(size=(vault, det_cfg.clip.projection_dim)), jnp.float32),
        "vault_valid": jnp.ones((vault,), jnp.bool_),
        "vault_text_emb": jnp.asarray(
            rng.normal(size=(vault, det_cfg.clip.projection_dim)), jnp.float32),
    }
    out = signals_program(params, batch, variant="full", det_cfg=det_cfg,
                          cfg=cfg, policy=policy)
    out_o = signals_program(params_opt, batch, variant="full", det_cfg=det_cfg,
                            cfg=cfg, policy=policy)
    for name in ("ai_score", "misinfo_score", "deepfake_score",
                 "clip_similarity", "fake_probability"):
        a = np.asarray(getattr(out, name), np.float32)
        b = np.asarray(getattr(out_o, name), np.float32)
        assert np.all(np.abs(a - b) < 0.05), (name, a, b)
