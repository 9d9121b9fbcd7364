"""int8 quantized serving path (ops/quant.py).

Covers: per-channel weight quantization error bounds, dense() dispatch on
quantized pytrees, selective quantization (big kernels only), and
end-to-end score drift of a quantized tiny detector vs its bf16 serving
baseline. The quant mode is an opt-in production-serving extension with no
reference counterpart (the reference serves f32 torch,
misinfo_forensics.py:127), so the contract is bounded drift — not parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from misinfo_tpu.ops.common import DEFAULT_POLICY, dense, dense_init
from misinfo_tpu.ops.quant import (
    MIN_KERNEL_ELEMS, dense_int8, quantize_dense, quantize_params)


def test_quantize_dense_roundtrip_error():
    rng = np.random.default_rng(0)
    p = {"kernel": jnp.asarray(rng.normal(size=(768, 768)), jnp.float32),
         "bias": jnp.asarray(rng.normal(size=(768,)), jnp.float32)}
    q = quantize_dense(p)
    assert q["kernel_q"].dtype == jnp.int8
    deq = q["kernel_q"].astype(jnp.float32) * q["w_scale"]
    # symmetric per-channel int8: max error ≤ scale/2 per element
    err = jnp.abs(deq - p["kernel"])
    assert float(jnp.max(err - q["w_scale"] / 2)) <= 1e-6


def test_dense_int8_matches_f32_within_tolerance():
    rng = np.random.default_rng(1)
    p = {"kernel": jnp.asarray(rng.normal(size=(768, 3072)) * 0.02, jnp.float32),
         "bias": jnp.asarray(rng.normal(size=(3072,)) * 0.01, jnp.float32)}
    x = jnp.asarray(rng.normal(size=(4, 768)), jnp.float32)
    y_ref = x @ p["kernel"] + p["bias"]
    y_q = dense_int8(quantize_dense(p), x, jnp.float32)
    rel = float(jnp.max(jnp.abs(y_q - y_ref)) / jnp.max(jnp.abs(y_ref)))
    assert rel < 0.02, rel


def test_dense_dispatches_on_quantized_params():
    rng = np.random.default_rng(2)
    p = dense_init(jax.random.PRNGKey(0), 512, 512)
    x = jnp.asarray(rng.normal(size=(2, 512)), jnp.bfloat16)
    y_plain = dense(p, x, DEFAULT_POLICY)
    y_quant = dense(quantize_dense(p), x, DEFAULT_POLICY)
    assert y_quant.dtype == y_plain.dtype == jnp.bfloat16
    diff = float(jnp.max(jnp.abs(y_quant.astype(jnp.float32)
                                 - y_plain.astype(jnp.float32))))
    assert diff < 0.5  # bf16 + int8 quantization noise on N(0,1)·N(0,1/√512)


def test_quantize_params_is_selective_and_idempotent():
    key = jax.random.PRNGKey(0)
    tree = {
        "big": dense_init(key, 768, 3072),
        "small_head": dense_init(key, 768, 256),   # 196k < MIN_KERNEL_ELEMS
        "embeddings": {"word": jnp.zeros((1000, 64))},
        "layers": [{"attn": {"q": dense_init(key, 768, 768)}}],
    }
    q = quantize_params(tree)
    assert "kernel_q" in q["big"] and "kernel" not in q["big"]
    assert "kernel" in q["small_head"]            # left unquantized
    assert q["embeddings"]["word"].dtype == jnp.float32
    assert "kernel_q" in q["layers"][0]["attn"]["q"]
    q2 = quantize_params(q)                       # idempotent
    assert q2["big"]["kernel_q"].dtype == jnp.int8
    assert 768 * 3072 >= MIN_KERNEL_ELEMS


def test_quantized_detector_scores_drift_bounded():
    """Tiny detector: full-variant signal program, quantized vs bf16."""
    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.signals import signals_program
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.ops.quant import quantize_params as qp

    det_cfg = DetectorConfig.tiny()
    cfg = ForensicsConfig(verbose=False)
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    # tiny kernels are all below MIN_KERNEL_ELEMS; force-quantize everything
    # 2-D to actually exercise the int8 path end-to-end
    params_q = qp(params, min_elems=1)

    rng = np.random.default_rng(0)
    B, S, C = 2, 16, 16
    vault = 64
    batch = {
        "roberta_ids": jnp.asarray(rng.integers(3, 900, (B, S)), jnp.int32),
        "roberta_mask": jnp.ones((B, S), jnp.int32),
        "clip_ids": jnp.asarray(rng.integers(1, 500, (B, C)), jnp.int32),
        "clip_mask": jnp.ones((B, C), jnp.int32),
        "image_effnet": jnp.asarray(rng.integers(0, 255, (B, 64, 64, 3)), jnp.uint8),
        "image_clip": jnp.asarray(rng.integers(0, 255, (B, 64, 64, 3)), jnp.uint8),
        "vault_emb": jnp.asarray(rng.normal(size=(vault, det_cfg.clip.projection_dim)),
                                 jnp.float32),
        "vault_valid": jnp.ones((vault,), jnp.bool_),
        "vault_text_emb": jnp.asarray(
            rng.normal(size=(vault, det_cfg.clip.projection_dim)), jnp.float32),
    }
    from misinfo_tpu.ops.common import Policy
    policy = Policy(cfg.precision)
    out = signals_program(params, batch, variant="full", det_cfg=det_cfg,
                          cfg=cfg, policy=policy)
    out_q = signals_program(params_q, batch, variant="full", det_cfg=det_cfg,
                            cfg=cfg, policy=policy)
    for name in ("ai_score", "misinfo_score", "deepfake_score",
                 "clip_similarity", "fake_probability"):
        a = np.asarray(getattr(out, name), np.float32)
        b = np.asarray(getattr(out_q, name), np.float32)
        assert np.all(np.abs(a - b) < 0.15), (name, a, b)
