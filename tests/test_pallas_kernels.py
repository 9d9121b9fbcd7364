"""Pallas kernel correctness vs the XLA reference path (interpret mode on
the CPU backend; the same kernels compile natively on TPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _qkv(B=2, S=16, H=4, D=32, S_kv=None, seed=0):
    rng = np.random.default_rng(seed)
    S_kv = S_kv or S
    q = rng.normal(size=(B, S, H, D)).astype(np.float32)
    k = rng.normal(size=(B, S_kv, H, D)).astype(np.float32)
    v = rng.normal(size=(B, S_kv, H, D)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def _reference(q, k, v, mask=None, causal=False):
    D = q.shape[-1]
    scores = jnp.einsum("bshd,bthd->bhst", q, k,
                        precision=jax.lax.Precision.HIGHEST) / np.sqrt(D)
    if mask is not None:
        scores = scores + (1.0 - mask[:, None, None, :]) * -1e9
    if causal:
        S, S_kv = scores.shape[-2:]
        cm = np.tril(np.ones((S, S_kv), np.float32))
        scores = scores + (1.0 - cm)[None, None] * -1e9
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bthd->bshd", probs, v,
                      precision=jax.lax.Precision.HIGHEST)


def test_fused_attention_plain():
    from misinfo_tpu.ops.pallas_attention import fused_attention

    q, k, v = _qkv()
    out = fused_attention(q, k, v)
    ref = _reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_padding_mask():
    from misinfo_tpu.ops.pallas_attention import fused_attention

    q, k, v = _qkv(seed=1)
    mask = np.ones((2, 16), np.float32)
    mask[0, 10:] = 0
    mask[1, 5:] = 0
    out = fused_attention(q, k, v, mask=jnp.asarray(mask))
    ref = _reference(q, k, v, mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_causal():
    from misinfo_tpu.ops.pallas_attention import fused_attention

    q, k, v = _qkv(seed=2)
    out = fused_attention(q, k, v, causal=True)
    ref = _reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_layer_norm():
    from misinfo_tpu.ops.pallas_attention import fused_layer_norm

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 16, 64)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    out = fused_layer_norm(x, scale, bias)
    xf = np.asarray(x)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    ref = (xf - mean) / np.sqrt(var + 1e-5) * np.asarray(scale) + np.asarray(bias)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def _ffn_ref(x, w1, b1, w2, b2, policy, mode):
    from misinfo_tpu.ops import common

    if mode == "quick":
        h = common.quick_gelu(common.dense({"kernel": w1, "bias": b1}, x, policy))
    else:
        h = common.dense({"kernel": w1, "bias": b1}, x, policy)
        h = jax.nn.gelu(h.astype(jnp.float32),
                        approximate=(mode == "tanh")).astype(h.dtype)
    return common.dense({"kernel": w2, "bias": b2}, h, policy)


def _ffn_operands(M=12, K=64, N=128, K2=64, seed=4, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), dtype=dtype)
    w1 = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.1, dtype=dtype)
    b1 = jnp.asarray(rng.normal(size=(N,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(N, K2)).astype(np.float32) * 0.1, dtype=dtype)
    b2 = jnp.asarray(rng.normal(size=(K2,)).astype(np.float32) * 0.1)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("mode", ["erf", "tanh", "quick"])
def test_fused_ffn_f32(mode):
    from misinfo_tpu.ops.common import F32_POLICY
    from misinfo_tpu.ops.pallas_ffn import fused_ffn

    x, w1, b1, w2, b2 = _ffn_operands()
    out = fused_ffn(x, w1, b1, w2, b2, mode=mode)
    ref = _ffn_ref(x, w1, b1, w2, b2, F32_POLICY, mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-5)


def test_fused_ffn_bf16_matches_xla_bf16():
    from misinfo_tpu.ops.common import DEFAULT_POLICY
    from misinfo_tpu.ops.pallas_ffn import ffn_apply

    x, w1, b1, w2, b2 = _ffn_operands(seed=5)
    p_in = {"kernel": w1, "bias": b1}
    p_out = {"kernel": w2, "bias": b2}
    xb = x.astype(jnp.bfloat16)
    out = ffn_apply(p_in, p_out, xb, policy=DEFAULT_POLICY, mode="tanh")
    # same composed math through the XLA helpers at the same dtypes
    ref = _ffn_ref(xb, w1.astype(jnp.bfloat16), b1, w2.astype(jnp.bfloat16),
                   b2, DEFAULT_POLICY, "tanh")
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_fused_ffn_row_padding_and_3d():
    """Odd row counts pad to the tile size; leading dims are flattened."""
    from misinfo_tpu.ops.pallas_ffn import fused_ffn
    from misinfo_tpu.ops.common import F32_POLICY

    x, w1, b1, w2, b2 = _ffn_operands(M=9, seed=6)
    x3 = x.reshape(3, 3, -1)
    out = fused_ffn(x3, w1, b1, w2, b2, mode="erf")
    ref = _ffn_ref(x, w1, b1, w2, b2, F32_POLICY, "erf").reshape(3, 3, -1)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-5)


def test_roberta_ffn_mode_matches_xla_path():
    """use_pallas='ffn' leaves encoder outputs unchanged (f32, tiny cfg)."""
    from misinfo_tpu.models.roberta import (RobertaConfig, roberta_encode,
                                            roberta_init)
    from misinfo_tpu.ops.common import F32_POLICY

    cfg = RobertaConfig.tiny()
    params = roberta_init(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(7).integers(
        2, cfg.vocab_size, size=(2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    base = roberta_encode(params, ids, mask, cfg, F32_POLICY)
    fused = roberta_encode(params, ids, mask, cfg, F32_POLICY,
                           use_pallas="ffn")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=5e-5, rtol=1e-4)
