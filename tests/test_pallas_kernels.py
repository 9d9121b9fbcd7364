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
