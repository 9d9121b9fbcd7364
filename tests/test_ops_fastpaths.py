"""Serving-mode (bf16) compute paths vs parity-mode (f32) reference:
bf16 attention and single-pass LayerNorm variance must agree within bf16
tolerance. (A deferred-normalization attention variant was benchmarked and
rejected — see ops/attention.py.)"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from misinfo_tpu.core.config import PrecisionConfig
from misinfo_tpu.ops.attention import attention_init, multi_head_attention
from misinfo_tpu.ops.common import Policy, layer_norm, layer_norm_init

BF16 = Policy(PrecisionConfig())
F32 = Policy(PrecisionConfig.highest())


def test_bf16_attention_matches_f32():
    params = attention_init(jax.random.PRNGKey(0), 64, 4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 64)).astype(np.float32))
    mask = jnp.asarray(np.concatenate(
        [np.ones((2, 12)), np.zeros((2, 4))], 1).astype(np.int32))
    out_bf = np.asarray(multi_head_attention(
        params, x.astype(jnp.bfloat16), 4, mask=mask, policy=BF16)
    ).astype(np.float32)
    out_f32 = np.asarray(multi_head_attention(params, x, 4, mask=mask,
                                              policy=F32))
    assert np.abs(out_bf - out_f32).max() < 0.05


def test_bf16_attention_causal():
    params = attention_init(jax.random.PRNGKey(1), 64, 4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 12, 64)).astype(np.float32))
    out_bf = np.asarray(multi_head_attention(
        params, x.astype(jnp.bfloat16), 4, causal=True, policy=BF16)
    ).astype(np.float32)
    out_f32 = np.asarray(multi_head_attention(params, x, 4, causal=True,
                                              policy=F32))
    assert np.abs(out_bf - out_f32).max() < 0.05


def test_single_pass_layernorm_matches_two_pass():
    p = layer_norm_init(96)
    rng = np.random.default_rng(2)
    # include a large-mean input — the E[x²]−E[x]² form's weak spot
    x = jnp.asarray((rng.normal(size=(4, 8, 96)) * 2 + 10).astype(np.float32))
    y_bf = np.asarray(layer_norm(p, x.astype(jnp.bfloat16),
                                 policy=BF16)).astype(np.float32)
    y_f32 = np.asarray(layer_norm(p, x, policy=F32))
    assert np.abs(y_bf - y_f32).max() < 0.08
