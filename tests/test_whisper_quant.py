"""int8 streaming decode (WhisperDecodeConfig.quant="int8"): transform
structure, quantization-error bounds on the step logits, and composition
refusals. The decode loop's per-step HBM stream (dense kernels + the [V, D]
logits embedding + the cross-attention K/V caches) halves under this mode —
docs/PERF.md records the measured throughput; these tests pin the math.
End-to-end token fidelity on a TRAINED model lives in
tests/test_transcript_e2e.py::test_quant_streaming_decode_token_fidelity.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from misinfo_tpu.core.config import PrecisionConfig
from misinfo_tpu.models.whisper import (
    WhisperConfig, _cached_decoder_step, decode_transcript,
    fuse_whisper_decoder_qkv, init_kv_cache, whisper_init,
)
from misinfo_tpu.ops.common import Policy
from misinfo_tpu.ops.serving import quantize_whisper_decoder

F32 = Policy(PrecisionConfig.highest())
TINY = WhisperConfig.tiny()


def _tiny_setup(seed=0, batch=2):
    params = whisper_init(jax.random.PRNGKey(seed), TINY)
    rng = np.random.default_rng(seed)
    enc_out = jnp.asarray(rng.standard_normal(
        (batch, TINY.max_source_positions, TINY.d_model)).astype(np.float32))
    token = jnp.asarray(rng.integers(0, TINY.vocab_size, batch), jnp.int32)
    return params, enc_out, token


def test_quantize_whisper_decoder_structure():
    params = quantize_whisper_decoder(
        fuse_whisper_decoder_qkv(whisper_init(jax.random.PRNGKey(0), TINY)))
    dec = params["decoder"]
    # embedding replaced by int8 plane + per-row scales
    assert "token_embedding" not in dec
    assert dec["token_embedding_q"].dtype == jnp.int8
    assert dec["emb_scale"].shape == (TINY.vocab_size,)
    for blk in dec["blocks"]:
        # in-loop weight streams are int8
        assert "kernel_q" in blk["self_attn"]["qkv"]
        assert "kernel_q" in blk["self_attn"]["o"]
        assert "kernel_q" in blk["cross_attn"]["q"]
        assert "kernel_q" in blk["cross_attn"]["o"]
        assert "kernel_q" in blk["mlp_in"]
        assert "kernel_q" in blk["mlp_out"]
        # cross k/v run ONCE per utterance (init_kv_cache) — stay exact
        assert "kernel" in blk["cross_attn"]["k"]
        assert "kernel" in blk["cross_attn"]["v"]
        # LayerNorms untouched
        assert blk["ln1"]["scale"].dtype != jnp.int8
    # encoder untouched (runs once per utterance)
    flat = jax.tree_util.tree_leaves(params["encoder"])
    assert all(l.dtype != jnp.int8 for l in flat)
    # idempotent
    again = quantize_whisper_decoder(params)
    assert again["decoder"]["token_embedding_q"] is dec["token_embedding_q"]


def test_quant_cross_cache_logits_close_to_exact():
    """Cache-only quantization (exact params): step logits within ~1% of
    the f32 path — isolates the int8 cross-K/V + probs error."""
    params, enc_out, token = _tiny_setup()
    exact = init_kv_cache(params, enc_out, 8, TINY, F32)
    quant = init_kv_cache(params, enc_out, 8, TINY, F32, quant=True)
    assert quant["cross_k"][0].dtype == jnp.int8
    assert quant["cross_k_scale"][0].shape == enc_out.shape[:2][:1] + (
        TINY.num_heads, TINY.max_source_positions)
    l0, _ = _cached_decoder_step(params, token, jnp.int32(0), enc_out,
                                 exact, TINY, F32)
    l1, _ = _cached_decoder_step(params, token, jnp.int32(0), enc_out,
                                 quant, TINY, F32)
    scale = float(jnp.max(jnp.abs(l0)))
    assert float(jnp.max(jnp.abs(l1 - l0))) < 0.02 * scale


def test_quant_params_logits_close_to_exact():
    """Full mode (int8 weights + embedding + caches): step logits within a
    few % — weight, activation, embedding and cache errors compound."""
    params, enc_out, token = _tiny_setup(seed=1)
    qparams = quantize_whisper_decoder(fuse_whisper_decoder_qkv(params))
    exact = init_kv_cache(params, enc_out, 8, TINY, F32)
    quant = init_kv_cache(qparams, enc_out, 8, TINY, F32, quant=True)
    l0, _ = _cached_decoder_step(fuse_whisper_decoder_qkv(params), token,
                                 jnp.int32(0), enc_out, exact, TINY, F32)
    l1, _ = _cached_decoder_step(qparams, token, jnp.int32(0), enc_out,
                                 quant, TINY, F32)
    scale = float(jnp.max(jnp.abs(l0)))
    assert float(jnp.max(jnp.abs(l1 - l0))) < 0.06 * scale
    # and the full decode loop runs under jit in both greedy/sampled forms
    toks, lp = jax.jit(lambda p, e: decode_transcript(
        p, None, TINY, F32, max_len=6, enc_out=e, quant=True))(qparams,
                                                               enc_out)
    assert toks.shape == (2, 6) and lp.shape == (2,)
    toks_s, _ = decode_transcript(qparams, None, TINY, F32, max_len=6,
                                  enc_out=enc_out, temperature=0.7,
                                  rng=jax.random.PRNGKey(0), quant=True)
    assert toks_s.shape == (2, 6)


def test_quant_composition_refusals():
    params, enc_out, _ = _tiny_setup()
    with pytest.raises(ValueError, match="scan_layers"):
        decode_transcript(params, None, TINY, F32, max_len=4,
                          enc_out=enc_out, quant=True, scan_layers=True)
    # int8 CACHE streaming still refuses the pallas kernels (they read
    # bf16 merged caches); int8 WEIGHTS now compose (quant="kernels")
    with pytest.raises(ValueError, match="unrolled step"):
        decode_transcript(params, None, TINY, F32, max_len=4,
                          enc_out=enc_out, quant=True, pallas_cross=True)
    qparams = quantize_whisper_decoder(fuse_whisper_decoder_qkv(params))
    with pytest.raises(ValueError, match="pallas_cross"):
        decode_transcript(qparams, None, TINY, F32, max_len=4,
                          enc_out=enc_out, pallas_ffn=True)
    with pytest.raises(ValueError, match="AFTER"):
        fuse_whisper_decoder_qkv(quantize_whisper_decoder(
            whisper_init(jax.random.PRNGKey(0), TINY)))
    with pytest.raises(ValueError, match="unstacked"):
        init_kv_cache(params, enc_out, 4, TINY, F32, merged_self=True,
                      quant=True)
