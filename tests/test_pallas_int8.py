"""int8-MXU Pallas serving kernels (ops/pallas_int8.py), interpret mode.

Contract (new-kernel bar, CLAUDE.md): interpret-mode correctness vs the
XLA path before the real-TPU smoke/bench. Note on exactness: interpret
mode lowers f32 division to a reciprocal multiply, so the per-row scales
(`amax/127`, `x/sx`) can differ from the XLA path by 1 ulp — measured,
which occasionally flips a quantization level. The structural-exactness
test therefore uses an integer grid where every scale is exactly 1.0
(bitwise equality holds and any indexing/transpose bug is a loud
failure); gaussian-data tests are tight band tests against the XLA int8
chain and the f32 reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from misinfo_tpu.ops.common import DEFAULT_POLICY, Policy
from misinfo_tpu.ops.pallas_int8 import (
    dense_kernel_enabled, ffn_kernel_enabled, int8_dense_pallas,
    int8_ffn_pallas, int8_ffn_xla, quant_mode)
from misinfo_tpu.ops.quant import dense_int8, quantize_dense


def _mk_dense(rng, k, n, scale=0.02, bias=True):
    p = {"kernel": jnp.asarray(rng.normal(size=(k, n)) * scale, jnp.float32)}
    if bias:
        p["bias"] = jnp.asarray(rng.normal(size=(n,)) * 0.01, jnp.float32)
    return p


def _int_dense(rng, k, n):
    """Integer-valued params whose quantization scales are exactly 1.0
    (per-channel max forced to 127)."""
    w = rng.integers(-126, 127, (k, n)).astype(np.float32)
    w[0, :] = 127.0
    return quantize_dense({
        "kernel": jnp.asarray(w),
        "bias": jnp.asarray(rng.integers(-50, 50, (n,)), jnp.float32)})


def test_dense_kernel_exact_on_integer_grid():
    """x rows and weight columns with abs-max exactly 127 ⇒ every scale is
    1.0 and both paths compute pure integer arithmetic — bitwise equality
    catches any indexing/tiling/epilogue bug."""
    rng = np.random.default_rng(0)
    p = _int_dense(rng, 256, 384)
    xi = rng.integers(-126, 127, (40, 256)).astype(np.float32)
    xi[:, 0] = 127.0
    x = jnp.asarray(xi, jnp.float32)   # ints ≤127 are exact in f32 AND bf16?
    y_xla = dense_int8(p, x, jnp.float32)
    y_pl = int8_dense_pallas(x, p["kernel_q"], p["w_scale"], p["bias"],
                             out_dtype=jnp.float32, interpret=True)
    np.testing.assert_array_equal(np.asarray(y_pl), np.asarray(y_xla))
    # and the arithmetic really was exact: compare against int64 numpy
    ref = xi.astype(np.int64) @ np.asarray(p["kernel_q"], np.int64) \
        + np.asarray(p["bias"], np.int64)
    np.testing.assert_array_equal(np.asarray(y_pl, np.int64), ref)


def test_dense_kernel_tracks_xla_band():
    rng = np.random.default_rng(1)
    p = quantize_dense(_mk_dense(rng, 256, 384))
    x = jnp.asarray(rng.normal(size=(40, 256)), jnp.bfloat16)  # M pads to 64
    y_xla = dense_int8(p, x, jnp.float32)
    y_pl = int8_dense_pallas(x, p["kernel_q"], p["w_scale"], p["bias"],
                             out_dtype=jnp.float32, interpret=True)
    # 1-ulp scale lowering differences flip at most a quant level
    level = float(jnp.max(jnp.abs(y_xla))) / 127.0
    assert float(jnp.max(jnp.abs(y_pl - y_xla))) < 2 * level


def test_dense_kernel_no_bias_and_3d_input():
    rng = np.random.default_rng(2)
    p = quantize_dense(_mk_dense(rng, 128, 256, bias=False))
    x = jnp.asarray(rng.normal(size=(3, 17, 128)), jnp.bfloat16)
    y_xla = dense_int8(p, x, jnp.bfloat16).astype(jnp.float32)
    y_pl = int8_dense_pallas(x, p["kernel_q"], p["w_scale"], None,
                             out_dtype=jnp.bfloat16,
                             interpret=True).astype(jnp.float32)
    assert y_pl.shape == (3, 17, 256)
    level = float(jnp.max(jnp.abs(y_xla))) / 127.0
    assert float(jnp.max(jnp.abs(y_pl - y_xla))) < 2 * level


@pytest.mark.parametrize("mode", ["tanh", "erf", "quick"])
def test_ffn_kernel_single_chunk_tracks_xla_chain(mode):
    rng = np.random.default_rng(3)
    p_in = quantize_dense(_mk_dense(rng, 128, 256))
    p_out = quantize_dense(_mk_dense(rng, 256, 128))
    x = jnp.asarray(rng.normal(size=(24, 128)), jnp.bfloat16)
    y_xla = int8_ffn_xla(p_in, p_out, x, DEFAULT_POLICY,
                         mode).astype(jnp.float32)
    y_pl = int8_ffn_pallas(
        x, p_in["kernel_q"], p_in["w_scale"], p_in["bias"],
        p_out["kernel_q"], p_out["w_scale"], p_out["bias"],
        mode=mode, out_dtype=jnp.bfloat16, interpret=True,
        jc=256).astype(jnp.float32)
    level = float(jnp.max(jnp.abs(y_xla))) / 127.0
    assert float(jnp.max(jnp.abs(y_pl - y_xla))) < 3 * level


def test_ffn_kernel_chunked_tracks_f32_reference():
    """Chunked activation quantization (the serving configuration) stays
    within int8 noise of the unquantized f32 FFN — and close to the XLA
    chain (finer per-(token, chunk) scale granularity can only help)."""
    rng = np.random.default_rng(4)
    d_in = _mk_dense(rng, 128, 512)
    d_out = _mk_dense(rng, 512, 128)
    p_in, p_out = quantize_dense(d_in), quantize_dense(d_out)
    x = jnp.asarray(rng.normal(size=(32, 128)), jnp.bfloat16)

    xf = x.astype(jnp.float32)
    h = xf @ d_in["kernel"] + d_in["bias"]
    g = jax.nn.gelu(h, approximate=True)
    y_ref = g @ d_out["kernel"] + d_out["bias"]

    y_pl = int8_ffn_pallas(
        x, p_in["kernel_q"], p_in["w_scale"], p_in["bias"],
        p_out["kernel_q"], p_out["w_scale"], p_out["bias"],
        mode="tanh", out_dtype=jnp.float32, interpret=True, jc=128)
    scale = float(jnp.max(jnp.abs(y_ref)))
    rel = float(jnp.max(jnp.abs(y_pl - y_ref))) / scale
    assert rel < 0.02, rel

    y_xla = int8_ffn_xla(p_in, p_out, x, Policy(), "tanh").astype(jnp.float32)
    rel_xla = float(jnp.max(jnp.abs(y_xla - y_ref))) / scale
    assert rel <= rel_xla * 1.5 + 1e-3, (rel, rel_xla)


def test_ffn_kernel_row_padding():
    """M not a multiple of the row tile: padded rows are sliced off and do
    not perturb real rows (per-row scales are independent)."""
    rng = np.random.default_rng(5)
    p_in = quantize_dense(_mk_dense(rng, 128, 128))
    p_out = quantize_dense(_mk_dense(rng, 128, 128))
    x = jnp.asarray(rng.normal(size=(7, 128)), jnp.bfloat16)
    y7 = int8_ffn_pallas(
        x, p_in["kernel_q"], p_in["w_scale"], p_in["bias"],
        p_out["kernel_q"], p_out["w_scale"], p_out["bias"],
        mode="tanh", out_dtype=jnp.float32, interpret=True, jc=128)
    assert y7.shape == (7, 128)
    y_xla = int8_ffn_xla(p_in, p_out, x, DEFAULT_POLICY,
                         "tanh").astype(jnp.float32)
    level = float(jnp.max(jnp.abs(y_xla))) / 127.0
    assert float(jnp.max(jnp.abs(y7 - y_xla))) < 3 * level


def test_quant_mode_resolution(monkeypatch):
    """Env overrides policy; 'auto' is off on the CPU backend (tests run
    CPU-only, conftest) so existing XLA int8 behavior is unchanged."""
    pol = Policy()
    monkeypatch.delenv("MISINFO_TPU_INT8_PALLAS", raising=False)
    assert pol.quant_pallas == "auto"
    assert quant_mode(pol) == "off"          # CPU backend
    monkeypatch.setenv("MISINFO_TPU_INT8_PALLAS", "ffn")
    assert quant_mode(pol) == "ffn"
    assert ffn_kernel_enabled(pol) and not dense_kernel_enabled(pol)
    monkeypatch.setenv("MISINFO_TPU_INT8_PALLAS", "all")
    assert ffn_kernel_enabled(pol) and dense_kernel_enabled(pol)
    monkeypatch.setenv("MISINFO_TPU_INT8_PALLAS", "off")
    assert not ffn_kernel_enabled(pol) and not dense_kernel_enabled(pol)
    pol2 = Policy()
    pol2.quant_pallas = "dense"
    monkeypatch.delenv("MISINFO_TPU_INT8_PALLAS", raising=False)
    assert quant_mode(pol2) == "dense"


def test_quantize_ffn_params_is_selective():
    """int8_ffn mode: only mlp_in/mlp_out pairs quantize; attention
    projections, heads, and non-paired dicts stay float."""
    import jax as _jax

    from misinfo_tpu.ops.common import dense_init
    from misinfo_tpu.ops.quant import quantize_ffn_params

    key = _jax.random.PRNGKey(0)
    tree = {
        "layers": [{
            "attn": {"q": dense_init(key, 768, 768)},
            "mlp_in": dense_init(key, 768, 3072),
            "mlp_out": dense_init(key, 3072, 768),
        }],
        "mlp_in": dense_init(key, 768, 3072),   # no mlp_out sibling → skip
        "head": {"fc1": dense_init(key, 768, 256)},
    }
    q = quantize_ffn_params(tree)
    blk = q["layers"][0]
    assert "kernel_q" in blk["mlp_in"] and "kernel_q" in blk["mlp_out"]
    assert "kernel" in blk["attn"]["q"]
    assert "kernel" in q["mlp_in"]              # unpaired: untouched
    assert "kernel" in q["head"]["fc1"]


def test_int8_ffn_mode_scores_drift_bounded():
    """quant="int8_ffn" end-to-end through optimize_for_serving on a tiny
    detector: FFN-only quantization drifts scores less than the full-int8
    mode bound (0.15, test_quant.py)."""
    import jax as _jax

    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.signals import signals_program
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.ops.quant import quantize_ffn_params
    from misinfo_tpu.ops.serving import optimize_for_serving

    det_cfg = DetectorConfig.tiny()
    cfg = ForensicsConfig(verbose=False)
    params = detector_init(_jax.random.PRNGKey(0), det_cfg)
    policy = Policy(cfg.precision)
    params_q = quantize_ffn_params(params, min_elems=1)

    rng = np.random.default_rng(7)
    B, S, C = 2, 16, 16
    batch = {
        "roberta_ids": jnp.asarray(rng.integers(3, 900, (B, S)), jnp.int32),
        "roberta_mask": jnp.ones((B, S), jnp.int32),
        "clip_ids": jnp.asarray(rng.integers(1, 500, (B, C)), jnp.int32),
        "clip_mask": jnp.ones((B, C), jnp.int32),
    }
    out = signals_program(params, batch, variant="text_only",
                          det_cfg=det_cfg, cfg=cfg, policy=policy)
    out_q = signals_program(params_q, batch, variant="text_only",
                            det_cfg=det_cfg, cfg=cfg, policy=policy)
    for name in ("ai_score", "misinfo_score"):
        a = np.asarray(getattr(out, name), np.float32)
        b = np.asarray(getattr(out_q, name), np.float32)
        assert np.all(np.abs(a - b) < 0.1), (name, a, b)
    # optimize_for_serving plumbs the mode
    pq = optimize_for_serving(params, policy, quant="int8_ffn")
    flat = _jax.tree_util.tree_leaves(pq)
    assert any(getattr(x, "dtype", None) == jnp.int8 for x in flat) or \
        det_cfg.roberta.intermediate_size * det_cfg.roberta.hidden_size < \
        262_144  # tiny kernels sit below the size gate


def test_tower_int8_route_on_cpu_falls_back_to_xla_chain():
    """roberta_encode with quantized FFN params on CPU routes through
    int8_ffn_apply → XLA chain and stays finite/shaped."""
    from misinfo_tpu.models.roberta import (
        RobertaConfig, roberta_encode, roberta_init)
    from misinfo_tpu.ops.quant import quantize_params

    cfg = RobertaConfig.tiny()
    params = roberta_init(jax.random.PRNGKey(0), cfg)
    params_q = quantize_params(params, min_elems=1)
    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.integers(3, 900, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    h = roberta_encode(params_q, ids, mask, cfg, DEFAULT_POLICY)
    assert h.shape == (2, 16, cfg.hidden_size)
    assert np.all(np.isfinite(np.asarray(h, np.float32)))


def test_resolve_quant_auto():
    """quant="auto" (the serving default): int8_ffn only on a single-chip
    real-TPU bf16 deployment; none on CPU, in f32 parity mode, and under
    a mesh (this test runs on the CPU backend → none)."""
    from misinfo_tpu.core.config import PrecisionConfig
    from misinfo_tpu.ops.serving import resolve_quant

    assert resolve_quant("auto", Policy()) == "none"           # CPU backend
    assert resolve_quant("auto", Policy(PrecisionConfig.highest())) == "none"
    assert resolve_quant("auto", Policy(), mesh=object()) == "none"
    assert resolve_quant("int8_ffn", Policy()) == "int8_ffn"   # explicit wins
    assert resolve_quant("none", Policy()) == "none"


def test_quant_env_override(monkeypatch):
    from misinfo_tpu.core.config import ForensicsConfig

    monkeypatch.setenv("MISINFO_TPU_QUANT", "none")
    assert ForensicsConfig.from_env().precision.quant == "none"
    monkeypatch.setenv("MISINFO_TPU_QUANT", "int8_ffn")
    assert ForensicsConfig.from_env().precision.quant == "int8_ffn"
    monkeypatch.delenv("MISINFO_TPU_QUANT")
    assert ForensicsConfig.from_env().precision.quant == "auto"
