"""Real-TPU smoke check for ops/pallas_int8.py (new-kernel bar, CLAUDE.md):
compiles both kernels at the serving shapes, checks them against the XLA
int8 chain within quantization-level bands, and prints standalone stage
timings (program-level numbers come from bench.py — only those decide
defaults, docs/PERF.md)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from misinfo_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from misinfo_tpu.ops.pallas_int8 import int8_dense_pallas, int8_ffn_pallas
    from misinfo_tpu.ops.quant import dense_int8, quantize_dense
    from misinfo_tpu.ops.common import Policy
    from misinfo_tpu.ops.pallas_int8 import int8_ffn_xla
    from misinfo_tpu.utils.timing import sync_fetch

    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    M, K, N = 16384, 768, 3072   # b32 × S=512 RoBERTa FFN shape

    d_in = {"kernel": jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(N,)) * 0.01, jnp.float32)}
    d_out = {"kernel": jnp.asarray(rng.normal(size=(N, K)) * 0.02, jnp.float32),
             "bias": jnp.asarray(rng.normal(size=(K,)) * 0.01, jnp.float32)}
    p_in, p_out = quantize_dense(d_in), quantize_dense(d_out)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)

    # --- dense kernel (projection shape [768,768])
    p_proj = quantize_dense({
        "kernel": jnp.asarray(rng.normal(size=(K, K)) * 0.02, jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(K,)) * 0.01, jnp.float32)})
    y_xla = dense_int8(p_proj, x, jnp.float32)
    y_pl = int8_dense_pallas(x, p_proj["kernel_q"], p_proj["w_scale"],
                             p_proj["bias"], out_dtype=jnp.float32)
    dx, dp = np.asarray(y_xla), np.asarray(y_pl)
    level = np.abs(dx).max() / 127.0
    print(f"dense: max|Δ| vs XLA = {np.abs(dx - dp).max():.6f} "
          f"(quant level {level:.6f})")
    assert np.abs(dx - dp).max() < 3 * level

    # --- ffn kernel
    pol = Policy()
    y_xla = int8_ffn_xla(p_in, p_out, x, pol, "tanh").astype(jnp.float32)
    y_pl = int8_ffn_pallas(
        x, p_in["kernel_q"], p_in["w_scale"], p_in["bias"],
        p_out["kernel_q"], p_out["w_scale"], p_out["bias"],
        mode="tanh", out_dtype=jnp.bfloat16).astype(jnp.float32)
    dx, dp = np.asarray(y_xla), np.asarray(y_pl)
    level = np.abs(dx).max() / 127.0
    print(f"ffn:   max|Δ| vs XLA chain = {np.abs(dx - dp).max():.6f} "
          f"(quant level {level:.6f})")
    assert np.abs(dx - dp).max() < 4 * level

    # --- standalone stage timings (informal; relay-amortized)
    def timeit(fn, iters=30):
        out = fn()
        sync_fetch(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync_fetch(out)
        return (time.perf_counter() - t0) / iters * 1e3

    from misinfo_tpu.ops.pallas_ffn import fused_ffn
    bf_in = {k: v.astype(jnp.bfloat16) for k, v in d_in.items()}
    bf_out = {k: v.astype(jnp.bfloat16) for k, v in d_out.items()}
    t_bf = timeit(lambda: fused_ffn(
        x, bf_in["kernel"], d_in["bias"], bf_out["kernel"], d_out["bias"],
        mode="tanh", precision=None))
    t_i8 = timeit(lambda: int8_ffn_pallas(
        x, p_in["kernel_q"], p_in["w_scale"], p_in["bias"],
        p_out["kernel_q"], p_out["w_scale"], p_out["bias"],
        mode="tanh", out_dtype=jnp.bfloat16))
    t_i8d = timeit(lambda: int8_dense_pallas(
        x, p_proj["kernel_q"], p_proj["w_scale"], p_proj["bias"],
        out_dtype=jnp.bfloat16))
    t_xla8 = timeit(lambda: dense_int8(p_proj, x, jnp.bfloat16))

    def bfd():
        # bf16 projection at the same [M, K]×[K, K] shape for the ratio
        return jnp.dot(x, d_in["kernel"][:, :K].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    t_bfd = timeit(bfd)
    print(f"FFN  [16384x768x3072x768]: pallas-bf16 {t_bf:.3f} ms | "
          f"pallas-int8 {t_i8:.3f} ms")
    print(f"proj [16384x768x768]:      xla-bf16 {t_bfd:.3f} ms | "
          f"xla-int8 {t_xla8:.3f} ms | pallas-int8 {t_i8d:.3f} ms")


if __name__ == "__main__":
    main()
