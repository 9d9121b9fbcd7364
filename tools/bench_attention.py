"""Attention micro-benchmark at the RoBERTa serving shape (B=32, H=12,
S=512, D=64) — the profile in docs/PERF.md shows softmax materialization is
~37% of the full-program runtime, so this is the one op worth hand-tuning.

Variants:
  xla        — ops.attention einsum path (f32 scores materialized; default)
  xla_bf16   — bf16 score materialization (half the HBM traffic, lower acc)
  ours       — misinfo_tpu.ops.pallas_attention.fused_attention
  flash      — jax.experimental.pallas.ops.tpu.flash_attention (JAX's tuned
               TPU kernel; online softmax, no score materialization)

Run on TPU:  python tools/bench_attention.py
Prints one JSON line per variant; use to pick the serving default.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from misinfo_tpu.core.cache import enable_compilation_cache

B, H, S, D = 32, 12, 512, 64
ITERS = 50


def xla_attn(q, k, v, mask, score_dtype=jnp.float32):
    scale = 1.0 / np.sqrt(D)
    scores = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=score_dtype) * scale
    scores = scores + (1.0 - mask[:, None, None, :]).astype(score_dtype) * -1e9
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bthd->bshd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def ours_attn(q, k, v, mask):
    from misinfo_tpu.ops.pallas_attention import fused_attention
    return fused_attention(q, k, v, mask=mask)


def flash_attn(q, k, v, mask, block_sizes=None):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention, SegmentIds)
    # [B,S,H,D] -> [B,H,S,D]; valid tokens segment 1, pads segment 0 so
    # valid queries never attend to pad keys.
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    seg = SegmentIds(q=jnp.ones((B, S), jnp.int32),
                     kv=mask.astype(jnp.int32))
    out = flash_attention(qt, kt, vt, segment_ids=seg,
                          sm_scale=1.0 / np.sqrt(D), block_sizes=block_sizes)
    return out.transpose(0, 2, 1, 3)


def bench(name, fn, args, ref=None):
    f = jax.jit(fn)
    try:
        out = f(*args)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name, "error": str(e)[:200]}))
        return None
    # correctness gate: a kernel whose output diverges (or a stack that
    # silently elides execution) must not be trusted for timing
    maxdiff = (float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                     - ref.astype(jnp.float32))))
               if ref is not None else 0.0)
    from misinfo_tpu.utils.timing import sync_fetch
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = f(*args)
        sync_fetch(out)
        times.append((time.perf_counter() - t0) / ITERS * 1000.0)
    ms = min(times)
    print(json.dumps({"variant": name, "ms_per_call": round(ms, 3),
                      "equiv_layer12_ms": round(ms * 12, 2),
                      "maxdiff_vs_xla": round(maxdiff, 5)}), flush=True)
    return ms, out


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.float32)
    print(json.dumps({"device": str(jax.devices()[0]),
                      "shape": [B, H, S, D]}), flush=True)

    _, ref = bench("xla_f32",
                   functools.partial(xla_attn, score_dtype=jnp.float32),
                   (q, k, v, mask))
    bench("xla_bf16", functools.partial(xla_attn, score_dtype=jnp.bfloat16),
          (q, k, v, mask), ref)
    bench("ours", ours_attn, (q, k, v, mask), ref)
    bench("flash_default", flash_attn, (q, k, v, mask), ref)

    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes
    for bq, bk, bb in [(512, 512, 1), (128, 512, 2), (128, 512, 4)]:
        bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=bb)
        bench(f"flash_q{bq}_k{bk}_b{bb}",
              functools.partial(flash_attn, block_sizes=bs), (q, k, v, mask),
              ref)


if __name__ == "__main__":
    main()
