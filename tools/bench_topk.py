"""Micro-bench for the large-vault top-k implementations (vault/search.py).

Times the full (sims matmul + top-k) stage at a given vault size on the
current backend — the shape the 1M-row vault benchmark exercises. Programs
run tens of ms so the axon-relay timing caveat (docs/PERF.md) doesn't bite.

    python tools/bench_topk.py [--rows 1048576] [--batch 32] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--modes", default="chunked,iterative,approx,mono")
    ap.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from misinfo_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from misinfo_tpu.vault.search import _topk

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(args.batch, 512)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(args.rows, 512)).astype(np.float32))

    def stage(mode):
        def f(q, v):
            sims = jnp.dot(q, v.T, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            return _topk(sims, args.k, mode=mode)
        return jax.jit(f)

    ref_vals = ref_idx = None
    results = {}
    for mode in args.modes.split(","):
        fn = stage(mode)
        try:
            out = fn(q, v)
            jax.block_until_ready(out)
        except Exception as e:
            results[mode] = {"error": str(e)[:120]}
            continue
        vals, idx = (np.asarray(out[0]), np.asarray(out[1]))
        if ref_vals is None:
            ref_vals, ref_idx = vals, idx
            exact = True
        else:
            exact = bool(np.array_equal(idx, ref_idx)
                         and np.allclose(vals, ref_vals, atol=0))
        from misinfo_tpu.utils.timing import sync_fetch
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(q, v)
        sync_fetch(out)
        ms = (time.perf_counter() - t0) / args.iters * 1000.0
        results[mode] = {"ms": round(ms, 2), "matches_first_mode": exact}
    print(json.dumps({"rows": args.rows, "batch": args.batch, "k": args.k,
                      "device": str(jax.devices()[0]), "results": results}))


if __name__ == "__main__":
    main()
