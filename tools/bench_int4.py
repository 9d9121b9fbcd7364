"""Micro-bench for the int4 vault sims kernel (vault/int4.py).

Times the standalone [B,D]·int4[N,D]ᵀ stage — Pallas unpack-in-VMEM kernel
vs the plain-XLA unpack+dot path — and checks they agree. Vault rows are
tiled from a 64k base block (bench.py::_tile_rows rationale: the 1-core
bench host draws ~2M normals/s, and the matmul timing is
content-independent).

    python tools/bench_int4.py [--rows 1048576] [--batch 32] [--iters 20]

Measured (TPU v5e-1, 1M rows, b32): Pallas 2.47 ms/call (~109 GB/s packed
HBM read) vs XLA unpack path 37.1 ms — the kernel avoids materializing the
unpacked [N,D] plane in HBM. Max |pallas−xla| = 3e-8 (same cast chain).
The double-rate i8 variant measured 2.23 ms vs 3.43 ms bf16 same-session.

Tile sweep (--tile, same shapes): {1024: bf16 2.01/i8 3.58,
2048 (default): bf16 3.43/i8 2.23, 4096: bf16 3.10/i8 2.05} ms — spreads
sit inside the relay's run-to-run variance with no robust winner, and
8192 exceeds VMEM; the 2048 default stands.
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--skip-xla", action="store_true",
                    help="skip the (slow at scale) XLA unpack path")
    ap.add_argument("--tile", type=int, default=0,
                    help="override INT4_TILE_ROWS for a tile-size sweep")
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from misinfo_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from bench import _tile_rows
    from misinfo_tpu.utils.timing import sync_fetch
    from misinfo_tpu.vault import int4 as int4_mod
    from misinfo_tpu.vault.int4 import (Int4Vault, int4_sims_pallas,
                                        int4_sims_pallas_i8,
                                        int4_sims_reference, pad_int4_vault,
                                        quantize_rows_int4)
    if args.tile:
        int4_mod.INT4_TILE_ROWS = args.tile

    B, D, N = args.batch, 512, args.rows
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    base = rng.standard_normal((min(N, 1 << 16), D)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    q4b = quantize_rows_int4(base)
    q4 = pad_int4_vault(Int4Vault(packed=_tile_rows(q4b.packed, N),
                                  scale=np.resize(q4b.scale, N)),
                        multiple=int4_mod.INT4_TILE_ROWS)
    qd = jnp.asarray(q)
    pk, sc = jnp.asarray(q4.packed), jnp.asarray(q4.scale)
    sync_fetch(pk)

    def timed(fn):
        out = fn(qd, pk, sc)          # compile
        sync_fetch(out)
        t = time.time()
        for _ in range(args.iters):
            out = fn(qd, pk, sc)
        sync_fetch(out)
        return (time.time() - t) / args.iters * 1000.0, out

    on_tpu = jax.devices()[0].platform == "tpu"
    # off-TPU the kernels only run interpreted (numerics check, not perf)
    pallas = (int4_sims_pallas if on_tpu else
              lambda *a: int4_sims_pallas(*a, interpret=True))
    pallas_i8 = (int4_sims_pallas_i8 if on_tpu else
                 lambda *a: int4_sims_pallas_i8(*a, interpret=True))
    ms_pl, out_pl = timed(pallas)
    ms_i8, out_i8 = timed(pallas_i8)
    rec = {
        "rows": int(pk.shape[0]), "batch": B,
        "pallas_ms": round(ms_pl, 3),
        "pallas_i8_ms": round(ms_i8, 3),
        "packed_read_gbs": round(pk.nbytes / (ms_pl / 1e3) / 1e9, 1),
        "i8_vs_bf16_max_diff": float(
            np.abs(np.asarray(out_i8) - np.asarray(out_pl)).max()),
        "device": str(jax.devices()[0]),
    }
    if not args.skip_xla:
        ms_ref, out_ref = timed(int4_sims_reference)
        rec["xla_ms"] = round(ms_ref, 3)
        rec["speedup"] = round(ms_ref / ms_pl, 2)
        rec["max_abs_diff"] = float(
            np.abs(np.asarray(out_pl) - np.asarray(out_ref)).max())
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
