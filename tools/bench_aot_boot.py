"""Engine-level AOT-registry restart drive (docs/PERF.md round-5 AOT row).

Boots the full-size engine, warms ONE signature, and reports the phase
stats — run it twice with `MISINFO_TPU_AOT=1` (cold: compiles and
serializes; warm: deserialize-and-load, zero Python trace) and once with
the registry off (persistent compile cache only) to A/B the restart
paths:

    python tools/bench_aot_boot.py cold 1
    python tools/bench_aot_boot.py warm 1
    python tools/bench_aot_boot.py pcache 0

On the TPU behind this image's relay the wall clocks are dominated by
relay session noise (back-to-back identical boots measured 61 → 147 s);
the stable signals are the stats dict (hits/misses/saves/errors) and
`jitted` — an AOT-warm boot shows `jitted: []`, i.e. no jit was ever
constructed. `--device cpu`-style CPU runs: set MISINFO_TPU_PLATFORM=cpu
(the axon plugin overrides JAX_PLATFORMS).

Output: one JSON line. Reference contrast: the reference pays its
first-request compile per process with no warmup at all
(misinfo_forensics.py:117-253).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_SIG = os.environ.get("BENCH_AOT_SIG", "text_only:1:64")


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "boot"
    aot = sys.argv[2] if len(sys.argv) > 2 else "1"
    os.environ["MISINFO_TPU_AOT"] = aot
    import jax
    if os.environ.get("MISINFO_TPU_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.forensics import MisinfoForensics

    variant, b, s = BENCH_SIG.split(":")
    cfg = ForensicsConfig.from_env(verbose=False)
    t0 = time.perf_counter()
    eng = MisinfoForensics(config=cfg)
    t_init = time.perf_counter() - t0
    t0 = time.perf_counter()
    sigs = eng.warmup(variants=(variant,), batch_sizes=(int(b),),
                      text_buckets=(int(s),), videos=())
    t_warm = time.perf_counter() - t0
    out = eng.analyze_batch([{"text": "a claim to verify"}])
    print(json.dumps({
        "metric": "aot_boot", "boot": label, "aot": aot == "1",
        "init_s": round(t_init, 1), "warmup_s": round(t_warm, 2),
        "sigs": [list(x) for x in sigs],
        "stats": dict(eng._aot.stats) if eng._aot else None,
        "jitted": list(eng.programs._jitted),
        "fake_prob": round(float(out[0]["scores"]["fake_probability"]), 6),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
