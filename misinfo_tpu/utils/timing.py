"""True-completion device timing helpers for the repo's benchmarks.

`jax.block_until_ready` is not a reliable synchronization point on every
PJRT transport: on this image's relay-attached TPU it acknowledges before
the device stream has drained (observed 2026-08-17 — the full-modality
signal program "completed" in 1.39 ms/batch, which would be ~26x the
chip's bf16 peak; the same program measures 35.2 ms/batch when timed
against real data movement). Wall-clock timing must therefore sync on
DATA, not on readiness flags:

  * a device->host transfer of an output element cannot return until the
    producing program has actually finished, and
  * per-device PJRT streams execute enqueued programs in order, so
    fetching from the LAST enqueued program's output implies every
    earlier program has finished too.

`sync_fetch` performs that minimal one-element fetch (slicing to a single
element on device first — whole-array fetches through the relay pay a
per-leaf cost orders of magnitude above the scalar RTT). `time_program`
wraps the enqueue-N-iterations-then-fetch-once loop every benchmark in
this repo uses; the one fetch RTT (~45 ms here) amortizes across
iterations, so use enough iterations that it is noise.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Tuple


def sync_fetch(tree: Any) -> float:
    """Force true completion of all device work enqueued so far.

    Fetches one element of the first non-empty array leaf of ``tree``
    (host transfer of real data — cannot be satisfied before the program
    producing it, and everything enqueued before it, has executed).
    Returns the fetched element as a float so callers can also use it as
    a cheap sanity probe. Falls back to ``jax.block_until_ready`` for
    array-free pytrees.
    """
    import jax
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and getattr(leaf, "size", 0):
            elem = leaf.reshape(-1)[0] if getattr(leaf, "ndim", 0) else leaf
            return float(np.asarray(elem).reshape(()).astype(np.float64))
    jax.block_until_ready(tree)
    return 0.0


def time_program(fn: Callable[[], Any], iters: int) -> Tuple[float, Any]:
    """Time ``iters`` enqueues of ``fn`` with one trailing data sync.

    ``fn`` is called once for warmup/compile (synced), then ``iters``
    times without per-iteration sync; a single ``sync_fetch`` on the last
    output closes the measurement. Returns ``(seconds_total, last_out)``.
    """
    out = fn()
    sync_fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync_fetch(out)
    return time.perf_counter() - t0, out
