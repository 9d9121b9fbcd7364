"""Host-prep capacity probe + serving auto-policy (VERDICT r3 #5).

The device program costs ~1.1 ms/image at the serving batch (docs/PERF.md:
907 verdicts/s full-modality), but image-bearing requests first pay a HOST
cost — JPEG decode + two 224 px resizes — that is the real serving ceiling
on small hosts (measured: ~3.7 ms/image/core at 480p, 34-75 ms at 1080p,
72-258 ms at 4K; PERF.md round-3 attribution row). Operators shouldn't
need to read PERF.md to find that out: this module measures THIS host once
(a synthetic 1080p JPEG through the exact serving prep path) and turns the
numbers into a recommendation — surfaced in the engine's verbose banner,
``/metrics`` (host_prep section), and the ``MISINFO_TPU_HOST_POLICY=auto``
config knob, which flips ``fast_decode`` on when the probe says the host
is the binding constraint.

``fast_decode`` (reduced DCT-domain JPEG decode, preprocess/image.py) is
the one lever that is safe to automate: it only engages when the source
stays ≥448 px after reduction (small frames decode bit-identically), and
its 2-4× host saving is exactly what a host-bound deployment needs.
``device_resize`` is NOT automated — its trade depends on the host↔device
link (wins on co-located PCIe hosts, loses through a remote relay,
docs/PERF.md round 3), which no host-side probe can see; the
recommendation names it instead. The reference has no analogue (it decodes
serially on host at full resolution, misinfo_forensics.py:255-258).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

# module-level cache: the probe measures the host, not the engine, so one
# result serves every engine in the process
_cache: Optional[Dict] = None


def probe_host_prep(res: int = 1080, trials: int = 3,
                    image_size: int = 224) -> Dict:
    """Measure this host's per-image serving-prep cost (JPEG decode + both
    224 px resizes, the exact `_image_batch` path) at `res`p, for the exact
    and the reduced (`fast_decode`) decode. Returns per-image ms and the
    whole-host images/s ceilings (cores × 1/per-image). Cached per process
    (~0.3 s on one core)."""
    global _cache
    if _cache is not None and _cache["probe_resolution"] == res:
        return _cache
    from misinfo_tpu.preprocess.image import decode_rgb, image_to_array

    h, w = res, res * 16 // 9
    y = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    x = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    rgb = np.stack([y + 0 * x, 0 * y + x, (y + x) / 2], -1).astype(np.uint8)
    rgb ^= np.random.default_rng(0).integers(0, 16, rgb.shape).astype(
        np.uint8)
    path = f"/tmp/misinfo_hostprobe_{res}_{os.getpid()}.jpg"
    try:
        from PIL import Image
        Image.fromarray(rgb).save(path, quality=90)

        def one(fast: bool) -> float:
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                arr = decode_rgb(path, fast=fast)
                image_to_array(arr, "effnet", image_size)
                image_to_array(arr, "clip", image_size)
                best = min(best, time.perf_counter() - t0)
            return best * 1000.0

        one(False)  # warm caches/allocators outside the timed trials
        exact_ms = one(False)
        fast_ms = one(True)
    finally:
        try:
            os.remove(path)
        except OSError:
            pass

    cores = os.cpu_count() or 1
    _cache = {
        "cores": cores,
        "probe_resolution": res,
        "exact_ms_per_image": round(exact_ms, 2),
        "fast_ms_per_image": round(fast_ms, 2),
        # the engine's prep pool threads across cores (forensics._prep_map)
        "exact_ceiling_images_per_s": round(cores * 1000.0 / exact_ms, 1),
        "fast_ceiling_images_per_s": round(cores * 1000.0 / fast_ms, 1),
    }
    return _cache


# the measured device cost of one full-modality image at the serving batch
# (docs/PERF.md: 907 verdicts/s ⇒ ~1.1 ms/image) — the bar the host must
# clear for the chip to stay the binding constraint
DEVICE_IMAGES_PER_S = 900.0


def recommend(probe: Optional[Dict] = None,
              device_images_per_s: float = DEVICE_IMAGES_PER_S) -> Dict:
    """Turn a probe into a policy: is THIS host the serving ceiling for
    image traffic, and which knobs close the gap. Pure function of the
    probe — tested without timing."""
    p = probe or probe_host_prep()
    exact = p["exact_ceiling_images_per_s"]
    fast = p["fast_ceiling_images_per_s"]
    host_bound = exact < device_images_per_s
    rec = {
        "host_bound_at_probe_res": host_bound,
        "fast_decode_recommended": bool(host_bound and fast > exact * 1.3),
        "probe": p,
    }
    if not host_bound:
        rec["summary"] = (
            f"host prep ceiling ~{exact:.0f} images/s ≥ device "
            f"~{device_images_per_s:.0f} — host is not the serving "
            "constraint at the probe resolution")
        return rec
    hints = []
    if rec["fast_decode_recommended"]:
        hints.append(
            f"MISINFO_TPU_FAST_DECODE=1 lifts it to ~{fast:.0f} "
            "(reduced JPEG decode; ≤480p frames decode bit-identically)")
    hints.append(
        "MISINFO_TPU_DEVICE_RESIZE=1 additionally halves per-image host "
        "work on co-located (PCIe) TPU hosts — costs more H2D than it "
        "saves through a remote relay (docs/PERF.md round 3)")
    hints.append("MISINFO_TPU_HOST_POLICY=auto applies the safe parts "
                 "of this automatically")
    rec["summary"] = (
        f"host prep ceiling ~{exact:.0f} images/s on {p['cores']} core(s) "
        f"< device ~{device_images_per_s:.0f} — image traffic is "
        f"HOST-bound at {p['probe_resolution']}p. " + "; ".join(hints))
    return rec


def auto_policy() -> Dict:
    """The MISINFO_TPU_HOST_POLICY=auto decision: probe once, return the
    ServingConfig field overrides that are safe to automate (currently
    {fast_decode} — see module docstring for why device_resize is not)."""
    rec = recommend()
    out = {}
    if rec["fast_decode_recommended"]:
        out["fast_decode"] = True
    return out
