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
safe to automate from the host probe alone: it only engages when the
source stays ≥448 px after reduction (small frames decode bit-identically),
and its 2-4× host saving is exactly what a host-bound deployment needs.
``device_resize``'s trade additionally depends on the host↔device LINK
(wins on co-located PCIe hosts, loses through a remote relay — docs/
PERF.md round 3), so ``probe_link`` measures that too (VERDICT r4 #6):
the amortized H2D cost of one staged S² uint8 frame versus the two 224²
crops it replaces, per image. Auto flips ``device_resize`` on only when
the measured link delta is under half the host resize work it saves
(2× margin) — off through this image's relay, on for PCIe-class links.
Explicit env (`MISINFO_TPU_DEVICE_RESIZE`/`MISINFO_TPU_FAST_DECODE`)
always wins. The reference has no analogue (it decodes serially on host
at full resolution, misinfo_forensics.py:255-258).
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

        def one(fast: bool, resize: bool = True) -> float:
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                arr = decode_rgb(path, fast=fast)
                if resize:
                    image_to_array(arr, "effnet", image_size)
                    image_to_array(arr, "clip", image_size)
                best = min(best, time.perf_counter() - t0)
            return best * 1000.0

        one(False)  # warm caches/allocators outside the timed trials
        exact_ms = one(False)
        fast_ms = one(True)
        decode_ms = one(False, resize=False)
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
        # decode-only split: (exact - decode) is the per-image host resize
        # work that device_resize would move onto the chip
        "decode_ms_per_image": round(decode_ms, 2),
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


_link_cache: Optional[Dict] = None


def probe_link(staging: int = 640, image_size: int = 224,
               iters: int = 16) -> Optional[Dict]:
    """Measure THIS host↔device link's side of the device_resize trade
    (VERDICT r4 #6): the amortized H2D cost per image of one staged
    ``staging``² uint8 frame versus the two ``image_size``² crops it
    replaces. One element of every transferred buffer is folded into a
    single device reduction and fetched once, so the timing closes on
    real data movement (the relay acks `block_until_ready` early —
    CLAUDE.md). Cached per process; returns None when no device backend
    is usable. ~tens of ms on PCIe, ~seconds through a remote relay —
    which is itself the signal."""
    global _link_cache
    if _link_cache is not None:
        return _link_cache
    try:
        import jax
        import jax.numpy as jnp
    except Exception:
        return None
    try:
        dev = jax.devices()[0]
    except Exception:
        return None

    def amortized_ms(shape) -> float:
        rng = np.random.default_rng(0)
        arrs = [rng.integers(0, 255, shape).astype(np.uint8)
                for _ in range(iters)]
        # warm one transfer + fetch outside the timing
        x = jax.device_put(arrs[0], dev)
        np.asarray(jnp.sum(x))
        t0 = time.perf_counter()
        xs = [jax.device_put(a, dev) for a in arrs]
        np.asarray(sum(jnp.int32(x[0, 0, 0]) for x in xs))  # one fetch
        return (time.perf_counter() - t0) / iters * 1000.0

    staged_ms = amortized_ms((staging, staging, 3))
    crops_ms = amortized_ms((2, image_size, image_size, 3))
    _link_cache = {
        "platform": dev.platform,
        "staging": staging,
        "staged_h2d_ms_per_image": round(staged_ms, 3),
        "crops_h2d_ms_per_image": round(crops_ms, 3),
        "delta_ms_per_image": round(staged_ms - crops_ms, 3),
    }
    return _link_cache


def auto_policy(allow_fast_decode: bool = True,
                allow_device_resize: bool = True) -> Dict:
    """The MISINFO_TPU_HOST_POLICY=auto decision: probe the host (and,
    on a real TPU backend, the host↔device link) once and return the
    ServingConfig field overrides to apply. ``fast_decode`` flips on for
    host-bound image prep; ``device_resize`` flips on only when the
    measured extra H2D of staged frames is under HALF the host resize
    work it eliminates (2× margin — ON for PCIe-class links, OFF through
    a remote relay). Explicit env vars suppress the corresponding knob
    via the allow_* flags (core/config.from_env)."""
    rec = recommend()
    out = {}
    if allow_fast_decode and rec["fast_decode_recommended"]:
        out["fast_decode"] = True
    if allow_device_resize:
        p = rec["probe"]
        resize_ms = max(p["exact_ms_per_image"]
                        - p.get("decode_ms_per_image", 0.0), 0.0)
        link = None
        try:
            import jax
            if jax.devices()[0].platform == "tpu" and resize_ms > 0:
                link = probe_link()
        except Exception:
            link = None
        if link is not None and link["delta_ms_per_image"] < 0.5 * resize_ms:
            out["device_resize"] = True
    return out
