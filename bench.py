"""Headline benchmark: analyze() throughput (verdicts/sec/chip).

Measures the fused full-modality signal program (RoBERTa-base dual heads +
EfficientNet-B0 + CLIP ViT-B/32 + vault kNN + fusion MLP) on text+image
pairs — the BASELINE.md target metric. Prints ONE JSON line.

`vs_baseline` compares against the reference-equivalent sequential torch-CPU
pipeline measured on this machine by tools/measure_baseline.py (the upstream
repo publishes no numbers, BASELINE.md; the number is cached in
baseline_measured.json).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
# 50 iterations amortize the single trailing data-sync round trip
# (~45 ms on the relay-attached TPU; utils/timing.py) to <3% of the run
ITERS = int(os.environ.get("BENCH_ITERS", "50"))
_p = os.environ.get("BENCH_PALLAS", "0")   # "1" ours | "flash" jax kernel
USE_PALLAS = {"0": False, "1": True}.get(_p, _p)
SEQ_LEN = int(os.environ.get("BENCH_SEQ", "0"))  # 0 → config default (512)
# "auto" (default) resolves like the engine: int8_ffn on single-chip TPU
# bf16 serving, none elsewhere (ops/serving.resolve_quant); "none"/"int8"/
# "int8_ffn" force
QUANT = os.environ.get("BENCH_QUANT", "auto")
QUANT_RESOLVED = QUANT  # set after policy resolution in main()
VARIANT = os.environ.get("BENCH_VARIANT", "full")  # full|text_only|visual_only
PACK = os.environ.get("BENCH_PACK", "0") == "1"    # pack ragged text rows
VAULT_ROWS = int(os.environ.get("BENCH_VAULT", "2176"))  # reference ~2170
# BENCH_DEVICE_RESIZE=1 ships staged raw frames (BENCH_STAGING² uint8) and
# lets the program derive both 224px flavors on device (ops/resize.py) —
# the ServingConfig.device_resize serving path
DEVICE_RESIZE = os.environ.get("BENCH_DEVICE_RESIZE", "0") == "1"
STAGING = int(os.environ.get("BENCH_STAGING", "640"))
IVF = os.environ.get("BENCH_IVF", "0") == "1"  # probed-cluster vault search
VAULT_DTYPE = os.environ.get("BENCH_VAULT_DTYPE", "float32")  # |bfloat16|int8|int4
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "baseline_measured.json")


def _tile_rows(base: np.ndarray, n: int) -> np.ndarray:
    """Tile a base block to n rows, rolling each tile's columns so rows
    stay distinct. Multi-million-row capacity benches synthesize their
    vault this way: the 1-core bench host draws only ~2M normals/s, so a
    fresh 4M×512 draw alone costs ~20 min of wall clock, while the
    matmul/top-k being timed is content-independent."""
    m = base.shape[0]
    if n <= m:
        return base[:n]
    out = np.empty((n,) + base.shape[1:], base.dtype)
    for i in range(-(-n // m)):
        lo = i * m
        hi = min(lo + m, n)
        out[lo:hi] = np.roll(base[: hi - lo], i, axis=1)
    return out


def _swap_in_staged_frames(batch, rng, n):
    """Replace the host-resized 224px planes with BENCH_STAGING²-staged raw
    frames + per-image resize params (the ServingConfig.device_resize
    serving path: both 224px flavors derived on device, ops/resize.py)."""
    import jax.numpy as jnp

    from misinfo_tpu.preprocess.image import stage_image_batch
    frames = [rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
              for _ in range(n)]
    staged, rp = stage_image_batch(frames, STAGING)
    del batch["image_effnet"], batch["image_clip"]
    batch.update(image_staged=jnp.asarray(staged),
                 resize_params=jnp.asarray(rp))


def main():
    import jax
    import jax.numpy as jnp

    from misinfo_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from misinfo_tpu.core.config import ForensicsConfig
    from misinfo_tpu.engine.signals import signals_program
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.ops.common import Policy
    from misinfo_tpu.utils.timing import time_program
    import functools

    cfg = ForensicsConfig(verbose=False)
    if os.environ.get("BENCH_GELU"):
        import dataclasses
        cfg = cfg.replace(precision=dataclasses.replace(
            cfg.precision, gelu_mode=os.environ["BENCH_GELU"]))
    det_cfg = DetectorConfig()
    policy = Policy(cfg.precision)  # bf16 serving mode
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    from misinfo_tpu.ops.serving import optimize_for_serving
    from misinfo_tpu.ops.serving import resolve_quant
    global QUANT_RESOLVED
    QUANT_RESOLVED = resolve_quant(QUANT, policy)
    params = optimize_for_serving(
        params, policy, quant=QUANT,
        fuse=os.environ.get("BENCH_FUSE", "0") == "1",
        cast=os.environ.get("BENCH_CAST", "1") == "1")

    rng = np.random.default_rng(0)
    B, S, C = BATCH, SEQ_LEN or cfg.seq.roberta_max_len, cfg.seq.clip_max_len
    vault_rows = VAULT_ROWS

    if DEVICE_RESIZE and VARIANT in ("text_only", "text_packed"):
        raise SystemExit("BENCH_DEVICE_RESIZE=1 needs an image-bearing "
                         "variant — the knob would be silently ignored")

    if VARIANT in ("video", "video_text"):
        # batched video forensics: V videos × F frames per program launch
        # (engine/signals.py video_program). BENCH_VIDEOS sets V.
        if IVF or PACK:
            raise SystemExit(
                "BENCH_IVF / BENCH_PACK are not supported with video "
                "variants — the knobs would be silently ignored")
        from misinfo_tpu.engine.signals import video_program
        V = int(os.environ.get("BENCH_VIDEOS", "4"))
        F = cfg.video.max_frames
        vault_dev = rng.standard_normal((vault_rows, 512), dtype=np.float32)
        batch = {
            "image_effnet": jnp.asarray(
                rng.integers(0, 255, (V * F, 224, 224, 3)), jnp.uint8),
            "image_clip": jnp.asarray(
                rng.integers(0, 255, (V * F, 224, 224, 3)), jnp.uint8),
            "frame_valid": jnp.ones((V, F), jnp.bool_),
            "vault_emb": jnp.asarray(vault_dev),
            "vault_valid": jnp.ones((vault_rows,), jnp.bool_),
            "vault_text_emb": jnp.asarray(
                rng.standard_normal((vault_rows, 512), dtype=np.float32)),
        }
        if DEVICE_RESIZE:
            _swap_in_staged_frames(batch, rng, V * F)
        if VARIANT == "video_text":
            batch.update(
                roberta_ids=jnp.asarray(rng.integers(3, 50000, (V, S)), jnp.int32),
                roberta_mask=jnp.ones((V, S), jnp.int32),
                clip_ids=jnp.asarray(rng.integers(1, 49000, (V, C)), jnp.int32),
                clip_mask=jnp.ones((V, C), jnp.int32))
        fn = jax.jit(functools.partial(
            video_program, has_text=VARIANT == "video_text",
            det_cfg=det_cfg, cfg=cfg, policy=policy, use_pallas=USE_PALLAS))
        dt, _ = time_program(lambda: fn(params, batch), ITERS)
        throughput = V * ITERS / dt
        print(json.dumps({
            "metric": f"analyze_throughput_{VARIANT}"
                      + ("_dresize" if DEVICE_RESIZE else ""),
            "value": round(throughput, 2), "unit": "videos/sec/chip",
            "vs_baseline": None, "videos_per_batch": V, "frames": F,
            "p50_batch_latency_ms": round(dt / ITERS * 1000.0, 2),
            "quant": QUANT_RESOLVED, "device": str(jax.devices()[0]),
        }))
        return

    if VARIANT == "text_packed":
        # ragged text traffic packed into shared rows (preprocess/packing.py):
        # lengths uniform in [32, S); throughput counts REQUESTS, not rows.
        from misinfo_tpu.engine.signals import packed_text_program
        from misinfo_tpu.preprocess.packing import pack_token_rows
        lens = rng.integers(32, S, (B,))
        seqs = [rng.integers(3, 50000, (l,)).astype(np.int32) for l in lens]
        p = pack_token_rows(seqs, S, det_cfg.roberta.pad_token_id, n_slots=B)
        batch = {k: jnp.asarray(v) for k, v in {
            "roberta_ids": p.ids, "roberta_mask": p.mask,
            "roberta_pos": p.position_ids, "roberta_seg": p.segment_ids,
            "cls_rows": p.cls_rows, "cls_cols": p.cls_cols}.items()}
        fn = jax.jit(functools.partial(
            packed_text_program, det_cfg=det_cfg, cfg=cfg, policy=policy,
            use_pallas=USE_PALLAS))
        dt, _ = time_program(lambda: fn(params, batch), ITERS)
        throughput = B * ITERS / dt
        vs = None
        if os.path.exists(BASELINE_FILE):
            with open(BASELINE_FILE) as f:
                ref = json.load(f).get("reference_cpu_verdicts_per_sec")
            vs = round(throughput / ref, 2) if ref else None
        print(json.dumps({
            "metric": "analyze_throughput_text_packed",
            "value": round(throughput, 2), "unit": "verdicts/sec/chip",
            "vs_baseline": vs, "batch": B,
            "packed_rows": int(p.ids.shape[0]), "row_len": S,
            "p50_batch_latency_ms": round(dt / ITERS * 1000.0, 2),
            "quant": QUANT_RESOLVED, "device": str(jax.devices()[0]),
        }))
        return
    if IVF and VAULT_DTYPE == "int4":
        raise SystemExit("BENCH_IVF=1 and BENCH_VAULT_DTYPE=int4 are "
                         "mutually exclusive (engine rule; refuse before "
                         "the k-means build, not at trace time)")
    vault_base = rng.standard_normal(
        (min(vault_rows, 1 << 16), 512), dtype=np.float32)
    if IVF or VAULT_DTYPE != "float32":
        # engine vaults are pre-normalized; IVF and the quantized storage
        # modes (|element| ≤ 1 for int8) assume that too
        vault_base /= np.maximum(
            np.linalg.norm(vault_base, axis=1, keepdims=True), 1e-12)
    # f32 rows materialize lazily: the quantized modes tile the (cheap)
    # quantized base instead — column rolls commute with per-row-scaled
    # elementwise quantization, so tiled-then-quantized ≡ quantized-then-
    # tiled, at memcpy cost
    vault_np = _tile_rows(vault_base, vault_rows) if (
        IVF or VAULT_DTYPE in ("float32", "bfloat16")) else None
    if IVF:
        # build the index BEFORE the batch arrays occupy HBM (the k-means
        # keeps a transient bf16 row copy on device)
        import dataclasses
        from misinfo_tpu.vault.ivf import build_ivf
        nprobe = int(os.environ.get("BENCH_IVF_NPROBE", "8"))
        cfg = cfg.replace(serving=dataclasses.replace(
            cfg.serving, vault_ivf=True, ivf_nprobe=nprobe))
        tb = time.perf_counter()
        index = build_ivf(vault_np, np.ones((vault_rows,), bool), iters=4)
        ivf_info = {"ivf_clusters": index.n_clusters, "ivf_nprobe": nprobe,
                    "ivf_list_len": int(index.lists.shape[1]),
                    "ivf_spill": int(index.spill.shape[0]),
                    "ivf_build_s": round(time.perf_counter() - tb, 1)}
    vault_scale = None
    n_real = vault_rows
    if VAULT_DTYPE == "int4":
        from misinfo_tpu.vault.int4 import INT4_TILE_ROWS, quantize_rows_int4
        # tile straight to the kernel-aligned row count (one allocation;
        # pad rows are masked invalid below, mirroring the engine)
        vault_rows += (-vault_rows) % INT4_TILE_ROWS
        q4b = quantize_rows_int4(vault_base)
        vault_dev = _tile_rows(q4b.packed, vault_rows)
        vault_scale = np.resize(q4b.scale, vault_rows)
    elif VAULT_DTYPE == "int8":
        from misinfo_tpu.vault.search import quantize_rows_int8
        vault_dev = _tile_rows(quantize_rows_int8(vault_base), vault_rows)
    elif VAULT_DTYPE == "bfloat16":
        vault_dev = jnp.asarray(vault_np, jnp.bfloat16)
    else:
        vault_dev = vault_np
    batch = {
        "roberta_ids": jnp.asarray(rng.integers(3, 50000, (B, S)), jnp.int32),
        "roberta_mask": jnp.ones((B, S), jnp.int32),
        "clip_ids": jnp.asarray(rng.integers(1, 49000, (B, C)), jnp.int32),
        "clip_mask": jnp.ones((B, C), jnp.int32),
        "image_effnet": jnp.asarray(rng.integers(0, 255, (B, 224, 224, 3)), jnp.uint8),
        "image_clip": jnp.asarray(rng.integers(0, 255, (B, 224, 224, 3)), jnp.uint8),
        "vault_emb": jnp.asarray(vault_dev),
        "vault_valid": jnp.asarray(np.arange(vault_rows) < n_real),
    }
    if vault_scale is not None:
        batch["vault_scale"] = jnp.asarray(vault_scale)
    if DEVICE_RESIZE:
        _swap_in_staged_frames(batch, rng, B)
    text_base = rng.standard_normal(
        (min(vault_rows, 1 << 16), 512), dtype=np.float32)
    if VAULT_DTYPE == "int4":  # packed titles, gathered+unpacked inline
        t4b = quantize_rows_int4(
            text_base / np.maximum(np.linalg.norm(text_base, axis=1,
                                                  keepdims=True), 1e-12))
        batch["vault_text_emb"] = jnp.asarray(
            _tile_rows(t4b.packed, vault_rows))
        batch["vault_text_scale"] = jnp.asarray(
            np.resize(t4b.scale, vault_rows))
    elif VAULT_DTYPE == "int8":
        from misinfo_tpu.vault.search import quantize_rows_int8
        batch["vault_text_emb"] = jnp.asarray(_tile_rows(quantize_rows_int8(
            text_base / np.maximum(np.linalg.norm(text_base, axis=1,
                                                  keepdims=True), 1e-12)),
            vault_rows))
    elif VAULT_DTYPE == "bfloat16":
        batch["vault_text_emb"] = jnp.asarray(
            _tile_rows(text_base, vault_rows), jnp.bfloat16)
    else:
        batch["vault_text_emb"] = jnp.asarray(_tile_rows(text_base, vault_rows))
    del text_base

    if IVF:
        batch.update(index.device_arrays())
        if os.environ.get("BENCH_IVF_BF16", "0") == "1":
            # the program keys off the batch key alone (signals.py collects
            # ivf_* keys); the ServingConfig flag matters only in the engine
            batch["ivf_emb16"] = jnp.asarray(vault_np, jnp.bfloat16)
            ivf_info["ivf_bf16_gather"] = True

    if PACK:
        # ragged text (lengths U[32,S)) packed into shared rows; images and
        # CLIP tokens stay per-request. Mirrors the engine's pack_text path.
        from misinfo_tpu.preprocess.packing import pack_token_rows
        lens = rng.integers(32, S, (B,))
        seqs = [rng.integers(3, 50000, (l,)).astype(np.int32) for l in lens]
        p = pack_token_rows(seqs, S, det_cfg.roberta.pad_token_id, n_slots=B)
        for k in ("roberta_ids", "roberta_mask"):
            del batch[k]
        batch.update(roberta_ids=jnp.asarray(p.ids),
                     roberta_mask=jnp.asarray(p.mask),
                     roberta_pos=jnp.asarray(p.position_ids),
                     roberta_seg=jnp.asarray(p.segment_ids),
                     cls_rows=jnp.asarray(p.cls_rows),
                     cls_cols=jnp.asarray(p.cls_cols))

    fn = jax.jit(functools.partial(signals_program, variant=VARIANT,
                                   det_cfg=det_cfg, cfg=cfg, policy=policy,
                                   use_pallas=USE_PALLAS))
    dt, _ = time_program(lambda: fn(params, batch), ITERS)
    throughput = B * ITERS / dt
    p50_latency_ms = (dt / ITERS) * 1000.0

    vs_baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)
        ref = base.get("reference_cpu_verdicts_per_sec")
        if ref:
            vs_baseline = throughput / ref

    metric = ("analyze_throughput_full_modality" if VARIANT == "full"
              else f"analyze_throughput_{VARIANT}")
    if PACK:
        metric += "_packed"
    if IVF:
        metric += "_ivf"
    if VAULT_DTYPE != "float32":
        metric += f"_vault-{VAULT_DTYPE}"
    if DEVICE_RESIZE:
        metric += "_dresize"
    print(json.dumps({
        "metric": metric,
        "value": round(throughput, 2),
        "unit": "verdicts/sec/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "batch": B,
        "p50_batch_latency_ms": round(p50_latency_ms, 2),
        "quant": QUANT_RESOLVED, "device": str(jax.devices()[0]),
        **(ivf_info if IVF else {}),
    }))


if __name__ == "__main__":
    main()
