"""Parity gate v2: the REAL serving engine vs a reference-equivalent torch
pipeline, same weights, same tokenization, nonzero vault — every serving
variant end-to-end.

What runs on the JAX side is exactly what serves: `MisinfoForensics` with
its fused jitted programs (full / text_only / visual_only / video_text),
its own tokenizers, bucketing/packing defaults, on-device image normalize,
vault top-k and fusion gating. The torch side recomposes the reference's
analyze() math step-for-step (misinfo_forensics.py:319-615), including the
host-side numpy vault kNN with per-query re-normalization (:443-464) and
the conditional caption-vs-headline text similarity (:468-484), and the
video mean/mean/max aggregation (:563-573).

Weight sources:
  * default — random-init torch pipeline, state converted into the engine
    (cross-framework parity without shipped checkpoints, SURVEY.md §7)
  * --fusion-ckpt X.pth — a reference-layout checkpoint loaded into BOTH
  * --reference-ckpt DIR — a repo-TRAINED native checkpoint: loaded into
    the engine, then EXPORTED through the reference torch key layout
    (checkpoints/torch_convert.export_reference_state_dicts) into the
    torch side — validating the .pth layout round-trip on trained weights

Usage:
    MISINFO_TPU_PLATFORM=cpu python tools/parity_check.py [--n 20] [--video]
Prints a JSON report with per-variant, per-signal max divergence; exit 0
iff everything is ≤ 1e-3 (BASELINE.md target).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESH = 1e-3
VAULT_GATE = 0.85   # reference misinfo_forensics.py:464
TOP_K = 5


def _texts(n):
    base = [
        "Breaking news: officials confirm the incident was staged",
        "A quiet afternoon at the local farmers market draws families",
        "Shocking footage shows an event that never actually happened",
        "Scientists publish peer reviewed findings on coastal erosion",
        "You will not believe what this celebrity said about the election",
        "City council approves budget for new public library wing",
        "Leaked document proves massive coverup claims viral post",
        "Weather service issues routine advisory for weekend travellers",
    ]
    out = []
    for i in range(n):
        t = base[i % len(base)]
        out.append(t if i < len(base) else f"{t} case number {i} "
                   + "with additional context " * (i % 4))
    return out


def _images(n, size=224, seed=1):
    from PIL import Image
    rng = np.random.default_rng(seed)
    return [Image.fromarray(rng.integers(0, 255, (size, size, 3))
                            .astype(np.uint8)) for _ in range(n)]


def build_torch_side(seed=0):
    import torch
    from transformers import CLIPConfig, CLIPModel, RobertaConfig, RobertaModel

    from tools.torch_reference import TorchvisionB0

    torch.manual_seed(seed)
    return dict(
        roberta=RobertaModel(RobertaConfig(max_position_embeddings=514,
                                           type_vocab_size=1)).eval(),
        ai=torch.nn.Sequential(torch.nn.Linear(768, 256), torch.nn.ReLU(),
                               torch.nn.Dropout(0.3),
                               torch.nn.Linear(256, 2)).eval(),
        mis=torch.nn.Sequential(torch.nn.Linear(768, 256), torch.nn.ReLU(),
                                torch.nn.Dropout(0.3),
                                torch.nn.Linear(256, 2)).eval(),
        eff=TorchvisionB0(2).eval(),
        clip=CLIPModel(CLIPConfig()).eval(),
        fusion=torch.nn.Sequential(
            torch.nn.Linear(5, 64), torch.nn.ReLU(), torch.nn.Dropout(0.2),
            torch.nn.Linear(64, 32), torch.nn.ReLU(),
            torch.nn.Linear(32, 2)).eval(),
    )


def torch_load_reference_ckpt(mods, path):
    from misinfo_tpu.checkpoints.torch_convert import load_pth
    ckpt = load_pth(path)
    sd = ckpt.get("full_model_state_dict", ckpt)
    for name, prefix in (("ai", "ai_head."), ("mis", "misinfo_head."),
                         ("roberta", "roberta."), ("eff", "efficientnet."),
                         ("fusion", "fusion_layer.")):
        mods[name].load_state_dict(
            {k[len(prefix):]: v for k, v in sd.items()
             if k.startswith(prefix)}, strict=False)


def torch_load_exported(mods, full_sd, clip_sd):
    import torch

    def sub(sd, prefix):
        return {k[len(prefix):]: torch.tensor(v) for k, v in sd.items()
                if k.startswith(prefix)}

    mods["roberta"].load_state_dict(sub(full_sd, "roberta."), strict=False)
    mods["ai"].load_state_dict(sub(full_sd, "ai_head."))
    mods["mis"].load_state_dict(sub(full_sd, "misinfo_head."))
    mods["eff"].load_state_dict(sub(full_sd, "efficientnet."))
    mods["fusion"].load_state_dict(sub(full_sd, "fusion_layer."))
    missing, unexpected = mods["clip"].load_state_dict(sub(clip_sd, "clip."),
                                                       strict=False)
    assert not unexpected, unexpected[:4]


def convert_torch_into_params(params, mods):
    from misinfo_tpu.checkpoints.torch_convert import (
        apply_updates, convert_clip, convert_efficientnet, convert_fusion,
        convert_head, convert_roberta)
    apply_updates(params["roberta"],
                  convert_roberta(mods["roberta"].state_dict(), ""))
    apply_updates(params["ai_head"],
                  convert_head({f"ai_head.{k}": v for k, v in
                                mods["ai"].state_dict().items()}, "ai_head."))
    apply_updates(params["misinfo_head"],
                  convert_head({f"misinfo_head.{k}": v for k, v in
                                mods["mis"].state_dict().items()},
                               "misinfo_head."))
    apply_updates(params["efficientnet"],
                  convert_efficientnet(mods["eff"].state_dict(), ""))
    apply_updates(params["clip"], convert_clip(mods["clip"].state_dict(), ""))
    apply_updates(params["fusion"],
                  convert_fusion({f"fusion_layer.{k}": v for k, v in
                                  mods["fusion"].state_dict().items()}))


class TorchReference:
    """Reference analyze() math recomposed on the torch side; consumes the
    ENGINE's tokenization and image preprocessing outputs so the gate
    isolates model+engine math (tokenizer parity is unit-tested vs HF
    separately, tests/test_tokenizers.py)."""

    def __init__(self, mods, engine, vault_embs, vault_meta):
        self.m = mods
        self.engine = engine
        self.vault = np.asarray(vault_embs, np.float32)   # [N, D] raw
        self.meta = vault_meta

    # ---- per-branch forwards on engine-produced arrays
    def _tok(self, texts):
        eng = self.engine
        rb_max = min(eng.cfg.seq.roberta_max_len,
                     eng.det_cfg.roberta.max_position_embeddings - 2)
        cl_len = min(eng.cfg.seq.clip_max_len, eng.det_cfg.clip.max_text_len)
        ids, mask = eng.roberta_tokenizer.batch(texts, rb_max)
        cids, cmask = eng.clip_tokenizer.batch(texts, cl_len)
        return ids, mask, cids, cmask

    def _imgs(self, images):
        from misinfo_tpu.preprocess.image import (
            CLIP_MEAN, CLIP_STD, IMAGENET_MEAN, IMAGENET_STD, decode_rgb,
            image_to_array)
        size = self.engine.cfg.seq.image_size
        eff_u8 = np.stack([image_to_array(decode_rgb(im), "effnet", size)
                           for im in images])
        clip_u8 = np.stack([image_to_array(decode_rgb(im), "clip", size)
                            for im in images])

        def norm(u8, mean, std):
            x = u8.astype(np.float32) / 255.0
            x = (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
            return x.transpose(0, 3, 1, 2)
        return (norm(eff_u8, IMAGENET_MEAN, IMAGENET_STD),
                norm(clip_u8, CLIP_MEAN, CLIP_STD))

    def text_scores(self, texts):
        import torch
        ids, mask, _, _ = self._tok(texts)
        with torch.no_grad():
            hid = self.m["roberta"](
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long)
            ).last_hidden_state
            pooled = hid[:, 0, :]
            ai = torch.softmax(self.m["ai"](pooled), 1)[:, 1].numpy()
            mis = torch.softmax(self.m["mis"](pooled), 1)[:, 1].numpy()
        return ai, mis

    def visual_scores(self, images, captions=None):
        """deepfake score + clip image embeds (+ clip sims when captions)."""
        import torch
        eff, clp = self._imgs(images)
        with torch.no_grad():
            deep = torch.softmax(self.m["eff"](torch.tensor(eff)),
                                 1)[:, 1].numpy()
            ie = self.m["clip"].get_image_features(
                pixel_values=torch.tensor(clp))
            ie = (ie / ie.norm(dim=-1, keepdim=True)).numpy()
            sims = None
            if captions is not None:
                _, _, cids, cmask = self._tok(captions)
                te = self.m["clip"].get_text_features(
                    input_ids=torch.tensor(cids, dtype=torch.long),
                    attention_mask=torch.tensor(cmask, dtype=torch.long))
                te = (te / te.norm(dim=-1, keepdim=True)).numpy()
                sims = np.sum(te * ie, axis=1)
        return deep, ie, sims

    def search_vault(self, img_emb, caption=None):
        """Reference misinfo_forensics.py:443-484 numpy math, verbatim
        semantics: per-query vault re-normalization, argsort top-k, 0.85
        gate, on-demand caption-vs-headline CLIP text similarity."""
        import torch
        vault_norm = self.vault / np.linalg.norm(self.vault, axis=1,
                                                 keepdims=True)
        sims = vault_norm @ img_emb
        top = np.argsort(sims)[-TOP_K:][::-1]
        max_sim = float(sims[top[0]])
        vd = max_sim if max_sim > VAULT_GATE else 0.0
        tsim = 0.0
        if caption and max_sim > VAULT_GATE:
            title = self.meta[int(top[0])]["title"]
            _, _, cids, cmask = self._tok([caption, title])
            with torch.no_grad():
                te = self.m["clip"].get_text_features(
                    input_ids=torch.tensor(cids, dtype=torch.long),
                    attention_mask=torch.tensor(cmask, dtype=torch.long))
                te = te / te.norm(dim=-1, keepdim=True)
                tsim = float(te[0] @ te[1])
        return vd, tsim, [self.meta[int(i)]["title"] for i in top]

    def fusion(self, vec):
        import torch
        with torch.no_grad():
            probs = torch.softmax(
                self.m["fusion"](torch.tensor(vec, dtype=torch.float32)),
                1).numpy()
        return probs

    # ---- full reference analyze() recompositions per variant
    def analyze_full(self, texts, images):
        ai, mis = self.text_scores(texts)
        deep, ie, sims = self.visual_scores(images, texts)
        out = []
        for i in range(len(texts)):
            vd, tsim, titles = self.search_vault(ie[i], texts[i])
            vec = np.asarray([[ai[i], mis[i], deep[i], sims[i], vd]],
                             np.float32)
            probs = self.fusion(vec)[0]
            out.append(dict(ai_score=float(ai[i]), misinfo_score=float(mis[i]),
                            deepfake_score=float(deep[i]),
                            clip_similarity=float(sims[i]),
                            vault_discrepancy=vd, text_similarity=tsim,
                            fake_probability=float(probs[1]),
                            match_titles=titles))
        return out

    def analyze_text_only(self, texts):
        ai, mis = self.text_scores(texts)
        return [dict(ai_score=float(a), misinfo_score=float(m),
                     fake_probability=float(np.clip(m, 0, 1)))
                for a, m in zip(ai, mis)]

    def analyze_visual_only(self, images):
        deep, ie, _ = self.visual_scores(images)
        out = []
        for i in range(len(images)):
            vd, _, titles = self.search_vault(ie[i])
            out.append(dict(deepfake_score=float(deep[i]),
                            vault_discrepancy=vd,
                            fake_probability=float(np.clip(
                                max(deep[i], vd), 0, 1)),
                            match_titles=titles))
        return out

    def analyze_video(self, frames, text):
        """Reference analyze_video aggregation (:563-573): mean deepfake,
        mean clip sim, MAX vault discrepancy (that frame's state wins)."""
        ai, mis = self.text_scores([text])
        deep, ie, sims = self.visual_scores(
            frames, [text] * len(frames))
        per_frame = [self.search_vault(ie[i], text)
                     for i in range(len(frames))]
        vds = [v[0] for v in per_frame]
        vec = np.asarray([[ai[0], mis[0], float(np.mean(deep)),
                           float(np.mean(sims)), max(vds)]], np.float32)
        probs = self.fusion(vec)[0]
        return dict(ai_score=float(ai[0]), misinfo_score=float(mis[0]),
                    deepfake_score=float(np.mean(deep)),
                    clip_similarity=float(np.mean(sims)),
                    vault_discrepancy=float(max(vds)),
                    fake_probability=float(probs[1]))

    def vault_best_sim(self, img_emb):
        vault_norm = self.vault / np.linalg.norm(self.vault, axis=1,
                                                 keepdims=True)
        return float(np.max(vault_norm @ img_emb))


def _div(report, variant, key, a, b):
    d = abs(float(a) - float(b))
    cur = report.setdefault(variant, {})
    cur[key] = max(cur.get(key, 0.0), d)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fusion-ckpt", default=None,
                   help="reference forensics_master_final.pth (optional)")
    p.add_argument("--reference-ckpt", default=None,
                   help="repo-trained native checkpoint dir; round-trips "
                        "through the reference torch key layout")
    p.add_argument("--n", type=int, default=20, help="number of test pairs")
    p.add_argument("--no-video", action="store_true",
                   help="skip the video variant (needs an mp4 encoder)")
    p.add_argument("--vault-rows", type=int, default=256)
    args = p.parse_args(argv)

    import torch  # noqa: F401  (fail fast when absent)

    import jax
    import jax.numpy as jnp

    from misinfo_tpu.core.config import ForensicsConfig, PrecisionConfig
    from misinfo_tpu.engine.forensics import MisinfoForensics
    from misinfo_tpu.models.clip import clip_text_features
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.ops.common import Policy, l2_normalize
    from misinfo_tpu.vault.store import TruthVault

    det_cfg = DetectorConfig()
    policy = Policy(PrecisionConfig.highest())
    mods = build_torch_side()
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    weights = "random-init (cross-framework)"

    if args.reference_ckpt:
        from misinfo_tpu.checkpoints.io import load_checkpoint
        from misinfo_tpu.checkpoints.torch_convert import (
            export_reference_state_dicts)
        restored = load_checkpoint(args.reference_ckpt, params)
        if restored is None:
            print(f"cannot load {args.reference_ckpt}", file=sys.stderr)
            return 2
        params = restored
        full_sd, clip_sd = export_reference_state_dicts(params)
        torch_load_exported(mods, full_sd, clip_sd)
        weights = f"repo-trained {args.reference_ckpt} → torch layout"
    else:
        if args.fusion_ckpt and os.path.exists(args.fusion_ckpt):
            torch_load_reference_ckpt(mods, args.fusion_ckpt)
            weights = args.fusion_ckpt
        convert_torch_into_params(params, mods)

    n = args.n
    texts = _texts(n)
    images = _images(n)

    with tempfile.TemporaryDirectory() as td:
        # nonzero vault: random image rows + titles' TEXT embeddings from
        # the engine's own clip tower (the reference's precomputed-title
        # equivalent); one row is planted as image 0's exact embedding so
        # the >0.85 gate genuinely fires in the run
        rng = np.random.default_rng(9)
        D = det_cfg.clip.projection_dim
        vrows = args.vault_rows
        vault_embs = rng.normal(size=(vrows, D)).astype(np.float32)
        vault_embs /= np.linalg.norm(vault_embs, axis=1, keepdims=True)
        titles = [f"archive headline number {i} about recorded events"
                  for i in range(vrows)]
        meta = [{"title": t, "url": f"u{i}", "date": "2024-01-01"}
                for i, t in enumerate(titles)]

        cfg = ForensicsConfig(verbose=False).replace(
            precision=PrecisionConfig.highest())
        vpath = os.path.join(td, "vault.npz")
        cfg = cfg.replace(paths=cfg.paths.__class__(vault_path=vpath))

        # title text embeddings via the engine's clip tower (f32)
        from misinfo_tpu.preprocess.tokenizer import load_clip_tokenizer
        ctok = load_clip_tokenizer(None, vocab_size=det_cfg.clip.vocab_size)
        cl_len = min(cfg.seq.clip_max_len, det_cfg.clip.max_text_len)
        tids, tmask = ctok.batch(titles, cl_len)
        title_emb = np.asarray(l2_normalize(clip_text_features(
            params["clip"], jnp.asarray(tids), jnp.asarray(tmask),
            det_cfg.clip, policy)))

        # plant image 0's embedding as vault row 0 (computed via the
        # engine's preprocessing + clip tower)
        from misinfo_tpu.models.clip import clip_image_features
        from misinfo_tpu.ops.image_ops import normalize_images
        from misinfo_tpu.preprocess.image import (
            batch_images, decode_rgb, image_to_array)
        arr = batch_images([image_to_array(decode_rgb(images[0]), "clip",
                                           cfg.seq.image_size)],
                           cfg.seq.image_size)
        emb0 = np.asarray(l2_normalize(clip_image_features(
            params["clip"],
            normalize_images(jnp.asarray(arr), "clip", policy.compute),
            det_cfg.clip, policy)))[0]
        vault_embs[0] = emb0

        TruthVault(vault_embs, meta, text_embeddings=title_emb).save(vpath)
        engine = MisinfoForensics(config=cfg, det_cfg=det_cfg, params=params)
        assert engine.vault_loaded
        ref = TorchReference(mods, engine, vault_embs, meta)

        report, gate_fired = {}, False

        # ---- full variant (text+image → fusion verdict)
        eng_full = engine.analyze_batch(
            [{"text": t, "image": im} for t, im in zip(texts, images)])
        ref_full = ref.analyze_full(texts, images)
        for e, r in zip(eng_full, ref_full):
            for k in ("ai_score", "misinfo_score", "deepfake_score",
                      "clip_similarity", "vault_discrepancy",
                      "text_similarity", "fake_probability"):
                _div(report, "full", k, e["scores"][k], r[k])
            if e["scores"]["vault_discrepancy"] > 0:
                gate_fired = True
                assert e["vault_matches"][0]["title"] == r["match_titles"][0]

        # ---- text_only (fallback arithmetic: fake = misinfo)
        eng_t = engine.analyze_batch([{"text": t} for t in texts])
        ref_t = ref.analyze_text_only(texts)
        for e, r in zip(eng_t, ref_t):
            for k in ("ai_score", "misinfo_score", "fake_probability"):
                _div(report, "text_only", k, e["scores"][k], r[k])

        # ---- visual_only (fallback: max(deepfake, vault))
        eng_v = engine.analyze_batch([{"image": im} for im in images])
        ref_v = ref.analyze_visual_only(images)
        for e, r in zip(eng_v, ref_v):
            for k in ("deepfake_score", "vault_discrepancy",
                      "fake_probability"):
                _div(report, "visual_only", k, e["scores"][k], r[k])

        # ---- video_text (frames-as-batch + mean/mean/max aggregation)
        video_ran = False
        if not args.no_video:
            try:
                import cv2
                vp = os.path.join(td, "clip.mp4")
                w = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"mp4v"),
                                    10.0, (224, 224))
                if w.isOpened():
                    vr = np.random.default_rng(4)
                    for _ in range(35):
                        w.write(vr.integers(0, 255, (224, 224, 3))
                                .astype(np.uint8))
                    w.release()
                    from misinfo_tpu.preprocess.video import (
                        sample_video_frames)
                    frames, _ = sample_video_frames(
                        vp, cfg.video.max_frames, cfg.video.stride_seconds,
                        cfg.video.fps_fallback)
                    eng_vid = engine.analyze(
                        text=texts[0], video_path=vp, verbose=False)
                    ref_vid = ref.analyze_video(frames, texts[0])
                    for k in ("ai_score", "misinfo_score", "deepfake_score",
                              "clip_similarity", "vault_discrepancy",
                              "fake_probability"):
                        _div(report, "video_text", k,
                             eng_vid["scores"][k], ref_vid[k])
                    video_ran = True
            except Exception as e:  # encoder absent → report, don't fail
                report["video_text"] = {"skipped": str(e)}

    flat = [v for var in report.values() for k, v in var.items()
            if isinstance(v, float)]
    out = {
        "variants": report,
        "max_divergence": max(flat),
        "passes_1e-3": bool(max(flat) <= THRESH),
        "vault_gate_fired": gate_fired,
        "video_ran": video_ran,
        "n_pairs": n,
        "weights": weights,
        "tokenizer_parity": engine.tokenizer_parity,
        "pack_text": str(engine.cfg.serving.pack_text),
    }
    print(json.dumps(out, indent=2))
    return 0 if out["passes_1e-3"] and gate_fired else 1


if __name__ == "__main__":
    sys.exit(main())
