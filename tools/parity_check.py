"""End-to-end score-parity harness: TPU-build engine vs reference-equivalent
torch pipeline, same weights injected into both.

Validates the ≤1e-3 score-divergence target (BASELINE.md) per signal:
ai_score, misinfo_score, deepfake_score, clip_similarity, fusion
probabilities. When reference `.pth` checkpoints are supplied they are
loaded into BOTH frameworks; otherwise a random-init torch pipeline is
built and its state converted into the JAX engine (SURVEY.md §7 'score-
parity validation without shipped checkpoints').

Usage:
    MISINFO_TPU_PLATFORM=cpu python tools/parity_check.py [--fusion-ckpt X.pth]
Prints a JSON report with per-signal max divergence.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fusion-ckpt", default=None,
                   help="reference forensics_master_final.pth (optional)")
    p.add_argument("--n", type=int, default=3, help="number of test pairs")
    p.add_argument("--seq", type=int, default=64)
    args = p.parse_args(argv)

    import torch

    import jax
    from transformers import CLIPConfig, CLIPModel, RobertaConfig, RobertaModel

    from tools.torch_reference import TorchvisionB0
    from misinfo_tpu.core.config import PrecisionConfig
    from misinfo_tpu.models.detector import DetectorConfig, detector_init
    from misinfo_tpu.ops.common import Policy, l2_normalize, softmax_f32
    from misinfo_tpu.checkpoints.torch_convert import (
        apply_updates, convert_clip, convert_efficientnet, convert_fusion,
        convert_head, convert_roberta, load_pth)

    torch.manual_seed(0)
    det_cfg = DetectorConfig()
    policy = Policy(PrecisionConfig.highest())

    # --- build the torch reference pipeline
    with torch.no_grad():
        t_roberta = RobertaModel(RobertaConfig(max_position_embeddings=514,
                                               type_vocab_size=1)).eval()
        t_ai = torch.nn.Sequential(torch.nn.Linear(768, 256), torch.nn.ReLU(),
                                   torch.nn.Dropout(0.3),
                                   torch.nn.Linear(256, 2)).eval()
        t_mis = torch.nn.Sequential(torch.nn.Linear(768, 256), torch.nn.ReLU(),
                                    torch.nn.Dropout(0.3),
                                    torch.nn.Linear(256, 2)).eval()
        t_eff = TorchvisionB0(2).eval()
        t_clip = CLIPModel(CLIPConfig()).eval()
        t_fusion = torch.nn.Sequential(
            torch.nn.Linear(5, 64), torch.nn.ReLU(), torch.nn.Dropout(0.2),
            torch.nn.Linear(64, 32), torch.nn.ReLU(),
            torch.nn.Linear(32, 2)).eval()

        if args.fusion_ckpt and os.path.exists(args.fusion_ckpt):
            ckpt = load_pth(args.fusion_ckpt)
            sd = ckpt.get("full_model_state_dict", ckpt)
            t_ai.load_state_dict({k[len("ai_head."):]: v for k, v in sd.items()
                                  if k.startswith("ai_head.")}, strict=False)
            t_mis.load_state_dict({k[len("misinfo_head."):]: v
                                   for k, v in sd.items()
                                   if k.startswith("misinfo_head.")},
                                  strict=False)
            t_roberta.load_state_dict({k[len("roberta."):]: v
                                       for k, v in sd.items()
                                       if k.startswith("roberta.")},
                                      strict=False)
            t_eff.load_state_dict({k[len("efficientnet."):]: v
                                   for k, v in sd.items()
                                   if k.startswith("efficientnet.")},
                                  strict=False)
            t_fusion.load_state_dict({k[len("fusion_layer."):]: v
                                      for k, v in sd.items()
                                      if k.startswith("fusion_layer.")},
                                     strict=False)

        # --- convert the SAME weights into the JAX detector
        params = detector_init(jax.random.PRNGKey(0), det_cfg)
        apply_updates(params["roberta"],
                      convert_roberta(t_roberta.state_dict(), ""))
        apply_updates(params["ai_head"],
                      convert_head({f"ai_head.{k}": v for k, v in
                                    t_ai.state_dict().items()}, "ai_head."))
        apply_updates(params["misinfo_head"],
                      convert_head({f"misinfo_head.{k}": v for k, v in
                                    t_mis.state_dict().items()},
                                   "misinfo_head."))
        apply_updates(params["efficientnet"],
                      convert_efficientnet(t_eff.state_dict(), ""))
        apply_updates(params["clip"], convert_clip(t_clip.state_dict(), ""))
        apply_updates(params["fusion"],
                      convert_fusion({f"fusion_layer.{k}": v for k, v in
                                      t_fusion.state_dict().items()}))

        # --- identical synthetic inputs through both stacks
        rng = np.random.default_rng(0)
        S = args.seq
        report = {}
        divs = []
        for i in range(args.n):
            ids = rng.integers(3, 50000, (1, S)).astype(np.int64)
            mask = np.ones((1, S), np.int64)
            cids = rng.integers(1, 49000, (1, 77)).astype(np.int64)
            cmask = np.ones((1, 77), np.int64)
            img = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)

            # torch side (reference analyze steps 1-5)
            hid = t_roberta(input_ids=torch.tensor(ids),
                            attention_mask=torch.tensor(mask)).last_hidden_state
            pooled = hid[:, 0, :]
            ai_t = torch.softmax(t_ai(pooled), 1)[0, 1].item()
            mis_t = torch.softmax(t_mis(pooled), 1)[0, 1].item()
            deep_t = torch.softmax(
                t_eff(torch.tensor(img.transpose(0, 3, 1, 2))), 1)[0, 1].item()
            te = t_clip.get_text_features(input_ids=torch.tensor(cids),
                                          attention_mask=torch.tensor(cmask))
            ie = t_clip.get_image_features(
                pixel_values=torch.tensor(img.transpose(0, 3, 1, 2)))
            te = te / te.norm(dim=-1, keepdim=True)
            ie = ie / ie.norm(dim=-1, keepdim=True)
            sim_t = float((te @ ie.T).item())
            vec = torch.tensor([[ai_t, mis_t, deep_t, sim_t, 0.0]])
            probs_t = torch.softmax(t_fusion(vec), 1)[0].numpy()

            # JAX side (the fused program's branch math on the same inputs)
            import jax.numpy as jnp
            from misinfo_tpu.models.roberta import dual_head_logits
            from misinfo_tpu.models.clip import clip_image_features, clip_text_features
            from misinfo_tpu.models.efficientnet import effnet_apply
            from misinfo_tpu.models.fusion import fusion_apply

            ai_l, mis_l = dual_head_logits(
                params["roberta"], params["ai_head"], params["misinfo_head"],
                jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
                det_cfg.roberta, policy)
            ai_j = float(softmax_f32(ai_l)[0, 1])
            mis_j = float(softmax_f32(mis_l)[0, 1])
            eff_l, _ = effnet_apply(params["efficientnet"], jnp.asarray(img),
                                    policy=policy)
            deep_j = float(softmax_f32(eff_l)[0, 1])
            tej = l2_normalize(clip_text_features(
                params["clip"], jnp.asarray(cids, jnp.int32),
                jnp.asarray(cmask, jnp.int32), det_cfg.clip, policy))
            iej = l2_normalize(clip_image_features(
                params["clip"], jnp.asarray(img), det_cfg.clip, policy))
            sim_j = float(jnp.sum(tej * iej))
            vec_j = jnp.asarray([[ai_j, mis_j, deep_j, sim_j, 0.0]])
            probs_j = np.asarray(softmax_f32(fusion_apply(params["fusion"],
                                                          vec_j)))[0]

            divs.append({
                "ai_score": abs(ai_t - ai_j),
                "misinfo_score": abs(mis_t - mis_j),
                "deepfake_score": abs(deep_t - deep_j),
                "clip_similarity": abs(sim_t - sim_j),
                "fake_probability": abs(float(probs_t[1]) - float(probs_j[1])),
            })

    for k in divs[0]:
        report[k] = max(d[k] for d in divs)
    report["max_divergence"] = max(report.values())
    report["passes_1e-3"] = bool(report["max_divergence"] <= 1e-3)
    report["n_pairs"] = args.n
    report["weights"] = args.fusion_ckpt or "random-init (cross-framework)"
    print(json.dumps(report, indent=2))
    return 0 if report["passes_1e-3"] else 1


if __name__ == "__main__":
    sys.exit(main())
