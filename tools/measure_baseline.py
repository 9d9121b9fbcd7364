"""Measure the reference-equivalent CPU pipeline throughput.

The upstream repo publishes no performance numbers (BASELINE.md), so the
baseline is measured here: a torch-CPU pipeline with the reference's exact
per-request compute (call stack at SURVEY.md §3.2) run strictly
sequentially and unbatched, as the reference engine does:

  1× RoBERTa-base forward + dual heads          (misinfo_forensics.py:337-340)
  1× EfficientNet-B0 forward                    (:367)
  1× CLIP text + 1× CLIP image forward          (:394-404)
  1× CLIP image forward again for the vault     (:437-440)
  N×512 numpy vault matmul, re-normalized/query (:443-446) + argsort top-k
  1× fusion MLP                                 (:597)

Weights are random (the reference's checkpoints are not shipped); compute
cost is architecture-determined, not weight-determined. Writes
baseline_measured.json consumed by bench.py's `vs_baseline`.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_REQUESTS = int(os.environ.get("BASELINE_REQUESTS", "10"))
VAULT_ROWS = 2170  # reference vault size (forensics_dashboard.py:264)


def main():
    import torch

    torch.manual_seed(0)
    from transformers import CLIPConfig, CLIPModel, RobertaConfig, RobertaModel

    from tools.torch_reference import TorchvisionB0

    with torch.no_grad():
        # roberta-base geometry (RobertaConfig class defaults are BERT-like:
        # max_position 512 would overflow RoBERTa's offset position ids)
        roberta = RobertaModel(RobertaConfig(
            max_position_embeddings=514, type_vocab_size=1)).eval()
        ai_head = torch.nn.Sequential(
            torch.nn.Linear(768, 256), torch.nn.ReLU(), torch.nn.Dropout(0.3),
            torch.nn.Linear(256, 2)).eval()
        misinfo_head = torch.nn.Sequential(
            torch.nn.Linear(768, 256), torch.nn.ReLU(), torch.nn.Dropout(0.3),
            torch.nn.Linear(256, 2)).eval()
        effnet = TorchvisionB0(num_classes=2).eval()
        clip = CLIPModel(CLIPConfig()).eval()
        fusion = torch.nn.Sequential(
            torch.nn.Linear(5, 64), torch.nn.ReLU(), torch.nn.Dropout(0.2),
            torch.nn.Linear(64, 32), torch.nn.ReLU(),
            torch.nn.Linear(32, 2)).eval()

        vault = np.random.default_rng(0).normal(
            size=(VAULT_ROWS, 512)).astype(np.float32)

        rng = np.random.default_rng(1)
        ids = torch.tensor(rng.integers(3, 50000, (1, 512)), dtype=torch.long)
        mask = torch.ones((1, 512), dtype=torch.long)
        cids = torch.tensor(rng.integers(1, 49000, (1, 77)), dtype=torch.long)
        cmask = torch.ones((1, 77), dtype=torch.long)
        img = torch.tensor(rng.normal(size=(1, 3, 224, 224)).astype(np.float32))

        def one_request():
            # step 1: text
            hidden = roberta(input_ids=ids, attention_mask=mask).last_hidden_state
            pooled = hidden[:, 0, :]
            ai = torch.softmax(ai_head(pooled), dim=1)[0, 1].item()
            mis = torch.softmax(misinfo_head(pooled), dim=1)[0, 1].item()
            # step 2: image forensics
            deep = torch.softmax(effnet(img), dim=1)[0, 1].item()
            # step 3: consistency (dual CLIP forward)
            te = clip.get_text_features(input_ids=cids, attention_mask=cmask)
            ie = clip.get_image_features(pixel_values=img)
            te = te / te.norm(dim=-1, keepdim=True)
            ie = ie / ie.norm(dim=-1, keepdim=True)
            sim = float((te @ ie.T).item())
            # step 4: vault (fresh CLIP image forward + host numpy kNN,
            # re-normalizing the whole vault per query as the reference does)
            ie2 = clip.get_image_features(pixel_values=img)
            q = (ie2 / ie2.norm(dim=-1, keepdim=True)).numpy()[0]
            vn = vault / np.linalg.norm(vault, axis=1, keepdims=True)
            sims = vn @ q
            top = np.argsort(sims)[-5:][::-1]
            vd = float(sims[top[0]]) if sims[top[0]] > 0.85 else 0.0
            # step 5: fusion
            vec = torch.tensor([[ai, mis, deep, sim, vd]], dtype=torch.float32)
            probs = torch.softmax(fusion(vec), dim=1)
            return float(probs[0, 1].item())

        one_request()  # warmup
        t0 = time.perf_counter()
        for _ in range(N_REQUESTS):
            one_request()
        dt = time.perf_counter() - t0

    throughput = N_REQUESTS / dt
    result = {
        "reference_cpu_verdicts_per_sec": round(throughput, 4),
        "reference_cpu_latency_ms": round(1000 * dt / N_REQUESTS, 2),
        "n_requests": N_REQUESTS,
        "torch_threads": torch.get_num_threads(),
        "note": "reference-equivalent sequential torch-CPU pipeline, "
                "random weights, measured on this machine",
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "baseline_measured.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
