"""Fusion-judge trainer (C20, reference train_fusion_judge.py).

Recipe preserved: Final_Fusion_Train.csv rows (text, image_path, label) →
5-score vectors → fusion MLP; AdamW 1e-3 wd 0.01, cosine anneal, CE loss,
batch 16, 10 epochs, best-accuracy checkpoint carrying BOTH the fusion-only
and the full detector params (reference :252-267); optional post-training
smoke test (`--test`, reference test_fusion_model :285-323).

TPU-first redesign of the data path (SURVEY.md §3.4): the reference runs
the FULL inference engine per sample inside DataLoader __getitem__ and
recomputes every frozen branch every epoch; here the 5-score matrix is
precomputed ONCE with a batched engine sweep (`precompute_scores`), then
the 2.6k-param MLP trains on the cached matrix at memory bandwidth speed.
Missing image / failed analysis → zeros vector (reference :61-67,97-99).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from misinfo_tpu.engine.forensics import MisinfoForensics
from misinfo_tpu.train.harness import run_training
from misinfo_tpu.train.losses import binary_accuracy, cross_entropy
from misinfo_tpu.train.optim import OptimConfig, branch_mask, make_optimizer
from misinfo_tpu.train.steps import make_fusion_step


def load_fusion_csv(csv_path: str, max_samples: Optional[int] = None):
    import pandas as pd

    df = pd.read_csv(csv_path)
    if max_samples:
        df = df.head(max_samples)
    rows = []
    for _, r in df.iterrows():
        rows.append({"text": str(r.get("text", "")),
                     "image": str(r.get("image_path", "")) or None,
                     "label": int(r.get("label", 0))})
    return rows


def precompute_scores(engine: MisinfoForensics, rows: List[Dict],
                      batch_size: int = 32,
                      log=print) -> Tuple[np.ndarray, np.ndarray]:
    """One batched engine sweep → [N,5] score matrix + [N] labels.
    Rows with missing/unreadable images get zero vectors (reference
    FusionTrainingDataset fallback, train_fusion_judge.py:61-67)."""
    vectors = np.zeros((len(rows), 5), np.float32)
    labels = np.asarray([r["label"] for r in rows], np.int32)
    requests, req_idx = [], []
    for i, r in enumerate(rows):
        img = r.get("image")
        if img and os.path.exists(img):
            requests.append({"text": r["text"], "image": img})
            req_idx.append(i)
    log(f"precomputing scores for {len(requests)}/{len(rows)} analyzable rows")
    for s in range(0, len(requests), batch_size):
        chunk = requests[s:s + batch_size]
        try:
            outs = engine.analyze_batch(chunk)
        except Exception as e:
            log(f"batch {s // batch_size} failed ({e}); zero vectors")
            continue
        for j, out in enumerate(outs):
            sc = out["scores"]
            vectors[req_idx[s + j]] = [sc["ai_score"], sc["misinfo_score"],
                                       sc["deepfake_score"],
                                       sc["clip_similarity"],
                                       sc["vault_discrepancy"]]
    return vectors, labels


def train_on_scores(score_vectors: np.ndarray, labels: np.ndarray,
                    params: Dict, out_dir: str = "forensics_master_final",
                    epochs: int = 10, batch_size: int = 16, lr: float = 1e-3,
                    mesh_spec: Optional[str] = None, log=print):
    # own the params: training steps donate their input buffers (in-place
    # AdamW), and the caller's pytree is often a live engine's params
    params = jax.tree_util.tree_map(jnp.array, params)
    # '--mesh data=N': plain DP over the score matrix — GSPMD psums the
    # 2.6k-param MLP's gradients; equality with single-device training is
    # asserted in tests/test_trainers_mesh.py
    from misinfo_tpu.core.mesh import place_train_batch, setup_train_mesh
    mesh, params = setup_train_mesh(mesh_spec, params, batch_size)
    n = len(labels)
    n_val = max(1, int(0.2 * n))
    rng = np.random.default_rng(42)
    order = rng.permutation(n)
    val_idx, train_idx = order[:n_val], order[n_val:]

    steps = max(1, len(train_idx) // batch_size) * epochs
    tx = make_optimizer(OptimConfig(lr=lr, weight_decay=0.01,
                                    warmup_fraction=0.0, total_steps=steps,
                                    clip_norm=None),
                        trainable_mask=branch_mask(params, ["fusion"]))
    opt_state = tx.init(params)
    step = make_fusion_step(tx)

    def train_batches():
        idx = rng.permutation(train_idx)
        for s in range(0, len(idx) - batch_size + 1, batch_size):
            chunk = idx[s:s + batch_size]
            yield place_train_batch(mesh,
                                    {"score_vectors": score_vectors[chunk],
                                     "labels": labels[chunk]})

    from misinfo_tpu.models.fusion import fusion_apply

    @jax.jit
    def eval_step(params, vecs, labs):
        logits = fusion_apply(params["fusion"], vecs)
        return cross_entropy(logits, labs), binary_accuracy(logits, labs)

    def eval_fn(params):
        l, a = eval_step(params, jnp.asarray(score_vectors[val_idx]),
                         jnp.asarray(labels[val_idx]))
        return {"loss": float(l), "accuracy": float(a)}

    def ckpt(params, opt_state, epoch, metrics):
        from misinfo_tpu.checkpoints.io import save_checkpoint
        from misinfo_tpu.ops.serving import deoptimize_params
        # full detector params saved (fusion + frozen branches synchronized),
        # mirroring the reference's dual save (:259-267). deoptimize puts
        # engine-derived params (bf16-cast / fused / int8) back into the
        # canonical detector_init layout so any engine can reload the dir
        # via ModelPaths.orbax_dir.
        save_checkpoint(out_dir, deoptimize_params(params), opt_state,
                        {"epoch": epoch, **metrics, "trainer": "fusion_judge"})

    return run_training(params, opt_state, step, train_batches, eval_fn,
                        epochs=epochs, select_metric="accuracy",
                        select_mode="max", checkpoint_fn=ckpt, log=log)


def train(csv_path: str, out_dir: str = "forensics_master_final",
          engine: Optional[MisinfoForensics] = None,
          epochs: int = 10, batch_size: int = 16, lr: float = 1e-3,
          max_samples: Optional[int] = None,
          mesh_spec: Optional[str] = None, log=print):
    engine = engine or MisinfoForensics()
    rows = load_fusion_csv(csv_path, max_samples)
    vectors, labels = precompute_scores(engine, rows, log=log)
    return train_on_scores(vectors, labels, engine.params, out_dir,
                           epochs, batch_size, lr, mesh_spec=mesh_spec,
                           log=log)


def test_fusion_model(engine: Optional[MisinfoForensics] = None,
                      image_glob: str = "guardian_images/*.jpg",
                      text: str = "Breaking news from the archive") -> Dict:
    """Post-training smoke test (reference test_fusion_model :285-323)."""
    import glob

    engine = engine or MisinfoForensics()
    images = glob.glob(image_glob)
    return engine.analyze(text=text,
                          image_path=images[0] if images else None,
                          verbose=True)


def main(argv=None):
    p = argparse.ArgumentParser(description="Fusion judge trainer (TPU)")
    p.add_argument("--csv", default="Final_Fusion_Train.csv")
    p.add_argument("--out", default="forensics_master_final")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--test", action="store_true")
    p.add_argument("--mesh", default=None,
                   help="device mesh for multi-chip training, e.g. 'data=8'")
    p.add_argument("--device", choices=["auto", "cpu", "tpu"], default="auto",
                   help="platform override; cpu + --mesh uses virtual "
                        "devices (validation without a TPU slice)")
    args = p.parse_args(argv)
    from misinfo_tpu.core.mesh import apply_device_override
    apply_device_override(args.device, args.mesh)
    if args.test:
        test_fusion_model()
    else:
        train(args.csv, args.out, epochs=args.epochs,
              batch_size=args.batch_size, lr=args.lr,
              max_samples=args.max_samples, mesh_spec=args.mesh)


if __name__ == "__main__":
    main()
