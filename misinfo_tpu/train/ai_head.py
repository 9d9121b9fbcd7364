"""AI-head trainer on HC3-style data (C16, reference train_ai_head.py).

Recipe preserved: loads a previously trained WELFake checkpoint (shape-
filtered overlay, reference :386-404), freezes everything except `ai_head`
(:411-429), LR 1e-3, 3 epochs, loss on ai_logits only (:231-233), best
checkpoint by validation accuracy.

The reference's trainer variant carries CLIP/EfficientNet projection vision
branches that are never exercised (images are always None and the code path
would crash on the `vision_projection` typo, SURVEY.md §7 quirks); the TPU
build trains the inference-variant `ai_head` directly.
"""

from __future__ import annotations

import argparse
from typing import Dict, Optional

import jax

from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.train.roberta_detective import train as _train_text


def train(csv_path: str, out_dir: str = "ai_head_best",
          welfake_checkpoint: Optional[str] = None,
          epochs: int = 3, batch_size: int = 16, lr: float = 1e-3,
          det_cfg: Optional[DetectorConfig] = None,
          max_samples: Optional[int] = None,
          mesh_spec: Optional[str] = None, log=print):
    det_cfg = det_cfg or DetectorConfig()
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    if welfake_checkpoint:
        from misinfo_tpu.checkpoints.io import load_checkpoint
        restored = load_checkpoint(welfake_checkpoint, params)
        if restored is not None:
            params = restored
            log(f"loaded base checkpoint from {welfake_checkpoint}")
    # freeze_backbone=True + head='ai_head' → only ai_head gets updates,
    # replicating the reference's requires_grad freeze (train_ai_head.py:411-429)
    return _train_text(csv_path, out_dir, epochs, batch_size, lr,
                       max_len=256, det_cfg=det_cfg, params=params,
                       max_samples=max_samples, head="ai_head",
                       freeze_backbone=True, mesh_spec=mesh_spec, log=log)


def main(argv=None):
    p = argparse.ArgumentParser(description="AI-text head trainer (HC3, TPU)")
    p.add_argument("--csv", required=True,
                   help="CSV with text,label columns (label 1 = AI-generated)")
    p.add_argument("--out", default="ai_head_best")
    p.add_argument("--base-checkpoint", default=None,
                   help="orbax dir of a previously trained detector")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--mesh", default=None,
                   help="device mesh, e.g. 'data=8' or 'data=4,model=2'")
    args = p.parse_args(argv)
    train(args.csv, args.out, args.base_checkpoint, args.epochs,
          args.batch_size, args.lr, max_samples=args.max_samples,
          mesh_spec=args.mesh)


if __name__ == "__main__":
    main()
