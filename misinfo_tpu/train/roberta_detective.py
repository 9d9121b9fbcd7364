"""RoBERTa misinfo-head trainer (C15, reference train_roberta_detective.py).

Recipe preserved: WELFake-style CSV (text,label), max_len 256 (:160),
batch 16, AdamW 2e-5 / wd 0.01 (:161-163), cosine schedule with 10% warmup,
grad-clip 1.0 (:96), 80/20 split seed 42, early stop patience 3 (:165),
best-val-loss checkpoint with optimizer state (:309-318).

TPU-first difference: instead of a separate `RobertaForSequenceClassification`
graph, the *inference-variant* detector (backbone + misinfo_head) trains
directly — so the produced checkpoint is exactly what the engine serves
(the reference's .pth round-trips through incompatible key layouts,
SURVEY.md §7 'three divergent model definitions'). bf16 matmul compute
replaces torch AMP.
"""

from __future__ import annotations

import argparse
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from misinfo_tpu.core.config import PrecisionConfig
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.models.roberta import dual_head_logits
from misinfo_tpu.ops.common import Policy
from misinfo_tpu.preprocess.tokenizer import load_roberta_tokenizer, load_clip_tokenizer
from misinfo_tpu.train.datasets import MisinfoDataset, Sample
from misinfo_tpu.train.harness import run_training, split_train_val
from misinfo_tpu.train.losses import binary_accuracy, cross_entropy
from misinfo_tpu.train.optim import OptimConfig, branch_mask, make_optimizer
from misinfo_tpu.train.steps import make_text_head_step


def load_csv_samples(csv_path: str, text_col: str = "text",
                     label_col: str = "label",
                     max_samples: Optional[int] = None) -> List[Sample]:
    import pandas as pd

    df = pd.read_csv(csv_path)
    if max_samples:
        df = df.head(max_samples)
    return [Sample(text=str(r[text_col]), label=int(r[label_col]))
            for _, r in df.iterrows()]


def make_eval_fn(det_cfg, policy, batches_fn, head: str):
    @jax.jit
    def eval_step(params, batch):
        ai, mis = dual_head_logits(
            params["roberta"], params["ai_head"], params["misinfo_head"],
            batch["input_ids"], batch["attention_mask"],
            det_cfg.roberta, policy)
        logits = ai if head == "ai_head" else mis
        return (cross_entropy(logits, batch["labels"]),
                binary_accuracy(logits, batch["labels"]))

    def eval_fn(params):
        losses, accs = [], []
        for batch in batches_fn():
            l, a = eval_step(params, {k: jnp.asarray(v)
                                      for k, v in batch.items()
                                      if k in ("input_ids", "attention_mask",
                                               "labels")})
            losses.append(float(l))
            accs.append(float(a))
        return {"loss": float(np.mean(losses)) if losses else 0.0,
                "accuracy": float(np.mean(accs)) if accs else 0.0}

    return eval_fn


def train(csv_path: str, out_dir: str = "roberta_detective_best",
          epochs: int = 5, batch_size: int = 16, lr: float = 2e-5,
          max_len: int = 256, det_cfg: Optional[DetectorConfig] = None,
          params: Optional[Dict] = None, max_samples: Optional[int] = None,
          head: str = "misinfo_head", freeze_backbone: bool = False,
          precision: str = "bfloat16", pack: bool = False,
          mesh_spec: Optional[str] = None, log=print):
    det_cfg = det_cfg or DetectorConfig()
    # training keeps HF-exact erf GELU even in bf16 (the tanh swap is a
    # serving-only optimization, core/config.py PrecisionConfig.gelu_mode)
    policy = Policy(PrecisionConfig(compute_dtype=precision, gelu_mode="erf"))
    if params is None:
        params = detector_init(jax.random.PRNGKey(0), det_cfg)
    else:
        # own the caller's params: the train step donates its input buffers
        params = jax.tree_util.tree_map(jnp.array, params)

    # multi-chip training (SURVEY.md §2.5 consequence): '--mesh data=N'
    # batch-shards minibatches (DP; GSPMD psums grads over ICI), an optional
    # model=M adds Megatron TP on the towers (parallel/sharding.py)
    from misinfo_tpu.core.mesh import setup_train_mesh
    mesh, params = setup_train_mesh(mesh_spec, params, batch_size)

    samples = load_csv_samples(csv_path, max_samples=max_samples)
    train_s, val_s = split_train_val(samples, 0.2, seed=42)
    rt = load_roberta_tokenizer(None, det_cfg.roberta.vocab_size)
    ct = load_clip_tokenizer(None, det_cfg.clip.vocab_size)

    def mk(ds_samples, train_mode, seed):
        return MisinfoDataset(ds_samples, rt, ct, train=train_mode,
                              roberta_len=max_len, clip_len=det_cfg.clip.max_text_len,
                              image_size=det_cfg.clip.image_size, seed=seed)

    train_ds, val_ds = mk(train_s, True, 0), mk(val_s, False, 1)
    steps_per_epoch = max(1, len(train_ds) // batch_size)

    trainable = ["roberta", "ai_head", "misinfo_head"]
    if freeze_backbone:
        trainable = [head]
    tx = make_optimizer(
        OptimConfig(lr=lr, weight_decay=0.01, warmup_fraction=0.1,
                    total_steps=steps_per_epoch * epochs, clip_norm=1.0),
        trainable_mask=branch_mask(params, trainable))
    opt_state = tx.init(params)
    if pack:
        # perf mode: ragged sequences packed into batch_size rows of
        # max_len under segment attention (steps scale with token sum;
        # batch composition differs from the reference recipe, so the
        # cosine schedule length stays the unpacked upper bound)
        from misinfo_tpu.train.steps import make_packed_text_head_step
        step = make_packed_text_head_step(tx, det_cfg, policy, head=head)
    else:
        step = make_text_head_step(tx, det_cfg, policy, head=head)

    def _place(b: Dict) -> Dict:
        if mesh is None:
            return {k: jnp.asarray(v) for k, v in b.items()}
        from misinfo_tpu.core.mesh import shard_batch
        return shard_batch(mesh, {k: np.asarray(v) for k, v in b.items()})

    def train_batches():
        from misinfo_tpu.train.datasets import prefetch
        if pack:
            gen = (_place(b) for b in train_ds.packed_batches(
                       n_rows=batch_size, n_slots=batch_size * 4))
        else:
            gen = (_place({k: v for k, v in b.items()
                           if k in ("input_ids", "attention_mask", "labels")})
                   for b in train_ds.batches(batch_size, drop_remainder=True))
        yield from prefetch(gen)

    def val_batches():
        from misinfo_tpu.train.harness import eval_batches
        yield from eval_batches(
            lambda bs: val_ds.batches(bs, shuffle=False, drop_remainder=True),
            len(val_ds), batch_size)

    def ckpt(params, opt_state, epoch, metrics):
        from misinfo_tpu.checkpoints.io import save_checkpoint
        save_checkpoint(out_dir, params, opt_state,
                        {"epoch": epoch, **metrics, "trainer": "roberta_detective"})

    result = run_training(
        params, opt_state, step, train_batches,
        make_eval_fn(det_cfg, policy, val_batches, head),
        epochs=epochs, select_metric="loss", select_mode="min",
        early_stop_patience=3, checkpoint_fn=ckpt, log=log)
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description="RoBERTa misinfo detective trainer (TPU)")
    p.add_argument("--csv", required=True, help="CSV with text,label columns")
    p.add_argument("--out", default="roberta_detective_best")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--max-len", type=int, default=256)
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--pack", action="store_true",
                   help="sequence-packed batches (perf mode; see docs/PERF.md)")
    p.add_argument("--mesh", default=None,
                   help="device mesh for multi-chip training, e.g. "
                        "'data=8' or 'data=4,model=2'")
    p.add_argument("--device", choices=["auto", "cpu", "tpu"], default="auto",
                   help="platform override; cpu + --mesh uses virtual "
                        "devices (validation without a TPU slice)")
    args = p.parse_args(argv)
    from misinfo_tpu.core.mesh import apply_device_override
    apply_device_override(args.device, args.mesh)
    train(args.csv, args.out, args.epochs, args.batch_size, args.lr,
          args.max_len, max_samples=args.max_samples, pack=args.pack,
          mesh_spec=args.mesh)


if __name__ == "__main__":
    main()
