"""Optimizer construction replicating the reference trainers' recipes
with optax: AdamW + cosine schedule (optional warmup fraction), global-norm
grad clipping, and per-branch freeze masks via `optax.masked`
(the reference freezes with requires_grad flags, e.g.
train_ai_head.py:411-429, train_fusion_judge.py:144-149).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import optax


@dataclass(frozen=True)
class OptimConfig:
    lr: float = 2e-5
    weight_decay: float = 0.01
    warmup_fraction: float = 0.1      # reference train_roberta_detective.py (10% warmup)
    total_steps: int = 1000
    clip_norm: Optional[float] = 1.0  # reference grad-clip 1.0
    schedule: str = "cosine"          # 'cosine' | 'constant'
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8


def make_schedule(cfg: OptimConfig):
    if cfg.schedule == "constant":
        return cfg.lr
    warmup = max(0, int(cfg.total_steps * cfg.warmup_fraction))
    if warmup > 0:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.lr, warmup_steps=warmup,
            decay_steps=cfg.total_steps)
    return optax.cosine_decay_schedule(cfg.lr, cfg.total_steps)


def make_optimizer(cfg: OptimConfig,
                   trainable_mask=None) -> optax.GradientTransformation:
    """`trainable_mask`: pytree of bools (True=train) matching the params;
    frozen leaves get zero updates — the freeze-mask analogue of the
    reference's requires_grad=False pattern."""
    chain = []
    if cfg.clip_norm:
        chain.append(optax.clip_by_global_norm(cfg.clip_norm))
    chain.append(optax.adamw(make_schedule(cfg), b1=cfg.b1, b2=cfg.b2,
                             eps=cfg.eps, weight_decay=cfg.weight_decay))
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        # NB: optax.masked leaves non-selected updates AS-IS (raw grads),
        # so frozen leaves must be explicitly zeroed first.
        inverted = jax.tree_util.tree_map(lambda t: not t, trainable_mask)
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), inverted),
            optax.masked(tx, trainable_mask),
        )
    return tx


def branch_mask(params, trainable_branches: Sequence[str]):
    """Mask pytree: True for leaves under any of `trainable_branches`
    (top-level detector branch names)."""
    return {k: jax.tree_util.tree_map(lambda _: k in trainable_branches, v)
            for k, v in params.items()}
