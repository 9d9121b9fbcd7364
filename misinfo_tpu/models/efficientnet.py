"""EfficientNet-B0 visual forensics branch, pure functional JAX (NHWC).

Re-implements C3 of SURVEY.md §2.1: torchvision `efficientnet_b0` with the
classifier replaced by Dropout(0.2)+Linear(1280,2) (reference
misinfo_forensics.py:72-75). Architecture follows torchvision's layout —
symmetric (k-1)//2 conv padding, SiLU activations, SE squeeze channels
``max(1, block_input_channels // 4)``, residual + stochastic-depth only when
stride==1 and in==out — so torchvision `.pth` checkpoints convert key-for-key
(checkpoints/torch_convert.py). Validated against a spec-replica built with
plain torch in tests/test_efficientnet_parity.py.

Convs run as NHWC `lax.conv_general_dilated` (XLA maps them onto the MXU);
1×1 convs are expressed as matmuls. BatchNorm uses running stats at
inference and batch stats (+updated running state) in training.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from misinfo_tpu.ops.common import DEFAULT_POLICY, Policy, dense, dense_init, silu

# (expand_ratio, kernel, stride, in_ch, out_ch, num_blocks) — B0 stage table.
# Stage repeats are the canonical [1, 2, 2, 3, 3, 4, 1] (16 MBConv blocks,
# torchvision _efficientnet_conf width/depth 1.0); the per-stage block
# counts and features.N key layout are asserted against that spec in
# tests/test_efficientnet_parity.py so a table typo cannot silently desync
# from real torchvision checkpoints again (a 4-block final stage shipped
# in rounds 1-2 — caught by review, fixed here).
B0_STAGES = (
    (1, 3, 1, 32, 16, 1),
    (6, 3, 2, 16, 24, 2),
    (6, 5, 2, 24, 40, 2),
    (6, 3, 2, 40, 80, 3),
    (6, 5, 1, 80, 112, 3),
    (6, 5, 2, 112, 192, 4),
    (6, 3, 1, 192, 320, 1),
)
STEM_CH = 32
HEAD_CH = 1280
BN_EPS = 1e-5
BN_MOMENTUM = 0.1
STOCHASTIC_DEPTH_P = 0.2  # torchvision default, linearly scaled per block


def _bn_init(ch: int) -> Dict:
    return {"scale": jnp.ones((ch,), jnp.float32),
            "bias": jnp.zeros((ch,), jnp.float32),
            "mean": jnp.zeros((ch,), jnp.float32),
            "var": jnp.ones((ch,), jnp.float32)}


def _conv_init(key, k: int, cin: int, cout: int, groups: int = 1) -> jnp.ndarray:
    fan_in = k * k * cin // groups
    std = float(np.sqrt(2.0 / (k * k * cout)))  # torchvision kaiming fan_out
    return jax.random.normal(key, (k, k, cin // groups, cout)) * std


def _block_cfgs() -> List[Dict]:
    cfgs = []
    for e, k, s, cin, cout, n in B0_STAGES:
        for b in range(n):
            cfgs.append({
                "expand": e, "kernel": k,
                "stride": s if b == 0 else 1,
                "cin": cin if b == 0 else cout,
                "cout": cout,
            })
    return cfgs


BLOCK_CFGS = _block_cfgs()


def effnet_b0_init(key, num_classes: int = 2) -> Dict:
    ks = iter(jax.random.split(key, 5 * len(BLOCK_CFGS) + 8))
    params: Dict = {
        "stem": {"conv": _conv_init(next(ks), 3, 3, STEM_CH), "bn": _bn_init(STEM_CH)},
        "blocks": [],
    }
    for c in BLOCK_CFGS:
        cin, cout, e, k = c["cin"], c["cout"], c["expand"], c["kernel"]
        exp_ch = cin * e
        sq_ch = max(1, cin // 4)
        blk: Dict = {}
        if e != 1:
            blk["expand"] = {"conv": _conv_init(next(ks), 1, cin, exp_ch),
                             "bn": _bn_init(exp_ch)}
        blk["dw"] = {"conv": _conv_init(next(ks), k, exp_ch, exp_ch, groups=exp_ch),
                     "bn": _bn_init(exp_ch)}
        blk["se"] = {
            "fc1": {"kernel": _conv_init(next(ks), 1, exp_ch, sq_ch).reshape(exp_ch, sq_ch),
                    "bias": jnp.zeros((sq_ch,), jnp.float32)},
            "fc2": {"kernel": _conv_init(next(ks), 1, sq_ch, exp_ch).reshape(sq_ch, exp_ch),
                    "bias": jnp.zeros((exp_ch,), jnp.float32)},
        }
        blk["project"] = {"conv": _conv_init(next(ks), 1, exp_ch, cout),
                          "bn": _bn_init(cout)}
        params["blocks"].append(blk)
    params["head"] = {"conv": _conv_init(next(ks), 1, 320, HEAD_CH),
                      "bn": _bn_init(HEAD_CH)}
    params["classifier"] = dense_init(next(ks), HEAD_CH, num_classes)
    return params


def _conv(x, kernel, stride: int, groups: int = 1, policy=DEFAULT_POLICY):
    k = kernel.shape[0]
    pad = (k - 1) // 2
    # output dtype = policy.compute directly (NOT accum-then-cast): the MXU
    # accumulates f32 internally either way, so TPU results are identical
    # with one rounding — and conv's TRANSPOSE rule requires same-dtype
    # operands, so an f32 conv output from bf16 operands makes every bf16
    # TRAINING step fail pairing the f32 cotangent with the bf16 kernel
    # (latent until tools/bench_train.py exercised the CIFAKE trainer's
    # default precision="bfloat16"; f32 parity mode has compute == accum
    # and is byte-identical to the old form)
    return jax.lax.conv_general_dilated(
        x.astype(policy.compute), kernel.astype(policy.compute),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=policy.compute,
        precision=policy.precision,
    ).astype(policy.compute)


def _bn(bn: Dict, x, *, train: bool, policy=DEFAULT_POLICY):
    """Returns (y, batch_stats or None). Normalization math in f32."""
    xf = x.astype(jnp.float32)
    if train:
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
    else:
        mean, var = bn["mean"], bn["var"]
    y = (xf - mean) * jax.lax.rsqrt(var + BN_EPS) * bn["scale"] + bn["bias"]
    return y.astype(policy.compute), ((mean, var) if train else None)


def _update_bn_state(bn: Dict, batch_stats, n_elem: int) -> Dict:
    mean, var = batch_stats
    unbiased = var * (n_elem / max(1, n_elem - 1))
    return {
        **bn,
        "mean": (1 - BN_MOMENTUM) * bn["mean"] + BN_MOMENTUM * mean,
        "var": (1 - BN_MOMENTUM) * bn["var"] + BN_MOMENTUM * unbiased,
    }


def _se(se: Dict, x, policy=DEFAULT_POLICY):
    """Squeeze-excitation: global avg pool → fc1 → SiLU → fc2 → sigmoid."""
    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    h = silu(dense(se["fc1"], pooled.astype(policy.compute), policy))
    gate = jax.nn.sigmoid(dense(se["fc2"], h, policy).astype(jnp.float32))
    return x * gate[:, None, None, :].astype(x.dtype)


def effnet_apply(
    params: Dict,
    images: jax.Array,               # [B,H,W,3] normalized NHWC
    *,
    train: bool = False,
    rng=None,
    policy: Policy = DEFAULT_POLICY,
    dropout_rate: float = 0.2,       # reference misinfo_forensics.py:74
) -> Tuple[jax.Array, Optional[Dict]]:
    """→ (logits [B,num_classes] f32, new_bn_params or None)."""
    new_params = {"blocks": []} if train else None

    x = _conv(images, params["stem"]["conv"], 2, policy=policy)
    x, stats = _bn(params["stem"]["bn"], x, train=train, policy=policy)
    if train:
        n = x.shape[0] * x.shape[1] * x.shape[2]
        new_params["stem_bn"] = _update_bn_state(params["stem"]["bn"], stats, n)
    x = silu(x)

    num_blocks = len(params["blocks"])
    for bi, (blk, cfg) in enumerate(zip(params["blocks"], BLOCK_CFGS)):
        inp = x
        new_blk: Dict = {}
        if "expand" in blk:
            x = _conv(x, blk["expand"]["conv"], 1, policy=policy)
            x, stats = _bn(blk["expand"]["bn"], x, train=train, policy=policy)
            if train:
                n = x.shape[0] * x.shape[1] * x.shape[2]
                new_blk["expand_bn"] = _update_bn_state(blk["expand"]["bn"], stats, n)
            x = silu(x)
        exp_ch = x.shape[-1]
        x = _conv(x, blk["dw"]["conv"], cfg["stride"], groups=exp_ch, policy=policy)
        x, stats = _bn(blk["dw"]["bn"], x, train=train, policy=policy)
        if train:
            n = x.shape[0] * x.shape[1] * x.shape[2]
            new_blk["dw_bn"] = _update_bn_state(blk["dw"]["bn"], stats, n)
        x = silu(x)
        x = _se(blk["se"], x, policy)
        x = _conv(x, blk["project"]["conv"], 1, policy=policy)
        x, stats = _bn(blk["project"]["bn"], x, train=train, policy=policy)
        if train:
            n = x.shape[0] * x.shape[1] * x.shape[2]
            new_blk["project_bn"] = _update_bn_state(blk["project"]["bn"], stats, n)
        if cfg["stride"] == 1 and cfg["cin"] == cfg["cout"]:
            if train and rng is not None:
                # stochastic depth (row mode), survival prob linearly decayed
                sd_p = STOCHASTIC_DEPTH_P * bi / num_blocks
                rng, k = jax.random.split(rng)
                keep = jax.random.bernoulli(k, 1.0 - sd_p, (x.shape[0], 1, 1, 1))
                x = jnp.where(keep, x / (1.0 - sd_p), 0.0).astype(x.dtype)
            x = x + inp
        if train:
            new_params["blocks"].append(new_blk)

    x = _conv(x, params["head"]["conv"], 1, policy=policy)
    x, stats = _bn(params["head"]["bn"], x, train=train, policy=policy)
    if train:
        n = x.shape[0] * x.shape[1] * x.shape[2]
        new_params["head_bn"] = _update_bn_state(params["head"]["bn"], stats, n)
    x = silu(x)

    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # global avg pool
    if train and rng is not None and dropout_rate > 0:
        rng, k = jax.random.split(rng)
        keep = jax.random.bernoulli(k, 1.0 - dropout_rate, pooled.shape)
        pooled = jnp.where(keep, pooled / (1.0 - dropout_rate), 0.0)
    logits = dense(params["classifier"], pooled.astype(policy.compute),
                   policy).astype(jnp.float32)
    return logits, new_params


def merge_bn_updates(params: Dict, new_state: Dict) -> Dict:
    """Fold the running-stat updates returned by a training step back into
    the param tree (functional analogue of torch BN's in-place update)."""
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    out["stem"] = {**params["stem"], "bn": new_state["stem_bn"]}
    blocks = []
    for blk, nb in zip(params["blocks"], new_state["blocks"]):
        b = dict(blk)
        if "expand_bn" in nb:
            b["expand"] = {**blk["expand"], "bn": nb["expand_bn"]}
        b["dw"] = {**blk["dw"], "bn": nb["dw_bn"]}
        b["project"] = {**blk["project"], "bn": nb["project_bn"]}
        blocks.append(b)
    out["blocks"] = blocks
    out["head"] = {**params["head"], "bn": new_state["head_bn"]}
    return out
