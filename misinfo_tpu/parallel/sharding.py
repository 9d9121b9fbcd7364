"""Partitioning rules: how the detector maps onto a (data, model) mesh.

The reference has zero distributed logic (SURVEY.md §2.5); this module is
the designed-for-TPU replacement:

* **data axis** — batch dimension of every request tensor (and of training
  minibatches). Pure replication of params + batch sharding = classic DP;
  XLA inserts psum for gradients automatically under jit.
* **model axis** — Megatron-style tensor parallelism on the transformer
  towers: `q/k/v` and `mlp_in` kernels column-sharded (output features),
  `o` and `mlp_out` row-sharded (input features), so each attention/FFN
  pair needs a single all-reduce which GSPMD places on ICI.
* vault rows may shard on `data` for giant vaults (vault/search.py).

Pipeline / sequence / expert parallelism are intentionally out of scope:
this workload's models fit one chip many times over, sequence lengths are
≤512 (SURVEY.md §5 "long-context: N/A"), and there are no MoE layers. The
long axes — video frames (≤12) and vault rows — are handled by batching
and row-sharding respectively, not by PP/SP/EP.

Everything is expressed as PartitionSpecs; no hand-written collectives on
this path — GSPMD chooses ppermute/all-gather/reduce-scatter.
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path, leaf) -> P:
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    keys = [str(k) for k in keys if k is not None]
    joined = "/".join(keys)
    ndim = getattr(leaf, "ndim", 0)

    # transformer tensor parallelism (roberta + clip towers). int8-serving
    # pytrees carry {kernel_q [in,out], w_scale [out]} in place of {kernel}
    # (ops/quant.py); kernel_q shards exactly like kernel and w_scale like
    # an output-dim bias, so quantized serving composes with TP.
    leaf = keys[-1]
    kernel_like = leaf in ("kernel", "kernel_q") and ndim == 2
    outvec_like = leaf in ("bias", "w_scale")
    if "attn" in keys:
        which = keys[keys.index("attn") + 1] if keys.index("attn") + 1 < len(keys) else ""
        if kernel_like:
            if which in ("q", "k", "v", "qkv"):
                return P(None, "model")
            if which == "o":
                return P("model", None)
        if outvec_like:
            if which in ("q", "k", "v", "qkv"):
                return P("model")
            return P()
    if kernel_like:
        if "mlp_in" in keys:
            return P(None, "model")
        if "mlp_out" in keys:
            return P("model", None)
    if outvec_like and "mlp_in" in keys:
        return P("model")

    # embeddings / norms / convs / heads: replicated
    return P()


def detector_pspecs(params: Dict) -> Dict:
    """PartitionSpec pytree mirroring the detector param tree."""
    return jax.tree_util.tree_map_with_path(_spec_for_path, params)


def shard_params(mesh: Mesh, params: Dict) -> Dict:
    """Place params on the mesh per detector_pspecs."""
    specs = detector_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def batch_pspecs(batch: Dict) -> Dict:
    """Batch tensors shard on data; vault tensors replicate."""
    out = {}
    for k, v in batch.items():
        if k.startswith("vault"):
            out[k] = P()
        else:
            out[k] = P("data", *([None] * (v.ndim - 1)))
    return out


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    specs = batch_pspecs(batch)
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in batch.items()}
