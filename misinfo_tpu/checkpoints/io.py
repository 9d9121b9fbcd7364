"""Native checkpointing (orbax) for params + optimizer state + metadata.

Replaces the reference's `torch.save` dict checkpoints (SURVEY.md §5
"Checkpoint / resume"): every trainer saves {params, opt_state, epoch,
metrics} with best-by-val-loss or best-by-accuracy policies; inference
loads params-only. The torch `.pth` ingestion path lives in
torch_convert.py; this module is the TPU-native format.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params, opt_state=None,
                    metadata: Optional[Dict[str, Any]] = None) -> None:
    """Save via orbax when available, else a portable npz+json fallback."""
    os.makedirs(path, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(os.path.abspath(path), "params"),
                   _to_numpy_tree(params), force=True)
        ckptr.wait_until_finished()
        if opt_state is not None:
            flat, _ = jax.tree_util.tree_flatten(opt_state)
            np.savez(os.path.join(path, "opt_state.npz"),
                     *[np.asarray(x) for x in flat])
    except Exception:
        flat, treedef = jax.tree_util.tree_flatten(params)
        np.savez(os.path.join(path, "params_flat.npz"),
                 *[np.asarray(x) for x in flat])
        with open(os.path.join(path, "treedef.txt"), "w") as f:
            f.write(str(treedef))
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(metadata or {}, f, indent=2, default=str)


def load_checkpoint(path: str, params_like) -> Optional[Dict]:
    """Restore params matching the structure of `params_like`."""
    if not os.path.isdir(path):
        return None
    pdir = os.path.join(os.path.abspath(path), "params")
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(pdir, _to_numpy_tree(params_like))
    except Exception:
        npz = os.path.join(path, "params_flat.npz")
        if not os.path.exists(npz):
            return None
        data = np.load(npz)
        flat = [data[k] for k in data.files]
        treedef = jax.tree_util.tree_structure(params_like)
        return jax.tree_util.tree_unflatten(treedef, flat)


def load_opt_state(path: str, opt_state_like) -> Optional[object]:
    """Restore optimizer state saved by save_checkpoint → enables training
    resume (the reference checkpoints optimizer state too,
    train_roberta_detective.py:309-318, but never reloads it; we do)."""
    npz = os.path.join(path, "opt_state.npz")
    if not os.path.exists(npz):
        return None
    data = np.load(npz, allow_pickle=False)
    flat = [data[k] for k in data.files]
    treedef = jax.tree_util.tree_structure(opt_state_like)
    leaves_like = jax.tree_util.tree_leaves(opt_state_like)
    if len(flat) != len(leaves_like):
        return None
    cast = [np.asarray(x, dtype=np.asarray(l).dtype).reshape(np.asarray(l).shape)
            if hasattr(l, "shape") else x
            for x, l in zip(flat, leaves_like)]
    return jax.tree_util.tree_unflatten(treedef, cast)


def load_metadata(path: str) -> Dict:
    p = os.path.join(path, "metadata.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}
