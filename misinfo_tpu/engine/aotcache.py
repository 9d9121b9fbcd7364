"""AOT-serialized executable cache for restart-to-ready.

The persistent XLA compilation cache (core/cache.py) removes the backend
*compile*, but a restarted process still pays, per warmed signature,
(a) the Python trace + StableHLO lowering and (b) the cache-read +
executable-load RPC — measured at ~1.4 s + ~1.5-2.4 s per full-modality
signature through this image's relay, vs ~1.1-1.2 s for
`jax.experimental.serialize_executable.deserialize_and_load` of the same
program (docs/PERF.md restart-attribution row: AOT load replaces the
lower+compile pair at −40%/signature). This module is that recorded
lever: warmup serializes each compiled signature to disk once, and every
later boot deserializes straight onto the device — no trace, no lower,
no compile-cache RPC.

Scope and safety:

- Opt-in (`ServingConfig.aot_cache` / `MISINFO_TPU_AOT=1`): serialized
  executables are large (tens of MB per full-modality signature on TPU),
  so the default grid stays on the persistent compile cache and
  deployments opt the *priority* signatures in — the serve-while-warming
  default buckets are exactly the set whose time-to-ready gates the API
  opening (serve/api.py `--warmup background`).
- Single-chip only: the engine constructs the cache only when it has no
  mesh (sharded executables bake device assignments that a restarted
  process may not reproduce).
- TPU (PJRT executable serialization) is the supported restart path.
  The XLA:CPU backend can DESERIALIZE an executable cross-process yet
  fail to execute it (machine-feature/AOT-loader limitations in this
  jaxlib); registration is therefore gated on one successful
  synchronous execution at warmup — a failing executable is
  invalidated and the signature falls back to the compile path.
- Keyed on everything that changes the compiled program: jax/jaxlib
  versions, backend platform + device kind + device count, the variant
  name, every (path, shape, dtype) of the param pytree and the batch,
  and the reprs of the model/precision/serving configs. Any mismatch is
  a clean miss; any load error falls back to the normal jit path (and
  removes the unreadable file).

The reference has no analogue — it pays its first-request compile per
process with no warmup at all (misinfo_forensics.py:117-253).
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import tempfile
from typing import Dict, Optional

log = logging.getLogger("misinfo_tpu.aot")

_FORMAT = 1  # bump to invalidate every existing entry


def default_aot_dir() -> str:
    """`MISINFO_TPU_AOT_DIR`, else an `aot/` subdir of the persistent
    compile cache's directory (same repo-root / tmpdir fallback rules)."""
    d = os.environ.get("MISINFO_TPU_AOT_DIR")
    if d:
        return d
    base = os.environ.get("MISINFO_TPU_CACHE_DIR")
    if base is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        base = os.path.join(repo, ".jax_cache")
    return os.path.join(base, "aot")


def shape_key(batch: Dict) -> tuple:
    """Dispatch-time signature of a batch dict — must be identical between
    warmup registration and the serving dispatch path (both build the
    batch the same way: engine._dispatch_group / warmup._run_one)."""
    return tuple(sorted((k, tuple(v.shape), str(v.dtype))
                        for k, v in batch.items()))


def _leaf_spec(tree) -> list:
    import jax
    return [(jax.tree_util.keystr(path), tuple(leaf.shape), str(leaf.dtype))
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree)]


class AotCache:
    """Disk registry of serialized compiled executables, one file per
    (environment × config × variant × input-shapes) digest."""

    def __init__(self, directory: Optional[str] = None,
                 fingerprint: str = ""):
        self.dir = directory or default_aot_dir()
        self.fingerprint = fingerprint
        self.stats = {"hits": 0, "misses": 0, "saves": 0, "errors": 0,
                      "bytes_loaded": 0, "bytes_saved": 0}
        try:
            os.makedirs(self.dir, exist_ok=True)
        except OSError:
            self.dir = os.path.join(tempfile.gettempdir(), "misinfo_aot")
            os.makedirs(self.dir, exist_ok=True)

    @staticmethod
    def environment_fingerprint(det_cfg, cfg, policy, use_pallas: bool,
                                params) -> str:
        """Everything that changes compiled-program identity besides the
        batch shapes. Config dataclasses are frozen with deterministic
        reprs; the param spec pins every leaf's shape/dtype (so e.g. an
        int8_ffn-quantized tree never collides with the bf16 tree)."""
        import jax
        import jaxlib
        dev = jax.devices()[0]
        parts = [
            f"fmt={_FORMAT}", f"jax={jax.__version__}",
            f"jaxlib={jaxlib.__version__}",
            f"platform={dev.platform}", f"kind={dev.device_kind}",
            f"ndev={jax.device_count()}",
            f"pallas={use_pallas}",
            repr(det_cfg), repr(cfg.precision), repr(cfg.seq),
            repr(cfg.serving), repr(cfg.thresholds), repr(cfg.video),
            repr(_leaf_spec(params)),
        ]
        return hashlib.sha256("|".join(parts).encode()).hexdigest()

    def digest(self, variant: str, batch: Dict) -> str:
        payload = f"{self.fingerprint}|{variant}|{shape_key(batch)!r}"
        return hashlib.sha256(payload.encode()).hexdigest()

    def _path(self, digest: str) -> str:
        return os.path.join(self.dir, digest + ".aotx")

    def load(self, digest: str):
        """Deserialize-and-load an executable, or None on miss/error."""
        path = self._path(digest)
        if not os.path.exists(path):
            self.stats["misses"] += 1
            return None
        try:
            import jax
            from jax.experimental.serialize_executable import (
                deserialize_and_load)
            with open(path, "rb") as f:
                entry = pickle.load(f)
            # pin execution to the serving device: the default is ALL
            # local devices, which mis-shards single-device executables
            # on multi-device backends (e.g. the 8-virtual-CPU test mesh)
            loaded = deserialize_and_load(entry["payload"],
                                          entry["in_tree"],
                                          entry["out_tree"],
                                          execution_devices=[
                                              jax.devices()[0]])
            self.stats["hits"] += 1
            self.stats["bytes_loaded"] += len(entry["payload"])
            return loaded
        except Exception as e:
            self.stats["errors"] += 1
            log.warning("AOT entry %s unreadable (%s: %s) — removing; "
                        "falling back to compile", path,
                        type(e).__name__, e)
            try:
                os.remove(path)
            except OSError:
                pass
            return None

    def invalidate(self, digest: str, err: Exception) -> None:
        """Drop an entry whose executable deserialized but failed to run
        (backend AOT limitations — e.g. XLA:CPU cross-process loads); the
        caller falls back to the compile path and re-serializes."""
        self.stats["errors"] += 1
        log.warning("AOT executable %s failed to execute (%s: %s) — "
                    "invalidating; falling back to compile",
                    digest[:12], type(err).__name__, err)
        try:
            os.remove(self._path(digest))
        except OSError:
            pass

    def save(self, digest: str, compiled) -> bool:
        """Serialize a compiled executable; atomic write (restartable
        warmups and parallel warmup workers may race on one digest)."""
        try:
            from jax.experimental.serialize_executable import serialize
            payload, in_tree, out_tree = serialize(compiled)
            blob = pickle.dumps({"payload": payload, "in_tree": in_tree,
                                 "out_tree": out_tree})
            fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
            os.replace(tmp, self._path(digest))
            self.stats["saves"] += 1
            self.stats["bytes_saved"] += len(payload)
            return True
        except Exception as e:
            self.stats["errors"] += 1
            log.warning("AOT serialize failed (%s: %s) — signature stays "
                        "on the persistent compile cache",
                        type(e).__name__, e)
            return False
