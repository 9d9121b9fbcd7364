"""Device mesh construction and sharding helpers.

The reference is strictly single-device (reference misinfo_forensics.py:127;
SURVEY.md §2.5 — no torch.distributed anywhere). Parallelism here is designed
TPU-first: a 2-D `(data, model)` jax.sharding.Mesh; batch dimensions shard on
`data`, transformer head/FFN dimensions optionally shard on `model`; XLA
GSPMD inserts the ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from misinfo_tpu.core.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    `data=-1` consumes all devices not claimed by `model`. Works identically
    on real TPU slices and on the CPU virtual-device backend used by tests
    (`--xla_force_host_platform_device_count`).
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, cfg.model)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    data = cfg.data if cfg.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, cfg.axis_names)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis on `data`, replicate the rest."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every array in `tree` with its leading axis sharded on `data`."""
    def _place(x):
        return jax.device_put(x, data_sharding(mesh, x.ndim))
    return jax.tree_util.tree_map(_place, tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def parse_mesh_spec(spec: str) -> MeshConfig:
    """Parse a CLI mesh spec: ``"data=8"``, ``"data=4,model=2"``, or a bare
    device count (data-parallel only). Used by the trainers' ``--mesh``."""
    spec = spec.strip()
    if spec.isdigit():
        return MeshConfig(data=int(spec), model=1)
    kv = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        k = k.strip()
        if k not in ("data", "model") or not v.strip().lstrip("-").isdigit():
            raise ValueError(f"bad mesh spec {spec!r}; use 'data=N[,model=M]'")
        kv[k] = int(v)
        # only data=-1 ('all remaining devices') is a legal non-positive
        # value; anything else is a typo that make_mesh would silently
        # reinterpret as 'all devices'
        if kv[k] < 1 and not (k == "data" and kv[k] == -1):
            raise ValueError(f"bad mesh spec {spec!r}: {k}={kv[k]} "
                             "(use positive counts, or data=-1 for all)")
    return MeshConfig(data=kv.get("data", -1), model=kv.get("model", 1))


def provision_cpu_devices(spec: str) -> MeshConfig:
    """CPU-backend virtual-device provisioning for a ``--mesh`` spec: parse
    it and raise JAX's CPU device count to data×model so the topology
    validates without a TPU slice. The shared rule behind every
    entrypoint's ``--device cpu --mesh …`` path (trainers, serve CLI, REST
    API). ``data=-1`` ("all remaining devices") contributes 1 to the count
    — it provisions nothing by itself. Must run before the JAX backend
    initializes. Returns the parsed MeshConfig."""
    mc = parse_mesh_spec(spec)
    need = max(mc.data, 1) * max(mc.model, 1)
    if need > 1:
        jax.config.update("jax_num_cpu_devices", need)
    return mc


def apply_device_override(device: str, mesh_spec: Optional[str] = None) -> None:
    """Shared ``--device`` preamble for every entrypoint (CLI, REST API,
    trainers): force the JAX platform (the axon plugin overrides plain
    JAX_PLATFORMS env selection, so this must be a config update before
    backend init), and under ``--device cpu --mesh …`` provision virtual
    CPU devices so the topology validates without a TPU slice."""
    if device == "auto":
        return
    jax.config.update("jax_platforms",
                      "cpu" if device == "cpu" else "tpu,axon")
    if device == "cpu" and mesh_spec:
        provision_cpu_devices(mesh_spec)


def setup_train_mesh(mesh_spec: Optional[str], params, batch_size: int):
    """Shared ``--mesh`` plumbing for every trainer (VERDICT r2 #2): parse
    the spec, build the (data, model) mesh, validate batch divisibility,
    and shard the detector params per parallel/sharding.py. Returns
    ``(mesh, params)`` — ``(None, params)`` unchanged when no spec."""
    if not mesh_spec:
        return None, params
    from misinfo_tpu.parallel.sharding import shard_params

    mesh = make_mesh(parse_mesh_spec(mesh_spec))
    n_data = mesh.shape["data"]
    if batch_size % n_data:
        raise ValueError(
            f"batch_size {batch_size} not divisible by data axis {n_data}")
    return mesh, shard_params(mesh, params)


def place_train_batch(mesh: Optional[Mesh], batch):
    """Host batch dict → device arrays: leading axis sharded on `data`
    under a mesh, plain device put otherwise."""
    import jax.numpy as jnp

    if mesh is None:
        return {k: jnp.asarray(v) for k, v in batch.items()}
    return shard_batch(mesh, {k: np.asarray(v) for k, v in batch.items()})


_MULTIHOST_READY = False


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> bool:
    """Initialize JAX's multi-process runtime so `make_mesh()` spans every
    host's devices (ICI within a slice, DCN across hosts — SURVEY.md §5
    'Distributed communication backend'). The reference has no distributed
    layer at all; this is the TPU-native equivalent of what NCCL/MPI init
    would be elsewhere.

    Call once per process before any backend use. Auto-detection covers
    exactly two sources: explicit arguments, or the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
    TPU-pod metadata detection (jax.distributed.initialize() with no
    arguments) is opted into with MISINFO_TPU_MULTIHOST=1 — it hangs at
    import on non-pod machines, so it must never run implicitly. Returns
    True when the multi-process runtime was initialized, False for the
    single-process no-op (no arguments and no env hints) or when already
    initialized.
    """
    global _MULTIHOST_READY
    if _MULTIHOST_READY:
        return False
    import os

    coordinator_address = coordinator_address or os.getenv(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.getenv("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.getenv("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        if os.getenv("MISINFO_TPU_MULTIHOST") in ("1", "true", "on"):
            # explicit opt-in: let JAX probe TPU-pod metadata itself
            jax.distributed.initialize()
            _MULTIHOST_READY = True
            return True
        return False  # single-process: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    _MULTIHOST_READY = True
    return True
