"""misinfo_tpu — TPU-native multi-modal misinformation forensics framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`yashingle-ai/Multi-Modal-Misinformation-Detection-with-Explanation-Generation`
(see SURVEY.md at the repo root for the full component map). The serving
surface is `misinfo_tpu.engine.MisinfoForensics`, whose `analyze()` contract
matches the reference orchestrator (reference: misinfo_forensics.py:767-927)
while executing all five forensic signals as a single fused XLA program on a
TPU device mesh.

Layout
------
core/         config tree, mesh/topology, dtype policy, PRNG helpers
ops/          Pallas TPU kernels + fused ops (attention, layernorm, kNN)
models/       pure-JAX functional models (RoBERTa, CLIP, EfficientNet-B0,
              fusion MLP, Whisper)
preprocess/   byte-level BPE tokenizers, image/video/audio frontends
vault/        Truth-Vault embedding store + on-device top-k search
engine/       batched forensics engine (analyze facade, signal program,
              explanation generation)
parallel/     jax.sharding mesh specs, data/tensor-parallel partitioning
train/        optax trainers replicating the reference training scripts
checkpoints/  orbax checkpointing + torch .pth converter
serve/        CLI + dashboard + transcript extraction
"""

__version__ = "0.1.0"

import os as _os

# Platform escape hatch: some TPU plugin stacks (e.g. the axon tunnel)
# override JAX_PLATFORMS programmatically at interpreter start, making the
# standard env var ineffective. MISINFO_TPU_PLATFORM=cpu forces the backend
# via jax.config before first use (harmless no-op if already initialized).
_plat = _os.environ.get("MISINFO_TPU_PLATFORM")
if _plat:
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _plat)
        _ndev = _os.environ.get("MISINFO_TPU_NUM_CPU_DEVICES")
        if _ndev and _plat == "cpu":
            _jax.config.update("jax_num_cpu_devices", int(_ndev))
    except Exception:
        pass

from misinfo_tpu.core.config import ForensicsConfig  # noqa: F401
