"""Multi-chip tests on the 8-virtual-device CPU mesh: the fused serving
program under data (+model) sharding must produce the same scores as the
single-device run, and the sharded training step must run."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from misinfo_tpu.core.config import ForensicsConfig, MeshConfig, PrecisionConfig
from misinfo_tpu.core.mesh import make_mesh
from misinfo_tpu.engine.signals import signals_program
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.ops.common import Policy
from misinfo_tpu.parallel.sharding import batch_pspecs, detector_pspecs

DET = DetectorConfig.tiny()
F32 = Policy(PrecisionConfig.highest())
CFG = ForensicsConfig(verbose=False).replace(precision=PrecisionConfig.highest())


def _batch(B=8):
    rng = np.random.default_rng(0)
    s = DET.clip.image_size
    emb = rng.normal(size=(128, DET.clip.projection_dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return {
        "roberta_ids": jnp.asarray(
            rng.integers(3, DET.roberta.vocab_size, (B, 16)), jnp.int32),
        "roberta_mask": jnp.ones((B, 16), jnp.int32),
        "clip_ids": jnp.asarray(
            rng.integers(1, DET.clip.vocab_size - 2, (B, 16)), jnp.int32),
        "clip_mask": jnp.ones((B, 16), jnp.int32),
        "image_effnet": jnp.asarray(rng.integers(0, 255, (B, s, s, 3)), jnp.uint8),
        "image_clip": jnp.asarray(rng.integers(0, 255, (B, s, s, 3)), jnp.uint8),
        "vault_emb": jnp.asarray(emb),
        "vault_valid": jnp.asarray(np.arange(128) < 7),
        "vault_text_emb": jnp.asarray(emb),
    }


@pytest.mark.parametrize("model_axis", [1, 2])
def test_sharded_serving_matches_single_device(model_axis):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    params = detector_init(jax.random.PRNGKey(0), DET)
    batch = _batch()

    import functools
    fn = functools.partial(signals_program, variant="full", det_cfg=DET,
                           cfg=CFG, policy=F32)
    single = jax.jit(fn)(params, batch)

    mesh = make_mesh(MeshConfig(model=model_axis))
    pspecs = detector_pspecs(params)
    params_s = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, pspecs)
    bspecs = batch_pspecs(batch)
    batch_s = {k: jax.device_put(v, NamedSharding(mesh, bspecs[k]))
               for k, v in batch.items()}
    sharded = jax.jit(fn)(params_s, batch_s)

    np.testing.assert_allclose(np.asarray(sharded.fake_probability),
                               np.asarray(single.fake_probability), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sharded.clip_similarity),
                               np.asarray(single.clip_similarity), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sharded.vault_top_idx),
                                  np.asarray(single.vault_top_idx))


def test_tensor_parallel_pspecs_cover_attention():
    """Sanity: TP specs actually mark attention/FFN kernels for sharding."""
    params = detector_init(jax.random.PRNGKey(0), DET)
    specs = detector_pspecs(params)
    qspec = specs["roberta"]["layers"][0]["attn"]["q"]["kernel"]
    ospec = specs["roberta"]["layers"][0]["attn"]["o"]["kernel"]
    mspec = specs["roberta"]["layers"][0]["mlp_in"]["kernel"]
    assert qspec == P(None, "model")
    assert ospec == P("model", None)
    assert mspec == P(None, "model")
    # embeddings replicate
    assert specs["roberta"]["embeddings"]["word"] == P()


def test_graft_dryrun_entrypoint():
    """The driver's dryrun contract end-to-end (small device count)."""
    import __graft_entry__ as g

    g.dryrun_multichip(4)


@pytest.mark.parametrize("spec", ["data=8", "data=4,model=2"])
def test_trainer_mesh_flag_end_to_end(tmp_path, spec):
    """`--mesh` DP/TP training on the virtual 8-device mesh: the C15
    trainer runs a real epoch with sharded params/batches and writes an
    engine-loadable checkpoint."""
    import pandas as pd

    from misinfo_tpu.models.detector import DetectorConfig
    from misinfo_tpu.train.roberta_detective import train

    rng = np.random.default_rng(0)
    rows = [{"text": f"sample headline {i} " * (1 + i % 3),
             "label": int(rng.integers(0, 2))} for i in range(40)]
    csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    out = str(tmp_path / "ckpt")
    res = train(str(csv), out, epochs=1, batch_size=8, max_len=16,
                det_cfg=DetectorConfig.tiny(), precision="float32",
                mesh_spec=spec, log=lambda *a, **k: None)
    assert np.isfinite(res.best_metric)

    from misinfo_tpu.checkpoints.io import load_checkpoint
    from misinfo_tpu.models.detector import detector_init
    tpl = detector_init(jax.random.PRNGKey(0), DetectorConfig.tiny())
    loaded = load_checkpoint(out, tpl)
    assert loaded is not None


def test_parse_mesh_spec():
    from misinfo_tpu.core.mesh import parse_mesh_spec

    assert parse_mesh_spec("data=8").data == 8
    c = parse_mesh_spec("data=4,model=2")
    assert (c.data, c.model) == (4, 2)
    assert parse_mesh_spec("8").data == 8
    with pytest.raises(ValueError):
        parse_mesh_spec("pipeline=2")


def test_parse_mesh_spec_rejects_bad_negatives():
    from misinfo_tpu.core.mesh import parse_mesh_spec

    assert parse_mesh_spec("data=-1").data == -1   # 'all devices'
    for bad in ("data=-5", "model=0", "model=-1", "data=0"):
        with pytest.raises(ValueError):
            parse_mesh_spec(bad)


def test_init_multihost_single_process_noop():
    """No args + no env hints → clean no-op (single-process serving and
    the test environment must never try to spin up a coordinator)."""
    from misinfo_tpu.core import mesh as m

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        assert var not in __import__("os").environ
    assert m.init_multihost() is False
    assert jax.device_count() == 8  # backend untouched


def test_trainer_mesh_with_packing(tmp_path):
    """--mesh + --pack together: packed batches (segment attention, CLS
    gathers) shard over the data axis without shape errors."""
    import pandas as pd

    from misinfo_tpu.models.detector import DetectorConfig
    from misinfo_tpu.train.roberta_detective import train

    rng = np.random.default_rng(3)
    rows = [{"text": "word " * int(rng.integers(2, 12)),
             "label": int(rng.integers(0, 2))} for i in range(40)]
    csv = tmp_path / "train.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    res = train(str(csv), str(tmp_path / "ckpt"), epochs=1, batch_size=8,
                max_len=16, det_cfg=DetectorConfig.tiny(),
                precision="float32", mesh_spec="data=8", pack=True,
                log=lambda *a, **k: None)
    assert np.isfinite(res.best_metric)
