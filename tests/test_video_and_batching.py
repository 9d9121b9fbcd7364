"""Video signal program (frame batch axis + mean/mean/max aggregation) and
micro-batching server tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from misinfo_tpu.core.config import ForensicsConfig, PrecisionConfig
from misinfo_tpu.engine.signals import SignalPrograms, signals_program, video_program
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.ops.common import Policy

DET = DetectorConfig.tiny()
F32 = Policy(PrecisionConfig.highest())
CFG = ForensicsConfig(verbose=False).replace(precision=PrecisionConfig.highest())


@pytest.fixture(scope="module")
def params():
    return detector_init(jax.random.PRNGKey(0), DET)


def _vault(d=None, n=128):
    rng = np.random.default_rng(0)
    d = d or DET.clip.projection_dim
    emb = rng.normal(size=(n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return {
        "vault_emb": jnp.asarray(emb),
        "vault_valid": jnp.asarray(np.arange(n) < 5),
        "vault_text_emb": jnp.asarray(emb),
    }


def _frames(F=4, valid=3, seed=1):
    rng = np.random.default_rng(seed)
    s = DET.clip.image_size
    imgs = rng.integers(0, 255, (F, s, s, 3)).astype(np.uint8)
    fv = np.zeros((F,), np.bool_)
    fv[:valid] = True
    return imgs, fv


def test_video_aggregation_matches_per_frame():
    """Video program aggregates == per-frame full-program results with
    the reference's mean/mean/max rule (misinfo_forensics.py:563-573)."""
    params = detector_init(jax.random.PRNGKey(0), DET)
    imgs, fv = _frames(F=4, valid=3)
    rng = np.random.default_rng(2)
    ids = rng.integers(3, DET.roberta.vocab_size, (1, 12)).astype(np.int32)
    mask = np.ones((1, 12), np.int32)
    cids = rng.integers(1, DET.clip.vocab_size - 2, (1, 16)).astype(np.int32)
    cmask = np.ones((1, 16), np.int32)

    batch = {
        "roberta_ids": jnp.asarray(ids), "roberta_mask": jnp.asarray(mask),
        "clip_ids": jnp.asarray(cids), "clip_mask": jnp.asarray(cmask),
        "image_effnet": jnp.asarray(imgs), "image_clip": jnp.asarray(imgs),
        "frame_valid": jnp.asarray(fv), **_vault(),
    }
    out = video_program(params, batch, has_text=True, det_cfg=DET, cfg=CFG,
                        policy=F32)

    # per-frame reference: run the full program on each valid frame
    per_frame = signals_program(
        params,
        {"roberta_ids": jnp.asarray(np.repeat(ids, 3, 0)),
         "roberta_mask": jnp.asarray(np.repeat(mask, 3, 0)),
         "clip_ids": jnp.asarray(np.repeat(cids, 3, 0)),
         "clip_mask": jnp.asarray(np.repeat(cmask, 3, 0)),
         "image_effnet": jnp.asarray(imgs[:3]),
         "image_clip": jnp.asarray(imgs[:3]), **_vault()},
        variant="full", det_cfg=DET, cfg=CFG, policy=F32)

    np.testing.assert_allclose(float(out.deepfake_score[0]),
                               float(np.mean(per_frame.deepfake_score)),
                               atol=1e-4)
    np.testing.assert_allclose(float(out.clip_similarity[0]),
                               float(np.mean(per_frame.clip_similarity)),
                               atol=1e-4)
    assert float(out.vault_discrepancy[0]) == pytest.approx(
        float(np.max(per_frame.vault_discrepancy)), abs=1e-5)


def test_video_without_text_uses_fallback_verdict():
    params = detector_init(jax.random.PRNGKey(0), DET)
    imgs, fv = _frames(F=3, valid=2, seed=3)
    batch = {"image_effnet": jnp.asarray(imgs), "image_clip": jnp.asarray(imgs),
             "frame_valid": jnp.asarray(fv), **_vault()}
    out = video_program(params, batch, has_text=False, det_cfg=DET, cfg=CFG,
                        policy=F32)
    expected = max(float(out.deepfake_score[0]), float(out.vault_discrepancy[0]))
    assert float(out.fake_probability[0]) == pytest.approx(
        min(1.0, expected), abs=1e-6)
    assert float(out.ai_score[0]) == 0.0


def test_signal_programs_cache():
    progs = SignalPrograms(DET, CFG, F32)
    f1 = progs.get("text_only")
    f2 = progs.get("text_only")
    assert f1 is f2
    assert progs.get("full") is not f1


def test_batching_engine_concurrent(tmp_path):
    from misinfo_tpu.engine.batching import BatchingEngine
    from misinfo_tpu.engine.forensics import MisinfoForensics

    cfg = CFG.replace(seq=CFG.seq.__class__(roberta_max_len=32,
                                            image_size=DET.clip.image_size))
    engine = MisinfoForensics(config=cfg, det_cfg=DET,
                              params=detector_init(jax.random.PRNGKey(0), DET))
    server = BatchingEngine(engine, max_wait_ms=20)
    futures = [server.submit({"text": f"claim number {i}"}) for i in range(6)]
    results = [f.result(timeout=120) for f in futures]
    server.close()
    assert len(results) == 6
    for r in results:
        assert r["verdict_text"] in ("REAL", "FAKE")
    single = engine.analyze(text="claim number 0", verbose=False)
    assert results[0]["scores"]["misinfo_score"] == pytest.approx(
        single["scores"]["misinfo_score"], abs=1e-5)


def test_batching_engine_pipelined_batches():
    """Many submits with a small max_batch force >=5 collector cycles
    through the dispatcher->finalizer hand-off queue (engine/batching.py
    two-thread pipeline): every future resolves, order maps back to its
    request, and scores match the synchronous path."""
    from misinfo_tpu.engine.batching import BatchingEngine
    from misinfo_tpu.engine.forensics import MisinfoForensics

    cfg = CFG.replace(seq=CFG.seq.__class__(roberta_max_len=32,
                                            image_size=DET.clip.image_size))
    engine = MisinfoForensics(config=cfg, det_cfg=DET,
                              params=detector_init(jax.random.PRNGKey(0), DET))
    server = BatchingEngine(engine, max_wait_ms=5, max_batch=8)
    futures = [server.submit({"text": f"claim number {i % 7}"})
               for i in range(40)]
    results = [f.result(timeout=300) for f in futures]
    server.close()
    assert len(results) == 40
    assert all(r["verdict_text"] in ("REAL", "FAKE") for r in results)
    single = engine.analyze(text="claim number 3", verbose=False)
    for i, r in enumerate(results):
        if i % 7 == 3:
            assert r["scores"]["misinfo_score"] == pytest.approx(
                single["scores"]["misinfo_score"], abs=1e-5)


def test_batching_engine_close_drains_inflight(tmp_path):
    """Shutdown contract (VERDICT r4 #7): close() called with requests
    still queued/in-flight completes ALL of them (drain, device-synced
    finalize, clean thread join — no abandoned thread inside a device
    call), is idempotent, and submits after close are refused."""
    from misinfo_tpu.engine.batching import BatchingEngine
    from misinfo_tpu.engine.forensics import MisinfoForensics

    cfg = CFG.replace(seq=CFG.seq.__class__(roberta_max_len=32,
                                            image_size=DET.clip.image_size))
    engine = MisinfoForensics(config=cfg, det_cfg=DET,
                              params=detector_init(jax.random.PRNGKey(0), DET))
    server = BatchingEngine(engine, max_wait_ms=5, max_batch=4)
    # enough requests for several collector cycles; close immediately so
    # most are still queued or in flight when the stop flag lands
    futures = [server.submit({"text": f"claim number {i % 5}"})
               for i in range(24)]
    server.close()
    assert not server._thread.is_alive()
    assert not server._finalizer.is_alive()
    results = [f.result(timeout=0) for f in futures]  # already resolved
    assert len(results) == 24
    assert all(r["verdict_text"] in ("REAL", "FAKE") for r in results)
    server.close()  # idempotent
    with pytest.raises(RuntimeError, match="closed"):
        server.submit({"text": "late"})


def test_analyze_stream_matches_batch():
    """analyze_stream: generator input, in-order results equal to the
    synchronous path, chunked at batch_size with one batch in flight."""
    from misinfo_tpu.engine.forensics import MisinfoForensics

    cfg = CFG.replace(seq=CFG.seq.__class__(roberta_max_len=32,
                                            image_size=DET.clip.image_size))
    engine = MisinfoForensics(config=cfg, det_cfg=DET,
                              params=detector_init(jax.random.PRNGKey(0), DET))
    reqs = [{"text": f"stream claim {i}"} for i in range(7)]
    sync = engine.analyze_batch(reqs, explanations=True)

    dispatched = []
    orig = engine.analyze_batch_async

    def spy(batch, explanations=False):
        dispatched.append(len(batch))
        return orig(batch, explanations)
    engine.analyze_batch_async = spy

    streamed = list(engine.analyze_stream(iter(reqs), batch_size=3,
                                          explanations=True))
    assert dispatched == [3, 3, 1]
    assert len(streamed) == 7
    for a, b in zip(sync, streamed):
        assert a["scores"]["misinfo_score"] == pytest.approx(
            b["scores"]["misinfo_score"], abs=1e-6)
        assert a["explanation"] == b["explanation"]
    assert list(engine.analyze_stream([], batch_size=3)) == []


def test_analyze_batch_async_matches_sync():
    """The pipelined dispatch/finalize split must be result-identical to
    the synchronous path (same programs, same padding)."""
    from misinfo_tpu.engine.forensics import MisinfoForensics

    cfg = CFG.replace(seq=CFG.seq.__class__(roberta_max_len=32,
                                            image_size=DET.clip.image_size))
    engine = MisinfoForensics(config=cfg, det_cfg=DET,
                              params=detector_init(jax.random.PRNGKey(0), DET))
    reqs = [{"text": f"pipelined claim {i}"} for i in range(3)]
    sync = engine.analyze_batch(reqs, explanations=True)
    fin1 = engine.analyze_batch_async(reqs, explanations=True)
    # dispatch a second batch before finalizing the first (pipeline overlap)
    fin2 = engine.analyze_batch_async([{"text": "other"}])
    async1, async2 = fin1(), fin2()
    assert len(async1) == 3 and len(async2) == 1
    for a, b in zip(sync, async1):
        assert a["scores"]["misinfo_score"] == pytest.approx(
            b["scores"]["misinfo_score"], abs=1e-6)
        assert a["explanation"] == b["explanation"]
