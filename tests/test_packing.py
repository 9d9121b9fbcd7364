"""Sequence packing (preprocess/packing.py + segment attention): packed
scores must be independent of co-packed neighbours and bit-close to the
unpacked path (f32 parity mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from misinfo_tpu.core.config import ForensicsConfig, PrecisionConfig
from misinfo_tpu.models.detector import DetectorConfig, detector_init
from misinfo_tpu.models.roberta import (
    RobertaConfig, dual_head_logits, head_apply, roberta_encode,
    roberta_init, head_init)
from misinfo_tpu.ops.common import Policy, F32_POLICY
from misinfo_tpu.preprocess.packing import (
    PackedTextBatch, pack_token_rows, packed_row_bucket, trim_padded)


def _seqs(rng, lens, vocab=1000):
    return [rng.integers(3, vocab, (l,)).astype(np.int32) for l in lens]


def test_pack_token_rows_placement():
    rng = np.random.default_rng(0)
    lens = [5, 3, 7, 2, 6, 1]
    seqs = _seqs(rng, lens)
    p = pack_token_rows(seqs, row_len=8, pad_id=1)
    assert p.ids.shape[1] == 8
    for i, s in enumerate(seqs):
        r, c = int(p.cls_rows[i]), int(p.cls_cols[i])
        np.testing.assert_array_equal(p.ids[r, c:c + len(s)], s)
        # contiguous single segment per request
        seg = p.segment_ids[r, c]
        assert seg > 0
        assert (p.segment_ids[r, c:c + len(s)] == seg).all()
        # RoBERTa position rule restarts per segment: pad+1, pad+2, ...
        np.testing.assert_array_equal(
            p.position_ids[r, c:c + len(s)], 1 + 1 + np.arange(len(s)))
    # padding slots carry segment 0 and pad ids
    assert ((p.segment_ids == 0) == (p.mask == 0)).all()
    assert (p.ids[p.mask == 0] == 1).all()


def test_pack_token_rows_distinct_segments_and_buckets():
    rng = np.random.default_rng(1)
    seqs = _seqs(rng, [4, 4, 4])
    p = pack_token_rows(seqs, row_len=12, pad_id=1, n_slots=8, min_rows=4)
    assert p.ids.shape[0] == 4 and len(p.cls_rows) == 8
    # three requests in one 12-token row → three distinct segment ids
    r = int(p.cls_rows[0])
    segs = {int(p.segment_ids[int(p.cls_rows[i]), int(p.cls_cols[i])])
            for i in range(3)}
    assert len(segs) == 3
    with pytest.raises(ValueError):
        pack_token_rows(_seqs(rng, [13]), row_len=12, pad_id=1)
    assert packed_row_bucket(3, (1, 2, 4, 8)) == 4
    assert packed_row_bucket(99, (1, 2, 4, 8)) == 8


def test_trim_padded_roundtrip():
    ids = np.array([[5, 6, 1, 1], [7, 8, 9, 1]], np.int32)
    mask = np.array([[1, 1, 0, 0], [1, 1, 1, 0]], np.int32)
    seqs = trim_padded(ids, mask)
    np.testing.assert_array_equal(seqs[0], [5, 6])
    np.testing.assert_array_equal(seqs[1], [7, 8, 9])


def test_packed_scores_match_unpacked():
    """Block-diagonal attention + per-segment positions + CLS gather must
    reproduce the unpacked per-row scores exactly (f32 HIGHEST)."""
    cfg = RobertaConfig.tiny()
    key = jax.random.PRNGKey(0)
    params = roberta_init(key, cfg)
    ai = head_init(jax.random.PRNGKey(1), cfg)
    mis = head_init(jax.random.PRNGKey(2), cfg)
    policy = F32_POLICY

    rng = np.random.default_rng(2)
    lens = [9, 4, 13, 2, 7]
    seqs = _seqs(rng, lens, vocab=cfg.vocab_size)

    # unpacked reference: one row per request, padded to 16
    L = 16
    ids = np.full((len(seqs), L), cfg.pad_token_id, np.int32)
    mask = np.zeros((len(seqs), L), np.int32)
    for i, s in enumerate(seqs):
        ids[i, : len(s)] = s
        mask[i, : len(s)] = 1
    ai_ref, mis_ref = dual_head_logits(
        params, ai, mis, jnp.asarray(ids), jnp.asarray(mask), cfg, policy)

    packed = pack_token_rows(seqs, row_len=L, pad_id=cfg.pad_token_id)
    assert packed.ids.shape[0] < len(seqs)  # actually packed
    hidden = roberta_encode(
        params, jnp.asarray(packed.ids), jnp.asarray(packed.mask), cfg,
        policy, position_ids=jnp.asarray(packed.position_ids),
        segment_ids=jnp.asarray(packed.segment_ids))
    pooled = hidden[jnp.asarray(packed.cls_rows), jnp.asarray(packed.cls_cols)]
    ai_p = head_apply(ai, pooled, policy=policy)
    mis_p = head_apply(mis, pooled, policy=policy)

    np.testing.assert_allclose(np.asarray(ai_p), np.asarray(ai_ref),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mis_p), np.asarray(mis_ref),
                               rtol=0, atol=2e-5)


def test_engine_pack_text_parity(tmp_path):
    """Engine-level: pack_text=True returns the same reports as the
    unpacked bucketed path."""
    from misinfo_tpu.engine.forensics import MisinfoForensics

    det_cfg = DetectorConfig.tiny()
    base = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    base = base.replace(
        paths=base.paths.__class__(vault_path=str(tmp_path / "missing.npz")),
        seq=base.seq.__class__(roberta_max_len=32, image_size=64))
    params = detector_init(jax.random.PRNGKey(0), det_cfg)

    texts = ["breaking news shocking claim about the election",
             "short", "a somewhat longer caption with more words in it",
             "x", "fake news spreads faster than true news online"]
    reqs = [{"text": t} for t in texts]
    # a couple of full-modality requests exercise the packed `full` path
    from PIL import Image
    img_rng = np.random.default_rng(7)
    for t in ("caption packed with an image", "another full request"):
        reqs.append({"text": t, "image": Image.fromarray(
            img_rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB")})

    eng = MisinfoForensics(config=base, det_cfg=det_cfg, params=params)
    plain = eng.analyze_batch(reqs)

    packed_cfg = base.replace(
        serving=base.serving.__class__(pack_text=True))
    eng_p = MisinfoForensics(config=packed_cfg, det_cfg=det_cfg, params=params)
    packed = eng_p.analyze_batch(reqs)

    for a, b in zip(plain, packed):
        assert a["verdict"] == b["verdict"]
        for k in ("ai_score", "misinfo_score", "fake_probability",
                  "deepfake_score", "clip_similarity"):
            assert abs(a["scores"][k] - b["scores"][k]) < 1e-4, k


def test_stream_packer_invariants():
    from misinfo_tpu.preprocess.packing import StreamPacker

    rng = np.random.default_rng(5)
    packer = StreamPacker(row_len=16, pad_id=1, n_rows=2, n_slots=4)
    seqs = _seqs(rng, [10, 9, 5, 3, 3, 3, 12, 2])
    batches = []
    for i, s in enumerate(seqs):
        out = packer.add(s, meta=i)
        if out is not None:
            batches.append(out)
    tail = packer.flush()
    if tail:
        batches.append(tail)

    seen = []
    for packed, metas in batches:
        assert packed.ids.shape == (2, 16)
        assert len(packed.cls_rows) == 4
        assert len(metas) <= 4
        for slot, meta in enumerate(metas):
            r, c = int(packed.cls_rows[slot]), int(packed.cls_cols[slot])
            s = seqs[meta]
            np.testing.assert_array_equal(packed.ids[r, c:c + len(s)], s)
            seen.append(meta)
    assert sorted(seen) == list(range(len(seqs)))  # each sample exactly once


def test_packed_train_step_runs_and_learns(tmp_path):
    """Packed text-head training: loss finite, params move, invalid slots
    contribute nothing (loss identical when garbage fills invalid slots)."""
    from misinfo_tpu.train.optim import OptimConfig, branch_mask, make_optimizer
    from misinfo_tpu.train.steps import make_packed_text_head_step
    from misinfo_tpu.preprocess.packing import StreamPacker

    det_cfg = DetectorConfig.tiny()
    cfg = det_cfg.roberta
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    tx = make_optimizer(OptimConfig(lr=1e-3, total_steps=4),
                        trainable_mask=branch_mask(
                            params, ["roberta", "misinfo_head"]))
    opt_state = tx.init(params)
    step = make_packed_text_head_step(tx, det_cfg, F32_POLICY)

    rng = np.random.default_rng(9)
    packer = StreamPacker(row_len=16, pad_id=cfg.pad_token_id,
                          n_rows=2, n_slots=4)
    for s in _seqs(rng, [7, 6, 5], vocab=cfg.vocab_size):
        packer.add(s, meta=int(rng.integers(0, 2)))
    packed, metas = packer.flush()
    labels = np.zeros(4, np.int32)
    labels[: len(metas)] = metas
    valid = np.zeros(4, np.float32)
    valid[: len(metas)] = 1.0
    batch = {k: jnp.asarray(v) for k, v in {
        "input_ids": packed.ids, "attention_mask": packed.mask,
        "position_ids": packed.position_ids,
        "segment_ids": packed.segment_ids,
        "cls_rows": packed.cls_rows, "cls_cols": packed.cls_cols,
        "labels": labels, "slot_valid": valid}.items()}

    p0 = params["misinfo_head"]["fc1"]["kernel"]
    params2, opt_state, m = step(
        jax.tree_util.tree_map(jnp.array, params),
        opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert not np.allclose(np.asarray(p0),
                           np.asarray(params2["misinfo_head"]["fc1"]["kernel"]))

    # garbage labels on invalid slots must not change the loss
    batch2 = dict(batch)
    lab2 = np.array(labels)
    lab2[len(metas):] = 1
    batch2["labels"] = jnp.asarray(lab2)
    tx2 = make_optimizer(OptimConfig(lr=1e-3, total_steps=4))
    step2 = make_packed_text_head_step(tx2, det_cfg, F32_POLICY)
    _, _, m1 = step2(jax.tree_util.tree_map(jnp.array, params),
                     tx2.init(params), batch, jax.random.PRNGKey(1))
    _, _, m2 = step2(jax.tree_util.tree_map(jnp.array, params),
                     tx2.init(params), batch2, jax.random.PRNGKey(1))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-6


def test_trainer_pack_flag(tmp_path):
    """roberta_detective trainer end-to-end with pack=True on a tiny CSV."""
    import pandas as pd
    from misinfo_tpu.train.roberta_detective import train

    texts = ["fake story %d with several words" % i for i in range(12)]
    df = pd.DataFrame({"text": texts, "label": [i % 2 for i in range(12)]})
    csv = str(tmp_path / "t.csv")
    df.to_csv(csv, index=False)
    det_cfg = DetectorConfig.tiny()
    res = train(csv, out_dir=str(tmp_path / "out"), epochs=1, batch_size=2,
                max_len=32, det_cfg=det_cfg, pack=True,
                precision="float32", log=lambda *a, **k: None)
    assert np.isfinite(res.best_metric)


def test_engine_auto_pack_decision(tmp_path, monkeypatch):
    """pack_text='auto': ragged traffic routes through packing, uniform
    max-length traffic stays dense; reports match the dense engine."""
    from misinfo_tpu.engine.forensics import MisinfoForensics

    det_cfg = DetectorConfig.tiny()
    base = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    base = base.replace(
        paths=base.paths.__class__(vault_path=str(tmp_path / "missing.npz")),
        seq=base.seq.__class__(roberta_max_len=32, image_size=64),
        serving=base.serving.__class__(pack_text="auto"))
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    eng = MisinfoForensics(config=base, det_cfg=det_cfg, params=params)

    calls = []
    orig = MisinfoForensics._pack_text_batch
    monkeypatch.setattr(MisinfoForensics, "_pack_text_batch",
                        lambda self, *a, **k: calls.append(1) or orig(self, *a, **k))

    ragged = [{"text": t} for t in
              ["one", "two words here", "x",
               "a much longer sentence with many repeated words " * 2,
               "short", "tiny", "yet another thing", "ok"]]
    out_auto = eng.analyze_batch(ragged)
    assert calls, "ragged batch should have taken the packed path"

    # uniform near-max-length traffic: packing can't beat the dense bucket
    calls.clear()
    long_word = "word " * 40   # tokenizes past the 32-token cap → full rows
    uniform = [{"text": long_word} for _ in range(8)]
    eng.analyze_batch(uniform)
    assert not calls, "uniform max-length batch should stay dense"

    # scores agree with a dense-only engine
    dense_cfg = base.replace(serving=base.serving.__class__(pack_text=False))
    eng_d = MisinfoForensics(config=dense_cfg, det_cfg=det_cfg, params=params)
    out_dense = eng_d.analyze_batch(ragged)
    for a, b in zip(out_auto, out_dense):
        assert a["verdict"] == b["verdict"]
        assert abs(a["scores"]["misinfo_score"] - b["scores"]["misinfo_score"]) < 1e-4


def test_auto_pack_packs_exactly_once(tmp_path, monkeypatch):
    """The auto-pack decision's trial pack IS the served pack: one
    pack_token_rows call per batch, with the winning layout reusing the
    trial arrays via pad_packed_rows (ADVICE r1 — no duplicate host work)."""
    from misinfo_tpu.engine.forensics import MisinfoForensics
    from misinfo_tpu.preprocess import packing as P

    det_cfg = DetectorConfig.tiny()
    base = ForensicsConfig(verbose=False).replace(
        precision=PrecisionConfig.highest())
    base = base.replace(
        paths=base.paths.__class__(vault_path=str(tmp_path / "missing.npz")),
        seq=base.seq.__class__(roberta_max_len=32, image_size=64),
        serving=base.serving.__class__(pack_text="auto"))
    params = detector_init(jax.random.PRNGKey(0), det_cfg)
    eng = MisinfoForensics(config=base, det_cfg=det_cfg, params=params)

    calls = []
    orig = P.pack_token_rows
    monkeypatch.setattr(P, "pack_token_rows",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))

    ragged = [{"text": t} for t in
              ["one", "two words here", "x", "short", "tiny",
               "another small thing", "ok", "final entry"]]
    eng.analyze_batch(ragged)
    assert len(calls) == 1, f"packed {len(calls)} times for one batch"
