"""CIFAKE trainer data-selection contract (C17, reference
train_cifake_forensics.py:71-151): REAL drawn only from test/REAL, FAKE
pooled from train/FAKE + test/FAKE, balanced per_label each, seeded
shuffles. The step/optimizer side is covered by test_trainers.py; this
pins the dataset recipe itself."""

import os

from misinfo_tpu.train.cifake_efficientnet import load_cifake_paths


def _make_tree(tmp_path, n_real_test=8, n_fake_train=5, n_fake_test=6):
    for sub, n in (("test/REAL", n_real_test), ("train/FAKE", n_fake_train),
                   ("test/FAKE", n_fake_test), ("train/REAL", 9)):
        d = tmp_path / sub
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            (d / f"img_{i:03d}.jpg").write_bytes(b"x")
    return str(tmp_path)


def test_source_directories_and_balance(tmp_path):
    root = _make_tree(tmp_path)
    items = load_cifake_paths(root, per_label=4, seed=42)
    real = [p for p, y in items if y == 0]
    fake = [p for p, y in items if y == 1]
    assert len(real) == 4 and len(fake) == 4
    # REAL comes ONLY from test/REAL — train/REAL is never used (:79-87)
    assert all(os.path.join("test", "REAL") in p for p in real)
    # FAKE pools train/FAKE and test/FAKE (:89-101)
    assert all(("FAKE" in p) for p in fake)


def test_fake_pool_spans_both_splits(tmp_path):
    root = _make_tree(tmp_path, n_fake_train=5, n_fake_test=6)
    items = load_cifake_paths(root, per_label=11, seed=42)
    fake = [p for p, y in items if y == 1]
    assert len(fake) == 11  # needs both dirs to reach 11
    assert any(os.path.join("train", "FAKE") in p for p in fake)
    assert any(os.path.join("test", "FAKE") in p for p in fake)


def test_seeded_selection_is_deterministic(tmp_path):
    root = _make_tree(tmp_path)
    a = load_cifake_paths(root, per_label=3, seed=42)
    b = load_cifake_paths(root, per_label=3, seed=42)
    c = load_cifake_paths(root, per_label=3, seed=7)
    assert a == b
    assert a != c  # different seed → different sample/order


def test_short_supply_truncates_not_errors(tmp_path):
    """Fewer files than per_label → take what exists (the reference's
    slice semantics), never raise."""
    root = _make_tree(tmp_path, n_real_test=2)
    items = load_cifake_paths(root, per_label=2500, seed=42)
    assert len([1 for _, y in items if y == 0]) == 2
