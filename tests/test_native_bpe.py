"""Native C++ BPE encoder parity vs the pure-Python reference, on the
trained fixture vocab (and the HF tokenizer transitively, via
test_tokenizers.py)."""

import os

import numpy as np
import pytest

from tests.test_tokenizers import CORPUS  # reuse fixture corpus


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    tokenizers = pytest.importorskip("tokenizers")
    tmp = tmp_path_factory.mktemp("nbpe")
    cf = tmp / "corpus.txt"
    cf.write_text("\n".join(CORPUS))
    from tokenizers import ByteLevelBPETokenizer

    tok = ByteLevelBPETokenizer()
    tok.train([str(cf)], vocab_size=600, min_frequency=1,
              special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"])
    tok.save_model(str(tmp))
    return str(tmp / "vocab.json"), str(tmp / "merges.txt")


@pytest.fixture(scope="module")
def native_tok(assets):
    from misinfo_tpu.preprocess.native_bpe import (
        NativeRobertaTokenizer, build_native_library)

    build_native_library()
    t = NativeRobertaTokenizer(*assets)
    if not t.native_available:
        pytest.skip("native library unavailable")
    return t


TEXTS = [
    "Breaking news: scientists discover deep sea fish!",
    "don't believe everything you read online",
    "A photo from 2015 ... resurfaced & went viral?!",
    "it's 'quoted' text -- with   multiple   spaces",
    "tabs\tand\nnewlines \n mixed   whitespace",
    "trailing spaces   ",
    "",
    "x",
    "'s",
    "CAPS and MiXeD Case 42 numbers99",
]


def test_native_matches_python(assets, native_tok):
    from misinfo_tpu.preprocess.tokenizer import RobertaTokenizer

    py = RobertaTokenizer(*assets)
    ids_n, mask_n = native_tok.batch(TEXTS, 32)
    ids_p, mask_p = py.batch(TEXTS, 32)
    for i, t in enumerate(TEXTS):
        assert ids_n[i].tolist() == ids_p[i].tolist(), f"mismatch on {t!r}"
    np.testing.assert_array_equal(mask_n, mask_p)


def test_non_ascii_falls_back(assets, native_tok):
    from misinfo_tpu.preprocess.tokenizer import RobertaTokenizer

    py = RobertaTokenizer(*assets)
    texts = ["caffè latte ☕", "ascii only here"]
    ids_n, mask_n = native_tok.batch(texts, 24)
    ids_p, mask_p = py.batch(texts, 24)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_truncation_and_padding(assets, native_tok):
    long_text = " ".join(["word"] * 200)
    ids, mask = native_tok.batch([long_text, "hi"], 16)
    assert ids.shape == (2, 16)
    assert mask[0].sum() == 16          # truncated to max
    assert ids[0, -1] == native_tok.eos_id
    assert ids[1, 0] == native_tok.bos_id
    assert (ids[1][mask[1] == 0] == native_tok.pad_id).all()


def test_throughput_sanity(assets, native_tok):
    """Native path should not be slower than Python on a real batch."""
    import time

    from misinfo_tpu.preprocess.tokenizer import RobertaTokenizer

    py = RobertaTokenizer(*assets)
    batch = [f"Breaking news item number {i}: scientists discover "
             f"something surprising about the deep sea." for i in range(64)]
    native_tok.batch(batch, 128)  # warm cache
    t0 = time.perf_counter()
    for _ in range(5):
        native_tok.batch(batch, 128)
    t_native = time.perf_counter() - t0
    py.batch(batch, 128)
    t0 = time.perf_counter()
    for _ in range(5):
        py.batch(batch, 128)
    t_py = time.perf_counter() - t0
    # generous bound: just assert the native path isn't pathologically slow
    assert t_native < t_py * 2.0, (t_native, t_py)
