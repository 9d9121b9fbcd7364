"""ctypes bindings for the native C++ byte-level BPE encoder.

`NativeRobertaTokenizer` is a drop-in for preprocess.tokenizer.
RobertaTokenizer with a multithreaded C++ fast path (native/bpe_encoder.cpp).
Dialect parity contract: the C++ pre-tokenizer implements the GPT-2 regex
exactly for ASCII input; any text containing non-ASCII bytes transparently
routes to the pure-Python reference implementation, so outputs are
identical for every input (validated by tests/test_native_bpe.py).

The vocab/merges hand-off inverts GPT-2's byte→printable-unicode mapping
once at load and ships raw-byte hex TSVs to C++, keeping the native side
free of unicode/JSON handling.
"""

from __future__ import annotations

import ctypes
import os
import tempfile
from typing import List, Optional, Sequence, Tuple

import numpy as np

from misinfo_tpu.preprocess.bpe import bytes_to_unicode
from misinfo_tpu.preprocess.tokenizer import RobertaTokenizer

_LIB_CANDIDATES = (
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libmisinfo_bpe.so"),
    "libmisinfo_bpe.so",
)


def _load_lib() -> Optional[ctypes.CDLL]:
    for path in _LIB_CANDIDATES:
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                   ctypes.c_int32]
        lib.bpe_destroy.argtypes = [ctypes.c_void_p]
        lib.bpe_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.bpe_vocab_size.restype = ctypes.c_int32
        lib.bpe_vocab_size.argtypes = [ctypes.c_void_p]
        return lib
    return None


def _export_raw_tsvs(bpe, out_dir: str) -> Tuple[str, str]:
    """vocab.json/merges.txt (printable alphabet) → raw-byte hex TSVs."""
    byte_decoder = {v: k for k, v in bytes_to_unicode().items()}

    def to_raw_hex(tok: str) -> Optional[str]:
        try:
            return bytes(byte_decoder[c] for c in tok).hex()
        except KeyError:
            return None  # special tokens — never produced by the merge loop

    vocab_path = os.path.join(out_dir, "vocab_raw.tsv")
    merges_path = os.path.join(out_dir, "merges_raw.tsv")
    with open(vocab_path, "w") as f:
        for tok, idx in bpe.core.encoder.items():
            h = to_raw_hex(tok)
            if h is not None:
                f.write(f"{idx}\t{h}\n")
    with open(merges_path, "w") as f:
        for (a, b), _rank in sorted(bpe.core.bpe_ranks.items(),
                                    key=lambda kv: kv[1]):
            ha, hb = to_raw_hex(a), to_raw_hex(b)
            if ha is not None and hb is not None:
                f.write(f"{ha}\t{hb}\n")
    return vocab_path, merges_path


class NativeRobertaTokenizer(RobertaTokenizer):
    """RobertaTokenizer with a C++ batch fast path."""

    def __init__(self, vocab_file: str, merges_file: str,
                 num_threads: int = 0):
        super().__init__(vocab_file, merges_file)
        self.num_threads = num_threads or min(8, os.cpu_count() or 1)
        self._lib = _load_lib()
        self._handle = None
        if self._lib is not None:
            self._tmp = tempfile.TemporaryDirectory(prefix="misinfo_bpe_")
            vp, mp = _export_raw_tsvs(self.bpe, self._tmp.name)
            self._handle = self._lib.bpe_create(
                vp.encode(), mp.encode(), self.bpe.unk_id)

    @property
    def native_available(self) -> bool:
        return self._handle is not None

    def batch(self, texts: Sequence[str], max_length: int):
        if self._handle is None:
            return super().batch(texts, max_length)
        ascii_idx, other_idx = [], []
        encoded: List[Optional[bytes]] = []
        for i, t in enumerate(texts):
            try:
                encoded.append(t.encode("ascii"))
                ascii_idx.append(i)
            except UnicodeEncodeError:
                encoded.append(None)
                other_idx.append(i)

        ids = np.full((len(texts), max_length), self.pad_id, np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        if ascii_idx:
            n = len(ascii_idx)
            arr = (ctypes.c_char_p * n)(*[encoded[i] for i in ascii_idx])
            sub_ids = np.empty((n, max_length), np.int32)
            sub_mask = np.empty((n, max_length), np.int32)
            self._lib.bpe_encode_batch(
                self._handle, arr, n, max_length, self.bos_id, self.eos_id,
                self.pad_id,
                sub_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                sub_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                self.num_threads)
            ids[ascii_idx] = sub_ids
            mask[ascii_idx] = sub_mask
        for i in other_idx:  # non-ASCII → exact Python path
            seq = self.encode(texts[i], max_length)
            ids[i, : len(seq)] = seq
            mask[i, : len(seq)] = 1
        return ids, mask

    def __del__(self):  # pragma: no cover
        try:
            if self._handle is not None:
                self._lib.bpe_destroy(self._handle)
        except Exception:
            pass


def build_native_library(log=print) -> bool:
    """Compile native/libmisinfo_bpe.so via make (idempotent)."""
    import subprocess

    native_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
    try:
        subprocess.run(["make", "-C", native_dir], check=True,
                       capture_output=True)
        return True
    except Exception as e:
        log(f"native build failed: {e}")
        return False
