"""Edit distance + WER/CER.

Semantics match the reference exactly:
* ``wer(s1, s2)`` maps words to token ids before the distance so multi-char
  words cost 1 edit (reference decoder.py:44-62).
* ``cer(s1, s2)`` strips spaces then takes character distance
  (reference decoder.py:64-73).
* ``get_cer_wer`` returns (wer, cer, wer_ref_len, cer_ref_len) with the
  reference's strip + or-1 denominators and the equal-string shortcut
  (reference data/utils.py:47-57).

Backed by the in-tree C++ module (native/edit_distance.cpp) with a numpy DP
fallback.
"""

from __future__ import annotations

import ctypes

import numpy as np

from deepspeech_tpu.native import load_native


def _edit_distance_py(a: np.ndarray, b: np.ndarray) -> int:
    na, nb = len(a), len(b)
    if na == 0:
        return nb
    if nb == 0:
        return na
    prev = np.arange(nb + 1, dtype=np.int64)
    pos = np.arange(nb + 1, dtype=np.int64)
    for i in range(1, na + 1):
        # candidate cost before resolving the left-to-right insertion chain
        cand = np.empty(nb + 1, dtype=np.int64)
        cand[0] = i
        cand[1:] = np.minimum(prev[:-1] + (b != a[i - 1]), prev[1:] + 1)
        # cur[j] = min_{k<=j} cand[k] + (j-k): a prefix-min over cand[k]-k
        prev = np.minimum.accumulate(cand - pos) + pos
    return int(prev[nb])


def edit_distance(a, b) -> int:
    """Edit distance between two token sequences (lists/arrays of ints)."""
    a = np.ascontiguousarray(a, dtype=np.uint32)
    b = np.ascontiguousarray(b, dtype=np.uint32)
    lib = load_native()
    if lib is not None:
        return int(lib.edit_distance_u32(
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(a),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(b)))
    return _edit_distance_py(a, b)


def string_distance(s1: str, s2: str) -> int:
    return edit_distance(np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32),
                         np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32))


def wer(s1: str, s2: str) -> int:
    """Word-level edit distance (unnormalized), reference decoder.py:44-62."""
    vocab = {w: i for i, w in enumerate(set(s1.split() + s2.split()))}
    a = np.array([vocab[w] for w in s1.split()], dtype=np.uint32)
    b = np.array([vocab[w] for w in s2.split()], dtype=np.uint32)
    return edit_distance(a, b)


def cer(s1: str, s2: str) -> int:
    """Char-level edit distance ignoring spaces, reference decoder.py:64-73."""
    return string_distance(s1.replace(" ", ""), s2.replace(" ", ""))


def get_cer_wer(transcript: str, reference: str):
    """(wer, cer, wer_ref, cer_ref) with reference data/utils.py:47-57 semantics."""
    reference = reference.strip()
    transcript = transcript.strip()
    wer_ref = float(len(reference.split()) or 1)
    cer_ref = float(len(reference.replace(" ", "")) or 1)
    if reference == transcript:
        return 0, 0, wer_ref, cer_ref
    return wer(transcript, reference), cer(transcript, reference), wer_ref, cer_ref


def batch_edit_distance(seqs_a, seqs_b) -> np.ndarray:
    """Distances for aligned lists of token sequences; one FFI call if native."""
    assert len(seqs_a) == len(seqs_b)
    lib = load_native()
    if lib is None:
        return np.array([edit_distance(a, b) for a, b in zip(seqs_a, seqs_b)],
                        dtype=np.int64)
    a_off = np.zeros(len(seqs_a) + 1, dtype=np.int64)
    b_off = np.zeros(len(seqs_b) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seqs_a], out=a_off[1:])
    np.cumsum([len(s) for s in seqs_b], out=b_off[1:])
    a = np.concatenate([np.ascontiguousarray(s, dtype=np.uint32) for s in seqs_a]) \
        if a_off[-1] else np.empty(0, dtype=np.uint32)
    b = np.concatenate([np.ascontiguousarray(s, dtype=np.uint32) for s in seqs_b]) \
        if b_off[-1] else np.empty(0, dtype=np.uint32)
    out = np.empty(len(seqs_a), dtype=np.int64)
    lib.edit_distance_u32_batch(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        a_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        b_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(seqs_a),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out
