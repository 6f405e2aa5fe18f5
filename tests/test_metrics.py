"""Edit distance / WER / CER vs. the python-Levenshtein oracle."""

import random

import numpy as np
import pytest

import importlib

ed = importlib.import_module("deepspeech_tpu.metrics.edit_distance")
from deepspeech_tpu.metrics import batch_edit_distance, cer, get_cer_wer, wer

Lev = pytest.importorskip("Levenshtein")


def ref_wer(s1, s2):
    b = set(s1.split() + s2.split())
    word2char = dict(zip(b, range(len(b))))
    w1 = [chr(word2char[w]) for w in s1.split()]
    w2 = [chr(word2char[w]) for w in s2.split()]
    return Lev.distance("".join(w1), "".join(w2))


CASES = [
    ("hello world", "hello world"),
    ("hello world", "hello word"),
    ("a b c", "c b a"),
    ("", "abc"),
    ("abc", ""),
    ("the quick brown fox", "quick brown dog"),
    ("аб вг", "аб вгд"),
]


@pytest.mark.parametrize("s1,s2", CASES)
def test_cer_matches_levenshtein(s1, s2):
    assert cer(s1, s2) == Lev.distance(s1.replace(" ", ""), s2.replace(" ", ""))


@pytest.mark.parametrize("s1,s2", CASES)
def test_wer_matches_reference_word_mapping(s1, s2):
    assert wer(s1, s2) == ref_wer(s1, s2)


def test_random_fuzz_vs_levenshtein():
    rng = random.Random(0)
    for _ in range(200):
        a = "".join(rng.choice("abcd ") for _ in range(rng.randrange(0, 30)))
        b = "".join(rng.choice("abcd ") for _ in range(rng.randrange(0, 30)))
        assert ed.string_distance(a, b) == Lev.distance(a, b)


def test_python_fallback_matches_native():
    rng = np.random.default_rng(1)
    for _ in range(50):
        a = rng.integers(0, 5, rng.integers(0, 25))
        b = rng.integers(0, 5, rng.integers(0, 25))
        assert ed._edit_distance_py(a.astype(np.uint32), b.astype(np.uint32)) \
            == ed.edit_distance(a, b)


def test_batch_edit_distance():
    seqs_a = [[1, 2, 3], [], [4, 5], [1]]
    seqs_b = [[1, 3], [1], [4, 5], [2]]
    out = batch_edit_distance(seqs_a, seqs_b)
    assert out.tolist() == [1, 1, 0, 1]


def test_get_cer_wer_reference_semantics():
    # equal strings shortcut; denominators (reference data/utils.py:47-57)
    w, c, wr, cr = get_cer_wer("HELLO THERE", "HELLO THERE")
    assert (w, c, wr, cr) == (0, 0, 2.0, 10.0)
    w, c, wr, cr = get_cer_wer("", "")
    assert (wr, cr) == (1.0, 1.0)
    w, c, wr, cr = get_cer_wer("A B", "A C")
    assert w == 1 and c == 1 and wr == 2.0 and cr == 2.0


def test_native_library_builds():
    from deepspeech_tpu.native import load_native
    assert load_native() is not None, "C++ native module failed to build"
