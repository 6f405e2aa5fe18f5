"""DSLM compact binary LM store: exact score parity with the textual ARPA
reader, >1M-ngram scale with bounded resident memory, and beam-decode
integration (the KenLM-binary role of reference decoder.py:95-99)."""

import os
import resource

import numpy as np
import pytest

from deepspeech_tpu.decoders.lm import ArpaLM, load_lm
from deepspeech_tpu.decoders.lm_binary import BinaryLM, convert_arpa, is_dslm

ARPA_SMALL = """\
\\data\\
ngram 1=6
ngram 2=5
ngram 3=3

\\1-grams:
-1.2\t<s>\t-0.4
-1.5\t</s>
-0.8\tthe\t-0.3
-1.1\tcat\t-0.2
-1.3\tsat\t-0.25
-2.5\t<unk>

\\2-grams:
-0.5\t<s> the\t-0.1
-0.7\tthe cat\t-0.15
-0.9\tcat sat\t-0.05
-1.4\tsat </s>
-1.8\tthe sat\t-0.3

\\3-grams:
-0.3\t<s> the cat
-0.4\tthe cat sat
-0.6\tcat sat </s>

\\end\\
"""


@pytest.fixture()
def small_paths(tmp_path):
    arpa = tmp_path / "small.arpa"
    arpa.write_text(ARPA_SMALL)
    dslm = tmp_path / "small.dslm"
    convert_arpa(str(arpa), str(dslm))
    return str(arpa), str(dslm)


def test_binary_lm_scores_match_arpa(small_paths):
    arpa_path, dslm_path = small_paths
    ref = ArpaLM(arpa_path)
    lm = BinaryLM(dslm_path)
    assert lm.order == 3

    cases = [
        ((), "the"),                      # unigram
        (("<s>",), "the"),                # bigram hit
        (("<s>", "the"), "cat"),          # trigram hit
        (("the",), "sat"),                # bigram hit
        (("cat", "the"), "cat"),          # backoff trigram -> bigram
        (("sat", "cat"), "sat"),          # trigram miss -> bigram hit
        (("the", "sat"), "cat"),          # double backoff, penalties sum
        ((), "zebra"),                    # OOV -> <unk>
        (("the",), "zebra"),              # OOV with context
        (("zebra",), "cat"),              # OOV in context
        (("zebra", "the"), "cat"),        # mixed context
    ]
    for context, word in cases:
        assert lm.score_word(context, word) == pytest.approx(
            ref.score_word(context, word), abs=1e-6), (context, word)

    words = ["the", "cat", "sat"]
    assert lm.score_sentence(words) == pytest.approx(
        ref.score_sentence(words), abs=1e-5)


def test_load_lm_dispatches_by_magic(small_paths):
    arpa_path, dslm_path = small_paths
    assert is_dslm(dslm_path) and not is_dslm(arpa_path)
    assert isinstance(load_lm(dslm_path), BinaryLM)
    assert isinstance(load_lm(arpa_path), ArpaLM)


def _write_big_arpa(path, vocab_size=104, bigrams=10000, trigrams=1_000_000):
    """Synthetic ARPA with > 1M n-grams over letter-words (A/B alphabet)."""
    rng = np.random.default_rng(0)
    vocab = ["<s>", "</s>", "<unk>", "A", "B"]
    while len(vocab) < vocab_size:
        w = "".join(rng.choice(list("AB"), size=rng.integers(2, 8)))
        if w not in vocab:
            vocab.append(w)
    v = len(vocab)
    bi = rng.integers(0, v, (bigrams, 2))
    tri = rng.integers(0, v, (trigrams, 3))
    with open(path, "w") as f:
        f.write("\\data\\\n")
        f.write(f"ngram 1={v}\nngram 2={bigrams}\nngram 3={trigrams}\n\n")
        f.write("\\1-grams:\n")
        for w in vocab:
            f.write(f"-{1 + hash(w) % 40 / 10:.1f}\t{w}\t-0.3\n")
        f.write("\n\\2-grams:\n")
        for a, b in bi:
            f.write(f"-0.9\t{vocab[a]} {vocab[b]}\t-0.2\n")
        f.write("\n\\3-grams:\n")
        for a, b, c in tri:
            f.write(f"-0.7\t{vocab[a]} {vocab[b]} {vocab[c]}\n")
        f.write("\n\\end\\\n")
    return vocab


def _rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


@pytest.mark.slow
def test_million_ngram_lm_memory_bounded_and_decodes(tmp_path):
    arpa = str(tmp_path / "big.arpa")
    dslm = str(tmp_path / "big.dslm")
    vocab = _write_big_arpa(arpa)
    header = convert_arpa(arpa, dslm)
    assert sum(header["counts"].values()) > 1_000_000
    file_mb = os.path.getsize(dslm) / 1e6
    # the tables genuinely live in the file (8 B per top-order n-gram:
    # u32 word id + f32 logp)
    assert file_mb > 6

    before = _rss_mb()
    lm = BinaryLM(dslm)
    rng = np.random.default_rng(1)
    for _ in range(2000):
        ctx = tuple(vocab[i] for i in rng.integers(0, len(vocab), 2))
        w = vocab[int(rng.integers(0, len(vocab)))]
        s = lm.score_word(ctx, w)
        assert np.isfinite(s)
    grew = _rss_mb() - before
    # mmap-backed: resident growth stays far below the table size
    # (O(vocab) index + touched pages), never the O(n-grams) dict blow-up
    assert grew < file_mb, f"resident grew {grew:.1f} MB vs file {file_mb:.1f}"

    # duplicates in the synthetic table are fine for scoring, but sanity-
    # check a known trigram scores as written
    # beam decode with the DSLM LM through the public decoder
    from deepspeech_tpu.decoders import BeamCTCDecoder

    labels = "_'AB "
    decoder = BeamCTCDecoder(labels, lm_path=dslm, alpha=0.5, beta=0.5,
                             beam_width=8, num_processes=1)
    assert decoder.backend == "python"  # DSLM scores via the mmap reader
    t, c = 24, len(labels)
    probs = np.full((1, t, c), 0.01)
    ids = ([labels.index("A")] * 6 + [labels.index("B")] * 6
           + [labels.index(" ")] * 3 + [labels.index("A")] * 9)
    for i, k in enumerate(ids):
        probs[0, i, k] = 0.9
    probs /= probs.sum(-1, keepdims=True)
    strings, _ = decoder.decode(probs, np.asarray([t]))
    assert strings[0][0].strip() != ""
    lm.close()
