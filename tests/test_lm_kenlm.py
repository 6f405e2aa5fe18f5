"""KenLM .binary (probing) reader: an independent in-test writer builds a
fixture binary from an ARPA, and the reader must return ArpaLM-identical
score_word values through it (reference opts.py:5-7 --lm-path artifacts).
"""

import struct

import numpy as np
import pytest

from deepspeech_tpu.decoders.lm import ArpaLM, load_lm
from deepspeech_tpu.decoders.lm_kenlm import (KenLMProbing, _FIXED_PARAMS_SIZE,
                                              MAGIC, combine_word_hash,
                                              is_kenlm, murmur_hash64a,
                                              ngram_hash, probing_buckets,
                                              sanity_size)
from tests.test_beam import ARPA
from tests.test_lm_device import TRIGRAM_ARPA


def _align8(n):
    return (n + 7) // 8 * 8


def write_probing_binary(path: str, arpa: ArpaLM, multiplier: float = 1.5):
    """Hand-built KenLM probing-format writer (format version 5 layout):
    Sanity header, FixedWidthParameters, counts, vocab probing table,
    dense unigrams, per-order (hash -> prob[, backoff]) probing tables,
    trailing null-delimited vocab strings."""
    order = arpa.order
    grams = {k: {} for k in range(1, order + 1)}
    for words, (lp, bo) in arpa.ngrams.items():
        grams[len(words)][words] = (lp, bo)

    # vocab ids: <unk> = 0, then unigram insertion order
    vocab = ["<unk>"]
    for (w,) in grams[1]:
        if w != "<unk>":
            vocab.append(w)
    wid = {w: i for i, w in enumerate(vocab)}
    counts = [len(vocab)] + [len(grams[k]) for k in range(2, order + 1)]

    out = bytearray()
    # Sanity
    ss = sanity_size()
    san = bytearray(ss)
    san[: len(MAGIC)] = MAGIC
    f_off = (len(MAGIC) + 1 + 3) // 4 * 4
    struct.pack_into("<fff", san, f_off, 0.0, 1.0, -0.5)
    struct.pack_into("<II", san, f_off + 12, 1, 0xFFFFFFFF)
    struct.pack_into("<Q", san, _align8(f_off + 20), 1)
    out += san
    # FixedWidthParameters: order, multiplier, model_type=0 (probing),
    # has_vocabulary=1, search_version
    fp = bytearray(_FIXED_PARAMS_SIZE)
    fp[0] = order
    struct.pack_into("<f", fp, 4, multiplier)
    struct.pack_into("<i", fp, 8, 0)
    fp[12] = 1
    struct.pack_into("<I", fp, 16, 0)
    out += fp
    for c in counts:
        out += struct.pack("<Q", c)
    out += b"\x00" * (_align8(len(out)) - len(out))

    # vocab: header + probing table of murmur(word) -> id (not <unk>)
    out += struct.pack("<IxxxxQ", 0, len(vocab))
    nb = probing_buckets(counts[0], multiplier)
    keys = np.zeros(nb, np.uint64)
    vals = np.zeros(nb, np.uint32)
    for w, i in wid.items():
        if i == 0:
            continue
        h = murmur_hash64a(w.encode("utf8"))
        j = h % nb
        while keys[j] != 0:
            j = (j + 1) % nb
        keys[j] = h
        vals[j] = i
    table = np.zeros((nb, 16), np.uint8)
    table[:, :8] = keys.view(np.uint8).reshape(nb, 8)
    table[:, 8:12] = vals.view(np.uint8).reshape(nb, 4)
    out += table.tobytes()

    # unigrams: dense (prob, backoff), counts[0] + 1 slots
    uni = np.zeros((counts[0] + 1, 2), np.float32)
    for (w,), (lp, bo) in grams[1].items():
        uni[wid[w]] = (lp, bo)
    out += uni.tobytes()

    # orders 2..N: probing tables keyed by the chained word hash
    for k in range(2, order + 1):
        nb = probing_buckets(counts[k - 1], multiplier)
        keys = np.zeros(nb, np.uint64)
        payload = np.zeros((nb, 2), np.float32)
        for words, (lp, bo) in grams[k].items():
            key = ngram_hash([wid.get(w, 0) for w in words])
            j = key % nb
            while keys[j] != 0:
                j = (j + 1) % nb
            keys[j] = key
            payload[j] = (lp, bo if k < order else 0.0)
        table = np.zeros((nb, 16), np.uint8)
        table[:, :8] = keys.view(np.uint8).reshape(nb, 8)
        table[:, 8:16] = payload.view(np.uint8).reshape(nb, 8)
        out += table.tobytes()

    out += b"\x00".join(w.encode("utf8") for w in vocab) + b"\x00"
    with open(path, "wb") as f:
        f.write(bytes(out))


@pytest.fixture(params=["bigram", "trigram"])
def pair(request, tmp_path):
    text = ARPA if request.param == "bigram" else TRIGRAM_ARPA
    p = tmp_path / "t.arpa"
    p.write_text(text)
    arpa = ArpaLM(str(p))
    binp = tmp_path / "t.binary"
    write_probing_binary(str(binp), arpa)
    return arpa, str(binp)


class TestHashes:
    def test_murmur64a_reference_vectors(self):
        # MurmurHash64A(seed 0) published reference behavior: empty input
        # hashes to 0; stability vectors pin the implementation
        assert murmur_hash64a(b"") == 0
        assert murmur_hash64a(b"a") == murmur_hash64a(b"a")
        assert murmur_hash64a(b"a") != murmur_hash64a(b"b")
        assert murmur_hash64a(b"12345678") != murmur_hash64a(b"12345679")

    def test_chain_order(self):
        # newest word seeds the chain; histories differ -> keys differ
        assert ngram_hash([1, 2]) != ngram_hash([2, 1])
        assert ngram_hash([3]) == 3
        assert ngram_hash([1, 2, 3]) == combine_word_hash(
            combine_word_hash(3, 2), 1)


class TestReader:
    def test_magic_detection(self, pair, tmp_path):
        _, binp = pair
        assert is_kenlm(binp)
        assert not is_kenlm(str(tmp_path / "t.arpa"))

    def test_header(self, pair):
        arpa, binp = pair
        lm = KenLMProbing(binp)
        assert lm.order == arpa.order
        assert lm.counts[0] == len([g for g in arpa.ngrams if len(g) == 1])

    def test_score_word_matches_arpa(self, pair):
        arpa, binp = pair
        lm = KenLMProbing(binp)
        vocab = sorted({w for g in arpa.ngrams for w in g})
        cases = [((), w) for w in vocab]
        cases += [((c,), w) for c in vocab for w in vocab]
        if arpa.order > 2:
            cases += [((a, b), w) for a in vocab[:4] for b in vocab[:4]
                      for w in vocab[:4]]
        for ctx, w in cases:
            assert lm.score_word(ctx, w) == pytest.approx(
                arpa.score_word(ctx, w), abs=1e-5), (ctx, w)
        lm.close()

    def test_score_sentence(self, pair):
        arpa, binp = pair
        lm = KenLMProbing(binp)
        words = ["AB", "AB", "BA"]
        assert lm.score_sentence(words) == pytest.approx(
            arpa.score_sentence(words), abs=1e-4)
        lm.close()

    def test_load_lm_dispatch(self, pair):
        _, binp = pair
        lm = load_lm(binp)
        assert isinstance(lm, KenLMProbing)
        lm.close()

    def test_beam_decoder_accepts_kenlm(self, pair):
        """--lm-path model.binary end to end through the host beam."""
        from deepspeech_tpu.decoders import BeamCTCDecoder
        _, binp = pair
        probs = np.zeros((1, 3, 4))
        probs[0, 0] = [0.02, 0.47, 0.51, 0.0]
        probs[0, 1] = [0.02, 0.51, 0.47, 0.0]
        probs[0, 2] = [0.04, 0.02, 0.02, 0.92]
        dec = BeamCTCDecoder("_AB ", beam_width=16, lm_path=binp,
                             alpha=2.0, beta=0.0)
        assert dec.backend == "python"  # binary LMs use the python search
        strings, _ = dec.decode(probs)
        assert strings[0][0].strip() == "AB"

    def test_trie_type_rejected(self, pair, tmp_path):
        _, binp = pair
        data = bytearray(open(binp, "rb").read())
        struct.pack_into("<i", data, sanity_size() + 8, 1)  # model_type=TRIE
        p = tmp_path / "trie.binary"
        p.write_bytes(bytes(data))
        with pytest.raises(ValueError, match="trie"):
            KenLMProbing(str(p))

    def test_oov_maps_to_unk(self, pair):
        arpa, binp = pair
        lm = KenLMProbing(binp)
        # KenLM semantics: OOV -> <unk> unigram score
        assert lm.score_word((), "ZZZUNSEEN") == pytest.approx(
            arpa.score_word((), "<unk>"), abs=1e-5)
        lm.close()
