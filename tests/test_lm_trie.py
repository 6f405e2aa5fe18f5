"""KenLM .binary TRIE reader: an independent in-test writer builds a
fixture trie binary from an ARPA, and the reader must return
ArpaLM-identical score_word values through it (the sibling of
tests/test_lm_kenlm.py for model type 2; reference decoder.py:95-99
accepts either format).
"""

import struct

import numpy as np
import pytest

from deepspeech_tpu.decoders.lm import ArpaLM, load_lm
from deepspeech_tpu.decoders.lm_kenlm import (
    _FIXED_PARAMS_SIZE,
    MAGIC,
    murmur_hash64a,
    sanity_size,
)
from deepspeech_tpu.decoders.lm_trie import (
    KenLMTrie,
    is_kenlm_trie,
    kenlm_model_type,
    required_bits,
)
from tests.test_beam import ARPA
from tests.test_lm_device import TRIGRAM_ARPA

# a trigram whose bigram suffix (B C) is absent from the ARPA: the trie
# needs a blank intermediate node that must act as a lookup MISS
GAPPY_ARPA = """\\data\\
ngram 1=5
ngram 2=2
ngram 3=1

\\1-grams:
-1.0\t<unk>
-0.8\t<s>\t-0.4
-0.9\tA\t-0.3
-0.7\tB\t-0.2
-0.6\tC\t-0.1

\\2-grams:
-0.5\tA B\t-0.25
-0.45\t<s> A\t-0.15

\\3-grams:
-0.3\tA B C

\\end\\
"""


def _align8(n):
    return (n + 7) // 8 * 8


class BitWriterLSB:
    """LSB-first bit stream (util/bit_packing.hh write semantics)."""

    def __init__(self):
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, n: int):
        self._acc |= (value & ((1 << n) - 1)) << self._nbits
        self._nbits += n

    def tobytes(self, pad_to_bytes: int) -> bytes:
        raw = self._acc.to_bytes((self._nbits + 7) // 8 or 1, "little")
        assert len(raw) <= pad_to_bytes
        return raw + b"\x00" * (pad_to_bytes - len(raw))


def _np31(prob: float) -> int:
    return int(np.float32(prob).view(np.uint32)) & 0x7FFFFFFF


def _f32(x: float) -> int:
    return int(np.float32(x).view(np.uint32))


def write_trie_binary(path: str, arpa: ArpaLM, quant=None):
    """Hand-built KenLM TRIE-format writer: Sanity + params + counts,
    SortedVocabulary, dense unigram records, bit-packed middle/longest
    levels in suffix order, trailing word strings.

    ``quant=(prob_bits, backoff_bits)`` writes a type-3 quantized trie
    (quantize.hh SeparatelyQuantize): center tables between the vocab and
    unigram sections, per-entry indices packed
    ``(prob_idx << backoff_bits) | backoff_idx`` LSB-first. Tables here
    hold the exact distinct values (lossless when they fit), with KenLM's
    reserved -0.0/0.0 leading the backoff table."""
    order = arpa.order
    grams = {k: {} for k in range(1, order + 1)}
    for words, (lp, bo) in arpa.ngrams.items():
        grams[len(words)][words] = (lp, bo)

    # sorted vocabulary: id = sorted-hash position + 1, <unk> = 0
    others = sorted((w for (w,) in grams[1] if w != "<unk>"),
                    key=lambda w: murmur_hash64a(w.encode("utf8")))
    wid = {"<unk>": 0}
    for i, w in enumerate(others):
        wid[w] = i + 1
    vocab = ["<unk>"] + others

    # suffix-trie nodes per level: path = (newest, ..., oldest) ids
    nodes = {d: {} for d in range(1, order + 1)}
    for d in range(1, order + 1):
        for words, (lp, bo) in grams[d].items():
            pth = tuple(wid[w] for w in reversed(words))
            nodes[d][pth] = (lp, bo if d < order else 0.0)
    # blank intermediate nodes so every deeper path has its full chain
    for d in range(order, 1, -1):
        for pth in nodes[d]:
            parent = pth[:-1]
            nodes[len(parent)].setdefault(parent, (float("-inf"), 0.0))

    # entry layout: children grouped under the parent's entry order,
    # sorted by word id within each group
    entry_index = {1: {(w,): w for w in range(len(vocab))}}
    level_entries = {}
    for d in range(2, order + 1):
        parents = sorted(entry_index[d - 1],
                         key=lambda p: entry_index[d - 1][p])
        rows = []
        index = {}
        for parent in parents:
            kids = sorted(p for p in nodes[d] if p[:-1] == parent)
            for p in kids:
                index[p] = len(rows)
                rows.append(p)
        level_entries[d] = rows
        entry_index[d] = index

    # header counts are ENTRY counts per level — including the blank
    # intermediate nodes the trie needs structurally (KenLM's trie sizing
    # counts blanks too; they are invisible to scoring)
    counts = [len(vocab)] + [len(level_entries[d])
                             for d in range(2, order + 1)]

    out = bytearray()
    ss = sanity_size()
    san = bytearray(ss)
    san[: len(MAGIC)] = MAGIC
    f_off = (len(MAGIC) + 1 + 3) // 4 * 4
    struct.pack_into("<fff", san, f_off, 0.0, 1.0, -0.5)
    struct.pack_into("<II", san, f_off + 12, 1, 0xFFFFFFFF)
    struct.pack_into("<Q", san, _align8(f_off + 20), 1)
    out += san
    fp = bytearray(_FIXED_PARAMS_SIZE)
    fp[0] = order
    struct.pack_into("<f", fp, 4, 1.5)
    struct.pack_into("<i", fp, 8, 3 if quant else 2)  # (QUANT_)TRIE
    fp[12] = 1
    struct.pack_into("<I", fp, 16, 1)
    out += fp
    for c in counts:
        out += struct.pack("<Q", c)
    out += b"\x00" * (_align8(len(out)) - len(out))

    # SortedVocabulary
    out += struct.pack("<Q", len(others))
    for w in others:
        out += struct.pack("<Q", murmur_hash64a(w.encode("utf8")))

    # quantization section (type 3): header + center tables
    qtab = {}
    if quant and order > 1:
        pb, bb = quant

        def centers(vals, nbits, reserved=()):
            vals = list(reserved) + sorted(
                {v for v in vals if v not in set(reserved)})
            assert len(vals) <= (1 << nbits), "test LM too big for bits"
            vals = vals + [vals[-1]] * ((1 << nbits) - len(vals))
            return np.asarray(vals, np.float32)

        out += bytes([2, pb, bb]) + b"\x00" * 5
        for d in range(2, order):
            ptab = centers([lp for lp, _ in nodes[d].values()], pb)
            btab = centers([bo for _, bo in nodes[d].values()], bb,
                           reserved=(-0.0, 0.0))
            qtab[d] = (ptab, btab)
            out += ptab.tobytes() + btab.tobytes()
        ltab = centers([lp for lp, _ in nodes[order].values()], pb)
        qtab[order] = (ltab, None)
        out += ltab.tobytes()

    # unigram records (V + 2)
    def child_begin(d, path):
        kids = [entry_index[d + 1][p] for p in entry_index.get(d + 1, {})
                if p[:-1] == path]
        return min(kids) if kids else None

    next_ptr = 0
    uni = []
    for w in range(len(vocab)):
        lp, bo = nodes[1].get((w,), (float("-inf"), 0.0))
        b = child_begin(1, (w,)) if order > 1 else None
        if b is not None:
            next_ptr = b
        uni.append((lp, bo, next_ptr))
        if order > 1:
            kids = sum(1 for p in entry_index[2] if p[:-1] == (w,))
            next_ptr += kids
    term = counts[1] if order > 1 else 0
    for lp, bo, nx in uni:
        out += struct.pack("<ffQ", lp, bo, nx)
    out += struct.pack("<ffQ", 0.0, 0.0, term)  # terminator
    out += struct.pack("<ffQ", 0.0, 0.0, 0)     # padding record

    word_bits = required_bits(counts[0])

    def qidx(tab, v):
        return int(np.nonzero(tab == np.float32(v))[0][0])

    # middle levels
    for d in range(2, order):
        next_bits = required_bits(counts[d])
        pv_bits = (quant[0] + quant[1]) if quant else 63
        total = word_bits + pv_bits + next_bits
        entries = level_entries[d]
        w_ = BitWriterLSB()
        next_ptr = 0
        for pth in entries:
            lp, bo = nodes[d][pth]
            kids = sorted(entry_index[d + 1][p] for p in entry_index[d + 1]
                          if p[:-1] == pth)
            begin = kids[0] if kids else next_ptr
            next_ptr = begin + len(kids) if kids else next_ptr
            w_.write(pth[-1], word_bits)
            if quant:
                ptab, btab = qtab[d]
                w_.write((qidx(ptab, lp) << quant[1]) | qidx(btab, bo),
                         pv_bits)
            else:
                w_.write(_np31(lp), 31)
                w_.write(_f32(bo), 32)
            w_.write(begin, next_bits)
        # terminator entry: next = next-level count
        w_.write(0, word_bits)
        w_.write(0, pv_bits)
        w_.write(counts[d], next_bits)
        nbytes = ((len(entries) + 1) * total + 7) // 8 + 8
        out += w_.tobytes(nbytes)

    # longest level
    if order > 1:
        total = word_bits + (quant[0] if quant else 31)
        entries = level_entries[order]
        w_ = BitWriterLSB()
        for pth in entries:
            lp, _ = nodes[order][pth]
            w_.write(pth[-1], word_bits)
            if quant:
                w_.write(qidx(qtab[order][0], lp), quant[0])
            else:
                w_.write(_np31(lp), 31)
        nbytes = (len(entries) * total + 7) // 8 + 8
        out += w_.tobytes(nbytes)

    out += b"\x00".join(w.encode("utf8") for w in vocab) + b"\x00"
    with open(path, "wb") as f:
        f.write(bytes(out))


@pytest.fixture(params=["bigram", "trigram", "gappy",
                        "trigram-q", "gappy-q"])
def pair(request, tmp_path):
    base = request.param.removesuffix("-q")
    text = {"bigram": ARPA, "trigram": TRIGRAM_ARPA,
            "gappy": GAPPY_ARPA}[base]
    p = tmp_path / "t.arpa"
    p.write_text(text)
    arpa = ArpaLM(str(p))
    binp = tmp_path / "t.trie.binary"
    quant = (5, 4) if request.param.endswith("-q") else None
    write_trie_binary(str(binp), arpa, quant=quant)
    return arpa, str(binp)


class TestReader:
    def test_type_detection(self, pair, request):
        _, binp = pair
        want = 3 if "-q]" in request.node.name else 2
        assert kenlm_model_type(binp) == want
        assert is_kenlm_trie(binp)

    def test_header(self, pair):
        arpa, binp = pair
        lm = KenLMTrie(binp)
        assert lm.order == arpa.order
        assert lm.counts[0] == sum(1 for k in arpa.ngrams if len(k) == 1)

    def test_score_word_matches_arpa(self, pair):
        arpa, binp = pair
        lm = KenLMTrie(binp)
        words = sorted({w for k in arpa.ngrams for w in k})
        contexts = [()] + [(w,) for w in words]
        if arpa.order > 2:
            contexts += [(a, b) for a in words[:4] for b in words[:4]]
        for ctx in contexts:
            for w in words:
                ref = arpa.score_word(ctx, w)
                got = lm.score_word(ctx, w)
                assert got == pytest.approx(ref, abs=1e-5), (ctx, w)

    def test_score_sentence(self, pair):
        arpa, binp = pair
        lm = KenLMTrie(binp)
        s = ["the", "cat"] if ("the",) in arpa.ngrams else ["A", "B"]
        assert lm.score_sentence(s) == pytest.approx(
            arpa.score_sentence(s), abs=1e-5)

    def test_load_lm_dispatch(self, pair):
        _, binp = pair
        lm = load_lm(binp)
        assert isinstance(lm, KenLMTrie)

    def test_beam_decoder_accepts_trie(self, pair):
        arpa, binp = pair
        import jax.numpy as jnp

        from deepspeech_tpu.decoders import BeamCTCDecoder
        labels = "_AB "
        dec_a = BeamCTCDecoder(labels, lm_path=None, beam_width=4)
        del dec_a
        dec = BeamCTCDecoder(labels, lm_path=binp, alpha=0.5, beta=0.5,
                             beam_width=4)
        rng = np.random.default_rng(0)
        logits = rng.standard_normal((1, 6, len(labels))).astype(np.float32)
        probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        out, _ = dec.decode(jnp.asarray(probs), jnp.asarray([6]))
        assert isinstance(out[0][0], str)

    def test_oov_maps_to_unk(self, pair):
        arpa, binp = pair
        lm = KenLMTrie(binp)
        assert lm.word_id("zzzzz-not-a-word") == 0
        assert lm.score_word((), "zzzzz-not-a-word") == pytest.approx(
            arpa.score_word((), "<unk>"), abs=1e-5)

    def test_gappy_blank_node_is_a_miss(self, tmp_path):
        """The blank (B C)-suffix node exists structurally but must score
        exactly like ArpaLM's absent bigram (backoff through B)."""
        p = tmp_path / "g.arpa"
        p.write_text(GAPPY_ARPA)
        arpa = ArpaLM(str(p))
        binp = tmp_path / "g.binary"
        write_trie_binary(str(binp), arpa)
        lm = KenLMTrie(binp)
        assert lm.score_word(("B",), "C") == pytest.approx(
            arpa.score_word(("B",), "C"), abs=1e-5)
        # and the full trigram still hits through the blank's children
        assert lm.score_word(("A", "B"), "C") == pytest.approx(-0.3, abs=1e-5)

    def test_bhiksha_rejected_and_fake_quant_fails_loudly(self, tmp_path):
        p = tmp_path / "t.arpa"
        p.write_text(TRIGRAM_ARPA)
        arpa = ArpaLM(str(p))
        binp = tmp_path / "t.binary"
        write_trie_binary(str(binp), arpa)
        data = bytearray(open(binp, "rb").read())
        struct.pack_into("<i", data, sanity_size() + 8, 4)  # ARRAY_TRIE
        q = tmp_path / "q.binary"
        q.write_bytes(bytes(data))
        with pytest.raises(ValueError, match="Bhiksha"):
            KenLMTrie(str(q))
        # type byte flipped to QUANT_TRIE without actual quant tables:
        # the version check must fail loudly, never misparse
        struct.pack_into("<i", data, sanity_size() + 8, 3)
        q.write_bytes(bytes(data))
        with pytest.raises(ValueError,
                           match="quantization version|implausible"):
            KenLMTrie(str(q))

    def test_corrupt_terminator_rejected(self, tmp_path):
        """Structural validation must fail LOUDLY on a layout mismatch."""
        p = tmp_path / "t.arpa"
        p.write_text(TRIGRAM_ARPA)
        arpa = ArpaLM(str(p))
        binp = tmp_path / "t.binary"
        write_trie_binary(str(binp), arpa)
        data = bytearray(open(binp, "rb").read())
        # corrupt the unigram terminator's next pointer
        ss = sanity_size()
        off = _align8(ss + _FIXED_PARAMS_SIZE + 8 * arpa.order)
        n_vocab = struct.unpack_from("<Q", data, off)[0]
        uni_off = off + 8 + 8 * n_vocab
        v = n_vocab + 1
        term_off = uni_off + 16 * v + 8
        struct.pack_into("<Q", data, term_off, 9999)
        bad = tmp_path / "bad.binary"
        bad.write_bytes(bytes(data))
        with pytest.raises(ValueError, match="inconsistent|incompatible"):
            KenLMTrie(str(bad))


class TestEnumeration:
    """Trie binaries are invertible (explicit ids + word strings); the
    enumeration powers the device-beam path (lm_device.load_device_lm)."""

    def test_iter_ngrams_counts_and_unigrams(self, pair):
        arpa, binp = pair
        lm = KenLMTrie(binp)
        per_order = {}
        for order, ids, prob, bo in lm.iter_ngrams():
            per_order[order] = per_order.get(order, 0) + 1
        for o in range(1, arpa.order + 1):
            assert per_order[o] == lm.counts[o - 1]

    def test_dump_arpa_roundtrip_scores(self, pair, tmp_path):
        """KenLMTrie -> ARPA -> DSLM must score identically to the trie
        itself (incl. carrier nodes behaving as misses via SENTINEL)."""
        arpa, binp = pair
        from deepspeech_tpu.decoders.lm_binary import BinaryLM, convert_arpa
        lm = KenLMTrie(binp)
        dumped = tmp_path / "dumped.arpa"
        lm.dump_arpa(str(dumped))
        dslm = tmp_path / "dumped.dslm"
        convert_arpa(str(dumped), str(dslm))
        blm = BinaryLM(str(dslm))
        words = sorted({w for k in arpa.ngrams for w in k})
        contexts = [()] + [(w,) for w in words]
        if arpa.order > 2:
            contexts += [(a, b) for a in words[:4] for b in words[:4]]
        for ctx in contexts:
            for w in words:
                assert blm.score_word(ctx, w) == pytest.approx(
                    lm.score_word(ctx, w), abs=1e-4), (ctx, w)
        blm.close()
        lm.close()

    def test_device_lm_from_trie_binary(self, pair):
        """lm_device.load_device_lm accepts a trie binary and the device
        scorer matches the host trie reader (the ADVICE'd capability: trie
        binaries are invertible, unlike probing's one-way hashes)."""
        arpa, binp = pair
        from deepspeech_tpu.decoders.lm_device import load_device_lm
        from tests.test_lm_device import _score_dev
        lm = KenLMTrie(binp)
        chars = sorted({c for w in lm._wid for c in w if len(w) < 3})
        labels = "_" + "".join(chars) + " "
        dev = load_device_lm(binp, labels)
        # DSLM ids = position in the converter's sorted vocab (incl <unk>)
        vocab = sorted(lm._wid)
        real = [w for w in vocab if not w.startswith("<")]
        for ctx in [(), ("<s>",)] + [(w,) for w in real[:4]]:
            for w in real[:6]:
                got = _score_dev(dev, vocab, ctx, w, lm.order)
                assert got == pytest.approx(lm.score_word(ctx, w),
                                            abs=1e-4), (ctx, w)
        lm.close()
