"""Device LM (decoders/lm_device.py): scoring parity with the host ARPA /
DSLM readers, and LM-fused on-device beam search == host beam search.

The reference's LM fusion lives in ctcdecode+KenLM (reference
decoder.py:95-99, opts.py:5-9); the host twin is decoders/beam.py +
decoders/lm.py. These tests pin the DEVICE twin to both.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepspeech_tpu.decoders import BeamCTCDecoder, DeviceBeamCTCDecoder
from deepspeech_tpu.decoders.beam import ctc_beam_search
from deepspeech_tpu.decoders.beam_device import ctc_beam_search_device
from deepspeech_tpu.decoders.lm import ArpaLM
from deepspeech_tpu.decoders.lm_device import (lm_score_word, load_device_lm,
                                               lm_state_init, trie_advance,
                                               trie_word_id)
from tests.test_beam import ARPA

LABELS = "_AB "

TRIGRAM_ARPA = """\\data\\
ngram 1=7
ngram 2=5
ngram 3=3

\\1-grams:
-0.30103\t<s>\t-0.1
-0.60206\t</s>\t0
-0.52288\tA\t-0.2
-0.69897\tB\t-0.15
-0.39794\tAB\t-0.30103
-1.69897\tBA\t-0.30103
-2.0\t<unk>\t0

\\2-grams:
-0.17609\t<s> AB\t-0.05
-0.30103\tAB AB\t-0.1
-0.45\tAB A\t-0.08
-0.52\tA B\t0
-0.6\tB A\t-0.12

\\3-grams:
-0.1\t<s> AB A
-0.2\tAB A B
-0.35\tA B A

\\end\\
"""


def _wid(lm_arrays, blm_vocab, w):
    try:
        return blm_vocab.index(w)
    except ValueError:
        return -1


def _make_lms(tmp_path, text, name="t.arpa"):
    p = tmp_path / name
    p.write_text(text)
    host = ArpaLM(str(p))
    dev = load_device_lm(str(p), LABELS)
    vocab = sorted({w for gram in host.ngrams for w in gram})
    return host, dev, vocab


def _score_dev(dev, vocab, context, word, order):
    """Drive lm_score_word the way the beam does: id-mapped fixed context."""
    ids = [vocab.index(w) if w in vocab else -1 for w in context]
    ids = ids[-(order - 1):] if order > 1 else []
    om1 = order - 1
    ctx = np.full(om1, -1, np.int32)
    if ids:
        ctx[om1 - len(ids):] = ids
    wi = vocab.index(word) if word in vocab else -1
    return float(lm_score_word(dev, jnp.asarray(ctx),
                               jnp.int32(len(ids)), jnp.int32(wi)))


class TestScoreParity:
    CASES = [
        (("<s>",), "AB"),       # exact bigram
        ((), "BA"),             # unigram
        (("BA",), "AB"),        # backoff: bo(BA) + uni(AB)
        ((), "ZZZ"),            # OOV -> <unk>
        (("AB",), "ZZZ"),       # OOV with known context (backoff then unk)
        (("ZZZ",), "AB"),       # OOV context word
        (("AB", "AB"), "AB"),   # context longer than order-1 (truncates)
    ]

    @pytest.mark.parametrize("context,word", CASES)
    def test_bigram(self, tmp_path, context, word):
        host, dev, vocab = _make_lms(tmp_path, ARPA)
        assert _score_dev(dev, vocab, context, word, host.order) == \
            pytest.approx(host.score_word(context, word), abs=1e-5)

    TRI_CASES = [
        (("<s>", "AB"), "A"),    # exact trigram
        (("AB", "A"), "B"),      # exact trigram
        (("A", "B"), "A"),       # exact trigram
        (("<s>", "AB"), "AB"),   # backoff to bigram AB AB
        (("B", "A"), "B"),       # backoff chain: bo(B A)+bo(A)+... or bigram
        (("A", "A"), "B"),       # backoff to A B
        (("BA", "BA"), "BA"),    # all-backoff to unigram
        (("<s>", "ZZZ"), "A"),   # OOV in context middle
        (("ZZZ", "A"), "B"),     # OOV context head
        ((), "A"),               # empty context
        (("A",), "B"),           # short context
    ]

    @pytest.mark.parametrize("context,word", TRI_CASES)
    def test_trigram(self, tmp_path, context, word):
        host, dev, vocab = _make_lms(tmp_path, TRIGRAM_ARPA)
        assert _score_dev(dev, vocab, context, word, host.order) == \
            pytest.approx(host.score_word(context, word), abs=1e-5)


class TestCharTrie:
    def test_walk_and_word_ids(self, tmp_path):
        _, dev, vocab = _make_lms(tmp_path, ARPA)
        a, b = LABELS.index("A"), LABELS.index("B")
        root = jnp.int32(0)
        n_a = trie_advance(dev, root, jnp.int32(a))
        assert int(n_a) > 0
        # "A" alone is not a vocab word in ARPA (vocab: <s> </s> AB BA <unk>)
        assert int(trie_word_id(dev, n_a)) == -1
        n_ab = trie_advance(dev, n_a, jnp.int32(b))
        assert int(trie_word_id(dev, n_ab)) == vocab.index("AB")
        # dead walk: "ABB" is not a prefix of any vocab word
        n_abb = trie_advance(dev, n_ab, jnp.int32(b))
        assert int(n_abb) == -1
        assert int(trie_word_id(dev, n_abb)) == -1
        # dead stays dead
        assert int(trie_advance(dev, n_abb, jnp.int32(a))) == -1

    def test_state_init(self, tmp_path):
        _, dev, vocab = _make_lms(tmp_path, ARPA)
        ctx, ctx_len, trie = lm_state_init(dev, 4)
        assert ctx.shape == (4, 1)
        assert int(ctx[0, -1]) == vocab.index("<s>")
        assert int(ctx_len[0]) == 1
        assert int(trie[0]) == 0


def _rand_probs(rng, t, c):
    return rng.dirichlet(np.ones(c), size=t).astype(np.float64)


class TestFusedBeamParity:
    def test_lm_steers_device_beam(self, tmp_path):
        """The test_beam.py steering fixture, on device: AB wins with LM."""
        p = tmp_path / "t.arpa"
        p.write_text(ARPA)
        t = 3
        probs = np.zeros((1, t, len(LABELS)))
        probs[0, 0] = [0.02, 0.47, 0.51, 0.0]
        probs[0, 1] = [0.02, 0.51, 0.47, 0.0]
        probs[0, 2] = [0.04, 0.02, 0.02, 0.92]
        no_lm = DeviceBeamCTCDecoder(LABELS, beam_width=16)
        with_lm = DeviceBeamCTCDecoder(LABELS, beam_width=16,
                                       lm_path=str(p), alpha=2.0, beta=0.0)
        assert no_lm.decode(probs)[0][0][0].strip() == "BA"
        assert with_lm.decode(probs)[0][0][0].strip() == "AB"

    @pytest.mark.parametrize("seed", list(range(6)))
    @pytest.mark.parametrize("arpa", ["bigram", "trigram"])
    def test_matches_host_beam(self, tmp_path, seed, arpa):
        """Random emissions over the LM alphabet: device LM-fused search ==
        host LM-fused search (top string, offsets, and score)."""
        p = tmp_path / "t.arpa"
        p.write_text(ARPA if arpa == "bigram" else TRIGRAM_ARPA)
        rng = np.random.default_rng(1000 + seed)
        t, c = 14, len(LABELS)
        probs = _rand_probs(rng, t, c)
        lp = np.log(probs)

        host_lm = ArpaLM(str(p))
        host = ctc_beam_search(lp, beam_width=16,
                               space_index=LABELS.index(" "), lm=host_lm,
                               alpha=1.5, beta=0.5, labels=LABELS,
                               top_paths=3)
        dev = load_device_lm(str(p), LABELS)
        prefixes, lens, offsets, scores = ctc_beam_search_device(
            jnp.asarray(lp, jnp.float32)[None], jnp.asarray([t]),
            beam_width=16, top_paths=3, lm=dev,
            space=LABELS.index(" "), alpha=1.5, beta=0.5)
        got = tuple(int(x) for x in
                    np.asarray(prefixes)[0, 0, : int(lens[0, 0])])
        assert got == host[0][0]
        assert float(scores[0, 0]) == pytest.approx(host[0][2], rel=1e-3)
        got_offs = tuple(int(x) for x in
                         np.asarray(offsets)[0, 0, : int(lens[0, 0])])
        assert got_offs == host[0][1]

    def test_decoder_class_matches_host_class(self, tmp_path):
        """End-to-end class surfaces agree (strings + offsets) with an LM."""
        p = tmp_path / "t.arpa"
        p.write_text(ARPA)
        rng = np.random.default_rng(17)
        probs = np.stack([_rand_probs(rng, 12, len(LABELS))
                          for _ in range(3)])
        host = BeamCTCDecoder(LABELS, beam_width=12, lm_path=str(p),
                              alpha=1.0, beta=0.3, backend="python")
        devd = DeviceBeamCTCDecoder(LABELS, beam_width=12, lm_path=str(p),
                                    alpha=1.0, beta=0.3)
        hs, ho = host.decode(probs)
        ds, do = devd.decode(probs)
        for b in range(3):
            assert ds[b][0] == hs[b][0]
            np.testing.assert_array_equal(do[b][0], ho[b][0])

    def test_dslm_binary_path(self, tmp_path):
        """A converted DSLM binary loads directly into the device decoder."""
        from deepspeech_tpu.decoders.lm_binary import convert_arpa
        p = tmp_path / "t.arpa"
        p.write_text(ARPA)
        d = tmp_path / "t.dslm"
        convert_arpa(str(p), str(d))
        rng = np.random.default_rng(5)
        probs = _rand_probs(rng, 10, len(LABELS))[None]
        via_arpa = DeviceBeamCTCDecoder(LABELS, beam_width=8,
                                        lm_path=str(p), alpha=1.0, beta=0.5)
        via_dslm = DeviceBeamCTCDecoder(LABELS, beam_width=8,
                                        lm_path=str(d), alpha=1.0, beta=0.5)
        assert via_arpa.decode(probs)[0] == via_dslm.decode(probs)[0]
