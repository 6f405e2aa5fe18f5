"""Native C++ beam search: bit-parity with the Python decoder, LM scoring."""

import itertools
import math

import numpy as np
import pytest

from deepspeech_tpu.decoders.beam import BeamCTCDecoder, ctc_beam_search
from deepspeech_tpu.decoders.lm import ArpaLM
from deepspeech_tpu.decoders import beam_native

pytestmark = pytest.mark.skipif(not beam_native.available(),
                                reason="native library unavailable")

LABELS = "_AB "

ARPA = """\\data\\
ngram 1=5
ngram 2=2

\\1-grams:
-0.30103\t<s>\t0
-0.60206\t</s>\t0
-0.39794\tAB\t-0.30103
-1.69897\tBA\t-0.30103
-2.0\t<unk>\t0

\\2-grams:
-0.17609\t<s> AB
-0.30103\tAB AB

\\end\\
"""


@pytest.fixture()
def arpa_path(tmp_path):
    p = tmp_path / "test.arpa"
    p.write_text(ARPA)
    return str(p)


def _random_logprobs(rng, t, c):
    return np.log(rng.dirichlet(np.ones(c), size=t))


class TestParityNoLM:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("kw", [
        dict(beam_width=16),
        dict(beam_width=8, cutoff_top_n=5),
        dict(beam_width=32, cutoff_prob=0.95, top_paths=4),
        dict(beam_width=4, top_paths=4),
    ])
    def test_matches_python_exactly(self, seed, kw):
        rng = np.random.default_rng(seed)
        lp = _random_logprobs(rng, t=40, c=30)
        py = ctc_beam_search(lp, **kw)
        cc = beam_native.ctc_beam_search_native(lp, **kw)
        assert len(py) == len(cc)
        for (pp, po, ps), (cp, co, cs) in zip(py, cc):
            assert pp == cp
            assert po == co
            assert cs == pytest.approx(ps, abs=1e-12)

    def test_brute_force_oracle(self):
        """Best hypothesis equals the exhaustive path-sum ranking."""
        rng = np.random.default_rng(7)
        t, c = 4, 3
        probs = rng.dirichlet(np.ones(c), size=t)
        totals = {}
        for path in itertools.product(range(c), repeat=t):
            p = 1.0
            for step, sym in enumerate(path):
                p *= probs[step, sym]
            out, prev = [], None
            for sym in path:
                if sym != prev and sym != 0:
                    out.append(sym)
                prev = sym
            totals[tuple(out)] = totals.get(tuple(out), 0.0) + p
        oracle = max(totals.items(), key=lambda kv: kv[1])
        hyps = beam_native.ctc_beam_search_native(np.log(probs), beam_width=64)
        assert hyps[0][0] == oracle[0]
        assert math.exp(hyps[0][2]) == pytest.approx(oracle[1], rel=1e-9)

    def test_offsets(self):
        probs = np.full((3, 3), 0.01)
        probs[0, 1] = 0.98
        probs[1, 0] = 0.98
        probs[2, 2] = 0.98
        probs /= probs.sum(-1, keepdims=True)
        hyps = beam_native.ctc_beam_search_native(np.log(probs), beam_width=8)
        assert hyps[0][0] == (1, 2)
        assert hyps[0][1] == (0, 2)


class TestNativeLM:
    def test_scoring_parity(self, arpa_path):
        py = ArpaLM(arpa_path)
        cc = beam_native.NativeArpaLM(arpa_path)
        assert cc.order == py.order == 2
        cases = [(("<s>",), "AB"), ((), "BA"), (("BA",), "AB"), ((), "ZZZ"),
                 (("AB", "AB"), "BA"), (("X", "Y"), "AB"),
                 (("<s>", "AB"), "AB")]
        for ctx, w in cases:
            assert cc.score_word(ctx, w) == pytest.approx(
                py.score_word(ctx, w), abs=1e-12)

    def test_gzip_arpa(self, tmp_path):
        import gzip
        p = tmp_path / "t.arpa.gz"
        with gzip.open(p, "wt") as f:
            f.write(ARPA)
        lm = beam_native.NativeArpaLM(str(p))
        assert lm.order == 2

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_fused_beam_parity(self, arpa_path, seed):
        py_lm = ArpaLM(arpa_path)
        cc_lm = beam_native.NativeArpaLM(arpa_path)
        rng = np.random.default_rng(seed)
        lp = _random_logprobs(rng, t=25, c=len(LABELS))
        kw = dict(beam_width=16, space_index=3, alpha=2.0, beta=0.5,
                  labels=LABELS, top_paths=3)
        py = ctc_beam_search(lp, lm=py_lm, **kw)
        cc = beam_native.ctc_beam_search_native(lp, lm=cc_lm, **kw)
        for (pp, po, ps), (cp, co, cs) in zip(py, cc):
            assert pp == cp
            assert po == co
            assert cs == pytest.approx(ps, abs=1e-10)

    def test_lm_steers_beam(self, arpa_path):
        """Same steering scenario as the Python decoder test (test_beam.py)."""
        probs = np.zeros((1, 3, len(LABELS)))
        probs[0, 0] = [0.02, 0.47, 0.51, 0.0]
        probs[0, 1] = [0.02, 0.51, 0.47, 0.0]
        probs[0, 2] = [0.04, 0.02, 0.02, 0.92]
        base = BeamCTCDecoder(LABELS, beam_width=16, backend="native")
        fused = BeamCTCDecoder(LABELS, beam_width=16, lm_path=arpa_path,
                               alpha=2.0, beta=0.0, backend="native")
        assert base.decode(probs)[0][0][0].strip() == "BA"
        assert fused.decode(probs)[0][0][0].strip() == "AB"


class TestBackendSelection:
    def test_auto_picks_native(self):
        dec = BeamCTCDecoder(LABELS, beam_width=4)
        assert dec.backend == "native"

    def test_python_forced(self):
        dec = BeamCTCDecoder(LABELS, beam_width=4, backend="python")
        assert dec.backend == "python"

    def test_backends_agree_through_decoder_api(self):
        rng = np.random.default_rng(5)
        probs = rng.dirichlet(np.ones(len(LABELS)), size=(2, 12))
        a = BeamCTCDecoder(LABELS, beam_width=8, top_paths=2,
                           backend="native").decode(probs, sizes=[12, 9])
        b = BeamCTCDecoder(LABELS, beam_width=8, top_paths=2,
                           backend="python").decode(probs, sizes=[12, 9])
        assert a[0] == b[0]
        for oa, ob in zip(a[1], b[1]):
            for x, y in zip(oa, ob):
                assert np.array_equal(x, y)
