"""Beam search CTC decoder: brute-force oracle, pruning knobs, LM fusion."""

import itertools
import math

import numpy as np
import pytest

from deepspeech_tpu.decoders import GreedyDecoder
from deepspeech_tpu.decoders.beam import BeamCTCDecoder, ctc_beam_search
from deepspeech_tpu.decoders.lm import ArpaLM

LABELS = "_AB "  # blank, A, B, space


def brute_force_best(probs: np.ndarray, blank=0, top=3):
    """Enumerate every alignment path, sum per collapsed label sequence."""
    t, c = probs.shape
    totals = {}
    for path in itertools.product(range(c), repeat=t):
        p = 1.0
        for step, sym in enumerate(path):
            p *= probs[step, sym]
        # collapse: remove repeats then blanks
        out = []
        prev = None
        for sym in path:
            if sym != prev and sym != blank:
                out.append(sym)
            prev = sym
        key = tuple(out)
        totals[key] = totals.get(key, 0.0) + p
    ranked = sorted(totals.items(), key=lambda kv: kv[1], reverse=True)
    return ranked[:top]


class TestBeamVsBruteForce:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_exact_on_tiny_inputs(self, seed):
        rng = np.random.default_rng(seed)
        t, c = 4, 3
        probs = rng.dirichlet(np.ones(c), size=t)
        oracle = brute_force_best(probs, top=3)
        hyps = ctc_beam_search(np.log(probs), beam_width=64, top_paths=3)
        assert hyps[0][0] == oracle[0][0]
        # total probability of the best prefix matches the path sum
        assert math.exp(hyps[0][2]) == pytest.approx(oracle[0][1], rel=1e-6)

    def test_beam_beats_greedy_when_paths_split(self):
        """Classic CTC case: greedy picks the per-frame argmax path, beam
        sums alignments of the same label sequence."""
        # p(blank)=0.4, p(A)=0.6 at both steps -> greedy says "A" via argmax,
        # but P("") = 0.4*0.4 = 0.16 < P("A") = 1 - P("")... construct the
        # reverse: argmax path is blank-blank ("") but "A" has more mass
        probs = np.array([[0.4, 0.6], [0.4, 0.6]])  # blank, A
        # P("") = 0.16; P("A") = 0.6*0.6 + 0.6*0.4 + 0.4*0.6 = 0.84
        hyps = ctc_beam_search(np.log(probs), beam_width=8, top_paths=2)
        assert hyps[0][0] == (1,)
        assert math.exp(hyps[0][2]) == pytest.approx(0.84, rel=1e-9)
        assert math.exp(hyps[1][2]) == pytest.approx(0.16, rel=1e-9)

    def test_offsets_recorded(self):
        probs = np.full((3, 3), 0.01)
        probs[0, 1] = 0.98  # A at t=0
        probs[1, 0] = 0.98  # blank
        probs[2, 2] = 0.98  # B at t=2
        probs /= probs.sum(-1, keepdims=True)
        hyps = ctc_beam_search(np.log(probs), beam_width=8)
        prefix, offsets, _ = hyps[0]
        assert prefix == (1, 2)
        assert offsets == (0, 2)


class TestDecoderClass:
    def _probs(self):
        rng = np.random.default_rng(3)
        return rng.dirichlet(np.ones(len(LABELS)), size=(2, 6))

    def test_decode_batch_api(self):
        dec = BeamCTCDecoder(LABELS, beam_width=8, top_paths=2,
                             num_processes=2)
        strings, offsets = dec.decode(self._probs(), sizes=[6, 4])
        assert len(strings) == 2
        assert 1 <= len(strings[0]) <= 2
        assert all(isinstance(s, str) for s in strings[0])
        assert len(offsets[0][0]) == len(strings[0][0])

    def test_python_process_pool_matches_serial(self):
        """The pure-Python backend's --lm-workers fan-out uses spawned
        processes (threads cannot parallelize a GIL-bound search); results
        must be identical to the serial path."""
        rng = np.random.default_rng(7)
        probs = rng.dirichlet(np.ones(len(LABELS)), size=(4, 8))
        serial = BeamCTCDecoder(LABELS, beam_width=6, top_paths=2,
                                backend="python", num_processes=1)
        par = BeamCTCDecoder(LABELS, beam_width=6, top_paths=2,
                             backend="python", num_processes=2)
        try:
            s_strings, s_offsets = serial.decode(probs, sizes=[8, 6, 8, 5])
            p_strings, p_offsets = par.decode(probs, sizes=[8, 6, 8, 5])
        finally:
            par.close()
        assert p_strings == s_strings
        for so, po in zip(s_offsets, p_offsets):
            for a, b in zip(so, po):
                assert np.array_equal(a, b)

    def test_matches_greedy_on_peaked_input(self):
        """When per-frame posteriors are nearly one-hot, beam == greedy."""
        ids = [1, 1, 0, 2, 0, 3, 1]
        probs = np.full((1, len(ids), len(LABELS)), 1e-4)
        for t, i in enumerate(ids):
            probs[0, t, i] = 1.0
        probs /= probs.sum(-1, keepdims=True)
        beam = BeamCTCDecoder(LABELS, beam_width=4)
        greedy = GreedyDecoder(LABELS)
        bs, _ = beam.decode(probs)
        gs, _ = greedy.decode(probs)
        assert bs[0][0] == gs[0][0] == "AB A"

    def test_cutoff_top_n_prunes(self):
        probs = self._probs()
        full = BeamCTCDecoder(LABELS, beam_width=8).decode(probs)[0]
        pruned = BeamCTCDecoder(LABELS, beam_width=8,
                                cutoff_top_n=1).decode(probs)[0]
        assert pruned is not None  # runs, possibly different result
        assert len(full) == len(pruned)


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


class TestLM:
    @pytest.fixture()
    def lm(self, tmp_path):
        p = tmp_path / "test.arpa"
        p.write_text(ARPA)
        return ArpaLM(str(p))

    def test_arpa_parse(self, lm):
        assert lm.order == 2
        assert lm.score_word(("<s>",), "AB") == pytest.approx(-0.17609)
        assert lm.score_word((), "BA") == pytest.approx(-1.69897)

    def test_backoff(self, lm):
        # ("BA", "AB") unseen -> backoff("BA") + unigram("AB")
        assert lm.score_word(("BA",), "AB") == pytest.approx(
            -0.30103 + -0.39794)

    def test_unknown_word(self, lm):
        assert lm.score_word((), "ZZZ") == pytest.approx(-2.0)

    def test_lm_steers_beam(self, tmp_path):
        """Acoustically ambiguous AB-vs-BA: the LM strongly prefers AB."""
        p = tmp_path / "t.arpa"
        p.write_text(ARPA)
        t = 3
        probs = np.zeros((1, t, len(LABELS)))
        # frame 0: A vs B almost tied, B slightly ahead
        probs[0, 0] = [0.02, 0.47, 0.51, 0.0]
        probs[0, 1] = [0.02, 0.51, 0.47, 0.0]
        probs[0, 2] = [0.04, 0.02, 0.02, 0.92]  # space -> word boundary
        no_lm = BeamCTCDecoder(LABELS, beam_width=16)
        with_lm = BeamCTCDecoder(LABELS, beam_width=16, lm_path=str(p),
                                 alpha=2.0, beta=0.0)
        base, _ = no_lm.decode(probs)
        fused, _ = with_lm.decode(probs)
        assert base[0][0].strip() == "BA"
        assert fused[0][0].strip() == "AB"


class TestBlankCollapse:
    """arXiv:2210.17017 emission compression before beam search."""

    def _peaked(self, ids, blank_runs, p=0.999):
        """Build (T, C) probs emitting `ids` with runs of near-certain
        blanks in between."""
        rows = []
        for i, c in enumerate(ids):
            for _ in range(blank_runs):
                row = np.full(len(LABELS), (1 - p) / (len(LABELS) - 1))
                row[0] = p
                rows.append(row)
            row = np.full(len(LABELS), 1e-4)
            row[c] = 1.0
            rows.append(row / row.sum())
        probs = np.stack(rows)
        return probs / probs.sum(-1, keepdims=True)

    def test_compression_and_frame_map(self):
        from deepspeech_tpu.decoders.beam import blank_collapse
        probs = self._peaked([1, 2, 1], blank_runs=5)
        lp = np.log(probs)
        comp, idx = blank_collapse(lp, threshold=0.99)
        # each 5-frame blank run collapses to 1 representative
        assert comp.shape[0] == 3 * (1 + 1)
        np.testing.assert_array_equal(comp, lp[idx])

    def test_off_by_default(self):
        from deepspeech_tpu.decoders.beam import blank_collapse
        lp = np.log(self._peaked([1], blank_runs=3))
        comp, idx = blank_collapse(lp, threshold=1.0)
        assert comp.shape == lp.shape
        np.testing.assert_array_equal(idx, np.arange(lp.shape[0]))

    @pytest.mark.parametrize("backend", ["python", "native"])
    def test_decode_matches_full(self, backend):
        probs = self._peaked([1, 2, 2, 1], blank_runs=4)[None]
        full = BeamCTCDecoder(LABELS, beam_width=8, backend=backend)
        fast = BeamCTCDecoder(LABELS, beam_width=8, backend=backend,
                              blank_collapse_threshold=0.99)
        s_full, o_full = full.decode(probs)
        s_fast, o_fast = fast.decode(probs)
        assert s_fast[0][0] == s_full[0][0] == "ABBA"
        # offsets are mapped back to original frame indices
        assert [int(x) for x in o_fast[0][0]] == [int(x) for x in o_full[0][0]]
