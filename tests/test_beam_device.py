"""On-device jit-able beam search vs the host beam search + brute force."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from deepspeech_tpu.decoders import (BeamCTCDecoder, DeviceBeamCTCDecoder,
                                     ctc_beam_search, ctc_beam_search_device)
from tests.test_beam import brute_force_best

LABELS = "_AB "


def _rand_log_probs(rng, t, c):
    probs = rng.dirichlet(np.ones(c), size=t)
    return np.log(probs).astype(np.float32), probs


class TestDeviceVsBruteForce:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_exact_on_tiny_inputs(self, seed):
        rng = np.random.default_rng(seed)
        t, c = 4, 3
        lp, probs = _rand_log_probs(rng, t, c)
        oracle = brute_force_best(probs, top=3)
        prefixes, lens, _, scores = ctc_beam_search_device(
            jnp.asarray(lp)[None], jnp.asarray([t]), beam_width=64,
            top_paths=3)
        got = tuple(int(x) for x in np.asarray(prefixes)[0, 0, : int(lens[0, 0])])
        assert got == oracle[0][0]
        assert math.exp(float(scores[0, 0])) == pytest.approx(
            oracle[0][1], rel=1e-4)


class TestDeviceVsHost:
    @pytest.mark.parametrize("seed", list(range(5)))
    def test_matches_host_beam(self, seed):
        """Top hypothesis + merged score agree with the host implementation."""
        rng = np.random.default_rng(100 + seed)
        t, c = 12, 6
        lp, _ = _rand_log_probs(rng, t, c)
        host = ctc_beam_search(lp.astype(np.float64), beam_width=16,
                               top_paths=3)
        prefixes, lens, offsets, scores = ctc_beam_search_device(
            jnp.asarray(lp)[None], jnp.asarray([t]), beam_width=16,
            top_paths=3)
        got = tuple(int(x) for x in np.asarray(prefixes)[0, 0, : int(lens[0, 0])])
        assert got == host[0][0]
        assert float(scores[0, 0]) == pytest.approx(host[0][2], rel=1e-3)
        # offsets convention matches (frame index of each emitted char)
        got_offs = tuple(int(x) for x in
                         np.asarray(offsets)[0, 0, : int(lens[0, 0])])
        assert got_offs == host[0][1]

    def test_cutoff_pruning_matches_host(self):
        rng = np.random.default_rng(7)
        t, c = 10, 8
        lp, _ = _rand_log_probs(rng, t, c)
        host = ctc_beam_search(lp.astype(np.float64), beam_width=8,
                               cutoff_top_n=3, cutoff_prob=0.9)
        prefixes, lens, _, scores = ctc_beam_search_device(
            jnp.asarray(lp)[None], jnp.asarray([t]), beam_width=8,
            cutoff_top_n=3, cutoff_prob=0.9)
        got = tuple(int(x) for x in np.asarray(prefixes)[0, 0, : int(lens[0, 0])])
        assert got == host[0][0]
        assert float(scores[0, 0]) == pytest.approx(host[0][2], rel=1e-3)


class TestBatchingAndPadding:
    def test_padded_steps_are_noops(self):
        """Scores/prefixes with trailing padding match the unpadded decode."""
        rng = np.random.default_rng(3)
        t, c = 9, 5
        lp, _ = _rand_log_probs(rng, t, c)
        padded = np.concatenate(
            [lp, rng.standard_normal((6, c)).astype(np.float32)], axis=0)
        p1, l1, _, s1 = ctc_beam_search_device(
            jnp.asarray(lp)[None], jnp.asarray([t]), beam_width=8)
        p2, l2, _, s2 = ctc_beam_search_device(
            jnp.asarray(padded)[None], jnp.asarray([t]), beam_width=8)
        assert int(l1[0, 0]) == int(l2[0, 0])
        n = int(l1[0, 0])
        np.testing.assert_array_equal(np.asarray(p1)[0, 0, :n],
                                      np.asarray(p2)[0, 0, :n])
        assert float(s1[0, 0]) == pytest.approx(float(s2[0, 0]), rel=1e-5)

    def test_batch_matches_single(self):
        rng = np.random.default_rng(11)
        t, c = 8, 5
        lps = [_rand_log_probs(rng, t, c)[0] for _ in range(3)]
        batched = jnp.asarray(np.stack(lps))
        pb, lb, _, sb = ctc_beam_search_device(
            batched, jnp.asarray([t, t, t]), beam_width=8)
        for i, lp in enumerate(lps):
            p1, l1, _, s1 = ctc_beam_search_device(
                jnp.asarray(lp)[None], jnp.asarray([t]), beam_width=8)
            assert int(lb[i, 0]) == int(l1[0, 0])
            n = int(l1[0, 0])
            np.testing.assert_array_equal(np.asarray(pb)[i, 0, :n],
                                          np.asarray(p1)[0, 0, :n])
            assert float(sb[i, 0]) == pytest.approx(float(s1[0, 0]), rel=1e-5)


class TestDecoderWrapper:
    def test_strings_match_host_decoder(self):
        rng = np.random.default_rng(21)
        b, t, c = 4, 14, len(LABELS)
        probs = rng.dirichlet(np.ones(c), size=(b, t)).astype(np.float32)
        sizes = np.array([14, 10, 7, 14], np.int32)
        host = BeamCTCDecoder(LABELS, beam_width=16, num_processes=1)
        dev = DeviceBeamCTCDecoder(LABELS, beam_width=16)
        hs, ho = host.decode(probs, sizes)
        ds, do = dev.decode(probs, sizes)
        for i in range(b):
            assert ds[i][0] == hs[i][0]
            np.testing.assert_array_equal(do[i][0], ho[i][0])


class TestShardedDecode:
    def test_sharded_matches_single_device(self):
        """Batch sharded over the mesh's data axis decodes to exactly the
        single-device hypotheses — decode parallelism for cli/test.py's
        batch eval (the reference's test.py:101-120 loop, DP-scaled)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from deepspeech_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs the multi-device CPU mesh")
        mesh = make_mesh(data=len(jax.devices()), model=1)
        rng = np.random.default_rng(31)
        b, t, c = 2 * len(jax.devices()), 12, 5
        lp = np.log(rng.dirichlet(np.ones(c), size=(b, t))).astype(np.float32)
        lens = np.full((b,), t, np.int32)

        ref = ctc_beam_search_device(jnp.asarray(lp), jnp.asarray(lens),
                                     beam_width=8, top_paths=2)
        sh = NamedSharding(mesh, P("data"))
        out = ctc_beam_search_device(jax.device_put(lp, sh),
                                     jax.device_put(lens, sh),
                                     beam_width=8, top_paths=2)
        for a, b_ in zip(ref, out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        # outputs really are sharded over the data axis
        assert len(out[0].sharding.device_set) == len(jax.devices())
