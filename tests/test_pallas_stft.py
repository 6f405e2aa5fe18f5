"""Fused Pallas STFT kernel vs the jnp/numpy oracles (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepspeech_tpu.audio.features import make_window, stft_magnitude_np
from deepspeech_tpu.ops.stft import stft_magnitude
from deepspeech_tpu.ops.pallas.stft_kernel import (
    stft_magnitude_pallas, supported)


class TestPallasStft:
    @pytest.mark.parametrize("seconds", [0.5, 1.0, 3.3])
    def test_matches_jnp_matmul_path(self, seconds):
        rng = np.random.default_rng(0)
        s = int(16000 * seconds)
        y = jnp.asarray(rng.standard_normal((3, s)).astype(np.float32))
        win = make_window("hamming", 320)
        ref = stft_magnitude(y, 320, 160, win, method="matmul")
        pal = stft_magnitude_pallas(y, 320, 160, win, interpret=True)
        assert pal.shape == ref.shape
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_matches_numpy_oracle(self):
        """Single utterance against the host-parity numpy STFT."""
        rng = np.random.default_rng(1)
        y = rng.standard_normal(16000).astype(np.float32)
        win = make_window("hamming", 320)
        ref = stft_magnitude_np(y, 320, 160, win)
        pal = np.asarray(stft_magnitude_pallas(
            jnp.asarray(y)[None], 320, 160, win, interpret=True))[0]
        t = min(ref.shape[-1], pal.shape[-1])
        np.testing.assert_allclose(pal[:, :t], ref[:, :t],
                                   rtol=1e-3, atol=1e-3)

    def test_tile_boundary_sizes(self):
        """T below / at / above one 256-frame tile all agree with jnp."""
        win = make_window("hamming", 320)
        rng = np.random.default_rng(2)
        for t_frames in [10, 255, 256, 257, 513]:
            s = t_frames * 160
            y = jnp.asarray(rng.standard_normal((2, s)).astype(np.float32))
            ref = stft_magnitude(y, 320, 160, win, method="matmul")
            pal = stft_magnitude_pallas(y, 320, 160, win, interpret=True)
            assert pal.shape == ref.shape
            np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)

    def test_supported_predicate(self):
        assert supported(320, 160)
        assert not supported(400, 160)

    def test_auto_method_falls_back_off_tpu(self):
        """On CPU, method='auto' resolves to the matmul path (no crash)."""
        rng = np.random.default_rng(3)
        y = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
        win = make_window("hamming", 320)
        out = stft_magnitude(y, 320, 160, win, method="auto")
        ref = stft_magnitude(y, 320, 160, win, method="matmul")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
