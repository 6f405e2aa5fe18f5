"""Augmentation tests: host DSP oracles + host/device mask semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepspeech_tpu.audio.dsp import pitch_shift, resample, time_stretch
from deepspeech_tpu.augment import (
    AddNoise, AudioDistort, ChangeAudioSpeed, Compose, FrequencyMask, OneOf,
    OneOrOther, PitchShift, SCompose, Shift, SOneOf, TimeMask,
    build_waveform_pipeline, spec_augment,
)
from deepspeech_tpu.augment.spectrogram import band_zero_8khz

SR = 16000


def sine(freq=440.0, seconds=1.0, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def dominant_freq(y, sr=SR):
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return np.argmax(spec) * sr / len(y)


class TestDsp:
    def test_resample_preserves_pitch(self):
        y = sine(440.0)
        y8 = resample(y, SR, 8000)
        assert abs(len(y8) - len(y) // 2) <= 2
        assert abs(dominant_freq(y8, 8000) - 440.0) < 5

    def test_time_stretch_changes_length_not_pitch(self):
        y = sine(440.0)
        fast = time_stretch(y, 1.25)
        assert abs(len(fast) - len(y) / 1.25) < 512
        assert abs(dominant_freq(fast) * len(fast) / SR
                   - 440.0 * len(fast) / SR) < 8  # same frequency bin region

    def test_pitch_shift_preserves_length_moves_pitch(self):
        y = sine(440.0)
        up = pitch_shift(y, SR, 2.0)
        assert len(up) == len(y)
        expected = 440.0 * 2 ** (2 / 12)
        assert abs(dominant_freq(up) - expected) < 10

    def test_identity_fast_paths(self):
        y = sine()
        assert time_stretch(y, 1.0) is not None
        np.testing.assert_array_equal(pitch_shift(y, SR, 0), y)
        np.testing.assert_array_equal(resample(y, SR, SR), y)


class TestWaveformTransforms:
    def test_shift_pads_front(self):
        y = sine(seconds=0.2)
        rng = np.random.default_rng(0)
        out, _ = Shift(limit=512, prob=1.0)(y, SR, rng)
        assert len(out) == len(y) + 512
        assert np.abs(out[:8]).max() <= np.abs(y[:520]).max() + 1e-6

    def test_distort_clips_symmetric(self):
        y = sine(seconds=0.1) * 0.5
        rng = np.random.default_rng(1)
        out, _ = AudioDistort(limit=0.5, prob=1.0)(y, SR, rng)
        peak = np.abs(y).max()
        assert np.abs(out).max() <= peak + 1e-6
        assert out.min() < -0.1  # negative half survives (reference bug fixed)

    def test_add_noise_gaussian_only(self):
        y = sine(seconds=0.1)
        rng = np.random.default_rng(2)
        out, _ = AddNoise(limit=0.2, prob=1.0, noise_samples=[])(y, SR, rng)
        assert out.shape == y.shape
        assert not np.allclose(out, y)
        assert np.abs(out).max() < 1.5

    def test_speed_changes_duration(self):
        y = sine(seconds=0.5)
        rng = np.random.default_rng(3)
        out, _ = ChangeAudioSpeed(limit=0.15, prob=1.0)(y, SR, rng)
        assert out.shape[0] != y.shape[0]
        assert abs(out.shape[0] - len(y)) < 0.2 * len(y)

    def test_determinism(self):
        y = sine(seconds=0.3)
        pipe = build_waveform_pipeline(0.9, sample_rate=SR)
        a, _ = pipe(y.copy(), SR, np.random.default_rng(7))
        b, _ = pipe(y.copy(), SR, np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)

    def test_oneof_restores_prob(self):
        t = AudioDistort(limit=0.5, prob=0.3)
        one = OneOf([t, Shift(prob=0.3)], prob=1.0)
        one(sine(seconds=0.05), SR, np.random.default_rng(0))
        assert t.prob == 0.3

    def test_one_or_other_and_compose(self):
        y = sine(seconds=0.1)
        rng = np.random.default_rng(4)
        t = OneOrOther(AudioDistort(prob=0.5), Shift(prob=0.5))
        out, _ = t(y, SR, rng)
        assert out is not None
        out2, _ = Compose([AudioDistort(prob=1.0)], p=1.0)(y, SR, rng)
        assert out2.shape == y.shape


class TestHostSpectrogramMasks:
    def test_frequency_mask_zeroes_rows(self):
        s = np.ones((161, 100), np.float32)
        out = FrequencyMask(bands=2, prob=1.0, dropout_width=20)(
            s, np.random.default_rng(0))
        zero_rows = (out == 0).all(axis=1).sum()
        assert 0 < zero_rows <= 2 * 20

    def test_time_mask_respects_ratio(self):
        s = np.ones((161, 40), np.float32)
        out = TimeMask(bands=2, prob=1.0, dropout_length=50,
                       max_dropout_ratio=0.15)(s, np.random.default_rng(0))
        zero_cols = (out == 0).all(axis=0).sum()
        assert zero_cols <= 2 * int(0.15 * 40)

    def test_soneof_applies_one(self):
        s = np.ones((161, 60), np.float32)
        aug = SOneOf([FrequencyMask(prob=0.25, dropout_width=20),
                      TimeMask(prob=0.25)], prob=1.0)
        out = aug(s, np.random.default_rng(1))
        assert (out == 0).any()


class TestDeviceSpecAugment:
    def test_prob_zero_identity(self):
        s = jnp.ones((2, 161, 50))
        out = spec_augment(s, jnp.asarray([50, 50]), jax.random.PRNGKey(0), 0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(s))

    def test_masks_applied(self):
        s = jnp.ones((8, 161, 80))
        out = spec_augment(s, jnp.full((8,), 80), jax.random.PRNGKey(1), 1.0)
        out = np.asarray(out)
        assert out.shape == (8, 161, 80)
        assert (out == 0).any()
        # each utterance gets exactly one of {freq, time} mask: either some
        # full-zero rows or some full-zero cols
        for b in range(8):
            rows = (out[b] == 0).all(axis=1).any()
            cols = (out[b] == 0).all(axis=0).any()
            assert rows or cols or (out[b] == 1).all()  # width-0 draw possible

    def test_time_cap_uses_valid_length(self):
        s = jnp.ones((4, 161, 200))
        lengths = jnp.asarray([20, 20, 20, 20])
        out = np.asarray(spec_augment(s, lengths, jax.random.PRNGKey(2), 1.0))
        for b in range(4):
            zero_cols = (out[b] == 0).all(axis=0).sum()
            assert zero_cols <= 2 * int(0.15 * 20) + 1

    def test_band_zero_8khz(self):
        s = jnp.ones((3, 161, 10))
        out = np.asarray(band_zero_8khz(s, jax.random.PRNGKey(0), 1.0))
        assert (out[:, 81:, :] == 0).all()
        assert (out[:, :81, :] == 1).all()
        out2 = np.asarray(band_zero_8khz(s, jax.random.PRNGKey(0), 0.0))
        assert (out2 == 1).all()

    def test_jit_compatible(self):
        f = jax.jit(lambda s, l, k: spec_augment(s, l, k, 0.5))
        out = f(jnp.ones((2, 161, 30)), jnp.asarray([30, 25]),
                jax.random.PRNGKey(3))
        assert out.shape == (2, 161, 30)


class TestAugTypePipelines:
    """Reference aug_type 0-3 pipeline variants (data_loader_aug.py:367-412;
    the reference hardcodes 0 at :355 — here each is selectable)."""

    def _members(self, aug_type, noise=()):
        from deepspeech_tpu.augment.waveform import build_waveform_pipeline
        pipe = build_waveform_pipeline(0.9, noise_samples=noise,
                                       sample_rate=16000, aug_type=aug_type)
        return pipe, [type(t).__name__ for t in pipe.transforms]

    def test_type0_all_five(self):
        _, names = self._members(0)
        assert names == ["AddNoise", "ChangeAudioSpeed", "AudioDistort",
                         "Shift", "PitchShift"]

    def test_type1_shift_only_wider_limit(self):
        pipe, names = self._members(1)
        assert names == ["Shift"]
        # type-1 shift limit is 2 s (vs 0.5 s inside type 0)
        assert pipe.transforms[0].limit == 16000 * 2

    def test_type2_tone_effects(self):
        _, names = self._members(2)
        assert names == ["ChangeAudioSpeed", "PitchShift"]

    def test_type3_noise_and_distort_low_limit(self):
        pipe, names = self._members(3)
        assert names == ["AddNoise", "AudioDistort"]
        assert pipe.transforms[0].limit == 0.05  # vs 0.2 in type 0

    def test_unknown_type_raises(self):
        from deepspeech_tpu.augment.waveform import build_waveform_pipeline
        with pytest.raises(ValueError):
            build_waveform_pipeline(0.5, aug_type=7)

    @pytest.mark.parametrize("aug_type", [0, 1, 2, 3])
    def test_pipelines_run(self, aug_type):
        from deepspeech_tpu.augment.waveform import build_waveform_pipeline
        pipe = build_waveform_pipeline(1.0, aug_type=aug_type)
        rng = np.random.default_rng(0)
        wav = (0.1 * np.sin(2 * np.pi * 440 *
                            np.arange(8000) / 16000)).astype(np.float32)
        out, sr = pipe(wav, 16000, rng)
        assert sr == 16000
        assert out.dtype == np.float32 and out.ndim == 1 and len(out) > 0
