"""On-device noise injection (augment/noise_device.py) vs the host AddNoise
(augment/waveform.py; reference data/audio_aug.py:79-107 semantics)."""

import numpy as np
import pytest
import scipy.io.wavfile as wavfile

import jax
import jax.numpy as jnp

from deepspeech_tpu.augment.noise_device import (add_noise_batch,
                                                 build_noise_bank)
from deepspeech_tpu.augment.waveform import AddNoise

SR = 16000


def _write_wav(path, y):
    wavfile.write(str(path), SR, (np.clip(y, -1, 1) * 32767).astype(np.int16))


@pytest.fixture(scope="module")
def noise_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("noise") / "hum.wav"
    t = np.arange(2 * SR) / SR
    _write_wav(p, 0.5 * np.sin(2 * np.pi * 60 * t))
    return str(p)


def _sig(n):
    return (0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / SR)
            ).astype(np.float32)


class TestBank:
    def test_build(self, noise_file):
        bank, lens = build_noise_bank([noise_file], SR, width=SR, pad=160)
        assert bank.shape == (1, 2 * (SR + 160))
        assert lens[0] == 2 * (SR + 160)  # 2 s clip stacked to fill
        assert np.abs(bank[0, : lens[0]]).max() > 0.1

    def test_empty(self):
        bank, lens = build_noise_bank([], SR, width=SR)
        assert bank.shape[0] == 1 and lens[0] == 0


class TestSemantics:
    def test_prob_zero_identity(self, noise_file):
        bank, lens = build_noise_bank([noise_file], SR, SR)
        y = _sig(SR)[None]
        out = add_noise_batch(jnp.asarray(y), jnp.asarray([SR]),
                              jax.random.PRNGKey(0), jnp.asarray(bank),
                              jnp.asarray(lens), prob=0.0, limit=0.5)
        np.testing.assert_array_equal(np.asarray(out), y)

    def test_short_clip_aborts_both_passes(self, tmp_path):
        """Host AddNoise RETURNS when the pool clip is too short — the
        gaussian pass is skipped too (audio_aug.py:94-96). max_clips
        stacking caps the clip at 10 reads, so a long utterance over a tiny
        clip reproduces the abort; the device output must equal the input
        exactly with prob=1."""
        p = tmp_path / "tiny.wav"
        _write_wav(p, 0.4 * np.ones(100))  # 10 stacked reads = 1000 samples
        width = 2 * SR
        bank, lens = build_noise_bank([str(p)], SR, width)
        assert lens[0] < SR  # shorter than the utterance below
        y = _sig(SR)[None]
        out = add_noise_batch(jnp.asarray(np.pad(y, ((0, 0), (0, width - SR)))),
                              jnp.asarray([SR]), jax.random.PRNGKey(3),
                              jnp.asarray(bank), jnp.asarray(lens),
                              prob=1.0, limit=0.5)
        np.testing.assert_array_equal(np.asarray(out)[0, :SR], y[0])

    def test_mix_distribution_matches_host(self, noise_file):
        """(wav + a*noise)/(1+a) with a ~ U(0, limit): the per-sample
        output moments of 1500 independent device rows match 1500 host
        AddNoise draws on the same waveform."""
        n = SR // 2
        y = _sig(n)
        trials = 1500
        host = np.stack([
            AddNoise(limit=0.5, prob=0.7, noise_samples=[noise_file])(
                y.copy(), SR, np.random.default_rng(1000 + i))[0]
            for i in range(trials)])

        bank, lens = build_noise_bank([noise_file], SR, n)
        audio = jnp.asarray(np.tile(y, (trials, 1)))
        out = np.asarray(add_noise_batch(
            audio, jnp.full((trials,), n, jnp.int32), jax.random.PRNGKey(7),
            jnp.asarray(bank), jnp.asarray(lens), prob=0.7, limit=0.5))

        dh = host - y[None]
        dd = out - y[None]
        # fraction of untouched rows ~ (1-p)^2 = 0.09
        untouched_h = (np.abs(dh).max(1) < 1e-7).mean()
        untouched_d = (np.abs(dd).max(1) < 1e-7).mean()
        assert untouched_h == pytest.approx(0.09, abs=0.03)
        assert untouched_d == pytest.approx(untouched_h, abs=0.035)
        # perturbation magnitude distribution
        assert dd.mean() == pytest.approx(dh.mean(), abs=5e-3)
        assert dd.std() == pytest.approx(dh.std(), rel=0.1)

    def test_reflect_tail_rewritten(self, noise_file):
        """After mixing, the pad region holds the reflection of the MIXED
        samples — byte-for-byte what the host featurizer would reflect."""
        n, pad = SR // 4, 160
        s = n + 1000
        y = np.zeros((1, s), np.float32)
        y[0, :n] = _sig(n)
        y[0, n: n + pad] = y[0, n - 2 - np.arange(pad)]  # clean tail
        bank, lens = build_noise_bank([noise_file], SR, s)
        out = np.asarray(add_noise_batch(
            jnp.asarray(y), jnp.asarray([n]), jax.random.PRNGKey(11),
            jnp.asarray(bank), jnp.asarray(lens), prob=1.0, limit=0.5,
            reflect_pad=pad))
        assert np.abs(out[0, :n] - y[0, :n]).max() > 1e-5  # noise applied
        np.testing.assert_allclose(out[0, n: n + pad],
                                   out[0, n - 2 - np.arange(pad)], rtol=0,
                                   atol=0)
        assert np.all(out[0, n + pad:] == 0.0)  # beyond tail stays zero


class TestTrainStepIntegration:
    def test_step_runs_with_noise_bank(self, noise_file):
        """StepConfig.device_noise_prob + a noise_bank in the batch: the
        compiled step runs and the loss differs from the clean-step loss."""
        from deepspeech_tpu.audio import AudioConf
        from deepspeech_tpu.models import DeepSpeech2
        from deepspeech_tpu.train import (StepConfig, TrainState,
                                          build_optimizer, make_train_step)
        model = DeepSpeech2(num_classes=30, hidden_size=16, hidden_layers=1,
                            cell="gru", bidirectional=True)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 161, 21)), jnp.asarray([21]),
                               False)
        tx = build_optimizer("sgd", lr=1e-4, momentum=0.9, max_norm=100.0)
        n = SR
        bank, lens = build_noise_bank([noise_file], SR, n, pad=160)
        batch = {
            "audio": jnp.asarray(np.tile(_sig(n), (2, 1))),
            "audio_lengths": jnp.asarray([n, n], jnp.int32),
            "targets": jnp.asarray([[1, 2, 3], [2, 3, 4]], jnp.int32),
            "target_lengths": jnp.asarray([3, 3], jnp.int32),
            "noise_bank": jnp.asarray(bank),
            "noise_bank_lengths": jnp.asarray(lens),
        }
        losses = {}
        for prob in (0.0, 1.0):
            step = make_train_step(
                model, tx, StepConfig(audio_conf=AudioConf(),
                                      device_noise_prob=prob), donate=False)
            state = TrainState.create(variables, tx)
            _, m = step(state, batch, jax.random.PRNGKey(5))
            losses[prob] = float(m["loss"])
            assert np.isfinite(losses[prob])
        assert losses[0.0] != losses[1.0]
