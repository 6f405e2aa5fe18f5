"""STFT front-end tests: host path vs torch.stft oracle, device path vs host."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepspeech_tpu.audio import (
    AudioConf,
    audio_to_stft_np,
    featurize_batch,
    make_window,
    normalize_spectrogram_batch,
    normalize_spectrogram_np,
    parse_audio_np,
    stft_magnitude_np,
)
from deepspeech_tpu.ops.stft import stft_magnitude

CONF = AudioConf()  # 16 kHz, 20 ms / 10 ms -> n_fft=320, hop=160


def _sig(n=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    return (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.2 * np.sin(2 * np.pi * 1337 * t)
            + 0.05 * rng.standard_normal(n)).astype(np.float32)


def test_conf_derived_sizes():
    assert CONF.n_fft == 320
    assert CONF.hop == 160


def test_host_stft_matches_torch():
    torch = pytest.importorskip("torch")
    y = _sig()
    window = make_window("hamming", 320)
    ours = stft_magnitude_np(y, 320, 160, window)
    ref = torch.stft(torch.from_numpy(y), n_fft=320, hop_length=160,
                     win_length=320, window=torch.from_numpy(window),
                     center=True, pad_mode="reflect", return_complex=True)
    ref = ref.abs().numpy()
    assert ours.shape == ref.shape == (161, 1 + len(y) // 160)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_device_stft_matches_host(method):
    y = _sig(8000)
    window = make_window("hamming", 320)
    host = stft_magnitude_np(y, 320, 160, window)
    dev = np.asarray(stft_magnitude(jnp.asarray(y), 320, 160, window,
                                    method=method))
    # float32 FFT accumulation differences are absolute-scale w.r.t. frame
    # energy (peak magnitude ~40 here), not per-bin relative
    np.testing.assert_allclose(dev, host, rtol=2e-3, atol=5e-2)


def test_device_stft_batched_shape():
    y = jnp.zeros((3, 4800))
    out = stft_magnitude(y, 320, 160, make_window("hamming", 320))
    assert out.shape == (3, 161, 1 + 4800 // 160)


def test_mirror_fill_8khz():
    # 8 kHz -> n_fft=160 -> 81 bins, mirror-filled to 161
    conf = AudioConf(sample_rate=8000)
    assert conf.n_fft == 160
    y = _sig(8000)
    spect = audio_to_stft_np(y, conf)
    assert spect.shape[0] == 161
    np.testing.assert_allclose(spect[81:], spect[80:0:-1], atol=0)


@pytest.mark.parametrize("mode", ["mean", "norm", "frame", "max_frame", "none"])
def test_normalize_modes_host_vs_torch_reference(mode):
    """Re-derive the reference normalize_audio math with torch ops as oracle."""
    torch = pytest.importorskip("torch")
    import scipy.ndimage
    spect = np.abs(_sig(32000)).reshape(1, -1)[:, :32000]
    spect = np.random.default_rng(3).random((161, 120)).astype(np.float32) * 4
    ours = normalize_spectrogram_np(spect.copy(), mode)

    if mode == "mean":
        t = torch.log1p(torch.from_numpy(spect))
        t = t - t.mean()
    elif mode == "norm":
        t = torch.log1p(torch.from_numpy(spect))
        t = t - t.mean()
        t = t / t.std(dim=0, keepdim=True).mean()
    elif mode == "frame":
        t = torch.log1p(torch.from_numpy(spect))
        mean = t.mean(dim=0, keepdim=True)
        mean = torch.from_numpy(
            scipy.ndimage.gaussian_filter1d(mean.numpy(), 50))
        t = t - mean.mean()
    elif mode == "max_frame":
        t = torch.log1p(torch.from_numpy(spect) * 1048576)
        mean = t.mean(dim=0, keepdim=True)
        mean = torch.from_numpy(
            scipy.ndimage.gaussian_filter1d(mean.numpy(), 20))
        t = t - mean.mean()
    else:
        t = torch.log1p(torch.from_numpy(spect))
    np.testing.assert_allclose(ours, t.numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["mean", "norm", "frame", "max_frame", "none"])
def test_normalize_batch_matches_host_per_utterance(mode):
    rng = np.random.default_rng(7)
    lengths = [90, 120, 64]
    t_max = 120
    batch = np.zeros((3, 161, t_max), np.float32)
    per_utt = []
    for i, L in enumerate(lengths):
        s = rng.random((161, L)).astype(np.float32) * 3
        batch[i, :, :L] = s
        per_utt.append(normalize_spectrogram_np(s, mode))
    out = np.asarray(normalize_spectrogram_batch(
        jnp.asarray(batch), jnp.asarray(lengths), mode))
    for i, L in enumerate(lengths):
        np.testing.assert_allclose(out[i, :, :L], per_utt[i],
                                   rtol=2e-4, atol=2e-4)
        assert np.all(out[i, :, L:] == 0)


def test_featurize_batch_matches_host_parse_audio():
    """Device end-to-end front-end == host parity path, given collate-style
    reflect tail fill."""
    conf = CONF
    lengths = [16000, 12000]
    s_max = 16000 + conf.n_fft // 2  # room for the reflect tail fill
    audio = np.zeros((2, s_max), np.float32)
    hosts = []
    for i, L in enumerate(lengths):
        y = _sig(L, seed=i)
        audio[i, :L] = y
        pad = conf.n_fft // 2
        tail = min(pad, L - 1)
        audio[i, L:L + tail] = y[-2:-2 - tail:-1]  # collate reflect fill
        hosts.append(parse_audio_np(y, conf, normalize="max_frame"))
    spect, frame_lengths = featurize_batch(
        jnp.asarray(audio), jnp.asarray(lengths), conf, normalize="max_frame")
    spect = np.asarray(spect)
    assert frame_lengths.tolist() == [1 + L // conf.hop for L in lengths]
    for i, L in enumerate(lengths):
        fl = 1 + L // conf.hop
        np.testing.assert_allclose(spect[i, :, :fl], hosts[i],
                                   rtol=5e-3, atol=5e-3)


def test_gaussian_reflect_smoothing_preserves_mean():
    """The identity the device path relies on: scipy gaussian_filter1d with
    the default 'reflect' (symmetric) boundary and a normalized symmetric
    kernel preserves the sequence mean exactly, so subtracting
    ``smoothed.mean()`` == subtracting ``raw.mean()``
    (reference data_loader_aug.py:297-307)."""
    import scipy.ndimage
    rng = np.random.default_rng(11)
    for t in (5, 17, 160, 751):
        for sigma in (20.0, 50.0):
            x = rng.standard_normal(t) * 3 + 1
            sm = scipy.ndimage.gaussian_filter1d(x, sigma)
            assert abs(sm.mean() - x.mean()) < 1e-12 * max(1, abs(x.mean()))
