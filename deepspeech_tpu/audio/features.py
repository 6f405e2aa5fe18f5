"""Log-STFT spectrogram front-end: host parity path + device batched path.

Reference behavior being reproduced (all in data/data_loader_aug.py):
* ``audio_to_stft`` (220-249): n_fft = int(sr * window_size), hop =
  int(sr * window_stride), symmetric window, magnitude, mirror-fill to 161
  bins when sr < 16 kHz, crop to 161.
* ``normalize_audio`` (274-313): modes ``mean`` / ``norm`` / ``frame`` /
  ``max_frame`` / ``none``; ``frame``/``max_frame`` subtract the scalar mean
  of a gaussian-smoothed per-frame mean (sigma 50 / 20, scipy 'reflect' i.e.
  symmetric boundary).

The device path operates on padded batches with per-utterance valid lengths,
computing the same statistics with masking, entirely inside jit.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage
import scipy.signal

from deepspeech_tpu.ops.stft import dft_matrices, stft_magnitude

N_BINS = 161  # fixed spectrogram height everywhere in the reference

WINDOWS = ("hamming", "hann", "blackman", "bartlett")


@functools.lru_cache(maxsize=16)
def make_window(name: str, length: int) -> np.ndarray:
    """Symmetric analysis window, matching scipy.signal's defaults
    (the reference's window table, data_loader_aug.py:52-55)."""
    if name not in WINDOWS:
        name = "hamming"
    return scipy.signal.get_window(name, length, fftbins=False).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class AudioConf:
    """Front-end configuration; embeds into checkpoints like the reference's
    ``audio_conf`` dict (reference train.py:877-886, model.py:437)."""
    sample_rate: int = 16000
    window_size: float = 0.02
    window_stride: float = 0.01
    window: str = "hamming"
    noise_dir: str | None = None
    noise_prob: float = 0.4
    noise_levels: tuple = (0.0, 0.5)
    aug_prob_8khz: float = 0.0
    aug_prob_spect: float = 0.0

    @property
    def n_fft(self) -> int:
        return int(self.sample_rate * (self.window_size + 1e-8))

    @property
    def hop(self) -> int:
        return int(self.sample_rate * (self.window_stride + 1e-8))

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["noise_levels"] = tuple(d["noise_levels"])
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "AudioConf":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in known}
        if "noise_levels" in kw and kw["noise_levels"] is not None:
            kw["noise_levels"] = tuple(kw["noise_levels"])
        return cls(**kw)


def num_frames(num_samples: int, hop: int) -> int:
    """Centered STFT frame count: T = 1 + floor(S / hop)."""
    return 1 + num_samples // hop


# ---------------------------------------------------------------------------
# Host (numpy) parity path — used by offline tools and golden tests.
# ---------------------------------------------------------------------------

def stft_magnitude_np(y: np.ndarray, n_fft: int, hop: int,
                      window: np.ndarray) -> np.ndarray:
    """librosa.stft-compatible |STFT| on host: (S,) -> (n_fft//2+1, T)."""
    pad = n_fft // 2
    y = np.pad(y.astype(np.float32), pad, mode="reflect")
    t = (len(y) - n_fft) // hop + 1
    idx = np.arange(n_fft)[None, :] + hop * np.arange(t)[:, None]
    frames = y[idx] * window[None, :]
    return np.abs(np.fft.rfft(frames, n=n_fft, axis=-1)).T.astype(np.float32)


def mirror_fill_bins(spect: np.ndarray) -> np.ndarray:
    """Mirror-fill to N_BINS rows when the sample rate yields fewer bins,
    then crop (reference data_loader_aug.py:233-238, 249)."""
    shape = spect.shape
    if shape[0] < N_BINS:
        out = np.zeros((N_BINS, *shape[1:]), dtype=spect.dtype)
        out[:shape[0]] = spect
        out[81:] = out[80:0:-1][: N_BINS - 81]
        return out
    return spect[:N_BINS]


def audio_to_stft_np(y: np.ndarray, conf: AudioConf) -> np.ndarray:
    """(S,) waveform -> (161, T) magnitude spectrogram (host)."""
    window = make_window(conf.window, conf.n_fft)
    spect = stft_magnitude_np(y, conf.n_fft, conf.hop, window)
    return mirror_fill_bins(spect)


def gaussian_smooth_np(x: np.ndarray, sigma: float) -> np.ndarray:
    return scipy.ndimage.gaussian_filter1d(x, sigma)


def normalize_spectrogram_np(spect: np.ndarray, mode: str) -> np.ndarray:
    """Reference normalize_audio parity (data_loader_aug.py:274-313)."""
    if mode == "mean":
        spect = np.log1p(spect)
        return spect - spect.mean()
    if mode == "norm":
        spect = np.log1p(spect)
        spect = spect - spect.mean()
        std = spect.std(axis=0, ddof=1, keepdims=True)  # torch std is unbiased
        return spect / std.mean()
    if mode == "frame":
        spect = np.log1p(spect)
        mean = spect.mean(axis=0, keepdims=True)
        mean = gaussian_smooth_np(mean, 50)
        return spect - mean.mean()
    if mode == "max_frame":
        spect = np.log1p(spect * 1048576)
        mean = spect.mean(axis=0, keepdims=True)
        mean = gaussian_smooth_np(mean, 20)
        return spect - mean.mean()
    if not mode or mode == "none":
        return np.log1p(spect)
    raise ValueError(f"No such normalization: {mode}")


def parse_audio_np(y: np.ndarray, conf: AudioConf, normalize: str = "max_frame",
                   jitter_rng: np.random.Generator | None = None) -> np.ndarray:
    """Full host front-end: waveform -> normalized (161, T) spectrogram.

    ``jitter_rng`` enables the reference's train-time max_frame jitter
    (spect += U(-0.5, 0.5), data_loader_aug.py:213-214).
    """
    spect = audio_to_stft_np(y, conf)
    spect = normalize_spectrogram_np(spect, normalize)
    if jitter_rng is not None and normalize == "max_frame":
        spect = spect + (jitter_rng.random(1, dtype=np.float32) - 0.5)
    return spect


# ---------------------------------------------------------------------------
# Device (jnp) batched path — jit-able, mask-aware.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _gauss_kernel(sigma: float) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d kernel (truncate=4.0), normalized."""
    radius = int(4.0 * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def masked_gaussian_smoothed_mean(seq: jnp.ndarray, lengths: jnp.ndarray,
                                  sigma: float) -> jnp.ndarray:
    """Scalar mean over the first ``length`` entries of a gaussian-smoothed
    sequence, with scipy 'reflect' (symmetric) boundaries at the *valid* edges.

    seq: (B, T) per-frame means; lengths: (B,) valid frame counts -> (B,)

    Implementation note: scipy's default 'reflect' mode is the half-sample
    symmetric extension; with a normalized symmetric kernel the resulting
    smoothing matrix is doubly stochastic (symmetric with rows summing to 1),
    so the mean of the smoothed sequence EQUALS the mean of the original —
    exactly, not approximately (see tests/test_features.py). The reference
    (data_loader_aug.py:297-307) only ever uses ``smoothed.mean()``, so on
    device the whole sigma-``sigma`` convolution reduces to a masked mean and
    the TPU-hostile per-length reflected gather disappears. ``sigma`` is kept
    in the signature for parity with the host path, which still runs scipy.
    """
    del sigma  # mean-preserving: see docstring
    mask = (jnp.arange(seq.shape[-1])[None, :] < lengths[:, None]
            ).astype(seq.dtype)
    return (seq * mask).sum(-1) / jnp.maximum(mask.sum(-1), 1.0)


def normalize_spectrogram_batch(spect: jnp.ndarray, frame_lengths: jnp.ndarray,
                                mode: str) -> jnp.ndarray:
    """Batched, masked normalize_audio: (B, 161, T), (B,) -> (B, 161, T).

    Matches the per-utterance host math over each utterance's valid frames;
    padded frames are zeroed on output.
    """
    mask = (jnp.arange(spect.shape[-1])[None, :]
            < frame_lengths[:, None]).astype(spect.dtype)  # (B, T)
    m3 = mask[:, None, :]
    denom = jnp.maximum(mask.sum(-1), 1.0) * spect.shape[1]  # valid cells per utt

    if mode == "max_frame":
        spect = jnp.log1p(spect * 1048576.0)
        frame_mean = spect.mean(axis=1)  # (B, T) mean over freq
        scalar = masked_gaussian_smoothed_mean(frame_mean, frame_lengths, 20.0)
        out = spect - scalar[:, None, None]
    elif mode == "frame":
        spect = jnp.log1p(spect)
        frame_mean = spect.mean(axis=1)
        scalar = masked_gaussian_smoothed_mean(frame_mean, frame_lengths, 50.0)
        out = spect - scalar[:, None, None]
    elif mode == "mean":
        spect = jnp.log1p(spect)
        mean = (spect * m3).sum((1, 2)) / denom
        out = spect - mean[:, None, None]
    elif mode == "norm":
        spect = jnp.log1p(spect)
        mean = (spect * m3).sum((1, 2)) / denom
        out = spect - mean[:, None, None]
        # per-frame std over freq (unbiased), averaged over valid frames
        fmean = out.mean(axis=1, keepdims=True)
        var = ((out - fmean) ** 2).sum(axis=1) / (spect.shape[1] - 1)  # (B,T)
        std_mean = (jnp.sqrt(var) * mask).sum(-1) / jnp.maximum(mask.sum(-1), 1.0)
        out = out / std_mean[:, None, None]
    elif not mode or mode == "none":
        out = jnp.log1p(spect)
    else:
        raise ValueError(f"No such normalization: {mode}")
    return out * m3


def featurize_batch(audio: jnp.ndarray, audio_lengths: jnp.ndarray,
                    conf: AudioConf, normalize: str = "max_frame",
                    method: str = "auto",
                    jitter: jnp.ndarray | None = None,
                    aug_key=None):
    """Padded waveforms -> normalized spectrograms, fully on device.

    audio: (B, S) reflect-padding NOT applied (done here); audio_lengths: (B,)
    valid sample counts. Returns (spect (B, 161, T), frame_lengths (B,)).

    ``aug_key`` enables the on-device spectrogram augs (SpecAugment masks +
    8 kHz band-zero) with the probabilities carried in ``conf``, applied to
    the magnitude before normalization — the reference's order
    (data_loader_aug.py:241-248 inside audio_to_stft, before normalize_audio).

    Note: the centered STFT's final frame reads n_fft//2 samples past each
    utterance's end. Batches built by ``data.loader.collate_batch`` pre-write
    each utterance's own reflect tail into its pad region
    (``BucketSpec.reflect_tail``), making device == host on EVERY frame; for
    raw zero-padded inputs the final frame reflects into zeros instead (a
    <=1-frame approximation, bounded in tests/test_golden_parity.py).
    """
    window = make_window(conf.window, conf.n_fft)
    mag = stft_magnitude(audio, conf.n_fft, conf.hop, window,
                         center=True, method=method)
    n_bins = conf.n_fft // 2 + 1
    if n_bins < N_BINS:
        out = jnp.zeros((*mag.shape[:-2], N_BINS, mag.shape[-1]), mag.dtype)
        out = out.at[..., :n_bins, :].set(mag)
        mirror = out[..., 80:0:-1, :]  # zero-filled source, like np .resize()
        mag = out.at[..., 81:, :].set(mirror)
    else:
        mag = mag[..., :N_BINS, :]
    frame_lengths = 1 + audio_lengths // conf.hop
    if aug_key is not None and (conf.aug_prob_spect > 0 or conf.aug_prob_8khz > 0):
        from deepspeech_tpu.augment.spectrogram import band_zero_8khz, spec_augment
        k_spec, k_8k = jax.random.split(aug_key)
        mag = spec_augment(mag, frame_lengths, k_spec, conf.aug_prob_spect)
        mag = band_zero_8khz(mag, k_8k, conf.aug_prob_8khz)
    spect = normalize_spectrogram_batch(mag, frame_lengths, normalize)
    if jitter is not None and normalize == "max_frame":
        mask = (jnp.arange(spect.shape[-1])[None, :]
                < frame_lengths[:, None]).astype(spect.dtype)
        spect = spect + jitter[:, None, None] * mask[:, None, :]
    return spect, frame_lengths
