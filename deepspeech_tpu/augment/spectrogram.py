"""Spectrogram augmentation (SpecAugment-style masks).

Two implementations of the same semantics (reference data/spectrogram_aug.py):

* host classes (numpy, explicit RNG) — parity path for offline tooling and
  golden tests; combinators ``SCompose/SOneOf/SComposePipelines/SOneOrOther``
  (reference spectrogram_aug.py:8-56);
* :func:`spec_augment` — a batched, jit-able device version that applies the
  reference's SOneOf([FrequencyMask, TimeMask]) draw *per utterance* with
  ``jax.random`` keys, so augmentation runs inside the compiled train step on
  padded batches instead of per-sample on CPU workers (TPU-first design; the
  masks are pure VPU elementwise work fused into the front-end).

Also provides :func:`band_zero_8khz` — the "pretend 8 kHz" low-pass aug
(reference data_loader_aug.py:244-248: zero bins 81+ w.p. aug_prob_8khz).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class FrequencyMask:
    """Up to ``bands`` zeroed frequency bands, each w.p. ``prob``, width
    ~ U{0..dropout_width}, centered uniformly (reference spectrogram_aug.py:59-83)."""

    def __init__(self, bands=2, prob=0.25, dropout_width=10):
        assert dropout_width > 0
        self.bands = bands
        self.prob = prob
        self.dropout_width = dropout_width

    def __call__(self, spect: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        freqs, _ = spect.shape
        for _ in range(self.bands):
            if rng.random() < self.prob:
                width = int(rng.integers(0, self.dropout_width + 1))
                center = int(rng.integers(0, freqs + 1))
                lo = max(0, center - width // 2)
                hi = min(center + width // 2, freqs)
                spect[lo:hi, :] = 0
        return spect


class TimeMask:
    """Up to ``bands`` zeroed time bands, width ~ U{0..dropout_length} capped
    at ``max_dropout_ratio`` of the utterance (reference spectrogram_aug.py:86-116)."""

    def __init__(self, bands=2, prob=0.25, dropout_length=50,
                 max_dropout_ratio=0.15):
        assert dropout_length > 0
        self.bands = bands
        self.prob = prob
        self.dropout_length = dropout_length
        self.max_dropout_ratio = max_dropout_ratio

    def __call__(self, spect: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        _, frames = spect.shape
        for _ in range(self.bands):
            if rng.random() < self.prob:
                width = int(rng.integers(0, self.dropout_length + 1))
                width = min(width, int(self.max_dropout_ratio * frames))
                center = int(rng.integers(0, frames + 1))
                lo = max(0, center - width // 2)
                hi = min(center + width // 2, frames)
                spect[:, lo:hi] = 0
        return spect


class SCompose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x, rng):
        for t in self.transforms:
            x = t(x, rng)
        return x


class SOneOf:
    def __init__(self, transforms, prob=0.5):
        self.transforms = transforms
        self.prob = prob

    def __call__(self, x, rng):
        if rng.random() < self.prob:
            t = self.transforms[rng.integers(len(self.transforms))]
            prev, t.prob = t.prob, 1.0
            try:
                x = t(x, rng)
            finally:
                t.prob = prev
        return x


class SComposePipelines:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x, rng):
        pipeline = self.transforms[rng.integers(len(self.transforms))]
        for t in pipeline:
            x = t(x, rng)
        return x


class SOneOrOther:
    def __init__(self, first, second, prob=0.5):
        self.first = first
        first.prob = 1.0
        self.second = second
        second.prob = 1.0
        self.prob = prob

    def __call__(self, x, rng):
        t = self.first if rng.random() < self.prob else self.second
        return t(x, rng)


# ---------------------------------------------------------------------------
# Device (jit-able) batched path
# ---------------------------------------------------------------------------

def _band_mask(key, size, max_width, n_bands, prob, cap=None):
    """(n_bands,) draws -> multiplicative 0/1 mask of length ``size``.

    Each band w.p. ``prob``: width ~ U{0..max_width} (optionally capped),
    center ~ U{0..size}, zeroing [center-width//2, center+width//2).
    """
    k_apply, k_width, k_center = jax.random.split(key, 3)
    apply = jax.random.uniform(k_apply, (n_bands,)) < prob
    width = jax.random.randint(k_width, (n_bands,), 0, max_width + 1)
    if cap is not None:
        width = jnp.minimum(width, cap)
    center = jax.random.randint(k_center, (n_bands,), 0, size + 1)
    lo = jnp.maximum(center - width // 2, 0)
    hi = center + width // 2
    pos = jnp.arange(size)
    in_band = (pos[None, :] >= lo[:, None]) & (pos[None, :] < hi[:, None])
    zero = (in_band & apply[:, None]).any(axis=0)
    return 1.0 - zero.astype(jnp.float32)


def _spec_augment_one(spect, frame_length, key, prob, freq_bands, freq_width,
                      time_bands, time_length, max_time_ratio):
    """SOneOf([FrequencyMask, TimeMask], prob) for one (161, T) utterance."""
    k_sel, k_freq, k_time = jax.random.split(key, 3)
    u = jax.random.uniform(k_sel)
    pick_freq = u < (prob / 2.0)         # apply FrequencyMask
    pick_time = (u >= prob / 2.0) & (u < prob)  # apply TimeMask

    fmask = _band_mask(k_freq, spect.shape[0], freq_width, freq_bands, 1.0)
    cap = (max_time_ratio * frame_length).astype(jnp.int32)
    tmask = _band_mask(k_time, spect.shape[1], time_length, time_bands, 1.0,
                       cap=cap)
    out = jnp.where(pick_freq, spect * fmask[:, None], spect)
    out = jnp.where(pick_time, out * tmask[None, :], out)
    return out


def spec_augment(spect: jnp.ndarray, frame_lengths: jnp.ndarray,
                 key: jax.Array, prob: float, freq_bands: int = 2,
                 freq_width: int = 20, time_bands: int = 2,
                 time_length: int = 50,
                 max_time_ratio: float = 0.15) -> jnp.ndarray:
    """Batched on-device SOneOf([FrequencyMask, TimeMask], prob).

    spect: (B, 161, T) magnitude; frame_lengths: (B,) valid frames (the time
    cap uses each utterance's own length like the host path uses its frame
    count). Applied before normalization, like reference
    data_loader_aug.py:241-242. Reference default: dropout_width=20,
    dropout_length=50 (data_loader_aug.py:424-431).
    """
    if prob <= 0:
        return spect
    keys = jax.random.split(key, spect.shape[0])
    return jax.vmap(
        lambda s, l, k: _spec_augment_one(
            s, l, k, prob, freq_bands, freq_width, time_bands, time_length,
            max_time_ratio))(spect, frame_lengths, keys)


def band_zero_8khz(spect: jnp.ndarray, key: jax.Array,
                   prob: float) -> jnp.ndarray:
    """W.p. ``prob`` per utterance, zero bins 81+ — "pretend the audio is
    8 kHz" (reference data_loader_aug.py:244-248). spect: (B, 161, T)."""
    if prob <= 0:
        return spect
    apply = jax.random.uniform(key, (spect.shape[0],)) < prob
    keep = jnp.arange(spect.shape[1]) < 81
    mask = jnp.where(apply[:, None], keep.astype(spect.dtype),
                     jnp.ones_like(keep, spect.dtype))
    return spect * mask[:, :, None]
