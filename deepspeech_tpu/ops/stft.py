"""Framed-FFT magnitude spectrogram on device.

TPU-native replacement for the reference's host librosa STFT
(reference data/data_loader_aug.py:220-249). Framing is done with
``lax.conv_general_dilated_patches`` (lowered as a convolution, so XLA tiles
it well), windowing fuses into the surrounding elementwise work, and the DFT
itself has two interchangeable lowerings:

* ``method="fft"``    — ``jnp.fft.rfft`` (XLA FFT op)
* ``method="matmul"`` — real/imag DFT as two matmuls on the MXU. For the
  161-bin front-end (n_fft=320) this is a tiny (320x161) matmul per frame and
  is typically faster on TPU than the FFT lowering, and it fuses with the
  magnitude computation.

Conventions match librosa.stft(center=True, pad_mode="reflect") with a
symmetric window, which is what the reference used (its ``windows`` table held
scipy.signal symmetric windows, data_loader_aug.py:52-55).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def dft_matrices(n_fft: int, dtype=np.float32):
    """Real/imag DFT analysis matrices, shape (n_fft, n_fft//2 + 1)."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def reflect_pad_1d(y: jnp.ndarray, pad: int) -> jnp.ndarray:
    """np.pad(mode="reflect") on the last axis (odd reflection about edges)."""
    return jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")


def frame_signal(y: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(..., S) -> (..., T, frame_length) patches with stride ``hop``.

    When ``hop`` divides ``frame_length`` (the 50%-overlap default: 320/160),
    framing is a pure reshape + K slice-concats — no gather, no convolution,
    free at compile time and memory-layout friendly on TPU. Otherwise falls
    back to one static gather.
    """
    batch_shape = y.shape[:-1]
    s = y.shape[-1]
    t = (s - frame_length) // hop + 1
    if frame_length % hop == 0:
        k = frame_length // hop
        nchunks = s // hop
        chunks = y[..., : nchunks * hop].reshape(batch_shape + (nchunks, hop))
        parts = [chunks[..., i : i + t, :] for i in range(k)]
        return jnp.concatenate(parts, axis=-1)
    idx = (jnp.arange(t) * hop)[:, None] + jnp.arange(frame_length)[None, :]
    return y[..., idx]


def stft_magnitude(
    y: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: np.ndarray | jnp.ndarray,
    *,
    center: bool = True,
    method: str = "matmul",
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """|STFT| of (..., S) signal -> (..., n_bins, T), n_bins = n_fft//2 + 1.

    With ``center=True``, frame t is centered at t*hop (librosa convention,
    T = 1 + S//hop). Input may already be reflect-padded, in which case pass
    ``center=False``.

    ``method="auto"`` picks the fused Pallas kernel on TPU (batched input,
    hop | n_fft) and the matmul lowering otherwise; ``method="pallas"``
    forces the kernel.
    """
    if method in ("auto", "pallas"):
        from deepspeech_tpu.ops.pallas import stft_kernel
        from deepspeech_tpu.ops.pallas.rnn_kernel import pallas_supported
        eligible = y.ndim == 2 and stft_kernel.supported(n_fft, hop)
        if method == "pallas" or (eligible and pallas_supported()):
            if not eligible:
                raise ValueError("pallas stft needs (B, S) input and hop | n_fft")
            return stft_kernel.stft_magnitude_pallas(
                y, n_fft, hop, window, center=center)
        method = "matmul"
    if center:
        y = reflect_pad_1d(y, n_fft // 2)
    frames = frame_signal(y, n_fft, hop)
    win = jnp.asarray(window, dtype=frames.dtype)
    frames = frames * win
    if method == "fft":
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        mag = jnp.abs(spec)
    elif method == "matmul":
        cos_m, sin_m = dft_matrices(n_fft)
        re = jnp.matmul(frames, cos_m, precision=precision)
        im = jnp.matmul(frames, sin_m, precision=precision)
        mag = jnp.sqrt(re * re + im * im)
    else:
        raise ValueError(f"unknown stft method: {method}")
    return jnp.swapaxes(mag, -1, -2)
