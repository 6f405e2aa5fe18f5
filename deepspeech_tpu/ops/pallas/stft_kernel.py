"""Fused framed-FFT magnitude spectrogram as a Pallas TPU kernel.

One kernel pass per (utterance, time-tile) computes |STFT| straight from hop
chunks of the waveform: window + DFT + magnitude all happen in VMEM, so the
(B, T, n_fft) frames tensor and the real/imag DFT intermediates never touch
HBM (the jnp path materializes frames and round-trips re/im). Replaces the
reference's host librosa STFT (reference data/data_loader_aug.py:220-249) at
the BASELINE "framed-FFT Pallas kernel" line; the jnp matmul path
(ops/stft.py) remains the fallback for hop-indivisible configs and non-TPU
backends.

Kernel shape story (TPU constraints drive the design):
  * hop=160 lanes are not 128-aligned, so neither sublane-shifted register
    concats nor unaligned DMA slices are legal. Instead the wrapper passes
    ``k = n_fft/hop`` row-shifted views of the chunk array (XLA materializes
    them as cheap contiguous copies) and the kernel splits the DFT matmul
    over hop-segments: ``[A | B] @ C == A @ C[:hop] + B @ C[hop:]`` — no
    concat, every operand sublane/lane-aligned, all matmuls on the MXU.
  * the Hamming window is folded into the DFT matrices
    (``(f*w) @ C == f @ (diag(w) @ C)``), so windowing costs nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepspeech_tpu.ops.stft import dft_matrices, reflect_pad_1d

TILE_T = 256  # frames per kernel invocation


def supported(n_fft: int, hop: int) -> bool:
    """The fused kernel frames by row-shifted views, which needs hop | n_fft
    (true for the reference front-end: n_fft=320, hop=160)."""
    return n_fft % hop == 0


@functools.lru_cache(maxsize=8)
def _windowed_dft(n_fft: int, window_key) -> tuple[np.ndarray, np.ndarray]:
    """DFT analysis matrices with the window folded in."""
    window = np.asarray(window_key, dtype=np.float32)
    cos_m, sin_m = dft_matrices(n_fft)
    return cos_m * window[:, None], sin_m * window[:, None]


def _dot_f32(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _kernel(k, hop, refs_and_out):
    *shift_refs, cos_ref, sin_ref, out_ref = refs_and_out
    re = _dot_f32(shift_refs[0][0], cos_ref[0:hop, :])
    im = _dot_f32(shift_refs[0][0], sin_ref[0:hop, :])
    for i in range(1, k):
        re += _dot_f32(shift_refs[i][0], cos_ref[i * hop:(i + 1) * hop, :])
        im += _dot_f32(shift_refs[i][0], sin_ref[i * hop:(i + 1) * hop, :])
    out_ref[0] = jnp.sqrt(re * re + im * im)


def stft_magnitude_pallas(y: jnp.ndarray, n_fft: int, hop: int,
                          window: np.ndarray, *, center: bool = True,
                          interpret: bool = False) -> jnp.ndarray:
    """|STFT| of (B, S) f32 signal -> (B, n_bins, T), n_bins = n_fft//2 + 1.

    Same conventions as ops/stft.py:stft_magnitude (librosa center=True,
    reflect padding, T = 1 + S//hop).
    """
    if y.ndim != 2:
        raise ValueError("expected (B, S) batch of waveforms")
    if not supported(n_fft, hop):
        raise ValueError("pallas stft needs hop | n_fft")
    k = n_fft // hop
    n_bins = n_fft // 2 + 1
    if center:
        y = reflect_pad_1d(y, n_fft // 2)
    b, sp = y.shape
    t = (sp - n_fft) // hop + 1
    n_tiles = pl.cdiv(t, TILE_T)
    rows_needed = n_tiles * TILE_T + k - 1
    pad = rows_needed * hop - sp
    if pad > 0:
        y = jnp.pad(y, ((0, 0), (0, pad)))
    chunks = y.reshape(b, rows_needed, hop)
    # frame t = chunk rows [t, t+k): shift view i supplies row t+i
    shifts = [chunks[:, i:i + n_tiles * TILE_T, :] for i in range(k)]

    win_key = tuple(np.asarray(window, dtype=np.float32).tolist())
    cos_m, sin_m = _windowed_dft(n_fft, win_key)

    def kernel(*args):
        _kernel(k, hop, args)

    chunk_spec = pl.BlockSpec((1, TILE_T, hop), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
    dft_spec = pl.BlockSpec((n_fft, n_bins), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[chunk_spec] * k + [dft_spec, dft_spec],
        out_specs=pl.BlockSpec((1, TILE_T, n_bins), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * TILE_T, n_bins),
                                       jnp.float32),
        interpret=interpret,
    )(*shifts, jnp.asarray(cos_m), jnp.asarray(sin_m))
    return jnp.swapaxes(out[:, :t, :], -1, -2)
