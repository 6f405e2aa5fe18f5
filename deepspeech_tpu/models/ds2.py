"""DeepSpeech2 acoustic model (flax.linen), TPU-first.

Architecture parity with the reference DS2 branch (model.py:183-380):
* masked 2-D conv stack: Conv(1->32, k=(41,11), s=(2,2), p=(20,5)) + BN +
  Hardtanh(0,20); Conv(32->32, k=(21,11), s=(2,1), p=(10,5)) + BN +
  Hardtanh(0,20); activations re-zeroed past each utterance's valid frames
  after every stage (MaskConv, model.py:52-79);
* frequency collapse to a 1312-feature sequence, time-major;
* N recurrent layers (GRU/LSTM/RNN), bidirectional direction-sum, per-layer
  sequence BatchNorm except layer 0 (BatchRNN, model.py:82-109, 318-327);
* unidirectional models append a Lookahead conv + Hardtanh (model.py:329-333);
* head: BatchNorm + Linear(H -> num_classes, no bias) per timestep
  (model.py:335-341);
* returns (logits (B,T,C), probs=softmax (B,T,C), output_lengths) like
  reference forward (model.py:343-380).

The convs and the per-step recurrent matmuls run on the MXU; masking and
activations fuse into them under XLA. Output lengths follow the conv time
arithmetic of get_seq_lens (model.py:382-393): T' = floor((T-1)/2) + 1.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepspeech_tpu.models.layers import (
    Lookahead,
    TorchBatchNorm,
    hardtanh_0_20,
    length_mask,
)
from deepspeech_tpu.ops.banded_conv import banded_conv2d
from deepspeech_tpu.ops.rnn import CELL_GATES, rnn_scan

N_BINS = 161


def conv_out_lengths(lengths: jnp.ndarray) -> jnp.ndarray:
    """Time-length arithmetic of the DS2 conv stack (model.py:382-393):
    conv1 stride-2 -> floor((L-1)/2)+1; conv2 stride-1 same-length."""
    return (lengths - 1) // 2 + 1


def conv_out_frames(t: int) -> int:
    return (t - 1) // 2 + 1


class RecurrentLayer(nn.Module):
    """BatchRNN equivalent: optional sequence BN + (bi)RNN with direction sum."""

    input_size: int
    hidden_size: int
    cell: str = "gru"
    bidirectional: bool = True
    batch_norm: bool = True
    bnm: float = 0.1
    compute_dtype: Any = None  # matmul operand dtype (bf16 = MXU fast path)

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray,
                 train: bool) -> jnp.ndarray:
        # x: (T, B, F). BN flattens (T*B, F) with padding rows included,
        # exactly like SequenceWise (model.py:28-43). Folding the normalize
        # into the projection WEIGHTS was measured a net loss here (4493 vs
        # 4554 audio-s/s: the backward's dW_eff->(dW, da) passes over the
        # (F, G*H) weight grads outweigh the saved activation pass, and XLA
        # already fuses normalize+cast into one stream pass) — so the
        # elementwise form stays; see PERF.md "Step tail".
        if self.batch_norm:
            x = TorchBatchNorm(momentum=self.bnm, name="bn")(x, train)
        d = 2 if self.bidirectional else 1
        g = CELL_GATES[self.cell]
        h = self.hidden_size
        stdv = 1.0 / (h ** 0.5)

        def uniform(key, shape):
            return jax.random.uniform(key, shape, jnp.float32, -stdv, stdv)

        w_ih = self.param("w_ih", uniform, (d, self.input_size, g * h))
        b_ih = self.param("b_ih", uniform, (d, g * h))
        w_hh = self.param("w_hh", uniform, (d, h, g * h))
        b_hh = self.param("b_hh", uniform, (d, g * h))
        # Tensor parallelism: under an ambient 2-wide `model` mesh axis the
        # two directions run on separate chips (weights + optimizer moments
        # direction-sharded, recurrence fully local, one psum per layer) —
        # see parallel/tp_rnn.py. Returns None when not applicable.
        from deepspeech_tpu.parallel.tp_rnn import maybe_direction_sharded
        out = maybe_direction_sharded(
            x, lengths, w_ih, b_ih, w_hh, b_hh, cell=self.cell,
            bidirectional=self.bidirectional, sum_directions=True,
            compute_dtype=self.compute_dtype)
        if out is not None:
            return out
        return rnn_scan(x, lengths, w_ih, b_ih, w_hh, b_hh, cell=self.cell,
                        bidirectional=self.bidirectional, sum_directions=True,
                        compute_dtype=self.compute_dtype)


class _DenseKernel(nn.Module):
    """Bias-free Dense parameter holder (same tree/init as
    ``nn.Dense(use_bias=False)``) so the head BN can fold into the kernel
    while checkpoints stay interchangeable."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class _ConvParams(nn.Module):
    """Parameter holder matching flax.linen.Conv's tree (kernel HWIO + bias),
    so checkpoints are interchangeable with an nn.Conv-based front-end."""

    shape: tuple

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            self.shape)
        bias = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return kernel, bias


class ConvFrontend(nn.Module):
    """Masked 2-conv front (MaskConv stack, model.py:208-215), lowered as
    frequency-banded MXU matmuls (ops/banded_conv.py) in (B, T, F·C) layout —
    XLA's conv lowering left 3/4 of the MXU lanes idle and drowned in
    NCHW/NHWC transposes (~46 ms of a 93 ms train step)."""

    bnm: float = 0.1
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, out_lengths: jnp.ndarray,
                 train: bool, out_start: jnp.ndarray | None = None
                 ) -> jnp.ndarray:
        # ``out_start``: optional (B,) first valid conv-output index — the
        # streaming runtime (serve/streaming.py) re-zeroes activations
        # *before* a window's valid range exactly like MaskConv re-zeroes
        # past its end, so conv2 reads true zeros at both boundaries.
        # x: (B, 161, T) -> (B, T, 161); time on sublanes, freq on lanes
        x = jnp.swapaxes(x, 1, 2)
        k0, b0 = _ConvParams((41, 11, 1, 32), name="conv0")()
        k1, b1 = _ConvParams((21, 11, 32, 32), name="conv1")()
        specs = [
            # freq_groups trade band-FLOP waste against matmul width; these
            # values are bench-swept on TPU v5e (fg sweep: conv2 4->4270,
            # 7->4460, 6->4540 audio-s/s/chip with the custom conv backward)
            (k0, b0, 161, 81, (2, 2), (20, 5), 2),
            (k1, b1, 81, 41, (2, 1), (10, 5), 6),
        ]
        for i, (k, bias, f_in, f_out, strides, pad, fg) in enumerate(specs):
            x = banded_conv2d(x, k, bias, f_in, f_out, strides, pad,
                              self.compute_dtype,
                              freq_groups=fg)  # (B, T', f_out*32) f32
            mask = length_mask(out_lengths, x.shape[1], x.dtype)[:, :, None]
            if out_start is not None:
                mask = mask * (jnp.arange(x.shape[1])[None, :, None]
                               >= out_start[:, None, None]).astype(x.dtype)
            x = x * mask
            b_, t_, n_ = x.shape
            x = x.reshape(b_, t_, f_out, k.shape[-1])
            x = TorchBatchNorm(momentum=self.bnm, name=f"bn{i}")(x, train)
            x = x.reshape(b_, t_, n_)
            x = x * mask
            x = hardtanh_0_20(x)
            # hardtanh(0) == 0, but keep the re-mask for exact MaskConv parity
            x = x * mask
            if self.compute_dtype is not None:
                # cast here so the convert fuses into the hardtanh/mask chain
                # instead of a separate 78 MB f32 read before the next matmul
                x = x.astype(self.compute_dtype)
        return x  # (B, T', 41*32), lane order f*32 + c


class DeepSpeech2(nn.Module):
    """The DS2 conv+RNN acoustic model."""

    num_classes: int
    hidden_size: int = 800
    hidden_layers: int = 6
    cell: str = "gru"
    bidirectional: bool = True
    context: int = 20
    bnm: float = 0.1
    sample_rate: int = 16000
    window_size: float = 0.02
    compute_dtype: Any = None  # None = f32; jnp.bfloat16 = MXU fast path

    @nn.compact
    def __call__(self, spect: jnp.ndarray, lengths: jnp.ndarray,
                 train: bool = False):
        """spect: (B, 161, T) normalized log-spectrogram; lengths: (B,) valid
        frame counts. Returns (logits (B,T',C), probs, output_lengths)."""
        out_lengths = conv_out_lengths(lengths)
        x = spect.astype(jnp.float32)
        x = ConvFrontend(bnm=self.bnm, compute_dtype=self.compute_dtype,
                         name="conv")(x, out_lengths, train)

        # reorder features (f*32+c) -> c*41+f for weight-porting parity with
        # the reference's view() (model.py:360-362), then go time-major
        b, t, n = x.shape
        f, c = 41, 32
        x = jnp.swapaxes(x.reshape(b, t, f, c), 2, 3).reshape(b, t, n)
        x = jnp.swapaxes(x, 0, 1)  # (T', B, 1312) time-major

        rnn_input = n
        for i in range(self.hidden_layers):
            x = RecurrentLayer(
                input_size=rnn_input if i == 0 else self.hidden_size,
                hidden_size=self.hidden_size, cell=self.cell,
                bidirectional=self.bidirectional, batch_norm=i > 0,
                bnm=self.bnm, compute_dtype=self.compute_dtype,
                name=f"rnn{i}")(x, out_lengths, train)

        if not self.bidirectional:
            x = Lookahead(self.hidden_size, self.context, name="lookahead")(x)
            x = hardtanh_0_20(x)

        # head BN folds into the fc kernel the same way (the param tree is
        # identical to nn.Dense(use_bias=False), so checkpoints are
        # unchanged): bn(x) @ W == x @ (a[:, None]*W) + b@W
        a, sh = TorchBatchNorm(momentum=self.bnm, name="fc_bn",
                               fold=True)(x, train)
        kernel = _DenseKernel((x.shape[-1], self.num_classes), name="fc")()
        x = (jnp.einsum("tbh,hc->tbc", x, a[:, None] * kernel,
                        preferred_element_type=jnp.float32)
             + (sh @ kernel)[None, None, :])

        logits = jnp.transpose(x, (1, 0, 2)).astype(jnp.float32)  # (B, T', C)
        probs = jax.nn.softmax(logits, axis=-1)
        return logits, probs, out_lengths
