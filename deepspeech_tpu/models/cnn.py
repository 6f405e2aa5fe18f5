"""Pure-convolutional acoustic model family (flax.linen), TPU-first.

Reference counterparts in model.py:
* ``cnn``          — Wav2Letter (model.py:506-562): k=13 stride-2 prolog,
  N body convs, k=31 + k=1 epilog; ReLU or GLU (GLU doubles conv channels).
* ``cnn_residual`` — ResidualWav2Letter (model.py:565-607, 674-723): k=7
  blocks with residual skips and squeeze-excitation (se_ratio 0.25).
* ``glu_small``    — SmallGLU 15-layer GLU convnet (model.py:906-935).
* ``glu_large``    — LargeGLU 17-layer (model.py:937-966; the reference
  version is dead code — never sets ``layer_num``, fc reads undefined
  ``size`` — this is the working intent).
* ``large_cnn``    — LargeCNN 17-layer widening ReLU convnet (model.py:969-998).
* ``cnn_jasper``   — Jasper-style block net, arXiv:1904.03288 (the reference
  implementation at model.py:727-903 is unrunnable dead code; this is a
  working realization of its config: 5 blocks x 3 sub-blocks, channels
  256..768, kernels 11..25, SE 0.25, 1024-wide epilog).

TPU design: all convs are 1-D over time in NWC layout ((B, T, C) — lane
dimension = channels feeds the MXU); valid lengths are tracked through the
exact conv arithmetic of every layer and activations are re-masked after
each block so bucket padding never leaks into BatchNorm-free paths
(the reference instead reused the unused DS2 conv stack's length formula for
all CNN variants, model.py:382-393 — a latent shape bug we do not copy).

All models share the container interface of DeepSpeech2:
``__call__(spect (B,161,T), lengths, train) -> (logits, probs, out_lengths)``
with the 1x1-conv classifier head inside (reference model.py:232-234).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from deepspeech_tpu.models.layers import TorchBatchNorm, length_mask

N_BINS = 161


def conv1d_out_length(lengths, kernel: int, stride: int = 1, padding: int = 0,
                      dilation: int = 1):
    """torch Conv1d length arithmetic."""
    return (lengths + 2 * padding - dilation * (kernel - 1) - 1) // stride + 1


def glu(x, axis=-1):
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def swish(x):
    """relu_fn of the reference (model.py:1030-1032) — x * sigmoid(x)."""
    return x * jax.nn.sigmoid(x)


class ConvBlock(nn.Module):
    """Conv1d -> [GLU] -> [BN] -> [ReLU] -> [dropout] -> [SE] -> [skip].

    One parameterizable block covering the reference's CNNBlock
    (model.py:641-671), GLUBlock (610-638), ResCNNBlock (674-723), and the
    Wav2Letter _block (510-536). Works on (B, T, C); re-masks via lengths.
    """

    out: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_glu: bool = False        # conv emits 2*out, gated to out
    batch_norm: bool = True
    relu: bool = True            # ignored when use_glu
    dropout: float = 0.0
    bnm: float = 0.1
    se_ratio: float = 0.0        # squeeze channels = max(1, int(in*ratio))
    skip: bool = False
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray, train: bool,
                 bounds=None, defer_se: bool = False):
        """Batch mode: mask by the conv length chain of ``lengths``.

        Streaming mode (serve/streaming_cnn.py) passes ``bounds=(lo, hi)``
        — window-local valid output range per lane — because a chunk
        window is an interior slice of the utterance whose start is NOT
        window index 0, and ``defer_se=True`` to skip the (utterance-
        global) squeeze-excite + residual add, which the streaming runtime
        finishes externally with running statistics."""
        in_ch = x.shape[-1]
        features = self.out * 2 if self.use_glu else self.out
        y = nn.Conv(features, (self.kernel,), strides=(self.stride,),
                    padding=((self.padding, self.padding),),
                    kernel_dilation=(self.dilation,), use_bias=self.bias,
                    name="conv")(x)
        out_lengths = conv1d_out_length(lengths, self.kernel, self.stride,
                                        self.padding, self.dilation)
        if self.use_glu:
            y = glu(y, axis=-1)
        if self.batch_norm:
            y = TorchBatchNorm(momentum=self.bnm, name="bn")(y, train)
        if self.relu and not self.use_glu:
            y = nn.relu(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)

        if bounds is None:
            mask = length_mask(out_lengths, y.shape[1], y.dtype)[:, :, None]
        else:
            lo, hi = bounds
            idx = jnp.arange(y.shape[1], dtype=jnp.int32)[None, :]
            mask = ((idx >= lo[:, None]) & (idx < hi[:, None]))\
                .astype(y.dtype)[:, :, None]
        y = y * mask
        if self.se_ratio and 0 < self.se_ratio <= 1:
            red = max(1, int(in_ch * self.se_ratio))
            if defer_se:
                # the streaming caller applies se_reduce/se_expand (already
                # trained batch-mode) to its running squeeze and finishes
                # gate + residual externally
                return y, out_lengths
            # squeeze-excite over valid frames (reference model.py:712-716)
            squeezed = (y.sum(axis=1)
                        / jnp.maximum(out_lengths, 1)[:, None]).astype(y.dtype)
            s = nn.Dense(red, name="se_reduce")(squeezed)
            s = nn.Dense(self.out, name="se_expand")(swish(s))
            y = jax.nn.sigmoid(s)[:, None, :] * y
        if self.skip and x.shape[-1] == y.shape[-1] and self.stride == 1:
            y = y + x
        return y, out_lengths


class ConvStack(nn.Module):
    """A sequence of ConvBlocks defined by spec dicts + 1x1 conv head."""

    blocks: Sequence[dict]
    num_classes: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, spect: jnp.ndarray, lengths: jnp.ndarray,
                 train: bool = False):
        # (B, 161, T) -> NWC (B, T, 161)
        x = jnp.swapaxes(spect, 1, 2).astype(self.compute_dtype)
        out_lengths = lengths
        for i, spec in enumerate(self.blocks):
            x, out_lengths = ConvBlock(**spec, name=f"block{i}")(
                x, out_lengths, train)
        x = nn.Conv(self.num_classes, (1,), use_bias=True, name="fc")(x)
        logits = x.astype(jnp.float32)  # (B, T', C)
        probs = jax.nn.softmax(logits, axis=-1)
        return logits, probs, out_lengths


def wav2letter_blocks(size: int, cnn_width: int, repeat_layers: int,
                      kernel: int, use_glu: bool, dropout: float,
                      bnm: float) -> list[dict]:
    """Reference Wav2Letter module list (model.py:543-562)."""
    pad = kernel // 2
    common = dict(use_glu=use_glu, batch_norm=True, dropout=dropout, bnm=bnm,
                  bias=False)  # bias=not bnorm, bnorm=True (model.py:230)
    blocks = [dict(out=cnn_width, kernel=kernel, stride=2, padding=pad,
                   **common)]
    blocks += [dict(out=cnn_width, kernel=kernel, stride=1, padding=pad,
                    **common) for _ in range(repeat_layers)]
    blocks += [dict(out=size, kernel=31, stride=1, padding=15, **common),
               dict(out=size, kernel=1, stride=1, padding=0, **common)]
    return blocks


def residual_wav2letter_blocks(size: int, cnn_width: int, repeat_layers: int,
                               dropout: float, bnm: float,
                               kernel: int = 7, se_ratio: float = 0.25) -> list[dict]:
    """Reference ResidualWav2Letter (model.py:565-607)."""
    pad = kernel // 2
    common = dict(batch_norm=True, dropout=dropout, bnm=bnm, bias=False)
    blocks = [dict(out=cnn_width, kernel=kernel, stride=2, padding=pad,
                   **common)]
    blocks += [dict(out=cnn_width, kernel=kernel, stride=1, padding=pad,
                    se_ratio=se_ratio, skip=True, **common)
               for _ in range(repeat_layers)]
    blocks += [dict(out=size, kernel=31, stride=1, padding=15, **common),
               dict(out=size, kernel=1, stride=1, padding=0, **common)]
    return blocks


# (out_after_glu, conv_out=2*out, kernel, stride, padding) per layer
# (reference SmallGLU table, model.py:906-935)
_SMALL_GLU = [
    (100, 200, 13, 1, 6), (100, 200, 3, 1, 1), (100, 200, 4, 1, 2),
    (125, 250, 5, 1, 2), (125, 250, 6, 1, 3), (150, 300, 7, 1, 3),
    (175, 350, 8, 1, 4), (200, 400, 9, 1, 4), (225, 450, 10, 1, 5),
    (250, 500, 11, 1, 5), (250, 500, 12, 1, 6), (250, 500, 13, 1, 6),
    (300, 600, 14, 1, 7), (300, 600, 15, 1, 7), (375, 750, 21, 1, 10),
]

# (reference LargeGLU table, model.py:937-966; padding all on layer 1)
_LARGE_GLU = [
    (200, 400, 13, 1, 170), (220, 440, 14, 1, 0), (242, 484, 15, 1, 0),
    (266, 532, 16, 1, 0), (292, 584, 17, 1, 0), (321, 642, 18, 1, 0),
    (353, 706, 19, 1, 0), (388, 776, 20, 1, 0), (426, 852, 21, 1, 0),
    (468, 936, 22, 1, 0), (514, 1028, 23, 1, 0), (565, 1130, 24, 1, 0),
    (621, 1242, 25, 1, 0), (683, 1366, 26, 1, 0), (751, 1502, 27, 1, 0),
    (826, 1652, 28, 1, 0), (908, 1816, 29, 1, 0),
]

# (out, kernel, stride, padding) (reference LargeCNN table, model.py:969-998)
_LARGE_CNN = [
    (200, 13, 2, 6), (220, 14, 1, 7), (242, 15, 1, 7), (266, 16, 1, 8),
    (292, 17, 1, 8), (321, 18, 1, 9), (353, 19, 1, 9), (388, 20, 1, 10),
    (426, 21, 1, 10), (468, 22, 1, 11), (514, 23, 1, 11), (565, 24, 1, 12),
    (621, 25, 1, 12), (683, 26, 1, 13), (751, 27, 1, 13), (826, 28, 1, 14),
    (826, 29, 1, 14),
]


def glu_blocks(table, layer_num: int, dropout, bnm: float) -> list[dict]:
    blocks = []
    for i, (out, _conv_out, k, s, p) in enumerate(table[:layer_num]):
        d = dropout[i] if isinstance(dropout, (list, tuple)) else dropout
        blocks.append(dict(out=out, kernel=k, stride=s, padding=p,
                           use_glu=True, batch_norm=True, dropout=d, bnm=bnm))
    return blocks


def jasper_blocks(dropout_block: float = 0.2, epilog_dropout: float = 0.3,
                  bnm: float = 0.1, se_ratio: float = 0.25,
                  sub_blocks: int = 3) -> list[dict]:
    """Working Jasper-style stack per the reference's intended config
    (model.py:254-272): 5 blocks x 3 sub-blocks, SE + residual per block."""
    channels = [256, 384, 512, 640, 768]
    kernels = [11, 13, 17, 21, 25]
    common = dict(batch_norm=True, bnm=bnm, bias=False)
    blocks = [dict(out=256, kernel=11, stride=2, padding=5, dropout=0.2,
                   **common)]  # prolog
    for ch, k in zip(channels, kernels):
        for s in range(sub_blocks):
            last = s == sub_blocks - 1
            blocks.append(dict(out=ch, kernel=k, stride=1, padding=k // 2,
                               dropout=dropout_block,
                               se_ratio=se_ratio if last else 0.0,
                               skip=last, **common))
    blocks += [dict(out=896, kernel=29, stride=1, padding=56, dilation=4,
                    dropout=epilog_dropout, **common),
               dict(out=1024, kernel=1, stride=1, padding=0,
                    dropout=epilog_dropout, **common)]
    return blocks


def build_cnn_model(rnn_type: str, num_classes: int, cnn_width: int = 256,
                    hidden_size: int = 800, hidden_layers: int = 6,
                    dropout: float = 0.0, bnm: float = 0.1,
                    use_glu: bool = False) -> ConvStack:
    """CNN model zoo dispatch (reference model.py:226-305). ``hidden_size``
    plays the reference's dual role of epilog width for cnn/cnn_residual;
    ``hidden_layers`` is body depth for cnn/cnn_residual and layer count for
    glu_small."""
    if rnn_type == "cnn":
        blocks = wav2letter_blocks(hidden_size, cnn_width, hidden_layers,
                                   kernel=13, use_glu=use_glu,
                                   dropout=dropout, bnm=bnm)
    elif rnn_type == "cnn_residual":
        blocks = residual_wav2letter_blocks(hidden_size, cnn_width,
                                            hidden_layers, dropout, bnm)
    elif rnn_type == "glu_small":
        layer_num = min(hidden_layers, len(_SMALL_GLU)) or len(_SMALL_GLU)
        blocks = glu_blocks(_SMALL_GLU, layer_num, dropout, bnm)
    elif rnn_type == "glu_large":
        drops = [0.2, 0.214, 0.228, 0.245, 0.262, 0.280, 0.300, 0.321,
                 0.347, 0.368, 0.393, 0.421, 0.450, 0.482, 0.516, 0.552,
                 0.590]
        blocks = glu_blocks(_LARGE_GLU, len(_LARGE_GLU), drops, bnm)
    elif rnn_type == "large_cnn":
        blocks = [dict(out=o, kernel=k, stride=s, padding=p, batch_norm=True,
                       dropout=dropout, bnm=bnm)
                  for o, k, s, p in _LARGE_CNN]
    elif rnn_type == "cnn_jasper":
        blocks = jasper_blocks(bnm=bnm)
    else:
        raise ValueError(f"unknown CNN variant {rnn_type!r}")
    return ConvStack(blocks=tuple(blocks), num_classes=num_classes)
