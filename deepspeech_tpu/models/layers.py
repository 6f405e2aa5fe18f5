"""Shared model building blocks (flax.linen).

These reproduce torch layer semantics exactly where parity matters:
* :class:`TorchBatchNorm` — torch BatchNorm semantics (biased batch variance
  for normalization, unbiased for the running estimate, ``momentum`` is the
  new-sample weight), replacing reference SequenceWise+BatchNorm1d
  (model.py:28-49) and the conv-stack BatchNorm2d (model.py:208-215).
  As in the reference, statistics are computed over *all* positions including
  zeroed padding — identical batches produce identical statistics.
* ``hardtanh_0_20`` — nn.Hardtanh(0, 20) (model.py:211, 214, 332).
* :class:`Lookahead` — lookahead convolution for unidirectional models
  (Wang et al. 2016; reference model.py:140-177).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def hardtanh_0_20(x):
    return jnp.clip(x, 0.0, 20.0)


def length_mask(lengths: jnp.ndarray, t: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B,) lengths -> (B, T) {0,1} mask."""
    return (jnp.arange(t)[None, :] < lengths[:, None]).astype(dtype)


class TorchBatchNorm(nn.Module):
    """BatchNorm over the last axis with torch running-stat semantics.

    With ``fold=True`` the module returns the equivalent per-feature affine
    ``(a, b)`` (``bn(x) == x * a + b``) instead of the normalized tensor,
    so a following matmul can fold it into its weights
    (``bn(x) @ W == x @ (a[:, None] * W) + b @ W``) and the (T, B, F)
    normalized intermediate never exists in HBM — the sequence-BN fusion
    of the train-step tail (PERF.md "Step tail"). Running-stat updates are
    identical in both modes."""

    momentum: float = 0.1
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    fold: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (feat,), self.dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(feat, self.dtype))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(feat, self.dtype))
        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            n = 1
            for a in reduce_axes:
                n *= x.shape[a]
            mean = jnp.mean(x, axis=reduce_axes)
            var = jnp.mean(jnp.square(x - mean), axis=reduce_axes)  # biased
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps)
        if self.fold:
            a = inv * scale
            return a, bias - mean * a
        return (x - mean) * (inv * scale) + bias


class Lookahead(nn.Module):
    """Lookahead conv, context frames ahead (reference model.py:140-177).

    Input/output (T, B, H): out[t] = sum_{j=0..context} in[t+j] * w[:, j]
    with zero padding past the end.
    """

    features: int
    context: int = 20

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        stdv = 1.0 / jnp.sqrt(self.context + 1)
        w = self.param(
            "weight",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -stdv, stdv),
            (self.features, self.context + 1))
        t = x.shape[0]
        xp = jnp.pad(x, ((0, self.context), (0, 0), (0, 0)))
        # (T, C+1, B, H) windows -> weighted sum over the context axis
        windows = jnp.stack([xp[j:j + t] for j in range(self.context + 1)],
                            axis=1)
        return jnp.einsum("tcbh,hc->tbh", windows, w)
