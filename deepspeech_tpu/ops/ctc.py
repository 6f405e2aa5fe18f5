"""CTC loss as a log-space XLA scan, batch-vectorized and length-masked.

TPU-native replacement for warp-ctc (reference train.py:12, 600-602):
* takes raw logits (softmax applied internally, like warp-ctc);
* returns per-sample negative log likelihood; the training step sums over
  the batch and divides by batch size, matching reference train.py:600-601;
* variable logit/target lengths via masking — the alpha recursion freezes
  past each sample's logit length, so one compiled program serves a whole
  length bucket.

The alpha recursion runs as a single ``lax.scan`` over time with the whole
batch in flight; each step is pure VPU work of shape (B, 2L+1). Gradients
come from autodiff through the scan (equivalent to the beta recursion),
wrapped in ``jax.checkpoint`` to keep memory at O(T * B * L) logits instead
of storing every intermediate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _safe_logaddexp3(a, b, c):
    """log(e^a + e^b + e^c), -inf-safe with zero (not NaN) gradients there."""
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.where(m <= _NEG_INF, 0.0, m)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    # guard log(0) so the dead branch of the where carries no NaN gradient
    s = jnp.where(m <= _NEG_INF, 1.0, s)
    return jnp.where(m <= _NEG_INF, _NEG_INF, m_safe + jnp.log(s))


def ctc_loss(logits: jnp.ndarray, logit_lengths: jnp.ndarray,
             targets: jnp.ndarray, target_lengths: jnp.ndarray,
             blank: int = 0, impl: str = "auto") -> jnp.ndarray:
    """Per-sample CTC negative log likelihood.

    logits: (B, T, C) raw (pre-softmax); logit_lengths: (B,);
    targets: (B, L) padded label ids (no blanks); target_lengths: (B,).
    Returns (B,) float32 losses; impossible alignments (2L+1 > usable states
    or L > T) yield +inf like warp-ctc.

    ``impl``: ``"xla"`` (this module's lax.scan + autodiff), ``"pallas"``
    (fused alpha/beta Pallas kernels with analytic gradients,
    ops/pallas/ctc_kernel.py), ``"pallas_interpret"`` (for CPU tests), or
    ``"auto"`` (Pallas on TPU, XLA elsewhere).
    """
    from deepspeech_tpu.ops.pallas import pallas_supported
    if impl in ("pallas", "pallas_interpret") or (
            impl == "auto" and pallas_supported()):
        from deepspeech_tpu.ops.pallas.ctc_kernel import ctc_loss_pallas
        return ctc_loss_pallas(logits, logit_lengths, targets, target_lengths,
                               blank, impl == "pallas_interpret")
    b, t, _ = logits.shape
    l = targets.shape[1]
    s = 2 * l + 1

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # extended label sequence: blank, y1, blank, y2, ..., blank
    ext = jnp.full((b, s), blank, dtype=targets.dtype)
    ext = ext.at[:, 1::2].set(targets)
    # skip transition s-2 -> s allowed for label states with a different label
    prev2 = jnp.pad(ext[:, :-2], ((0, 0), (2, 0)), constant_values=blank)
    is_label = (jnp.arange(s)[None, :] % 2) == 1
    can_skip = is_label & (ext != prev2)
    # states beyond this sample's 2*target_len+1 are invalid
    valid_state = jnp.arange(s)[None, :] < (2 * target_lengths[:, None] + 1)

    # per-step emission log-probs gathered once for all (t, s): (B, T, S)
    emit = jnp.take_along_axis(log_probs, ext[:, None, :], axis=-1)

    alpha0 = jnp.full((b, s), _NEG_INF, jnp.float32)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    has_label = target_lengths > 0
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(has_label, emit[:, 0, 1], _NEG_INF))

    def shift(x, n):
        return jnp.pad(x, ((0, 0), (n, 0)), constant_values=_NEG_INF)[:, :s]

    def step(alpha, inputs):
        emit_t, t_idx = inputs
        stay = alpha
        diag = shift(alpha, 1)
        skip = jnp.where(can_skip, shift(alpha, 2), _NEG_INF)
        new = _safe_logaddexp3(stay, diag, skip) + emit_t
        new = jnp.where(valid_state, new, _NEG_INF)
        # freeze past each sample's logit length
        active = (t_idx < logit_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    emit_rest = jnp.moveaxis(emit[:, 1:, :], 1, 0)  # (T-1, B, S)
    alpha, _ = jax.lax.scan(
        jax.checkpoint(step), alpha0,
        (emit_rest, jnp.arange(1, t)))

    # final states: s = 2L-1 (last label) and s = 2L (trailing blank)
    end_blank = jnp.take_along_axis(
        alpha, (2 * target_lengths)[:, None].astype(jnp.int32), axis=1)[:, 0]
    end_label = jnp.take_along_axis(
        alpha, jnp.maximum(2 * target_lengths - 1, 0)[:, None].astype(jnp.int32),
        axis=1)[:, 0]
    end_label = jnp.where(has_label, end_label, _NEG_INF)
    m = jnp.maximum(end_blank, end_label)
    m_safe = jnp.where(m <= _NEG_INF, 0.0, m)
    s = jnp.exp(end_blank - m_safe) + jnp.exp(end_label - m_safe)
    s = jnp.where(m <= _NEG_INF, 1.0, s)
    total = jnp.where(m <= _NEG_INF, -jnp.inf, m_safe + jnp.log(s))
    return -total


def ctc_loss_mean(logits, logit_lengths, targets, target_lengths,
                  blank: int = 0) -> jnp.ndarray:
    """Batch loss with warp-ctc+reference semantics: sum over batch / B
    (reference train.py:600-601), non-finite samples excluded from the
    gradient (the reference clamps them for reporting, train.py:609-611)."""
    per = ctc_loss(logits, logit_lengths, targets, target_lengths, blank)
    finite = jnp.isfinite(per)
    safe = jnp.where(finite, per, 0.0)
    return safe.sum() / logits.shape[0]
