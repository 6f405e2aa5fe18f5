"""Fused CTC forward-backward as Pallas TPU kernels with analytic gradients.

TPU-native warp-ctc equivalent (reference train.py:12, 600-602): the alpha
(forward) and beta (backward) log-space recursions each run as a single
sequential-grid Pallas kernel carrying the recursion state in VMEM, and the
gradient w.r.t. logits comes from the standard closed form

    dL/dlogit[b,t,c] = softmax[b,t,c] - sum_{s: ext_s = c} gamma[b,t,s]

(gamma = posterior state occupancy, exp(alpha + beta - logP)) instead of
autodiff replay through a checkpointed ``lax.scan`` (the XLA path in
``ops/ctc.py``).

Design notes:
* every per-step operation is VPU work on a (B, S) tile (S = 2L+1 states on
  lanes); there are no matmuls inside the kernels;
* the class-axis gather/scatter (labels -> classes) is hoisted out of the
  kernels as one-hot einsums on the MXU — TPU-hostile gathers never happen;
* the alpha trajectory streams to HBM from the forward kernel and streams
  back, reversed, into the beta kernel — O(T*B*S) f32, a few MB;
* both kernels freeze their recursion past each sample's logit length, so
  one compiled program serves a whole length bucket (same contract as the
  XLA path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_CHUNK = int(os.environ.get("DEEPSPEECH_TPU_CTC_CHUNK", "16"))


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m_safe = jnp.where(m <= _NEG_INF, 0.0, m)
    s = (jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe))
    s = jnp.where(m <= _NEG_INF, 1.0, s)
    return jnp.where(m <= _NEG_INF, _NEG_INF, m_safe + jnp.log(s))


def _shift_lanes(x, n):
    """Shift (B, S) right by n along lanes, filling with -inf."""
    pad = jnp.full((x.shape[0], n), _NEG_INF, x.dtype)
    return jnp.concatenate([pad, x[:, : x.shape[1] - n]], axis=1)


def _shift_lanes_left(x, n):
    pad = jnp.full((x.shape[0], n), _NEG_INF, x.dtype)
    return jnp.concatenate([x[:, n:], pad], axis=1)


def _ctc_alpha_kernel(chunk, emit_ref, skip_ref, valid_ref, len_ref,
                      alpha_out_ref, state):
    """alpha recursion; one grid step = ``chunk`` timesteps.

    emit_ref:  (chunk, B, S) f32 — per-state emission log-probs
    skip_ref:  (B, S) f32 — 0 where the s-2 skip transition is allowed,
               -inf where not
    valid_ref: (B, S) f32 — 0 for states inside 2*L_b+1, -inf outside
    len_ref:   (B, 1) i32 — logit lengths
    alpha_out_ref: (chunk, B, S) f32 — the alpha trajectory
    state: (B, S) f32 scratch — running alpha
    """
    t0 = pl.program_id(0) * chunk

    @pl.when(pl.program_id(0) == 0)
    def _():
        # alpha_0: states 0 (blank) and 1 (first label) only; emission is
        # added in the shared step below via a -inf "previous" of one-hot
        # shape, so seed with log(1) at s<2 pre-emission.
        b, s = state.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
        state[:] = jnp.where(lane < 2, 0.0, _NEG_INF) + valid_ref[:]

    lengths = len_ref[:]  # (B, 1)
    for j in range(chunk):
        t = t0 + j
        alpha = state[:]
        if True:
            stay = alpha
            diag = _shift_lanes(alpha, 1)
            skip = _shift_lanes(alpha, 2) + skip_ref[:]
            new = _logaddexp3(stay, diag, skip)
        # at t=0 there is no transition: keep the seed as-is
        new = jnp.where(t == 0, alpha, new)
        new = (new + emit_ref[j] + valid_ref[:])
        new = jnp.maximum(new, _NEG_INF)
        active = t < lengths  # (B, 1) broadcasts over lanes
        new = jnp.where(active, new, alpha)
        state[:] = new
        alpha_out_ref[j] = new


def _ctc_beta_kernel(chunk, emit_ref, skip_ref, valid_ref, len_ref, end_ref,
                     gamma_ref, state):
    """beta recursion (reversed grid) emitting alpha+beta in ``gamma_ref``.

    emit_ref: (chunk, B, S) — emission log-probs (same stream as forward)
    end_ref:  (B, S) f32 — 0 at the two admissible final states, -inf else
    gamma_ref: (chunk, B, S) f32 out — log(alpha_t) is ADDED by the caller;
               here we write beta_t + emit_t (the backward mass including
               this frame's emission).
    state: (B, S) f32 — running beta (post-emission at t+1).
    """
    nblocks = pl.num_programs(0)
    t_hi = (nblocks - pl.program_id(0)) * chunk - 1  # first t in this block

    @pl.when(pl.program_id(0) == 0)
    def _():
        state[:] = jnp.full(state.shape, _NEG_INF, jnp.float32)

    lengths = len_ref[:]  # (B, 1)
    for j in reversed(range(chunk)):
        t = t_hi - (chunk - 1 - j)
        beta_next = state[:]
        stay = beta_next
        diag = _shift_lanes_left(beta_next, 1)
        skip = _shift_lanes_left(beta_next, 2) + _shift_lanes_left(
            skip_ref[:], 2)
        trans = _logaddexp3(stay, diag, skip)
        # at the last valid frame, beta = end-state indicator
        is_last = t == (lengths - 1)  # (B, 1)
        beta_here = jnp.where(is_last, end_ref[:], trans)
        beta_here = (beta_here + emit_ref[j] + valid_ref[:])
        beta_here = jnp.maximum(beta_here, _NEG_INF)
        active = t < lengths
        beta_here = jnp.where(active, beta_here, _NEG_INF)
        state[:] = jnp.where(active, beta_here, beta_next)
        gamma_ref[j] = beta_here


def _pad_time(a, chunk):
    t = a.shape[0]
    pad = (-t) % chunk
    if pad:
        a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                    constant_values=_NEG_INF)
    return a, t


def _run_alpha(emit_tbs, skip, valid, lengths, interpret):
    chunk = _CHUNK
    emit_p, t = _pad_time(emit_tbs, chunk)
    tp, b, s = emit_p.shape
    nblocks = tp // chunk
    alphas = pl.pallas_call(
        functools.partial(_ctc_alpha_kernel, chunk),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((chunk, b, s), lambda i: (i, 0, 0)),
            pl.BlockSpec((b, s), lambda i: (0, 0)),
            pl.BlockSpec((b, s), lambda i: (0, 0)),
            pl.BlockSpec((b, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((chunk, b, s), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((tp, b, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        interpret=interpret,
    )(emit_p, skip, valid, lengths[:, None].astype(jnp.int32))
    return alphas[:t]


def _run_beta(emit_tbs, skip, valid, end, lengths, interpret):
    chunk = _CHUNK
    emit_p, t = _pad_time(emit_tbs, chunk)
    tp, b, s = emit_p.shape
    nblocks = tp // chunk
    rev = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731
    betas = pl.pallas_call(
        functools.partial(_ctc_beta_kernel, chunk),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((chunk, b, s), rev),
            pl.BlockSpec((b, s), lambda i: (0, 0)),
            pl.BlockSpec((b, s), lambda i: (0, 0)),
            pl.BlockSpec((b, 1), lambda i: (0, 0)),
            pl.BlockSpec((b, s), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((chunk, b, s), rev),
        out_shape=jax.ShapeDtypeStruct((tp, b, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        interpret=interpret,
    )(emit_p, skip, valid, lengths[:, None].astype(jnp.int32), end)
    return betas[:t]


def _prep(logits, logit_lengths, targets, target_lengths, blank):
    """Shared preprocessing: one-hot label maps + masks, all MXU/VPU."""
    b, t, c = logits.shape
    l = targets.shape[1]
    s = 2 * l + 1

    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    ext = jnp.full((b, s), blank, dtype=jnp.int32)
    ext = ext.at[:, 1::2].set(targets.astype(jnp.int32))
    onehot = jax.nn.one_hot(ext, c, dtype=jnp.float32)  # (B, S, C)

    prev2 = jnp.pad(ext[:, :-2], ((0, 0), (2, 0)), constant_values=blank)
    is_label = (jnp.arange(s)[None, :] % 2) == 1
    can_skip = is_label & (ext != prev2)
    skip = jnp.where(can_skip, 0.0, _NEG_INF).astype(jnp.float32)

    valid_state = (jnp.arange(s)[None, :]
                   < (2 * target_lengths[:, None] + 1))
    valid = jnp.where(valid_state, 0.0, _NEG_INF).astype(jnp.float32)

    # emission log-probs per state, via MXU instead of a gather:
    # (B, T, C) x (B, S, C) -> (T, B, S); HIGHEST = exact f32 (the default
    # bf16-pass matmul would put ~1e-3 relative noise on every log-prob)
    emit = jnp.einsum("btc,bsc->tbs", log_probs, onehot,
                      precision=jax.lax.Precision.HIGHEST)

    lane = jnp.arange(s)[None, :]
    end = jnp.where(
        (lane == 2 * target_lengths[:, None])
        | ((lane == 2 * target_lengths[:, None] - 1)
           & (target_lengths[:, None] > 0)),
        0.0, _NEG_INF).astype(jnp.float32)
    return log_probs, onehot, skip, valid, emit, end


def _loss_from_alpha(alpha_last, target_lengths):
    b = alpha_last.shape[0]
    has_label = target_lengths > 0
    end_blank = jnp.take_along_axis(
        alpha_last, (2 * target_lengths)[:, None].astype(jnp.int32),
        axis=1)[:, 0]
    end_label = jnp.take_along_axis(
        alpha_last,
        jnp.maximum(2 * target_lengths - 1, 0)[:, None].astype(jnp.int32),
        axis=1)[:, 0]
    end_label = jnp.where(has_label, end_label, _NEG_INF)
    m = jnp.maximum(end_blank, end_label)
    m_safe = jnp.where(m <= _NEG_INF, 0.0, m)
    sm = jnp.exp(end_blank - m_safe) + jnp.exp(end_label - m_safe)
    sm = jnp.where(m <= _NEG_INF, 1.0, sm)
    total = jnp.where(m <= _NEG_INF, -jnp.inf, m_safe + jnp.log(sm))
    return -total


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss_pallas(logits, logit_lengths, targets, target_lengths,
                    blank: int = 0, interpret: bool = False):
    """Per-sample CTC NLL with the same contract as ``ops.ctc.ctc_loss``."""
    loss, _ = _ctc_fwd(logits, logit_lengths, targets, target_lengths,
                       blank, interpret)
    return loss


def _ctc_fwd(logits, logit_lengths, targets, target_lengths, blank,
             interpret):
    log_probs, onehot, skip, valid, emit, end = _prep(
        logits, logit_lengths, targets, target_lengths, blank)
    alphas = _run_alpha(emit, skip, valid, logit_lengths, interpret)
    # running alpha at each sample's last valid frame
    idx = jnp.maximum(logit_lengths.astype(jnp.int32) - 1, 0)
    alpha_last = jnp.take_along_axis(
        jnp.moveaxis(alphas, 0, 1), idx[:, None, None], axis=1)[:, 0]
    loss = _loss_from_alpha(alpha_last, target_lengths)
    res = (log_probs, onehot, skip, valid, emit, end, alphas, loss,
           logit_lengths, target_lengths)
    return loss, res


def _ctc_bwd(blank, interpret, res, g):
    (log_probs, onehot, skip, valid, emit, end, alphas, loss,
     logit_lengths, target_lengths) = res
    betas = _run_beta(emit, skip, valid, end, logit_lengths, interpret)
    log_p = -loss  # (B,)

    # gamma[t,b,s] = exp(alpha + beta - emit - logP): emission is counted in
    # both alpha and beta, remove one copy.
    log_gamma = alphas + betas - emit + loss[None, :, None]
    gamma = jnp.where(
        jnp.isfinite(log_p)[None, :, None] & (log_gamma > -80.0),
        jnp.exp(jnp.minimum(log_gamma, 0.0)), 0.0)

    # dL/dlogits = softmax - scatter(gamma over ext labels), via MXU
    occupancy = jnp.einsum("tbs,bsc->btc", gamma, onehot,
                           precision=jax.lax.Precision.HIGHEST)
    t_idx = jnp.arange(log_probs.shape[1])
    frame_ok = (t_idx[None, :] < logit_lengths[:, None])[..., None]
    sample_ok = jnp.isfinite(log_p)[:, None, None]
    dlogits = jnp.where(
        frame_ok & sample_ok, jnp.exp(log_probs) - occupancy, 0.0)
    dlogits = dlogits * g[:, None, None]
    return (dlogits.astype(jnp.float32), None, None, None)


ctc_loss_pallas.defvjp(_ctc_fwd, _ctc_bwd)
