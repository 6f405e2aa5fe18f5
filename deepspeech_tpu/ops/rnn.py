"""Recurrent cells as XLA scans, replacing the reference's cuDNN RNNs
(reference model.py:82-109).

Design for TPU:
* time-major (T, B, F) layout;
* the input projection for ALL timesteps is one large matmul (MXU-friendly);
  only the (B, H) @ (H, 3H/4H) hidden matmul runs inside ``lax.scan``;
* both directions of a bidirectional layer are fused into a single scan with
  a doubled batch (the backward direction consumes the sequence reversed
  within each utterance's valid length, reproducing
  ``pack_padded_sequence``/``pad_packed_sequence`` semantics of
  reference model.py:103-107);
* outputs at padded timesteps are zeroed, matching ``pad_packed_sequence``.

Gate math matches torch exactly (gate order r,z,n for GRU; i,f,g,o for LSTM),
so torch-trained checkpoints can be ported weight-for-weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CELL_GATES = {"gru": 3, "lstm": 4, "rnn": 1}


def _hidden_matmul(h, w_hh, b_hh):
    """(..., B, H) @ (..., H, G*H) with f32 accumulation; the operands may be
    bfloat16 (MXU fast path) while gate math stays f32."""
    hp = jnp.einsum("...bh,...hg->...bg", h.astype(w_hh.dtype), w_hh,
                    preferred_element_type=jnp.float32)
    return hp + b_hh[..., None, :].astype(jnp.float32)


def _gru_step(h, xp, w_hh, b_hh):
    """xp: precomputed x@W_ih^T + b_ih, (..., 3H); h: (..., H)."""
    hidden = h.shape[-1]
    hp = _hidden_matmul(h, w_hh, b_hh)
    xr, xz, xn = (xp[..., :hidden], xp[..., hidden:2 * hidden],
                  xp[..., 2 * hidden:])
    hr, hz, hn = (hp[..., :hidden], hp[..., hidden:2 * hidden],
                  hp[..., 2 * hidden:])
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _lstm_step(state, xp, w_hh, b_hh):
    h, c = state
    hidden = h.shape[-1]
    gates = xp + _hidden_matmul(h, w_hh, b_hh)
    i = jax.nn.sigmoid(gates[..., :hidden])
    f = jax.nn.sigmoid(gates[..., hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[..., 3 * hidden:])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def _rnn_step(h, xp, w_hh, b_hh):
    return jnp.tanh(xp + _hidden_matmul(h, w_hh, b_hh))


def _reverse_in_length(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse (T, B, ...) along time within each sequence's valid prefix."""
    t = x.shape[0]
    ts = jnp.arange(t)[:, None]
    idx = jnp.where(ts < lengths[None, :], lengths[None, :] - 1 - ts, ts)
    return jnp.take_along_axis(
        x, idx.reshape(t, -1, *([1] * (x.ndim - 2))), axis=0)


def rnn_scan(x: jnp.ndarray, lengths: jnp.ndarray, w_ih: jnp.ndarray,
             b_ih: jnp.ndarray, w_hh: jnp.ndarray, b_hh: jnp.ndarray,
             cell: str = "gru", bidirectional: bool = True,
             sum_directions: bool = True,
             compute_dtype=None, impl: str = "auto") -> jnp.ndarray:
    """Run a (bi)directional recurrent layer.

    x: (T, B, F) time-major input; lengths: (B,) valid steps.
    Weights are stacked over directions:
      w_ih: (D, F, G*H), b_ih: (D, G*H), w_hh: (D, H, G*H), b_hh: (D, G*H)
    with D = 2 if bidirectional else 1, G = gates(cell).
    Returns (T, B, H) if sum_directions (reference model.py:106-107 sums the
    two directions) else (T, B, D*H); padded steps are zeros.

    ``compute_dtype`` (e.g. jnp.bfloat16) is the matmul operand precision —
    the MXU fast path. Gate nonlinearities, the hidden state, and all
    accumulations stay float32.

    ``impl`` selects the recurrence lowering: ``"xla"`` (lax.scan),
    ``"pallas"`` (fused Pallas TPU kernel, GRU/LSTM + bf16 only),
    ``"pallas_interpret"`` (Pallas interpreter, for CPU tests), or
    ``"auto"`` (Pallas when on TPU and supported, else XLA).
    """
    gates = CELL_GATES[cell]
    d = 2 if bidirectional else 1
    assert w_ih.shape[0] == d
    hidden = w_hh.shape[1]
    t, b = x.shape[0], x.shape[1]

    from deepspeech_tpu.ops.pallas import pallas_supported

    use_pallas = cell in ("gru", "lstm") and compute_dtype is not None and (
        impl in ("pallas", "pallas_interpret")
        or (impl == "auto" and pallas_supported()))

    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w_ih = w_ih.astype(compute_dtype)
        if not use_pallas:
            w_hh = w_hh.astype(compute_dtype)

    if use_pallas:
        from deepspeech_tpu.ops.pallas import gru_scan_pallas, lstm_scan_pallas

        # Direction 1 runs on the plain time-FLIPPED input stream (an XLA
        # reverse of the small (T,B,F) input — the per-sample gather
        # `_reverse_in_length` on the 3x wider projections costs
        # ~1.65 ms/layer on TPU). In flipped coordinates each sample's
        # padding comes FIRST; gate overrides freeze the state through it so
        # the recurrence effectively starts at the sample's last valid
        # frame: sigmoid(40) == 1 exactly in f32, so the GRU update gate
        # carries h (= 0) unchanged, and the LSTM forget/input gates carry
        # c (= 0) unchanged. The analytic backward kernels see z==1 / f==1,
        # i==0 and emit exactly-zero gate grads at those steps.
        if bidirectional:
            x_stack = jnp.stack([x, jnp.flip(x, axis=0)], axis=1)
        else:
            x_stack = x[:, None]
        # one batched matmul, already in the kernel's (T, D, B, G*H) order —
        # the (T, D*B, G*H) row layout is then a free reshape. (The CPU
        # backend lacks batched bf16 dots; interpret-mode tests run it f32.)
        w_proj = w_ih
        if impl == "pallas_interpret":
            x_stack = x_stack.astype(jnp.float32)
            w_proj = w_ih.astype(jnp.float32)
        xp = jnp.einsum("tdbf,dfg->tdbg", x_stack, w_proj,
                        preferred_element_type=jnp.float32) \
            + b_ih[None, :, None, :].astype(jnp.float32)
        if bidirectional:
            padm = (jnp.arange(t)[:, None] < (t - lengths)[None, :])[..., None]
            if cell == "gru":
                z = jnp.where(padm, 40.0, xp[:, 1, :, hidden:2 * hidden])
                xp1 = jnp.concatenate(
                    [xp[:, 1, :, :hidden], z, xp[:, 1, :, 2 * hidden:]],
                    axis=-1)
            else:  # lstm
                i = jnp.where(padm, -40.0, xp[:, 1, :, :hidden])
                f = jnp.where(padm, 40.0, xp[:, 1, :, hidden:2 * hidden])
                xp1 = jnp.concatenate([i, f, xp[:, 1, :, 2 * hidden:]],
                                      axis=-1)
            xp = jnp.stack([xp[:, 0], xp1], axis=1)

        scan_pallas = gru_scan_pallas if cell == "gru" else lstm_scan_pallas
        xp_rows = xp.reshape(t, d * b, gates * hidden)
        h = scan_pallas(xp_rows, w_hh.astype(jnp.float32),
                        b_hh.astype(jnp.float32), b,
                        impl == "pallas_interpret")
        out = jnp.moveaxis(h.reshape(t, d, b, hidden), 0, 1)  # (D, T, B, H)
        if bidirectional:
            # undo the flip: position s < len maps to flipped t = T-1-s
            out = out.at[1].set(jnp.flip(out[1], axis=0))
    else:
        # Input projection for every (direction, timestep) in one matmul.
        # (T, B, F) @ (D, F, G*H) -> (D, T, B, G*H)
        xp = jnp.einsum("tbf,dfg->dtbg", x, w_ih,
                        preferred_element_type=jnp.float32) \
            + b_ih[:, None, None, :].astype(jnp.float32)
        if bidirectional:
            xp = xp.at[1].set(_reverse_in_length(xp[1], lengths))
        h0 = jnp.zeros((d, b, hidden), jnp.float32)  # state stays f32
        if cell == "lstm":
            init = (h0, jnp.zeros_like(h0))

            def step(state, xp_t):
                state = _lstm_step(state, xp_t, w_hh, b_hh)
                return state, state[0]
        else:
            init = h0
            step_fn = _gru_step if cell == "gru" else _rnn_step

            def step(h, xp_t):
                h = step_fn(h, xp_t, w_hh, b_hh)
                return h, h

        # scan over time; both directions ride along in the leading D axis of
        # the state, so one scan serves the whole layer.
        _, out = jax.lax.scan(step, init, jnp.swapaxes(xp, 0, 1))
        out = jnp.swapaxes(out, 0, 1)  # (D, T, B, H)
        if bidirectional:
            out = out.at[1].set(_reverse_in_length(out[1], lengths))

    mask = (jnp.arange(t)[:, None] < lengths[None, :]).astype(out.dtype)
    out = out * mask[None, :, :, None]
    if bidirectional and sum_directions:
        return out[0] + out[1]
    if bidirectional:
        return jnp.concatenate([out[0], out[1]], axis=-1)
    return out[0]
