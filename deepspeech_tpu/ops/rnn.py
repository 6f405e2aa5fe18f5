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

import os

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
        from deepspeech_tpu.ops.pallas import (
            bigru_layer_pallas, bigru_scan_pallas, bilstm_layer_pallas,
            bilstm_scan_pallas, fused_layer_fits, gru_layer_pallas,
            gru_scan_pallas, lstm_layer_pallas, lstm_scan_pallas)

        # Zero-copy bidirectionality: the kernel's backward-direction blocks
        # walk the time grid in reverse via their BlockSpec index maps, so
        # BOTH directions consume the input in original time order — no
        # flip / per-sample gather on the streams. Padded steps are
        # state-frozen in-kernel from `lengths` (see rnn_kernel.py).
        interp = impl == "pallas_interpret"
        # kernel stream dtype: bf16 on TPU; f32 under the CPU interpreter
        # (whose backend lacks fast bf16 dots).
        sdt = jnp.float32 if interp else jnp.bfloat16
        # Mosaic requires slices along the sublane (batch) dim of the
        # (chunk, B, ·) blocks to be 8-aligned; pad B up front (cheap: the
        # pad rides the small (T, B, F) input, padded rows carry length 0 and
        # are sliced off the outputs below).
        bpad = (-b) % 8
        xk, lk = x, lengths
        if bpad:
            xk = jnp.pad(x, ((0, 0), (0, bpad), (0, 0)))
            lk = jnp.pad(lengths, (0, bpad))
        b_ih32 = b_ih.astype(jnp.float32)
        b_hh32 = b_hh.astype(jnp.float32)
        w_hh32 = w_hh.astype(jnp.float32)  # kernels cast to bf16 on TPU
        # The output mask is load-bearing for BOTH directions: it zeroes the
        # forward stream's padded-step garbage AND (through its VJP) the
        # padded-step cotangents that the kernels' freeze-gate trick
        # requires to be zero.
        mask = (jnp.arange(t)[:, None] < lengths[None, :]
                ).astype(jnp.float32)[:, :, None]
        # Projection-fused layer kernels (ops/pallas/rnn_fused.py): x goes
        # straight into the kernel and the (T, B, G·H) projection streams
        # never touch HBM — the r4 VERDICT's #1 HBM frontier. Falls back to
        # the external-projection kernels when pinning W_ih alongside W_hh
        # would overflow VMEM (very wide H).
        fused = fused_layer_fits(x.shape[2], hidden, gates,
                                 b + bpad, d, 4 if interp else 2) \
            and not os.environ.get("DEEPSPEECH_TPU_NO_FUSED")
        xks = xk.astype(sdt)
        if not fused:
            # Raw per-direction input projections, one (T·B, F)x(F, G·H)
            # MXU matmul each; biases are added in-kernel so the convert
            # fuses into the matmul epilogue and no f32 copy of the stream
            # is materialized. Two separate einsums (not one d-batched
            # "tbf,dfg->dtbg"): the batched form materializes a d-major
            # transpose of the streams in forward AND backward plus slice
            # copies — ~0.7 ms/layer of pure data movement on the profile.
            xp = [jnp.einsum("tbf,fg->tbg", xks, w_ih[di].astype(sdt),
                             preferred_element_type=jnp.float32).astype(sdt)
                  for di in range(w_ih.shape[0])]
        if bidirectional:
            lens = lk.astype(jnp.float32)[:, None]  # (B + pad, 1)
            if fused:
                fn = (bigru_layer_pallas if cell == "gru"
                      else bilstm_layer_pallas)
                h_f, h_b = fn(xks, w_ih.astype(sdt), b_ih32, w_hh32, b_hh32,
                              lens, interp)
            else:
                fn = (bigru_scan_pallas if cell == "gru"
                      else bilstm_scan_pallas)
                h_f, h_b = fn(xp[0], xp[1], b_ih32, w_hh32, b_hh32, lens,
                              interp)
            h_f, h_b = h_f[:, :b], h_b[:, :b]
            if sum_directions:  # reference model.py:106-107 sums directions
                # f32 sum regardless of the kernels' h stream dtype
                return (h_f.astype(jnp.float32)
                        + h_b.astype(jnp.float32)) * mask
            return jnp.concatenate([h_f, h_b], axis=-1).astype(
                jnp.float32) * mask
        if fused:
            fn = gru_layer_pallas if cell == "gru" else lstm_layer_pallas
            return fn(xks, w_ih.astype(sdt), b_ih32, w_hh32, b_hh32,
                      interp)[:, :b] * mask
        fn = gru_scan_pallas if cell == "gru" else lstm_scan_pallas
        return fn(xp[0], b_ih32, w_hh32, b_hh32, interp)[:, :b] * mask
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
