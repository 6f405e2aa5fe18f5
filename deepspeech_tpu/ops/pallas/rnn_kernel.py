"""Fused GRU time-scan as a Pallas TPU kernel.

TPU-native replacement for the recurrent half of a cuDNN (bi)GRU layer
(reference model.py:82-109 wraps ``nn.GRU``).  The input projection
``x @ W_ih + b_ih`` for all timesteps is one large MXU matmul done *outside*
the kernel (see ``ops/rnn.py``); this kernel runs only the inherently
sequential recurrence

    r_t = sigmoid(xp_r + h W_hr + b_hr)
    z_t = sigmoid(xp_z + h W_hz + b_hz)
    n_t = tanh  (xp_n + r_t * (h W_hn + b_hn))
    h_t = (1 - z_t) * n_t + z_t * h_{t-1}

with torch gate order/semantics, both directions of a bidirectional layer
fused into one kernel (direction-stacked rows).

Why Pallas instead of ``lax.scan``:
* ``W_hh`` (the per-step matmul operand) is pinned in VMEM for the whole
  time loop — the XLA scan re-fetches it from HBM every iteration, and at
  T~400 steps the weight refetch traffic (2 x 3.8 MB x T) dwarfs the actual
  compute;
* the per-timestep input projections stream through VMEM double-buffered
  (Pallas pipelines the grid's block DMAs against compute);
* the backward pass is an analytic reverse-time kernel (one small matmul per
  step) instead of autodiff replay; the heavy weight-gradient reduction is
  left to one big XLA matmul over all timesteps (MXU-shaped), outside the
  kernel.

The kernel carries the hidden state in a VMEM scratch buffer across grid
steps (the TPU grid is sequential), processing CHUNK timesteps per grid step
with fully unrolled static indexing.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = int(os.environ.get("DEEPSPEECH_TPU_GRU_CHUNK", "8"))


def pallas_supported() -> bool:
    """True when the Pallas GRU path should be used by ``impl="auto"``."""
    if os.environ.get("DEEPSPEECH_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing never throws today
        return False


def _split_gates(a, h):
    return a[..., :h], a[..., h : 2 * h], a[..., 2 * h :]


def _gru_fwd_kernel(nrows, chunk, with_residuals,
                    xp_ref, w_ref, b_ref, *out_refs):
    """One grid step = ``chunk`` timesteps for all D directions at once.

    xp_ref: (chunk, R, 3H) bf16, R = D*B direction-stacked rows
    w_ref:  (D, H, 3H) bf16 (VMEM-resident across the whole loop)
    b_ref:  (D, 3H) f32 hidden biases
    outputs: h (chunk, R, H) f32 [+ gates (chunk, R, 3H) bf16,
             hn (chunk, R, H) bf16 when training]
    scratch: state (R, H) f32
    """
    if with_residuals:
        h_ref, g_ref, hn_ref, state = out_refs
    else:
        h_ref, state = out_refs
    ndir = w_ref.shape[0]
    hidden = w_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    for j in range(chunk):
        xp_t = xp_ref[j].astype(jnp.float32)  # (R, 3H)
        for d in range(ndir):
            rows = slice(d * nrows, (d + 1) * nrows)
            h_prev = state[rows]
            hp = (
                jnp.dot(h_prev.astype(w_ref.dtype), w_ref[d],
                        preferred_element_type=jnp.float32)
                + b_ref[d][None, :]
            )
            xr, xz, xn = _split_gates(xp_t[rows], hidden)
            hr, hz, hn = _split_gates(hp, hidden)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h_prev
            state[rows] = h_new
            h_ref[j, rows] = h_new
            if with_residuals:
                g_ref[j, rows, :hidden] = r.astype(g_ref.dtype)
                g_ref[j, rows, hidden : 2 * hidden] = z.astype(g_ref.dtype)
                g_ref[j, rows, 2 * hidden :] = n.astype(g_ref.dtype)
                hn_ref[j, rows] = hn.astype(hn_ref.dtype)


def _gru_bwd_kernel(nrows, chunk,
                    dout_ref, g_ref, hn_ref, hprev_ref, wt_ref,
                    dg_ref, state):
    """Reverse-time analytic GRU backward; grid runs last chunk first.

    dout_ref:  (chunk, R, H) f32 — incoming dL/dh_t
    g_ref:     (chunk, R, 3H) bf16 — stored r,z,n
    hn_ref:    (chunk, R, H) bf16 — stored hidden n-projection (incl b_hn)
    hprev_ref: (chunk, R, H) f32 — h_{t-1}
    wt_ref:    (D, 3H, H) bf16 — W_hh transposed, VMEM-resident
    dg_ref:    (chunk, R, 3H) f32 out — d/d(xp) pre-activation gate grads
    state:     (R, H) f32 scratch — dh carried to earlier timesteps
    """
    ndir = wt_ref.shape[0]
    hidden = wt_ref.shape[2]

    @pl.when(pl.program_id(0) == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    for j in reversed(range(chunk)):
        for d in range(ndir):
            rows = slice(d * nrows, (d + 1) * nrows)
            dh_tot = dout_ref[j, rows] + state[rows]
            r = g_ref[j, rows, :hidden].astype(jnp.float32)
            z = g_ref[j, rows, hidden : 2 * hidden].astype(jnp.float32)
            n = g_ref[j, rows, 2 * hidden :].astype(jnp.float32)
            hn = hn_ref[j, rows].astype(jnp.float32)
            h_prev = hprev_ref[j, rows]

            dn_pre = dh_tot * (1.0 - z) * (1.0 - n * n)
            dz_pre = dh_tot * (h_prev - n) * z * (1.0 - z)
            dr_pre = dn_pre * hn * r * (1.0 - r)

            dg_ref[j, rows, :hidden] = dr_pre
            dg_ref[j, rows, hidden : 2 * hidden] = dz_pre
            dg_ref[j, rows, 2 * hidden :] = dn_pre

            # dL/d(hp) — the hidden-projection grads; n-part picks up the r
            # factor from n = tanh(xn + r * hn).
            dhp = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=-1)
            state[rows] = dh_tot * z + jnp.dot(
                dhp.astype(wt_ref.dtype), wt_ref[d],
                preferred_element_type=jnp.float32)


def _pad_time(a, chunk):
    t = a.shape[0]
    pad = (-t) % chunk
    if pad:
        a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
    return a, t


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gru_scan_pallas(xp, w_hh, b_hh, nrows, interpret=False):
    """Run the GRU recurrence over time with a fused Pallas kernel.

    xp:    (T, R, 3H) f32 — precomputed ``x @ W_ih + b_ih`` with the D
           directions stacked on the row axis (R = D * nrows); direction 1
           must already be time-reversed within valid lengths.
    w_hh:  (D, H, 3H) hidden weights (cast to bf16 for the MXU).
    b_hh:  (D, 3H) hidden biases.
    Returns h: (T, R, H) f32. Gradients flow to xp, w_hh, b_hh analytically.
    """
    h, _ = _gru_fwd(xp, w_hh, b_hh, nrows, interpret, with_residuals=False)
    return h


def _gru_fwd(xp, w_hh, b_hh, nrows, interpret, with_residuals):
    chunk = _CHUNK
    xp_p, t = _pad_time(xp, chunk)
    tp, rws, gh = xp_p.shape
    ndir, hidden, _ = w_hh.shape
    nblocks = tp // chunk

    out_shape = [jax.ShapeDtypeStruct((tp, rws, hidden), jnp.float32)]
    out_specs = [pl.BlockSpec((chunk, rws, hidden), lambda i: (i, 0, 0))]
    if with_residuals:
        out_shape += [
            jax.ShapeDtypeStruct((tp, rws, gh), jnp.bfloat16),
            jax.ShapeDtypeStruct((tp, rws, hidden), jnp.bfloat16),
        ]
        out_specs += [
            pl.BlockSpec((chunk, rws, gh), lambda i: (i, 0, 0)),
            pl.BlockSpec((chunk, rws, hidden), lambda i: (i, 0, 0)),
        ]

    outs = pl.pallas_call(
        functools.partial(_gru_fwd_kernel, nrows, chunk, with_residuals),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((chunk, rws, gh), lambda i: (i, 0, 0)),
            pl.BlockSpec((ndir, hidden, gh), lambda i: (0, 0, 0)),
            pl.BlockSpec((ndir, gh), lambda i: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((rws, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        xp_p.astype(jnp.bfloat16),
        w_hh.astype(jnp.bfloat16),
        b_hh.astype(jnp.float32),
    )
    if with_residuals:
        h_p, gates, hn = outs
        return h_p[:t], (xp, w_hh, gates, hn, h_p, t)
    return outs[0][:t], None


def _gru_scan_fwd(xp, w_hh, b_hh, nrows, interpret):
    h, res = _gru_fwd(xp, w_hh, b_hh, nrows, interpret, with_residuals=True)
    return h, res


def _gru_scan_bwd(nrows, interpret, res, dout):
    xp, w_hh, gates, hn, h_p, t = res
    chunk = _CHUNK
    tp, rws, hidden = h_p.shape
    ndir, _, gh = w_hh.shape
    nblocks = tp // chunk

    dout_p, _ = _pad_time(dout.astype(jnp.float32), chunk)
    # h_{t-1} stream: one shifted copy (h0 = 0).
    hprev = jnp.concatenate(
        [jnp.zeros((1, rws, hidden), jnp.float32), h_p[:-1]], axis=0)

    rev = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731 — reversed grid walk
    dgates = pl.pallas_call(
        functools.partial(_gru_bwd_kernel, nrows, chunk),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((chunk, rws, hidden), rev),
            pl.BlockSpec((chunk, rws, gh), rev),
            pl.BlockSpec((chunk, rws, hidden), rev),
            pl.BlockSpec((chunk, rws, hidden), rev),
            pl.BlockSpec((ndir, gh, hidden), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((chunk, rws, gh), rev),
        out_shape=jax.ShapeDtypeStruct((tp, rws, gh), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rws, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        dout_p,
        gates,
        hn,
        hprev,
        jnp.swapaxes(w_hh, 1, 2).astype(jnp.bfloat16),
    )

    dgates = dgates[:t]
    dxp = dgates  # pre-activation grads ARE the xp grads (gate order r,z,n)

    # Weight/bias grads: one big MXU reduction over all timesteps, per
    # direction; the n-part of the hidden-projection grad carries the r gate.
    r = gates[:t, :, :hidden].astype(jnp.float32)
    dhp = jnp.concatenate(
        [dgates[..., : 2 * hidden], dgates[..., 2 * hidden :] * r], axis=-1)
    hprev_t = hprev[:t]
    dw = jnp.stack([
        jnp.einsum(
            "trh,trg->hg",
            hprev_t[:, d * nrows : (d + 1) * nrows],
            dhp[:, d * nrows : (d + 1) * nrows],
            preferred_element_type=jnp.float32,
        )
        for d in range(ndir)
    ])
    db = jnp.stack([
        dhp[:, d * nrows : (d + 1) * nrows].sum(axis=(0, 1))
        for d in range(ndir)
    ])
    return dxp, dw.astype(w_hh.dtype), db


gru_scan_pallas.defvjp(_gru_scan_fwd, _gru_scan_bwd)


# ---------------------------------------------------------------------------
# LSTM — same architecture as the GRU kernel: W_hh pinned in VMEM, chunked
# sequential grid, analytic reverse-time backward. Torch gate order i,f,g,o
# (reference model.py:13-16 exposes nn.LSTM via rnn_type="lstm").
# ---------------------------------------------------------------------------


def _lstm_fwd_kernel(nrows, chunk, with_residuals,
                     xp_ref, w_ref, b_ref, *out_refs):
    """xp_ref: (chunk, R, 4H) bf16; w_ref: (D, H, 4H) bf16; b_ref: (D, 4H) f32.

    outputs: h (chunk, R, H) f32, c (chunk, R, H) f32
             [+ gates (chunk, R, 4H) bf16 when training]
    scratch: state (2, R, H) f32 — rows 0 = h, 1 = c
    """
    if with_residuals:
        h_ref, c_ref, g_ref, state = out_refs
    else:
        h_ref, c_ref, state = out_refs
    ndir = w_ref.shape[0]
    hidden = w_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    for j in range(chunk):
        xp_t = xp_ref[j].astype(jnp.float32)  # (R, 4H)
        for d in range(ndir):
            rows = slice(d * nrows, (d + 1) * nrows)
            h_prev = state[0, rows]
            c_prev = state[1, rows]
            gates = (
                xp_t[rows]
                + jnp.dot(h_prev.astype(w_ref.dtype), w_ref[d],
                          preferred_element_type=jnp.float32)
                + b_ref[d][None, :]
            )
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden :])
            c_new = f * c_prev + i * g
            h_new = o * jnp.tanh(c_new)
            state[0, rows] = h_new
            state[1, rows] = c_new
            h_ref[j, rows] = h_new
            c_ref[j, rows] = c_new
            if with_residuals:
                g_ref[j, rows, :hidden] = i.astype(g_ref.dtype)
                g_ref[j, rows, hidden : 2 * hidden] = f.astype(g_ref.dtype)
                g_ref[j, rows, 2 * hidden : 3 * hidden] = g.astype(g_ref.dtype)
                g_ref[j, rows, 3 * hidden :] = o.astype(g_ref.dtype)


def _lstm_bwd_kernel(nrows, chunk,
                     dout_ref, g_ref, c_ref, cprev_ref, wt_ref,
                     dg_ref, state):
    """Reverse-time analytic LSTM backward; grid runs last chunk first.

    dout_ref:  (chunk, R, H) f32 — incoming dL/dh_t
    g_ref:     (chunk, R, 4H) bf16 — stored i,f,g,o
    c_ref:     (chunk, R, H) f32 — c_t
    cprev_ref: (chunk, R, H) f32 — c_{t-1}
    wt_ref:    (D, 4H, H) bf16 — W_hh transposed, VMEM-resident
    dg_ref:    (chunk, R, 4H) f32 out — pre-activation gate grads (== dxp)
    state:     (2, R, H) f32 scratch — rows 0 = dh carry, 1 = dc carry
    """
    ndir = wt_ref.shape[0]
    hidden = wt_ref.shape[2]

    @pl.when(pl.program_id(0) == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    for j in reversed(range(chunk)):
        for d in range(ndir):
            rows = slice(d * nrows, (d + 1) * nrows)
            dh_tot = dout_ref[j, rows] + state[0, rows]
            i = g_ref[j, rows, :hidden].astype(jnp.float32)
            f = g_ref[j, rows, hidden : 2 * hidden].astype(jnp.float32)
            g = g_ref[j, rows, 2 * hidden : 3 * hidden].astype(jnp.float32)
            o = g_ref[j, rows, 3 * hidden :].astype(jnp.float32)
            tc = jnp.tanh(c_ref[j, rows])
            c_prev = cprev_ref[j, rows]

            do_pre = dh_tot * tc * o * (1.0 - o)
            dc_tot = state[1, rows] + dh_tot * o * (1.0 - tc * tc)
            di_pre = dc_tot * g * i * (1.0 - i)
            df_pre = dc_tot * c_prev * f * (1.0 - f)
            dg_pre = dc_tot * i * (1.0 - g * g)

            dg_ref[j, rows, :hidden] = di_pre
            dg_ref[j, rows, hidden : 2 * hidden] = df_pre
            dg_ref[j, rows, 2 * hidden : 3 * hidden] = dg_pre
            dg_ref[j, rows, 3 * hidden :] = do_pre

            dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre],
                                     axis=-1)
            state[0, rows] = jnp.dot(dgates.astype(wt_ref.dtype), wt_ref[d],
                                     preferred_element_type=jnp.float32)
            state[1, rows] = dc_tot * f


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lstm_scan_pallas(xp, w_hh, b_hh, nrows, interpret=False):
    """Run the LSTM recurrence over time with a fused Pallas kernel.

    Same contract as ``gru_scan_pallas`` with G=4 (torch order i,f,g,o):
    xp: (T, R, 4H) f32 direction-stacked; returns h: (T, R, H) f32.
    """
    h, _ = _lstm_fwd(xp, w_hh, b_hh, nrows, interpret, with_residuals=False)
    return h


def _lstm_fwd(xp, w_hh, b_hh, nrows, interpret, with_residuals):
    chunk = _CHUNK
    xp_p, t = _pad_time(xp, chunk)
    tp, rws, gh = xp_p.shape
    ndir, hidden, _ = w_hh.shape
    nblocks = tp // chunk

    out_shape = [
        jax.ShapeDtypeStruct((tp, rws, hidden), jnp.float32),
        jax.ShapeDtypeStruct((tp, rws, hidden), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((chunk, rws, hidden), lambda i: (i, 0, 0)),
        pl.BlockSpec((chunk, rws, hidden), lambda i: (i, 0, 0)),
    ]
    if with_residuals:
        out_shape.append(jax.ShapeDtypeStruct((tp, rws, gh), jnp.bfloat16))
        out_specs.append(pl.BlockSpec((chunk, rws, gh), lambda i: (i, 0, 0)))

    outs = pl.pallas_call(
        functools.partial(_lstm_fwd_kernel, nrows, chunk, with_residuals),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((chunk, rws, gh), lambda i: (i, 0, 0)),
            pl.BlockSpec((ndir, hidden, gh), lambda i: (0, 0, 0)),
            pl.BlockSpec((ndir, gh), lambda i: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2, rws, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        xp_p.astype(jnp.bfloat16),
        w_hh.astype(jnp.bfloat16),
        b_hh.astype(jnp.float32),
    )
    if with_residuals:
        h_p, c_p, gates = outs
        return h_p[:t], (xp, w_hh, gates, c_p, h_p, t)
    return outs[0][:t], None


def _lstm_scan_fwd(xp, w_hh, b_hh, nrows, interpret):
    h, res = _lstm_fwd(xp, w_hh, b_hh, nrows, interpret, with_residuals=True)
    return h, res


def _lstm_scan_bwd(nrows, interpret, res, dout):
    xp, w_hh, gates, c_p, h_p, t = res
    chunk = _CHUNK
    tp, rws, hidden = h_p.shape
    ndir, _, gh = w_hh.shape
    nblocks = tp // chunk

    dout_p, _ = _pad_time(dout.astype(jnp.float32), chunk)
    cprev = jnp.concatenate(
        [jnp.zeros((1, rws, hidden), jnp.float32), c_p[:-1]], axis=0)
    hprev = jnp.concatenate(
        [jnp.zeros((1, rws, hidden), jnp.float32), h_p[:-1]], axis=0)

    rev = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731 — reversed grid walk
    dgates = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, nrows, chunk),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((chunk, rws, hidden), rev),
            pl.BlockSpec((chunk, rws, gh), rev),
            pl.BlockSpec((chunk, rws, hidden), rev),
            pl.BlockSpec((chunk, rws, hidden), rev),
            pl.BlockSpec((ndir, gh, hidden), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((chunk, rws, gh), rev),
        out_shape=jax.ShapeDtypeStruct((tp, rws, gh), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, rws, hidden), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        dout_p,
        gates,
        c_p,
        cprev,
        jnp.swapaxes(w_hh, 1, 2).astype(jnp.bfloat16),
    )

    dgates = dgates[:t]
    dxp = dgates  # pre-activation grads ARE the xp grads (order i,f,g,o)

    hprev_t = hprev[:t]
    dw = jnp.stack([
        jnp.einsum(
            "trh,trg->hg",
            hprev_t[:, d * nrows : (d + 1) * nrows],
            dgates[:, d * nrows : (d + 1) * nrows],
            preferred_element_type=jnp.float32,
        )
        for d in range(ndir)
    ])
    db = jnp.stack([
        dgates[:, d * nrows : (d + 1) * nrows].sum(axis=(0, 1))
        for d in range(ndir)
    ])
    return dxp, dw.astype(w_hh.dtype), db


lstm_scan_pallas.defvjp(_lstm_scan_fwd, _lstm_scan_bwd)
