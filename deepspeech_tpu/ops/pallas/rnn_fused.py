"""Projection-fused GRU/LSTM layer kernels: x -> recurrence, one kernel.

The original kernels (:mod:`rnn_kernel`) consume precomputed input
projections ``xp = x @ W_ih`` — one big MXU matmul per direction done
outside, whose (T, B, G·H) bf16 streams are written to HBM and immediately
re-read by the kernel. At the default shape that write+read round trip is
~77 MB/layer of pure HBM traffic, and the PERF.md batch sweep shows the
step saturating HBM on exactly these streams (the r4 VERDICT's #1 frontier).

These kernels fuse the projection INTO the recurrence: each grid step DMAs
a (chunk, B, F) block of the raw layer input (a third the bytes of the
(chunk, B, 3H) projections at H=800) and computes the block's projection as
one (chunk·B, F) x (F, G·H) MXU matmul into VMEM scratch — the xp streams
never exist in HBM. W_ih joins W_hh as a VMEM-pinned operand. Everything
else (zero-copy reversed walk for the backward direction, freeze-gate
padding semantics, f32 state, bf16 residual streams) is inherited from
:mod:`rnn_kernel`, and the analytic BACKWARD kernels are reused verbatim:
they run off the stashed gate/h streams, which are unchanged. The backward
additionally produces

* ``dx    = dg_f @ W_ih[0]^T + dg_b @ W_ih[1]^T``
* ``dW_ih[d] = sum_t,b x ⊗ dg_d``

as two big MXU matmuls outside the kernel — the same matmuls XLA's autodiff
generated for the external projection before, so backward traffic is
unchanged while the forward saves the full stream round trip.

VMEM budget: W_ih (D, F, G·H) + W_hh (D, H, G·H) both live in VMEM for the
whole grid. ``fused_layer_fits`` estimates this against the compiler limit;
``ops/rnn.py`` falls back to the unfused kernels when it doesn't fit
(H >= ~1600 with wide first-layer inputs).

Replaces the cuDNN (bi)RNN layer role (reference model.py:82-109).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepspeech_tpu.ops.pallas.rnn_kernel import (
    _FREEZE,
    _chunk_for,
    _compiler_params,
    _gru_bwd,
    _lstm_bwd,
    _pad_time,
    _split_gates,
)

_VMEM_LIMIT = 100 * 1024 * 1024

# Experiment flag: stream the per-timestep h outputs as bf16 instead of
# f32 (state in VMEM stays f32; only the HBM copies round). Saves
# ~45 MB/layer of fwd-write + bwd-read traffic; numerics cost is one
# rounding on the layer output (which the next layer's bf16 cast applies
# anyway) and on the backward's h_prev reads (whose dW consumer is
# already bf16). Default chosen by on-chip A/B — see PERF.md.
_H_BF16 = os.environ.get("DEEPSPEECH_TPU_H_STREAM", "f32") == "bf16"


def fused_layer_fits(f_in: int, hidden: int, gates: int, batch: int,
                     ndir: int = 2, bytes_per=2) -> bool:
    """Rough VMEM feasibility check for pinning W_ih alongside W_hh.

    Counts both weights (pinned single-buffered — their BlockSpec index
    maps are constant), the double-buffered streams of one grid step, and
    the projection scratch, against 85% of the compiler limit. BiGRU-1600
    (BASELINE configs 4/5: ~74 MB estimated) compiles and measures
    slightly FASTER than the unfused kernels on chip, so the threshold
    admits it; the unfused path remains the fallback beyond.
    """
    chunk = _chunk_for(hidden)
    gh = gates * hidden
    weights = ndir * (f_in + hidden) * gh * bytes_per
    streams = 2 * ndir * chunk * batch * (
        f_in * bytes_per          # x block
        + hidden * 4              # h out
        + gh * bytes_per          # gate residuals
        + hidden * bytes_per)     # hn residuals (GRU)
    scratch = ndir * chunk * batch * gh * 4 + ndir * batch * hidden * 4
    return weights + streams + scratch < int(_VMEM_LIMIT * 0.85)


# ---------------------------------------------------------------------------
# GRU forward (projection fused); backward reuses rnn_kernel._gru_bwd
# ---------------------------------------------------------------------------


def _gru_fused_fwd_kernel(chunk, nblocks, bidir, with_res, *refs):
    """One grid step = ``chunk`` timesteps. Projections are computed
    in-kernel: per direction one (chunk·B, F) x (F, 3H) MXU matmul into the
    ``xp`` VMEM scratch, then the per-step gate math runs exactly as in
    rnn_kernel._gru_fwd_kernel.

    inputs:  x_f [, x_b] (chunk, B, F) bf16 — raw layer input, both in
             ORIGINAL time order (the backward direction's blocks walk the
             grid reversed via their BlockSpec),
             wih (D, F, 3H) bf16 (VMEM-pinned), b_ih (D, 3H) f32,
             w (D, H, 3H) bf16 (VMEM-pinned), b_hh (D, 3H) f32
             [, lens (B, 1) f32]
    outputs: h_f [, h_b] (chunk, B, H) f32
             [+ per-direction residuals g (chunk, B, 3H) bf16,
                hn (chunk, B, H) bf16 when training]
    scratch: state (D, B, H) f32, xp (D, chunk*B, 3H) f32
    """
    if bidir:
        x_f, x_b, wih_ref, bi_ref, w_ref, bh_ref, lens_ref = refs[:7]
        rest = refs[7:]
        if with_res:
            h_f, h_b, g_f, g_b, hn_f, hn_b, state, xp = rest
        else:
            h_f, h_b, state, xp = rest
    else:
        x_f, wih_ref, bi_ref, w_ref, bh_ref = refs[:5]
        rest = refs[5:]
        if with_res:
            h_f, g_f, hn_f, state, xp = rest
        else:
            h_f, state, xp = rest
    hidden = w_ref.shape[1]
    b = x_f.shape[1]
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    # block projections: one MXU matmul per direction, amortized over the
    # chunk's timesteps (the per-step recurrence dots are latency-bound at
    # M = B, so the M = chunk·B projection rides the idle MXU capacity)
    xf2 = x_f[:].reshape(chunk * b, x_f.shape[2])
    xp[0] = jnp.dot(xf2, wih_ref[0], preferred_element_type=jnp.float32)
    if bidir:
        xb2 = x_b[:].reshape(chunk * b, x_b.shape[2])
        xp[1] = jnp.dot(xb2, wih_ref[1], preferred_element_type=jnp.float32)

    def gates(xg, hp, h_prev, keep):
        xr, xz, xn = _split_gates(xg, hidden)
        if keep is not None:  # freeze: z -> 1 where keep == 0
            xz = xz * keep + _FREEZE * (1.0 - keep)
        hr, hz, hn = _split_gates(hp, hidden)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h_prev
        return h_new, r, z, n, hn

    def stash(g_ref, hn_ref, jj, r, z, n, hn):
        g_ref[jj, :, :hidden] = r.astype(g_ref.dtype)
        g_ref[jj, :, hidden : 2 * hidden] = z.astype(g_ref.dtype)
        g_ref[jj, :, 2 * hidden :] = n.astype(g_ref.dtype)
        hn_ref[jj] = hn.astype(hn_ref.dtype)

    for j in range(chunk):
        if not bidir:
            h_prev = state[0]
            xg = xp[0, j * b : (j + 1) * b] + bi_ref[0][None, :]
            hp = jnp.dot(h_prev.astype(w_ref.dtype), w_ref[0],
                         preferred_element_type=jnp.float32) \
                + bh_ref[0][None, :]
            h_new, r, z, n, hn = gates(xg, hp, h_prev, None)
            state[0] = h_new
            h_f[j] = h_new.astype(h_f.dtype)
            if with_res:
                stash(g_f, hn_f, j, r, z, n, hn)
            continue
        jj = chunk - 1 - j  # backward direction: last timestep first
        hf_prev, hb_prev = state[0], state[1]
        hp_f = jnp.dot(hf_prev.astype(w_ref.dtype), w_ref[0],
                       preferred_element_type=jnp.float32) \
            + bh_ref[0][None, :]
        hp_b = jnp.dot(hb_prev.astype(w_ref.dtype), w_ref[1],
                       preferred_element_type=jnp.float32) \
            + bh_ref[1][None, :]
        xg_f = xp[0, j * b : (j + 1) * b] + bi_ref[0][None, :]
        xg_b = xp[1, jj * b : (jj + 1) * b] + bi_ref[1][None, :]
        t_b = ((nblocks - 1 - blk) * chunk + jj).astype(jnp.float32)
        keep_b = (lens_ref[:, :] > t_b).astype(jnp.float32)  # (B, 1)
        h_new, r, z, n, hn = gates(xg_f, hp_f, hf_prev, None)
        state[0] = h_new
        h_f[j] = h_new.astype(h_f.dtype)
        if with_res:
            stash(g_f, hn_f, j, r, z, n, hn)
        h_new, r, z, n, hn = gates(xg_b, hp_b, hb_prev, keep_b)
        state[1] = h_new
        h_b[jj] = h_new.astype(h_b.dtype)
        if with_res:
            stash(g_b, hn_b, jj, r, z, n, hn)


def _gru_fused_fwd(x, w_ih, b_ih, w_hh, b_hh, lens, interpret, with_res):
    """Shared fused forward; ``lens`` is None for the unidirectional case.
    x: (T, B, F) in the kernel stream dtype (bf16 on TPU, f32 interpret)."""
    ndir, hidden, gh = w_hh.shape
    bidir = ndir == 2
    chunk = _chunk_for(hidden)
    x, t = _pad_time(x, chunk)
    tp, b, f_in = x.shape
    nblocks = tp // chunk
    fwd = lambda i: (i, 0, 0)  # noqa: E731
    rev = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731

    xdt = x.dtype
    wdt = xdt if xdt == jnp.float32 else jnp.bfloat16
    hdt = jnp.bfloat16 if (_H_BF16 and xdt != jnp.float32) else jnp.float32
    in_specs = [pl.BlockSpec((chunk, b, f_in), fwd)]
    ops = [x]
    if bidir:
        # same array, reversed block walk — the only extra cost of
        # bidirectionality is the second (chunk, B, F) DMA stream
        in_specs.append(pl.BlockSpec((chunk, b, f_in), rev))
        ops.append(x)
    in_specs += [
        pl.BlockSpec((ndir, f_in, gh), lambda i: (0, 0, 0)),
        pl.BlockSpec((ndir, gh), lambda i: (0, 0)),
        pl.BlockSpec((ndir, hidden, gh), lambda i: (0, 0, 0)),
        pl.BlockSpec((ndir, gh), lambda i: (0, 0)),
    ]
    ops += [w_ih.astype(wdt), b_ih.astype(jnp.float32),
            w_hh.astype(wdt), b_hh.astype(jnp.float32)]
    if bidir:
        in_specs.append(pl.BlockSpec((b, 1), lambda i: (0, 0)))
        ops.append(lens.astype(jnp.float32))

    h_sds = jax.ShapeDtypeStruct((tp, b, hidden), hdt)
    out_shape = [h_sds] * ndir
    out_specs = [pl.BlockSpec((chunk, b, hidden), fwd)]
    if bidir:
        out_specs.append(pl.BlockSpec((chunk, b, hidden), rev))
    if with_res:
        g_sds = jax.ShapeDtypeStruct((tp, b, gh), xdt)
        hn_sds = jax.ShapeDtypeStruct((tp, b, hidden), xdt)
        if bidir:
            out_shape += [g_sds, g_sds, hn_sds, hn_sds]
            out_specs += [pl.BlockSpec((chunk, b, gh), fwd),
                          pl.BlockSpec((chunk, b, gh), rev),
                          pl.BlockSpec((chunk, b, hidden), fwd),
                          pl.BlockSpec((chunk, b, hidden), rev)]
        else:
            out_shape += [g_sds, hn_sds]
            out_specs += [pl.BlockSpec((chunk, b, gh), fwd),
                          pl.BlockSpec((chunk, b, hidden), fwd)]

    outs = pl.pallas_call(
        functools.partial(_gru_fused_fwd_kernel, chunk, nblocks, bidir,
                          with_res),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((ndir, b, hidden), jnp.float32),
                        pltpu.VMEM((ndir, chunk * b, gh), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*ops)
    if with_res:
        return outs, t
    return outs[:ndir], t


def _proj_grads(x, w_ih, dgs):
    """dx and dW_ih from the kernel's pre-activation gate grads — the same
    two MXU matmuls XLA's autodiff emitted for the external projection."""
    wdt = w_ih.dtype
    dx = None
    dws = []
    for d, dg in enumerate(dgs):
        part = jnp.einsum("tbg,fg->tbf", dg, w_ih[d],
                          preferred_element_type=jnp.float32)
        dx = part if dx is None else dx + part
        dws.append(jnp.einsum("tbf,tbg->fg", x, dg,
                              preferred_element_type=jnp.float32))
    return dx.astype(x.dtype), jnp.stack(dws).astype(wdt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def bigru_layer_pallas(x, w_ih, b_ih, w_hh, b_hh, lens, interpret=False):
    """Bidirectional GRU LAYER (projection + recurrence) as one kernel.

    x: (T, B, F) raw layer input in ORIGINAL time order (bf16 on TPU, f32
        under interpret); w_ih: (2, F, 3H); b_ih/b_hh: (2, 3H) f32;
    w_hh: (2, H, 3H); lens: (B, 1) f32 valid lengths.
    Returns (h_f, h_b) like rnn_kernel.bigru_scan_pallas — h_b exactly zero
    at padded steps, h_f garbage there; the CALLER must mask the outputs
    (and thereby the output grads, which the freeze trick requires to be
    zero at padded steps).
    """
    outs, t = _gru_fused_fwd(x, w_ih, b_ih, w_hh, b_hh, lens, interpret,
                             False)
    return outs[0][:t], outs[1][:t]


def _bigru_layer_fwd(x, w_ih, b_ih, w_hh, b_hh, lens, interpret):
    outs, t = _gru_fused_fwd(x, w_ih, b_ih, w_hh, b_hh, lens, interpret,
                             True)
    return (outs[0][:t], outs[1][:t]), (x, w_ih, w_hh, t, outs, lens)


def _bigru_layer_bwd(interpret, res, douts):
    x, w_ih, w_hh, t, outs, lens = res
    dg_f, dg_b, dbi, dw_hh, dbh = _gru_bwd((w_hh, t, outs), douts, interpret)
    dx, dw_ih = _proj_grads(x, w_ih, (dg_f, dg_b))
    return dx, dw_ih, dbi, dw_hh, dbh, jnp.zeros_like(lens)


bigru_layer_pallas.defvjp(_bigru_layer_fwd, _bigru_layer_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gru_layer_pallas(x, w_ih, b_ih, w_hh, b_hh, interpret=False):
    """Unidirectional GRU layer (weights carry a leading D=1 axis)."""
    outs, t = _gru_fused_fwd(x, w_ih, b_ih, w_hh, b_hh, None, interpret,
                             False)
    return outs[0][:t]


def _gru_layer_fwd(x, w_ih, b_ih, w_hh, b_hh, interpret):
    outs, t = _gru_fused_fwd(x, w_ih, b_ih, w_hh, b_hh, None, interpret,
                             True)
    return outs[0][:t], (x, w_ih, w_hh, t, outs)


def _gru_layer_bwd(interpret, res, dout):
    x, w_ih, w_hh, t, outs = res
    dg_f, _, dbi, dw_hh, dbh = _gru_bwd((w_hh, t, outs), (dout,), interpret)
    dx, dw_ih = _proj_grads(x, w_ih, (dg_f,))
    return dx, dw_ih, dbi, dw_hh, dbh


gru_layer_pallas.defvjp(_gru_layer_fwd, _gru_layer_bwd)


# ---------------------------------------------------------------------------
# LSTM forward (projection fused); backward reuses rnn_kernel._lstm_bwd
# ---------------------------------------------------------------------------


def _lstm_fused_fwd_kernel(chunk, nblocks, bidir, with_res, *refs):
    """LSTM twin of :func:`_gru_fused_fwd_kernel` (G = 4, torch gate order
    i,f,g,o; freeze i->0, f->1 at padded steps of the backward direction).

    scratch: state (2*D, B, H) f32 ([d]=h, [D+d]=c), xp (D, chunk*B, 4H) f32
    """
    if bidir:
        x_f, x_b, wih_ref, bi_ref, w_ref, bh_ref, lens_ref = refs[:7]
        rest = refs[7:]
        if with_res:
            h_f, c_f, h_b, c_b, g_f, g_b, state, xp = rest
        else:
            h_f, c_f, h_b, c_b, state, xp = rest
    else:
        x_f, wih_ref, bi_ref, w_ref, bh_ref = refs[:5]
        rest = refs[5:]
        if with_res:
            h_f, c_f, g_f, state, xp = rest
        else:
            h_f, c_f, state, xp = rest
    ndir = 2 if bidir else 1
    hidden = w_ref.shape[1]
    b = x_f.shape[1]
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    xf2 = x_f[:].reshape(chunk * b, x_f.shape[2])
    xp[0] = jnp.dot(xf2, wih_ref[0], preferred_element_type=jnp.float32)
    if bidir:
        xb2 = x_b[:].reshape(chunk * b, x_b.shape[2])
        xp[1] = jnp.dot(xb2, wih_ref[1], preferred_element_type=jnp.float32)

    def step(d, j, keep):
        h_prev = state[d]
        c_prev = state[ndir + d]
        gates = (
            xp[d, j * b : (j + 1) * b] + bi_ref[d][None, :]
            + jnp.dot(h_prev.astype(w_ref.dtype), w_ref[d],
                      preferred_element_type=jnp.float32)
            + bh_ref[d][None, :]
        )
        xi = gates[:, :hidden]
        xf = gates[:, hidden : 2 * hidden]
        if keep is not None:  # freeze: i -> 0, f -> 1 where keep == 0
            xi = xi * keep - _FREEZE * (1.0 - keep)
            xf = xf * keep + _FREEZE * (1.0 - keep)
        i = jax.nn.sigmoid(xi)
        f = jax.nn.sigmoid(xf)
        g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden :])
        c_new = f * c_prev + i * g
        h_new = o * jnp.tanh(c_new)
        state[d] = h_new
        state[ndir + d] = c_new
        return h_new, c_new, i, f, g, o

    def stash(g_ref, jj, i, f, g, o):
        g_ref[jj, :, :hidden] = i.astype(g_ref.dtype)
        g_ref[jj, :, hidden : 2 * hidden] = f.astype(g_ref.dtype)
        g_ref[jj, :, 2 * hidden : 3 * hidden] = g.astype(g_ref.dtype)
        g_ref[jj, :, 3 * hidden :] = o.astype(g_ref.dtype)

    for j in range(chunk):
        h_new, c_new, i, f, g, o = step(0, j, None)
        h_f[j] = h_new.astype(h_f.dtype)
        c_f[j] = c_new
        if with_res:
            stash(g_f, j, i, f, g, o)
        if bidir:
            jj = chunk - 1 - j
            t_b = ((nblocks - 1 - blk) * chunk + jj).astype(jnp.float32)
            keep = (lens_ref[:, :] > t_b).astype(jnp.float32)
            h_new, c_new, i, f, g, o = step(1, jj, keep)
            h_b[jj] = h_new.astype(h_b.dtype)
            c_b[jj] = c_new
            if with_res:
                stash(g_b, jj, i, f, g, o)


def _lstm_fused_fwd(x, w_ih, b_ih, w_hh, b_hh, lens, interpret, with_res):
    ndir, hidden, gh = w_hh.shape
    bidir = ndir == 2
    chunk = _chunk_for(hidden)
    x, t = _pad_time(x, chunk)
    tp, b, f_in = x.shape
    nblocks = tp // chunk
    fwd = lambda i: (i, 0, 0)  # noqa: E731
    rev = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731

    xdt = x.dtype
    wdt = xdt if xdt == jnp.float32 else jnp.bfloat16
    hdt = jnp.bfloat16 if (_H_BF16 and xdt != jnp.float32) else jnp.float32
    in_specs = [pl.BlockSpec((chunk, b, f_in), fwd)]
    ops = [x]
    if bidir:
        in_specs.append(pl.BlockSpec((chunk, b, f_in), rev))
        ops.append(x)
    in_specs += [
        pl.BlockSpec((ndir, f_in, gh), lambda i: (0, 0, 0)),
        pl.BlockSpec((ndir, gh), lambda i: (0, 0)),
        pl.BlockSpec((ndir, hidden, gh), lambda i: (0, 0, 0)),
        pl.BlockSpec((ndir, gh), lambda i: (0, 0)),
    ]
    ops += [w_ih.astype(wdt), b_ih.astype(jnp.float32),
            w_hh.astype(wdt), b_hh.astype(jnp.float32)]
    if bidir:
        in_specs.append(pl.BlockSpec((b, 1), lambda i: (0, 0)))
        ops.append(lens.astype(jnp.float32))

    h_sds = jax.ShapeDtypeStruct((tp, b, hidden), hdt)
    c_sds = jax.ShapeDtypeStruct((tp, b, hidden), jnp.float32)
    h_spec_f = pl.BlockSpec((chunk, b, hidden), fwd)
    h_spec_r = pl.BlockSpec((chunk, b, hidden), rev)
    if bidir:
        out_shape = [h_sds, c_sds, h_sds, c_sds]
        out_specs = [h_spec_f, h_spec_f, h_spec_r, h_spec_r]
    else:
        out_shape = [h_sds, c_sds]
        out_specs = [h_spec_f, h_spec_f]
    if with_res:
        g_sds = jax.ShapeDtypeStruct((tp, b, gh), xdt)
        out_shape += [g_sds] * ndir
        out_specs += [pl.BlockSpec((chunk, b, gh), fwd)]
        if bidir:
            out_specs += [pl.BlockSpec((chunk, b, gh), rev)]

    outs = pl.pallas_call(
        functools.partial(_lstm_fused_fwd_kernel, chunk, nblocks, bidir,
                          with_res),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2 * ndir, b, hidden), jnp.float32),
                        pltpu.VMEM((ndir, chunk * b, gh), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*ops)
    return outs, t


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def bilstm_layer_pallas(x, w_ih, b_ih, w_hh, b_hh, lens, interpret=False):
    """Bidirectional LSTM layer — same contract as
    :func:`bigru_layer_pallas` with G=4 (torch gate order i,f,g,o)."""
    outs, t = _lstm_fused_fwd(x, w_ih, b_ih, w_hh, b_hh, lens, interpret,
                              False)
    return outs[0][:t], outs[2][:t]


def _bilstm_layer_fwd(x, w_ih, b_ih, w_hh, b_hh, lens, interpret):
    outs, t = _lstm_fused_fwd(x, w_ih, b_ih, w_hh, b_hh, lens, interpret,
                              True)
    return (outs[0][:t], outs[2][:t]), (x, w_ih, w_hh, t, outs, lens)


def _bilstm_layer_bwd(interpret, res, douts):
    x, w_ih, w_hh, t, outs, lens = res
    dg_f, dg_b, dbi, dw_hh, dbh = _lstm_bwd((w_hh, t, outs), douts,
                                            interpret)
    dx, dw_ih = _proj_grads(x, w_ih, (dg_f, dg_b))
    return dx, dw_ih, dbi, dw_hh, dbh, jnp.zeros_like(lens)


bilstm_layer_pallas.defvjp(_bilstm_layer_fwd, _bilstm_layer_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def lstm_layer_pallas(x, w_ih, b_ih, w_hh, b_hh, interpret=False):
    """Unidirectional LSTM layer (weights carry a leading D=1 axis)."""
    outs, t = _lstm_fused_fwd(x, w_ih, b_ih, w_hh, b_hh, None, interpret,
                              False)
    return outs[0][:t]


def _lstm_layer_fwd(x, w_ih, b_ih, w_hh, b_hh, interpret):
    outs, t = _lstm_fused_fwd(x, w_ih, b_ih, w_hh, b_hh, None, interpret,
                              True)
    return outs[0][:t], (x, w_ih, w_hh, t, outs)


def _lstm_layer_bwd(interpret, res, dout):
    x, w_ih, w_hh, t, outs = res
    dg_f, _, dbi, dw_hh, dbh = _lstm_bwd((w_hh, t, outs), (dout,), interpret)
    dx, dw_ih = _proj_grads(x, w_ih, (dg_f,))
    return dx, dw_ih, dbi, dw_hh, dbh


lstm_layer_pallas.defvjp(_lstm_layer_fwd, _lstm_layer_bwd)
