"""Fused GRU/LSTM time-scans as Pallas TPU kernels.

TPU-native replacement for the recurrent half of a cuDNN (bi)RNN layer
(reference model.py:82-109 wraps ``nn.GRU``/``nn.LSTM``).  The input
projection ``x @ W_ih`` for all timesteps is one large MXU matmul done
*outside* the kernel (see ``ops/rnn.py``); these kernels run only the
inherently sequential recurrence, e.g. for the GRU

    r_t = sigmoid(xp_r + b_ir + h W_hr + b_hr)
    z_t = sigmoid(xp_z + b_iz + h W_hz + b_hz)
    n_t = tanh  (xp_n + b_in + r_t * (h W_hn + b_hn))
    h_t = (1 - z_t) * n_t + z_t * h_{t-1}

with torch gate order/semantics, both directions of a bidirectional layer
fused into one kernel.

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

Zero-copy bidirectionality.  The backward direction is NOT fed a
time-flipped copy of the input: its blocks simply walk the grid in reverse
via their BlockSpec index maps (block ``nblocks-1-i`` at grid step ``i``,
timesteps processed last-first inside the block), and its outputs are
written back the same way — so the layer needs no ``jnp.flip`` / gather on
either the (T,B,3H) projections or the (T,B,H) outputs.  In that walk each
sample's padding (t >= length) comes FIRST; a freeze mask (applied to the
pre-activation update gate inside the kernel, from the lengths operand)
carries the zero initial state unchanged through it, reproducing
``pack_padded_sequence`` semantics (reference model.py:103-107):
``sigmoid(40) == 1`` exactly in f32, so the GRU update gate carries
h (= 0) unchanged, and the LSTM forget/input gates carry c (= 0) unchanged.
The analytic backward kernels see z==1 (f==1, i==0) at those steps and emit
exactly-zero gate grads; the incoming dL/dh at padded steps must be zero,
which the caller guarantees by masking the layer output (ops/rnn.py).

Other kernel-level traffic savings vs. a straightforward lowering:
* both bias adds happen in-kernel (f32), so the projections stream as
  raw bf16 matmul outputs — XLA fuses the convert into the projection
  matmul epilogue and the f32 sums are never materialized in HBM;
* gate grads stream OUT as bf16 (their consumers — the dW/dx matmuls — run
  bf16 on the MXU anyway), halving the backward HBM write traffic;
* bias gradients are accumulated inside the backward kernel (VMEM
  accumulators, written once at the last grid step), replacing XLA's
  full-tensor reductions over the (T,B,G·H) grad streams;
* the h_{t-1}/c_{t-1} streams are reconstructed from the current +
  adjacent grid block instead of a materialized shifted copy.

The kernels carry state in VMEM scratch across grid steps (the TPU grid is
sequential), processing CHUNK timesteps per grid step with fully unrolled
static indexing.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK_ENV = os.environ.get("DEEPSPEECH_TPU_GRU_CHUNK")


def _chunk_for(hidden: int) -> int:
    """Grid timesteps per kernel invocation (DEEPSPEECH_TPU_GRU_CHUNK
    overrides). Swept on-chip: 8 wins at the default 800-wide config; at
    1600 (BASELINE configs 4/5) chunk 4 measures ~3.5% faster (1692 ->
    1752 audio-s/s, PERF.md "BiGRU-1600") and 16 fails to compile on the
    current remote AOT toolchain."""
    if _CHUNK_ENV:
        return int(_CHUNK_ENV)
    return 4 if hidden >= 1280 else 8

# Pre-activation magnitude that saturates sigmoid exactly in f32
# (sigmoid(40) == 1.0, sigmoid(-40) == 4e-18 ~ 0).
_FREEZE = 40.0


def pallas_supported() -> bool:
    """True when the Pallas RNN path should be used by ``impl="auto"``."""
    if os.environ.get("DEEPSPEECH_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing never throws today
        return False


def _split_gates(a, h):
    return a[..., :h], a[..., h : 2 * h], a[..., 2 * h :]


def _pad_time(a, chunk, axis=0):
    t = a.shape[axis]
    pad = (-t) % chunk
    if pad:
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, pad)
        a = jnp.pad(a, widths)
    return a, t


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# ---------------------------------------------------------------------------
# GRU
# ---------------------------------------------------------------------------


def _gru_fwd_kernel(chunk, nblocks, bidir, with_res, *refs):
    """One grid step = ``chunk`` timesteps; the forward direction processes
    block ``i`` first-to-last while the backward direction processes block
    ``nblocks-1-i`` last-to-first (its BlockSpecs walk the grid reversed).

    inputs:  xp_f [, xp_b] (chunk, B, 3H) bf16 — raw x@W_ih (no bias),
             b_ih (D, 3H) f32, w (D, H, 3H) bf16 (VMEM-resident),
             b_hh (D, 3H) f32 [, lens (B, 1) f32]
    outputs: h_f [, h_b] (chunk, B, H) f32
             [+ per-direction residuals g (chunk, B, 3H) bf16,
                hn (chunk, B, H) bf16 when training]
    scratch: state (D, B, H) f32
    """
    if bidir:
        xp_f, xp_b, bi_ref, w_ref, bh_ref, lens_ref = refs[:6]
        rest = refs[6:]
        if with_res:
            h_f, h_b, g_f, g_b, hn_f, hn_b, state = rest
        else:
            h_f, h_b, state = rest
    else:
        xp_f, bi_ref, w_ref, bh_ref = refs[:4]
        rest = refs[4:]
        if with_res:
            h_f, g_f, hn_f, state = rest
        else:
            h_f, state = rest
    hidden = w_ref.shape[1]
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    def gates(xg, hp, h_prev, keep):
        """Shared gate math; operands are (B, ·) or (D, B, ·) — the bidir
        path stacks both directions so every VPU op runs once on doubled
        rows instead of twice on M=20 (fewer issues, better lane fill)."""
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
            xg = xp_f[j].astype(jnp.float32) + bi_ref[0][None, :]
            hp = jnp.dot(h_prev.astype(w_ref.dtype), w_ref[0],
                         preferred_element_type=jnp.float32) \
                + bh_ref[0][None, :]
            h_new, r, z, n, hn = gates(xg, hp, h_prev, None)
            state[0] = h_new
            h_f[j] = h_new
            if with_res:
                stash(g_f, hn_f, j, r, z, n, hn)
            continue
        # bidirectional: the two recurrent dots are data-independent, so
        # issue them back-to-back (the MXU pipelines the second against the
        # first's drain) before either direction's gate chain runs — hiding
        # part of the serial per-step latency (the step is latency-bound at
        # M=batch, micro-benched on chip; a fully stacked (2, B, ·) gate
        # variant was SLOWER due to cross-sublane relayouts, see PERF.md)
        jj = chunk - 1 - j  # backward direction: last timestep first
        hf_prev, hb_prev = state[0], state[1]
        hp_f = jnp.dot(hf_prev.astype(w_ref.dtype), w_ref[0],
                       preferred_element_type=jnp.float32) \
            + bh_ref[0][None, :]
        hp_b = jnp.dot(hb_prev.astype(w_ref.dtype), w_ref[1],
                       preferred_element_type=jnp.float32) \
            + bh_ref[1][None, :]
        xg_f = xp_f[j].astype(jnp.float32) + bi_ref[0][None, :]
        xg_b = xp_b[jj].astype(jnp.float32) + bi_ref[1][None, :]
        t_b = ((nblocks - 1 - blk) * chunk + jj).astype(jnp.float32)
        keep_b = (lens_ref[:, :] > t_b).astype(jnp.float32)  # (B, 1)
        h_new, r, z, n, hn = gates(xg_f, hp_f, hf_prev, None)
        state[0] = h_new
        h_f[j] = h_new
        if with_res:
            stash(g_f, hn_f, j, r, z, n, hn)
        h_new, r, z, n, hn = gates(xg_b, hp_b, hb_prev, keep_b)
        state[1] = h_new
        h_b[jj] = h_new
        if with_res:
            stash(g_b, hn_b, jj, r, z, n, hn)


def _gru_bwd_kernel(chunk, nblocks, bidir, *refs):
    """Analytic GRU backward. The forward direction's grads walk time
    reversed (block ``nblocks-1-i``, last timestep first); the backward
    direction's grads walk time forward (block ``i``, first timestep first).

    per-direction inputs: dout (chunk, B, H) f32, g (chunk, B, 3H) bf16,
      hn (chunk, B, H) bf16, h cur block (chunk, B, H) f32, h adjacent block
      (the time-previous block for that direction's recurrence) —
      plus shared wt (D, 3H, H) bf16.
    per-direction outputs: dg (chunk, B, 3H) bf16 — pre-activation gate
      grads (== the xp cotangent), dnh (chunk, B, H) bf16 — dn_pre * r (the
      n-column of the hidden-projection grad, needed for dW_hh/db_hh),
      hp (chunk, B, H) bf16 — the h_{prev} stream re-emitted time-aligned
      with dg so the dW_hh einsum outside needs no shifted-slice relayout;
      shared outputs dbi, dbh (D, 3H) f32 — bias grads, accumulated across
      the whole grid and written at the last step.
    scratch: acc_i, acc_h (D, B, 3H) f32 per-row bias accumulators,
             state (D, B, H) f32 — dh carried to the next processed step.
    """
    if bidir:
        (dout_f, dout_b, g_f, g_b, hnr_f, hnr_b, hc_f, ha_f, hc_b, ha_b,
         wt_ref) = refs[:11]
        dg_f, dg_b, dnh_f, dnh_b, hp_f, hp_b, dbi_ref, dbh_ref = refs[11:19]
        acc_i, acc_h, state = refs[19:]
    else:
        dout_f, g_f, hnr_f, hc_f, ha_f, wt_ref = refs[:6]
        dg_f, dnh_f, hp_f, dbi_ref, dbh_ref = refs[6:11]
        acc_i, acc_h, state = refs[11:]
        hp_b = None
    hidden = wt_ref.shape[2]
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        state[:] = jnp.zeros_like(state)
        acc_i[:] = jnp.zeros_like(acc_i)
        acc_h[:] = jnp.zeros_like(acc_h)
        dbi_ref[:] = jnp.zeros_like(dbi_ref)
        dbh_ref[:] = jnp.zeros_like(dbh_ref)

    def step(d, k, dh_in, gv, hnv, h_prev, dg_ref, dnh_ref, hp_ref):
        # NOTE: stores below index dg_ref[k, ...] directly (static k) — a
        # `.at[k]` ref view would lower to tpu.memref_slice, which requires
        # tile-aligned slice shapes (3H = 2400 is not 128-aligned).
        hp_ref[k] = h_prev.astype(hp_ref.dtype)
        dh_tot = dh_in + state[d]
        r, z, n = _split_gates(gv.astype(jnp.float32), hidden)
        hn = hnv.astype(jnp.float32)
        dn_pre = dh_tot * (1.0 - z) * (1.0 - n * n)
        dz_pre = dh_tot * (h_prev - n) * z * (1.0 - z)
        dr_pre = dn_pre * hn * r * (1.0 - r)
        dnh = dn_pre * r
        dg_ref[k, :, :hidden] = dr_pre.astype(dg_ref.dtype)
        dg_ref[k, :, hidden : 2 * hidden] = dz_pre.astype(dg_ref.dtype)
        dg_ref[k, :, 2 * hidden :] = dn_pre.astype(dg_ref.dtype)
        dnh_ref[k] = dnh.astype(dnh_ref.dtype)
        acc_i[d, :, :hidden] += dr_pre
        acc_i[d, :, hidden : 2 * hidden] += dz_pre
        acc_i[d, :, 2 * hidden :] += dn_pre
        acc_h[d, :, :hidden] += dr_pre
        acc_h[d, :, hidden : 2 * hidden] += dz_pre
        acc_h[d, :, 2 * hidden :] += dnh
        dhp = jnp.concatenate([dr_pre, dz_pre, dnh], axis=-1)
        state[d] = dh_tot * z + jnp.dot(
            dhp.astype(wt_ref.dtype), wt_ref[d],
            preferred_element_type=jnp.float32)

    for j in range(chunk):
        jr = chunk - 1 - j  # forward direction's grads: last timestep first
        if jr > 0:
            hprev = hc_f[jr - 1]
        else:
            blk_f = nblocks - 1 - blk  # time-block the fwd stream is on
            hprev = ha_f[chunk - 1] * (blk_f > 0).astype(jnp.float32)
        step(0, jr, dout_f[jr], g_f[jr], hnr_f[jr], hprev, dg_f, dnh_f, hp_f)
        if bidir:
            # backward direction's recurrence ran t descending, so its grads
            # walk t ascending; its h_{prev} is h_b at t+1.
            if j < chunk - 1:
                hprev = hc_b[j + 1]
            else:
                hprev = ha_b[0] * (blk < nblocks - 1).astype(jnp.float32)
            step(1, j, dout_b[j], g_b[j], hnr_b[j], hprev, dg_b, dnh_b, hp_b)

    @pl.when(blk == nblocks - 1)
    def _():
        dbi_ref[:] = jnp.sum(acc_i[:], axis=1)
        dbh_ref[:] = jnp.sum(acc_h[:], axis=1)


def _gru_fwd(xp_f, xp_b, b_ih, w_hh, b_hh, lens, interpret, with_res):
    """Shared forward: xp_b/lens are None for the unidirectional case."""
    ndir, hidden, _ = w_hh.shape
    chunk = _chunk_for(hidden)
    bidir = xp_b is not None
    xp_f, t = _pad_time(xp_f, chunk)
    tp, b, gh = xp_f.shape
    nblocks = tp // chunk
    fwd = lambda i: (i, 0, 0)  # noqa: E731
    rev = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731

    xdt = xp_f.dtype
    in_specs = [pl.BlockSpec((chunk, b, gh), fwd)]
    ops = [xp_f]
    if bidir:
        xp_b, _ = _pad_time(xp_b, chunk)
        in_specs.append(pl.BlockSpec((chunk, b, gh), rev))
        ops.append(xp_b)
    in_specs += [
        pl.BlockSpec((ndir, gh), lambda i: (0, 0)),
        pl.BlockSpec((ndir, hidden, gh), lambda i: (0, 0, 0)),
        pl.BlockSpec((ndir, gh), lambda i: (0, 0)),
    ]
    wdt = xdt if xdt == jnp.float32 else jnp.bfloat16
    ops += [b_ih.astype(jnp.float32), w_hh.astype(wdt),
            b_hh.astype(jnp.float32)]
    if bidir:
        in_specs.append(pl.BlockSpec((b, 1), lambda i: (0, 0)))
        ops.append(lens.astype(jnp.float32))

    h_sds = jax.ShapeDtypeStruct((tp, b, hidden), jnp.float32)
    out_shape = [h_sds] * (2 if bidir else 1)
    out_specs = [pl.BlockSpec((chunk, b, hidden), fwd)]
    if bidir:
        out_specs.append(pl.BlockSpec((chunk, b, hidden), rev))
    if with_res:
        # residuals (and hence the xp cotangent dtype) mirror the xp stream
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
        functools.partial(_gru_fwd_kernel, chunk, nblocks, bidir, with_res),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((ndir, b, hidden), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*ops)
    if with_res:
        return outs, t
    return outs[: (2 if bidir else 1)], t


def _gru_bwd(res, douts, interpret):
    w_hh, t, outs = res
    bidir = len(douts) == 2
    ndir, hidden, gh = w_hh.shape
    chunk = _chunk_for(hidden)
    if bidir:
        h_f, h_b, g_f, g_b, hn_f, hn_b = outs
    else:
        (h_f, g_f, hn_f), (h_b, g_b, hn_b) = outs, (None, None, None)
    tp, b, _ = h_f.shape
    nblocks = tp // chunk
    fwd = lambda i: (i, 0, 0)  # noqa: E731
    rev = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731
    # the fwd stream's grads walk blocks in reverse; its h_{t-1} for the
    # first in-block timestep lives in the time-PREVIOUS block.
    reva = lambda i: (jnp.maximum(nblocks - 2 - i, 0), 0, 0)  # noqa: E731
    fwda = lambda i: (jnp.minimum(i + 1, nblocks - 1), 0, 0)  # noqa: E731

    gdt = g_f.dtype  # == the xp stream dtype == the xp cotangent dtype
    wdt = jnp.float32 if gdt == jnp.float32 else jnp.bfloat16
    dout_f, _ = _pad_time(douts[0].astype(jnp.float32), chunk)
    h_spec, g_spec = (pl.BlockSpec((chunk, b, hidden), rev),
                      pl.BlockSpec((chunk, b, gh), rev))
    if bidir:
        dout_b, _ = _pad_time(douts[1].astype(jnp.float32), chunk)
        in_specs = [
            h_spec, pl.BlockSpec((chunk, b, hidden), fwd),  # dout f/b
            g_spec, pl.BlockSpec((chunk, b, gh), fwd),      # gates f/b
            h_spec, pl.BlockSpec((chunk, b, hidden), fwd),  # hn f/b
            h_spec, pl.BlockSpec((chunk, b, hidden), reva),  # h_f cur/adj
            pl.BlockSpec((chunk, b, hidden), fwd),          # h_b cur
            pl.BlockSpec((chunk, b, hidden), fwda),         # h_b adj
            pl.BlockSpec((ndir, gh, hidden), lambda i: (0, 0, 0)),
        ]
        ops = [dout_f, dout_b, g_f, g_b, hn_f, hn_b, h_f, h_f, h_b, h_b,
               jnp.swapaxes(w_hh, 1, 2).astype(wdt)]
        out_shape = [
            jax.ShapeDtypeStruct((tp, b, gh), gdt),
            jax.ShapeDtypeStruct((tp, b, gh), gdt),
            jax.ShapeDtypeStruct((tp, b, hidden), gdt),
            jax.ShapeDtypeStruct((tp, b, hidden), gdt),
            jax.ShapeDtypeStruct((tp, b, hidden), gdt),
            jax.ShapeDtypeStruct((tp, b, hidden), gdt),
            jax.ShapeDtypeStruct((ndir, gh), jnp.float32),
            jax.ShapeDtypeStruct((ndir, gh), jnp.float32),
        ]
        out_specs = [
            g_spec, pl.BlockSpec((chunk, b, gh), fwd),
            pl.BlockSpec((chunk, b, hidden), rev),
            pl.BlockSpec((chunk, b, hidden), fwd),
            pl.BlockSpec((chunk, b, hidden), rev),
            pl.BlockSpec((chunk, b, hidden), fwd),
            pl.BlockSpec((ndir, gh), lambda i: (0, 0)),
            pl.BlockSpec((ndir, gh), lambda i: (0, 0)),
        ]
    else:
        in_specs = [
            h_spec, g_spec, h_spec,
            h_spec, pl.BlockSpec((chunk, b, hidden), reva),
            pl.BlockSpec((ndir, gh, hidden), lambda i: (0, 0, 0)),
        ]
        ops = [dout_f, g_f, hn_f, h_f, h_f,
               jnp.swapaxes(w_hh, 1, 2).astype(wdt)]
        out_shape = [
            jax.ShapeDtypeStruct((tp, b, gh), gdt),
            jax.ShapeDtypeStruct((tp, b, hidden), gdt),
            jax.ShapeDtypeStruct((tp, b, hidden), gdt),
            jax.ShapeDtypeStruct((ndir, gh), jnp.float32),
            jax.ShapeDtypeStruct((ndir, gh), jnp.float32),
        ]
        out_specs = [
            g_spec, pl.BlockSpec((chunk, b, hidden), rev),
            pl.BlockSpec((chunk, b, hidden), rev),
            pl.BlockSpec((ndir, gh), lambda i: (0, 0)),
            pl.BlockSpec((ndir, gh), lambda i: (0, 0)),
        ]

    outs = pl.pallas_call(
        functools.partial(_gru_bwd_kernel, chunk, nblocks, bidir),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((ndir, b, gh), jnp.float32),
                        pltpu.VMEM((ndir, b, gh), jnp.float32),
                        pltpu.VMEM((ndir, b, hidden), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*ops)
    if bidir:
        dg_f, dg_b, dnh_f, dnh_b, hp_f, hp_b, dbi, dbh = outs
    else:
        dg_f, dnh_f, hp_f, dbi, dbh = outs
        dg_b = dnh_b = hp_b = None

    # Weight grads: per direction, one MXU reduction over all (t, b). The
    # h_{prev} stream comes straight from the backward kernel, time-aligned
    # with dg — no shifted-slice relayout of the f32 h needed (h_{-1} = 0
    # and frozen/padded steps contribute exactly-zero dg, so the sum is
    # exact over the full padded range).
    mm = functools.partial(jnp.einsum, "tbh,tbg->hg",
                           preferred_element_type=jnp.float32)

    def dw_dir(hp, dg, dnh):
        return jnp.concatenate(
            [mm(hp, dg[..., : 2 * hidden]), mm(hp, dnh)], axis=-1)

    if bidir:
        dw = jnp.stack([dw_dir(hp_f, dg_f, dnh_f),
                        dw_dir(hp_b, dg_b, dnh_b)])
    else:
        dw = dw_dir(hp_f, dg_f, dnh_f)[None]
    return dg_f[:t], dg_b[:t] if bidir else None, dbi, \
        dw.astype(w_hh.dtype), dbh


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def bigru_scan_pallas(xp_f, xp_b, b_ih, w_hh, b_hh, lens, interpret=False):
    """Bidirectional GRU recurrence as one fused Pallas kernel.

    xp_f/xp_b: (T, B, 3H) raw per-direction input projections ``x @ W_ih``
        (NO bias — both biases are added in-kernel), in ORIGINAL time order
        for both directions (bf16 on TPU, f32 under interpret).
    b_ih/b_hh: (2, 3H) biases; w_hh: (2, H, 3H) hidden weights.
    lens: (B, 1) float32 valid lengths — timesteps >= lens are state-frozen
        for the backward direction.
    Returns (h_f, h_b), each (T, B, H) f32 in original time order; h_b is
    exactly zero at padded steps, h_f is garbage there and the CALLER must
    mask it (and must mask both output grads, see module docstring).
    """
    outs, t = _gru_fwd(xp_f, xp_b, b_ih, w_hh, b_hh, lens, interpret, False)
    return outs[0][:t], outs[1][:t]


def _bigru_fwd_rule(xp_f, xp_b, b_ih, w_hh, b_hh, lens, interpret):
    outs, t = _gru_fwd(xp_f, xp_b, b_ih, w_hh, b_hh, lens, interpret, True)
    return (outs[0][:t], outs[1][:t]), (w_hh, t, outs, lens)


def _bigru_bwd_rule(interpret, res, douts):
    w_hh, t, outs, lens = res
    dg_f, dg_b, dbi, dw, dbh = _gru_bwd((w_hh, t, outs), douts, interpret)
    return dg_f, dg_b, dbi, dw, dbh, jnp.zeros_like(lens)


bigru_scan_pallas.defvjp(_bigru_fwd_rule, _bigru_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gru_scan_pallas(xp, b_ih, w_hh, b_hh, interpret=False):
    """Unidirectional GRU recurrence (weights carry a leading D=1 axis)."""
    outs, t = _gru_fwd(xp, None, b_ih, w_hh, b_hh, None, interpret, False)
    return outs[0][:t]


def _gru_fwd_rule(xp, b_ih, w_hh, b_hh, interpret):
    outs, t = _gru_fwd(xp, None, b_ih, w_hh, b_hh, None, interpret, True)
    return outs[0][:t], (w_hh, t, outs)


def _gru_bwd_rule(interpret, res, dout):
    dg_f, _, dbi, dw, dbh = _gru_bwd(res, (dout,), interpret)
    return dg_f, dbi, dw, dbh


gru_scan_pallas.defvjp(_gru_fwd_rule, _gru_bwd_rule)


# ---------------------------------------------------------------------------
# LSTM — same architecture as the GRU kernels: W_hh pinned in VMEM, chunked
# sequential grid, zero-copy reversed walk for the backward direction,
# analytic backward. Torch gate order i,f,g,o (reference model.py:13-16
# exposes nn.LSTM via rnn_type="lstm").
# ---------------------------------------------------------------------------


def _lstm_fwd_kernel(chunk, nblocks, bidir, with_res, *refs):
    """inputs:  xp_f [, xp_b] (chunk, B, 4H) bf16 (raw x@W_ih, no bias),
             b_ih (D, 4H) f32, w (D, H, 4H) bf16, b_hh (D, 4H) f32
             [, lens (B, 1) f32]
    outputs: h_f, c_f [, h_b, c_b] (chunk, B, H) f32
             [+ g_f [, g_b] (chunk, B, 4H) bf16 when training]
    scratch: state (2*D, B, H) f32 — [d] = h, [D+d] = c
    """
    if bidir:
        xp_f, xp_b, bi_ref, w_ref, bh_ref, lens_ref = refs[:6]
        rest = refs[6:]
        if with_res:
            h_f, c_f, h_b, c_b, g_f, g_b, state = rest
        else:
            h_f, c_f, h_b, c_b, state = rest
    else:
        xp_f, bi_ref, w_ref, bh_ref = refs[:4]
        rest = refs[4:]
        if with_res:
            h_f, c_f, g_f, state = rest
        else:
            h_f, c_f, state = rest
    ndir = 2 if bidir else 1
    hidden = w_ref.shape[1]
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        state[:] = jnp.zeros_like(state)

    def step(d, xp_t, keep):
        h_prev = state[d]
        c_prev = state[ndir + d]
        gates = (
            xp_t.astype(jnp.float32) + bi_ref[d][None, :]
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
        h_new, c_new, i, f, g, o = step(0, xp_f[j], None)
        h_f[j] = h_new
        c_f[j] = c_new
        if with_res:
            stash(g_f, j, i, f, g, o)
        if bidir:
            jj = chunk - 1 - j
            t_b = ((nblocks - 1 - blk) * chunk + jj).astype(jnp.float32)
            keep = (lens_ref[:, :] > t_b).astype(jnp.float32)
            h_new, c_new, i, f, g, o = step(1, xp_b[jj], keep)
            h_b[jj] = h_new
            c_b[jj] = c_new
            if with_res:
                stash(g_b, jj, i, f, g, o)


def _lstm_bwd_kernel(chunk, nblocks, bidir, *refs):
    """Analytic LSTM backward (see the GRU twin for the walk layout).

    per-direction inputs: dout (chunk, B, H) f32, g (chunk, B, 4H) bf16,
      c cur block (chunk, B, H) f32, c adjacent block; shared wt (D,4H,H).
    per-direction outputs: dg (chunk, B, 4H) bf16 (== xp cotangent AND the
      hidden-projection grad — the LSTM has no GRU-style r asymmetry, so
      db_ih == db_hh == sum(dg) and dW_hh contracts h_{prev} with dg).
      Shared output db (D, 4H) f32.
    scratch: acc (D, B, 4H) f32, state (2*D, B, H) f32 — [d]=dh, [D+d]=dc.
    """
    if bidir:
        dout_f, dout_b, g_f, g_b, cc_f, ca_f, cc_b, ca_b, wt_ref = refs[:9]
        dg_f, dg_b, db_ref = refs[9:12]
        acc, state = refs[12:]
    else:
        dout_f, g_f, cc_f, ca_f, wt_ref = refs[:5]
        dg_f, db_ref = refs[5:7]
        acc, state = refs[7:]
    ndir = 2 if bidir else 1
    hidden = wt_ref.shape[2]
    blk = pl.program_id(0)

    @pl.when(blk == 0)
    def _():
        state[:] = jnp.zeros_like(state)
        acc[:] = jnp.zeros_like(acc)
        db_ref[:] = jnp.zeros_like(db_ref)

    def step(d, k, dh_in, gv, c_t, c_prev, dg_ref):
        # direct dg_ref[k, ...] stores (static k): a `.at[k]` ref view would
        # lower to tpu.memref_slice, which requires tile-aligned slice
        # shapes (4H is not 128-aligned for H=800).
        dh_tot = dh_in + state[d]
        gf = gv.astype(jnp.float32)
        i = gf[:, :hidden]
        f = gf[:, hidden : 2 * hidden]
        g = gf[:, 2 * hidden : 3 * hidden]
        o = gf[:, 3 * hidden :]
        tc = jnp.tanh(c_t)
        do_pre = dh_tot * tc * o * (1.0 - o)
        dc_tot = state[ndir + d] + dh_tot * o * (1.0 - tc * tc)
        di_pre = dc_tot * g * i * (1.0 - i)
        df_pre = dc_tot * c_prev * f * (1.0 - f)
        dg_pre = dc_tot * i * (1.0 - g * g)
        dg_ref[k, :, :hidden] = di_pre.astype(dg_ref.dtype)
        dg_ref[k, :, hidden : 2 * hidden] = df_pre.astype(dg_ref.dtype)
        dg_ref[k, :, 2 * hidden : 3 * hidden] = dg_pre.astype(dg_ref.dtype)
        dg_ref[k, :, 3 * hidden :] = do_pre.astype(dg_ref.dtype)
        acc[d, :, :hidden] += di_pre
        acc[d, :, hidden : 2 * hidden] += df_pre
        acc[d, :, 2 * hidden : 3 * hidden] += dg_pre
        acc[d, :, 3 * hidden :] += do_pre
        dgates = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=-1)
        state[d] = jnp.dot(dgates.astype(wt_ref.dtype), wt_ref[d],
                           preferred_element_type=jnp.float32)
        state[ndir + d] = dc_tot * f

    for j in range(chunk):
        jr = chunk - 1 - j
        if jr > 0:
            cprev = cc_f[jr - 1]
        else:
            blk_f = nblocks - 1 - blk
            cprev = ca_f[chunk - 1] * (blk_f > 0).astype(jnp.float32)
        step(0, jr, dout_f[jr], g_f[jr], cc_f[jr], cprev, dg_f)
        if bidir:
            if j < chunk - 1:
                cprev = cc_b[j + 1]
            else:
                cprev = ca_b[0] * (blk < nblocks - 1).astype(jnp.float32)
            step(1, j, dout_b[j], g_b[j], cc_b[j], cprev, dg_b)

    @pl.when(blk == nblocks - 1)
    def _():
        db_ref[:] = jnp.sum(acc[:], axis=1)


def _lstm_fwd(xp_f, xp_b, b_ih, w_hh, b_hh, lens, interpret, with_res):
    ndir, hidden, _ = w_hh.shape
    chunk = _chunk_for(hidden)
    bidir = xp_b is not None
    xp_f, t = _pad_time(xp_f, chunk)
    tp, b, gh = xp_f.shape
    nblocks = tp // chunk
    fwd = lambda i: (i, 0, 0)  # noqa: E731
    rev = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731

    in_specs = [pl.BlockSpec((chunk, b, gh), fwd)]
    ops = [xp_f]
    if bidir:
        xp_b, _ = _pad_time(xp_b, chunk)
        in_specs.append(pl.BlockSpec((chunk, b, gh), rev))
        ops.append(xp_b)
    in_specs += [
        pl.BlockSpec((ndir, gh), lambda i: (0, 0)),
        pl.BlockSpec((ndir, hidden, gh), lambda i: (0, 0, 0)),
        pl.BlockSpec((ndir, gh), lambda i: (0, 0)),
    ]
    wdt = xp_f.dtype if xp_f.dtype == jnp.float32 else jnp.bfloat16
    ops += [b_ih.astype(jnp.float32), w_hh.astype(wdt),
            b_hh.astype(jnp.float32)]
    if bidir:
        in_specs.append(pl.BlockSpec((b, 1), lambda i: (0, 0)))
        ops.append(lens.astype(jnp.float32))

    h_sds = jax.ShapeDtypeStruct((tp, b, hidden), jnp.float32)
    h_spec_f = pl.BlockSpec((chunk, b, hidden), fwd)
    h_spec_r = pl.BlockSpec((chunk, b, hidden), rev)
    if bidir:
        out_shape = [h_sds, h_sds, h_sds, h_sds]
        out_specs = [h_spec_f, h_spec_f, h_spec_r, h_spec_r]
    else:
        out_shape = [h_sds, h_sds]
        out_specs = [h_spec_f, h_spec_f]
    if with_res:
        # residuals (and hence the xp cotangent dtype) mirror the xp stream
        g_sds = jax.ShapeDtypeStruct((tp, b, gh), xp_f.dtype)
        out_shape += [g_sds] * (2 if bidir else 1)
        out_specs += [pl.BlockSpec((chunk, b, gh), fwd)]
        if bidir:
            out_specs += [pl.BlockSpec((chunk, b, gh), rev)]

    outs = pl.pallas_call(
        functools.partial(_lstm_fwd_kernel, chunk, nblocks, bidir, with_res),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2 * ndir, b, hidden), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*ops)
    return outs, t


def _lstm_bwd(res, douts, interpret):
    w_hh, t, outs = res
    bidir = len(douts) == 2
    ndir, hidden, gh = w_hh.shape
    chunk = _chunk_for(hidden)
    if bidir:
        h_f, c_f, h_b, c_b, g_f, g_b = outs
    else:
        (h_f, c_f, g_f), (h_b, c_b, g_b) = outs, (None, None, None)
    tp, b, _ = h_f.shape
    nblocks = tp // chunk
    fwd = lambda i: (i, 0, 0)  # noqa: E731
    rev = lambda i: (nblocks - 1 - i, 0, 0)  # noqa: E731
    reva = lambda i: (jnp.maximum(nblocks - 2 - i, 0), 0, 0)  # noqa: E731
    fwda = lambda i: (jnp.minimum(i + 1, nblocks - 1), 0, 0)  # noqa: E731

    gdt = g_f.dtype  # == the xp stream dtype == the xp cotangent dtype
    wdt = jnp.float32 if gdt == jnp.float32 else jnp.bfloat16
    dout_f, _ = _pad_time(douts[0].astype(jnp.float32), chunk)
    h_spec_r = pl.BlockSpec((chunk, b, hidden), rev)
    g_spec_r = pl.BlockSpec((chunk, b, gh), rev)
    if bidir:
        dout_b, _ = _pad_time(douts[1].astype(jnp.float32), chunk)
        in_specs = [
            h_spec_r, pl.BlockSpec((chunk, b, hidden), fwd),
            g_spec_r, pl.BlockSpec((chunk, b, gh), fwd),
            h_spec_r, pl.BlockSpec((chunk, b, hidden), reva),
            pl.BlockSpec((chunk, b, hidden), fwd),
            pl.BlockSpec((chunk, b, hidden), fwda),
            pl.BlockSpec((ndir, gh, hidden), lambda i: (0, 0, 0)),
        ]
        ops = [dout_f, dout_b, g_f, g_b, c_f, c_f, c_b, c_b,
               jnp.swapaxes(w_hh, 1, 2).astype(wdt)]
        out_shape = [
            jax.ShapeDtypeStruct((tp, b, gh), gdt),
            jax.ShapeDtypeStruct((tp, b, gh), gdt),
            jax.ShapeDtypeStruct((ndir, gh), jnp.float32),
        ]
        out_specs = [g_spec_r, pl.BlockSpec((chunk, b, gh), fwd),
                     pl.BlockSpec((ndir, gh), lambda i: (0, 0))]
    else:
        in_specs = [
            h_spec_r, g_spec_r,
            h_spec_r, pl.BlockSpec((chunk, b, hidden), reva),
            pl.BlockSpec((ndir, gh, hidden), lambda i: (0, 0, 0)),
        ]
        ops = [dout_f, g_f, c_f, c_f, jnp.swapaxes(w_hh, 1, 2).astype(wdt)]
        out_shape = [
            jax.ShapeDtypeStruct((tp, b, gh), gdt),
            jax.ShapeDtypeStruct((ndir, gh), jnp.float32),
        ]
        out_specs = [g_spec_r, pl.BlockSpec((ndir, gh), lambda i: (0, 0))]

    outs2 = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, chunk, nblocks, bidir),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((ndir, b, gh), jnp.float32),
                        pltpu.VMEM((2 * ndir, b, hidden), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*ops)
    if bidir:
        dg_f, dg_b, db = outs2
    else:
        dg_f, db = outs2
        dg_b = None

    mm = functools.partial(jnp.einsum, "tbh,tbg->hg",
                           preferred_element_type=jnp.float32)

    def dw_dir(h, dg, shift_fwd):
        hdt = h.astype(wdt)
        if shift_fwd:
            return mm(hdt[: tp - 1], dg[1:])
        return mm(hdt[1:], dg[: tp - 1])

    if bidir:
        dw = jnp.stack([dw_dir(h_f, dg_f, True), dw_dir(h_b, dg_b, False)])
    else:
        dw = dw_dir(h_f, dg_f, True)[None]
    return dg_f[:t], dg_b[:t] if bidir else None, db, \
        dw.astype(w_hh.dtype), db


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def bilstm_scan_pallas(xp_f, xp_b, b_ih, w_hh, b_hh, lens, interpret=False):
    """Bidirectional LSTM recurrence — same contract as
    ``bigru_scan_pallas`` with G=4 (torch gate order i,f,g,o)."""
    outs, t = _lstm_fwd(xp_f, xp_b, b_ih, w_hh, b_hh, lens, interpret, False)
    return outs[0][:t], outs[2][:t]


def _bilstm_fwd_rule(xp_f, xp_b, b_ih, w_hh, b_hh, lens, interpret):
    outs, t = _lstm_fwd(xp_f, xp_b, b_ih, w_hh, b_hh, lens, interpret, True)
    return (outs[0][:t], outs[2][:t]), (w_hh, t, outs, lens)


def _bilstm_bwd_rule(interpret, res, douts):
    w_hh, t, outs, lens = res
    dg_f, dg_b, dbi, dw, dbh = _lstm_bwd((w_hh, t, outs), douts, interpret)
    return dg_f, dg_b, dbi, dw, dbh, jnp.zeros_like(lens)


bilstm_scan_pallas.defvjp(_bilstm_fwd_rule, _bilstm_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_scan_pallas(xp, b_ih, w_hh, b_hh, interpret=False):
    """Unidirectional LSTM recurrence (weights carry a leading D=1 axis)."""
    outs, t = _lstm_fwd(xp, None, b_ih, w_hh, b_hh, None, interpret, False)
    return outs[0][:t]


def _lstm_fwd_rule(xp, b_ih, w_hh, b_hh, interpret):
    outs, t = _lstm_fwd(xp, None, b_ih, w_hh, b_hh, None, interpret, True)
    return outs[0][:t], (w_hh, t, outs)


def _lstm_bwd_rule(interpret, res, dout):
    dg_f, _, dbi, dw, dbh = _lstm_bwd(res, (dout,), interpret)
    return dg_f, dbi, dw, dbh


lstm_scan_pallas.defvjp(_lstm_fwd_rule, _lstm_bwd_rule)
