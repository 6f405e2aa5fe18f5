"""DS2 conv front-end as frequency-banded MXU matmuls.

XLA's generic 2-D convolution lowering is a poor fit for the DS2 front
(reference model.py:208-215): 32 output channels use a quarter of the MXU's
128 lanes, and the NCHW<->NHWC layout shuffles around it dominate — profiled
at ~46 ms of a 93 ms train step on TPU v5e. This module lowers the same two
convolutions as banded matmuls instead:

    y[b, t', (f, c)] = sum_dt  X_dt[b, t', :] @ W_band[dt][:, (f, c)]

where ``X_dt`` is a (strided) time-slice of the input in (B, T, F_in·C_in)
layout and ``W_band[dt]`` is the conv kernel scattered along a
frequency-band structure: W_band[dt][(fin, cin), (f, cout)] =
W[fin - s_f·f + pad_f, dt, cin, cout] inside the band, 0 outside. Every
matmul then runs with 1312-2592 lanes (full MXU), the (B,F,T,C) layout and
its transposes disappear (output feeds the RNN stack in (B, T', N) layout
directly), and zero-padding in frequency is implicit in the band.

The band scatter itself is an einsum with a constant 0/1 selection tensor,
so both it and its transpose (the weight-gradient path) stay matmuls — no
gather/scatter ops anywhere. FLOP overhead of the dense band
(F_in/K_f ≈ 3.9x) is far cheaper than the lane underutilization it removes;
measured end to end the conv stack drops from ~46 ms to a few ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def band_select(f_in: int, f_out: int, k_f: int, stride_f: int,
                pad_f: int) -> np.ndarray:
    """0/1 selection tensor S[df, fin, f] = 1 iff fin == stride_f*f + df - pad_f."""
    df = np.arange(k_f)[:, None, None]
    fin = np.arange(f_in)[None, :, None]
    f = np.arange(f_out)[None, None, :]
    return (fin == stride_f * f + df - pad_f).astype(np.float32)


_FOLD_LANES = 4096  # fold taps into one matmul when K-cat stays below this


def _tap_matmuls_fwd_impl(x_g: jnp.ndarray, wb: jnp.ndarray, s_t: int,
                          t_out: int) -> jnp.ndarray:
    """Core tap loop: y[b,t] = sum_dt x_g[b, s_t*t + dt] @ wb[dt].

    x_g: (B, T_pad, K) time-padded lane window; wb: (k_t, K, N)."""
    k_t, band, _ = wb.shape
    b = x_g.shape[0]
    slices = [jax.lax.slice(
        x_g, (0, dt, 0), (b, dt + s_t * (t_out - 1) + 1, band),
        (1, s_t, 1)) for dt in range(k_t)]
    if band * k_t <= _FOLD_LANES:
        # Fold the time taps into the contraction: one (B·T', k_t·band)
        # x (k_t·band, N) MXU matmul instead of k_t small-K matmuls.
        x_cat = jnp.concatenate(slices, axis=-1)
        return jnp.einsum("btk,kn->btn", x_cat, wb.reshape(k_t * band, -1),
                          preferred_element_type=jnp.float32)
    y = None
    for x_dt, w_dt in zip(slices, wb):
        part = jnp.einsum("btk,kn->btn", x_dt, w_dt,
                          preferred_element_type=jnp.float32)
        y = part if y is None else y + part
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _tap_matmuls_s1(x_g, wb, s_t, t_out):
    """Stride-1 tap loop with a hand-written backward: XLA's autodiff of the
    per-tap strided-slice graph emits k_t·groups scatter-adds into the input
    gradient (~1.3 ms/step of add_any on the profile); the transpose of a
    banded conv is itself a banded conv, so dX is computed as tap matmuls
    against the transposed band, accumulated in registers instead."""
    return _tap_matmuls_fwd_impl(x_g, wb, s_t, t_out)


def _tap_s1_fwd(x_g, wb, s_t, t_out):
    return _tap_matmuls_fwd_impl(x_g, wb, s_t, t_out), (x_g, wb)


def _tap_s1_bwd(s_t, t_out, res, dy):
    x_g, wb = res
    k_t, band, n = wb.shape
    b, t_pad, _ = x_g.shape  # t_pad == t_out + k_t - 1 for s_t == 1
    dyc = dy.astype(wb.dtype)

    # dwb[dt] = x_dt^T @ dy — K = B·T' reduction per tap.
    dwb = jnp.stack([
        jnp.einsum("btk,btn->kn",
                   jax.lax.slice(x_g, (0, dt, 0), (b, dt + t_out, band)),
                   dyc, preferred_element_type=jnp.float32)
        for dt in range(k_t)]).astype(wb.dtype)

    # dx_g[u] = sum_dt dy[u - dt] @ wb[dt]^T — the transposed banded conv:
    # pad dy, take k_t shifted slices, accumulate their matmuls in registers.
    # (A folded single matmul over k_t·N lanes was measured slower: the
    # sublane-misaligned shift concat costs more than the matmul fusion wins.)
    dy_pad = jnp.pad(dyc, ((0, 0), (k_t - 1, k_t - 1), (0, 0)))
    shifts = [jax.lax.slice(dy_pad, (0, k_t - 1 - dt, 0),
                            (b, 2 * (k_t - 1) - dt + t_out, n))
              for dt in range(k_t)]
    wt = jnp.swapaxes(wb, 1, 2)  # (k_t, N, K)
    dx = None
    for s, w_dt in zip(shifts, wt):
        part = jnp.einsum("btn,nk->btk", s, w_dt,
                          preferred_element_type=jnp.float32)
        dx = part if dx is None else dx + part
    return dx.astype(x_g.dtype), dwb


_tap_matmuls_s1.defvjp(_tap_s1_fwd, _tap_s1_bwd)


def _tap_matmuls(x_g, wb, s_t, t_out):
    if s_t == 1:
        return _tap_matmuls_s1(x_g, wb, s_t, t_out)
    return _tap_matmuls_fwd_impl(x_g, wb, s_t, t_out)


def banded_conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                  f_in: int, f_out: int, strides: tuple[int, int],
                  padding: tuple[int, int], compute_dtype=None,
                  freq_groups: int = 1) -> jnp.ndarray:
    """Banded-matmul 2-D conv.

    x: (B, T, f_in*C_in) — frequency(+channel) on lanes, time on sublanes.
    kernel: (k_f, k_t, C_in, C_out) HWIO (flax.linen.Conv layout).
    bias: (C_out,). strides/padding: (freq, time) with symmetric time pad.
    Returns (B, T_out, f_out*C_out) float32, T_out = (T + 2p_t - k_t)//s_t + 1.

    ``freq_groups`` splits the output frequencies into contiguous groups,
    each contracting only its own (narrower) input-frequency window — the
    dense band wastes FLOPs by a factor f_in/(k_f + s_f·(gs-1)); grouping
    trades a little lane width for roughly halving conv2's compute and
    banded-weight footprint in the DS2 stack.
    """
    k_f, k_t, c_in, c_out = kernel.shape
    s_f, s_t = strides
    p_f, p_t = padding
    b, t, _ = x.shape
    t_out = (t + 2 * p_t - k_t) // s_t + 1

    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    xp = jnp.pad(x, ((0, 0), (p_t, p_t), (0, 0)))

    gs = -(-f_out // max(freq_groups, 1))  # output freqs per group (ceil)
    groups = []
    for g0 in range(0, f_out, gs):
        g1 = min(g0 + gs, f_out)
        # input band feeding outputs [g0, g1): fin = s_f*f + df - p_f
        lo = max(0, s_f * g0 - p_f)
        hi = min(f_in, s_f * (g1 - 1) - p_f + k_f)
        groups.append((g0, g1, lo, hi))

    outs = []
    for g0, g1, lo, hi in groups:
        # same banding, shifted into the group's local coordinates
        sel = band_select(hi - lo, g1 - g0, k_f, s_f,
                          p_f - s_f * g0 + lo)
        wb = jnp.einsum("dkf,dtio->tkifo", jnp.asarray(sel), kernel,
                        preferred_element_type=jnp.float32)
        wb = wb.reshape(k_t, (hi - lo) * c_in, (g1 - g0) * c_out)
        if compute_dtype is not None:
            wb = wb.astype(compute_dtype)
        x_g = jax.lax.slice(xp, (0, 0, lo * c_in),
                            (b, xp.shape[1], hi * c_in))
        y = _tap_matmuls(x_g, wb, s_t, t_out)
        outs.append(y + jnp.tile(bias, g1 - g0).astype(jnp.float32))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
