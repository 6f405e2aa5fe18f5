"""Pallas fused GRU/LSTM kernels vs XLA references (interpret mode on CPU).

The kernels must reproduce ``ops.rnn.rnn_scan``'s compute path: forward
outputs and analytic gradients (xp / b_ih / W_hh / b_hh) within tolerance.
The direct-op tests below model the kernels' zero-copy contract: both
direction streams are in ORIGINAL time order; the backward direction runs
its recurrence from t = T-1 down to 0 and is state-frozen at t >= length.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepspeech_tpu.ops.pallas.rnn_kernel import (
    bigru_scan_pallas, bilstm_scan_pallas, gru_scan_pallas, lstm_scan_pallas)
from deepspeech_tpu.ops import rnn as rnn_ops


def _gru_cell(xg, h, w, bh, z_force=None):
    hp = h @ w + bh[None, :]
    xr, xz, xn = jnp.split(xg, 3, -1)
    if z_force is not None:
        xz = jnp.where(z_force, 40.0, xz)
    hr, hz, hn = jnp.split(hp, 3, -1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _bigru_ref(xp_f, xp_b, b_ih, w_hh, b_hh, lens):
    """Differentiable loop reference for the bidirectional GRU contract."""
    t, b, _ = xp_f.shape
    hidden = w_hh.shape[1]
    h = jnp.zeros((b, hidden), jnp.float32)
    hs_f = []
    for j in range(t):
        h = _gru_cell(xp_f[j] + b_ih[0], h, w_hh[0], b_hh[0])
        hs_f.append(h)
    h = jnp.zeros((b, hidden), jnp.float32)
    hs_b = [None] * t
    for j in reversed(range(t)):
        frozen = (jnp.full((b, 1), j) >= lens)
        h = _gru_cell(xp_b[j] + b_ih[1], h, w_hh[1], b_hh[1], z_force=frozen)
        hs_b[j] = h
    return jnp.stack(hs_f), jnp.stack(hs_b)


def _lstm_cell(xg, h, c, w, bh, frozen=None):
    hidden = h.shape[-1]
    gates = xg + h @ w + bh[None, :]
    xi, xf, xg_, xo = jnp.split(gates, 4, -1)
    if frozen is not None:
        xi = jnp.where(frozen, -40.0, xi)
        xf = jnp.where(frozen, 40.0, xf)
    i, f, o = jax.nn.sigmoid(xi), jax.nn.sigmoid(xf), jax.nn.sigmoid(xo)
    g = jnp.tanh(xg_)
    c = f * c + i * g
    return o * jnp.tanh(c), c


def _bilstm_ref(xp_f, xp_b, b_ih, w_hh, b_hh, lens):
    t, b, _ = xp_f.shape
    hidden = w_hh.shape[1]
    h = c = jnp.zeros((b, hidden), jnp.float32)
    hs_f = []
    for j in range(t):
        h, c = _lstm_cell(xp_f[j] + b_ih[0], h, c, w_hh[0], b_hh[0])
        hs_f.append(h)
    h = c = jnp.zeros((b, hidden), jnp.float32)
    hs_b = [None] * t
    for j in reversed(range(t)):
        frozen = (jnp.full((b, 1), j) >= lens)
        h, c = _lstm_cell(xp_b[j] + b_ih[1], h, c, w_hh[1], b_hh[1],
                          frozen=frozen)
        hs_b[j] = h
    return jnp.stack(hs_f), jnp.stack(hs_b)


def _mk_gru(t, b, h, ndir, seed):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal((t, b, 3 * h)), jnp.float32),
        jnp.asarray(rng.standard_normal((t, b, 3 * h)), jnp.float32),
        jnp.asarray(rng.standard_normal((ndir, 3 * h)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((ndir, h, 3 * h)) * 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal((ndir, 3 * h)) * 0.1, jnp.float32),
    )


def test_bigru_forward_matches_ref():
    t, b, h = 19, 4, 32  # t deliberately not a multiple of the chunk
    xp_f, xp_b, bi, w, bh = _mk_gru(t, b, h, 2, 0)
    lens = jnp.asarray([[19.0], [11.0], [5.0], [1.0]], jnp.float32)

    got_f, got_b = bigru_scan_pallas(xp_f, xp_b, bi, w, bh, lens, True)
    want_f, want_b = _bigru_ref(xp_f, xp_b, bi, w, bh, lens)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               rtol=0, atol=1e-4)
    # frozen steps must be exactly zero
    assert np.all(np.asarray(got_b)[12:, 1] == 0.0)


def test_bigru_grads_match_ref():
    t, b, h = 11, 3, 16
    xp_f, xp_b, bi, w, bh = _mk_gru(t, b, h, 2, 1)
    lens = jnp.asarray([[11.0], [7.0], [2.0]], jnp.float32)
    rng = np.random.default_rng(2)
    dout = jnp.asarray(rng.standard_normal((t, b, h)), jnp.float32)
    mask = (jnp.arange(t)[:, None] < lens[:, 0][None, :]
            ).astype(jnp.float32)[:, :, None]

    def loss(fn):
        def go(xp_f, xp_b, bi, w, bh):
            h_f, h_b = fn(xp_f, xp_b, bi, w, bh, lens)
            return (((h_f + h_b) * mask) * dout).sum()
        return go

    pallas_fn = lambda *a: bigru_scan_pallas(*a, True)  # noqa: E731
    gp = jax.grad(loss(pallas_fn), argnums=(0, 1, 2, 3, 4))(
        xp_f, xp_b, bi, w, bh)
    gr = jax.grad(loss(_bigru_ref), argnums=(0, 1, 2, 3, 4))(
        xp_f, xp_b, bi, w, bh)
    for a, e, name in zip(gp, gr, ("dxp_f", "dxp_b", "dbi", "dw", "dbh")):
        scale = max(np.abs(np.asarray(e)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(e) / scale,
                                   rtol=0, atol=1e-4, err_msg=name)


def test_gru_unidirectional_matches_ref():
    t, b, h = 13, 3, 16
    xp_f, _, bi, w, bh = _mk_gru(t, b, h, 1, 3)

    got = gru_scan_pallas(xp_f, bi, w, bh, True)
    hh = jnp.zeros((b, h), jnp.float32)
    want = []
    for j in range(t):
        hh = _gru_cell(xp_f[j] + bi[0], hh, w[0], bh[0])
        want.append(hh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(jnp.stack(want)),
                               rtol=0, atol=1e-4)

    rng = np.random.default_rng(4)
    dout = jnp.asarray(rng.standard_normal((t, b, h)), jnp.float32)

    def loss_p(xp, bi, w, bh):
        return (gru_scan_pallas(xp, bi, w, bh, True) * dout).sum()

    def loss_r(xp, bi, w, bh):
        hh = jnp.zeros((b, h), jnp.float32)
        out = []
        for j in range(t):
            hh = _gru_cell(xp[j] + bi[0], hh, w[0], bh[0])
            out.append(hh)
        return (jnp.stack(out) * dout).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(xp_f, bi, w, bh)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(xp_f, bi, w, bh)
    for a, e, name in zip(gp, gr, ("dxp", "dbi", "dw", "dbh")):
        scale = max(np.abs(np.asarray(e)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(e) / scale,
                                   rtol=0, atol=1e-4, err_msg=name)


def test_gru_scan_pallas_inside_rnn_scan():
    """rnn_scan(impl='pallas_interpret') must agree with impl='xla'."""
    t, b, f, h = 23, 4, 24, 32
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((t, b, f)), jnp.float32)
    lengths = jnp.asarray([23, 17, 9, 1], jnp.int32)
    w_ih = jnp.asarray(rng.standard_normal((2, f, 3 * h)) * 0.3, jnp.float32)
    b_ih = jnp.asarray(rng.standard_normal((2, 3 * h)) * 0.1, jnp.float32)
    w_hh = jnp.asarray(rng.standard_normal((2, h, 3 * h)) * 0.3, jnp.float32)
    b_hh = jnp.asarray(rng.standard_normal((2, 3 * h)) * 0.1, jnp.float32)

    kw = dict(cell="gru", bidirectional=True, sum_directions=True,
              compute_dtype=jnp.bfloat16)
    want = rnn_ops.rnn_scan(x, lengths, w_ih, b_ih, w_hh, b_hh,
                            impl="xla", **kw)
    got = rnn_ops.rnn_scan(x, lengths, w_ih, b_ih, w_hh, b_hh,
                           impl="pallas_interpret", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-2)


def test_rnn_scan_pallas_grads_match_xla():
    """End-to-end layer grads (x, w_ih, b_ih, w_hh, b_hh) through rnn_scan
    must agree between the Pallas and XLA lowerings, padding included."""
    t, b, f, h = 14, 3, 12, 16
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((t, b, f)), jnp.float32)
    lengths = jnp.asarray([14, 9, 3], jnp.int32)
    w_ih = jnp.asarray(rng.standard_normal((2, f, 3 * h)) * 0.3, jnp.float32)
    b_ih = jnp.asarray(rng.standard_normal((2, 3 * h)) * 0.1, jnp.float32)
    w_hh = jnp.asarray(rng.standard_normal((2, h, 3 * h)) * 0.3, jnp.float32)
    b_hh = jnp.asarray(rng.standard_normal((2, 3 * h)) * 0.1, jnp.float32)
    dout = jnp.asarray(rng.standard_normal((t, b, h)), jnp.float32)

    def loss(impl):
        def go(x, w_ih, b_ih, w_hh, b_hh):
            out = rnn_ops.rnn_scan(x, lengths, w_ih, b_ih, w_hh, b_hh,
                                   cell="gru", bidirectional=True,
                                   sum_directions=True,
                                   compute_dtype=jnp.bfloat16, impl=impl)
            return (out * dout).sum()
        return go

    gp = jax.grad(loss("pallas_interpret"), argnums=(0, 1, 2, 3, 4))(
        x, w_ih, b_ih, w_hh, b_hh)
    gr = jax.grad(loss("xla"), argnums=(0, 1, 2, 3, 4))(
        x, w_ih, b_ih, w_hh, b_hh)
    for a, e, name in zip(gp, gr, ("dx", "dw_ih", "db_ih", "dw_hh", "db_hh")):
        scale = max(np.abs(np.asarray(e)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(e) / scale,
                                   rtol=0, atol=5e-2, err_msg=name)


# ---------------------------------------------------------------------------
# LSTM kernels
# ---------------------------------------------------------------------------


def _mk_lstm(t, b, h, ndir, seed):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal((t, b, 4 * h)), jnp.float32),
        jnp.asarray(rng.standard_normal((t, b, 4 * h)), jnp.float32),
        jnp.asarray(rng.standard_normal((ndir, 4 * h)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((ndir, h, 4 * h)) * 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal((ndir, 4 * h)) * 0.1, jnp.float32),
    )


def test_bilstm_forward_matches_ref():
    t, b, h = 19, 4, 32
    xp_f, xp_b, bi, w, bh = _mk_lstm(t, b, h, 2, 5)
    lens = jnp.asarray([[19.0], [11.0], [5.0], [1.0]], jnp.float32)

    got_f, got_b = bilstm_scan_pallas(xp_f, xp_b, bi, w, bh, lens, True)
    want_f, want_b = _bilstm_ref(xp_f, xp_b, bi, w, bh, lens)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               rtol=0, atol=1e-4)


def test_bilstm_grads_match_ref():
    t, b, h = 11, 3, 16
    xp_f, xp_b, bi, w, bh = _mk_lstm(t, b, h, 2, 6)
    lens = jnp.asarray([[11.0], [7.0], [2.0]], jnp.float32)
    rng = np.random.default_rng(7)
    dout = jnp.asarray(rng.standard_normal((t, b, h)), jnp.float32)
    mask = (jnp.arange(t)[:, None] < lens[:, 0][None, :]
            ).astype(jnp.float32)[:, :, None]

    def loss(fn):
        def go(xp_f, xp_b, bi, w, bh):
            h_f, h_b = fn(xp_f, xp_b, bi, w, bh, lens)
            return (((h_f + h_b) * mask) * dout).sum()
        return go

    pallas_fn = lambda *a: bilstm_scan_pallas(*a, True)  # noqa: E731
    gp = jax.grad(loss(pallas_fn), argnums=(0, 1, 2, 3, 4))(
        xp_f, xp_b, bi, w, bh)
    gr = jax.grad(loss(_bilstm_ref), argnums=(0, 1, 2, 3, 4))(
        xp_f, xp_b, bi, w, bh)
    for a, e, name in zip(gp, gr, ("dxp_f", "dxp_b", "dbi", "dw", "dbh")):
        scale = max(np.abs(np.asarray(e)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(e) / scale,
                                   rtol=0, atol=1e-4, err_msg=name)


def test_lstm_unidirectional_matches_ref():
    t, b, h = 13, 3, 16
    xp_f, _, bi, w, bh = _mk_lstm(t, b, h, 1, 8)

    got = lstm_scan_pallas(xp_f, bi, w, bh, True)
    hh = cc = jnp.zeros((b, h), jnp.float32)
    want = []
    for j in range(t):
        hh, cc = _lstm_cell(xp_f[j] + bi[0], hh, cc, w[0], bh[0])
        want.append(hh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(jnp.stack(want)),
                               rtol=0, atol=1e-4)


def test_lstm_scan_pallas_inside_rnn_scan():
    t, b, f, h = 23, 4, 24, 32
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((t, b, f)), jnp.float32)
    lengths = jnp.asarray([23, 17, 9, 1], jnp.int32)
    w_ih = jnp.asarray(rng.standard_normal((2, f, 4 * h)) * 0.3, jnp.float32)
    b_ih = jnp.asarray(rng.standard_normal((2, 4 * h)) * 0.1, jnp.float32)
    w_hh = jnp.asarray(rng.standard_normal((2, h, 4 * h)) * 0.3, jnp.float32)
    b_hh = jnp.asarray(rng.standard_normal((2, 4 * h)) * 0.1, jnp.float32)

    kw = dict(cell="lstm", bidirectional=True, sum_directions=True,
              compute_dtype=jnp.bfloat16)
    want = rnn_ops.rnn_scan(x, lengths, w_ih, b_ih, w_hh, b_hh,
                            impl="xla", **kw)
    got = rnn_ops.rnn_scan(x, lengths, w_ih, b_ih, w_hh, b_hh,
                           impl="pallas_interpret", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-2)
