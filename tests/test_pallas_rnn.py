"""Pallas fused GRU kernel vs the XLA scan reference (interpret mode on CPU).

The kernel must reproduce ``ops.rnn.rnn_scan``'s bf16 compute path: forward
outputs and analytic gradients (xp / W_hh / b_hh) within bf16 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepspeech_tpu.ops.pallas.rnn_kernel import gru_scan_pallas
from deepspeech_tpu.ops import rnn as rnn_ops


def _xla_ref(xp, w_hh, b_hh, nrows):
    """Reference recurrence on direction-stacked rows, f32 gates/bf16 matmul
    (mirrors the kernel's internal precision)."""
    ndir = w_hh.shape[0]
    hidden = w_hh.shape[1]

    def step(h, xp_t):
        outs = []
        for d in range(ndir):
            rows = slice(d * nrows, (d + 1) * nrows)
            hp = (h[rows].astype(jnp.bfloat16) @ w_hh[d].astype(jnp.bfloat16)
                  ).astype(jnp.float32) + b_hh[d][None, :]
            xr, xz, xn = jnp.split(xp_t[rows].astype(jnp.float32), 3, -1)
            hr, hz, hn = jnp.split(hp, 3, -1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            outs.append((1.0 - z) * n + z * h[rows])
        h = jnp.concatenate(outs, axis=0)
        return h, h

    h0 = jnp.zeros((xp.shape[1], hidden), jnp.float32)
    _, out = jax.lax.scan(step, h0, xp.astype(jnp.bfloat16))
    return out


@pytest.mark.parametrize("ndir", [1, 2])
def test_gru_forward_matches_xla(ndir):
    t, b, h = 19, 4, 32  # t deliberately not a multiple of the chunk
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((t, ndir * b, 3 * h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((ndir, h, 3 * h)) * 0.3, jnp.float32)
    bh = jnp.asarray(rng.standard_normal((ndir, 3 * h)) * 0.1, jnp.float32)

    got = gru_scan_pallas(xp, w, bh, b, True)
    want = _xla_ref(xp, w, bh, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=3e-2)


@pytest.mark.parametrize("ndir", [1, 2])
def test_gru_grads_match_xla(ndir):
    t, b, h = 11, 3, 16
    rng = np.random.default_rng(1)
    xp = jnp.asarray(rng.standard_normal((t, ndir * b, 3 * h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((ndir, h, 3 * h)) * 0.3, jnp.float32)
    bh = jnp.asarray(rng.standard_normal((ndir, 3 * h)) * 0.1, jnp.float32)
    dout = jnp.asarray(rng.standard_normal((t, ndir * b, h)), jnp.float32)

    def loss_pallas(xp, w, bh):
        return (gru_scan_pallas(xp, w, bh, b, True) * dout).sum()

    def loss_ref(xp, w, bh):
        return (_xla_ref(xp, w, bh, b) * dout).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(xp, w, bh)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(xp, w, bh)
    for a, e, name in zip(gp, gr, ("dxp", "dw", "db")):
        scale = max(np.abs(np.asarray(e)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(e) / scale,
                                   rtol=0, atol=5e-2, err_msg=name)


def test_gru_scan_pallas_inside_rnn_scan():
    """rnn_scan(impl='pallas') must agree with impl='xla' on the bf16 path."""
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


# ---------------------------------------------------------------------------
# LSTM kernel
# ---------------------------------------------------------------------------


def _xla_lstm_ref(xp, w_hh, b_hh, nrows):
    """Reference LSTM recurrence on direction-stacked rows (bf16 matmul,
    f32 gates/state), mirroring the kernel's internal precision."""
    ndir = w_hh.shape[0]
    hidden = w_hh.shape[1]

    def step(state, xp_t):
        h, c = state
        hs, cs = [], []
        for d in range(ndir):
            rows = slice(d * nrows, (d + 1) * nrows)
            gates = (xp_t[rows].astype(jnp.float32)
                     + (h[rows].astype(jnp.bfloat16)
                        @ w_hh[d].astype(jnp.bfloat16)).astype(jnp.float32)
                     + b_hh[d][None, :])
            i, f, g, o = jnp.split(gates, 4, -1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = f * c[rows] + i * g
            hs.append(o * jnp.tanh(c_new))
            cs.append(c_new)
        h = jnp.concatenate(hs, axis=0)
        return (h, jnp.concatenate(cs, axis=0)), h

    h0 = jnp.zeros((xp.shape[1], hidden), jnp.float32)
    _, out = jax.lax.scan(step, (h0, h0), xp.astype(jnp.bfloat16))
    return out


@pytest.mark.parametrize("ndir", [1, 2])
def test_lstm_forward_matches_xla(ndir):
    from deepspeech_tpu.ops.pallas.rnn_kernel import lstm_scan_pallas
    t, b, h = 19, 4, 32
    rng = np.random.default_rng(3)
    xp = jnp.asarray(rng.standard_normal((t, ndir * b, 4 * h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((ndir, h, 4 * h)) * 0.3, jnp.float32)
    bh = jnp.asarray(rng.standard_normal((ndir, 4 * h)) * 0.1, jnp.float32)

    got = lstm_scan_pallas(xp, w, bh, b, True)
    want = _xla_lstm_ref(xp, w, bh, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=3e-2)


@pytest.mark.parametrize("ndir", [1, 2])
def test_lstm_grads_match_xla(ndir):
    from deepspeech_tpu.ops.pallas.rnn_kernel import lstm_scan_pallas
    t, b, h = 11, 3, 16
    rng = np.random.default_rng(4)
    xp = jnp.asarray(rng.standard_normal((t, ndir * b, 4 * h)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((ndir, h, 4 * h)) * 0.3, jnp.float32)
    bh = jnp.asarray(rng.standard_normal((ndir, 4 * h)) * 0.1, jnp.float32)
    dout = jnp.asarray(rng.standard_normal((t, ndir * b, h)), jnp.float32)

    def loss_pallas(xp, w, bh):
        return (lstm_scan_pallas(xp, w, bh, b, True) * dout).sum()

    def loss_ref(xp, w, bh):
        return (_xla_lstm_ref(xp, w, bh, b) * dout).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(xp, w, bh)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(xp, w, bh)
    for a, e, name in zip(gp, gr, ("dxp", "dw", "db")):
        scale = max(np.abs(np.asarray(e)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(e) / scale,
                                   rtol=0, atol=5e-2, err_msg=name)


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
