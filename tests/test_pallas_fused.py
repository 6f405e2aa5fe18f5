"""Projection-fused Pallas RNN layer kernels (ops/pallas/rnn_fused.py).

The fused kernels must be numerically interchangeable with both the
external-projection kernels (rnn_kernel.py) and the XLA scan across
forward AND the full analytic backward — they are the default TPU lowering
of the cuDNN-RNN role (reference model.py:82-109), selected by
ops/rnn.py whenever W_ih fits in VMEM alongside W_hh.

All tests run the Pallas interpreter on CPU (tests/conftest.py pins
JAX_PLATFORMS=cpu); on-chip numerics are covered by bench.py --selfcheck.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepspeech_tpu.ops.pallas.rnn_fused import (
    bigru_layer_pallas,
    bilstm_layer_pallas,
    fused_layer_fits,
    gru_layer_pallas,
    lstm_layer_pallas,
)
from deepspeech_tpu.ops.rnn import rnn_scan


def _mk(rng, d, t, b, f, h, g):
    x = jnp.asarray(rng.standard_normal((t, b, f)).astype(np.float32))
    lens = np.full(b, t, np.int32)
    lens[1::2] = rng.integers(1, t, size=len(lens[1::2]))
    w_ih = jnp.asarray(rng.standard_normal((d, f, g * h)).astype(np.float32)
                       * 0.2)
    b_ih = jnp.asarray(rng.standard_normal((d, g * h)).astype(np.float32)
                       * 0.1)
    w_hh = jnp.asarray(rng.standard_normal((d, h, g * h)).astype(np.float32)
                       * 0.2)
    b_hh = jnp.asarray(rng.standard_normal((d, g * h)).astype(np.float32)
                       * 0.1)
    return x, jnp.asarray(lens), w_ih, b_ih, w_hh, b_hh


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.parametrize("bidir", [True, False])
def test_fused_matches_xla_forward_and_grads(cell, bidir):
    g = {"gru": 3, "lstm": 4}[cell]
    d = 2 if bidir else 1
    rng = np.random.default_rng(3)
    x, lens, w_ih, b_ih, w_hh, b_hh = _mk(rng, d, 13, 8, 24, 16, g)
    kw = dict(cell=cell, bidirectional=bidir, compute_dtype=jnp.float32)

    ref = rnn_scan(x, lens, w_ih, b_ih, w_hh, b_hh, impl="xla", **kw)
    got = rnn_scan(x, lens, w_ih, b_ih, w_hh, b_hh,
                   impl="pallas_interpret", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(impl):
        def f(params):
            xx, *ws = params
            out = rnn_scan(xx, lens, *ws, impl=impl, **kw)
            return (out * out * jnp.cos(out)).sum()
        return jax.grad(f)((x, w_ih, b_ih, w_hh, b_hh))

    ga, gb = loss("xla"), loss("pallas_interpret")
    for name, a, b2 in zip(["x", "w_ih", "b_ih", "w_hh", "b_hh"], ga, gb):
        np.testing.assert_allclose(np.asarray(b2), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_fused_matches_unfused_kernels(cell):
    """Fused layer == external-projection kernel fed the same projections."""
    from deepspeech_tpu.ops.pallas import bigru_scan_pallas, \
        bilstm_scan_pallas
    g = {"gru": 3, "lstm": 4}[cell]
    rng = np.random.default_rng(7)
    x, lens, w_ih, b_ih, w_hh, b_hh = _mk(rng, 2, 9, 8, 16, 16, g)
    lens_col = lens.astype(jnp.float32)[:, None]
    xp = [jnp.einsum("tbf,fg->tbg", x, w_ih[i]) for i in range(2)]
    if cell == "gru":
        ref = bigru_scan_pallas(xp[0], xp[1], b_ih, w_hh, b_hh, lens_col,
                                True)
        got = bigru_layer_pallas(x, w_ih, b_ih, w_hh, b_hh, lens_col, True)
    else:
        ref = bilstm_scan_pallas(xp[0], xp[1], b_ih, w_hh, b_hh, lens_col,
                                 True)
        got = bilstm_layer_pallas(x, w_ih, b_ih, w_hh, b_hh, lens_col, True)
    for a, b2 in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b2), np.asarray(a),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("fn,g", [(gru_layer_pallas, 3),
                                  (lstm_layer_pallas, 4)])
def test_fused_unidirectional_time_padding(fn, g):
    """T not divisible by the chunk: outputs sliced back to T exactly."""
    rng = np.random.default_rng(9)
    t, b, f, h = 11, 8, 16, 16  # chunk is 8 -> padded to 16
    x, lens, w_ih, b_ih, w_hh, b_hh = _mk(rng, 1, t, b, f, h, g)
    out = fn(x, w_ih, b_ih, w_hh, b_hh, True)
    assert out.shape == (t, b, h)
    ref = rnn_scan(x, jnp.full((b,), t, jnp.int32), w_ih, b_ih, w_hh, b_hh,
                   cell="gru" if g == 3 else "lstm", bidirectional=False,
                   compute_dtype=jnp.float32, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_layer_fits_heuristic():
    """Default DS2 shapes fuse; pathologically wide layers fall back."""
    assert fused_layer_fits(1312, 800, 3, 24)          # DS2 layer 0
    assert fused_layer_fits(800, 800, 3, 24)           # inner layers
    assert not fused_layer_fits(6400, 6400, 4, 24)     # would blow VMEM


def test_rnn_scan_padded_rows_are_inert():
    """Batch rows added by the 8-alignment pad (length 0) must not leak
    into real rows' outputs or grads through the fused kernel."""
    rng = np.random.default_rng(5)
    t, f, h, g = 9, 16, 16, 3
    x6 = jnp.asarray(rng.standard_normal((t, 6, f)).astype(np.float32))
    lens6 = jnp.asarray(np.array([9, 7, 5, 3, 9, 2], np.int32))
    d = 2
    w_ih = jnp.asarray(rng.standard_normal((d, f, g * h)).astype(np.float32)
                       * 0.2)
    b_ih = jnp.asarray(rng.standard_normal((d, g * h)).astype(np.float32))
    w_hh = jnp.asarray(rng.standard_normal((d, h, g * h)).astype(np.float32)
                       * 0.2)
    b_hh = jnp.asarray(rng.standard_normal((d, g * h)).astype(np.float32))
    kw = dict(cell="gru", bidirectional=True, compute_dtype=jnp.float32,
              impl="pallas_interpret")
    out6 = rnn_scan(x6, lens6, w_ih, b_ih, w_hh, b_hh, **kw)   # pads 6 -> 8
    x8 = jnp.pad(x6, ((0, 0), (0, 2), (0, 0)))
    lens8 = jnp.pad(lens6, (0, 2), constant_values=1)
    out8 = rnn_scan(x8, lens8, w_ih, b_ih, w_hh, b_hh, **kw)
    np.testing.assert_allclose(np.asarray(out6), np.asarray(out8)[:, :6],
                               rtol=1e-5, atol=1e-5)
