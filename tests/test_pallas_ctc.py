"""Pallas fused CTC (alpha/beta + analytic grad) vs the XLA scan path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepspeech_tpu.ops.ctc import ctc_loss


def _rand_case(rng, b=4, t=37, c=8, lmax=7):
    logits = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    logit_lengths = jnp.asarray(rng.integers(lmax * 2 + 2, t + 1, b), jnp.int32)
    targets = jnp.asarray(rng.integers(1, c, (b, lmax)), jnp.int32)
    target_lengths = jnp.asarray(rng.integers(0, lmax + 1, b), jnp.int32)
    return logits, logit_lengths, targets, target_lengths


def test_ctc_pallas_loss_matches_xla():
    rng = np.random.default_rng(0)
    args = _rand_case(rng)
    want = ctc_loss(*args, impl="xla")
    got = ctc_loss(*args, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_ctc_pallas_loss_full_lengths():
    rng = np.random.default_rng(1)
    b, t, c, lmax = 3, 29, 6, 5
    logits = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    ll = jnp.asarray([t, t, t], jnp.int32)
    targets = jnp.asarray(rng.integers(1, c, (b, lmax)), jnp.int32)
    tl = jnp.asarray([lmax, 3, 0], jnp.int32)
    want = ctc_loss(logits, ll, targets, tl, impl="xla")
    got = ctc_loss(logits, ll, targets, tl, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_ctc_pallas_grads_match_xla():
    rng = np.random.default_rng(2)
    logits, ll, targets, tl = _rand_case(rng, b=3, t=25, c=7, lmax=5)

    def mean_loss(impl):
        def f(lg):
            per = ctc_loss(lg, ll, targets, tl, impl=impl)
            finite = jnp.isfinite(per)
            return jnp.where(finite, per, 0.0).sum() / lg.shape[0]
        return f

    g_want = jax.grad(mean_loss("xla"))(logits)
    g_got = jax.grad(mean_loss("pallas_interpret"))(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-3, atol=1e-4)


def test_ctc_pallas_impossible_alignment_inf_loss_zero_grad():
    # target longer than logits: +inf loss, zero grad (warp-ctc semantics)
    logits = jnp.zeros((1, 4, 5), jnp.float32)
    ll = jnp.asarray([4], jnp.int32)
    targets = jnp.asarray([[1, 2, 1, 2, 1, 2]], jnp.int32)
    tl = jnp.asarray([6], jnp.int32)
    loss = ctc_loss(logits, ll, targets, tl, impl="pallas_interpret")
    assert not bool(np.isfinite(np.asarray(loss))[0])

    def f(lg):
        per = ctc_loss(lg, ll, targets, tl, impl="pallas_interpret")
        return jnp.where(jnp.isfinite(per), per, 0.0).sum()

    g = jax.grad(f)(logits)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=0)


def test_ctc_pallas_vs_brute_force_tiny():
    """Exact enumeration oracle on a tiny case."""
    from itertools import product
    rng = np.random.default_rng(3)
    t, c = 5, 3
    target = [1, 2]
    logits = rng.standard_normal((1, t, c)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)

    def collapse(path):
        out, prev = [], None
        for p in path:
            if p != prev and p != 0:
                out.append(p)
            prev = p
        return out

    total = -np.inf
    for path in product(range(c), repeat=t):
        if collapse(path) == target:
            lpv = sum(float(lp[0, i, p]) for i, p in enumerate(path))
            total = np.logaddexp(total, lpv)
    want = -total
    got = float(ctc_loss(jnp.asarray(logits), jnp.asarray([t]),
                         jnp.asarray([target]), jnp.asarray([2]),
                         impl="pallas_interpret")[0])
    assert abs(got - want) < 1e-4
