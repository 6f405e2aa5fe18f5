"""CTC loss vs torch.nn.functional.ctc_loss (values and gradients) and a
brute-force path-enumeration oracle on tiny cases."""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepspeech_tpu.ops.ctc import ctc_loss, ctc_loss_mean

torch = pytest.importorskip("torch")


def _rand_case(rng, b=4, t=20, c=6, lmax=7):
    logits = rng.standard_normal((b, t, c)).astype(np.float32)
    logit_lengths = rng.integers(lmax + 2, t + 1, b)
    target_lengths = rng.integers(1, lmax + 1, b)
    targets = rng.integers(1, c, (b, lmax))
    return logits, logit_lengths, targets, target_lengths


def _torch_ctc(logits, logit_lengths, targets, target_lengths):
    lp = torch.log_softmax(torch.from_numpy(logits), dim=-1).transpose(0, 1)
    return torch.nn.functional.ctc_loss(
        lp, torch.from_numpy(targets), torch.tensor(logit_lengths),
        torch.tensor(target_lengths), blank=0, reduction="none",
        zero_infinity=False)


def test_ctc_values_match_torch():
    rng = np.random.default_rng(0)
    for _ in range(5):
        logits, ll, tg, tl = _rand_case(rng)
        ours = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(ll),
                                   jnp.asarray(tg), jnp.asarray(tl)))
        ref = _torch_ctc(logits, ll, tg, tl).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ctc_gradients_match_torch():
    rng = np.random.default_rng(1)
    logits, ll, tg, tl = _rand_case(rng, b=3, t=12, c=5, lmax=4)

    g_ours = np.asarray(jax.grad(
        lambda lg: ctc_loss(lg, jnp.asarray(ll), jnp.asarray(tg),
                            jnp.asarray(tl)).sum())(jnp.asarray(logits)))

    lt = torch.from_numpy(logits).requires_grad_(True)
    lp = torch.log_softmax(lt, dim=-1).transpose(0, 1)
    loss = torch.nn.functional.ctc_loss(
        lp, torch.from_numpy(tg), torch.tensor(ll), torch.tensor(tl),
        blank=0, reduction="sum", zero_infinity=False)
    loss.backward()
    np.testing.assert_allclose(g_ours, lt.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_ctc_repeated_labels():
    """Repeats force blank transitions — the can_skip logic under test."""
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((2, 15, 4)).astype(np.float32)
    targets = np.array([[1, 1, 2, 2], [3, 3, 3, 3]], dtype=np.int64)
    ll = np.array([15, 15])
    tl = np.array([4, 4])
    ours = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(ll),
                               jnp.asarray(targets), jnp.asarray(tl)))
    ref = _torch_ctc(logits, ll, targets, tl).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_ctc_impossible_alignment_is_inf():
    # target needs 2L+1 > T slots (repeats): L=3 same label needs T >= 5
    logits = np.zeros((1, 3, 4), np.float32)
    targets = np.array([[1, 1, 1]])
    out = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray([3]),
                              jnp.asarray(targets), jnp.asarray([3])))
    assert np.isinf(out[0])
    # and the mean-loss wrapper excludes it instead of poisoning the batch
    m = ctc_loss_mean(jnp.asarray(logits), jnp.asarray([3]),
                      jnp.asarray(targets), jnp.asarray([3]))
    assert np.isfinite(float(m))


def test_ctc_brute_force_tiny():
    """Sum over all alignment paths explicitly for T=4, C=3, target [1,2]."""
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((1, 4, 3)).astype(np.float32)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))[0]
    target = [1, 2]

    def collapse(path):
        out = []
        prev = None
        for p in path:
            if p != 0 and p != prev:
                out.append(p)
            prev = p
        return out

    total = 0.0
    for path in itertools.product(range(3), repeat=4):
        if collapse(path) == target:
            p = 1.0
            for t_, c_ in enumerate(path):
                p *= probs[t_, c_]
            total += p
    ours = float(ctc_loss(jnp.asarray(logits), jnp.asarray([4]),
                          jnp.asarray([target]), jnp.asarray([2]))[0])
    np.testing.assert_allclose(ours, -np.log(total), rtol=1e-5)


def test_ctc_masking_ignores_padded_frames():
    """Changing logits past logit_length must not change the loss."""
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((1, 10, 5)).astype(np.float32)
    tg = np.array([[1, 2, 3]])
    a = ctc_loss(jnp.asarray(logits), jnp.asarray([6]), jnp.asarray(tg),
                 jnp.asarray([3]))
    logits2 = logits.copy()
    logits2[:, 6:] = 99.0
    b = ctc_loss(jnp.asarray(logits2), jnp.asarray([6]), jnp.asarray(tg),
                 jnp.asarray([3]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
