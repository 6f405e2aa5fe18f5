"""Banded-matmul conv vs jax.lax 2-D convolution oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepspeech_tpu.ops.banded_conv import banded_conv2d


def _oracle(x_btn, kernel, bias, f_in, strides, padding):
    """NHWC lax conv on the same data: (B, T, f_in*C_in) -> (B, T', f_out*C_out)
    with lane order f*C_out + c."""
    b, t, n = x_btn.shape
    c_in = n // f_in
    # (B, T, f, c) -> NHWC (B, f, T, c)
    x = jnp.transpose(x_btn.reshape(b, t, f_in, c_in), (0, 2, 1, 3))
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=strides,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias[None, None, None, :]
    # (B, f_out, T', c_out) -> (B, T', f_out*c_out)
    return jnp.transpose(y, (0, 2, 1, 3)).reshape(b, y.shape[2], -1)


CASES = [
    # f_in, c_in, c_out, k_f, k_t, strides, padding  (DS2 conv1 / conv2 + odd)
    (161, 1, 32, 41, 11, (2, 2), (20, 5)),
    (81, 32, 32, 21, 11, (2, 1), (10, 5)),
    (17, 3, 5, 7, 3, (1, 1), (3, 1)),
    (33, 2, 4, 5, 5, (3, 2), (2, 2)),
]


@pytest.mark.parametrize("freq_groups", [1, 3, 4])
@pytest.mark.parametrize("f_in,c_in,c_out,k_f,k_t,strides,padding", CASES)
def test_matches_lax_conv(f_in, c_in, c_out, k_f, k_t, strides, padding,
                          freq_groups):
    rng = np.random.default_rng(0)
    b, t = 2, 37
    x = jnp.asarray(rng.standard_normal((b, t, f_in * c_in)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((k_f, k_t, c_in, c_out)) * 0.2,
                         jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c_out) * 0.1, jnp.float32)

    f_out = (f_in + 2 * padding[0] - k_f) // strides[0] + 1
    got = banded_conv2d(x, kernel, bias, f_in, f_out, strides, padding,
                        freq_groups=freq_groups)
    want = _oracle(x, kernel, bias, f_in, strides, padding)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_gradients_match_lax_conv():
    rng = np.random.default_rng(1)
    f_in, c_in, c_out, k_f, k_t = 17, 3, 5, 7, 3
    strides, padding = (2, 1), (3, 1)
    b, t = 2, 19
    x = jnp.asarray(rng.standard_normal((b, t, f_in * c_in)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((k_f, k_t, c_in, c_out)) * 0.2,
                         jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c_out) * 0.1, jnp.float32)
    f_out = (f_in + 2 * padding[0] - k_f) // strides[0] + 1

    def loss_banded(x, k, bia):
        return jnp.sum(banded_conv2d(x, k, bia, f_in, f_out, strides,
                                     padding, freq_groups=3) ** 2)

    def loss_oracle(x, k, bia):
        return jnp.sum(_oracle(x, k, bia, f_in, strides, padding) ** 2)

    ga = jax.grad(loss_banded, argnums=(0, 1, 2))(x, kernel, bias)
    ge = jax.grad(loss_oracle, argnums=(0, 1, 2))(x, kernel, bias)
    for a, e, name in zip(ga, ge, ("dx", "dk", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


def test_gradients_match_unfolded(monkeypatch):
    """Force the tap-loop (non-folded) branches of both fwd and the custom
    stride-1 backward by shrinking the fold threshold."""
    from deepspeech_tpu.ops import banded_conv as bc

    monkeypatch.setattr(bc, "_FOLD_LANES", 1)
    rng = np.random.default_rng(2)
    f_in, c_in, c_out, k_f, k_t = 11, 2, 4, 5, 3
    strides, padding = (1, 1), (2, 1)
    b, t = 2, 13
    x = jnp.asarray(rng.standard_normal((b, t, f_in * c_in)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((k_f, k_t, c_in, c_out)) * 0.2,
                         jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c_out) * 0.1, jnp.float32)
    f_out = (f_in + 2 * padding[0] - k_f) // strides[0] + 1

    def loss_banded(x, k, bia):
        return jnp.sum(bc.banded_conv2d(x, k, bia, f_in, f_out, strides,
                                        padding, freq_groups=2) ** 2)

    def loss_oracle(x, k, bia):
        return jnp.sum(_oracle(x, k, bia, f_in, strides, padding) ** 2)

    ga = jax.grad(loss_banded, argnums=(0, 1, 2))(x, kernel, bias)
    ge = jax.grad(loss_oracle, argnums=(0, 1, 2))(x, kernel, bias)
    for a, e, name in zip(ga, ge, ("dx", "dk", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-3, atol=1e-3, err_msg=name)
