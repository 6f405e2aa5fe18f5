"""Pallas total-order top-k: bit-equality with lax.top_k's tie rule.

The kernel must reproduce TPU ``lax.top_k`` exactly: descending by the
BITWISE float total order (so ``+0.0 > -0.0``), ties broken by ascending
original index. The oracle here is an independent numpy lexsort over the
monotone int32 key — not lax.top_k itself — so the test also pins the
intended semantics on backends whose top_k breaks bitwise ties
differently.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from deepspeech_tpu.ops.pallas.topk_kernel import topk_total_order


def ref_topk(x: np.ndarray, k: int):
    u = x.view(np.int32).astype(np.int64)
    key = u ^ (0x7FFFFFFF & (u >> 31))
    order = np.lexsort((np.arange(len(x)), -key))
    return x[order[:k]], order[:k].astype(np.int32)


def run(x: np.ndarray, k: int):
    v, i = topk_total_order(jnp.asarray(x), k, interpret=True, force=True)
    return np.asarray(v), np.asarray(i)


@pytest.mark.parametrize("n,k", [(300, 10), (960, 32), (3840, 128)])
def test_matches_total_order(n, k):
    rng = np.random.default_rng(n + k)
    x = rng.standard_normal(n).astype(np.float32)
    x[rng.integers(0, n, n // 6)] = np.float32(1.5)          # exact ties
    x[rng.integers(0, n, n // 8)] = np.float32(-np.inf)
    v, i = run(x, k)
    rv, ri = ref_topk(x, k)
    assert np.array_equal(v.view(np.int32), rv.view(np.int32))
    assert np.array_equal(i, ri)


def test_signed_zero_and_inf_edges():
    # +0.0 must outrank -0.0 regardless of position; infs at both ends
    x = np.array([-0.0, 1.0, 0.0, -np.inf, np.inf, -0.0, 0.0, 1.0],
                 np.float32)
    v, i = run(x, 5)
    rv, ri = ref_topk(x, 5)
    assert np.array_equal(v.view(np.int32), rv.view(np.int32))
    assert np.array_equal(i, ri)
    assert list(i[:2]) == [4, 1 if x[1] >= x[7] else 7]  # inf then first 1.0


def test_all_equal_is_index_order():
    x = np.full(600, 0.25, np.float32)
    v, i = run(x, 17)
    assert np.array_equal(i, np.arange(17))
    assert np.all(v == 0.25)


def test_fuzz_vs_reference():
    rng = np.random.default_rng(7)
    for _ in range(12):
        n = int(rng.integers(130, 2500))
        k = int(rng.integers(1, 129))
        x = (rng.standard_normal(n) * rng.choice([1e-3, 1.0, 1e30])
             ).astype(np.float32)
        x[rng.integers(0, n, n // 5)] = np.float32(
            rng.choice([0.0, -0.0, np.inf, -np.inf, 3.25]))
        v, i = run(x, k)
        rv, ri = ref_topk(x, k)
        assert np.array_equal(v.view(np.int32), rv.view(np.int32)), (n, k)
        assert np.array_equal(i, ri), (n, k)
