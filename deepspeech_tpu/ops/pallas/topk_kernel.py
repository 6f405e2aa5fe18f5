"""Pallas TPU total-order top-k for the beam-search candidate merge.

``lax.top_k`` over the ~4k merged beam candidates is ~75% of the on-device
beam step at width 128 (PERF.md "Beam merge"): XLA lowers it to a general
sort. This kernel exploits what XLA cannot know — the candidate count is
small enough that the whole (keys, indices) problem fits in a couple of
VMEM tiles — and runs a fully vectorized bitonic sorting network with no
gathers, no scatters and no data-dependent control flow: every stage is a
pair of lane/sublane rolls plus compare/selects on an (R, 128) tile, the
one shape the VPU is built for.

Ordering is *bit-equal* to TPU ``lax.top_k``: descending by the bitwise
total order on float32 (``+0.0 > -0.0``, ``-inf`` above negative NaNs),
ties broken by ascending original index. The float is mapped to a
monotone int32 key (`u ^ (0x7fffffff & (u >> 31))`, a self-inverse), the
network sorts (key desc, index asc), and row 0 of the sorted tile is the
answer.

Replaces the selection step of the reference's C++ beam search
(reference decoder.py:95-99 via ctcdecode's per-step candidate pruning);
consumed by :mod:`deepspeech_tpu.decoders.beam_device`.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def pallas_topk_supported() -> bool:
    """True when ``topk_total_order`` should use the Pallas kernel.

    OPT-IN (``DEEPSPEECH_TPU_PALLAS_TOPK=1``), unlike the other Pallas
    kernels: measured in-scan on a v5e at the beam shape (3840 -> 128),
    XLA's TopK custom call runs 2.4 us/op while this 78-stage bitonic
    network runs 7.2 us/op — the full-sort network does ~sort-equivalent
    work and XLA's tuned partial sort holds the frontier (PERF.md "Beam
    selection"). The kernel stays as the verified-bit-equal reference
    implementation and for shapes where XLA has no custom call."""
    if os.environ.get("DEEPSPEECH_TPU_NO_PALLAS"):
        return False
    if not os.environ.get("DEEPSPEECH_TPU_PALLAS_TOPK"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _monotone_key(u: jnp.ndarray) -> jnp.ndarray:
    """float32 bits (as int32) -> int32 key with the same total order as
    the float bitwise order. Self-inverse (sign bit is preserved)."""
    return u ^ (jnp.int32(0x7FFFFFFF) & (u >> 31))


def _xor_partner(x: jnp.ndarray, bit: jnp.ndarray, m: int, size: int,
                 axis: int) -> jnp.ndarray:
    """Value at slot ``i ^ m`` along ``axis``: two circular rolls + select
    on the slot's own stride bit (XOR pairing never crosses the array, so
    the circular wrap is never observed)."""
    fwd = pltpu.roll(x, size - m, axis)   # slot i reads i + m
    bwd = pltpu.roll(x, m, axis)          # slot i reads i - m
    return jnp.where(bit == 0, fwd, bwd)


def _topk_kernel(s_ref, vals_ref, idx_ref, *, rows: int, n_stages_k: int):
    x = s_ref[...]                                    # (rows, 128) f32
    key = _monotone_key(pltpu.bitcast(x, jnp.int32))
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    pos = row * _LANES + lane                         # fixed slot position
    idx = pos                                         # element payload

    # Bitonic sort over rows*128 slots in row-major order, descending by
    # (key, -idx). Direction/half bits depend on the fixed slot position,
    # so they are plain iota arithmetic — the network is branch-free.
    for kk_log in range(1, n_stages_k + 1):
        kk = 1 << kk_log
        desc = (pos & kk) == 0
        for s_log in range(kk_log - 1, -1, -1):
            s = 1 << s_log
            lower = (pos & s) == 0
            if s >= _LANES:
                m = s // _LANES
                bit = (row // m) & 1
                pkey = _xor_partner(key, bit, m, rows, 0)
                pidx = _xor_partner(idx, bit, m, rows, 0)
            else:
                bit = (lane // s) & 1
                pkey = _xor_partner(key, bit, s, _LANES, 1)
                pidx = _xor_partner(idx, bit, s, _LANES, 1)
            wins = (key > pkey) | ((key == pkey) & (idx < pidx))
            keep = wins == (lower == desc)
            key = jnp.where(keep, key, pkey)
            idx = jnp.where(keep, idx, pidx)

    vals_ref[...] = pltpu.bitcast(_monotone_key(key[:1, :]), jnp.float32)
    idx_ref[...] = idx[:1, :]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _topk_pallas(score: jnp.ndarray, k: int, interpret: bool = False):
    n = score.shape[-1]
    rows = -(-n // _LANES)
    rows_p = 1
    while rows_p < rows:
        rows_p *= 2
    npad = rows_p * _LANES
    # Padding is plain -inf: pad indices sit past every real index, so a
    # real -inf always outranks padding under the (key, index) tie rule.
    padded = jnp.pad(score.astype(jnp.float32), (0, npad - n),
                     constant_values=-jnp.inf).reshape(rows_p, _LANES)
    kern = functools.partial(_topk_kernel, rows=rows_p,
                             n_stages_k=npad.bit_length() - 1)
    vals, idx = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((1, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((1, _LANES), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(padded)
    return vals[0, :k], idx[0, :k]


def topk_total_order(score: jnp.ndarray, k: int,
                     interpret: bool = False,
                     force: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(values, indices) of the top ``k`` of a 1-D float32 ``score``.

    Bit-equal to TPU ``lax.top_k`` (descending bitwise-value order, ties by
    ascending index). Uses the Pallas network on TPU for ``k <= 128``;
    otherwise falls back to ``lax.top_k``. ``force=True`` runs the kernel
    regardless of backend (tests use it with ``interpret=True``)."""
    if k <= _LANES and score.shape[-1] >= k and (
            force or (not interpret and pallas_topk_supported())):
        return _topk_pallas(score, k, interpret=interpret)
    return jax.lax.top_k(score, k)
