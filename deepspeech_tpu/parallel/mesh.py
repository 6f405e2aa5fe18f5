"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's torch.distributed DDP setup
(reference train.py:97-107, 804-809, 948-951): instead of per-process NCCL
groups, a single jitted program runs SPMD over a ``jax.sharding.Mesh`` with
two axes:

* ``data``  — batch-dimension sharding (the reference's only strategy);
  gradient all-reduce happens inside the compiled step over ICI/DCN.
* ``model`` — tensor sharding of the RNN gate matrices and the output head
  across chips, a new capability beyond the reference (its per-GPU model had
  to fit one device).

Multi-host: ``jax.distributed.initialize()`` replaces the TCP rendezvous
(reference train.py:804-809); ``jax.process_index() == 0`` replaces the
``is_leader`` rank check (train.py:809).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = mesh_utils.create_device_mesh((data, model), devices=devices)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(k, B, ...) superbatch sharding: microbatch axis replicated, batch
    axis over ``data`` (multi-step-per-dispatch, data/loader.py
    stack_microbatches)."""
    return NamedSharding(mesh, P(None, "data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict with every array sharded on its leading axis."""
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def param_spec(path: tuple, leaf) -> tuple:
    """Sharding rule candidates for one model parameter, best first.

    Bidirectional RNN weights shard their DIRECTION axis over ``model``
    (the parallel/tp_rnn.py scheme: each chip holds one direction's
    weights + moments and runs the recurrence locally — the sharding the
    Pallas kernels can actually execute without a weight all-gather);
    where that doesn't divide (unidirectional models, model > 2) they fall
    back to gate-dim sharding (GSPMD inserts the per-step collectives on
    the XLA scan path). The classifier head shards its output classes;
    everything else (biases, BN, convs) replicates — they are tiny.
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    last = names[-1] if names else ""
    in_rnn = any(str(n).startswith("rnn") for n in names)
    if in_rnn and last in ("w_ih", "w_hh"):
        # (D, F|H, G*H): directions first, gates as fallback
        return (P("model", None, None), P(None, None, "model"))
    if in_rnn and last in ("b_ih", "b_hh"):
        return (P("model", None), P(None, "model"))
    if "fc" in names and last == "kernel":
        return (P(None, "model"),)
    return (P(),)


def _spec_for_leaf(mesh: Mesh, path: tuple, leaf) -> P:
    """First `param_spec` candidate whose every sharded dim divides evenly
    over its mesh axis (e.g. bidirectional weights direction-shard on
    model=2 but gate-shard on model=4; a 30-class head on model=4 falls
    back to replication instead of erroring)."""
    shape = getattr(leaf, "shape", ())
    for spec in param_spec(path, leaf):
        if len(spec) > len(shape):
            continue
        if all(axis is None or shape[dim] % mesh.shape[axis] == 0
               for dim, axis in enumerate(spec)):
            return spec
    return P()


def make_param_shardings(mesh: Mesh, params) -> dict:
    """Tree of NamedShardings following :func:`param_spec`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_leaf(mesh, path, leaf)),
        params)


def make_state_shardings(mesh: Mesh, state):
    """Shardings for a whole TrainState (params + batch_stats + opt_state).

    Optimizer-state leaves (optax momentum/adam moments) mirror their
    parameter's sharding because their tree paths embed the parameter path
    (``opt_state[...].trace.rnn_0.cell.w_ih``), so :func:`param_spec`'s
    name-based rules apply unchanged; everything unmatched (counts, BN
    stats, step) replicates. This is what makes tensor-parallel training
    actually save memory: the gate-dim shards of w_ih/w_hh AND their
    momentum buffers both live only on their model-axis slice.
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_leaf(mesh, path, leaf)),
        state)


def shard_state(state, mesh: Mesh):
    """Place a TrainState on the mesh per :func:`make_state_shardings`."""
    return jax.tree.map(jax.device_put, state, make_state_shardings(mesh, state))


def shard_params(params, mesh: Mesh):
    shardings = make_param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)


def equalize_batch_padding(batch: dict) -> dict:
    """Multi-host: pad every non-batch dim of each local batch array to the
    max across processes.

    Rank-strided bins give different hosts different utterances, so the
    static bucket pads (audio samples / spectrogram frames / target length)
    can land on different bucket boundaries per host —
    :func:`local_batch_to_global` then assembles shards of unequal shape and
    the SPMD step deadlocks. One tiny host-side allgather of the dim sizes
    per batch (microseconds next to a train/eval step) makes the shapes
    agree; padding is zeros, which the length masks already ignore.
    """
    from jax.experimental import multihost_utils

    keys = sorted(k for k, v in batch.items()
                  if hasattr(v, "ndim") and v.ndim >= 2)
    if not keys:
        return batch
    dims = np.concatenate([np.asarray(batch[k].shape[1:], np.int64)
                           for k in keys])
    gmax = np.asarray(multihost_utils.process_allgather(dims)).max(axis=0)
    out = dict(batch)
    i = 0
    for k in keys:
        v = np.asarray(batch[k])
        want = tuple(gmax[i:i + v.ndim - 1])
        i += v.ndim - 1
        if tuple(v.shape[1:]) != want:
            pad = [(0, 0)] + [(0, int(w) - s)
                              for w, s in zip(want, v.shape[1:])]
            out[k] = np.pad(v, pad)
    return out


def local_batch_to_global(local_arrays: dict, mesh: Mesh) -> dict:
    """Multi-host: assemble per-host shards into globally-sharded arrays
    (each process feeds its own slice of the global batch)."""
    s = batch_sharding(mesh)
    out = {}
    for k, v in local_arrays.items():
        v = np.asarray(v)
        global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(s, v, global_shape)
    return out


# step outputs that are sharded over the global batch (leading axis)
_BATCH_METRIC_KEYS = ("per_sample", "greedy", "out_lens", "probs")


def metrics_to_local(metrics: dict, mesh: Mesh) -> dict:
    """Multi-host: turn batch-sharded step outputs back into THIS host's
    local rows (the inverse of :func:`local_batch_to_global`), so the host
    decode/curriculum loop can zip them with its local paths/targets.
    Fetching such arrays directly raises ("spans non-addressable devices");
    replicated outputs (loss, grad_norm, ...) pass through untouched."""
    from jax.experimental import multihost_utils

    out = dict(metrics)
    for k in _BATCH_METRIC_KEYS:
        v = out.get(k)
        if v is None or not hasattr(v, "sharding"):
            continue
        spec = P("data", *([None] * (v.ndim - 1)))
        out[k] = np.asarray(
            multihost_utils.global_array_to_host_local_array(v, mesh, spec))
    return out
