"""Self-describing single-file checkpoints.

Same contract as the reference package (reference model.py:426-468 +
restore sites train.py:827-872): one file holds hyperparameters, labels,
audio_conf, model weights, optimizer state, loop counters, and the full
metric history so plots and mid-epoch resume work. Inference recovers the
entire front-end config from the checkpoint (reference test.py:49-63,
transcribe.py:81-82).

Format: a zip (numpy ``.npz``) containing one JSON document for the
package structure plus one entry per array leaf — loadable with
``allow_pickle=False``, i.e. **no code execution on load** (the reference's
``torch.load``/pickle format runs arbitrary bytecode from untrusted files).
Writes are atomic (tmp + rename). Legacy pickle checkpoints from older
versions of this package are still readable, but only behind an explicit
``allow_pickle=True`` / ``DEEPSPEECH_ALLOW_PICKLE=1`` opt-in.
"""

from __future__ import annotations

import io
import json
import os
import zipfile

import jax
import numpy as np

FORMAT_VERSION = "0.2.0-tpu"
_ARRAY_KEY = "__array__"
_META_ENTRY = "__meta__.json"


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def serialize(model_meta: dict, state, labels: str, audio_conf: dict,
              epoch=None, iteration=None, checkpoint=None, avg_loss=None,
              history: dict | None = None, meta: dict | None = None) -> dict:
    """Build a checkpoint package. ``model_meta`` carries the architecture
    fields (hidden_size, hidden_layers, rnn_type, bidirectional, bnm,
    dropout, cnn_width, ...)."""
    package = {
        "version": FORMAT_VERSION,
        "labels": labels,
        "audio_conf": dict(audio_conf),
        **model_meta,
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "optim_state": _to_host(state.opt_state),
        "step": int(state.step),
        "checkpoint": checkpoint,
    }
    if epoch is not None:
        package["epoch"] = epoch + 1  # reference increments for readability
    if iteration is not None:
        package["iteration"] = iteration
    if avg_loss is not None:
        package["avg_loss"] = avg_loss
    if history:
        package.update({k: [float(x) for x in v]
                        for k, v in history.items()})
    if meta is not None:
        package["meta"] = meta
    return package


def _extract_arrays(obj, arrays: list):
    """Recursively replace ndarray leaves with {"__array__": index} markers.
    Tuples/namedtuples become lists (restore rebuilds structure from the
    live TrainState template, see :func:`restore_state`); numpy scalars
    become python scalars."""
    if isinstance(obj, np.ndarray):
        arrays.append(obj)
        return {_ARRAY_KEY: len(arrays) - 1}
    if isinstance(obj, np.generic):
        return obj.item()
    if isinstance(obj, dict):
        return {str(k): _extract_arrays(v, arrays) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_extract_arrays(v, arrays) for v in obj]
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    raise TypeError(f"checkpoint leaf of unsupported type {type(obj)!r}")


def _insert_arrays(obj, arrays):
    if isinstance(obj, dict):
        if set(obj) == {_ARRAY_KEY}:
            return arrays[obj[_ARRAY_KEY]]
        return {k: _insert_arrays(v, arrays) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_insert_arrays(v, arrays) for v in obj]
    return obj


def save(path: str, package: dict):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays: list = []
    struct = _extract_arrays(package, arrays)
    tmp = path + ".tmp"
    # hand-rolled zip writer (= npz layout): numpy's savez buffers through
    # temp files per array; this streams each leaf straight in
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(_META_ENTRY, json.dumps(struct))
        for i, a in enumerate(arrays):
            buf = io.BytesIO()
            # NOT ascontiguousarray: it promotes 0-d arrays to 1-d, which
            # would corrupt scalar leaves (optimizer count, learning rate)
            np.lib.format.write_array(buf, np.asarray(a, order="C"),
                                      allow_pickle=False)
            zf.writestr(f"a{i}.npy", buf.getvalue())
    os.replace(tmp, path)


def _load_pickle(path: str) -> dict:
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


def load(path: str, allow_pickle: bool | None = None) -> dict:
    """Read a checkpoint package.

    Zip/npz packages (the current format) load with no code execution.
    Legacy pickle files require ``allow_pickle=True`` or
    ``DEEPSPEECH_ALLOW_PICKLE=1`` — pickle.load of an untrusted checkpoint
    is arbitrary code execution.
    """
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"PK":
        with zipfile.ZipFile(path) as zf:
            struct = json.loads(zf.read(_META_ENTRY).decode("utf8"))
            arrays = []
            i = 0
            names = set(zf.namelist())
            while f"a{i}.npy" in names:
                with zf.open(f"a{i}.npy") as f:
                    arrays.append(
                        np.lib.format.read_array(f, allow_pickle=False))
                i += 1
        return _insert_arrays(struct, arrays)
    if allow_pickle is None:
        allow_pickle = os.environ.get("DEEPSPEECH_ALLOW_PICKLE", "") == "1"
    if not allow_pickle:
        raise ValueError(
            f"{path} is a legacy pickle checkpoint; loading pickle executes "
            "arbitrary code. Pass allow_pickle=True (or set "
            "DEEPSPEECH_ALLOW_PICKLE=1) only for files you trust, then "
            "re-save to get the safe format.")
    return _load_pickle(path)


def restore_state(package: dict, state):
    """Load package arrays into a freshly-initialized TrainState. Structure
    comes from the live template: the stored optimizer state (a list/tuple
    tree after JSON round-trip) is re-flattened into the template's optax
    namedtuple treedef, so both current and legacy packages restore."""
    import jax.numpy as jnp

    def like(template, stored):
        t_def = jax.tree_util.tree_structure(template)
        t_leaves = jax.tree_util.tree_leaves(template)
        leaves = jax.tree_util.tree_leaves(stored)
        assert len(leaves) == len(t_leaves), (
            f"checkpoint/optimizer mismatch: {len(leaves)} stored leaves vs "
            f"{len(t_leaves)} expected")
        out = []
        for t, s in zip(t_leaves, leaves):
            s = jnp.asarray(s)
            ts = getattr(t, "shape", None)
            assert ts is None or s.shape == ts, (
                f"checkpoint leaf shape {s.shape} != expected {ts}")
            out.append(s)
        return jax.tree_util.tree_unflatten(t_def, out)

    return state.replace(
        params=like(state.params, package["params"]),
        batch_stats=like(state.batch_stats, package["batch_stats"]),
        opt_state=like(state.opt_state, package["optim_state"]),
        step=jnp.asarray(package.get("step", 0), jnp.int32))


def restore_params_only(package: dict, state):
    """Finetune path (reference train.py:841): weights only, fresh optimizer."""
    import jax.numpy as jnp

    def like(template, stored):
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template),
            [jnp.asarray(s) for s in jax.tree_util.tree_leaves(stored)])

    return state.replace(
        params=like(state.params, package["params"]),
        batch_stats=like(state.batch_stats, package["batch_stats"]))
