"""Self-describing single-file checkpoints.

Same contract as the reference package (reference model.py:426-468 +
restore sites train.py:827-872): one file holds hyperparameters, labels,
audio_conf, model weights, optimizer state, loop counters, and the full
metric history so plots and mid-epoch resume work. Inference recovers the
entire front-end config from the checkpoint (reference test.py:49-63,
transcribe.py:81-82).

Format: pickle of a plain dict whose array leaves are numpy (host) arrays.
Writes are atomic (tmp + rename), matching the reference's npy cache trick
(data_loader_aug.py:207-208).
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np

FORMAT_VERSION = "0.1.0-tpu"


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
        package.update(_to_host(history))
    if meta is not None:
        package["meta"] = meta
    return package


def save(path: str, package: dict):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(package, f, protocol=4)
    os.replace(tmp, path)


def load(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_state(package: dict, state):
    """Load package arrays into a freshly-initialized TrainState (shape check
    via tree structure match)."""
    import jax.numpy as jnp

    def like(template, stored):
        return jax.tree.map(lambda t, s: jnp.asarray(s), template, stored)

    return state.replace(
        params=like(state.params, package["params"]),
        batch_stats=like(state.batch_stats, package["batch_stats"]),
        opt_state=like(state.opt_state, package["optim_state"]),
        step=jnp.asarray(package.get("step", 0), jnp.int32))


def restore_params_only(package: dict, state):
    """Finetune path (reference train.py:841): weights only, fresh optimizer."""
    import jax.numpy as jnp

    return state.replace(
        params=jax.tree.map(lambda t, s: jnp.asarray(s),
                            state.params, package["params"]),
        batch_stats=jax.tree.map(lambda t, s: jnp.asarray(s),
                                 state.batch_stats, package["batch_stats"]))
