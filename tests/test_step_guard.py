"""Non-finite guard in the train step: a poisoned batch must not move the
parameters or the optimizer state (reference skips optimizer.step() on NaN
logits, train.py:625-630)."""

import numpy as np

import jax
import jax.numpy as jnp

from deepspeech_tpu.audio import AudioConf
from deepspeech_tpu.models import DeepSpeech2
from deepspeech_tpu.train import (StepConfig, TrainState, build_optimizer,
                                  make_train_step)


def _batch(poison: bool):
    rng = np.random.default_rng(0)
    s = int(16000 * 0.3)
    audio = rng.standard_normal((2, s)).astype(np.float32) * 0.1
    if poison:
        audio[0, 100:200] = np.nan
    return {
        "audio": jnp.asarray(audio),
        "audio_lengths": jnp.asarray(np.full(2, s - 160, np.int32)),
        "targets": jnp.asarray(rng.integers(1, 8, (2, 4)).astype(np.int32)),
        "target_lengths": jnp.asarray(np.full(2, 4, np.int32)),
    }


def test_nan_batch_skips_update_clean_batch_applies():
    model = DeepSpeech2(num_classes=8, hidden_size=16, hidden_layers=1,
                        cell="gru", bidirectional=True)
    tx = build_optimizer("sgd", lr=1e-2, momentum=0.9, max_norm=100.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 161, 51)),
                           jnp.asarray([51]), False)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, StepConfig(audio_conf=AudioConf()),
                           donate=False)
    p0 = jax.device_get(state.params)
    m0 = jax.device_get(state.opt_state)

    bad_state, metrics = step(state, _batch(poison=True),
                              jax.random.PRNGKey(1))
    assert bool(metrics["step_skipped"])
    for a, e in zip(jax.tree_util.tree_leaves(jax.device_get(bad_state.params)),
                    jax.tree_util.tree_leaves(p0)):
        np.testing.assert_array_equal(a, e)
    for a, e in zip(
            jax.tree_util.tree_leaves(jax.device_get(bad_state.opt_state)),
            jax.tree_util.tree_leaves(m0)):
        np.testing.assert_array_equal(a, e)

    good_state, metrics = step(state, _batch(poison=False),
                               jax.random.PRNGKey(1))
    assert not bool(metrics["step_skipped"])
    assert np.isfinite(float(metrics["loss"]))
    changed = any(
        not np.array_equal(a, e) for a, e in zip(
            jax.tree_util.tree_leaves(jax.device_get(good_state.params)),
            jax.tree_util.tree_leaves(p0)))
    assert changed, "clean batch did not update parameters"
