"""Mesh-parallel numerics: DP and DP x TP training steps must match the
single-device step bit-for-bit-ish (same inputs, same update math).

The reference's only strategy is DDP data parallelism (train.py:948-951);
the model axis (tensor-sharded RNN gates + classifier head,
parallel/mesh.py) is a new capability — both are checked for numeric
parity on the 8-device CPU mesh from conftest.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepspeech_tpu.audio import AudioConf
from deepspeech_tpu.models import DeepSpeech2
from deepspeech_tpu.parallel import (batch_sharding, make_mesh,
                                     make_param_shardings, replicated,
                                     shard_batch)
from deepspeech_tpu.train import (StepConfig, TrainState, build_optimizer,
                                  make_train_step)

NUM_CLASSES = 12


def _setup(b=8):
    rng = np.random.default_rng(0)
    s = int(16000 * 0.3)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((b, s)).astype(np.float32)
                             * 0.1),
        "audio_lengths": jnp.asarray(np.full(b, s - 160, np.int32)),
        "targets": jnp.asarray(
            rng.integers(1, NUM_CLASSES, (b, 6)).astype(np.int32)),
        "target_lengths": jnp.asarray(np.full(b, 6, np.int32)),
    }
    model = DeepSpeech2(num_classes=NUM_CLASSES, hidden_size=16,
                        hidden_layers=2, cell="gru", bidirectional=True)
    tx = build_optimizer("sgd", lr=3e-4, momentum=0.9, max_norm=100.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 161, 51)),
                           jnp.asarray([51]), False)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, StepConfig(audio_conf=AudioConf()),
                           donate=False)
    return model, tx, state, step, batch


def _run_steps(state, step, batch, n=2):
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(n):
        state, m = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
    return losses, jax.device_get(state.params)


@pytest.mark.parametrize("data,model_axis", [(8, 1), (4, 2)])
def test_mesh_step_matches_single_device(data, model_axis):
    model, tx, state, step, batch = _setup()
    ref_losses, ref_params = _run_steps(state, step, batch)

    mesh = make_mesh(data=data, model=model_axis)
    with jax.set_mesh(mesh):
        param_sh = make_param_shardings(mesh, state.params)
        sstate = state.replace(
            params=jax.tree.map(jax.device_put, state.params, param_sh),
            batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
            opt_state=jax.device_put(state.opt_state, replicated(mesh)),
            step=jax.device_put(state.step, replicated(mesh)))
        sbatch = shard_batch(batch, mesh)
        losses, params = _run_steps(sstate, step, sbatch)

    np.testing.assert_allclose(losses, ref_losses, rtol=2e-4, atol=2e-4)
    flat_ref = jax.tree_util.tree_leaves(ref_params)
    flat = jax.tree_util.tree_leaves(params)
    for a, e in zip(flat, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=5e-4, atol=5e-4)


def test_param_spec_shards_rnn_weights():
    mesh = make_mesh(data=4, model=2)
    _, _, state, _, _ = _setup()
    sh = make_param_shardings(mesh, state.params)
    # model=2 + bidirectional: DIRECTION sharding (each chip holds one
    # direction's weights; parallel/tp_rnn.py runs its recurrence locally)
    w_ih = sh["rnn0"]["w_ih"]
    assert w_ih.spec == jax.sharding.PartitionSpec("model", None, None)
    assert sh["fc"]["kernel"].spec == jax.sharding.PartitionSpec(
        None, "model")
    assert sh["conv"]["conv0"]["kernel"].spec == jax.sharding.PartitionSpec()
    # batch sharding splits the leading axis over the data axis
    assert batch_sharding(mesh).spec == jax.sharding.PartitionSpec("data")
