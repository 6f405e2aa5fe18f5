"""bfloat16 compute path: numerics close to f32, training still converges."""

import numpy as np

import jax
import jax.numpy as jnp

from deepspeech_tpu.audio import AudioConf
from deepspeech_tpu.models import DeepSpeech2
from deepspeech_tpu.ops.rnn import rnn_scan
from deepspeech_tpu.train import StepConfig, TrainState, build_optimizer, make_train_step


def test_rnn_scan_bf16_close_to_f32():
    rng = np.random.default_rng(0)
    t, b, f, h = 12, 3, 8, 16
    x = jnp.asarray(rng.standard_normal((t, b, f)).astype(np.float32))
    lengths = jnp.asarray([12, 9, 5])
    w_ih = jnp.asarray(rng.standard_normal((2, f, 3 * h)).astype(np.float32) * 0.2)
    b_ih = jnp.zeros((2, 3 * h))
    w_hh = jnp.asarray(rng.standard_normal((2, h, 3 * h)).astype(np.float32) * 0.2)
    b_hh = jnp.zeros((2, 3 * h))
    ref = rnn_scan(x, lengths, w_ih, b_ih, w_hh, b_hh)
    fast = rnn_scan(x, lengths, w_ih, b_ih, w_hh, b_hh,
                    compute_dtype=jnp.bfloat16)
    assert fast.dtype == jnp.float32  # state/accumulation stay f32
    err = float(jnp.abs(ref - fast).max())
    scale = float(jnp.abs(ref).max())
    assert err < 0.05 * max(scale, 1.0), (err, scale)


def test_bf16_model_trains():
    model = DeepSpeech2(num_classes=30, hidden_size=16, hidden_layers=1,
                        compute_dtype=jnp.bfloat16)
    tx = build_optimizer("sgd", lr=3e-3, momentum=0.9)
    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32) * 0.1),
        "audio_lengths": jnp.asarray([7840, 4000]),
        "targets": jnp.asarray(rng.integers(1, 30, (2, 5)).astype(np.int32)),
        "target_lengths": jnp.asarray([5, 5]),
    }
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 161, 51)),
                           jnp.asarray([51]), False)
    # params stay f32 regardless of compute dtype
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(variables["params"]))
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, StepConfig(audio_conf=AudioConf()),
                           donate=False)
    losses = []
    for i in range(4):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
