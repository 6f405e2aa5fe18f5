"""Waveform wire-format round trips (data/loader.py BucketSpec.wire_dtype).

The collate step may quantize waveforms for the host->device link (int16
linear, mulaw8 companded); the train step decodes on device. These tests
bound the reconstruction error and prove the train step consumes every
format.
"""

import numpy as np

import jax
import jax.numpy as jnp

from deepspeech_tpu.data.loader import BucketSpec, collate_batch


def _samples(n=3, seconds=0.3, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        s = int(16000 * seconds) + 100 * i
        y = (0.5 * np.sin(2 * np.pi * 300 * np.arange(s) / 16000)
             + 0.05 * rng.standard_normal(s)).astype(np.float32)
        out.append({"audio": y, "target": np.array([1, 2, 3], np.int32),
                    "path": f"u{i}.wav"})
    return out


def _decode_device(batch):
    """Replicate the train step's on-device decode (train/step.py)."""
    audio = jnp.asarray(batch["audio"])
    if "audio_scale" in batch:
        scale = jnp.asarray(batch["audio_scale"])
        if audio.dtype == jnp.int8:
            v = audio.astype(jnp.float32) * (1.0 / 127.0)
            audio = (jnp.sign(v) * jnp.expm1(jnp.abs(v) * jnp.log(256.0))
                     * (1.0 / 255.0)) * scale[:, None]
        else:
            audio = audio.astype(jnp.float32) * scale[:, None]
    return np.asarray(audio)


def _snr_db(ref, rec):
    err = ref - rec
    return 10 * np.log10(np.square(ref).sum() / max(np.square(err).sum(),
                                                    1e-30))


def test_float32_wire_exact():
    samples = _samples()
    batch = collate_batch(samples, bucket=BucketSpec(wire_dtype="float32"))
    ref = collate_batch(samples, bucket=BucketSpec(wire_dtype="float32"))
    np.testing.assert_array_equal(_decode_device(batch), ref["audio"])


def test_int16_wire_near_exact():
    samples = _samples()
    ref = collate_batch(samples, bucket=BucketSpec(wire_dtype="float32"))
    batch = collate_batch(samples, bucket=BucketSpec(wire_dtype="int16"))
    assert batch["audio"].dtype == np.int16
    rec = _decode_device(batch)
    for i in range(len(samples)):
        n = int(batch["audio_lengths"][i])
        assert _snr_db(ref["audio"][i, :n], rec[i, :n]) > 85.0


def test_mulaw8_wire_snr():
    samples = _samples()
    ref = collate_batch(samples, bucket=BucketSpec(wire_dtype="float32"))
    batch = collate_batch(samples, bucket=BucketSpec(wire_dtype="mulaw8"))
    assert batch["audio"].dtype == np.int8
    rec = _decode_device(batch)
    for i in range(len(samples)):
        n = int(batch["audio_lengths"][i])
        snr = _snr_db(ref["audio"][i, :n], rec[i, :n])
        assert snr > 30.0, snr  # G.711-class companding


def test_train_step_consumes_every_wire_format():
    from deepspeech_tpu.audio import AudioConf
    from deepspeech_tpu.models import DeepSpeech2
    from deepspeech_tpu.train import (StepConfig, TrainState, build_optimizer,
                                      make_train_step)

    model = DeepSpeech2(num_classes=30, hidden_size=16, hidden_layers=1,
                        cell="gru", bidirectional=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 161, 51)), jnp.asarray([51]), False)
    tx = build_optimizer("sgd", lr=1e-4, momentum=0.9, max_norm=100.0)
    step = make_train_step(model, tx, StepConfig(audio_conf=AudioConf()),
                           donate=False)
    samples = _samples(n=2, seconds=0.4)
    losses = {}
    for wire in ("float32", "int16", "mulaw8"):
        state = TrainState.create(variables, tx)
        batch = collate_batch(samples, bucket=BucketSpec(wire_dtype=wire))
        batch = {k: v for k, v in batch.items() if k != "paths"}
        _, m = step(state, batch, jax.random.PRNGKey(1))
        losses[wire] = float(m["loss"])
        assert np.isfinite(losses[wire])
    # the quantized-wire losses track the exact one
    assert abs(losses["int16"] - losses["float32"]) < 1e-3 * max(
        1.0, abs(losses["float32"]))
    assert abs(losses["mulaw8"] - losses["float32"]) < 0.1 * max(
        1.0, abs(losses["float32"]))
