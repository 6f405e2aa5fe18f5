"""Training-throughput benchmark: audio-seconds of speech processed per
second per chip (the BASELINE.json north-star metric).

Runs the full jitted train step (device featurize -> DS2 forward -> CTC ->
backward -> update) on the reference's default training config
(6 x BiGRU-800, batch 20; reference train.py:41-61) with 7.5-second
utterances (near the 15 s manifest cap / bucketing midpoint), on whatever
accelerator JAX provides (the real TPU chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline compares
against the previous recorded run in bench_baseline.json (1.0 on first run).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from deepspeech_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    from deepspeech_tpu.audio import AudioConf
    from deepspeech_tpu.models import DeepSpeech2
    from deepspeech_tpu.train import (StepConfig, TrainState, build_optimizer,
                                      make_train_step)

    batch_size = int(os.environ.get("BENCH_BATCH", 20))
    seconds = float(os.environ.get("BENCH_SECONDS", 7.5))
    hidden = int(os.environ.get("BENCH_HIDDEN", 800))
    layers = int(os.environ.get("BENCH_LAYERS", 6))
    steps = int(os.environ.get("BENCH_STEPS", 20))

    num_samples = int(16000 * seconds)
    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(
            rng.standard_normal((batch_size, num_samples)).astype(np.float32) * 0.1),
        "audio_lengths": jnp.asarray(
            np.full(batch_size, num_samples - 160, np.int32)),
        "targets": jnp.asarray(
            rng.integers(1, 30, (batch_size, 96)).astype(np.int32)),
        "target_lengths": jnp.asarray(np.full(batch_size, 96, np.int32)),
    }

    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    model = DeepSpeech2(num_classes=30, hidden_size=hidden,
                        hidden_layers=layers, cell="gru", bidirectional=True,
                        compute_dtype=jnp.bfloat16 if dtype == "bfloat16"
                        else None)
    tx = build_optimizer("sgd", lr=3e-4, momentum=0.9, max_norm=100.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 161, 51)), jnp.asarray([51]), False)
    state = TrainState.create(variables, tx)
    train_step = make_train_step(model, tx, StepConfig(audio_conf=AudioConf()))

    key = jax.random.PRNGKey(0)
    # warmup / compile; the float() readback forces real completion — on the
    # tunnel-attached chip block_until_ready returns at dispatch time, so a
    # host transfer of a value that depends on the whole step chain is the
    # only trustworthy synchronization point.
    for i in range(3):
        state, metrics = train_step(state, batch, jax.random.fold_in(key, i))
    float(metrics["loss"])

    # several timed windows; report the best (the tunnel-attached chip shows
    # large run-to-run contention noise — peak is the honest device number).
    # Each window is closed by a loss readback that depends on every step in
    # the window; its ~25 ms tunnel round-trip is amortized over the window.
    windows = int(os.environ.get("BENCH_WINDOWS", 3))
    best_dt = float("inf")
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = train_step(state, batch,
                                         jax.random.fold_in(key, w * steps + i))
        float(metrics["loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)

    audio_seconds = batch_size * seconds * steps
    n_chips = max(len(jax.devices()), 1)
    value = audio_seconds / best_dt / n_chips

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    vs = 1.0
    try:
        with open(base_path) as f:
            prev = json.load(f)["value"]
        if prev > 0:
            vs = value / prev
    except Exception:
        with open(base_path, "w") as f:
            json.dump({"value": value,
                       "config": {"batch": batch_size, "seconds": seconds,
                                  "hidden": hidden, "layers": layers}}, f)
    print(json.dumps({
        "metric": "train_audio_seconds_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
