"""Profile the DS2 train step on the attached TPU and print per-op stats.

Captures a jax.profiler trace of 10 bench-config train steps (6xBiGRU-800,
batch 20, 7.5 s utterances) and prints the device op table via xprof —
the workflow behind the banded-conv/RNN kernel optimizations (see the
freq_groups / projection-layout commit messages).

Usage: python tools/profile_step.py [trace_dir]
"""
import glob
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepspeech_tpu.audio import AudioConf  # noqa: E402
from deepspeech_tpu.models import DeepSpeech2  # noqa: E402
from deepspeech_tpu.train import (StepConfig, TrainState,  # noqa: E402
                                  build_optimizer, make_train_step)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ds2trace"
    # BENCH-style env overrides so other zoo points (e.g. BiGRU-1600,
    # BASELINE configs 4/5) get the same per-op treatment
    B = int(os.environ.get("PROFILE_BATCH", 20))
    SEC = float(os.environ.get("PROFILE_SECONDS", 7.5))
    H = int(os.environ.get("PROFILE_HIDDEN", 800))
    L = int(os.environ.get("PROFILE_LAYERS", 6))
    ns = int(16000 * SEC)
    rng = np.random.default_rng(0)
    batch = {
        "audio": jnp.asarray(
            rng.standard_normal((B, ns)).astype(np.float32) * 0.1),
        "audio_lengths": jnp.asarray(np.full(B, ns - 160, np.int32)),
        "targets": jnp.asarray(rng.integers(1, 30, (B, 96)).astype(np.int32)),
        "target_lengths": jnp.asarray(np.full(B, 96, np.int32)),
    }
    model = DeepSpeech2(num_classes=30, hidden_size=H, hidden_layers=L,
                        cell="gru", bidirectional=True,
                        compute_dtype=jnp.bfloat16)
    tx = build_optimizer("sgd", lr=3e-4, momentum=0.9, max_norm=100.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 161, 51)),
                           jnp.asarray([51]), False)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, StepConfig(audio_conf=AudioConf()))
    key = jax.random.PRNGKey(0)
    for i in range(3):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    float(m["loss"])

    os.system(f"rm -rf {outdir}")
    jax.profiler.start_trace(outdir)
    for i in range(10):
        state, m = step(state, batch, jax.random.fold_in(key, 100 + i))
    float(m["loss"])
    jax.profiler.stop_trace()

    files = glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True)
    print("trace:", files)
    try:
        import json

        from xprof.convert import raw_to_tool_data as r2t
        data, _ = r2t.xspace_to_tool_data(files, "framework_op_stats", {})
        tab = json.loads(data if isinstance(data, str) else data.decode())
        cols = [c["id"] for c in tab[0]["cols"]]
        i_op = cols.index("operation")
        i_t = cols.index("total_self_time")
        i_hd = cols.index("host_or_device")
        items = sorted(
            ((r["c"][i_t]["v"], r["c"][i_op]["v"]) for r in tab[0]["rows"]
             if r["c"][i_hd]["v"] == "Device"), reverse=True)
        print(f"total device: {sum(t for t, _ in items) / 10 / 1000:.2f} "
              f"ms/step")
        for t, op in items[:30]:
            print(f"{t / 10 / 1000:7.3f} ms  {op[:100]}")
    except Exception as e:  # xprof optional
        print(f"(op table unavailable: {e}); open the trace in TensorBoard")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
