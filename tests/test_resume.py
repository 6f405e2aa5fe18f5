"""Checkpoint / mid-epoch resume through the real train CLI.

Covers the reference's --continue-from contract (train.py:74, 827-872):
a per-N-samples checkpoint carries epoch/iteration counters and training
resumes from the saved iteration, finishing the run.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from scipy.io import wavfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def tiny_manifest(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for i, txt in enumerate(["AB", "BA", "AAB", "ABB", "A B", "B A"]):
        sr, dur = 16000, 0.3
        t = np.arange(int(sr * dur)) / sr
        y = 0.2 * np.sin(2 * np.pi * (300 + 140 * i) * t)
        y = (y + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        wav, tx = tmp_path / f"u{i}.wav", tmp_path / f"u{i}.txt"
        wavfile.write(wav, sr, (y * 32767).astype(np.int16))
        tx.write_text(txt)
        rows.append(f"{wav},{tx},{dur:.2f}")
    m = tmp_path / "manifest.csv"
    m.write_text("\n".join(rows) + "\n")
    return str(m)


def _run_train(manifest, save, extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [sys.executable, os.path.join(REPO, "train.py"),
           "--train-manifest", manifest, "--val-manifest", manifest,
           "--batch-size", "2", "--hidden-size", "16", "--hidden-layers", "1",
           "--num-workers", "0", "--save-folder", save, "--id", "resume-test",
           "--log-dir", os.path.join(save, "logs")] + extra
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=REPO, timeout=420)


@pytest.mark.slow
def test_mid_epoch_checkpoint_and_resume(tiny_manifest, tmp_path):
    save = str(tmp_path / "ckpt")
    # 6 utts / batch 2 = 3 iterations per epoch; checkpoint every 4 samples
    # -> a mid-epoch checkpoint with iteration > 0 exists after the run
    r = _run_train(tiny_manifest, save,
                   ["--epochs", "1", "--checkpoint-per-samples", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    cps = [f for f in os.listdir(save) if f.endswith(".ckpt")]
    assert any("final" in f for f in cps), cps
    mid = [f for f in cps if "samples" in f or "iter" in f or
           ("epoch" not in f and "final" not in f and "best" not in f)]
    assert mid, f"no mid-epoch checkpoint found in {cps}"

    # resume from the mid-epoch checkpoint for one more epoch
    r2 = _run_train(tiny_manifest, save,
                    ["--epochs", "2",
                     "--continue-from", os.path.join(save, mid[0])])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Resuming from" in (r2.stdout + r2.stderr)
    assert os.path.exists(os.path.join(save, "deepspeech_final.ckpt"))

    # the metrics log keeps counting from the restored epoch/iteration
    logdir = os.path.join(save, "logs")
    events = []
    for root, _, files in os.walk(logdir):
        for f in files:
            if f.endswith(".jsonl"):
                with open(os.path.join(root, f)) as fh:
                    events += [json.loads(line) for line in fh if line.strip()]
    train_events = [e for e in events if e.get("event") == "train"]
    assert train_events, "no train events logged"


@pytest.mark.slow
def test_epoch_boundary_resume_and_history(tiny_manifest, tmp_path):
    """Resuming from an epoch-boundary checkpoint must NOT re-run the
    completed epoch, and the metric history embedded in the package
    (reference model.py:426-468) must keep growing across the resume."""
    from deepspeech_tpu.train import checkpoint as ckpt

    save = str(tmp_path / "ckpt")
    r = _run_train(tiny_manifest, save, ["--epochs", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    final = os.path.join(save, "deepspeech_final.ckpt")
    pkg = ckpt.load(final)
    assert len(pkg["loss_results"]) == 1

    r2 = _run_train(tiny_manifest, save,
                    ["--epochs", "2", "--continue-from", final])
    assert r2.returncode == 0, r2.stderr[-2000:]
    out = r2.stdout + r2.stderr
    assert "epoch 1 " not in out, "re-ran the completed epoch"
    assert "epoch 2 " in out
    pkg = ckpt.load(final)
    assert len(pkg["loss_results"]) == 2
    assert len(pkg["wer_results"]) == 2


def test_checkpoint_format_safe_and_pickle_rejected(tmp_path):
    """The checkpoint container must load without pickle (no code execution;
    np.load-compatible zip), round-trip a TrainState exactly, and REFUSE
    legacy pickle files unless explicitly allowed."""
    import pickle

    import jax
    import jax.numpy as jnp

    from deepspeech_tpu.audio import AudioConf
    from deepspeech_tpu.models import DeepSpeech2
    from deepspeech_tpu.train import TrainState, build_optimizer
    from deepspeech_tpu.train import checkpoint as ckpt

    model = DeepSpeech2(num_classes=5, hidden_size=8, hidden_layers=1,
                        cell="gru", bidirectional=True)
    tx = build_optimizer("sgd", lr=1e-3, momentum=0.9, max_norm=10.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 161, 51)),
                           jnp.asarray([51]), False)
    state = TrainState.create(variables, tx)

    pkg = ckpt.serialize({"rnn_type": "gru", "hidden_size": 8}, state,
                         "_AB ", AudioConf().to_dict(), epoch=2, iteration=7,
                         checkpoint=3, avg_loss=1.5,
                         history={"loss_results": [2.0, 1.5]})
    path = str(tmp_path / "m.ckpt")
    ckpt.save(path, pkg)

    # the file is a plain zip readable by np.load with allow_pickle=False
    loaded_np = np.load(path, allow_pickle=False)
    assert "a0" in loaded_np.files
    np.asarray(loaded_np["a0"])  # array entries decode without pickle

    loaded = ckpt.load(path)
    assert loaded["epoch"] == 3 and loaded["iteration"] == 7
    assert loaded["labels"] == "_AB "
    assert loaded["loss_results"] == [2.0, 1.5]

    state2 = ckpt.restore_state(loaded, TrainState.create(variables, tx))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        assert np.asarray(a).shape == np.asarray(b).shape  # incl. 0-d
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(state2.opt_state)):
        assert np.asarray(a).shape == np.asarray(b).shape  # incl. 0-d
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the annealing path reads the restored LR as a scalar
    from deepspeech_tpu.train import get_lr
    assert get_lr(state2.opt_state) == pytest.approx(1e-3)

    # legacy pickle: rejected by default, readable on explicit opt-in
    legacy = str(tmp_path / "legacy.ckpt")
    with open(legacy, "wb") as f:
        pickle.dump({"labels": "_AB "}, f)
    with pytest.raises(ValueError, match="pickle"):
        ckpt.load(legacy)
    assert ckpt.load(legacy, allow_pickle=True)["labels"] == "_AB "
