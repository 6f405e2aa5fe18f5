"""Multi-step-per-dispatch (--steps-per-dispatch k) numerics parity.

The k-step scan (train/step.py make_multi_train_step) must produce the
SAME training trajectory as the k=1 loop: same per-step PRNG keys, same
masked losses under group shape-padding, exactly neutral tail-padding
microbatches (a zero-grad batch alone would NOT be neutral — SGD momentum
still moves params — so dead lanes gate the whole state transition).

Replaces nothing in the reference (its loop is strictly one host sync per
batch, train.py:575-591, 690); this is the TPU-idiomatic amortization of
dispatch RTT, so it must be provably free of numerics drift.
"""

import os

import numpy as np
import pytest

from deepspeech_tpu.data import collate_batch, stack_microbatches

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _samples(rng, durations, texts, sr=16000):
    out = []
    for d, txt in zip(durations, texts):
        n = int(sr * d)
        audio = (0.2 * np.sin(2 * np.pi * 440 * np.arange(n) / sr)
                 + 0.01 * rng.standard_normal(n)).astype(np.float32)
        out.append({"audio": audio, "target": [1 + (ord(c) % 26) for c in txt],
                    "path": f"mem://{txt}"})
    return out


def test_stack_microbatches_pads_and_masks():
    rng = np.random.default_rng(0)
    b1 = collate_batch(_samples(rng, [0.4, 0.5], ["AB", "BA"]), 2)
    b2 = collate_batch(_samples(rng, [1.3, 1.1], ["ABBA", "BAAB"]), 2)
    g1 = {k: v for k, v in b1.items() if k != "paths"}
    g2 = {k: v for k, v in b2.items() if k != "paths"}

    stacked, live = stack_microbatches([g1, g2], 3)
    assert live.tolist() == [True, True, False]
    w = max(g1["audio"].shape[1], g2["audio"].shape[1])
    assert stacked["audio"].shape == (3, 2, w)
    # short batch zero-padded on the ragged axis — identical to collating
    # at the larger bucket
    assert np.array_equal(stacked["audio"][0, :, : g1["audio"].shape[1]],
                          g1["audio"])
    assert not stacked["audio"][0, :, g1["audio"].shape[1]:].any()
    # dead lane: collate's dummy-row conventions
    assert not stacked["valid"][2].any()
    assert (stacked["audio_lengths"][2] == 1).all()
    assert (stacked["target_lengths"][2] == 0).all()
    assert not stacked["audio"][2].any()


def test_multi_step_dead_lane_is_exactly_neutral():
    """k=2 with one dead lane == one plain step, bitwise on params."""
    import jax
    import jax.numpy as jnp
    import optax

    from deepspeech_tpu.audio import AudioConf
    from deepspeech_tpu.models import DeepSpeech2
    from deepspeech_tpu.train import TrainState
    from deepspeech_tpu.train.step import (StepConfig, make_multi_train_step,
                                           make_train_step)

    rng = np.random.default_rng(1)
    batch = collate_batch(_samples(rng, [0.5, 0.6], ["AB", "BA"]), 2)
    batch = {k: v for k, v in batch.items() if k != "paths"}

    model = DeepSpeech2(num_classes=29, hidden_size=32, hidden_layers=1,
                        cell="gru", bidirectional=True)
    cfg = StepConfig(audio_conf=AudioConf(), normalize="mean",
                     max_frame_jitter=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 161, 51)), jnp.asarray([51]), False)
    tx = optax.sgd(1e-3, momentum=0.9)  # momentum: zero grads NOT neutral

    state1 = TrainState.create(variables, tx)
    single = make_train_step(model, tx, cfg, donate=False)
    key = jax.random.PRNGKey(7)
    state1, m1 = single(state1, batch, key)

    state2 = TrainState.create(variables, tx)
    multi = make_multi_train_step(model, tx, cfg, donate=False)
    stacked, live = stack_microbatches([batch], 2)
    keys = jnp.stack([key, key])
    state2, m2 = multi(state2, stacked, keys, jnp.asarray(live), {})

    assert np.allclose(float(m1["loss"]), float(np.asarray(m2["loss"])[0]),
                       rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(state1.opt_state),
                    jax.tree_util.tree_leaves(state2.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    assert int(state2.step) == 1  # dead lane did not count


@pytest.mark.slow
def test_cli_steps_per_dispatch_matches_k1(tmp_path):
    """Full CLI: 2 epochs, k=2 over an odd batch count (ragged tail group
    every epoch) must track k=1 to float tolerance on the final params."""
    from scipy.io import wavfile

    from deepspeech_tpu.cli import train as train_cli
    from deepspeech_tpu.train import checkpoint as ckpt

    rng = np.random.default_rng(0)
    rows = []
    texts = ["AB", "BA", "AAB", "ABB", "A B", "B A"]
    durs = [0.4, 0.5, 0.7, 1.2, 1.3, 0.6]  # two audio buckets in play
    for i, (txt, dur) in enumerate(zip(texts, durs)):
        sr = 16000
        t = np.arange(int(sr * dur)) / sr
        y = 0.2 * np.sin(2 * np.pi * (300 + 140 * i) * t)
        y = (y + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        wav, tx = tmp_path / f"u{i}.wav", tmp_path / f"u{i}.txt"
        wavfile.write(wav, sr, (y * 32767).astype(np.int16))
        tx.write_text(txt)
        rows.append(f"{wav},{tx},{dur:.2f}")
    manifest = tmp_path / "manifest.csv"
    manifest.write_text("\n".join(rows) + "\n")

    def run(tag, extra):
        save = tmp_path / tag
        argv = [
            "--train-manifest", str(manifest), "--val-manifest", str(manifest),
            "--batch-size", "2", "--hidden-size", "16", "--hidden-layers", "1",
            "--num-workers", "0", "--epochs", "2",
            "--labels-path", os.path.join(REPO, "labels.json"),
            "--save-folder", str(save), "--id", f"spd-{tag}",
            "--log-dir", str(save / "logs"), "--silent"] + extra
        assert train_cli.main(argv) == 0
        return ckpt.load(str(save / "deepspeech_final.ckpt"))

    pkg1 = run("k1", [])
    pkg2 = run("k2", ["--steps-per-dispatch", "2"])

    import jax
    leaves1 = jax.tree_util.tree_leaves(pkg1["params"])
    leaves2 = jax.tree_util.tree_leaves(pkg2["params"])
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # identical per-epoch loss curves
    np.testing.assert_allclose(pkg1["loss_results"], pkg2["loss_results"],
                               rtol=1e-5, atol=1e-6)
