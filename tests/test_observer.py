"""Observer event hooks fire from the training loop (the reference's
observer.py:8-22 pattern was dead code there; here it is the live
extension point on ``cli.train.main(observers=...)``)."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

from deepspeech_tpu.utils import Observer


class Recorder(Observer):
    def __init__(self):
        self.events = []

    def on_epoch_start(self, epoch, **kw):
        self.events.append(("epoch_start", epoch))

    def on_epoch_end(self, epoch, **kw):
        self.events.append(("epoch_end", epoch, kw.get("loss")))

    def on_batch_start(self, epoch, iteration, **kw):
        self.events.append(("batch_start", epoch, iteration))

    def on_batch_end(self, epoch, iteration, **kw):
        self.events.append(("batch_end", epoch, iteration, kw.get("loss")))

    def on_checkpoint(self, epoch, iteration, path, **kw):
        self.events.append(("checkpoint", path))


@pytest.mark.slow
def test_observer_hooks_fire(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for i, txt in enumerate(["AB", "BA", "AAB", "ABB"]):
        sr, dur = 16000, 0.3
        t = np.arange(int(sr * dur)) / sr
        y = (0.2 * np.sin(2 * np.pi * (300 + 140 * i) * t)
             + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        wav, tx = tmp_path / f"u{i}.wav", tmp_path / f"u{i}.txt"
        wavfile.write(wav, sr, (y * 32767).astype(np.int16))
        tx.write_text(txt)
        rows.append(f"{wav},{tx},{dur:.2f}")
    manifest = tmp_path / "manifest.csv"
    manifest.write_text("\n".join(rows) + "\n")

    from deepspeech_tpu.cli.train import main

    rec = Recorder()
    rc = main([
        "--train-manifest", str(manifest), "--val-manifest", str(manifest),
        "--batch-size", "2", "--hidden-size", "16", "--hidden-layers", "1",
        "--num-workers", "0", "--epochs", "1", "--silent",
        "--save-folder", str(tmp_path / "ckpt"),
        "--log-dir", str(tmp_path / "logs"), "--id", "observer-test",
    ], observers=[rec])
    assert rc == 0

    kinds = [e[0] for e in rec.events]
    assert kinds.count("epoch_start") == 1
    assert kinds.count("epoch_end") == 1
    assert kinds.count("batch_start") == kinds.count("batch_end") == 2
    assert "checkpoint" in kinds  # the final checkpoint
    # ordering: epoch_start before batches before epoch_end
    assert kinds.index("epoch_start") < kinds.index("batch_start")
    last_batch_end = max(i for i, k in enumerate(kinds) if k == "batch_end")
    assert kinds.index("epoch_end") > last_batch_end
    # batch_end carries the loss
    be = [e for e in rec.events if e[0] == "batch_end"][0]
    assert isinstance(be[3], float)
