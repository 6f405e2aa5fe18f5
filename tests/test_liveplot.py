"""Live HTML dashboard (--visdom realization, utils/liveplot.py).

The reference draws live loss/WER/CER curves to a visdom server
(reference train.py:155-314); here the same streams render to a
self-refreshing single-file dashboard. Checks: well-formed SVG geometry
inside the viewBox, legends + table view + dark-mode tokens present,
and the real train CLI producing the file under --visdom.
"""

import os
import re
import sys
import subprocess
from xml.etree import ElementTree

import numpy as np
import pytest

from deepspeech_tpu.utils.liveplot import render_dashboard

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _state(n_iters=50, n_epochs=6):
    rng = np.random.default_rng(0)
    loss = list(90 * np.exp(-np.arange(n_iters) / 20)
                + rng.standard_normal(n_iters))
    return {
        "train_steps": list(range(n_iters)),
        "train_loss": [float(x) for x in loss],
        "train_avg": [float(x) for x in loss],
        "epochs": list(range(n_epochs)),
        "epoch_loss": [50.0 / (e + 1) for e in range(n_epochs)],
        "val_loss": [60.0 / (e + 1) if e % 2 == 0 else None
                     for e in range(n_epochs)],  # gaps render as breaks
        "val_epochs": list(range(n_epochs)),
        "val_wer": [100.0 / (e + 1) for e in range(n_epochs)],
        "val_cer": [55.0 / (e + 1) for e in range(n_epochs)],
    }


def test_nonfinite_values_render_as_gaps(tmp_path):
    """A NaN/inf metric must not reach the embedded JSON (bare NaN tokens
    are invalid JSON and would kill the hover/refresh script) nor poison
    the y-axis scale."""
    import json as _json
    state = _state()
    state["train_loss"][3] = float("nan")
    state["train_loss"][4] = float("inf")
    state["val_loss"][0] = float("-inf")
    path = str(tmp_path / "dash.html")
    render_dashboard(path, "unit-run", state)
    s = open(path).read()
    assert "NaN" not in s and "Infinity" not in s
    for m in re.findall(r"data-pts='([^']*)'", s):
        _json.loads(m)  # strict: raises on bare NaN/Infinity
    # refresh script re-arms instead of dying in a hidden tab
    assert "visibilitychange" in s and "armRefresh" in s


def test_render_structure(tmp_path):
    path = str(tmp_path / "dash.html")
    render_dashboard(path, "unit-run", _state())
    s = open(path).read()
    svgs = re.findall(r"<svg.*?</svg>", s, re.S)
    assert len(svgs) == 3  # training loss, per-epoch loss, quality
    for raw in svgs:
        t = ElementTree.fromstring(raw)
        vb = t.attrib["viewBox"].split()
        w, h = float(vb[2]), float(vb[3])
        marks = [e for e in t.iter() if e.tag.endswith("path")]
        assert marks
        for p in marks:
            xy = [float(x) for x in re.findall(r"-?\d+\.?\d*",
                                               p.attrib["d"])]
            assert 0 <= min(xy[::2]) and max(xy[::2]) <= w
            assert 0 <= min(xy[1::2]) and max(xy[1::2]) <= h
    # legends (2 series each), table fallback, dark-mode token scopes,
    # hover layer, and ink-token text (no series-colored text)
    assert s.count('class="legend"') == 3
    assert "Data table" in s
    assert "prefers-color-scheme: dark" in s and 'data-theme="dark"' in s
    assert 'class="tip"' in s and "mousemove" in s
    assert "NaN" not in s


def test_render_single_point_and_empty(tmp_path):
    path = str(tmp_path / "dash.html")
    render_dashboard(path, "r", {"train_steps": [0], "train_loss": [5.0],
                                 "train_avg": [5.0]})
    s = open(path).read()
    assert "<circle" in s  # a single sample renders as a dot, not a path
    render_dashboard(path, "r", {})
    assert "live training dashboard" in open(path).read()


@pytest.mark.slow
def test_train_cli_visdom_writes_dashboard(tmp_path):
    from scipy.io import wavfile
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
    save = tmp_path / "ckpt"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--train-manifest", str(manifest), "--val-manifest", str(manifest),
         "--batch-size", "2", "--hidden-size", "16", "--hidden-layers", "1",
         "--num-workers", "0", "--epochs", "2", "--visdom",
         "--labels-path", os.path.join(REPO, "labels.json"),
         "--save-folder", str(save), "--id", "viz-e2e",
         "--log-dir", str(save / "logs")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    dash = save / "logs" / "viz-e2e.html"
    assert dash.exists()
    s = dash.read_text()
    assert "Validation quality" in s and "WER" in s
    # two epochs of data made it into the table view
    assert s.count("<tr>") >= 3
