"""LibriSpeech dataset tooling end-to-end: tarballs -> manifests -> WER.

Drives ``librispeech.py`` exactly the way a reference user does
(reference data/librispeech.py:10-113) against pre-downloaded tarballs in
the REAL LibriSpeech layout — ``LibriSpeech/<set>/<spk>/<chapter>/
<spk>-<chapter>-<utt>.flac`` plus ``<spk>-<chapter>.trans.txt`` — built
with the in-tree spec-compliant FLAC encoder, then trains and evaluates
through the real CLIs to a WER number.  The network is closed in CI, so
the audio content is synthetic multi-tone speech-surrogate; the *format,
layout, decode, resample, manifest, train, and eval* paths are the real
ones (PERF.md "Real-speech status" documents the blocker).

Covers: tarball pickup without network, FLAC decode at native and
non-native rates (dev chapter at 32 kHz exercises the polyphase
resampler), transcript extraction/uppercasing, duration pruning on the
train split, and the train->test chain on the produced manifests.
"""

import os
import subprocess
import sys
import tarfile

import numpy as np
import pytest

from deepspeech_tpu.audio.flac_encode import save_flac

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TONES = {"A": 440.0, "B": 880.0, " ": 120.0}
SEG = 0.15  # seconds per character


def _utterance(rng, text, sr):
    t = np.arange(int(sr * SEG * len(text))) / sr
    y = np.zeros_like(t, dtype=np.float32)
    n = len(t) // len(text)
    for i, ch in enumerate(text):
        seg = slice(i * n, (i + 1) * n if i < len(text) - 1 else len(t))
        y[seg] = 0.3 * np.sin(2 * np.pi * TONES[ch] * t[seg])
    return (y + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def _build_tarball(path, set_name, chapters, sr):
    """chapters: {(spk, chap): [(utt_id, text), ...]}  -> tar.gz at `path`."""
    rng = np.random.default_rng(abs(hash(set_name)) % (1 << 32))
    stage = path.parent / f"stage_{set_name}"
    for (spk, chap), utts in chapters.items():
        d = stage / "LibriSpeech" / set_name / str(spk) / str(chap)
        d.mkdir(parents=True)
        lines = []
        for utt_id, text in utts:
            name = f"{spk}-{chap}-{utt_id:04d}"
            save_flac(str(d / f"{name}.flac"), _utterance(rng, text, sr), sr)
            lines.append(f"{name} {text.lower()}")  # CLI must upper-case
        (d / f"{spk}-{chap}.trans.txt").write_text("\n".join(lines) + "\n")
    with tarfile.open(path, "w:gz") as tar:
        tar.add(stage / "LibriSpeech", arcname="LibriSpeech")


def _run(script, argv, cwd, timeout=600):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [sys.executable, os.path.join(REPO, script)] + argv
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=cwd, timeout=timeout)


@pytest.mark.slow
def test_librispeech_pipeline_to_wer(tmp_path):
    texts = ["AB BA AB", "BA AB BA", "AA BB AA", "BB AA BB"]

    # --- stage tarballs where maybe_download() looks for them -------------
    target = tmp_path / "LibriSpeech_dataset"
    (target / "train").mkdir(parents=True)
    (target / "val").mkdir()
    (target / "test_clean").mkdir()

    train_chapters = {
        (19, 198): [(i, t) for i, t in enumerate(texts)],
        (26, 495): [(i, t) for i, t in enumerate(texts[::-1])],
        # too-short utterance: pruned by --min-duration on the train split
        (31, 100): [(0, "AB")],
    }
    val_chapters = {(84, 121): [(i, t) for i, t in enumerate(texts)]}
    test_chapters = {(61, 700): [(i, t) for i, t in enumerate(texts)]}

    _build_tarball(target / "train" / "train-clean-100.tar.gz",
                   "train-clean-100", train_chapters, sr=16000)
    # 32 kHz source: the CLI must resample through the in-tree polyphase path
    _build_tarball(target / "val" / "dev-clean.tar.gz",
                   "dev-clean", val_chapters, sr=32000)
    _build_tarball(target / "test_clean" / "test-clean.tar.gz",
                   "test-clean", test_chapters, sr=16000)

    r = _run("librispeech.py", [
        "--target-dir", str(target),
        "--files-to-use",
        "train-clean-100.tar.gz,dev-clean.tar.gz,test-clean.tar.gz"],
        cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]

    # --- manifests: counts, pruning, sorting, transcript casing ----------
    train_manifest = tmp_path / "libri_train_manifest.csv"
    val_manifest = tmp_path / "libri_val_manifest.csv"
    test_manifest = tmp_path / "libri_test_clean_manifest.csv"
    for m in (train_manifest, val_manifest, test_manifest):
        assert m.exists(), r.stdout

    train_rows = train_manifest.read_text().strip().split("\n")
    assert len(train_rows) == 8, train_rows  # 9 utts - 1 pruned (<1 s)
    durs = [float(row.split(",")[2]) for row in train_rows]
    assert durs == sorted(durs) and all(1.0 <= d <= 1.3 for d in durs)
    assert len(val_manifest.read_text().strip().split("\n")) == 4
    assert len(test_manifest.read_text().strip().split("\n")) == 4

    wav_path, txt_path, _ = train_rows[0].split(",")
    from scipy.io import wavfile
    sr, data = wavfile.read(wav_path)
    assert sr == 16000 and data.dtype == np.int16
    assert (tmp_path / txt_path).exists() or os.path.exists(txt_path)
    text = open(txt_path).read()
    assert text == text.upper() and set(text) <= {"A", "B", " "}

    # resampled val wavs are also 16 kHz and kept full duration
    val_wav = val_manifest.read_text().split(",")[0]
    sr, data = wavfile.read(val_wav)
    assert sr == 16000
    assert abs(len(data) / sr - SEG * len(texts[0])) < 0.02

    # --- train -> eval on the produced manifests -------------------------
    save = tmp_path / "ckpt"
    r = _run("train.py", [
        "--train-manifest", str(train_manifest),
        "--val-manifest", str(val_manifest),
        "--labels-path", os.path.join(REPO, "labels.json"),
        "--batch-size", "4", "--hidden-size", "32", "--hidden-layers", "1",
        "--num-workers", "0", "--epochs", "3", "--save-folder", str(save),
        "--id", "libri-e2e", "--log-dir", str(save / "logs")],
        cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = save / "deepspeech_final.ckpt"
    assert ckpt.exists()

    r = _run("test.py", [
        "--continue-from", str(ckpt), "--test-manifest", str(test_manifest),
        "--batch-size", "4", "--num-workers", "0",
        "--report-file", str(tmp_path / "report.csv")], cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "(4 utterances)" in r.stdout
    line = [l for l in r.stdout.splitlines()
            if l.startswith("Summary (token-weighted)")][0]
    wer = float(line.split("WER")[1].split()[0])
    assert np.isfinite(wer) and 0.0 <= wer <= 100.0, line
