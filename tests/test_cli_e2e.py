"""End-to-end CLI integration: train.py -> test.py -> transcribe.py as
real subprocesses, the way a reference user drives the framework
(reference test.py:39-214, transcribe.py:74-105).

A tiny model is trained once (module-scoped) and shared by the eval and
transcription tests.
"""

import csv
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
from scipy.io import wavfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, argv, timeout=420):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cmd = [sys.executable, os.path.join(REPO, script)] + argv
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=REPO, timeout=timeout)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train 1 epoch on 6 synthetic utterances; return (ckpt, manifest, wav)."""
    tmp = tmp_path_factory.mktemp("cli_e2e")
    rng = np.random.default_rng(0)
    rows, wavs = [], []
    for i, txt in enumerate(["AB", "BA", "AAB", "ABB", "A B", "B A"]):
        sr, dur = 16000, 0.3
        t = np.arange(int(sr * dur)) / sr
        y = 0.2 * np.sin(2 * np.pi * (300 + 140 * i) * t)
        y = (y + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        wav, tx = tmp / f"u{i}.wav", tmp / f"u{i}.txt"
        wavfile.write(wav, sr, (y * 32767).astype(np.int16))
        tx.write_text(txt)
        rows.append(f"{wav},{tx},{dur:.2f}")
        wavs.append(str(wav))
    manifest = tmp / "manifest.csv"
    manifest.write_text("\n".join(rows) + "\n")

    save = tmp / "ckpt"
    r = _run("train.py", [
        "--train-manifest", str(manifest), "--val-manifest", str(manifest),
        "--batch-size", "2", "--hidden-size", "16", "--hidden-layers", "1",
        "--num-workers", "0", "--epochs", "1", "--save-folder", str(save),
        "--id", "cli-e2e", "--log-dir", str(save / "logs")])
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = save / "deepspeech_final.ckpt"
    assert ckpt.exists()
    return str(ckpt), str(manifest), wavs[0]


@pytest.mark.slow
def test_train_cli_tensor_parallel(trained, tmp_path):
    """DP x TP from the CLI: --mesh-model 2 on the 8-device mesh trains end
    to end (data=4 x model=2) and produces a checkpoint the eval CLI can
    consume (the BASELINE north-star capability: shard the RNN stack over
    the model axis; beyond reference train.py:948-951 which is DP-only)."""
    _, manifest, _ = trained
    save = tmp_path / "tp_ckpt"
    r = _run("train.py", [
        "--train-manifest", manifest, "--val-manifest", manifest,
        "--batch-size", "4", "--hidden-size", "16", "--hidden-layers", "2",
        "--num-workers", "0", "--epochs", "1", "--mesh-model", "2",
        "--save-folder", str(save), "--id", "cli-tp",
        "--log-dir", str(save / "logs")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mesh: data=4 x model=2" in r.stdout
    ckpt = save / "deepspeech_final.ckpt"
    assert ckpt.exists()
    r = _run("test.py", [
        "--continue-from", str(ckpt), "--test-manifest", manifest,
        "--batch-size", "3", "--num-workers", "0",
        "--report-file", str(tmp_path / "tp.csv")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Summary (token-weighted)" in r.stdout


@pytest.mark.slow
def test_reference_command_lines_run_unmodified(trained, tmp_path):
    """The reference's CUDA/DDP flags (--cuda, --data-parallel, --gpu-rank,
    --dist-backend, --rank, --world-size; reference train.py:54, 97-107,
    test.py:30, opts.py:20) are accepted as documented no-ops so reference
    README command lines run verbatim on TPU."""
    ckpt, manifest, _ = trained
    save = tmp_path / "noop_ckpt"
    r = _run("train.py", [
        "--train-manifest", manifest, "--val-manifest", manifest,
        "--batch-size", "3", "--hidden-size", "16", "--hidden-layers", "1",
        "--num-workers", "0", "--epochs", "1", "--save-folder", str(save),
        "--id", "cli-noop", "--log-dir", str(save / "logs"),
        "--cuda", "--data-parallel", "--gpu-rank", "0",
        "--dist-backend", "nccl", "--rank", "0", "--world-size", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "note: --cuda has no effect" in r.stdout
    assert (save / "deepspeech_final.ckpt").exists()
    r = _run("test.py", [
        "--continue-from", ckpt, "--test-manifest", manifest,
        "--batch-size", "3", "--num-workers", "0", "--max-items", "2",
        "--cuda", "--data-parallel"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Summary (token-weighted)" in r.stdout


@pytest.mark.slow
def test_eval_cli_greedy(trained, tmp_path):
    ckpt, manifest, _ = trained
    report = tmp_path / "report.csv"
    dump = tmp_path / "processed.pkl"
    r = _run("test.py", [
        "--continue-from", ckpt, "--test-manifest", manifest,
        "--batch-size", "3", "--num-workers", "0", "--verbose",
        "--report-file", str(report), "--output-path", str(dump)])
    assert r.returncode == 0, r.stderr[-2000:]

    # both summary averaging modes printed (reference test.py:197-209)
    assert "Summary (token-weighted)" in r.stdout
    assert "Summary (per-utt averaged)" in r.stdout
    assert "(6 utterances)" in r.stdout
    # --verbose triage lines
    assert "Ref:" in r.stdout and "Hyp:" in r.stdout

    # CSV report: header + one row per utterance
    with open(report) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["wav", "text", "transcript", "CER", "WER"]
    assert len(rows) == 1 + 6

    # per-utterance logits dump next to the wavs + index pickle
    with open(dump, "rb") as f:
        processed = pickle.load(f)
    assert len(processed) == 6
    with open(processed[0], "rb") as f:
        utt = pickle.load(f)
    assert {"probs", "len", "transcript", "reference",
            "filename", "wer", "cer"} <= set(utt)
    assert utt["probs"].shape[0] == utt["len"]


@pytest.mark.slow
def test_eval_cli_beam(trained, tmp_path):
    ckpt, manifest, _ = trained
    r = _run("test.py", [
        "--continue-from", ckpt, "--test-manifest", manifest,
        "--batch-size", "3", "--num-workers", "0", "--max-items", "2",
        "--decoder", "beam", "--beam-width", "8",
        "--report-file", str(tmp_path / "r.csv")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Summary (token-weighted)" in r.stdout


@pytest.mark.slow
def test_eval_cli_device_beam_sharded_over_mesh(trained, tmp_path):
    """--batch-size divisible by the device count: test.py shards the eval
    step AND the device-beam search over the mesh's data axis (parallel
    decode; parity vs single-device is pinned in test_beam_device.py)."""
    ckpt, manifest, _ = trained
    r = _run("test.py", [
        "--continue-from", ckpt, "--test-manifest", manifest,
        "--batch-size", "8", "--num-workers", "0",
        "--decoder", "device_beam", "--beam-width", "4",
        "--report-file", str(tmp_path / "r.csv")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Summary (token-weighted)" in r.stdout


@pytest.mark.slow
def test_eval_cli_host_beam_with_lm_on_mesh(trained, tmp_path):
    """Host beam + LM with a mesh-divisible batch: the mesh setup must NOT
    try to device_put the host LM object (regression: it crashed with
    'Cannot interpret ArpaLM as an abstract array')."""
    from tests.test_beam import ARPA
    ckpt, manifest, _ = trained
    lm = tmp_path / "t.arpa"
    lm.write_text(ARPA)
    r = _run("test.py", [
        "--continue-from", ckpt, "--test-manifest", manifest,
        "--batch-size", "8", "--num-workers", "0", "--max-items", "2",
        "--decoder", "beam", "--beam-width", "4", "--lm-path", str(lm),
        "--report-file", str(tmp_path / "r.csv")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Summary (token-weighted)" in r.stdout


@pytest.mark.slow
def test_eval_cli_device_beam_with_lm(trained, tmp_path):
    """--decoder device_beam --lm-path: LM-fused beam search fully on
    device through the batch-eval CLI (the on-chip twin of the reference's
    ctcdecode+KenLM eval, reference test.py:73-83 + opts.py:5-9)."""
    from tests.test_beam import ARPA
    ckpt, manifest, _ = trained
    lm = tmp_path / "t.arpa"
    lm.write_text(ARPA)
    r = _run("test.py", [
        "--continue-from", ckpt, "--test-manifest", manifest,
        "--batch-size", "3", "--num-workers", "0", "--max-items", "2",
        "--decoder", "device_beam", "--beam-width", "8",
        "--lm-path", str(lm), "--alpha", "0.8", "--beta", "0.3",
        "--report-file", str(tmp_path / "r.csv")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Summary (token-weighted)" in r.stdout


@pytest.mark.slow
def test_transcribe_cli(trained):
    ckpt, _, wav = trained
    r = _run("transcribe.py", [
        "--model-path", ckpt, "--audio-path", wav, "--offsets", "--meta"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["output"], out
    hyp = out["output"][0]
    assert "transcription" in hyp
    assert isinstance(hyp.get("offsets"), list)
    # offsets are monotone frame indices
    assert hyp["offsets"] == sorted(hyp["offsets"])
    assert out["_meta"]["decoder"]["type"] == "greedy"
    assert out["input"]["source"] == wav
    assert out["model"]["model"] == ckpt


@pytest.fixture(scope="module")
def trained_uni(trained, tmp_path_factory):
    """A unidirectional (streaming-capable) checkpoint on the same data."""
    _, manifest, wav = trained
    save = tmp_path_factory.mktemp("cli_uni") / "ckpt"
    r = _run("train.py", [
        "--train-manifest", manifest, "--val-manifest", manifest,
        "--batch-size", "2", "--hidden-size", "16", "--hidden-layers", "1",
        "--no-bidirectional", "--num-workers", "0", "--epochs", "1",
        "--save-folder", str(save), "--id", "cli-uni",
        "--log-dir", str(save / "logs")])
    assert r.returncode == 0, r.stderr[-2000:]
    return str(save / "deepspeech_final.ckpt"), manifest, wav


@pytest.mark.slow
def test_transcribe_cli_streaming_matches_batch(trained_uni):
    """--chunk-seconds streams through serve/streaming.py; with the
    checkpoint's normalization stats running causally the transcript may
    differ from batch mode only through the norm scalar, so just assert
    the streaming path produces the same JSON contract and a transcript."""
    ckpt, _, wav = trained_uni
    r = _run("transcribe.py", [
        "--model-path", ckpt, "--audio-path", wav,
        "--chunk-seconds", "0.2"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "transcription" in out["output"][0]


@pytest.mark.slow
def test_serve_cli_continuous_batching(trained_uni, tmp_path):
    ckpt, manifest, _ = trained_uni
    out_path = tmp_path / "serve.jsonl"
    r = _run("serve.py", [
        "--continue-from", ckpt, "--manifest", manifest,
        "--slots", "2", "--chunk-seconds", "0.2",
        "--output", str(out_path)])
    assert r.returncode == 0, r.stderr[-2000:]
    recs = [json.loads(l) for l in out_path.read_text().splitlines()]
    assert len(recs) == 6  # every manifest row served
    assert {r["wav"] for r in recs} == {
        l.split(",")[0] for l in open(manifest) if l.strip()}
    assert "served 6 utterances" in r.stderr


@pytest.mark.slow
def test_serve_cli_rejects_bidirectional(trained, tmp_path):
    ckpt, manifest, _ = trained
    r = _run("serve.py", ["--continue-from", ckpt, "--manifest", manifest])
    assert r.returncode != 0
    assert "unidirectional" in (r.stderr + r.stdout)


@pytest.mark.slow
def test_transcribe_cli_streaming_beam(trained_uni):
    ckpt, _, wav = trained_uni
    r = _run("transcribe.py", [
        "--model-path", ckpt, "--audio-path", wav,
        "--chunk-seconds", "0.2", "--decoder", "beam", "--beam-width", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "transcription" in out["output"][0]


@pytest.fixture(scope="module")
def trained_cnn(trained, tmp_path_factory):
    """A Wav2Letter (CNN-family) checkpoint on the same data."""
    _, manifest, wav = trained
    save = tmp_path_factory.mktemp("cli_cnn") / "ckpt"
    r = _run("train.py", [
        "--train-manifest", manifest, "--val-manifest", manifest,
        "--batch-size", "2", "--rnn-type", "cnn", "--cnn-width", "16",
        "--hidden-size", "24", "--hidden-layers", "1",
        "--num-workers", "0", "--epochs", "1",
        "--save-folder", str(save), "--id", "cli-cnn",
        "--log-dir", str(save / "logs")])
    assert r.returncode == 0, r.stderr[-2000:]
    return str(save / "deepspeech_final.ckpt"), manifest, wav


@pytest.mark.slow
def test_transcribe_cli_cnn_streaming(trained_cnn):
    """--chunk-seconds on a CNN checkpoint routes through the overlap-save
    runtime (serve/streaming_cnn.py) — round 3 rejected this family."""
    ckpt, _, wav = trained_cnn
    r = _run("transcribe.py", [
        "--model-path", ckpt, "--audio-path", wav,
        "--chunk-seconds", "0.3"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "transcription" in out["output"][0]
    # --se-mode two_pass accepted (exact-at-finish SE handling; a no-op
    # second pass on this SE-free stack)
    r = _run("transcribe.py", [
        "--model-path", ckpt, "--audio-path", wav,
        "--chunk-seconds", "0.3", "--se-mode", "two_pass"])
    assert r.returncode == 0, r.stderr[-2000:]
    out2 = json.loads(r.stdout.strip().splitlines()[-1])
    assert out2["output"][0]["transcription"] == \
        out["output"][0]["transcription"]


@pytest.mark.slow
def test_serve_cli_cnn_continuous_batching(trained_cnn, tmp_path):
    """serve.py continuous batching over a CNN checkpoint."""
    ckpt, manifest, _ = trained_cnn
    out = tmp_path / "serve_out.csv"
    r = _run("serve.py", [
        "--continue-from", ckpt, "--manifest", manifest,
        "--slots", "2", "--chunk-seconds", "0.3",
        "--output", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    recs = [json.loads(line) for line in out.read_text().splitlines()]
    assert len(recs) == 6  # one per manifest utterance
    assert all("transcription" in rec for rec in recs)
