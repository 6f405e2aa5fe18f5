"""End-to-end training convergence: overfit synthetic audio to exact decode.

The reference has no test suite and judges correctness empirically via WER
(SURVEY.md §4); this is the compressed equivalent — the full pipeline
(device featurize -> DS2 forward -> CTC loss -> backward -> update -> greedy
decode) must drive the loss to ~0 and reproduce the target transcripts
exactly on a tiny synthetic set. Catches sign/ordering bugs anywhere in the
train path that unit tests of the pieces would miss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from deepspeech_tpu.audio import AudioConf
from deepspeech_tpu.decoders import GreedyDecoder
from deepspeech_tpu.models import DeepSpeech2
from deepspeech_tpu.train import TrainState
from deepspeech_tpu.train.step import StepConfig, make_eval_step, make_train_step

LABELS = "_'ABCDEFGHIJKLMNOPQRSTUVWXYZ2 "


def _tone_utterance(rng, pattern, sr=16000, seconds=0.6):
    """Distinct multi-tone waveform per pattern so utterances are separable."""
    t = np.arange(int(sr * seconds)) / sr
    y = np.zeros_like(t, dtype=np.float32)
    for i, f in enumerate(pattern):
        seg = slice(i * len(t) // len(pattern), (i + 1) * len(t) // len(pattern))
        y[seg] = 0.3 * np.sin(2 * np.pi * f * t[seg])
    return (y + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


@pytest.mark.slow
def test_overfit_two_utterances_exact_decode():
    rng = np.random.default_rng(0)
    texts = ["ABC", "CBA"]
    waves = [_tone_utterance(rng, [440, 880, 660]),
             _tone_utterance(rng, [990, 550, 330])]
    char_to_id = {c: i for i, c in enumerate(LABELS)}
    tgt = np.zeros((2, 3), np.int32)
    for b, s in enumerate(texts):
        tgt[b] = [char_to_id[c] for c in s]
    batch = {
        "audio": jnp.asarray(np.stack(waves)),
        "audio_lengths": jnp.asarray([len(w) for w in waves], jnp.int32),
        "targets": jnp.asarray(tgt),
        "target_lengths": jnp.asarray([3, 3], jnp.int32),
    }

    model = DeepSpeech2(num_classes=len(LABELS), hidden_size=64,
                        hidden_layers=1, cell="gru", bidirectional=True)
    cfg = StepConfig(audio_conf=AudioConf(), normalize="mean",
                     max_frame_jitter=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 161, 51)), jnp.asarray([51]), False)
    tx = optax.adam(3e-3)
    state = TrainState.create(variables, tx)
    train_step = make_train_step(model, tx, cfg, donate=False)
    eval_step = make_eval_step(model, cfg)

    key = jax.random.PRNGKey(1)
    first = last = None
    for step in range(300):
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
        if first is None:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
        if last < 0.05:
            break

    assert last < 0.5, f"loss failed to converge: {first} -> {last}"
    assert last < first / 10

    out = eval_step(state, batch)
    decoder = GreedyDecoder(LABELS)
    strings, _ = decoder.decode(np.asarray(out["probs"]),
                                sizes=np.asarray(out["out_lens"]))
    got = [s[0] for s in strings]
    assert got == texts, f"decode mismatch: {got} != {texts}"
