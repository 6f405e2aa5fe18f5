"""Continuous-batching StreamPool: independent lifecycles == lockstep runs.

Each slot's emitted logits/transcript must match a single-stream
StreamingTranscriber run of the same audio, regardless of when the stream
joined the pool, how its audio was chopped, or whether its slot is being
reused after a previous tenant.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepspeech_tpu.audio import AudioConf
from deepspeech_tpu.models import DeepSpeech2
from deepspeech_tpu.serve import StreamingTranscriber, StreamPool
from deepspeech_tpu.text import Labels

EN_LABELS = "_'ABCDEFGHIJKLMNOPQRSTUVWXYZ2 "
CHUNK = 24


@pytest.fixture(scope="module")
def setup():
    model = DeepSpeech2(num_classes=30, hidden_size=32, hidden_layers=2,
                        cell="gru", bidirectional=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 161, 51)), jnp.asarray([51]), False)
    labels = Labels(EN_LABELS)
    return model, variables, labels


def _audio(seconds, seed):
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    t = np.arange(n) / 16000
    return (0.3 * np.sin(2 * np.pi * (300 + 50 * seed) * t)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


def _single(model, variables, labels, y):
    st = StreamingTranscriber(model, variables, labels, AudioConf(),
                              normalize="none", chunk_frames=CHUNK)
    st.feed(y)
    st.finish()
    return st.collected_logits()[0], st.texts[0]


def test_pool_matches_single_stream_with_staggered_joins(setup):
    model, variables, labels = setup
    ys = [_audio(0.8, 1), _audio(1.3, 2), _audio(0.6, 3)]
    refs = [_single(model, variables, labels, y) for y in ys]

    pool = StreamPool(model, variables, labels, AudioConf(),
                      normalize="none", chunk_frames=CHUNK, slots=4,
                      collect_logits=True)
    s0 = pool.open()
    pool.write(s0, ys[0])
    pool.close(s0)
    pool.tick()                      # stream 0 starts alone
    s1 = pool.open()                 # stream 1 joins 1 tick later
    pool.write(s1, ys[1][:5000])
    pool.tick()
    pool.write(s1, ys[1][5000:])
    pool.close(s1)
    s2 = pool.open()                 # stream 2 joins 2 ticks later
    pool.write(s2, ys[2])
    pool.close(s2)
    for _ in range(200):
        if not pool.busy():
            break
        pool.tick()
    assert not pool.busy()

    for slot, (ref_logits, ref_text) in zip((s0, s1, s2), refs):
        got = pool.collected_logits(slot)
        assert got.shape == ref_logits.shape, (slot, got.shape,
                                               ref_logits.shape)
        np.testing.assert_allclose(got, ref_logits, rtol=2e-4, atol=2e-4)
        assert pool.text(slot) == ref_text


def test_pool_slot_reuse(setup):
    model, variables, labels = setup
    y_a, y_b = _audio(0.7, 5), _audio(0.9, 6)
    ref_a = _single(model, variables, labels, y_a)
    ref_b = _single(model, variables, labels, y_b)

    pool = StreamPool(model, variables, labels, AudioConf(),
                      normalize="none", chunk_frames=CHUNK, slots=1,
                      collect_logits=True)
    s = pool.open()
    pool.write(s, y_a)
    pool.close(s)
    while pool.busy():
        pool.tick()
    text_a = pool.text(s)
    logits_a = pool.collected_logits(s)

    s2 = pool.open()
    assert s2 == s                    # the lane is reused
    pool.write(s2, y_b)
    pool.close(s2)
    while pool.busy():
        pool.tick()

    np.testing.assert_allclose(logits_a, ref_a[0], rtol=2e-4, atol=2e-4)
    assert text_a == ref_a[1]
    np.testing.assert_allclose(pool.collected_logits(s2), ref_b[0],
                               rtol=2e-4, atol=2e-4)
    assert pool.text(s2) == ref_b[1]


def test_pool_full_raises(setup):
    model, variables, labels = setup
    pool = StreamPool(model, variables, labels, AudioConf(),
                      normalize="none", chunk_frames=CHUNK, slots=1)
    pool.open()
    with pytest.raises(RuntimeError):
        pool.open()


def test_pool_beam_decoding(setup):
    model, variables, labels = setup
    ys = [_audio(0.8, 8), _audio(1.1, 9)]

    def single_beam(y):
        st = StreamingTranscriber(model, variables, labels, AudioConf(),
                                  normalize="none", chunk_frames=CHUNK,
                                  decoder="beam", beam_width=8)
        st.feed(y)
        st.finish()
        return st.beam_texts()[0][0]

    refs = [single_beam(y) for y in ys]

    pool = StreamPool(model, variables, labels, AudioConf(),
                      normalize="none", chunk_frames=CHUNK, slots=2,
                      decoder="beam", beam_width=8)
    s0 = pool.open()
    pool.write(s0, ys[0])
    pool.close(s0)
    pool.tick()                       # stagger the joins
    s1 = pool.open()
    pool.write(s1, ys[1])
    pool.close(s1)
    while pool.busy():
        pool.tick()
    assert pool.beam_text(s0) == refs[0]
    assert pool.beam_text(s1) == refs[1]

    # slot reuse keeps beam lanes independent
    s2 = pool.open()
    y2 = _audio(0.6, 10)
    pool.write(s2, y2)
    pool.close(s2)
    while pool.busy():
        pool.tick()
    assert pool.beam_text(s2) == single_beam(y2)


def test_pool_underrun_silence_fill(setup):
    """An ACTIVE slot with no buffered audio at tick time is silence-filled
    in real time (underruns counted) and still completes correctly."""
    model, variables, labels = setup
    pool = StreamPool(model, variables, labels, AudioConf(),
                      normalize="none", chunk_frames=CHUNK, slots=1)
    y = _audio(0.9, 13)
    s = pool.open()
    half = len(y) // 2
    pool.write(s, y[:half])
    while len(pool._buf[s]) >= pool._A:  # drain what we have
        pool.tick()
    pool.tick()                           # ACTIVE with empty buffer
    assert pool.underruns[s] >= 1
    pool.write(s, y[half:])               # stream resumes (silence gap)
    pool.close(s)
    n = 0
    while pool.busy():
        pool.tick()
        n += 1
        assert n < 200
    assert pool.done(s)
    assert isinstance(pool.text(s), str)


def test_pool_lm_beam_slot_reuse(setup, tmp_path):
    """LM-fused pool decoding: each slot's hypotheses equal a single
    LM-fused stream, and slot REUSE resets the per-beam LM carry (word
    context + char-trie node) along with the beam state."""
    from tests.test_beam import ARPA
    model, variables, labels = setup
    arpa = ARPA.replace("AB", "HI").replace("BA", "ME")
    p = tmp_path / "t.arpa"
    p.write_text(arpa)

    def single(y):
        st = StreamingTranscriber(model, variables, labels, AudioConf(),
                                  normalize="none", chunk_frames=CHUNK,
                                  decoder="beam", beam_width=8,
                                  lm_path=str(p), lm_alpha=1.5, lm_beta=0.4)
        st.feed(y)
        st.finish()
        return st.beam_texts()[0][0]

    pool = StreamPool(model, variables, labels, AudioConf(),
                      normalize="none", chunk_frames=CHUNK, slots=2,
                      decoder="beam", beam_width=8, lm_path=str(p),
                      lm_alpha=1.5, lm_beta=0.4)
    ys = [_audio(0.8, 8), _audio(1.1, 9)]
    slots = []
    for y in ys:
        s = pool.open()
        pool.write(s, y)
        pool.close(s)
        slots.append(s)
    while pool.busy():
        pool.tick()
    for s, y in zip(slots, ys):
        assert pool.beam_text(s) == single(y)
    # reuse: a fresh tenant must not inherit the previous word context
    y2 = _audio(0.6, 10)
    s2 = pool.open()
    pool.write(s2, y2)
    pool.close(s2)
    while pool.busy():
        pool.tick()
    assert pool.beam_text(s2) == single(y2)
