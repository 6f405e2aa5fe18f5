"""Streaming inference vs the batch forward: exact-parity checks.

The streaming runtime (serve/streaming.py) must reproduce the batch model's
outputs exactly when the normalization scalars are pinned (frozen_norm) or
stats-free (normalize="none"): the conv/RNN/lookahead pipeline carries exact
state, so logits and transcripts are bit-compatible up to float accumulation
order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepspeech_tpu.audio import AudioConf
from deepspeech_tpu.audio.features import featurize_batch
from deepspeech_tpu.models import DeepSpeech2
from deepspeech_tpu.serve import StreamingTranscriber
from deepspeech_tpu.text import Labels

EN_LABELS = "_'ABCDEFGHIJKLMNOPQRSTUVWXYZ2 "


def _make_model(cell="gru", layers=2, hidden=64):
    model = DeepSpeech2(num_classes=30, hidden_size=hidden,
                        hidden_layers=layers, cell=cell, bidirectional=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 161, 51)), jnp.asarray([51]), False)
    # non-trivial batch stats so BN inference actually transforms
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    return model, variables


def _audio(seconds=2.3, seed=0):
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    t = np.arange(n) / 16000
    y = (0.3 * np.sin(2 * np.pi * 440 * t)
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    return y


def _batch_logits(model, variables, y, conf, normalize):
    audio = jnp.asarray(y)[None, :]
    lengths = jnp.asarray([len(y)])
    spect, frame_lengths = featurize_batch(audio, lengths, conf,
                                           normalize=normalize)
    logits, _, out_lens = model.apply(variables, spect, frame_lengths, False)
    return np.asarray(logits)[0, : int(out_lens[0])], int(out_lens[0])


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_streaming_matches_batch_norm_none(cell):
    model, variables = _make_model(cell=cell)
    conf = AudioConf()
    labels = Labels(EN_LABELS)
    y = _audio()
    ref, t_out = _batch_logits(model, variables, y, conf, "none")

    st = StreamingTranscriber(model, variables, labels, conf,
                              normalize="none", chunk_frames=40)
    st.feed(y)
    st.finish()
    got = st.collected_logits()[0]
    assert got.shape[0] == t_out, (got.shape, t_out)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_streaming_frozen_norm_exact_parity_and_text():
    model, variables = _make_model()
    conf = AudioConf()
    labels = Labels(EN_LABELS)
    y = _audio(seconds=1.7, seed=3)
    ref, t_out = _batch_logits(model, variables, y, conf, "max_frame")

    # pin the normalization scalar to the batch value -> exact parity
    spect_lg = np.log1p(
        np.abs(_stft_mag(y, conf)) * 1048576.0)
    mean_scalar = spect_lg.mean(axis=0).mean()
    st = StreamingTranscriber(
        model, variables, labels, conf, normalize="max_frame",
        chunk_frames=64,
        frozen_norm=(np.array([mean_scalar], np.float32),
                     np.array([1.0], np.float32)))
    st.feed(y)
    st.finish()
    got = st.collected_logits()[0]
    assert got.shape[0] == t_out
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    # transcripts agree with the batch greedy decoder
    from deepspeech_tpu.decoders import GreedyDecoder
    dec = GreedyDecoder(labels.labels, blank_index=labels.blank_index)
    batch_text = dec.decode(ref[None, :, :], [t_out])[0][0][0]
    assert st.texts[0] == batch_text


def test_streaming_running_stats_converges():
    """Causal running stats: transcription runs end-to-end and late-stream
    logits approach the batch values (the scalar converges)."""
    model, variables = _make_model(layers=1, hidden=32)
    conf = AudioConf()
    labels = Labels(EN_LABELS)
    y = _audio(seconds=2.0, seed=7)
    ref, t_out = _batch_logits(model, variables, y, conf, "max_frame")

    st = StreamingTranscriber(model, variables, labels, conf,
                              normalize="max_frame", chunk_frames=48)
    st.feed(y[:8000])
    st.feed(y[8000:])
    st.finish()
    got = st.collected_logits()[0]
    assert got.shape[0] == t_out
    # stationary input -> running scalar converges; the last quarter of the
    # stream should be close to the batch forward
    q = 3 * t_out // 4
    np.testing.assert_allclose(got[q:], ref[q:], rtol=0.2, atol=0.5)


def test_streaming_chunk_size_invariance():
    """The emitted logits must not depend on how the audio is chopped."""
    model, variables = _make_model(layers=1, hidden=32)
    conf = AudioConf()
    labels = Labels(EN_LABELS)
    y = _audio(seconds=1.1, seed=11)

    outs = []
    for chunk_frames, feed_sizes in [(40, [len(y)]),
                                     (16, [1000] * (len(y) // 1000) +
                                      [len(y) % 1000])]:
        st = StreamingTranscriber(model, variables, labels, conf,
                                  normalize="none",
                                  chunk_frames=chunk_frames)
        pos = 0
        for s in feed_sizes:
            if s:
                st.feed(y[pos:pos + s])
                pos += s
        st.finish()
        outs.append(st.collected_logits()[0])
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-4)


def _stft_mag(y, conf):
    from deepspeech_tpu.audio.features import audio_to_stft_np
    return audio_to_stft_np(y, conf).T  # (T, bins)


def test_streaming_beam_matches_batch_beam():
    """decoder="beam": the chunked beam continuation must produce the SAME
    hypothesis as the one-shot device beam search over the batch logits."""
    model, variables = _make_model(layers=1, hidden=32)
    conf = AudioConf()
    labels = Labels(EN_LABELS)
    y = _audio(seconds=1.2, seed=21)
    ref_logits, t_out = _batch_logits(model, variables, y, conf, "none")

    from deepspeech_tpu.decoders.beam_device import ctc_beam_search_device
    lp = jax.nn.log_softmax(jnp.asarray(ref_logits)[None], axis=-1)
    prefixes, lens, _, scores = ctc_beam_search_device(
        lp, jnp.asarray([t_out]), beam_width=8, blank=labels.blank_index)
    n = int(lens[0, 0])
    batch_text = "".join(EN_LABELS[int(x)]
                         for x in np.asarray(prefixes)[0, 0, :n])

    st = StreamingTranscriber(model, variables, labels, conf,
                              normalize="none", chunk_frames=32,
                              decoder="beam", beam_width=8)
    st.feed(y)
    st.finish()
    assert st.beam_texts()[0][0] == batch_text


def test_streaming_lm_beam_matches_batch_lm_beam(tmp_path):
    """decoder="beam" + lm_path: live LM-fused streaming decode equals the
    one-shot LM-fused device beam search exactly (same DSLM arrays, same
    per-beam word-context carry; reference capability = ctcdecode+KenLM,
    decoder.py:95-99, which has no streaming form at all)."""
    from tests.test_beam import ARPA
    arpa = ARPA.replace("AB", "HI").replace("BA", "ME")  # EN_LABELS words
    p = tmp_path / "t.arpa"
    p.write_text(arpa)

    model, variables = _make_model(layers=1, hidden=32)
    conf = AudioConf()
    labels = Labels(EN_LABELS)
    y = _audio(seconds=1.2, seed=33)
    ref_logits, t_out = _batch_logits(model, variables, y, conf, "none")

    from deepspeech_tpu.decoders.beam_device import ctc_beam_search_device
    from deepspeech_tpu.decoders.lm_device import load_device_lm
    lm = load_device_lm(str(p), EN_LABELS)
    lp = jax.nn.log_softmax(jnp.asarray(ref_logits)[None], axis=-1)
    prefixes, lens, _, scores = ctc_beam_search_device(
        lp, jnp.asarray([t_out]), beam_width=8, blank=labels.blank_index,
        lm=lm, space=EN_LABELS.index(" "), alpha=1.2, beta=0.4)
    n = int(lens[0, 0])
    batch_text = "".join(EN_LABELS[int(x)]
                         for x in np.asarray(prefixes)[0, 0, :n])

    st = StreamingTranscriber(model, variables, labels, conf,
                              normalize="none", chunk_frames=32,
                              decoder="beam", beam_width=8,
                              lm_path=str(p), lm_alpha=1.2, lm_beta=0.4)
    st.feed(y)
    st.finish()
    assert st.beam_texts()[0][0] == batch_text
    # and the fused scores differ from the unfused ones (guards against the
    # LM silently not being applied; this model emits few/no spaces, so the
    # pending-partial completion bonus is the observable effect)
    from deepspeech_tpu.decoders.beam_device import beam_state_best
    st2 = StreamingTranscriber(model, variables, labels, conf,
                               normalize="none", chunk_frames=32,
                               decoder="beam", beam_width=8)
    st2.feed(y)
    st2.finish()
    _, _, _, s_fused = beam_state_best(
        st._beam_state, 4, lm=st.lm, space=st._lm_space,
        alpha=st.lm_alpha, beta=st.lm_beta)
    _, _, _, s_plain = beam_state_best(st2._beam_state, 4)
    assert not np.allclose(np.asarray(s_fused), np.asarray(s_plain))
