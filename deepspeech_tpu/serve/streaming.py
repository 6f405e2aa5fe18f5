"""Chunked streaming inference for unidirectional DeepSpeech2.

The reference's unidirectional DS2 carries a Lookahead convolution
(reference model.py:140-177, 329-333) — the streaming head of Wang et al.
2016 — but the reference has no streaming runtime; transcribe.py:63-71 is
batch-only. This module is the TPU-native streaming runtime: audio arrives
in fixed-size chunks and a single jitted ``chunk_step`` advances the whole
pipeline (STFT -> normalize -> conv stack -> unidirectional RNN stack ->
lookahead -> head) while carrying every piece of sequential state as device
arrays with static shapes:

* ``wave_tail``   — the n_fft-hop samples preceding the chunk (STFT framing);
* ``mag_buf``     — raw magnitude frames covering the conv stack's receptive
                    field (radius 15 input frames for the 41x11 s(2,2) +
                    21x11 s(1,1) stack), so each chunk emits exactly the
                    conv outputs whose full receptive field is final;
* ``rnn_h/rnn_c`` — per-layer recurrent state;
* ``la_buf``      — the lookahead FIFO (context frames of future delay);
* running normalization statistics — every reference normalize mode
  (data_loader_aug.py:274-313) reduces to per-utterance *scalars* (see
  audio/features.py:174-236: the gaussian smoothing is mean-preserving, and
  the 'norm' std is shift-invariant), so causal streaming just maintains
  running means of per-frame statistics. ``frozen_norm`` pins the scalars
  instead (two-pass or calibrated serving), which makes streaming output
  *bit-identical* to the batch forward.

Emission is exact, not approximate: a chunk's conv outputs are only emitted
once every input frame in their receptive field is final (8-output lag),
and the lookahead delays emission by ``context`` further outputs — the same
zero-padding the batch model applies at utterance edges is reproduced by
the zero-initialized/zero-masked buffers. Algorithmic latency is therefore
16 input frames (0.16 s at 16 kHz) + context conv outputs (20 => 0.40 s)
plus the chunk period.

Total per-chunk device work is one fixed-shape jit call; multiple
independent streams ride the batch dimension in lockstep.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from deepspeech_tpu.audio.features import N_BINS, AudioConf, make_window
from deepspeech_tpu.models.ds2 import ConvFrontend, DeepSpeech2
from deepspeech_tpu.ops.rnn import _gru_step, _lstm_step, _rnn_step
from deepspeech_tpu.ops.stft import stft_magnitude

_INT_SENTINEL = np.int32(2 ** 31 - 1)
_DEBUG = None  # set to a list to capture eager-mode intermediates (tests)

# conv-stack geometry (ds2.py ConvFrontend): conv1 k_t=11 pad 5 stride 2,
# conv2 k_t=11 pad 5 stride 1 -> conv2 output t reads input frames
# [2t-15, 2t+15]; 16-frame margins keep everything even-aligned.
_CTX_F = 32          # input-frame context kept left of each chunk
_EMIT_LAG_OUT = 8    # first emitted conv output of a window (= _CTX_F/4)


def _bn_inf(x, params, stats, eps=1e-5):
    """TorchBatchNorm inference transform (models/layers.py:31-62)."""
    inv = jax.lax.rsqrt(stats["var"] + eps)
    return (x - stats["mean"]) * (inv * params["scale"]) + params["bias"]


@dataclass(frozen=True)
class _Geometry:
    chunk_frames: int        # K: input frames per chunk (even)
    hop: int
    n_fft: int
    emit: int                # K/2 conv outputs emitted per chunk
    window_frames: int       # K + _CTX_F

    @property
    def chunk_samples(self) -> int:
        return self.chunk_frames * self.hop


class StreamingTranscriber:
    """Stateful streaming ASR over a unidirectional DeepSpeech2.

    Parameters
    ----------
    model : DeepSpeech2 (``bidirectional=False``)
    variables : {"params": ..., "batch_stats": ...} trained variables
    labels : text.Labels (for incremental greedy decoding)
    audio_conf : AudioConf
    normalize : reference normalize mode (all five supported)
    chunk_frames : input STFT frames per chunk (even; chunk period =
        chunk_frames * hop / sample_rate seconds)
    batch_size : number of lockstep streams riding the batch dimension
    frozen_norm : optional (mean_scalar, std_scalar) arrays of shape (B,)
        pinning the normalization statistics (exact batch parity); None =>
        causal running statistics
    """

    def __init__(self, model: DeepSpeech2, variables, labels,
                 audio_conf: AudioConf | None = None,
                 normalize: str = "max_frame", chunk_frames: int = 96,
                 batch_size: int = 1, frozen_norm=None,
                 decoder: str = "greedy", beam_width: int = 16,
                 cutoff_top_n: int = 40, cutoff_prob: float = 1.0,
                 beam_max_len: int = 1000, lm_path: str | None = None,
                 lm_alpha: float = 0.8, lm_beta: float = 1.0):
        self._validate_model(model)
        if chunk_frames < 4:
            raise ValueError("chunk_frames must be >= 4")
        conf = audio_conf or AudioConf()
        if conf.n_fft != 2 * conf.hop:
            raise ValueError("streaming assumes 50%-overlap STFT framing "
                             "(n_fft == 2*hop)")
        self.model = model
        self.variables = variables
        self.labels = labels
        self.conf = conf
        self.normalize = normalize
        self.batch_size = batch_size
        self.frozen_norm = frozen_norm
        self._window = make_window(conf.window, conf.n_fft)
        # model-family hooks: geometry (also sets _emit_lag/_extra_delay)
        # and the un-jitted forward the fused beam step reuses
        self.geo = self._build_geometry(chunk_frames)
        self._forward = self._make_forward()
        self._step = jax.jit(self._forward)
        # optional streaming prefix beam search riding the same emission
        # (decoders/beam_device.py continuation API): chunked == one-shot
        # exactly, since invalid steps are score-preserving blanks
        if decoder not in ("greedy", "beam"):
            raise ValueError(f"decoder must be greedy|beam, got {decoder!r}")
        self.decoder = decoder
        self.beam_width = beam_width
        self.cutoff_top_n = cutoff_top_n
        self.cutoff_prob = float(cutoff_prob)
        self.beam_max_len = beam_max_len
        # optional word-LM shallow fusion INSIDE the streaming beam
        # (decoders/lm_device.py): live LM-fused decode, same math as the
        # one-shot DeviceBeamCTCDecoder(lm_path=...)
        self.lm = None
        self.lm_alpha = float(lm_alpha)
        self.lm_beta = float(lm_beta)
        if lm_path and decoder == "beam":
            from deepspeech_tpu.decoders.lm_device import load_device_lm
            self.lm = load_device_lm(lm_path, labels.labels)
        self._lm_space = (labels.labels.index(" ")
                          if " " in labels.labels else -1)
        # fused chunk+beam step: the beam continuation rides the SAME jitted
        # program as the model step, so a beam tick costs one device
        # dispatch instead of two (the extra dispatch dominated beam-tick
        # latency on high-RTT host links, PERF.md streaming section)
        self._step_beam = None
        if decoder == "beam":
            blank = labels.blank_index

            # NOTE: the device LM rides as a TRACED pytree argument, never a
            # closure capture — captured arrays would be baked into the
            # jitted program as constants (duplicating a potentially
            # hundreds-of-MB n-gram table per compile)
            forward = self._forward

            def _fused(carry, chunk, t_frames, t_out, start, variables,
                       beam_state, beam_ts, beam_valid, lm):
                from deepspeech_tpu.decoders.beam_device import \
                    beam_continue_impl
                carry, logits = forward(
                    carry, chunk, t_frames, t_out, start, variables)
                beam_state = beam_continue_impl(
                    beam_state, logits, beam_ts, beam_valid, blank=blank,
                    cutoff_top_n=cutoff_top_n,
                    cutoff_prob=float(cutoff_prob), lm=lm,
                    space=self._lm_space, alpha=float(lm_alpha),
                    beta=float(lm_beta))
                return carry, logits, beam_state

            self._step_beam = jax.jit(_fused)
        self.reset()

    # -- model-family hooks (CNNStreamingTranscriber overrides these) -------

    def _validate_model(self, model):
        if getattr(model, "bidirectional", None) is None:
            raise ValueError(
                f"{type(model).__name__} is a CNN-family acoustic model — "
                "use serve.CNNStreamingTranscriber (chunked overlap-save "
                "conv streaming) instead of the DS2 recurrent runtime")
        if model.bidirectional:
            raise ValueError("streaming requires a unidirectional model "
                             "(lookahead head, reference model.py:329-333)")

    def _build_geometry(self, chunk_frames: int) -> _Geometry:
        if chunk_frames % 2:
            raise ValueError("chunk_frames must be even")
        self._emit_lag = _EMIT_LAG_OUT
        self._extra_delay = self.model.context  # lookahead output delay
        self._out_stride = 2  # input frames per conv output (stride-2 front)
        return _Geometry(chunk_frames=chunk_frames, hop=self.conf.hop,
                         n_fft=self.conf.n_fft, emit=chunk_frames // 2,
                         window_frames=chunk_frames + _CTX_F)

    def _make_forward(self):
        """Un-jitted (carry, chunk, t_frames, t_out, start, variables) ->
        (carry, (B, emit, C) logits)."""
        return functools.partial(_chunk_step, model=self.model, geo=self.geo,
                                 normalize=self.normalize,
                                 window=self._window,
                                 frozen=self.frozen_norm is not None)

    def _out_len(self, t_frames: int) -> int:
        """Model output count for a t_frames-frame utterance
        (DS2 conv front: ceil-div by the stride-2 conv, ds2.py)."""
        return (t_frames - 1) // 2 + 1

    def _init_model_carry(self, zeros) -> dict:
        m, b = self.model, self.batch_size
        h = m.hidden_size
        return {"rnn_h": zeros(m.hidden_layers, b, h),
                "rnn_c": zeros(m.hidden_layers, b, h),
                "la_buf": zeros(b, m.context, h)}

    def reset_slot_carry(self, s: int):
        """Zero one lane's model state in place (StreamPool slot reuse)."""
        c = self._carry
        c["rnn_h"] = c["rnn_h"].at[:, s].set(0.0)
        c["rnn_c"] = c["rnn_c"].at[:, s].set(0.0)
        c["la_buf"] = c["la_buf"].at[s].set(0.0)

    # -- stream lifecycle --------------------------------------------------

    def reset(self):
        g, b = self.geo, self.batch_size
        zeros = lambda *s: jnp.zeros(s, jnp.float32)  # noqa: E731
        self._carry = {
            "wave_tail": zeros(b, g.n_fft - g.hop),
            "mag_buf": zeros(b, N_BINS, g.window_frames),
            "norm_sum": zeros(b),
            "norm_cnt": zeros(b),
            "norm_std_sum": zeros(b),
            "appended": jnp.zeros((), jnp.int32),
        }
        self._carry.update(self._init_model_carry(zeros))
        if self.frozen_norm is not None:
            mean, std = self.frozen_norm
            self._carry["norm_sum"] = jnp.asarray(mean, jnp.float32)
            self._carry["norm_std_sum"] = jnp.asarray(std, jnp.float32)
        # host bookkeeping
        self._buf = [np.zeros((self.batch_size, 0), np.float32)]
        self._started = False
        self._finished = False
        self._samples = 0
        self._conv_base = -self._emit_lag  # global idx of next emitted convs
        self._t_frames = np.full(self.batch_size, _INT_SENTINEL, np.int64)
        self._t_out = np.full(self.batch_size, _INT_SENTINEL, np.int64)
        self._prev_id = [None] * self.batch_size
        self._texts = [""] * self.batch_size
        self._logits: list[np.ndarray] = []   # per-step (B, E, C)
        self._anchor_bases: list[int] = []
        self._n_emitted = np.zeros(self.batch_size, np.int64)
        self._beam_state = None
        if getattr(self, "decoder", "greedy") == "beam":
            from deepspeech_tpu.decoders.beam_device import beam_state_init
            self._beam_state = beam_state_init(self.batch_size,
                                               self.beam_width,
                                               self.beam_max_len,
                                               lm=self.lm)

    # -- feeding -----------------------------------------------------------

    def feed(self, samples: np.ndarray) -> list[str]:
        """Append raw waveform samples ((S,) for batch 1, else (B, S)) and
        run every complete chunk. Returns the newly decoded text fragment
        per stream."""
        if self._finished:
            raise RuntimeError("stream finished; call reset()")
        samples = np.asarray(samples, np.float32)
        if samples.ndim == 1:
            samples = samples[None, :]
        if samples.shape[0] != self.batch_size:
            raise ValueError("stream batch mismatch")
        self._buf.append(samples)
        self._samples += samples.shape[1]
        return self._drain_full_chunks()

    def finish(self) -> list[str]:
        """Flush: final (+1 reflected) STFT frame, conv drain, lookahead
        drain. Returns the final text fragment per stream."""
        if self._finished:
            return [""] * self.batch_size
        g = self.geo
        pad = g.n_fft // 2
        y = np.concatenate(self._buf, axis=1)
        total = self._samples
        if total <= pad:
            raise ValueError(f"stream too short ({total} samples)")
        t_total = 1 + total // g.hop                   # frames (features.py:79)
        self._t_frames[:] = t_total
        self._t_out[:] = self._out_len(t_total)        # model out_lengths
        # reflect end pad (np.pad mode="reflect"), enough for the final
        # centered frame; trailing zeros beyond it are masked invalid in-jit
        tail_src = y[:, -(pad + 1):]
        reflect = tail_src[:, -2::-1][:, :pad]
        self._buf.append(reflect)
        self._samples += pad
        out = self._drain_full_chunks()
        # drain with zero chunks until every stream has all t_out outputs
        while (self._n_emitted < self._t_out).any():
            zeros = np.zeros((self.batch_size, g.chunk_samples), np.float32)
            self._buf.append(zeros)
            self._samples += g.chunk_samples
            out = [a + b for a, b in zip(out, self._drain_full_chunks())]
        self._finished = True
        return out

    def transcribe(self, samples: np.ndarray,
                   chunk_seconds: float | None = None) -> list[str]:
        """Convenience: stream a complete utterance through feed()/finish()."""
        self.reset()
        out = self.feed(samples)
        fin = self.finish()
        return [a + b for a, b in zip(out, fin)]

    @property
    def texts(self) -> list[str]:
        return list(self._texts)

    def beam_texts(self, top_paths: int = 1):
        """Current best beam hypotheses (decoder="beam"): nested
        [stream][path] strings, callable mid-stream or after finish().
        Chunked beam == one-shot batch beam exactly (invalid steps are
        score-preserving blanks)."""
        if self._beam_state is None:
            raise RuntimeError('built with decoder="greedy"; '
                               'pass decoder="beam"')
        from deepspeech_tpu.decoders.beam_device import beam_state_best
        prefixes, lens, _, _ = beam_state_best(
            self._beam_state, top_paths=top_paths, lm=self.lm,
            space=self._lm_space, alpha=self.lm_alpha, beta=self.lm_beta)
        prefixes, lens = np.asarray(prefixes), np.asarray(lens)
        chars = self.labels.labels
        return [["".join(chars[int(x)] for x in prefixes[b, p, : lens[b, p]])
                 for p in range(top_paths)]
                for b in range(self.batch_size)]

    def collected_logits(self) -> np.ndarray:
        """(B, T_out, C) logits emitted so far (anchors >= 0 only)."""
        if not self._logits:
            return np.zeros((self.batch_size, 0, 1), np.float32)
        steps = []
        for base, block in zip(self._anchor_bases, self._logits):
            lo = max(0, -base)
            steps.append(block[:, lo:, :])
        full = np.concatenate(steps, axis=1)
        t = int(min(self._t_out.max(), full.shape[1]))
        return full[:, :t]

    # -- internals ---------------------------------------------------------

    def _drain_full_chunks(self) -> list[str]:
        g = self.geo
        frags = [""] * self.batch_size
        while True:
            buf = np.concatenate(self._buf, axis=1) if len(self._buf) > 1 \
                else self._buf[0]
            self._buf = [buf]
            need = g.chunk_samples
            if buf.shape[1] < need:
                return frags
            chunk, rest = buf[:, :need], buf[:, need:]
            if not self._started:
                # librosa-centered stream start: wave_tail = the reflect
                # prefix of the padded signal (y[pad:0:-1])
                pad = g.n_fft - g.hop
                tail = chunk[:, pad:0:-1]
                self._carry["wave_tail"] = jnp.asarray(tail)
                self._started = True
            self._buf = [rest]
            frags = [a + b for a, b in zip(frags, self._run_chunk(chunk))]

    def _run_chunk(self, chunk: np.ndarray) -> list[str]:
        g = self.geo
        anchor_base = self._conv_base - self._extra_delay
        args = (self._carry, jnp.asarray(chunk),
                jnp.asarray(np.minimum(self._t_frames, _INT_SENTINEL)
                            .astype(np.int32)),
                jnp.asarray(np.minimum(self._t_out, _INT_SENTINEL)
                            .astype(np.int32)),
                jnp.zeros(self.batch_size, jnp.int32),  # lockstep: at 0
                self.variables)
        if self._beam_state is not None:
            # one fused dispatch: model chunk step + beam continuation
            idx = anchor_base + np.arange(g.emit, dtype=np.int64)[None, :]
            valid = (idx >= 0) & (idx < self._t_out[:, None])
            self._carry, logits, self._beam_state = self._step_beam(
                *args, self._beam_state,
                jnp.asarray(np.broadcast_to(idx, valid.shape)
                            .astype(np.int32)),
                jnp.asarray(valid), self.lm)
        else:
            self._carry, logits = self._step(*args)
        self._conv_base += g.emit
        logits = np.asarray(logits)
        self._logits.append(logits)
        self._anchor_bases.append(anchor_base)
        frags = []
        blank = self.labels.blank_index
        chars = self.labels.labels
        for b in range(self.batch_size):
            frag = []
            for j in range(g.emit):
                idx = anchor_base + j
                if idx < 0 or idx >= self._t_out[b]:
                    continue
                self._n_emitted[b] = max(self._n_emitted[b], idx + 1)
                cid = int(np.argmax(logits[b, j]))
                prev = self._prev_id[b]
                if cid != blank and not (prev is not None and cid == prev
                                         and idx != 0):
                    frag.append(chars[cid])
                self._prev_id[b] = cid
            s = "".join(frag)
            self._texts[b] += s
            frags.append(s)
        return frags


# ---------------------------------------------------------------------------
# the jitted chunk step
# ---------------------------------------------------------------------------

def _frontend_step(carry, audio, t_frames_total, start_frames, *,
                   geo: _Geometry, normalize: str, window: np.ndarray,
                   frozen: bool):
    """Shared streaming front-end: K new STFT frames into the magnitude
    ring buffer + running normalization scalars. Model-agnostic — the DS2
    chunk step and the CNN-family step (serve/streaming_cnn.py) both ride
    it. Returns (carry-updates dict, normalized spect window (B, 161, W),
    frame validity (B, W))."""
    k = geo.chunk_frames
    w = geo.window_frames
    b = audio.shape[0]

    # ---- STFT: K new frames ------------------------------------------------
    sig = jnp.concatenate([carry["wave_tail"], audio], axis=-1)
    mag = stft_magnitude(sig, geo.n_fft, geo.hop, window, center=False,
                         method="matmul")                      # (B, bins, K)
    n_bins = geo.n_fft // 2 + 1
    if n_bins < N_BINS:   # mirror-fill (features.py:99-108 parity)
        out = jnp.zeros((b, N_BINS, mag.shape[-1]), mag.dtype)
        out = out.at[:, :n_bins, :].set(mag)
        mirror = out[:, 80:0:-1, :]
        mag = out.at[:, 81:, :].set(mirror)
    else:
        mag = mag[:, :N_BINS, :]

    appended = carry["appended"] + k
    mag_buf = jnp.concatenate([carry["mag_buf"][..., k:], mag], axis=-1)

    # stream-relative frame index of every buffer slot, (B, W)
    g_idx = appended - w + jnp.arange(w, dtype=jnp.int32)
    g_rel = g_idx[None, :] - start_frames[:, None]
    valid_f = (g_rel >= 0) & (g_rel < t_frames_total[:, None])  # (B, W)
    new_valid = valid_f[:, -k:].astype(jnp.float32)            # (B, K)

    # ---- normalization scalars (running or frozen) -------------------------
    scale = 1048576.0 if normalize == "max_frame" else 1.0
    lg_new = jnp.log1p(mag * scale)                            # (B, bins, K)
    if frozen:
        norm_sum, norm_cnt = carry["norm_sum"], carry["norm_cnt"]
        norm_std = carry["norm_std_sum"]
        mean_scalar, std_scalar = norm_sum, norm_std
    else:
        fm = lg_new.mean(axis=1)                               # (B, K)
        norm_sum = carry["norm_sum"] + (fm * new_valid).sum(-1)
        norm_cnt = carry["norm_cnt"] + new_valid.sum(-1)
        if normalize == "norm":
            # per-frame unbiased std over freq is shift-invariant, so the
            # batch path's std-of-(x - mean) equals std-of-x (features.py:
            # 223-231); running-average it causally
            fmean = lg_new.mean(axis=1, keepdims=True)
            var = ((lg_new - fmean) ** 2).sum(axis=1) / (N_BINS - 1)
            norm_std = carry["norm_std_sum"] + (jnp.sqrt(var)
                                                * new_valid).sum(-1)
        else:
            norm_std = carry["norm_std_sum"]
        cnt = jnp.maximum(norm_cnt, 1.0)
        mean_scalar = norm_sum / cnt
        std_scalar = norm_std / cnt
    # ---- normalize the whole window with the current scalars ---------------
    lg_buf = jnp.log1p(mag_buf * scale)
    if normalize in ("mean", "frame", "max_frame"):
        spect = lg_buf - mean_scalar[:, None, None]
    elif normalize == "norm":
        spect = (lg_buf - mean_scalar[:, None, None]) \
            / jnp.maximum(std_scalar, 1e-6)[:, None, None]
    elif not normalize or normalize == "none":
        spect = lg_buf
    else:
        raise ValueError(f"No such normalization: {normalize}")
    spect = spect * valid_f[:, None, :].astype(spect.dtype)

    fe = dict(wave_tail=audio[:, -(geo.n_fft - geo.hop):],
              mag_buf=mag_buf, norm_sum=norm_sum, norm_cnt=norm_cnt,
              norm_std_sum=norm_std, appended=appended)
    return fe, spect, valid_f


def _chunk_step(carry, audio, t_frames_total, t_out_total, start_frames,
                variables, *,
                model: DeepSpeech2, geo: _Geometry, normalize: str,
                window: np.ndarray, frozen: bool):
    """One streaming step: (carry, (B, K*hop) samples) -> (carry,
    (B, K/2, C) logits anchored ``context`` conv outputs in the past).

    ``start_frames`` (B,) int32 (even): the global frame index where each
    lane's stream begins — 0 for lockstep streams; the continuous-batching
    pool (StreamPool) points it at the chunk boundary where a stream joined
    its slot, so every validity test below is stream-relative and a lane
    can be reassigned to a new stream without touching the shared buffers
    (stale frames land at negative relative indices and mask to zero)."""
    k = geo.chunk_frames
    e = geo.emit
    w = geo.window_frames
    b = audio.shape[0]

    fe, spect, valid_f = _frontend_step(
        carry, audio, t_frames_total, start_frames,
        geo=geo, normalize=normalize, window=window, frozen=frozen)
    appended = fe["appended"]

    # ---- conv stack over the window ---------------------------------------
    wp = (w - 1) // 2 + 1
    conv_vars = {"params": variables["params"]["conv"],
                 "batch_stats": variables["batch_stats"]["conv"]}
    # window-local valid conv-output range [lo, hi): batch-mode conv2 must
    # read TRUE zeros outside the utterance (MaskConv semantics at the end,
    # conv zero-padding at the start), not conv1-of-zeros activations
    s_half = (appended - w) // 2          # global conv idx of local output 0
    start_half = start_frames // 2        # per-lane conv-idx offset
    t_out_eff = jnp.minimum(t_out_total, 2 ** 30)
    lo = jnp.clip(start_half - s_half, 0, wp)                  # (B,)
    hi = jnp.clip(t_out_eff + start_half - s_half, 0, wp)      # (B,)
    x = ConvFrontend(bnm=model.bnm, compute_dtype=model.compute_dtype).apply(
        conv_vars, spect, hi.astype(jnp.int32), False,
        lo.astype(jnp.int32))
    # feature reorder f*32+c -> c*41+f (ds2.py:171-173)
    f, c = 41, 32
    x = jnp.swapaxes(x.reshape(b, wp, f, c), 2, 3).reshape(b, wp, f * c)
    x = x[:, _EMIT_LAG_OUT:_EMIT_LAG_OUT + e, :].astype(jnp.float32)

    # emitted conv outputs' stream-relative indices + validity
    out_base = (appended - w) // 2 + _EMIT_LAG_OUT
    o_idx = out_base + jnp.arange(e, dtype=jnp.int32)          # (E,)
    o_rel = o_idx[None, :] - start_half[:, None]               # (B, E)
    valid_o = ((o_rel >= 0)
               & (o_rel < t_out_total[:, None])
               ).astype(jnp.float32)                           # (B, E)

    # ---- unidirectional RNN stack with carried state -----------------------
    params = variables["params"]
    stats = variables["batch_stats"]
    step_fns = {"gru": _gru_step, "lstm": _lstm_step, "rnn": _rnn_step}
    step_fn = step_fns[model.cell]
    rnn_h, rnn_c = [], []
    y = x                                                       # (B, E, F)
    vmask = valid_o[:, :, None]
    for i in range(model.hidden_layers):
        p = params[f"rnn{i}"]
        if i > 0:
            y = _bn_inf(y, p["bn"], stats[f"rnn{i}"]["bn"])
        w_ih, b_ih = p["w_ih"][0], p["b_ih"][0]
        w_hh, b_hh = p["w_hh"][0], p["b_hh"][0]
        xp = jnp.einsum("bef,fg->beg", y, w_ih,
                        preferred_element_type=jnp.float32) + b_ih
        h0 = carry["rnn_h"][i]
        c0 = carry["rnn_c"][i]

        def scan_step(state, inp, _step=step_fn, _w=w_hh, _b=b_hh,
                      _cell=model.cell):
            h, cc = state
            xp_t, v_t = inp                                    # (B,G*H),(B,1)
            if _cell == "lstm":
                hn, cn = _step((h, cc), xp_t, _w, _b)
            else:
                hn, cn = _step(h, xp_t, _w, _b), cc
            h = v_t * hn + (1.0 - v_t) * h                     # freeze invalid
            cc = v_t * cn + (1.0 - v_t) * cc
            return (h, cc), h * v_t                            # zero invalid

        (h_fin, c_fin), ys = jax.lax.scan(
            scan_step, (h0, c0),
            (jnp.swapaxes(xp, 0, 1), jnp.swapaxes(vmask, 0, 1)))
        rnn_h.append(h_fin)
        rnn_c.append(c_fin)
        y = jnp.swapaxes(ys, 0, 1)                             # (B, E, H)

    # ---- lookahead FIFO (context-frame delay) ------------------------------
    ctx = model.context
    la_w = params["lookahead"]["weight"]                       # (H, ctx+1)
    combined = jnp.concatenate([carry["la_buf"], y], axis=1)   # (B, ctx+E, H)
    taps = jnp.stack([combined[:, j:j + e, :] for j in range(ctx + 1)],
                     axis=2)                                   # (B, E, ctx+1, H)
    la = jnp.einsum("bejh,hj->beh", taps, la_w)
    la = jnp.clip(la, 0.0, 20.0)                               # hardtanh_0_20
    la_buf = combined[:, e:, :]

    # ---- head --------------------------------------------------------------
    z = _bn_inf(la, params["fc_bn"], stats["fc_bn"])
    logits = z @ params["fc"]["kernel"]                        # (B, E, C)

    if _DEBUG is not None and not isinstance(x, jax.core.Tracer):
        _DEBUG.append({"x": x, "valid_o": valid_o, "o_idx": o_idx,
                       "y": y, "la": la, "spect": spect})
    new_carry = dict(carry)
    new_carry.update(fe)
    new_carry.update(rnn_h=jnp.stack(rnn_h), rnn_c=jnp.stack(rnn_c),
                     la_buf=la_buf)
    return new_carry, logits.astype(jnp.float32)
