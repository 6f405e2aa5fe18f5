"""Chunked overlap-save streaming for the CNN acoustic-model family.

The reference's convolutional models (Wav2Letter model.py:506-562,
ResidualWav2Letter 565-607, GLU convnets 906-966, LargeCNN 969-998) are
batch-only there; here they serve live.  A pure conv stack has a FINITE
composite receptive field, so streaming is overlap-save: keep a sliding
window of input spectrogram frames (the shared front-end ring buffer of
serve/streaming.py), rerun the whole stack over the window each chunk,
and emit exactly the outputs whose full receptive field is final.  No
per-layer state is carried at all — the window IS the state.

Exactness: for stacks without squeeze-excitation the emitted logits are
BIT-IDENTICAL to the batch forward (same ops over the same operands —
interior window outputs see the exact input span, and per-block
``bounds`` masks reproduce conv zero-padding at the utterance start and
MaskConv-style zeros at the end; pinned in tests/test_streaming_cnn.py).

Squeeze-excitation (cnn_residual / cnn_jasper) is the one utterance-
GLOBAL op in the family: the gate averages over all frames
(cnn.py ConvBlock, reference model.py:712-716), so no finite-lookahead
stream can match the batch gate mid-utterance — that bound is
information-theoretic, not an implementation gap.  Three modes:

* ``se_mode="running"`` (default) replaces the gate with the running
  mean over all frames finalized so far — per-block running sums
  accumulated over each chunk's newly-final slice (lagged per-layer so
  contributions are final values, each counted once).  The gate
  converges to the batch gate as the stream proceeds (and the running
  counts provably cover every valid frame exactly once by finish()).
* ``se_mode="two_pass"`` keeps the running gate for the INCREMENTAL
  fragments (live UX unchanged), then on finish() reruns the retained
  utterance through the exact batch forward: after finish(),
  ``texts`` / ``collected_logits`` / ``beam_texts`` equal the batch
  model EXACTLY (pinned in tests/test_streaming_cnn.py).  Cost: raw
  audio retained per stream + one batch forward at finish.  Not usable
  under StreamPool slot reuse (slots finish at different times; the
  pool keeps "running").
* ``se_mode="error"`` refuses SE stacks outright.

Receptive-field geometry is folded through the block specs exactly:
layer l maps composite spans via LO -= A*p, HI += A*(d*(k-1) - p),
A *= s.  Emission lag = ceil(HI/A) outputs; window context =
max over layers of (A_l*LAG_l - LO_l), so every emitted output (and
every running-SE contribution) has its true input span inside the
window.  Covers asymmetric padding too (glu_large's all-upfront pad).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deepspeech_tpu.models.cnn import ConvBlock, ConvStack, conv1d_out_length, swish
from deepspeech_tpu.serve.streaming import (
    _Geometry,
    _frontend_step,
    StreamingTranscriber,
)

__all__ = ["CNNStreamingTranscriber", "conv_stack_geometry"]


def conv_stack_geometry(blocks) -> list[tuple[int, int, int]]:
    """Per-layer composite (A_l, LO_l, HI_l): through layer l, output j
    reads input frames [A_l*j + LO_l, A_l*j + HI_l]."""
    a, lo, hi = 1, 0, 0
    out = []
    for spec in blocks:
        k = spec["kernel"]
        s = spec.get("stride", 1)
        p = spec.get("padding", 0)
        d = spec.get("dilation", 1)
        lo -= a * p
        hi += a * (d * (k - 1) - p)
        a *= s
        out.append((a, lo, hi))
    return out


def _is_se(spec) -> bool:
    r = spec.get("se_ratio", 0.0)
    return bool(r) and 0 < r <= 1


class CNNStreamingTranscriber(StreamingTranscriber):
    """Streaming transcription over a ``ConvStack`` (models/cnn.py).

    Same surface as StreamingTranscriber (feed/finish/transcribe/texts,
    greedy or device-beam decoding, LM fusion, StreamPool slots); only
    the model-family hooks differ.  ``se_mode``: "running" approximates
    squeeze-excitation causally (see module docstring), "error" raises
    for SE stacks.
    """

    def __init__(self, model: ConvStack, variables, labels, *args,
                 se_mode: str = "running", **kw):
        if se_mode not in ("running", "two_pass", "error"):
            raise ValueError("se_mode must be running|two_pass|error, "
                             f"got {se_mode!r}")
        self.se_mode = se_mode
        super().__init__(model, variables, labels, *args, **kw)
        self._has_se = any(_is_se(s) for s in model.blocks)

    # -- model-family hooks --------------------------------------------------

    def _validate_model(self, model):
        if not isinstance(model, ConvStack):
            raise ValueError(
                f"CNNStreamingTranscriber needs a ConvStack; "
                f"{type(model).__name__} should use StreamingTranscriber")
        if self.se_mode == "error" and any(_is_se(s) for s in model.blocks):
            raise ValueError(
                "this stack uses squeeze-excitation — an utterance-global "
                "average no finite-lookahead stream can reproduce exactly; "
                'pass se_mode="running" for the causal running-mean '
                "approximation")

    def _build_geometry(self, chunk_frames: int) -> _Geometry:
        self._layer_geo = conv_stack_geometry(self.model.blocks)
        a_total, _, hi_total = self._layer_geo[-1]
        if chunk_frames % a_total:
            raise ValueError(f"chunk_frames must be a multiple of the "
                             f"stack's total stride {a_total}")
        # window context: every layer's finalized slice must carry its true
        # input span (emission uses the final layer's; running SE uses all)
        ctx = 0
        for a_l, lo_l, hi_l in self._layer_geo:
            lag_l = max(-(-hi_l // a_l), 0)
            ctx = max(ctx, a_l * lag_l - lo_l)
        ctx = -(-ctx // a_total) * a_total
        self._emit_lag = max(-(-hi_total // a_total), 0)
        self._extra_delay = 0  # no lookahead FIFO in the conv family
        self._out_stride = a_total
        return _Geometry(chunk_frames=chunk_frames, hop=self.conf.hop,
                         n_fft=self.conf.n_fft,
                         emit=chunk_frames // a_total,
                         window_frames=chunk_frames + ctx)

    def _out_len(self, t_frames: int) -> int:
        n = t_frames
        for spec in self.model.blocks:
            n = conv1d_out_length(n, spec["kernel"], spec.get("stride", 1),
                                  spec.get("padding", 0),
                                  spec.get("dilation", 1))
        return n

    def _init_model_carry(self, zeros) -> dict:
        carry = {}
        for i, spec in enumerate(self.model.blocks):
            if _is_se(spec):
                carry[f"se_sum{i}"] = zeros(self.batch_size, spec["out"])
                carry[f"se_cnt{i}"] = zeros(self.batch_size)
        return carry

    def reset_slot_carry(self, s: int):
        c = self._carry
        for key in c:
            if key.startswith("se_sum") or key.startswith("se_cnt"):
                c[key] = c[key].at[s].set(0.0)

    # -- exact two-pass SE (se_mode="two_pass") -----------------------------

    def _two_pass_active(self) -> bool:
        return self.se_mode == "two_pass" and self._has_se

    def reset(self):
        super().reset()
        self._raw = []            # retained raw audio for the second pass
        self._exact = None        # (logits (B,T,C) f32, out_lens (B,))

    def feed(self, samples):
        if self._two_pass_active():
            s = np.asarray(samples, np.float32)
            self._raw.append(s[None, :] if s.ndim == 1 else s.copy())
        return super().feed(samples)

    def finish(self):
        if self._finished:
            return [""] * self.batch_size
        out = super().finish()
        if self._two_pass_active() and self._raw:
            self._run_second_pass(np.concatenate(self._raw, axis=1))
        return out

    def _run_second_pass(self, y: np.ndarray):
        """Batch-exact recompute over the retained utterance: replaces the
        collected logits and texts (and the basis for beam_texts) with the
        true global-gate forward — the provisional running-gate stream
        becomes exact at finish."""
        from deepspeech_tpu.audio.features import featurize_batch
        from deepspeech_tpu.decoders import GreedyDecoder

        audio = jnp.asarray(y)
        lengths = jnp.full((y.shape[0],), y.shape[1], jnp.int32)
        spect, frame_lengths = featurize_batch(audio, lengths, self.conf,
                                               normalize=self.normalize)
        logits, _, out_lens = self.model.apply(self.variables, spect,
                                               frame_lengths, False)
        logits = np.asarray(logits, np.float32)
        out_lens = np.asarray(out_lens)
        self._exact = (logits, out_lens)
        dec = GreedyDecoder(self.labels.labels,
                            blank_index=self.labels.blank_index)
        strings, _ = dec.decode_ids(np.argmax(logits, -1), out_lens)
        self._texts = [s[0] for s in strings]

    def collected_logits(self) -> np.ndarray:
        if self._exact is not None:
            logits, out_lens = self._exact
            return logits[:, : int(out_lens.max())]
        return super().collected_logits()

    def beam_texts(self, top_paths: int = 1):
        if self._exact is None:
            return super().beam_texts(top_paths)
        # exact pass: full-utterance device beam over the exact posteriors
        # (== the one-shot batch beam; chunked == one-shot is pinned for
        # the provisional path already)
        from deepspeech_tpu.decoders import DeviceBeamCTCDecoder
        logits, out_lens = self._exact
        dec = DeviceBeamCTCDecoder(
            self.labels.labels, beam_width=self.beam_width,
            cutoff_top_n=self.cutoff_top_n, cutoff_prob=self.cutoff_prob,
            blank_index=self.labels.blank_index,
            lm_path=None, top_paths=top_paths,
            alpha=self.lm_alpha, beta=self.lm_beta)
        dec.lm = self.lm  # device tables already loaded by the stream
        probs = jax.nn.softmax(jnp.asarray(logits), -1)
        strings, _ = dec.decode(probs, jnp.asarray(out_lens))
        return [list(s) for s in strings]

    def _make_forward(self):
        stack, geo = self.model, self.geo
        layer_geo = self._layer_geo
        normalize, window = self.normalize, self._window
        frozen = self.frozen_norm is not None

        def forward(carry, audio, t_frames_total, t_out_total, start_frames,
                    variables):
            del t_out_total  # per-layer hi bounds derive from t_frames
            fe, spect, _valid_f = _frontend_step(
                carry, audio, t_frames_total, start_frames,
                geo=geo, normalize=normalize, window=window, frozen=frozen)
            appended = fe["appended"]
            wf = geo.window_frames
            w0 = appended - wf                 # global base of the window
            new_carry = dict(carry)
            new_carry.update(fe)

            params = variables["params"]
            stats = variables.get("batch_stats", {})
            x = jnp.swapaxes(spect, 1, 2).astype(stack.compute_dtype)
            # int32-safe length chain (host passes a sentinel pre-finish)
            lens = jnp.minimum(t_frames_total, 1 << 27)
            k_chunk = geo.chunk_frames

            for i, spec in enumerate(stack.blocks):
                a_l, _lo_l, hi_l = layer_geo[i]
                base_l = w0 // a_l             # exact: w0 is a multiple of A
                start_out = start_frames // a_l
                out_len = conv1d_out_length(
                    lens, spec["kernel"], spec.get("stride", 1),
                    spec.get("padding", 0), spec.get("dilation", 1))
                lo = (start_out - base_l).astype(jnp.int32)
                hi = (lo + out_len).astype(jnp.int32)
                block = ConvBlock(**spec)
                bvars = {"params": params[f"block{i}"]}
                if f"block{i}" in stats:
                    bvars["batch_stats"] = stats[f"block{i}"]
                defer = _is_se(spec)
                x_in = x
                y, _ = block.apply(bvars, x, lens, False, (lo, hi), defer)
                if defer:
                    # running squeeze over this chunk's newly-FINAL slice
                    # (lagged so values are exact and counted exactly once)
                    lag_l = max(-(-hi_l // a_l), 0)
                    e_l = k_chunk // a_l
                    s0 = wf // a_l - e_l - lag_l
                    sl = y[:, s0:s0 + e_l, :].astype(jnp.float32)
                    idx = s0 + jnp.arange(e_l, dtype=jnp.int32)[None, :]
                    v = ((idx >= lo[:, None]) & (idx < hi[:, None]))\
                        .astype(jnp.float32)
                    se_sum = carry[f"se_sum{i}"] + (sl * v[:, :, None]).sum(1)
                    se_cnt = carry[f"se_cnt{i}"] + v.sum(1)
                    new_carry[f"se_sum{i}"] = se_sum
                    new_carry[f"se_cnt{i}"] = se_cnt
                    mean = se_sum / jnp.maximum(se_cnt, 1.0)[:, None]
                    pb = params[f"block{i}"]
                    g = mean.astype(y.dtype) @ pb["se_reduce"]["kernel"] \
                        + pb["se_reduce"]["bias"]
                    g = swish(g) @ pb["se_expand"]["kernel"] \
                        + pb["se_expand"]["bias"]
                    y = jax.nn.sigmoid(g)[:, None, :] * y
                    if (spec.get("skip") and x_in.shape[-1] == y.shape[-1]
                            and spec.get("stride", 1) == 1):
                        y = y + x_in
                x = y
                lens = out_len

            fcp = params["fc"]
            logits = (x.astype(jnp.float32)
                      @ fcp["kernel"][0].astype(jnp.float32) + fcp["bias"])
            a_total = layer_geo[-1][0]
            e0 = wf // a_total - geo.emit - self._emit_lag
            return new_carry, logits[:, e0:e0 + geo.emit, :]

        return forward
