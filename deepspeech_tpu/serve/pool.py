"""Continuous-batching streaming pool: independent stream lifecycles over
one jitted chunk step.

`StreamingTranscriber` runs B lockstep streams; real serving needs streams
that join and leave at any time. `StreamPool` keeps B *slots* riding the
batch dimension of the same fixed-shape `_chunk_step` and gives each slot
an independent lifecycle:

* `open()` leases a free slot; the stream's frames begin at the next chunk
  boundary (`start_frames` lane offset — all validity inside the jit step
  is stream-relative, so stale buffer content from the previous tenant
  masks to zero and the recurrent/lookahead state is re-zeroed on join);
* `write(slot, samples)` buffers audio; `tick()` advances EVERY slot by one
  chunk (idle slots ride along masked-invalid — the device cost of a tick
  is constant, which is the point: one compiled program, full batch
  efficiency, no per-stream dispatch);
* `close(slot)` marks end-of-stream; the pool appends the reflect tail,
  drains the conv/lookahead pipeline over subsequent ticks, and frees the
  slot once every output frame has been emitted.

An ACTIVE slot that has no buffered audio at tick time is silence-filled
(real-time semantics: the stream clock keeps running; `underruns[slot]`
counts it). Transcripts are decoded incrementally with the same greedy
collapse as the lockstep runtime.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from deepspeech_tpu.serve.streaming import _INT_SENTINEL, StreamingTranscriber
from deepspeech_tpu.serve.streaming_cnn import CNNStreamingTranscriber

FREE, PENDING, ACTIVE, CLOSING = range(4)


class StreamPool:
    """B-slot continuous-batching wrapper around the streaming chunk step.

    Same constructor surface as StreamingTranscriber, with ``slots`` instead
    of ``batch_size``.
    """

    def __init__(self, model, variables, labels, audio_conf=None,
                 normalize: str = "max_frame", chunk_frames: int = 96,
                 slots: int = 8, frozen_norm=None,
                 decoder: str = "greedy", beam_width: int = 16,
                 cutoff_top_n: int = 40, cutoff_prob: float = 1.0,
                 beam_max_len: int = 1000, collect_logits: bool = False,
                 lm_path: str | None = None, lm_alpha: float = 0.8,
                 lm_beta: float = 1.0):
        from deepspeech_tpu.models.cnn import ConvStack
        cls = (CNNStreamingTranscriber if isinstance(model, ConvStack)
               else StreamingTranscriber)
        self._st = cls(
            model, variables, labels, audio_conf=audio_conf, normalize=normalize,
            chunk_frames=chunk_frames, batch_size=slots,
            frozen_norm=frozen_norm, decoder=decoder, beam_width=beam_width,
            cutoff_top_n=cutoff_top_n, cutoff_prob=cutoff_prob,
            beam_max_len=beam_max_len, lm_path=lm_path, lm_alpha=lm_alpha,
            lm_beta=lm_beta)
        self.slots = slots
        self.labels = labels
        g = self._st.geo
        self._pad = g.n_fft // 2
        self._A = g.chunk_samples
        self._appended = 0          # device frame counter mirror
        self._conv_base = -self._st._emit_lag
        self._ctx = self._st._extra_delay
        self._stride = self._st._out_stride  # input frames per model output
        self.underruns = np.zeros(slots, np.int64)
        self._state = [FREE] * slots
        self._buf = [np.zeros(0, np.float32) for _ in range(slots)]
        self._tail = [np.zeros(0, np.float32) for _ in range(slots)]
        self._start = np.zeros(slots, np.int64)      # start_frames per slot
        self._t_frames = np.full(slots, _INT_SENTINEL, np.int64)
        self._t_out = np.full(slots, _INT_SENTINEL, np.int64)
        self._fed = np.zeros(slots, np.int64)        # real samples consumed
        self._total = np.full(slots, -1, np.int64)
        self._n_emitted = np.zeros(slots, np.int64)
        self._prev_id = [None] * slots
        self._text = [""] * slots
        self._done_text = [None] * slots
        self._done_beam = [None] * slots
        # logits retention is opt-in: a long-running server would otherwise
        # accumulate every chunk's (B, E, C) block forever
        self._collect_logits = collect_logits
        self._logit_blocks: list[list] = [[] for _ in range(slots)]

    # -- lifecycle ---------------------------------------------------------

    def open(self) -> int:
        """Lease a free slot; raises RuntimeError when the pool is full."""
        for s in range(self.slots):
            if self._state[s] == FREE:
                self._state[s] = PENDING
                self._buf[s] = np.zeros(0, np.float32)
                self._tail[s] = np.zeros(0, np.float32)
                self._t_frames[s] = _INT_SENTINEL
                self._t_out[s] = _INT_SENTINEL
                self._fed[s] = 0
                self._total[s] = -1
                self._n_emitted[s] = 0
                self._prev_id[s] = None
                self._text[s] = ""
                self._done_text[s] = None
                self._done_beam[s] = None
                self._logit_blocks[s] = []
                self.underruns[s] = 0
                return s
        raise RuntimeError("StreamPool full")

    def write(self, slot: int, samples: np.ndarray) -> None:
        if self._state[slot] not in (PENDING, ACTIVE):
            raise RuntimeError(f"slot {slot} not writable")
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buf[slot] = np.concatenate([self._buf[slot], samples])

    def close(self, slot: int) -> None:
        """End of stream for this slot: total length becomes known and the
        reflect end pad is queued; the slot frees itself once drained."""
        if self._state[slot] not in (PENDING, ACTIVE):
            raise RuntimeError(f"slot {slot} not open")
        total = int(self._fed[slot] + len(self._buf[slot]))
        if total <= self._pad:
            raise ValueError(f"stream too short ({total} samples)")
        self._total[slot] = total
        t_total = 1 + total // self._st.geo.hop
        self._t_frames[slot] = t_total
        self._t_out[slot] = self._st._out_len(t_total)
        # reflect end pad from the last pad+1 real samples
        last = np.concatenate([self._tail[slot], self._buf[slot]])
        last = last[-(self._pad + 1):]
        reflect = last[-2::-1][: self._pad]
        self._buf[slot] = np.concatenate([self._buf[slot], reflect])
        if self._state[slot] == ACTIVE:
            self._state[slot] = CLOSING
        # a PENDING slot stays PENDING; tick() activates it straight into
        # CLOSING (total is recorded) so short streams still get a lane

    def busy(self) -> bool:
        return any(s != FREE for s in self._state)

    def done(self, slot: int) -> bool:
        return self._done_text[slot] is not None

    def text(self, slot: int) -> str:
        return self._done_text[slot] if self.done(slot) else self._text[slot]

    def collected_logits(self, slot: int) -> np.ndarray:
        """(T_emitted, C) logits of this slot's current/last stream."""
        rows = []
        for base, block in self._logit_blocks[slot]:
            for j in range(block.shape[0]):
                idx = base + j
                if 0 <= idx < self._t_out[slot]:
                    rows.append(block[j])
        return (np.stack(rows) if rows
                else np.zeros((0, 1), np.float32))

    # -- the tick ----------------------------------------------------------

    def tick(self) -> list[str]:
        """Advance every slot by one chunk. Returns the new text fragment
        per slot ('' for idle slots)."""
        st = self._st
        g = st.geo
        A, pad = self._A, self._pad
        chunk = np.zeros((self.slots, A), np.float32)

        for s in range(self.slots):
            state = self._state[s]
            if state == PENDING:
                ready = len(self._buf[s]) >= A or (
                    self._total[s] >= 0 and len(self._buf[s]) > 0)
                if not ready:
                    continue
                # activate: stream starts at the current chunk boundary
                self._start[s] = self._appended
                wave_tail = self._buf[s][pad:0:-1] if len(self._buf[s]) > pad \
                    else np.zeros(pad, np.float32)
                c = st._carry
                c["wave_tail"] = c["wave_tail"].at[s].set(jnp.asarray(wave_tail))
                st.reset_slot_carry(s)  # model-family state (RNN/SE/...)
                if st._beam_state is not None:
                    from deepspeech_tpu.decoders.beam_device import \
                        beam_state_init
                    fresh = beam_state_init(1, st.beam_width,
                                            st.beam_max_len, lm=st.lm)
                    st._beam_state = tuple(
                        a.at[s].set(f[0]) for a, f in zip(st._beam_state,
                                                          fresh))
                if st.frozen_norm is None:
                    c["norm_sum"] = c["norm_sum"].at[s].set(0.0)
                    c["norm_cnt"] = c["norm_cnt"].at[s].set(0.0)
                    c["norm_std_sum"] = c["norm_std_sum"].at[s].set(0.0)
                self._state[s] = ACTIVE if self._total[s] < 0 else CLOSING
                state = self._state[s]
            if state in (ACTIVE, CLOSING):
                take = min(len(self._buf[s]), A)
                if take:
                    chunk[s, :take] = self._buf[s][:take]
                    # keep the last pad+1 samples for close()'s reflect pad
                    joined = np.concatenate([self._tail[s],
                                             self._buf[s][:take]])
                    self._tail[s] = joined[-(pad + 1):]
                    self._buf[s] = self._buf[s][take:]
                    self._fed[s] += take if state == ACTIVE else 0
                elif state == ACTIVE:
                    self.underruns[s] += 1
                    self._fed[s] += A  # silence-filled real time
                if state == ACTIVE and take < A and take:
                    self.underruns[s] += 1
                    self._fed[s] += A - take  # silence completes the chunk
                if state == ACTIVE and take < A:
                    # the device-visible stream just ended with silence fill:
                    # keep _tail in sync so close()'s reflect pad mirrors
                    # what the device actually saw, not the pre-silence audio
                    joined = np.concatenate(
                        [self._tail[s], np.zeros(A - take, np.float32)])
                    self._tail[s] = joined[-(pad + 1):]

        # one fixed-shape device step for the whole pool (with the beam
        # continuation fused into the same dispatch when decoding beams)
        active_mask = [self._state[s] in (ACTIVE, CLOSING)
                       for s in range(self.slots)]
        t_frames = np.where(active_mask, self._t_frames, 0)
        t_out = np.where(active_mask, self._t_out, 0)
        args = (st._carry, jnp.asarray(chunk),
                jnp.asarray(np.minimum(t_frames, _INT_SENTINEL)
                            .astype(np.int32)),
                jnp.asarray(np.minimum(t_out, _INT_SENTINEL)
                            .astype(np.int32)),
                jnp.asarray(np.minimum(self._start, _INT_SENTINEL)
                            .astype(np.int32)),
                st.variables)
        anchor_base_global = self._conv_base - self._ctx
        if st._beam_state is not None:
            idx = (anchor_base_global
                   + np.arange(g.emit, dtype=np.int64)[None, :]
                   - (self._start[:, None] // self._stride))
            # Beam offsets pack (frame+1)*64+char into int32, so frame
            # indices past 2^25 would silently wrap; enforce the documented
            # cap here instead of relying on the idle-time rebase.
            _idx_cap = (1 << 25) - 1
            valid = (np.asarray(active_mask)[:, None]
                     & (idx >= 0) & (idx < t_out[:, None])
                     & (idx <= _idx_cap))
            st._carry, logits, st._beam_state = st._step_beam(
                *args, st._beam_state,
                jnp.asarray(np.clip(idx, -1, _idx_cap).astype(np.int32)),
                jnp.asarray(valid), st.lm)
        else:
            st._carry, logits = st._step(*args)
        self._appended += g.chunk_frames
        self._conv_base += g.emit
        logits = np.asarray(logits)

        frags = [""] * self.slots
        blank = self.labels.blank_index
        chars = self.labels.labels
        for s in range(self.slots):
            if self._state[s] not in (ACTIVE, CLOSING):
                continue
            base_rel = anchor_base_global - int(self._start[s]) // self._stride
            if self._collect_logits:
                self._logit_blocks[s].append((base_rel, logits[s]))
            frag = []
            for j in range(g.emit):
                idx = base_rel + j
                if idx < 0 or idx >= self._t_out[s]:
                    continue
                self._n_emitted[s] = max(self._n_emitted[s], idx + 1)
                cid = int(np.argmax(logits[s, j]))
                prev = self._prev_id[s]
                if cid != blank and not (prev is not None and cid == prev
                                         and idx != 0):
                    frag.append(chars[cid])
                self._prev_id[s] = cid
            frags[s] = "".join(frag)
            self._text[s] += frags[s]
            if (self._state[s] == CLOSING
                    and self._n_emitted[s] >= self._t_out[s]):
                self._done_text[s] = self._text[s]
                if self._st._beam_state is not None:
                    self._done_beam[s] = self.beam_text(s)
                self._state[s] = FREE
        if not self.busy():
            # fully idle: rebase the global frame counters so a long-running
            # pool never wraps the int32 stream-relative index math (the
            # device carry casts to int32; without this, ~2^31 frames of
            # uptime would silently corrupt every validity mask)
            self._appended = 0
            self._conv_base = -self._st._emit_lag
            self._start[:] = 0
            c = self._st._carry
            c["appended"] = jnp.zeros_like(c["appended"])
        return frags

    def beam_text(self, slot: int) -> str:
        """Best beam hypothesis for this slot (decoder="beam"): the
        finished stream's final beam once done, else the current best."""
        if self._done_beam[slot] is not None:
            return self._done_beam[slot]
        from deepspeech_tpu.decoders.beam_device import beam_state_best
        st = self._st
        prefixes, lens, _, _ = beam_state_best(
            st._beam_state, 1, lm=st.lm, space=st._lm_space,
            alpha=st.lm_alpha, beta=st.lm_beta)
        n = int(np.asarray(lens)[slot, 0])
        ids = np.asarray(prefixes)[slot, 0, :n]
        return "".join(self.labels.labels[int(x)] for x in ids)
