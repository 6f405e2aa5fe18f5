"""On-device, jit-able CTC prefix beam search.

The reference delegates beam decoding to C++ (``ctcdecode.CTCBeamDecoder``,
reference decoder.py:95-99, 128-143). The host-parity replacement lives in
:mod:`deepspeech_tpu.decoders.beam`; this module is the TPU-native decoder:
the whole search is one compiled XLA program (``lax.scan`` over time,
``vmap`` over the batch), so batch decoding runs on the accelerator with no
per-step host round-trips.

Design (fixed-shape arrays, no Python control flow inside jit):

* beams are ``beam_width`` rows of a padded ``(K, L)`` prefix matrix plus
  per-beam ``p_blank`` / ``p_non_blank`` log masses (Hannun et al. 2014);
* each step materializes the full candidate grid ``(K, C+1)`` — column 0 is
  "stay" (blank, or repeat of the last char), column ``c+1`` extends with
  char ``c`` — and scores it from the pruned per-step log posteriors;
* identical prefixes produced by different parents (an extension of one beam
  colliding with the stay of another) are merged *exactly* in probability by
  grouping on a pair of independent rolling hashes (two int32 lanes; a false
  positive needs a simultaneous collision in both lanes) and a masked
  log-sum-exp over each group;
* ``lax.top_k`` keeps the best ``beam_width`` merged candidates; prefix /
  offset rows are rebuilt with vectorized masked writes (no scatters);
* padded time steps (``t >= length``) substitute a one-hot-blank posterior,
  which provably leaves every merged beam score unchanged.

``cutoff_top_n`` / ``cutoff_prob`` match ctcdecode's per-step candidate
pruning (reference opts.py:10-13). Word-LM shallow fusion needs unbounded
string state and stays on the host path (:class:`~.beam.BeamCTCDecoder`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from deepspeech_tpu.decoders.base import Decoder

NEG_INF = -jnp.inf
_HASH_M1 = jnp.int32(1000003)
_HASH_M2 = jnp.int32(69069)


def _masked_lse(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """log-sum-exp of ``x`` where ``mask``, -inf on empty groups, NaN-free."""
    x = jnp.where(mask, x, NEG_INF)
    m = jnp.max(x, axis=axis, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(jnp.where(mask, jnp.exp(x - m_safe), 0.0), axis=axis)
    m = jnp.squeeze(m, axis=axis)
    return jnp.where(m > NEG_INF, jnp.log(s) + m, NEG_INF)


def _prune_step(lp: jnp.ndarray, cutoff_top_n: int,
                cutoff_prob: float) -> jnp.ndarray:
    """ctcdecode per-step candidate pruning: keep the top ``cutoff_top_n``
    chars, and if ``cutoff_prob < 1`` only as many (probability-sorted) as
    needed to cover ``cutoff_prob`` mass. Pruned chars get -inf."""
    c = lp.shape[-1]
    order = jnp.argsort(-lp)
    rank = jnp.argsort(order)  # rank[i] = position of char i in sorted order
    keep = rank < min(cutoff_top_n, c)
    if cutoff_prob < 1.0:
        cum = jnp.cumsum(jnp.exp(lp[order]))
        # sorted rank r survives iff mass of ranks < r is still < cutoff_prob
        kept_sorted = jnp.concatenate(
            [jnp.ones((1,), bool), cum[:-1] < cutoff_prob])
        keep &= kept_sorted[rank]
    return jnp.where(keep, lp, NEG_INF)


def _beam_step(state, inputs, *, blank: int, cutoff_top_n: int,
               cutoff_prob: float, max_len: int):
    prefixes, offsets, lens, last, h1, h2, p_b, p_nb = state
    lp, t, t_valid = inputs
    k, c = prefixes.shape[0], lp.shape[0]

    # Padded steps decode a certain blank: every beam keeps its score.
    onehot_blank = jnp.where(jnp.arange(c) == blank, 0.0, NEG_INF)
    lp = jnp.where(t_valid, _prune_step(lp, cutoff_top_n, cutoff_prob),
                   onehot_blank)

    total = jnp.logaddexp(p_b, p_nb)  # (K,)
    parent_ok = total > NEG_INF

    # --- candidates: K stays + (K, C) extends ---
    last_c = jnp.clip(last, 0, c - 1)
    stay_pb = total + lp[blank]
    stay_pnb = jnp.where(lens > 0, p_nb + lp[last_c], NEG_INF)

    ext = jnp.where(jnp.arange(c)[None, :] == last[:, None],
                    p_b[:, None], total[:, None]) + lp[None, :]  # (K, C)
    ext_ok = (parent_ok[:, None] & (jnp.arange(c)[None, :] != blank)
              & (lens[:, None] < max_len) & (ext > NEG_INF))

    # rolling hashes: stay keeps the parent's, extend appends char c
    char_grid = jnp.arange(c)[None, :] + 1  # 1-based so char 0 != "empty"
    eh1 = (h1[:, None] * _HASH_M1 + char_grid).astype(jnp.int32)
    eh2 = (h2[:, None] * _HASH_M2 + char_grid).astype(jnp.int32)
    # invalid extends get unique sentinels disjoint from the beam-row
    # sentinels (which live in [-(k+1), -2]) so they can't match anything
    sent_ext = -(jnp.arange(k * c, dtype=jnp.int32).reshape(k, c) + k + 2)
    eh1 = jnp.where(ext_ok, eh1, sent_ext)
    eh2 = jnp.where(ext_ok, eh2, sent_ext)

    # --- exact merge. Beam prefixes are pairwise-distinct, so two stays
    # never collide, and extends of equal length collide only if parent+char
    # coincide — i.e. never. The ONLY merge is extend(i,c) == stay(j):
    # an O(K^2 C) comparison instead of the O((KC)^2) all-pairs grid.
    eq = ((eh1[:, :, None] == h1[None, None, :])
          & (eh2[:, :, None] == h2[None, None, :]))  # (K, C, K)
    ext_absorbed = eq.any(-1)  # (K, C)
    ext_flat = ext.reshape(k * c)
    # mass of absorbed extends joins the matching stay's non-blank prob
    add_pnb = _masked_lse(jnp.broadcast_to(ext_flat[:, None], (k * c, k)),
                          eq.reshape(k * c, k), 0)  # (K,)
    stay_pnb = jnp.logaddexp(stay_pnb, add_pnb)

    stay_score = jnp.where(parent_ok,
                           jnp.logaddexp(stay_pb, stay_pnb), NEG_INF)
    ext_score = jnp.where(ext_ok & ~ext_absorbed, ext, NEG_INF).reshape(k * c)

    # Offsets parity with the host decoder's first-insert-wins rule (beams
    # are processed in score order = row order): when an absorbed extend's
    # parent row i ranks above the stay row j, the merged beam carries the
    # EXTEND's offsets (char stamped at this frame), not the stay's.
    m_ij = eq.any(1)  # (K parent, K stay)
    has_ext = m_ij.any(0)
    i_min = jnp.argmax(m_ij, axis=0)  # first matching parent per stay
    use_ext_off = has_ext & (i_min < jnp.arange(k))
    pos_i = lens[i_min]
    write_i = jnp.arange(max_len)[None, :] == pos_i[:, None]
    off_from_ext = jnp.where(write_i, t, offsets[i_min])
    stay_offsets = jnp.where(use_ext_off[:, None], off_from_ext, offsets)

    # --- select beams and rebuild prefix rows (layout: [stays | extends]) ---
    score = jnp.concatenate([stay_score, ext_score])
    top_scores, idx = jax.lax.top_k(score, k)
    is_ext = idx >= k
    eidx = jnp.maximum(idx - k, 0)
    parent = jnp.where(is_ext, eidx // c, idx)
    char = jnp.where(is_ext, eidx % c, 0)
    sel_ok = top_scores > NEG_INF

    pb_all = jnp.concatenate([stay_pb, jnp.full((k * c,), NEG_INF)])
    pnb_all = jnp.concatenate([stay_pnb, ext_flat])
    h1_all = jnp.concatenate([h1, eh1.reshape(k * c)])
    h2_all = jnp.concatenate([h2, eh2.reshape(k * c)])

    pos = lens[parent]  # (K,)
    write = is_ext[:, None] & (jnp.arange(max_len)[None, :] == pos[:, None])
    new_prefixes = jnp.where(write, char[:, None], prefixes[parent])
    base_off = jnp.where(is_ext[:, None], offsets[parent],
                         stay_offsets[parent])
    new_offsets = jnp.where(write, t, base_off)
    new_lens = pos + is_ext.astype(lens.dtype)
    new_last = jnp.where(is_ext, char, last[parent])

    sent = -(jnp.arange(k, dtype=jnp.int32) + 2)
    new_state = (
        new_prefixes, new_offsets, new_lens,
        jnp.where(sel_ok, new_last, -1),
        jnp.where(sel_ok, h1_all[idx], sent),
        jnp.where(sel_ok, h2_all[idx], sent),
        jnp.where(sel_ok, pb_all[idx], NEG_INF),
        jnp.where(sel_ok, pnb_all[idx], NEG_INF),
    )
    return new_state, None


# ---------------------------------------------------------------------------
# streaming continuation API: the beam state is an explicit carry, so a
# search can be advanced chunk-by-chunk (serve/streaming.py feeds each
# chunk's emitted frames) and finalized at any time. Because padded steps
# (valid=False) decode a certain blank and provably leave every merged beam
# unchanged, a chunked run is EXACTLY equal to the one-shot batch search
# over the concatenated valid frames.
# ---------------------------------------------------------------------------

def beam_state_init(batch: int, beam_width: int, max_len: int):
    """Fresh batched beam state: beam 0 = the empty prefix per lane."""
    k, l = beam_width, max_len

    def one(_):
        h0 = jnp.where(jnp.arange(k) == 0, 1, -(jnp.arange(k) + 2))
        return (
            jnp.full((k, l), -1, jnp.int32),       # prefixes
            jnp.full((k, l), -1, jnp.int32),       # offsets
            jnp.zeros((k,), jnp.int32),            # lens
            jnp.full((k,), -1, jnp.int32),         # last
            h0.astype(jnp.int32),                  # h1
            h0.astype(jnp.int32),                  # h2
            jnp.where(jnp.arange(k) == 0, 0.0, NEG_INF),  # p_b
            jnp.full((k,), NEG_INF),               # p_nb
        )

    return jax.vmap(one)(jnp.arange(batch))


@partial(jax.jit, static_argnames=("blank", "cutoff_top_n", "cutoff_prob"))
def ctc_beam_continue(state, logits: jnp.ndarray, ts: jnp.ndarray,
                      valid: jnp.ndarray, blank: int = 0,
                      cutoff_top_n: int = 40, cutoff_prob: float = 1.0):
    """Advance a batched beam state by one chunk.

    logits: (B, T, C) raw logits (log-softmax applied here so it fuses);
    ts: (B, T) int32 global frame index per step (stamped into offsets);
    valid: (B, T) bool — False steps are no-ops (certain blank).
    """
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    max_len = state[0].shape[-1]

    def one(st, lp, t, v):
        step = partial(_beam_step, blank=blank, cutoff_top_n=cutoff_top_n,
                       cutoff_prob=cutoff_prob, max_len=max_len)
        st, _ = jax.lax.scan(step, st, (lp, t, v))
        return st

    return jax.vmap(one)(state, log_probs, ts.astype(jnp.int32), valid)


@partial(jax.jit, static_argnames=("top_paths",))
def beam_state_best(state, top_paths: int = 1):
    """(prefixes (B,P,L), lens (B,P), offsets (B,P,L), scores (B,P)) of the
    current best beams — callable mid-stream or at the end."""

    def one(st):
        prefixes, offsets, lens, _, _, _, p_b, p_nb = st
        score = jnp.logaddexp(p_b, p_nb)
        order = jnp.argsort(-score)[:top_paths]
        return prefixes[order], lens[order], offsets[order], score[order]

    return jax.vmap(one)(state)


@partial(jax.jit, static_argnames=("beam_width", "blank", "cutoff_top_n",
                                   "cutoff_prob", "top_paths", "max_len"))
def ctc_beam_search_device(log_probs: jnp.ndarray, lengths: jnp.ndarray,
                           beam_width: int = 10, blank: int = 0,
                           cutoff_top_n: int = 40, cutoff_prob: float = 1.0,
                           top_paths: int = 1, max_len: int | None = None):
    """Batched CTC prefix beam search, fully on device.

    Args:
      log_probs: (B, T, C) log posteriors.
      lengths:   (B,) valid frame counts.
    Returns:
      prefixes (B, top_paths, L) int32 padded with -1 beyond each length,
      lens (B, top_paths), offsets (B, top_paths, L) frame indices,
      scores (B, top_paths) merged log probabilities.
    """
    b, t_max, c = log_probs.shape
    k = beam_width
    l = t_max if max_len is None else min(max_len, t_max)

    def decode_one(lp_utt, length):
        prefixes = jnp.full((k, l), -1, jnp.int32)
        offsets = jnp.full((k, l), -1, jnp.int32)
        lens = jnp.zeros((k,), jnp.int32)
        last = jnp.full((k,), -1, jnp.int32)
        # beam 0 = the empty prefix; others start invalid w/ sentinel hashes
        h0 = jnp.where(jnp.arange(k) == 0, 1, -(jnp.arange(k) + 2))
        h1 = h0.astype(jnp.int32)
        h2 = h0.astype(jnp.int32)
        p_b = jnp.where(jnp.arange(k) == 0, 0.0, NEG_INF)
        p_nb = jnp.full((k,), NEG_INF)

        step = partial(_beam_step, blank=blank, cutoff_top_n=cutoff_top_n,
                       cutoff_prob=cutoff_prob, max_len=l)
        ts = jnp.arange(t_max, dtype=jnp.int32)
        state, _ = jax.lax.scan(
            step, (prefixes, offsets, lens, last, h1, h2, p_b, p_nb),
            (lp_utt, ts, ts < length))
        prefixes, offsets, lens, _, _, _, p_b, p_nb = state

        score = jnp.logaddexp(p_b, p_nb)
        order = jnp.argsort(-score)[:top_paths]
        return (prefixes[order], lens[order], offsets[order], score[order])

    return jax.vmap(decode_one)(log_probs, lengths)


class DeviceBeamCTCDecoder(Decoder):
    """Drop-in beam decoder running the search as one XLA program.

    Same call convention as :class:`~.beam.BeamCTCDecoder` /
    reference decoder.py:128-143 — ``decode(probs, sizes)`` returns
    (strings, offsets) nested [batch][path]. No LM fusion (use the host
    decoder for KenLM-style shallow fusion)."""

    def __init__(self, labels, beam_width=10, cutoff_top_n=40,
                 cutoff_prob=1.0, top_paths=1, blank_index=0,
                 max_len: int | None = None):
        super().__init__(labels, blank_index)
        self.beam_width = beam_width
        self.cutoff_top_n = cutoff_top_n
        self.cutoff_prob = float(cutoff_prob)
        self.top_paths = top_paths
        self.max_len = max_len

    def decode(self, probs, sizes=None):
        probs = jnp.asarray(probs)
        b, t_max, _ = probs.shape
        sizes = (jnp.full((b,), t_max, jnp.int32) if sizes is None
                 else jnp.asarray(sizes, jnp.int32))
        log_probs = jnp.log(jnp.clip(probs, 1e-30, 1.0))
        prefixes, lens, offsets, _ = ctc_beam_search_device(
            log_probs, sizes, beam_width=self.beam_width,
            blank=self.blank_index, cutoff_top_n=self.cutoff_top_n,
            cutoff_prob=self.cutoff_prob, top_paths=self.top_paths,
            max_len=self.max_len)
        prefixes = np.asarray(prefixes)
        lens = np.asarray(lens)
        offsets = np.asarray(offsets)

        strings, offs = [], []
        for i in range(b):
            utt_s, utt_o = [], []
            for p in range(self.top_paths):
                n = int(lens[i, p])
                ids = prefixes[i, p, :n]
                utt_s.append("".join(self.int_to_char[int(x)] for x in ids))
                utt_o.append(offsets[i, p, :n].astype(np.int32))
            strings.append(utt_s)
            offs.append(utt_o)
        return strings, offs
