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
    n = k * (c + 1)

    # Padded steps decode a certain blank: every beam keeps its score.
    onehot_blank = jnp.where(jnp.arange(c) == blank, 0.0, NEG_INF)
    lp = jnp.where(t_valid, _prune_step(lp, cutoff_top_n, cutoff_prob),
                   onehot_blank)

    total = jnp.logaddexp(p_b, p_nb)  # (K,)
    parent_ok = total > NEG_INF

    # --- candidate grid (K, C+1): col 0 stay, col c+1 extend with char c ---
    last_c = jnp.clip(last, 0, c - 1)
    stay_pb = total + lp[blank]
    stay_pnb = jnp.where(lens > 0, p_nb + lp[last_c], NEG_INF)

    ext = jnp.where(jnp.arange(c)[None, :] == last[:, None],
                    p_b[:, None], total[:, None]) + lp[None, :]  # (K, C)
    ext_ok = (parent_ok[:, None] & (jnp.arange(c)[None, :] != blank)
              & (lens[:, None] < max_len) & (ext > NEG_INF))

    pb_flat = jnp.concatenate([stay_pb[:, None],
                               jnp.full((k, c), NEG_INF)], 1).reshape(n)
    pnb_flat = jnp.concatenate([stay_pnb[:, None], ext], 1).reshape(n)
    valid = jnp.concatenate([parent_ok[:, None], ext_ok], 1).reshape(n)

    # rolling hashes: stay keeps the parent's, extend appends char c
    char_grid = jnp.arange(c)[None, :] + 1  # 1-based so char 0 != "empty"
    eh1 = (h1[:, None] * _HASH_M1 + char_grid).astype(jnp.int32)
    eh2 = (h2[:, None] * _HASH_M2 + char_grid).astype(jnp.int32)
    h1_flat = jnp.concatenate([h1[:, None], eh1], 1).reshape(n)
    h2_flat = jnp.concatenate([h2[:, None], eh2], 1).reshape(n)
    # invalid rows get unique sentinel hashes so they can't absorb a group
    sent = -(jnp.arange(n, dtype=jnp.int32) + 2)
    h1_flat = jnp.where(valid, h1_flat, sent)
    h2_flat = jnp.where(valid, h2_flat, sent)

    # --- exact merge of identical prefixes (group by hash pair) ---
    eq = ((h1_flat[:, None] == h1_flat[None, :])
          & (h2_flat[:, None] == h2_flat[None, :]))
    owner = jnp.argmax(eq, axis=1)  # first member of each group
    is_owner = owner == jnp.arange(n)
    merged_pb = _masked_lse(jnp.broadcast_to(pb_flat[None, :], (n, n)), eq, 1)
    merged_pnb = _masked_lse(jnp.broadcast_to(pnb_flat[None, :], (n, n)), eq, 1)
    score = jnp.logaddexp(merged_pb, merged_pnb)
    score = jnp.where(is_owner & valid, score, NEG_INF)

    # --- select beams and rebuild prefix rows ---
    top_scores, idx = jax.lax.top_k(score, k)
    parent = idx // (c + 1)
    col = idx % (c + 1)
    is_ext = col > 0
    char = col - 1
    sel_ok = top_scores > NEG_INF

    pos = lens[parent]  # (K,)
    write = is_ext[:, None] & (jnp.arange(max_len)[None, :] == pos[:, None])
    new_prefixes = jnp.where(write, char[:, None], prefixes[parent])
    new_offsets = jnp.where(write, t, offsets[parent])
    new_lens = pos + is_ext.astype(lens.dtype)
    new_last = jnp.where(is_ext, char, last[parent])

    new_state = (
        new_prefixes, new_offsets, new_lens,
        jnp.where(sel_ok, new_last, -1),
        jnp.where(sel_ok, h1_flat[idx], sent[:k]),
        jnp.where(sel_ok, h2_flat[idx], sent[:k]),
        jnp.where(sel_ok, merged_pb[idx], NEG_INF),
        jnp.where(sel_ok, merged_pnb[idx], NEG_INF),
    )
    return new_state, None


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
