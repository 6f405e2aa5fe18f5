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
pruning (reference opts.py:10-13). Word-LM shallow fusion runs ON DEVICE
too (``lm=`` / ``lm_path=``): the n-gram tables and a char trie over the
vocabulary live in HBM (:mod:`deepspeech_tpu.decoders.lm_device`), each
beam carries (word-context ids, char-trie node) in the scan state, and the
``alpha * log10 P(word|ctx) + beta`` bonus lands on space extensions —
replacing the reference's host-side ctcdecode+KenLM scorer
(reference decoder.py:95-99, opts.py:5-9) with zero host round-trips.
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
# modular inverses of the (odd) hash multipliers mod 2^32, as signed int32:
# h_parent = (h_child - char - 1) * M^-1 exactly undoes one hash roll
_HASH_M1_INV = jnp.int32(np.uint32(pow(1000003, -1, 2**32)).astype(np.int32))
_HASH_M2_INV = jnp.int32(np.uint32(pow(69069, -1, 2**32)).astype(np.int32))
_LOG10 = float(np.log(10.0))
# each beam's chars + frame offsets share one packed int32 row:
# slot = (frame + 1) * _PACK + char_id  (0 = empty). Caps num_classes at 64
# (the reference alphabet is ~30) and frame indices at 2^25 (~77 h of audio
# per decode at 10 ms emission — far past any single utterance/stream).
_PACK = 64
_PACK_BITS = 6


def unpack_prefix(pox, lens):
    """Packed (…, L) rows -> (chars, frame_offsets), -1 beyond each length."""
    valid = jnp.arange(pox.shape[-1]) < lens[..., None]
    chars = jnp.where(valid, pox & (_PACK - 1), -1)
    offs = jnp.where(valid, (pox >> _PACK_BITS) - 1, -1)
    return chars, offs


_I32_MIN = jnp.int32(np.iinfo(np.int32).min)


def _onehot(sel: jnp.ndarray, n: int) -> jnp.ndarray:
    """(S, n) bool: row s has True only at column ``sel[s]``."""
    return sel[:, None] == jnp.arange(n, dtype=sel.dtype)[None, :]


def _take(table: jnp.ndarray, onehot: jnp.ndarray, fill) -> jnp.ndarray:
    """Exact ``table[sel]`` as a broadcast-compare + max — NO gather.

    TPU gathers inside a ``lax.scan`` body serialize into per-element
    dynamic slices (~9 ns/element regardless of table width); the ~10
    per-step gathers were 70% of the whole width-128 beam search
    (87.9 of 125.9 ms/call on-chip). A one-hot select + max reduction is
    pure VPU broadcast arithmetic and exact for every payload: the single
    selected lane wins the max even when its value is ±inf / INT32_MIN,
    because every other lane holds ``fill`` (the dtype's minimum)."""
    return jnp.max(jnp.where(onehot, table[None, :], fill), axis=1)


def _take2(table: jnp.ndarray, onehot: jnp.ndarray, fill) -> jnp.ndarray:
    """Row variant of :func:`_take`: exact ``table[sel]`` for (K, D)
    tables with small D (the LM context carry)."""
    return jnp.max(jnp.where(onehot[:, :, None], table[None, :, :], fill),
                   axis=1)


def _take_rows_i32(table: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """Exact row gather of non-negative int32 (K, L) tables (the packed
    prefix rows) as four 8-bit-chunk matmuls on the MXU.

    8-bit chunks (<= 255) survive bf16 exactly, and a one-hot left operand
    is exact in bf16, so the result is bit-exact under ANY TPU matmul
    precision policy — unlike a single f32 matmul of full values."""
    oh = onehot.astype(jnp.float32)
    out = jnp.zeros(onehot.shape[:1] + table.shape[1:], jnp.int32)
    for shift in (0, 8, 16, 24):
        chunk = ((table >> shift) & 0xFF).astype(jnp.float32)
        g = jnp.dot(oh, chunk, preferred_element_type=jnp.float32)
        out = out | (g.astype(jnp.int32) << shift)
    return out


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
    if cutoff_top_n >= c and cutoff_prob >= 1.0:
        return lp  # pruning is a no-op at these knobs: skip the two
        # per-step argsorts (sorts inside a scan are expensive on TPU)
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
               cutoff_prob: float, max_len: int, lm=None, space: int = -1,
               alpha: float = 0.0, beta: float = 0.0, trace: bool = False):
    """One search step. Two carry layouts share all the candidate/merge
    math:

    * ``trace=False`` (streaming continuation): prefixes+offsets ride the
      carry as packed (K, L) rows — a resumable state, O(K·L) per step.
    * ``trace=True`` (one-shot batch search): the carry holds only the K
      per-beam scalars and each step EMITS a (parent, char, emit)
      backpointer row; prefixes are reconstructed once after the scan
      (``_backtrace``). This removes the dominant O(K·L) term from the
      scan body — the width-128 wall after the O(K^2) merge (PERF.md).
    """
    if trace:
        pox = None
        if lm is None:
            lens, last, h1, h2, p_b, p_nb = state
        else:
            (lens, last, h1, h2, p_b, p_nb,
             lm_ctx, lm_len, lm_trie) = state
        k = lens.shape[0]
    elif lm is None:
        pox, lens, last, h1, h2, p_b, p_nb = state
        k = pox.shape[0]
    else:
        (pox, lens, last, h1, h2, p_b, p_nb,
         lm_ctx, lm_len, lm_trie) = state
        k = pox.shape[0]
    lp, t, t_valid = inputs
    c = lp.shape[0]

    # Padded steps decode a certain blank: every beam keeps its score.
    onehot_blank = jnp.where(jnp.arange(c) == blank, 0.0, NEG_INF)
    lp = jnp.where(t_valid, _prune_step(lp, cutoff_top_n, cutoff_prob),
                   onehot_blank)

    total = jnp.logaddexp(p_b, p_nb)  # (K,)
    parent_ok = total > NEG_INF

    # --- candidates: K stays + (K, C) extends ---
    last_c = jnp.clip(last, 0, c - 1)
    lp_last = _take(lp, _onehot(last_c, c), NEG_INF)  # (K,)
    stay_pb = total + lp[blank]
    stay_pnb = jnp.where(lens > 0, p_nb + lp_last, NEG_INF)

    ext = jnp.where(jnp.arange(c)[None, :] == last[:, None],
                    p_b[:, None], total[:, None]) + lp[None, :]  # (K, C)
    if lm is not None:
        # shallow fusion: extending with the space char completes the
        # beam's partial word; score it against the parent's word context
        # exactly like the host decoder's lm_word_bonus (beam.py:84-90)
        from deepspeech_tpu.decoders.lm_device import (lm_score_word,
                                                       trie_word_id)
        wid_cur = jax.vmap(lambda nd: trie_word_id(lm, nd))(lm_trie)
        lm_sc = jax.vmap(
            lambda cx, cl, w: lm_score_word(lm, cx, cl, w))(
                lm_ctx, lm_len, wid_cur)
        bonus = jnp.where(lm_trie != 0,
                          alpha * lm_sc * _LOG10 + beta, 0.0)  # (K,)
        ext = ext + bonus[:, None] * (jnp.arange(c)[None, :] == space)
    ext_ok = (parent_ok[:, None] & (jnp.arange(c)[None, :] != blank)
              & (lens[:, None] < max_len) & (ext > NEG_INF))

    # Rolling hashes of extends (stay keeps the parent's, extend appends
    # char c) are NOT materialized as a (K, C) grid any more: selected
    # candidates recompute them from (parent, char) after top-k (see
    # below), and invalid/unselected candidates are masked by ``sel_ok``.

    # --- exact merge. Beam prefixes are pairwise-distinct, so two stays
    # never collide, and extends of equal length collide only if parent+char
    # coincide — i.e. never. The ONLY merge is extend(i,c) == stay(j).
    # That extend's char is necessarily the STAY's last char, and the
    # rolling hash is an invertible affine map mod 2^32 (odd multiplier), so
    # each stay's PARENT hash is recovered exactly — hp = (h - last - 1) *
    # M^-1 — and the merge is a pure (K, K) pair comparison: hp[j] == h[i]
    # on both lanes. No C factor, no gather, no sort. (TPU-measured: the
    # O(K^2 C) eq-grid walled at width 128; gather- and sort-based rewrites
    # were each >13x SLOWER than that grid — gathers/sorts inside a scan are
    # poison on the VPU; this form is pure broadcast arithmetic. PERF.md.)
    hp1 = (h1 - (last + 1)) * _HASH_M1_INV  # (K,) parent hash of each stay
    hp2 = (h2 - (last + 1)) * _HASH_M2_INV
    # ext value at (parent i, char = last[j]) rebuilt bit-exactly from the
    # same terms as ext[i, ch] (sel + lp[ch] [+ space bonus])
    sel_ij = jnp.where(last[None, :] == last[:, None],
                       p_b[:, None], total[:, None])  # (K parent, K stay)
    ext_at = sel_ij + lp_last[None, :]
    if lm is not None:
        ext_at = ext_at + jnp.where(last[None, :] == space,
                                    bonus[:, None], 0.0)
    match_ij = ((hp1[None, :] == h1[:, None]) & (hp2[None, :] == h2[:, None])
                & (lens[None, :] > 0) & parent_ok[:, None]
                & (lens[:, None] < max_len) & (ext_at > NEG_INF))
    # mass of absorbed extends joins the matching stay's non-blank prob
    add_pnb = _masked_lse(ext_at, match_ij, axis=0)           # (K,)
    stay_pnb = jnp.logaddexp(stay_pnb, add_pnb)
    # absorbed extends: (i, ch) with a matching stay j whose last == ch —
    # a tiny bool matmul instead of a scatter
    onehot_last = ((last[:, None] == jnp.arange(c)[None, :])
                   & (lens > 0)[:, None])
    ext_absorbed = jnp.dot(match_ij.astype(jnp.float32),
                           onehot_last.astype(jnp.float32)) > 0.5  # (K, C)

    stay_score = jnp.where(parent_ok,
                           jnp.logaddexp(stay_pb, stay_pnb), NEG_INF)
    ext_score = jnp.where(ext_ok & ~ext_absorbed, ext, NEG_INF).reshape(k * c)

    # Offsets parity with the host decoder's first-insert-wins rule (beams
    # are processed in score order = row order): when an absorbed extend's
    # parent row i ranks above the stay row j, the merged beam carries the
    # EXTEND's offsets (char stamped at this frame), not the stay's.
    # Chars + frame offsets ride ONE packed int32 row per beam
    # (pox = (t+1)*64 + char; the parent's chars equal the stay's by
    # construction), halving the (K, L) carry traffic per step.
    # first matching parent per stay + "any" in ONE min-reduce (the
    # argmax+any pair was two separate reduction passes per step)
    i_first = jnp.min(jnp.where(match_ij, jnp.arange(k)[:, None], k), axis=0)
    has_ext = i_first < k
    i_min = jnp.where(has_ext, i_first, 0)
    use_ext_off = has_ext & (i_min < jnp.arange(k))
    if not trace:
        oh_imin = _onehot(i_min, k)
        pos_i = _take(lens, oh_imin, _I32_MIN)
        write_i = jnp.arange(max_len)[None, :] == pos_i[:, None]
        pack_j = (t + 1) * _PACK + last_c  # the stay's own char, stamped now
        off_from_ext = jnp.where(write_i, pack_j[:, None],
                                 _take_rows_i32(pox, oh_imin))
        stay_pox = jnp.where(use_ext_off[:, None], off_from_ext, pox)

    # --- select beams and rebuild prefix rows (layout: [stays | extends]) ---
    score = jnp.concatenate([stay_score, ext_score])
    # lax.top_k (XLA's tuned TopK custom call, 2.4 us at this shape) by
    # default; DEEPSPEECH_TPU_PALLAS_TOPK=1 swaps in the bit-equal Pallas
    # bitonic network (ops/pallas/topk_kernel.py, measured slower — see
    # PERF.md "Beam selection").
    from deepspeech_tpu.ops.pallas.topk_kernel import topk_total_order
    top_scores, idx = topk_total_order(score, k)
    is_ext = idx >= k
    eidx = jnp.maximum(idx - k, 0)
    parent = jnp.where(is_ext, eidx // c, idx)
    char = jnp.where(is_ext, eidx % c, 0)
    sel_ok = top_scores > NEG_INF

    # Selected-candidate payloads are RECOMPUTED from (parent, char) with
    # the same expressions (same operands, same op order -> bit-identical)
    # instead of gathered at ``idx`` from the (K + K*C)-wide concatenations,
    # and the remaining ``[parent]`` lookups ride one-hot select+max
    # (:func:`_take`) — in-scan gathers cost ~9 ns/element regardless of
    # table size and were 70% of the search. Every selected extend has
    # ``ext_ok & ~absorbed`` (its score survived > -inf), so the un-masked
    # formulas apply; ``sel_ok`` masks the rest, as before.
    oh_parent = _onehot(parent, k)                  # (K, K)
    pb_p = _take(p_b, oh_parent, NEG_INF)
    total_p = _take(total, oh_parent, NEG_INF)
    last_p = _take(last, oh_parent, _I32_MIN)
    h1_p = _take(h1, oh_parent, _I32_MIN)
    h2_p = _take(h2, oh_parent, _I32_MIN)
    lp_ch = _take(lp, _onehot(char, c), NEG_INF)
    ext_val = jnp.where(char == last_p, pb_p, total_p) + lp_ch
    if lm is not None:
        ext_val = ext_val + _take(bonus, oh_parent, NEG_INF) * (char == space)
    sel_pb = jnp.where(is_ext, NEG_INF, _take(stay_pb, oh_parent, NEG_INF))
    sel_pnb = jnp.where(is_ext, ext_val,
                        _take(stay_pnb, oh_parent, NEG_INF))
    char1 = char + 1
    sel_h1 = jnp.where(is_ext, h1_p * _HASH_M1 + char1, h1_p)
    sel_h2 = jnp.where(is_ext, h2_p * _HASH_M2 + char1, h2_p)

    pos = _take(lens, oh_parent, _I32_MIN)  # (K,)
    new_lens = pos + is_ext.astype(lens.dtype)
    new_last = jnp.where(is_ext, char, last_p)

    ys = None
    if trace:
        # backpointer row: selected stays whose offsets the first-insert
        # rule re-parents become (i_min, own last char, emit) — the chain
        # through i_min reproduces both chars and stamped frames exactly
        j_sel = jnp.minimum(idx, k - 1)
        oh_jsel = _onehot(j_sel, k)
        reparent = ~is_ext & _take(use_ext_off, oh_jsel, False)
        tr_parent = jnp.where(reparent, _take(i_min, oh_jsel, _I32_MIN),
                              parent)
        tr_char = jnp.where(is_ext, char, _take(last_c, oh_jsel, _I32_MIN))
        tr_emit = (is_ext | reparent) & sel_ok
        tr_parent = jnp.where(sel_ok, tr_parent,
                              jnp.arange(k, dtype=jnp.int32))
        ys = (tr_parent.astype(jnp.int32), tr_char.astype(jnp.int32),
              tr_emit)
    else:
        write = is_ext[:, None] & (jnp.arange(max_len)[None, :]
                                   == pos[:, None])
        base = jnp.where(is_ext[:, None], _take_rows_i32(pox, oh_parent),
                         _take_rows_i32(stay_pox, oh_parent))
        new_pox = jnp.where(write, ((t + 1) * _PACK + char)[:, None], base)

    sent = -(jnp.arange(k, dtype=jnp.int32) + 2)
    new_state = (() if trace else (new_pox,)) + (
        new_lens,
        jnp.where(sel_ok, new_last, -1),
        jnp.where(sel_ok, sel_h1, sent),
        jnp.where(sel_ok, sel_h2, sent),
        jnp.where(sel_ok, sel_pb, NEG_INF),
        jnp.where(sel_ok, sel_pnb, NEG_INF),
    )
    if lm is not None:
        # per-beam LM carry: a space extend completes the parent's partial
        # word (context gains its vocab id, partial resets); any other
        # extend walks one char-trie edge; stays inherit the parent's state
        from deepspeech_tpu.decoders.lm_device import trie_advance
        ctx_p = _take2(lm_ctx, oh_parent, _I32_MIN)
        len_p = _take(lm_len, oh_parent, _I32_MIN)
        trie_p = _take(lm_trie, oh_parent, _I32_MIN)
        adv = jax.vmap(lambda nd, ch: trie_advance(lm, nd, ch))(trie_p, char)
        is_space_ext = is_ext & (char == space)
        completes = is_space_ext & (trie_p != 0)
        om1 = lm_ctx.shape[1]
        if om1 > 0:
            shifted = jnp.concatenate(
                [ctx_p[:, 1:], _take(wid_cur, oh_parent, _I32_MIN)[:, None]],
                axis=1)
            new_ctx = jnp.where(completes[:, None], shifted, ctx_p)
        else:
            new_ctx = ctx_p
        new_clen = jnp.where(completes, jnp.minimum(len_p + 1, om1), len_p)
        new_trie = jnp.where(is_space_ext, 0,
                             jnp.where(is_ext, adv, trie_p))
        new_state = new_state + (new_ctx, new_clen, new_trie)
    return new_state, ys


def _backtrace(parents, chars, emits, ts, lens_final, rows, l):
    """Rebuild (prefix, offsets) rows from the per-step backpointer trace.

    parents/chars/emits: (T, K); ts: (T,) frame stamps; rows: (P,) final
    beam rows to walk. A reverse scan follows each row's parent chain —
    every emitting step writes one (char, frame) at its position — then one
    drop-mode scatter of the T collected writes lands them in (P, L)."""

    def walk(row):
        def body(carry, xs):
            cur, pos = carry
            par, ch, em, t = xs
            e = em[cur]
            p_new = pos - e.astype(jnp.int32)
            out = (e, p_new, ch[cur], t)
            return (par[cur], p_new), out

        _, (ev, posv, chv, tv) = jax.lax.scan(
            body, (row, lens_final[row]), (parents, chars, emits, ts),
            reverse=True)
        idx = jnp.where(ev, posv, l)
        prefix = jnp.full((l,), -1, jnp.int32).at[idx].set(
            chv, mode="drop")
        offs = jnp.full((l,), -1, jnp.int32).at[idx].set(tv, mode="drop")
        return prefix, offs

    return jax.vmap(walk)(rows)


# ---------------------------------------------------------------------------
# streaming continuation API: the beam state is an explicit carry, so a
# search can be advanced chunk-by-chunk (serve/streaming.py feeds each
# chunk's emitted frames) and finalized at any time. Because padded steps
# (valid=False) decode a certain blank and provably leave every merged beam
# unchanged, a chunked run is EXACTLY equal to the one-shot batch search
# over the concatenated valid frames.
# ---------------------------------------------------------------------------

def beam_state_init(batch: int, beam_width: int, max_len: int, lm=None):
    """Fresh batched beam state: beam 0 = the empty prefix per lane. With
    ``lm`` (device LM arrays) the per-beam word-context / char-trie carry is
    appended, enabling LM-fused streaming decode."""
    k, l = beam_width, max_len

    def one(_):
        h0 = jnp.where(jnp.arange(k) == 0, 1, -(jnp.arange(k) + 2))
        st = (
            jnp.zeros((k, l), jnp.int32),          # pox (packed char+frame)
            jnp.zeros((k,), jnp.int32),            # lens
            jnp.full((k,), -1, jnp.int32),         # last
            h0.astype(jnp.int32),                  # h1
            h0.astype(jnp.int32),                  # h2
            jnp.where(jnp.arange(k) == 0, 0.0, NEG_INF),  # p_b
            jnp.full((k,), NEG_INF),               # p_nb
        )
        if lm is not None:
            from deepspeech_tpu.decoders.lm_device import lm_state_init
            st = st + lm_state_init(lm, k)
        return st

    return jax.vmap(one)(jnp.arange(batch))


def beam_continue_impl(state, logits: jnp.ndarray, ts: jnp.ndarray,
                       valid: jnp.ndarray, blank: int = 0,
                       cutoff_top_n: int = 40, cutoff_prob: float = 1.0,
                       lm: dict | None = None, space: int = -1,
                       alpha: float = 0.0, beta: float = 0.0):
    """Unjitted body of :func:`ctc_beam_continue` — callable from inside a
    larger jitted program (serve/streaming.py fuses it into the chunk step
    so one tick is ONE device dispatch)."""
    if logits.shape[-1] > _PACK:
        raise ValueError(f"beam search supports up to {_PACK} classes")
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    max_len = state[0].shape[-1]

    def one(st, lp, t, v):
        step = partial(_beam_step, blank=blank, cutoff_top_n=cutoff_top_n,
                       cutoff_prob=cutoff_prob, max_len=max_len, lm=lm,
                       space=space, alpha=alpha, beta=beta)
        st, _ = jax.lax.scan(step, st, (lp, t, v))
        return st

    return jax.vmap(one)(state, log_probs, ts.astype(jnp.int32), valid)


@partial(jax.jit, static_argnames=("blank", "cutoff_top_n", "cutoff_prob",
                                   "space", "alpha", "beta"))
def ctc_beam_continue(state, logits: jnp.ndarray, ts: jnp.ndarray,
                      valid: jnp.ndarray, blank: int = 0,
                      cutoff_top_n: int = 40, cutoff_prob: float = 1.0,
                      lm: dict | None = None, space: int = -1,
                      alpha: float = 0.0, beta: float = 0.0):
    """Advance a batched beam state by one chunk.

    logits: (B, T, C) raw logits (log-softmax applied here so it fuses);
    ts: (B, T) int32 global frame index per step (stamped into offsets);
    valid: (B, T) bool — False steps are no-ops (certain blank).
    ``lm`` must match ``beam_state_init``'s (the state carries its shape).
    """
    return beam_continue_impl(state, logits, ts, valid, blank=blank,
                              cutoff_top_n=cutoff_top_n,
                              cutoff_prob=cutoff_prob, lm=lm, space=space,
                              alpha=alpha, beta=beta)


@partial(jax.jit, static_argnames=("top_paths", "space", "alpha", "beta"))
def beam_state_best(state, top_paths: int = 1, lm: dict | None = None,
                    space: int = -1, alpha: float = 0.0, beta: float = 0.0):
    """(prefixes (B,P,L), lens (B,P), offsets (B,P,L), scores (B,P)) of the
    current best beams — callable mid-stream or at the end. With ``lm`` the
    pending partial word's completion bonus is applied to the ranking, like
    the one-shot search's finalization (and the host beam.py:151-156)."""

    def one(st):
        pox, lens, p_b, p_nb = st[0], st[1], st[5], st[6]
        score = jnp.logaddexp(p_b, p_nb)
        if lm is not None:
            from deepspeech_tpu.decoders.lm_device import (lm_score_word,
                                                           trie_word_id)
            lm_ctx, lm_len, lm_trie = st[7], st[8], st[9]
            wid = jax.vmap(lambda nd: trie_word_id(lm, nd))(lm_trie)
            sc = jax.vmap(
                lambda cx, cl, w: lm_score_word(lm, cx, cl, w))(
                    lm_ctx, lm_len, wid)
            score = score + jnp.where(lm_trie != 0,
                                      alpha * sc * _LOG10 + beta, 0.0)
        order = jnp.argsort(-score)[:top_paths]
        prefixes, offsets = unpack_prefix(pox[order], lens[order])
        return prefixes, lens[order], offsets, score[order]

    return jax.vmap(one)(state)


@partial(jax.jit, static_argnames=("beam_width", "blank", "cutoff_top_n",
                                   "cutoff_prob", "top_paths", "max_len",
                                   "space", "alpha", "beta"))
def ctc_beam_search_device(log_probs: jnp.ndarray, lengths: jnp.ndarray,
                           beam_width: int = 10, blank: int = 0,
                           cutoff_top_n: int = 40, cutoff_prob: float = 1.0,
                           top_paths: int = 1, max_len: int | None = None,
                           lm: dict | None = None, space: int = -1,
                           alpha: float = 0.0, beta: float = 0.0):
    """Batched CTC prefix beam search, fully on device.

    Args:
      log_probs: (B, T, C) log posteriors.
      lengths:   (B,) valid frame counts.
      lm: optional device LM arrays (decoders/lm_device.py) for word-level
        shallow fusion at ``space`` emissions with weights alpha/beta —
        the on-chip equivalent of ctcdecode+KenLM (ref decoder.py:95-99).
    Returns:
      prefixes (B, top_paths, L) int32 padded with -1 beyond each length,
      lens (B, top_paths), offsets (B, top_paths, L) frame indices,
      scores (B, top_paths) merged log probabilities (LM bonuses included).
    """
    b, t_max, c = log_probs.shape
    if c > _PACK:
        raise ValueError(f"beam search supports up to {_PACK} classes")
    k = beam_width
    l = t_max if max_len is None else min(max_len, t_max)

    def decode_one(lp_utt, length):
        lens = jnp.zeros((k,), jnp.int32)
        last = jnp.full((k,), -1, jnp.int32)
        # beam 0 = the empty prefix; others start invalid w/ sentinel hashes
        h0 = jnp.where(jnp.arange(k) == 0, 1, -(jnp.arange(k) + 2))
        h1 = h0.astype(jnp.int32)
        h2 = h0.astype(jnp.int32)
        p_b = jnp.where(jnp.arange(k) == 0, 0.0, NEG_INF)
        p_nb = jnp.full((k,), NEG_INF)
        init = (lens, last, h1, h2, p_b, p_nb)
        if lm is not None:
            from deepspeech_tpu.decoders.lm_device import lm_state_init
            init = init + lm_state_init(lm, k)

        # backpointer mode: the scan carries only K-sized beam scalars and
        # emits per-step (parent, char, emit) rows; prefixes/offsets are
        # reconstructed once below (the O(K·L)-per-step carry was the
        # width-128 cost after the O(K^2) merge, PERF.md)
        step = partial(_beam_step, blank=blank, cutoff_top_n=cutoff_top_n,
                       cutoff_prob=cutoff_prob, max_len=l, lm=lm,
                       space=space, alpha=alpha, beta=beta, trace=True)
        ts = jnp.arange(t_max, dtype=jnp.int32)
        state, trace = jax.lax.scan(step, init, (lp_utt, ts, ts < length))
        lens = state[0]
        p_b, p_nb = state[4], state[5]

        score = jnp.logaddexp(p_b, p_nb)
        if lm is not None:
            # pending partial word completes at finalization, like the host
            # decoder's end-of-utterance bonus (beam.py:151-156)
            from deepspeech_tpu.decoders.lm_device import (lm_score_word,
                                                           trie_word_id)
            lm_ctx, lm_len, lm_trie = state[6], state[7], state[8]
            wid = jax.vmap(lambda nd: trie_word_id(lm, nd))(lm_trie)
            sc = jax.vmap(
                lambda cx, cl, w: lm_score_word(lm, cx, cl, w))(
                    lm_ctx, lm_len, wid)
            score = score + jnp.where(lm_trie != 0,
                                      alpha * sc * _LOG10 + beta, 0.0)
        order = jnp.argsort(-score)[:top_paths]
        prefixes, offsets = _backtrace(*trace, ts, lens, order, l)
        return (prefixes, lens[order], offsets, score[order])

    return jax.vmap(decode_one, in_axes=(0, 0))(log_probs, lengths)


class DeviceBeamCTCDecoder(Decoder):
    """Drop-in beam decoder running the search as one XLA program.

    Same call convention as :class:`~.beam.BeamCTCDecoder` /
    reference decoder.py:128-143 — ``decode(probs, sizes)`` returns
    (strings, offsets) nested [batch][path]. With ``lm_path`` the word
    n-gram LM rides the chip too (decoders/lm_device.py): shallow fusion
    ``alpha * log10 P(word|ctx) + beta`` at space emissions inside the
    compiled search — the on-device twin of ctcdecode+KenLM
    (reference decoder.py:95-99, opts.py:5-9)."""

    def __init__(self, labels, beam_width=10, cutoff_top_n=40,
                 cutoff_prob=1.0, top_paths=1, blank_index=0,
                 max_len: int | None = None, lm_path: str | None = None,
                 alpha: float = 0.8, beta: float = 1.0):
        super().__init__(labels, blank_index)
        self.beam_width = beam_width
        self.cutoff_top_n = cutoff_top_n
        self.cutoff_prob = float(cutoff_prob)
        self.top_paths = top_paths
        self.max_len = max_len
        self.alpha = float(alpha)
        self.beta = float(beta)
        if lm_path:
            from deepspeech_tpu.decoders.lm_device import load_device_lm
            self.lm = load_device_lm(lm_path, labels)
        else:
            self.lm = None

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
            max_len=self.max_len, lm=self.lm,
            space=(self.space_index if self.lm is not None else -1),
            alpha=self.alpha, beta=self.beta)
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
