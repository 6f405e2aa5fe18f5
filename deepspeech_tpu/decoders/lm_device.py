"""Device-resident n-gram LM: DSLM tables in HBM + jit-able scoring.

The reference fuses a word n-gram LM into beam search through ctcdecode's
C++ scorer on the HOST (reference decoder.py:95-99, 128-143; opts.py:5-9).
This module puts the same Katz-backoff trie on the ACCELERATOR so the
on-device beam search (:mod:`deepspeech_tpu.decoders.beam_device`) can apply
``alpha * log10 P(word | context) + beta`` at word boundaries inside the
compiled search — no host round trips, scoring vectorized over all beams.

Layout (all jnp arrays in one flat dict — a jit-able pytree):

* the DSLM trie levels verbatim (``decoders/lm_binary.py`` file layout is
  already flat + sorted, i.e. device-friendly): dense ``logp_1``/
  ``backoff_1`` over vocab ids, and per level k>=2 ``words_k`` (sorted
  within each parent's ``child_start_{k-1}`` range), ``logp_k``,
  ``backoff_k``;
* a character trie over the vocabulary (edges keyed ``node * C + char_id``,
  globally sorted) that maps each beam's current partial word — a sequence
  of label ids — to its vocab id, replacing the host decoder's partial-word
  string state with a single int32 node per beam;
* 0-d scalars ``unk_id`` / ``bos_id`` / ``trie_c``.

Lookups are branchless binary searches (``_lower_bound``) with a static
iteration count, so every query jits to fixed control flow; the n-gram walk
and the backoff loop are unrolled over the (static) LM order, replicating
``BinaryLM.score_word`` / ``ArpaLM.score_word`` semantics exactly
(asserted in tests/test_lm_device.py).

All indices are int32 (x32-mode JAX): LMs beyond 2^31 n-grams per level are
rejected at build time.
"""

from __future__ import annotations

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = np.float32(-99.0)  # absent-unigram marker, == lm_binary.SENTINEL
_I32_MAX = np.int32(2**31 - 1)


# ---------------------------------------------------------------------------
# build (host side)
# ---------------------------------------------------------------------------


def _build_char_trie(vocab, labels: str):
    """Char trie over ``vocab`` using ``labels``' character->id mapping.

    Words containing characters outside the label set can never be produced
    by the beam and are skipped (the host decoder reaches the same outcome:
    its partial-word string simply never equals such a word).
    Returns (edge_key int32 sorted, edge_child int32, node_word int32).
    """
    cmap = {ch: i for i, ch in enumerate(labels)}
    children: list[dict] = [{}]
    word_at = [-1]
    for wid, w in enumerate(vocab):
        ids = [cmap.get(ch) for ch in w]
        if not ids or any(i is None for i in ids):
            continue
        node = 0
        for ci in ids:
            nxt = children[node].get(ci)
            if nxt is None:
                nxt = len(children)
                children.append({})
                word_at.append(-1)
                children[node][ci] = nxt
            node = nxt
        word_at[node] = wid
    c = len(labels)
    keys, childs = [], []
    for node, ch in enumerate(children):
        for ci, nxt in ch.items():
            keys.append(node * c + ci)
            childs.append(nxt)
    if keys and max(keys) >= 2**31:
        raise ValueError("LM vocabulary trie too large for int32 edge keys")
    if not keys:  # degenerate vocab: one unmatchable sentinel edge
        keys, childs = [int(_I32_MAX)], [-1]
    keys = np.asarray(keys, np.int64)
    order = np.argsort(keys, kind="stable")
    return (keys[order].astype(np.int32),
            np.asarray(childs, np.int32)[order],
            np.asarray(word_at, np.int32))


def build_device_lm(blm, labels: str) -> dict:
    """BinaryLM (decoders/lm_binary.py) -> flat dict of device arrays."""
    a = {}
    v = blm.vocab_size
    order = blm.order

    def as_i32(x, name):
        x = np.asarray(x)
        if x.size and int(x.max(initial=0)) >= 2**31:
            raise ValueError(f"{name}: LM too large for int32 device indices")
        return x.astype(np.int32, copy=True)

    def as_f32(x):  # copy=True: never alias the (possibly mmap'd) source
        return np.asarray(x).astype(np.float32, copy=True)

    a["logp_1"] = as_f32(blm._a["logp_1"])
    a["backoff_1"] = as_f32(blm._a["backoff_1"])
    for k in range(2, order + 1):
        a[f"words_{k}"] = as_i32(blm._a[f"words_{k}"], f"words_{k}")
        a[f"logp_{k}"] = as_f32(blm._a[f"logp_{k}"])
        bo = blm._a.get(f"backoff_{k}")
        if bo is not None:
            a[f"backoff_{k}"] = as_f32(bo)
    for k in range(1, order):
        a[f"child_start_{k}"] = as_i32(blm._a[f"child_start_{k}"],
                                       f"child_start_{k}")
    ek, ec, nw = _build_char_trie(blm.vocab, labels)
    a["trie_edge_key"], a["trie_edge_child"], a["trie_node_word"] = ek, ec, nw
    a["unk_id"] = np.int32(blm._wid.get("<unk>", -1))
    a["bos_id"] = np.int32(blm._wid.get("<s>", -1))
    a["trie_c"] = np.int32(len(labels))
    return {k_: jnp.asarray(v_) for k_, v_ in a.items()}


def load_device_lm(path: str, labels: str) -> dict:
    """ARPA(.gz) / DSLM / KenLM-binary file -> device LM arrays.

    Textual ARPA goes through the DSLM converter into a temp file first
    (one-time cost; ship a .dslm for production, see lm_binary.main)."""
    from deepspeech_tpu.decoders.lm_binary import (BinaryLM, convert_arpa,
                                                   is_dslm)
    from deepspeech_tpu.decoders.lm_kenlm import is_kenlm
    from deepspeech_tpu.decoders.lm_trie import TRIE_TYPES, kenlm_model_type
    if is_kenlm(path):
        if kenlm_model_type(path) in TRIE_TYPES:
            # trie binaries store explicit word ids + strings, so they ARE
            # invertible: enumerate back to ARPA, then through the DSLM
            # converter (KenLMTrie itself rejects quantized/Bhiksha
            # variants with guidance)
            from deepspeech_tpu.decoders.lm_trie import KenLMTrie
            trie = KenLMTrie(path)
            fd, tmp_arpa = tempfile.mkstemp(suffix=".arpa")
            os.close(fd)
            try:
                trie.dump_arpa(tmp_arpa)
                return load_device_lm(tmp_arpa, labels)
            finally:
                trie.close()
                os.unlink(tmp_arpa)
        # probing binaries store one-way n-gram hashes — they can be
        # QUERIED (host beam, decoders/lm_kenlm.py) but never expanded into
        # the explicit trie the device search needs
        raise ValueError(
            f"{path}: KenLM probing binaries cannot feed the on-device "
            "beam (hashed n-grams are not invertible); use the host beam "
            "decoder, a trie-format binary (build_binary trie), or convert "
            "the source ARPA with python -m deepspeech_tpu.decoders."
            "lm_binary")
    if is_dslm(path):
        blm = BinaryLM(path)
    else:
        fd, tmp = tempfile.mkstemp(suffix=".dslm")
        os.close(fd)
        try:
            convert_arpa(path, tmp)
            blm = BinaryLM(tmp)
        finally:
            os.unlink(tmp)  # the mmap keeps the inode alive while open
    try:
        return build_device_lm(blm, labels)
    finally:
        blm.close()


def lm_order(lm: dict) -> int:
    """Static LM order from the pytree structure."""
    order = 1
    while f"logp_{order + 1}" in lm:
        order += 1
    return order


# ---------------------------------------------------------------------------
# device-side queries (scalar; callers vmap over beams)
# ---------------------------------------------------------------------------


def _lower_bound(arr, lo, hi, x):
    """First index in sorted ``arr[lo:hi)`` not less than ``x``; branchless
    binary search with a static iteration count (jit-fixed control flow)."""
    size = arr.shape[0]
    iters = max(1, int(size).bit_length())

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) // 2
        v = arr[jnp.minimum(mid, size - 1)]
        go_right = (lo < hi) & (v < x)
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where(go_right | (lo >= hi), hi, mid)
        return new_lo, new_hi

    lo, _ = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def _find(lm: dict, ids, valid):
    """Trie node for an exact id tuple (list of int32 scalars, static
    length >= 1). Returns (found, logp, backoff) — the jit twin of
    ``BinaryLM._find`` + ``_logp``/``_backoff`` (lm_binary.py:235-262)."""
    v = lm["logp_1"].shape[0]
    found = valid & (ids[0] >= 0) & (ids[0] < v)
    node = jnp.clip(ids[0], 0, v - 1)
    level = 1
    for j, wid in enumerate(ids[1:], start=2):
        cs = lm.get(f"child_start_{j - 1}")
        words = lm.get(f"words_{j}")
        if cs is None or words is None or words.shape[0] == 0:
            return jnp.zeros((), bool), jnp.float32(0.0), jnp.float32(0.0)
        size = words.shape[0]
        lo = cs[node]
        hi = cs[jnp.minimum(node + 1, cs.shape[0] - 1)]
        pos = _lower_bound(words, lo, hi, wid)
        pos_c = jnp.minimum(pos, size - 1)
        found &= (pos < hi) & (words[pos_c] == wid) & (wid >= 0)
        node = pos_c
        level = j
    logp = lm[f"logp_{level}"][node]
    bo_arr = lm.get(f"backoff_{level}")
    bo = bo_arr[node] if bo_arr is not None else jnp.float32(0.0)
    return found, logp, bo


def lm_score_word(lm: dict, ctx, ctx_len, wi):
    """log10 P(word wi | ctx) with Katz backoff — exact device replication
    of ``BinaryLM.score_word`` (lm_binary.py:269-293).

    ctx: (order-1,) int32 word ids, most recent LAST, the first
    ``order-1 - ctx_len`` slots unused; ids are -1 for OOV words. wi: int32
    (-1 = OOV). Returns f32 log10 prob (finite)."""
    order = lm_order(lm)
    om1 = order - 1
    penalty = jnp.float32(0.0)
    done = jnp.zeros((), bool)
    res = jnp.float32(0.0)
    v = lm["logp_1"].shape[0]

    for n in range(om1, -1, -1):
        active = (~done) & (n <= ctx_len)
        ctx_n = [ctx[om1 - n + i] for i in range(n)]
        ctx_known = active
        for t in ctx_n:
            ctx_known &= t >= 0
        # exact (ctx_n..., wi) lookup
        found, logp, _ = _find(lm, ctx_n + [wi], ctx_known & (wi >= 0))
        hit = found & (logp != SENTINEL)
        res = jnp.where(hit, penalty + logp, res)
        done = done | hit
        if n > 0:
            # back off: accumulate the abandoned context's backoff weight
            bo_found, _, bo = _find(lm, ctx_n, ctx_known & ~done)
            penalty = penalty + jnp.where(bo_found & ~done & active, bo, 0.0)
        else:
            # <unk> fallback (no SENTINEL check — mirrors the host reader)
            unk = lm["unk_id"]
            unk_lp = lm["logp_1"][jnp.clip(unk, 0, v - 1)]
            fallback = jnp.where(unk >= 0, penalty + unk_lp, penalty - 10.0)
            res = jnp.where(done | ~active, res, fallback)
            done = done | active
    return res


def trie_advance(lm: dict, node, char):
    """Append label ``char`` to a beam's partial word: walk one char-trie
    edge. node: int32 (0 = root/empty partial, -1 = dead = not a vocab
    prefix); returns the child node or -1."""
    ek, ec = lm["trie_edge_key"], lm["trie_edge_child"]
    size = ek.shape[0]
    key = node * lm["trie_c"] + char
    pos = _lower_bound(ek, jnp.zeros((), jnp.int32),
                       jnp.full((), size, jnp.int32), key)
    pos_c = jnp.minimum(pos, size - 1)
    ok = (node >= 0) & (pos < size) & (ek[pos_c] == key)
    return jnp.where(ok, ec[pos_c], jnp.int32(-1))


def trie_word_id(lm: dict, node):
    """Vocab id of the partial word at ``node`` (-1 = OOV/dead/empty)."""
    nw = lm["trie_node_word"]
    return jnp.where(node > 0, nw[jnp.clip(node, 0, nw.shape[0] - 1)],
                     jnp.int32(-1))


def lm_state_init(lm: dict, beam_width: int):
    """Fresh per-beam LM carry: (ctx (K, order-1), ctx_len (K,), trie (K,)).
    Context starts as [<s>] like the host's ``("<s>",) + words``
    (decoders/beam.py lm_word_bonus)."""
    om1 = lm_order(lm) - 1
    k = beam_width
    ctx = jnp.full((k, om1), -1, jnp.int32)
    if om1 > 0:
        ctx = ctx.at[:, -1].set(lm["bos_id"].astype(jnp.int32))
    ctx_len = jnp.full((k,), min(1, om1), jnp.int32)
    trie = jnp.zeros((k,), jnp.int32)
    return ctx, ctx_len, trie
