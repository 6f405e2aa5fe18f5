"""Greedy (best-path) CTC decoder.

The argmax runs on device (fused into the eval step or standalone under
jit); the id->string collapse is host-side string work, semantics identical
to the reference GreedyDecoder (decoder.py:146-197): drop blanks, drop
repeats when requested, record per-character frame offsets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deepspeech_tpu.decoders.base import Decoder


@jax.jit
def greedy_ids(probs_or_logits: jnp.ndarray) -> jnp.ndarray:
    """(B, T, C) -> (B, T) argmax ids on device."""
    return jnp.argmax(probs_or_logits, axis=-1).astype(jnp.int32)


class GreedyDecoder(Decoder):
    def convert_to_strings(self, sequences, sizes=None,
                           remove_repetitions=False, return_offsets=False):
        strings, offsets = [], []
        for i, seq in enumerate(sequences):
            size = int(sizes[i]) if sizes is not None else len(seq)
            string, string_offsets = self.process_string(
                seq, size, remove_repetitions)
            strings.append([string])  # one path per utterance
            offsets.append([string_offsets])
        if return_offsets:
            return strings, offsets
        return strings

    def process_string(self, sequence, size, remove_repetitions=False):
        chars, offs = [], []
        prev = None
        for i in range(size):
            idx = int(sequence[i])
            char = self.int_to_char[idx]
            if idx != self.blank_index:
                if remove_repetitions and i != 0 and prev is not None \
                        and char == self.int_to_char[prev]:
                    pass
                elif idx == self.space_index:
                    chars.append(" ")
                    offs.append(i)
                else:
                    chars.append(char)
                    offs.append(i)
            prev = idx
        return "".join(chars), np.array(offs, dtype=np.int32)

    def decode(self, probs, sizes=None):
        """probs: (B, T, C) array (device or host). Returns (strings, offsets)
        with repeats collapsed, like reference decoder.py:182-197."""
        ids = np.asarray(greedy_ids(jnp.asarray(probs)))
        return self.convert_to_strings(ids, sizes, remove_repetitions=True,
                                       return_offsets=True)

    def decode_ids(self, ids, sizes=None):
        """Decode pre-computed argmax ids (e.g. returned from a jitted step)."""
        return self.convert_to_strings(np.asarray(ids), sizes,
                                       remove_repetitions=True,
                                       return_offsets=True)
