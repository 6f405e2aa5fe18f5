"""On-device additive noise injection.

The reference mixes noise-pool clips and gaussian noise into the waveform on
the HOST data-loader path (reference data/audio_aug.py:79-107 ``AddNoise``:
two passes, each w.p. ``prob``: pick a noise source, draw ``a ~
U(0, limit)``, mix ``(wav + a*noise) / (1 + a)``). This module keeps those
semantics but runs the mixing INSIDE the compiled train step, against a
device-resident noise bank — no host-side mixing pass, no extra H2D traffic
beyond the one-time bank upload (the "on-device noise injection" clause of
the BASELINE north star).

Host twin: :class:`deepspeech_tpu.augment.waveform.AddNoise` (distribution
parity asserted in tests/test_noise_device.py).

Known bounded divergence vs. the host: the device slice start is capped at
``bank_width - batch_width`` (fixed-shape ``dynamic_slice``), so noise files
longer than ``2 * max_duration`` offer fewer distinct offsets than host
mixing would allow. The mix math and the per-pass probabilities are exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_noise_bank(noise_paths, sample_rate: int, width: int,
                     pad: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Load + stack the noise pool into one (N, 2*width) f32 host array.

    Each row holds one noise source stacked (repeated reads, reference
    audio_aug.py:110-134 intent) to up to ``2*width`` samples; rows shorter
    than an utterance make that utterance skip the pool pass, like the host
    AddNoise's early return. ``pad`` reserves headroom so the batch's
    reflect tail can also be mixed.
    Returns (bank (N, 2*width), bank_lengths (N,) int32).
    """
    from deepspeech_tpu.augment.waveform import get_stacked_noise
    w2 = 2 * (width + pad)
    rows, lens = [], []
    for p in noise_paths:
        clip = get_stacked_noise(p, w2, sample_rate)
        n = min(clip.shape[0], w2)
        row = np.zeros(w2, np.float32)
        row[:n] = clip[:n]
        rows.append(row)
        lens.append(n)
    if not rows:
        rows, lens = [np.zeros(w2, np.float32)], [0]
    return np.stack(rows), np.asarray(lens, np.int32)


def _rewrite_reflect_tail(audio: jnp.ndarray, lengths: jnp.ndarray,
                          pad: int) -> jnp.ndarray:
    """Re-derive each row's reflect end-pad from its (now noised) samples.

    Batches pre-write the CLEAN waveform's reflect tail into the pad region
    (data/loader.py BucketSpec.reflect_tail) so the centered STFT's final
    frame matches host featurization; after on-device mixing the tail must
    reflect the MIXED signal: tail[j] = audio[len - 2 - j], with the same
    truncation rule as the loader (min(pad, row slack, len - 1)).
    """
    b, s = audio.shape
    ar = jnp.arange(s)[None, :]
    n = lengths[:, None]
    tail_eff = jnp.minimum(jnp.minimum(pad, s - n), n - 1)
    in_tail = (ar >= n) & (ar < n + tail_eff)
    src = jnp.clip(2 * n - 2 - ar, 0, s - 1)
    refl = jnp.take_along_axis(audio, src, axis=1)
    return jnp.where(in_tail, refl, audio)


def add_noise_batch(audio: jnp.ndarray, audio_lengths: jnp.ndarray,
                    key, bank: jnp.ndarray, bank_lengths: jnp.ndarray,
                    prob: float, limit: float,
                    reflect_pad: int = 0) -> jnp.ndarray:
    """Reference AddNoise (audio_aug.py:79-107), vectorized on device.

    audio: (B, S) padded waveforms; bank: (N, S2>=S+reflect_pad) noise pool.
    Two passes per row — pool clip then gaussian — each applied w.p.
    ``prob`` with its own ``a ~ U(0, limit)``; mixing touches only the valid
    samples and the reflect tail is re-derived afterwards.
    """
    b, s = audio.shape
    n_clips, s2 = bank.shape
    if s2 < s:
        raise ValueError(
            f"noise bank rows ({s2} samples) are narrower than the batch "
            f"({s}); build the bank with width >= the longest bucket "
            "(build_noise_bank width covers 2x the longest utterance)")
    pos_cap = s2 - s
    valid = (jnp.arange(s)[None, :]
             < audio_lengths[:, None]).astype(audio.dtype)

    def mix(audio, noise, apply, alpha):
        alpha = jnp.where(apply, alpha, 0.0)[:, None]
        return (audio + alpha * noise * valid) / (1.0 + alpha)

    k_pool, k_gauss = jax.random.split(key)
    kp = jax.random.split(k_pool, 4)
    # pass 0: a clip from the pool; rows whose chosen clip is shorter than
    # the utterance skip the pass (host AddNoise's early return)
    clip = jax.random.randint(kp[0], (b,), 0, n_clips)
    avail = bank_lengths[clip] - audio_lengths
    roll0 = jax.random.uniform(kp[1], (b,)) < prob
    has = bank_lengths[clip] > 0
    apply0 = roll0 & has & (avail >= 0)
    # a too-short pool clip ends the WHOLE call on the host (AddNoise's
    # early return, audio_aug.py:94-96) — the gaussian pass is skipped too
    aborted = roll0 & has & (avail < 0)
    pos = jnp.minimum(
        (jax.random.uniform(kp[2], (b,))
         * (avail + 1).astype(jnp.float32)).astype(jnp.int32),
        pos_cap)
    noise0 = jax.vmap(lambda c, p: jax.lax.dynamic_slice(
        bank, (c, p), (1, s))[0])(clip, jnp.maximum(pos, 0))
    alpha0 = limit * jax.random.uniform(kp[3], (b,))
    audio = mix(audio, noise0, apply0, alpha0)

    # pass 1: gaussian noise (the host draws a 2L window and slices — iid,
    # so a fresh (B, S) draw is the same distribution)
    kg = jax.random.split(k_gauss, 3)
    apply1 = (jax.random.uniform(kg[0], (b,)) < prob) & ~aborted
    noise1 = jax.random.normal(kg[1], (b, s), audio.dtype)
    alpha1 = limit * jax.random.uniform(kg[2], (b,))
    audio = mix(audio, noise1, apply1, alpha1)

    if reflect_pad > 0:
        audio = _rewrite_reflect_tail(audio, audio_lengths, reflect_pad)
    return audio
