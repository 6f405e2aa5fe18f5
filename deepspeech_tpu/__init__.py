"""deepspeech_tpu — a TPU-native (JAX/XLA/Pallas) CTC speech-recognition framework.

A from-scratch re-design of the capabilities of ``vadimkantorov/deepspeech.pytorch``
(DeepSpeech2-lineage CTC ASR): log-STFT spectrogram front-end, waveform +
SpecAugment-style augmentation, a model zoo (DS2 conv+BiRNN and
wav2letter/GLU/residual-SE CNN variants), fused log-space CTC loss, greedy and
beam-search CTC decoding, WER/CER evaluation, CER-driven curriculum sampling,
duration-bucketed SortaGrad batching, self-describing checkpoints, and
data-parallel training over TPU meshes via ``jax.sharding`` + ``jit``.

Layering (bottom-up):
  ops/       on-device primitives: framed FFT, scan RNN cells, CTC, Pallas kernels
  audio/     wav I/O + DSP front-end (host parity path + device path)
  augment/   waveform (host) and spectrogram (device) augmentation
  text/      label codec (char<->id, number normalization)
  datapipe/  manifests, datasets, bucketing samplers, collate, curriculum
  models/    flax model zoo with self-describing checkpoint contract
  decoders/  greedy + beam CTC decoding, n-gram LM fusion
  metrics/   edit distance (native C++ with Python fallback), WER/CER
  parallel/  mesh construction + sharding rules (data/model axes)
  train/     pure pjit train/eval steps, optimizer, checkpointing, loop, observers
"""

__version__ = "0.1.0"

# Honor an explicit JAX_PLATFORMS=cpu request. The bundled 'axon' TPU PJRT
# plugin force-appends itself to jax_platforms during registration, which both
# overrides the env var and pays a multi-second tunnel handshake in every CLI
# subprocess. Pinning via jax.config before backend init restores standard
# JAX env-var semantics (no-op unless the user asked for cpu).
import os as _os

if _os.environ.get("JAX_PLATFORMS", "") == "cpu":
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - jax absent or already initialized
        pass
del _os
