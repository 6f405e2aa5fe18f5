"""Serving runtime: low-latency streaming inference.

The reference ships a Lookahead convolution for unidirectional models
(model.py:140-177, applied at model.py:329-333) — the streaming head of
Wang et al. 2016 — but no streaming runtime to drive it. This package is
that runtime, TPU-first: one jitted fixed-shape chunk step with all
sequential state (conv context, RNN hiddens, lookahead FIFO, running
normalization statistics) carried as device arrays.
"""

from deepspeech_tpu.serve.pool import StreamPool
from deepspeech_tpu.serve.streaming import StreamingTranscriber
from deepspeech_tpu.serve.streaming_cnn import CNNStreamingTranscriber

__all__ = ["StreamingTranscriber", "CNNStreamingTranscriber", "StreamPool"]
