from deepspeech_tpu.decoders.base import Decoder
from deepspeech_tpu.decoders.greedy import GreedyDecoder, greedy_ids

__all__ = ["Decoder", "GreedyDecoder", "greedy_ids"]
