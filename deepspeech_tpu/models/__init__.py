from deepspeech_tpu.models.cnn import ConvBlock, ConvStack, build_cnn_model
from deepspeech_tpu.models.ds2 import (
    ConvFrontend,
    DeepSpeech2,
    RecurrentLayer,
    conv_out_frames,
    conv_out_lengths,
)
from deepspeech_tpu.models.factory import (
    SUPPORTED,
    build_model,
    model_from_meta,
)
from deepspeech_tpu.models.layers import Lookahead, TorchBatchNorm, hardtanh_0_20

__all__ = [
    "ConvBlock", "ConvStack", "build_cnn_model", "ConvFrontend",
    "DeepSpeech2", "RecurrentLayer", "conv_out_frames", "conv_out_lengths",
    "SUPPORTED", "build_model", "model_from_meta", "Lookahead",
    "TorchBatchNorm", "hardtanh_0_20",
]
