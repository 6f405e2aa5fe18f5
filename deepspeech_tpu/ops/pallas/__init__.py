"""Pallas TPU kernels for the hot ops (SURVEY.md §7 step 9).

Each kernel sits behind the same API as its XLA lowering and is selected by
an ``impl=`` switch (default ``"auto"``: Pallas on TPU when supported,
XLA everywhere else).
"""

from deepspeech_tpu.ops.pallas.rnn_fused import (
    bigru_layer_pallas, bilstm_layer_pallas, fused_layer_fits,
    gru_layer_pallas, lstm_layer_pallas)
from deepspeech_tpu.ops.pallas.rnn_kernel import (
    bigru_scan_pallas, bilstm_scan_pallas, gru_scan_pallas,
    lstm_scan_pallas, pallas_supported)

__all__ = ["bigru_layer_pallas", "bigru_scan_pallas", "bilstm_layer_pallas",
           "bilstm_scan_pallas", "fused_layer_fits", "gru_layer_pallas",
           "gru_scan_pallas", "lstm_layer_pallas", "lstm_scan_pallas",
           "pallas_supported"]
