"""Model zoo factory keyed by the reference's ``rnn_type`` strings.

The reference picks the architecture from ``supported_rnns`` keys
(reference model.py:13-24): rnn|gru|lstm (DS2), cnn (wav2letter), cnn_residual,
glu_small, glu_large, large_cnn, cnn_jasper. ``build_model`` maps the same
keys to flax modules and returns (module, meta) where ``meta`` is the
self-description embedded into checkpoints (reference model.py:426-450) —
``model_from_meta`` rebuilds the module from it at load time
(reference load_model_package, model.py:411-424).
"""

from __future__ import annotations

from deepspeech_tpu.models.ds2 import DeepSpeech2, conv_out_lengths

RNN_KEYS = ("rnn", "gru", "lstm")
CNN_KEYS = ("cnn", "cnn_residual", "glu_small", "glu_large", "large_cnn",
            "cnn_jasper")
SUPPORTED = RNN_KEYS + CNN_KEYS


def build_model(rnn_type: str = "gru", num_classes: int = 29,
                hidden_size: int = 800, hidden_layers: int = 6,
                bidirectional: bool = True, bnm: float = 0.1,
                cnn_width: int = 256, dropout: float = 0.0,
                context: int = 20, sample_rate: int = 16000,
                window_size: float = 0.02, compute_dtype=None):
    """-> (flax module, meta dict for checkpoints).

    ``compute_dtype``: matmul operand precision ("bfloat16" or jnp.bfloat16
    for the MXU fast path; None = float32). A runtime choice — excluded from
    checkpoint meta, the weights themselves are always float32."""
    import jax.numpy as jnp

    if isinstance(compute_dtype, str):
        compute_dtype = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
                         "float32": None, "f32": None}[compute_dtype]
    rnn_type = rnn_type.lower()
    meta = {
        "rnn_type": rnn_type, "num_classes": num_classes,
        "hidden_size": hidden_size, "hidden_layers": hidden_layers,
        "bidirectional": bidirectional, "bnm": bnm, "cnn_width": cnn_width,
        "dropout": dropout, "context": context,
    }
    if rnn_type in RNN_KEYS:
        model = DeepSpeech2(
            num_classes=num_classes, hidden_size=hidden_size,
            hidden_layers=hidden_layers, cell=rnn_type,
            bidirectional=bidirectional, context=context, bnm=bnm,
            sample_rate=sample_rate, window_size=window_size,
            compute_dtype=compute_dtype)
        return model, meta
    if rnn_type in CNN_KEYS:
        from deepspeech_tpu.models import cnn as _cnn
        model = _cnn.build_cnn_model(
            rnn_type, num_classes=num_classes, cnn_width=cnn_width,
            hidden_size=hidden_size, hidden_layers=hidden_layers,
            dropout=dropout, bnm=bnm,
            # the reference overloads bidirectional=False to mean "use GLU"
            # for the cnn variant (model.py:228 'not_glu': _bidirectional)
            use_glu=not bidirectional)
        return model, meta
    if rnn_type == "glu_flexible":
        # explicit parity with the reference (model.py:309-310)
        raise NotImplementedError("glu_flexible is not implemented")
    raise ValueError(
        f"unsupported rnn_type {rnn_type!r}; choose from {SUPPORTED}")


def model_from_meta(meta: dict):
    """Rebuild the module from a checkpoint's meta fields."""
    kw = {k: meta[k] for k in
          ("rnn_type", "num_classes", "hidden_size", "hidden_layers",
           "bidirectional", "bnm", "cnn_width", "dropout", "context")
          if k in meta}
    return build_model(**kw)[0]
