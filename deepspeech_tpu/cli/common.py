"""Shared inference-CLI plumbing: checkpoint -> (model, state, labels, conf)."""

from __future__ import annotations

import os


def enable_compile_cache():
    """Point XLA's persistent compilation cache at a user-level directory so
    repeat CLI invocations skip the (1-5 min on TPU) recompiles. Honors an
    explicit JAX_COMPILATION_CACHE_DIR; disable with
    JAX_COMPILATION_CACHE_DIR=""."""
    default = os.path.join(os.path.expanduser("~"), ".cache",
                           "deepspeech_tpu", "xla")
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR", default)
    if not path:
        return
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def load_inference_model(path: str):
    """Load a checkpoint package for inference (reference test.py:41-63,
    transcribe.py:76-82: model + labels + audio_conf all come from the file).

    Returns (model, state, labels, audio_conf, package) where ``state`` has
    .params/.batch_stats (enough for make_eval_step)."""
    from deepspeech_tpu.audio import AudioConf
    from deepspeech_tpu.models import model_from_meta
    from deepspeech_tpu.text.labels import Labels
    from deepspeech_tpu.train import checkpoint as ckpt

    package = ckpt.load(path)
    model = model_from_meta(package)
    labels = Labels(package["labels"])
    # augs zeroed at inference (reference test.py:60-63)
    conf_dict = {**package["audio_conf"], "noise_dir": None, "noise_prob": 0,
                 "aug_prob_8khz": 0, "aug_prob_spect": 0}
    audio_conf = AudioConf.from_dict(conf_dict)
    from deepspeech_tpu.train.step import InferenceState
    state = InferenceState(params=_to_jnp(package["params"]),
                           batch_stats=_to_jnp(package["batch_stats"]))
    return model, state, labels, audio_conf, package


def _to_jnp(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, tree)


def build_decoder(args, labels):
    """Greedy, host beam, or on-device beam per CLI flags
    (reference test.py:73-83; ``device_beam`` is TPU-native extra)."""
    if getattr(args, "decoder", "greedy") == "device_beam":
        from deepspeech_tpu.decoders import DeviceBeamCTCDecoder
        try:
            return DeviceBeamCTCDecoder(
                labels.labels, beam_width=args.beam_width,
                cutoff_top_n=args.cutoff_top_n, cutoff_prob=args.cutoff_prob,
                top_paths=args.top_paths, blank_index=labels.blank_index,
                lm_path=getattr(args, "lm_path", None),
                alpha=args.alpha, beta=args.beta)
        except ValueError as e:
            raise SystemExit(
                f"--decoder device_beam: {e}\n"
                "KenLM .binary files are host-only; use --decoder beam, or "
                "convert the textual ARPA to a DSLM file "
                "(python -m deepspeech_tpu.decoders.lm_binary) for the "
                "on-device LM-fused path.") from e
    if getattr(args, "decoder", "greedy") == "beam":
        from deepspeech_tpu.decoders import BeamCTCDecoder
        return BeamCTCDecoder(
            labels.labels, lm_path=args.lm_path, alpha=args.alpha,
            beta=args.beta, cutoff_top_n=args.cutoff_top_n,
            cutoff_prob=args.cutoff_prob, beam_width=args.beam_width,
            num_processes=args.lm_workers, top_paths=args.top_paths,
            blank_index=labels.blank_index,
            blank_collapse_threshold=getattr(args, "blank_collapse", 1.0))
    from deepspeech_tpu.decoders import GreedyDecoder
    return GreedyDecoder(labels.labels, blank_index=labels.blank_index)
