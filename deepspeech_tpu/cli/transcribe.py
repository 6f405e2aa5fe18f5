"""Single-file transcription CLI (reference transcribe.py:17-105):
wav -> JSON transcript on stdout, with optional per-char frame offsets and
model/decoder metadata."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from deepspeech_tpu.cli.args import (add_decoder_args, add_inference_args,
                                     add_reference_noop_args,
                                     warn_reference_noop_args)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DeepSpeech-TPU transcription")
    add_inference_args(p)
    p.add_argument("--audio-path", default="audio.wav")
    p.add_argument("--offsets", action="store_true",
                   help="include per-character frame offsets")
    p.add_argument("--channel", default=-1, type=int,
                   help="stereo channel (0=left, 1=right, -1=average)")
    p.add_argument("--meta", action="store_true",
                   help="include model/decoder metadata")
    p.add_argument("--norm", default="max_frame")
    p.add_argument("--se-mode", default="running",
                   choices=["running", "two_pass", "error"],
                   help="squeeze-excitation handling for streamed CNN "
                        "stacks: 'running' = causal running-mean gate "
                        "(live approximation), 'two_pass' = provisional "
                        "fragments + an exact batch recompute at end of "
                        "stream (final JSON equals the batch model "
                        "exactly), 'error' = refuse SE stacks")
    p.add_argument("--chunk-seconds", default=0.0, type=float,
                   help="stream the audio through the low-latency chunked "
                        "runtime (unidirectional models only; greedy "
                        "decode), emitting text incrementally to stderr")
    add_decoder_args(p)
    add_reference_noop_args(p)
    return p


def transcribe(audio_path, audio_conf, model, state, decoder, norm="max_frame",
               channel=-1):
    """wav path -> (strings, offsets) (reference transcribe.py:63-71), with
    the STFT front-end on device."""
    import jax.numpy as jnp

    from deepspeech_tpu.audio.dsp import resample
    from deepspeech_tpu.audio.features import featurize_batch
    from deepspeech_tpu.audio.io import load_audio_norm
    from deepspeech_tpu.decoders import GreedyDecoder

    y, sr = load_audio_norm(audio_path, channel=channel)
    if sr != audio_conf.sample_rate:
        y = resample(y, sr, audio_conf.sample_rate)
    audio = jnp.asarray(y[None, :])
    lengths = jnp.asarray([len(y)])
    spect, spect_lengths = featurize_batch(audio, lengths, audio_conf, norm)
    logits, probs, out_lens = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        spect, spect_lengths, False)
    return decoder.decode(np.asarray(probs), np.asarray(out_lens))


def transcribe_streaming(audio_path, audio_conf, model, state, labels,
                         chunk_seconds, norm="max_frame", channel=-1,
                         echo=None, decoder="greedy", beam_width=16,
                         cutoff_top_n=40, cutoff_prob=1.0, top_paths=1,
                         lm_path=None, alpha=0.8, beta=1.0,
                         se_mode="running"):
    """Chunked low-latency path (serve/streaming.py): feeds the wav through
    the stateful streaming runtime in ``chunk_seconds`` pieces, reporting
    each incremental greedy fragment via ``echo`` (e.g. stderr) and
    returning the final transcript in the same (strings, offsets) shape as
    transcribe(). With ``decoder="beam"`` the streaming prefix beam search
    rides the same emission and the final transcript is the best beam
    (exactly equal to the one-shot device beam search)."""
    from deepspeech_tpu.audio.dsp import resample
    from deepspeech_tpu.audio.io import load_audio_norm
    from deepspeech_tpu.models.cnn import ConvStack
    from deepspeech_tpu.serve import CNNStreamingTranscriber, StreamingTranscriber

    y, sr = load_audio_norm(audio_path, channel=channel)
    if sr != audio_conf.sample_rate:
        y = resample(y, sr, audio_conf.sample_rate)
    if isinstance(model, ConvStack):
        # CNN family: chunked overlap-save (serve/streaming_cnn.py);
        # chunk must be a multiple of the stack's total stride
        from deepspeech_tpu.serve.streaming_cnn import conv_stack_geometry
        stride = conv_stack_geometry(model.blocks)[-1][0]
        cls = CNNStreamingTranscriber
    else:
        stride, cls = 2, StreamingTranscriber
    quantum = stride * 2 if stride % 2 else stride  # DS2 also needs even
    chunk_frames = max(
        4, quantum * max(1, round(chunk_seconds * audio_conf.sample_rate
                                  / audio_conf.hop / quantum)))
    extra = {"se_mode": se_mode} if cls is CNNStreamingTranscriber else {}
    st = cls(model,
                              {"params": state.params,
                               "batch_stats": state.batch_stats},
                              labels, audio_conf, normalize=norm,
                              **extra,
                              chunk_frames=chunk_frames,
                              decoder="beam" if decoder in ("beam", "device_beam")
                              else "greedy",
                              beam_width=beam_width,
                              cutoff_top_n=cutoff_top_n,
                              cutoff_prob=cutoff_prob,
                              lm_path=(lm_path if decoder in
                                       ("beam", "device_beam") else None),
                              lm_alpha=alpha, lm_beta=beta)
    step = chunk_frames * audio_conf.hop
    for pos in range(0, len(y), step):
        for frag in st.feed(y[pos:pos + step]):
            if frag and echo:
                echo(frag)
    for frag in st.finish():
        if frag and echo:
            echo(frag)
    if decoder in ("beam", "device_beam"):
        return [st.beam_texts(top_paths=top_paths)[0]], \
            [[np.zeros(0, np.int32)] * top_paths]
    return [[st.texts[0]]], [[np.zeros(0, np.int32)]]


def decode_results(decoded_output, decoded_offsets, args, package):
    """JSON assembly (reference transcribe.py:33-60)."""
    results = {"output": []}
    if args.meta:
        results["_meta"] = {
            "acoustic_model": {
                "name": os.path.basename(args.continue_from),
                **{k: package.get(k) for k in
                   ("version", "rnn_type", "hidden_size", "hidden_layers")},
            },
            "language_model": {
                "name": os.path.basename(args.lm_path) if args.lm_path else None,
            },
            "decoder": {
                "lm": args.lm_path is not None,
                "alpha": args.alpha if args.lm_path is not None else None,
                "beta": args.beta if args.lm_path is not None else None,
                "type": args.decoder,
            },
        }
    for b in range(len(decoded_output)):
        for pi in range(min(args.top_paths, len(decoded_output[b]))):
            result = {"transcription": decoded_output[b][pi]}
            if args.offsets:
                result["offsets"] = np.asarray(
                    decoded_offsets[b][pi]).tolist()
            results["output"].append(result)
    return results


def main(argv=None) -> int:
    from deepspeech_tpu.cli.common import enable_compile_cache
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    warn_reference_noop_args(args)

    from deepspeech_tpu.cli.common import build_decoder, load_inference_model

    model, state, labels, audio_conf, package = load_inference_model(
        args.continue_from)
    decoder = build_decoder(args, labels)

    if args.chunk_seconds > 0:
        import sys

        def echo(frag):
            print(frag, end="", file=sys.stderr, flush=True)

        decoded_output, decoded_offsets = transcribe_streaming(
            args.audio_path, audio_conf, model, state, labels,
            args.chunk_seconds, norm=args.norm, channel=args.channel,
            echo=echo, decoder=args.decoder, beam_width=args.beam_width,
            lm_path=getattr(args, "lm_path", None),
            alpha=getattr(args, "alpha", 0.8),
            beta=getattr(args, "beta", 1.0),
            cutoff_top_n=args.cutoff_top_n, cutoff_prob=args.cutoff_prob,
            top_paths=args.top_paths, se_mode=args.se_mode)
        print(file=sys.stderr)
    else:
        decoded_output, decoded_offsets = transcribe(
            args.audio_path, audio_conf, model, state, decoder, norm=args.norm,
            channel=args.channel)
    output = decode_results(decoded_output, decoded_offsets, args, package)
    output["input"] = {"channel": args.channel, "source": args.audio_path}
    output["model"] = {"model": args.continue_from}
    print(json.dumps(output, ensure_ascii=False))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
