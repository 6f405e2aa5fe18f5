"""Batch evaluation CLI (reference test.py:16-214).

Loads a checkpoint (model + labels + front-end config all self-described),
runs a manifest through the jitted eval step, decodes greedy or beam,
prints per-utterance triage (--verbose/--errors/--best), writes a CSV
report and optional per-utterance logit dumps, and prints both summary
averaging modes (reference test.py:197-209).
"""

from __future__ import annotations

import argparse
import csv
import os
import pickle

import numpy as np

from deepspeech_tpu.cli.args import (add_decoder_args, add_inference_args,
                                     add_reference_noop_args,
                                     warn_reference_noop_args)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DeepSpeech-TPU evaluation")
    add_inference_args(p)
    p.add_argument("--test-manifest", default="data/test_manifest.csv")
    p.add_argument("--cache-dir", default="data/cache/",
                   help="accepted for flag parity; the reference's npy "
                        "spectrogram cache is disabled there too "
                        "(data_loader_aug.py:140-161)")
    p.add_argument("--batch-size", default=20, type=int)
    p.add_argument("--num-workers", default=4, type=int)
    p.add_argument("--verbose", action="store_true",
                   help="print decoded output and error of each sample")
    p.add_argument("--errors", action="store_true",
                   help="print samples with CER > 50%")
    p.add_argument("--best", action="store_true",
                   help="print samples with CER < 15%")
    p.add_argument("--norm", default="max_frame")
    p.add_argument("--report-file", default=None,
                   help="write a per-utterance CSV report to this path "
                        "(off by default so eval runs never dirty the tree)")
    p.add_argument("--output-path", default=None, type=str,
                   help="dump per-utterance logits/probs pickles next to wavs")
    p.add_argument("--max-items", default=0, type=int)
    add_decoder_args(p)
    add_reference_noop_args(p)
    return p


def main(argv=None) -> int:
    from deepspeech_tpu.cli.common import enable_compile_cache
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    warn_reference_noop_args(args)

    import jax

    from deepspeech_tpu.cli.common import build_decoder, load_inference_model
    from deepspeech_tpu.data import (AudioDataLoader, AudioDataset,
                                     BucketingSampler)
    from deepspeech_tpu.decoders import GreedyDecoder
    from deepspeech_tpu.metrics import get_cer_wer
    from deepspeech_tpu.train import StepConfig, make_eval_step

    model, state, labels, audio_conf, package = load_inference_model(
        args.continue_from)
    decoder = build_decoder(args, labels)
    target_decoder = GreedyDecoder(labels.labels,
                                   blank_index=labels.blank_index)

    # Multi-chip eval: shard every batch over the mesh's data axis. The
    # eval step AND the on-device beam search both vmap over the batch, so
    # sharded inputs make XLA run model forward + decode batch-parallel
    # across all chips (the DP half of the reference's test.py:101-120
    # batch eval, which torch never parallelized beyond one GPU).
    from deepspeech_tpu.decoders import DeviceBeamCTCDecoder
    from deepspeech_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                              replicated)
    n_dev = len(jax.devices())
    mesh = (make_mesh(data=n_dev, model=1)
            if n_dev > 1 and args.batch_size % n_dev == 0 else None)
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))
        if (isinstance(decoder, DeviceBeamCTCDecoder)
                and decoder.lm is not None):
            # host decoders carry host LM objects — only the device LM's
            # array pytree belongs on the mesh
            decoder.lm = jax.device_put(decoder.lm, replicated(mesh))

    dataset = AudioDataset(audio_conf, args.test_manifest, labels,
                           normalize=args.norm,
                           max_items=args.max_items or None)
    sampler = BucketingSampler(len(dataset), args.batch_size)
    loader = AudioDataLoader(dataset, sampler, args.batch_size,
                             num_workers=args.num_workers)
    eval_step = make_eval_step(
        model, StepConfig(audio_conf=audio_conf, normalize=args.norm))

    need_probs = bool(args.output_path) or not isinstance(
        decoder, (GreedyDecoder, DeviceBeamCTCDecoder))
    report_rows = []
    total_wer = total_cer = total_wer_ref = total_cer_ref = 0.0
    utt_wer_sum = utt_cer_sum = 0.0
    n_utts = 0
    processed_files = []

    def process(metrics, batch, paths):
        nonlocal total_wer, total_cer, total_wer_ref, total_cer_ref
        nonlocal utt_wer_sum, utt_cer_sum, n_utts
        logits_greedy = np.asarray(metrics["greedy"])
        out_lens = np.asarray(metrics["out_lens"])
        targets = np.asarray(batch["targets"])
        target_lengths = np.asarray(batch["target_lengths"])
        valid = np.asarray(batch["valid"])
        # the full (B, T, C) posterior tensor comes to host ONLY when a
        # consumer needs it (host beam decode or --output-path dumps) — the
        # greedy/device_beam paths otherwise pay a pointless D2H copy of
        # the largest array every batch (same flag gates the async
        # prefetch below)
        probs = np.asarray(metrics["probs"]) if need_probs else None

        if isinstance(decoder, GreedyDecoder):
            decoded, _ = decoder.decode_ids(logits_greedy, out_lens)
        elif isinstance(decoder, DeviceBeamCTCDecoder):
            # keep the posteriors on the mesh: the compiled search runs
            # where the eval step left them (sharded decode on >1 device)
            decoded, _ = decoder.decode(metrics["probs"],
                                        metrics["out_lens"])
        else:
            decoded, _ = decoder.decode(probs, out_lens)

        for x in range(len(paths)):
            if valid[x] <= 0:
                continue
            transcript = decoded[x][0]
            reference = labels.render_transcript(
                targets[x, : int(target_lengths[x])])
            # decode-time truncation guard (reference test.py:129)
            w, c, wr, cr = get_cer_wer(transcript[:2000], reference[:2000])
            total_wer += w
            total_cer += c
            total_wer_ref += wr
            total_cer_ref += cr
            utt_wer_sum += w / wr
            utt_cer_sum += c / cr
            n_utts += 1

            if args.output_path:
                with open(paths[x] + ".ts", "wb") as f:
                    pickle.dump({
                        "probs": probs[x, : out_lens[x]],
                        "len": int(out_lens[x]),
                        "transcript": transcript,
                        "reference": reference,
                        "filename": paths[x],
                        "wer": w / wr, "cer": c / cr,
                    }, f, protocol=4)
                processed_files.append(paths[x] + ".ts")

            show = (args.verbose
                    or (args.errors and c / cr > 0.5 and transcript.strip())
                    or (args.best and c / cr < 0.15))
            if show:
                print("Ref:", reference)
                print("Hyp:", transcript)
                print("Wav:", paths[x])
                print(f"WER: {100 * w / wr:.2f} CER: {100 * c / cr:.2f}\n")

            report_rows.append([paths[x], reference, transcript,
                                round(100 * c / cr, 2), round(100 * w / wr, 2)])

    # pipelined eval: batch N+1's H2D transfer is started as soon as step N
    # is dispatched (jax.device_put is async) and batch N's host-side decode
    # happens only after step N+1 is in flight — the device never idles on
    # the host and the host link never blocks a dispatch
    batches = iter(loader)

    def pull():
        b = next(batches, None)
        if b is None:
            return None
        paths = b.pop("paths")
        sh = batch_sharding(mesh) if mesh is not None else None
        put = ((lambda v: jax.device_put(v, sh)) if sh is not None
               else jax.device_put)
        return b, {k: put(v) for k, v in b.items()}, paths

    pending = None
    nxt = pull()
    while nxt is not None:
        batch, dev_batch, paths = nxt
        metrics = eval_step(state, dev_batch)
        nxt = pull()
        for kk, v in metrics.items():
            if kk == "probs" and not need_probs:
                continue  # nothing reads it on host: skip the biggest copy
            if hasattr(v, "copy_to_host_async"):
                v.copy_to_host_async()
        if pending is not None:
            process(*pending)
        pending = (metrics, batch, paths)
    if pending is not None:
        process(*pending)

    if args.report_file:
        os.makedirs(os.path.dirname(os.path.abspath(args.report_file)),
                    exist_ok=True)
        with open(args.report_file, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["wav", "text", "transcript", "CER", "WER"])
            writer.writerows(report_rows)

    if args.output_path:
        with open(args.output_path, "wb") as f:
            pickle.dump(processed_files, f, protocol=4)

    # both averaging modes (reference test.py:197-209)
    wer_avg = 100.0 * total_wer / max(total_wer_ref, 1.0)
    cer_avg = 100.0 * total_cer / max(total_cer_ref, 1.0)
    print("Summary (token-weighted)    "
          f"WER {wer_avg:.3f}  CER {cer_avg:.3f}")
    print("Summary (per-utt averaged)  "
          f"WER {100.0 * utt_wer_sum / max(n_utts, 1):.3f}  "
          f"CER {100.0 * utt_cer_sum / max(n_utts, 1):.3f}  "
          f"({n_utts} utterances)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
