"""Shared argparse groups (reference opts.py:1-24)."""

from __future__ import annotations

import argparse


def add_decoder_args(parser: argparse.ArgumentParser):
    beam_args = parser.add_argument_group("Beam Decode Options")
    beam_args.add_argument("--top-paths", default=1, type=int,
                           help="number of beams to return")
    beam_args.add_argument("--beam-width", default=10, type=int,
                           help="Beam width to use")
    beam_args.add_argument("--lm-path", default=None, type=str,
                           help="Path to an (optional) kenlm-format arpa/binary n-gram "
                                "language model for use with beam search")
    beam_args.add_argument("--alpha", default=0.8, type=float,
                           help="Language model weight")
    beam_args.add_argument("--beta", default=1, type=float,
                           help="Language model word bonus (all words)")
    beam_args.add_argument("--cutoff-top-n", default=40, type=int,
                           help="Keep only the top cutoff_top_n characters "
                                "by probability in beam search")
    beam_args.add_argument("--cutoff-prob", default=1.0, type=float,
                           help="Cumulative probability cutoff in beam search")
    beam_args.add_argument("--lm-workers", default=1, type=int,
                           help="Parallel beam-search workers over the "
                                "batch: threads for the native C++ backend "
                                "(its search call releases the GIL), "
                                "spawned processes for the pure-Python "
                                "backend; no effect on --decoder "
                                "device_beam (already batch-parallel on "
                                "device)")
    beam_args.add_argument("--blank-collapse", default=1.0, type=float,
                           help="Drop frames with p(blank) >= this before "
                                "beam search (arXiv:2210.17017); 1.0 = off")
    return parser


def add_reference_noop_args(parser: argparse.ArgumentParser):
    """Accept the reference's CUDA/DDP device flags as documented no-ops so
    reference command lines run unmodified (reference train.py:54, 99,
    104-107; test.py:30; opts.py:20).

    On TPU these have no meaning: device placement is jax's, data
    parallelism is the mesh's ``data`` axis (always on), and the
    distributed backend is jax.distributed over ICI/DCN.
    """
    g = parser.add_argument_group(
        "Reference compatibility (accepted, no effect on TPU)")
    g.add_argument("--cuda", action="store_true",
                   help="no-op: compute runs on the jax default backend "
                        "(TPU when available)")
    g.add_argument("--data-parallel", action="store_true",
                   help="no-op: data parallelism is the device mesh's "
                        "'data' axis and is always on")
    g.add_argument("--gpu-rank", default=None,
                   help="no-op: device placement is controlled by jax "
                        "(use --dist-rank for the process index)")
    g.add_argument("--dist-backend", default="gloo",
                   help="no-op: multi-host rendezvous uses jax.distributed "
                        "over ICI/DCN, not gloo/nccl")
    return parser


def warn_reference_noop_args(args, log=print):
    """One-line notice per reference no-op flag actually used."""
    notes = {
        "cuda": ("--cuda has no effect: compute runs on the jax default "
                 "backend (TPU when available)"),
        "data_parallel": ("--data-parallel has no effect: data parallelism "
                          "is the mesh's 'data' axis and is always on"),
    }
    for attr, msg in notes.items():
        if getattr(args, attr, False):
            log(f"note: {msg}")
    if getattr(args, "gpu_rank", None) is not None:
        log("note: --gpu-rank has no effect under jax device placement")
    if getattr(args, "dist_backend", "gloo") != "gloo":
        log(f"note: --dist-backend {args.dist_backend} has no effect: "
            "jax.distributed is the only backend")


def add_inference_args(parser: argparse.ArgumentParser):
    parser.add_argument("--decoder", default="greedy",
                        choices=["greedy", "beam", "device_beam"],
                        help="Decoder to use (device_beam = jit-compiled "
                             "on-accelerator beam search; with --lm-path "
                             "the n-gram LM is fused ON DEVICE too)")
    parser.add_argument("--continue-from", "--model-path",
                        dest="continue_from", required=True,
                        help="Path to model checkpoint")
    return parser
