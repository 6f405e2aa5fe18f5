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
                           help="Number of LM processes to use")
    beam_args.add_argument("--blank-collapse", default=1.0, type=float,
                           help="Drop frames with p(blank) >= this before "
                                "beam search (arXiv:2210.17017); 1.0 = off")
    return parser


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
