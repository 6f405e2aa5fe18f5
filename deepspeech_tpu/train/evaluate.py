"""Shared evaluation loop: model quality over a manifest loader.

The reference's check_model_quality (train.py:329-431) and test.py summary
math (test.py:197-209): per-utterance WER/CER via get_cer_wer, aggregated
two ways — token-weighted (sum of distances / sum of reference lengths) and
per-utterance-averaged. Also feeds the curriculum store when a train-val
dataset is being scored (reference train.py:376-381).
"""

from __future__ import annotations

import numpy as np

from deepspeech_tpu.metrics import get_cer_wer
from deepspeech_tpu.utils.meters import AverageMeter


def decode_batch_greedy(decoder, metrics: dict, batch: dict, labels):
    """Greedy ids (already argmaxed on device) -> list of per-utterance
    (transcript, reference, wer, cer, wer_ref, cer_ref)."""
    greedy = np.asarray(metrics["greedy"])
    out_lens = np.asarray(metrics["out_lens"])
    targets = np.asarray(batch["targets"])
    target_lengths = np.asarray(batch["target_lengths"])
    valid = np.asarray(batch.get("valid", np.ones(len(greedy))))
    hyps, _ = decoder.decode_ids(greedy, out_lens)
    results = []
    for i in range(len(greedy)):
        if valid[i] <= 0:
            continue
        transcript = hyps[i][0]
        reference = labels.render_transcript(
            targets[i, : int(target_lengths[i])])
        w, c, wr, cr = get_cer_wer(transcript, reference)
        results.append((transcript, reference, w, c, wr, cr))
    return results


def evaluate(loader, eval_step, state, decoder, labels,
             dataset=None, update_curriculum: bool = False,
             progress=None, all_reduce: bool = False, to_device=None):
    """Run the eval loop. Returns a summary dict with both averaging modes
    (reference test.py:197-209) and the mean loss (train.py:400).

    ``all_reduce``: multi-host sharded evaluation — each process scores its
    own disjoint manifest shard (DistributedBucketingSampler) and the raw
    WER/CER/loss counters are summed across processes before the ratios are
    taken, so every host reports the global summary. The reference instead
    evaluated the full val set on every rank (its check_model_quality has no
    distributed sampler, train.py:425-429) — world x duplicated compute.

    ``to_device``: optional host->device transfer fn. When given, batch
    N+1's (async) transfer is started right after batch N's step is
    dispatched, so the copy rides alongside device compute instead of
    blocking the next dispatch — on a transport-limited host link this is
    the difference between sum(transfer, compute) and max(transfer,
    compute) per batch."""
    loss_meter = AverageMeter()
    total_wer = total_cer = total_wer_ref = total_cer_ref = 0.0
    utt_wer = AverageMeter()
    utt_cer = AverageMeter()
    n_utts = 0

    def account(metrics, batch, paths):
        nonlocal total_wer, total_cer, total_wer_ref, total_cer_ref, n_utts
        n_valid = int(np.asarray(batch.get(
            "valid", np.ones(len(batch["targets"])))).sum())
        loss = float(metrics["loss"])
        if not np.isfinite(loss):
            loss = 1000.0  # reporting clamp (reference train.py:359-362)
        loss_meter.update(loss, n_valid)
        results = decode_batch_greedy(decoder, metrics, batch, labels)
        for i, (transcript, reference, w, c, wr, cr) in enumerate(results):
            total_wer += w
            total_cer += c
            total_wer_ref += wr
            total_cer_ref += cr
            utt_wer.update(w / wr)
            utt_cer.update(c / cr)
            n_utts += 1
            if update_curriculum and dataset is not None and paths:
                dataset.update_curriculum(paths[i], reference, transcript,
                                          None, c / cr, w / wr)
        if progress:
            progress(n_utts)

    # double-buffered like the train loop: batch N's host decode overlaps
    # batch N+1's device step (the readback inside account() waits on a
    # step that is already complete), and batch N+1's H2D transfer is
    # started before batch N's results are read back
    batches = iter(loader)

    def pull():
        b = next(batches, None)
        if b is None:
            return None
        paths = b.pop("paths", None)
        return b, (to_device(b) if to_device is not None else b), paths

    pending = None
    nxt = pull()
    while nxt is not None:
        batch, dev_batch, paths = nxt
        metrics = eval_step(state, dev_batch)
        nxt = pull()  # batch N+1's transfer overlaps batch N's compute
        for v in metrics.values():
            if hasattr(v, "copy_to_host_async"):
                try:
                    v.copy_to_host_async()
                except Exception:
                    pass  # multi-host shards fetch via metrics_to_local
        if pending is not None:
            account(*pending)
        pending = (metrics, batch, paths)
    if pending is not None:
        account(*pending)

    loss_sum, loss_count = loss_meter.sum, loss_meter.count
    uw_sum, uc_sum = utt_wer.sum, utt_cer.sum
    if all_reduce:
        from jax.experimental import multihost_utils

        counters = np.array([total_wer, total_cer, total_wer_ref,
                             total_cer_ref, loss_sum, loss_count,
                             uw_sum, uc_sum, n_utts], np.float64)
        counters = np.asarray(
            multihost_utils.process_allgather(counters),
            np.float64).sum(axis=0)
        (total_wer, total_cer, total_wer_ref, total_cer_ref, loss_sum,
         loss_count, uw_sum, uc_sum, n_utts) = (float(c) for c in counters)
        n_utts = int(n_utts)

    return {
        "loss": loss_sum / max(loss_count, 1),
        "wer": 100.0 * total_wer / max(total_wer_ref, 1.0),
        "cer": 100.0 * total_cer / max(total_cer_ref, 1.0),
        "utt_wer": 100.0 * uw_sum / max(n_utts, 1),
        "utt_cer": 100.0 * uc_sum / max(n_utts, 1),
        "num_utterances": n_utts,
    }
