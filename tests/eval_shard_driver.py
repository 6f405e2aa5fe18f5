"""Subprocess driver for test_multihost sharded validation: evaluates a
manifest either single-process or as one rank of a multi-process group with
rank-strided shards + cross-host counter reduction, and prints one JSON line
with the summary and the utterance paths this rank actually scored.

Usage: python eval_shard_driver.py <manifest> <rank> <world> <port>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    manifest, rank, world, port = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]), int(sys.argv[4]))
    import jax

    if world > 1:
        jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                                   num_processes=world, process_id=rank)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from deepspeech_tpu.audio import AudioConf
    from deepspeech_tpu.data import (AudioDataLoader, AudioDataset,
                                     BucketingSampler, BucketSpec,
                                     DistributedBucketingSampler)
    from deepspeech_tpu.decoders import GreedyDecoder
    from deepspeech_tpu.models import DeepSpeech2
    from deepspeech_tpu.parallel import (batch_sharding,
                                         equalize_batch_padding,
                                         local_batch_to_global, make_mesh,
                                         metrics_to_local)
    from deepspeech_tpu.text.labels import Labels, load_labels
    from deepspeech_tpu.train import (StepConfig, TrainState, build_optimizer,
                                      make_eval_step)
    from deepspeech_tpu.train.evaluate import evaluate

    labels = Labels(load_labels(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "labels.json")))
    conf = AudioConf()
    dataset = AudioDataset(conf, manifest, labels, normalize="max_frame")
    if world > 1:
        sampler = DistributedBucketingSampler(len(dataset), 2,
                                              num_replicas=world, rank=rank)
    else:
        sampler = BucketingSampler(len(dataset), 2)
    loader = AudioDataLoader(dataset, sampler, 2, BucketSpec(), num_workers=0)

    seen_paths = []
    for batch in loader:
        seen_paths += [p for p, v in zip(batch["paths"], batch["valid"])
                       if v > 0]

    model = DeepSpeech2(num_classes=len(labels.labels), hidden_size=16,
                        hidden_layers=1, cell="gru", bidirectional=True)
    tx = build_optimizer("sgd", lr=3e-4, momentum=0.9, max_norm=100.0)
    variables = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 161, 51)),
                           jnp.asarray([51]), False)
    state = TrainState.create(variables, tx)

    mesh = make_mesh(data=len(jax.devices()), model=1) if world > 1 else None
    step = make_eval_step(model, StepConfig(audio_conf=conf))

    def eval_step(s, batch):
        if world > 1:
            batch = local_batch_to_global(equalize_batch_padding(batch), mesh)
            return metrics_to_local(step(s, batch), mesh)
        return step(s, batch)

    decoder = GreedyDecoder(labels.labels)
    summary = evaluate(loader, eval_step, state, decoder, labels,
                       all_reduce=world > 1)
    print("RESULT " + json.dumps({"rank": rank, "summary": summary,
                                  "paths": sorted(seen_paths)}), flush=True)


if __name__ == "__main__":
    main()
