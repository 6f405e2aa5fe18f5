from deepspeech_tpu.data.curriculum import Curriculum, CurriculumStore
from deepspeech_tpu.data.dataset import AudioDataset
from deepspeech_tpu.data.loader import (
    AudioDataLoader,
    BucketSpec,
    collate_batch,
    stack_microbatches,
)
from deepspeech_tpu.data.manifest import (
    create_manifest,
    merge_manifests,
    order_and_prune_files,
    read_manifest,
    write_manifest,
)
from deepspeech_tpu.data.sampler import BucketingSampler, DistributedBucketingSampler

__all__ = [
    "Curriculum", "CurriculumStore", "AudioDataset", "AudioDataLoader",
    "BucketSpec", "collate_batch", "stack_microbatches", "create_manifest", "merge_manifests",
    "order_and_prune_files", "read_manifest", "write_manifest",
    "BucketingSampler", "DistributedBucketingSampler",
]
