"""Training CLI: the reference ``python train.py`` surface (train.py:27-107)
re-architected TPU-first.

One jitted SPMD program per length bucket executes the whole batch body
(featurize -> forward -> CTC -> backward -> clip -> guarded update) on
device; the host loop only feeds bucketed batches, decodes greedy ids for
curriculum/metrics, anneals the LR, and writes checkpoints. Multi-device =
mesh data parallelism (no DDP processes); multi-host = per-host manifest
shards assembled with jax.make_array_from_process_local_data.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DeepSpeech-TPU training")
    # data
    p.add_argument("--train-manifest", default="data/train_manifest.csv")
    p.add_argument("--val-manifest", default="data/val_manifest.csv")
    p.add_argument("--train-val-manifest", default="",
                   help="held-out slice of train data for quality tracking")
    p.add_argument("--cache-dir", default="data/cache/",
                   help="accepted for flag parity; the reference's npy "
                        "spectrogram cache is disabled there too "
                        "(data_loader_aug.py:140-161)")
    p.add_argument("--curriculum", default="", help="path to curriculum csv")
    p.add_argument("--use-curriculum", action="store_true", default=False)
    p.add_argument("--curriculum-ratio", default=0.5, type=float)
    p.add_argument("--sample-rate", default=16000, type=int)
    p.add_argument("--batch-size", default=20, type=int)
    p.add_argument("--val-batch-size", default=20, type=int)
    p.add_argument("--num-workers", default=4, type=int)
    p.add_argument("--labels-path", default="labels.json")
    p.add_argument("--window-size", default=0.02, type=float)
    p.add_argument("--window-stride", default=0.01, type=float)
    p.add_argument("--window", default="hamming")
    p.add_argument("--norm", default="max_frame",
                   help='normalization: "mean","norm","frame","max_frame","none"')
    # model
    p.add_argument("--hidden-size", default=800, type=int)
    p.add_argument("--hidden-layers", default=6, type=int)
    p.add_argument("--rnn-type", default="gru",
                   help="rnn|gru|lstm|cnn|cnn_residual|glu_small|glu_large|"
                        "large_cnn|cnn_jasper")
    p.add_argument("--cnn-width", default=256, type=int)
    p.add_argument("--dropout", default=0, type=float)
    p.add_argument("--no-bidirectional", dest="bidirectional",
                   action="store_false", default=True)
    p.add_argument("--batch-norm-momentum", default=0.1, type=float)
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="matmul operand precision (weights stay float32)")
    # optimization
    p.add_argument("--epochs", default=70, type=int)
    p.add_argument("--lr", "--learning-rate", default=3e-4, type=float)
    p.add_argument("--optimizer", default="sgd", help="sgd or adam")
    p.add_argument("--weight-decay", default=0, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--max-norm", default=100, type=float,
                   help="gradient norm clip")
    p.add_argument("--learning-anneal", default=1.1, type=float)
    p.add_argument("--checkpoint-anneal", default=1.0, type=float)
    p.add_argument("--silent", action="store_true")
    # checkpointing
    p.add_argument("--checkpoint", action="store_true",
                   help="save a checkpoint every epoch")
    p.add_argument("--checkpoint-per-samples", default=0, type=int)
    p.add_argument("--save-folder", default="models/")
    p.add_argument("--continue-from", default="")
    p.add_argument("--finetune", action="store_true")
    # augmentation
    p.add_argument("--augment", action="store_true")
    p.add_argument("--noise-dir", default=None)
    p.add_argument("--noise-prob", default=0.4, type=float)
    p.add_argument("--noise-min", default=0.0, type=float)
    p.add_argument("--noise-max", default=0.5, type=float)
    p.add_argument("--device-noise", action="store_true",
                   help="mix the --noise-dir pool (+ gaussian) into the "
                        "waveforms INSIDE the compiled train step "
                        "(augment/noise_device.py, AddNoise semantics at "
                        "--noise-prob). Pair with --aug-type 1/2 or "
                        "aug-prob 0 to avoid host-side noise on top")
    p.add_argument("--device-noise-limit", default=0.2, type=float,
                   help="on-device mix strength a ~ U(0, limit) "
                        "(reference audio_aug.py:82 limit)")
    p.add_argument("--aug-prob-8khz", default=0, type=float)
    p.add_argument("--aug-type", default=0, type=int, choices=[0, 1, 2, 3],
                   help="waveform aug pipeline: 0=all five transforms, "
                        "1=shift only, 2=speed+pitch, 3=noise+distort "
                        "(reference data_loader_aug.py:367-412; hardcoded 0 "
                        "there)")
    p.add_argument("--aug-prob-spect", default=0, type=float)
    # sampling
    p.add_argument("--no-shuffle", action="store_true")
    p.add_argument("--no-sortaGrad", dest="no_sorta_grad",
                   action="store_true")
    p.add_argument("--reverse-sort", dest="reverse_sort", action="store_true",
                   help="process longest utterances first on the SortaGrad "
                        "epoch (max-memory smoke test, reference "
                        "train.py:93-94)")
    # observability
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--visdom", dest="live_html", action="store_true",
                   help="live loss/WER/CER curves like the reference's "
                        "visdom windows (train.py:155-314), rendered to a "
                        "self-refreshing <log-dir>/<id>.html dashboard "
                        "(utils/liveplot.py) — no server needed; the JSONL "
                        "event log records everything either way")
    p.add_argument("--enorm", action="store_true",
                   help="accepted for reference-flag parity; the reference's "
                        "enorm import is commented out there too "
                        "(train.py:9, 68) — no-op")
    p.add_argument("--log-dir", default="visualize/deepspeech_final")
    p.add_argument("--log-params", action="store_true")
    p.add_argument("--id", default="Deepspeech training")
    p.add_argument("--seed", default=123456, type=int)
    p.add_argument("--profile-dir", default="",
                   help="write a jax.profiler trace (XLA/TPU timeline, "
                        "viewable in TensorBoard/Perfetto) to this dir")
    p.add_argument("--profile-start", default=10, type=int,
                   help="global step to start the profiler trace at "
                        "(skips compile + warmup steps)")
    p.add_argument("--profile-steps", default=5, type=int,
                   help="number of steps to trace")
    # device/bucketing
    p.add_argument("--mesh-model", default=1, type=int,
                   help="tensor-parallel (model) mesh axis size: shards the "
                        "RNN gate matrices, classifier head, and their "
                        "optimizer moments over this many chips via ICI "
                        "(BASELINE north star; capability beyond the "
                        "reference's DP-only train.py:948-951). devices = "
                        "data_axis x mesh_model")
    p.add_argument("--bucket-audio-seconds", default=1.0, type=float,
                   help="audio padding granularity (static XLA shapes)")
    p.add_argument("--steps-per-dispatch", default=1, type=int,
                   help="run k optimizer steps per device dispatch: k "
                        "prefetched microbatches are stacked host-side and "
                        "driven through one jitted lax.scan, amortizing the "
                        "host round trip k-fold (the TPU-idiomatic answer "
                        "to the reference's per-batch host sync, "
                        "train.py:575-591). Numerics match k=1 exactly; "
                        "curriculum/metric feedback is at most k steps "
                        "stale and --checkpoint-per-samples boundaries "
                        "resolve to k-step granularity")
    p.add_argument("--wire-dtype", default="int16",
                   choices=["int16", "float32", "mulaw8"],
                   help="host->device waveform wire format; int16 halves "
                        "transfer bytes, mulaw8 (G.711 companding, ~38 dB "
                        "SNR, lossy opt-in) quarters them "
                        "(source wavs are int16 PCM; "
                        "quantization is ~90 dB below signal)")
    p.add_argument("--max-items", default=0, type=int,
                   help="truncate manifests (debug)")
    # multi-host (reference --dist-url/--rank/--world-size, train.py:97-103;
    # on TPU pods with a metadata service, omit all three — jax
    # auto-discovers the topology)
    p.add_argument("--dist-url", default="",
                   help="coordinator address host:port for multi-host "
                        "training (jax.distributed rendezvous; a reference "
                        "style tcp://host:port is accepted, the scheme is "
                        "stripped)")
    p.add_argument("--dist-rank", "--rank", dest="dist_rank",
                   default=-1, type=int,
                   help="this process's index (with --dist-url; --rank is "
                        "the reference spelling, train.py:102)")
    p.add_argument("--dist-world-size", "--world-size",
                   dest="dist_world_size", default=0, type=int,
                   help="total number of processes (with --dist-url; "
                        "--world-size is the reference spelling, "
                        "train.py:100)")
    p.add_argument("--dist-init", action="store_true",
                   help="call jax.distributed.initialize() with "
                        "auto-discovery (TPU pod environments)")
    from deepspeech_tpu.cli.args import add_reference_noop_args
    add_reference_noop_args(p)
    return p


def audio_conf_from_args(args, train: bool):
    from deepspeech_tpu.audio import AudioConf
    return AudioConf(
        sample_rate=args.sample_rate, window_size=args.window_size,
        window_stride=args.window_stride, window=args.window,
        noise_dir=args.noise_dir if train else None,
        noise_prob=args.noise_prob if train else 0,
        noise_levels=(args.noise_min, args.noise_max),
        aug_prob_8khz=args.aug_prob_8khz if train else 0,
        aug_prob_spect=args.aug_prob_spect if train else 0)


def main(argv=None, observers=()) -> int:
    """Run training. ``observers`` is an optional iterable of
    ``deepspeech_tpu.utils.Observer`` instances whose event hooks fire at
    epoch/batch/checkpoint boundaries — the extension point the reference
    sketched but never wired (reference observer.py:8-22)."""
    args = build_parser().parse_args(argv)
    from deepspeech_tpu.cli.args import warn_reference_noop_args
    warn_reference_noop_args(args)

    import jax

    # Multi-host rendezvous BEFORE any other jax use (replaces the
    # reference's dist.init_process_group TCP rendezvous, train.py:804-809).
    if args.dist_url:
        # accept the reference's tcp://host:port spelling (train.py:97)
        coord = args.dist_url.split("://", 1)[-1]
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=args.dist_world_size,
                                   process_id=args.dist_rank)
    elif args.dist_init:
        jax.distributed.initialize()

    import jax.numpy as jnp
    from deepspeech_tpu.cli.common import enable_compile_cache
    enable_compile_cache()

    from deepspeech_tpu.audio import AudioConf
    from deepspeech_tpu.data import (AudioDataLoader, AudioDataset,
                                     BucketingSampler, BucketSpec,
                                     DistributedBucketingSampler,
                                     stack_microbatches)
    from deepspeech_tpu.decoders import GreedyDecoder
    from deepspeech_tpu.models import build_model
    from deepspeech_tpu.parallel import (batch_sharding,
                                         equalize_batch_padding,
                                         local_batch_to_global, make_mesh,
                                         metrics_to_local, replicated,
                                         shard_state,
                                         stacked_batch_sharding)
    from deepspeech_tpu.text.labels import Labels, load_labels
    from deepspeech_tpu.train import (StepConfig, TrainState, build_optimizer,
                                      get_lr, make_eval_step,
                                      make_multi_train_step, make_train_step,
                                      set_lr)
    from deepspeech_tpu.train import checkpoint as ckpt
    from deepspeech_tpu.train.evaluate import decode_batch_greedy, evaluate
    from deepspeech_tpu.utils import (AverageMeter, MetricsLogger,
                                      ObserverList, StopWatch)

    is_leader = jax.process_index() == 0
    world = jax.process_count()

    def say(*a):
        if is_leader and not args.silent:
            print(*a, flush=True)

    # -- config / resume ------------------------------------------------------
    package = None
    if args.continue_from:
        package = ckpt.load(args.continue_from)
        labels_str = package["labels"]
        audio_conf = AudioConf.from_dict(package["audio_conf"])
        say(f"Resuming from {args.continue_from} "
            f"(epoch {package.get('epoch', 0)})")
    else:
        labels_path = args.labels_path
        if labels_path == "labels.json" and not os.path.exists(labels_path):
            # default is cwd-relative (reference flag parity); when run
            # from elsewhere, fall back to the copy shipped at repo root
            shipped = os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), "labels.json")
            if os.path.exists(shipped):
                labels_path = shipped
        labels_str = load_labels(labels_path)
        audio_conf = audio_conf_from_args(args, train=True)
    labels = Labels(labels_str)
    # augs zeroed for eval datasets (reference train.py:912-915)
    test_conf = AudioConf.from_dict({**audio_conf.to_dict(), "noise_dir": None,
                                     "noise_prob": 0, "aug_prob_8khz": 0,
                                     "aug_prob_spect": 0})

    if package is not None:
        meta = {k: package[k] for k in
                ("rnn_type", "num_classes", "hidden_size", "hidden_layers",
                 "bidirectional", "bnm", "cnn_width", "dropout", "context")
                if k in package}
        model, _ = build_model(**meta, compute_dtype=args.compute_dtype)
    else:
        model, meta = build_model(
            rnn_type=args.rnn_type, num_classes=len(labels.labels),
            hidden_size=args.hidden_size, hidden_layers=args.hidden_layers,
            bidirectional=args.bidirectional, bnm=args.batch_norm_momentum,
            cnn_width=args.cnn_width, dropout=args.dropout,
            sample_rate=audio_conf.sample_rate,
            window_size=audio_conf.window_size,
            compute_dtype=args.compute_dtype)

    tx = build_optimizer(args.optimizer, lr=args.lr, momentum=args.momentum,
                         weight_decay=args.weight_decay,
                         max_norm=args.max_norm)

    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.zeros((1, 161, 51)), jnp.asarray([51]), False)
    state = TrainState.create(variables, tx)
    start_epoch = start_iter = checkpoint_id = 0
    best_quality = None
    if package is not None:
        if args.finetune:
            state = ckpt.restore_params_only(package, state)
        else:
            state = ckpt.restore_state(package, state)
            start_epoch = max(package.get("epoch", 1) - 1, 0)
            start_iter = package.get("iteration") or 0
            checkpoint_id = package.get("checkpoint") or 0
            if start_iter == 0 and package.get("epoch") is not None:
                # epoch-boundary checkpoint (final/epoch/best): that epoch is
                # complete — resume at the next one. Mid-epoch checkpoints
                # carry iteration >= 1 and restart inside the same epoch
                # (reference train.py:846-853).
                start_epoch += 1

    # -- data -----------------------------------------------------------------
    max_items = args.max_items or None
    train_dataset = AudioDataset(
        audio_conf, args.train_manifest, labels, normalize=args.norm,
        augment=args.augment, max_items=max_items,
        curriculum_filepath=args.curriculum or None, seed=args.seed,
        aug_type=args.aug_type)
    val_dataset = AudioDataset(test_conf, args.val_manifest, labels,
                               normalize=args.norm, max_items=max_items)
    trainval_dataset = None
    if args.train_val_manifest:
        trainval_dataset = AudioDataset(test_conf, args.train_val_manifest,
                                        labels, normalize=args.norm,
                                        max_items=max_items)

    bucket = BucketSpec(audio_step=int(audio_conf.sample_rate
                                       * args.bucket_audio_seconds),
                        reflect_tail=audio_conf.n_fft // 2,
                        wire_dtype=args.wire_dtype)

    # Collate pads the batch dimension with valid=0 rows; round it up to a
    # multiple of the local data-axis extent so DP batch sharding always
    # divides (e.g. batch 2 on an 8-device mesh). Real sample count per bin
    # is still the requested batch size — padding rows carry zero
    # loss/metric weight. With --mesh-model N, only devices/N of the local
    # chips sit on the data axis.
    tp = args.mesh_model
    if jax.local_device_count() % tp != 0:
        raise SystemExit(f"--mesh-model {tp} does not divide the "
                         f"{jax.local_device_count()} local devices")
    dp_local = max(jax.local_device_count() // tp, 1)

    def _pad_bs(bs):
        return -(-bs // dp_local) * dp_local

    def _eval_sampler(n):
        # multi-host: shard eval like train (disjoint rank-strided bins +
        # cross-host counter reduction in evaluate()) instead of the
        # reference's world-x duplicated full-set pass (train.py:425-429)
        if world > 1:
            return DistributedBucketingSampler(
                n, args.val_batch_size, num_replicas=world,
                rank=jax.process_index())
        return BucketingSampler(n, args.val_batch_size)

    val_loader = AudioDataLoader(val_dataset, _eval_sampler(len(val_dataset)),
                                 _pad_bs(args.val_batch_size), bucket,
                                 args.num_workers)
    trainval_loader = None
    if trainval_dataset is not None:
        trainval_loader = AudioDataLoader(trainval_dataset,
                                          _eval_sampler(len(trainval_dataset)),
                                          _pad_bs(args.val_batch_size), bucket,
                                          args.num_workers)

    # -- device placement -----------------------------------------------------
    # DP x TP mesh: batch over `data`, RNN gates / head / optimizer moments
    # over `model` (reference was DP-only, train.py:948-951; the model axis
    # is the BASELINE north-star capability — shard the RNN stack over ICI
    # when it exceeds one chip).
    n_devices = len(jax.devices())
    mesh = (make_mesh(data=n_devices // tp, model=tp)
            if n_devices > 1 or tp > 1 else None)
    if mesh is not None:
        jax.set_mesh(mesh)  # ambient mesh for sharding propagation
        state = shard_state(state, mesh)
        if is_leader and tp > 1 and not args.silent:
            print(f"mesh: data={n_devices // tp} x model={tp}", flush=True)

    noise_extra = {}  # device-resident noise bank, filled below when enabled

    def to_device(batch):
        # always an *async* jax.device_put: callers start batch N+1's
        # transfer right after dispatching step N, so the H2D copy rides
        # alongside device compute (on a transport-limited host link the
        # loop cost becomes max(transfer, compute), not the sum)
        batch = {k: v for k, v in batch.items() if k != "paths"}
        if world > 1:
            # hosts' bins can land on different bucket boundaries; agree on
            # shapes before assembling the global arrays
            out = local_batch_to_global(equalize_batch_padding(batch), mesh)
        elif mesh is not None:
            out = {k: jax.device_put(v, batch_sharding(mesh))
                   for k, v in batch.items()}
        else:
            out = {k: jax.device_put(v) for k, v in batch.items()}
        out.update(noise_extra)  # already device-placed (replicated)
        return out

    cfg = StepConfig(
        audio_conf=audio_conf, normalize=args.norm,
        device_noise_prob=(args.noise_prob
                           if args.device_noise and args.noise_dir else 0.0),
        device_noise_limit=args.device_noise_limit)
    if cfg.device_noise_prob > 0:
        # one-time upload of the noise pool; every train batch then carries
        # the same replicated device buffers (no per-batch H2D traffic)
        import glob as _glob

        from deepspeech_tpu.augment.noise_device import build_noise_bank
        from deepspeech_tpu.parallel.mesh import replicated
        noise_paths = sorted(_glob.glob(args.noise_dir))
        max_dur = max((float(d or 0) for _, _, d in train_dataset.ids),
                      default=0.0) or 30.0
        width = bucket.pad_to(int(max_dur * audio_conf.sample_rate)
                              + bucket.reflect_tail, bucket.audio_step)
        bank_np, bank_lens_np = build_noise_bank(
            noise_paths, audio_conf.sample_rate, width,
            pad=bucket.reflect_tail)
        sh = replicated(mesh) if mesh is not None else None
        put = (lambda a: jax.device_put(a, sh)) if sh is not None \
            else jax.device_put
        noise_extra = {"noise_bank": put(jnp.asarray(bank_np)),
                       "noise_bank_lengths": put(jnp.asarray(bank_lens_np))}
        if is_leader and not args.silent:
            print(f"device noise bank: {len(noise_paths)} clips, "
                  f"{bank_np.nbytes / 1e6:.1f} MB on device", flush=True)
    eval_cfg = StepConfig(audio_conf=test_conf, normalize=args.norm)
    spd = max(args.steps_per_dispatch, 1)
    if spd > 1 and world > 1:
        raise SystemExit(
            "--steps-per-dispatch > 1 is single-host only: multi-host runs "
            "already amortize dispatch across per-host shards, and the "
            "global-array assembly for stacked superbatches is not wired")
    train_step = (make_train_step(model, tx, cfg) if spd == 1
                  else make_multi_train_step(model, tx, cfg))
    if spd > 1:
        # the k=1 loop draws per-step keys as a sequential split chain; one
        # fused scan reproduces the EXACT same chain in a single dispatch
        split_chain = jax.jit(lambda r: jax.lax.scan(
            lambda rr, _: tuple(jax.random.split(rr)), r, None, length=spd))
    eval_step_fn = make_eval_step(model, eval_cfg)

    def eval_step(s, dev_batch):
        # transfers happen ahead of time inside evaluate() via to_device
        m = eval_step_fn(s, dev_batch)
        # multi-host: batch-sharded outputs -> this host's local rows
        return metrics_to_local(m, mesh) if world > 1 else m

    decoder = GreedyDecoder(labels.labels)
    obs = ObserverList(observers)
    logger = MetricsLogger(args.log_dir, run_id=args.id.replace(" ", "_"),
                           tensorboard=args.tensorboard, enabled=is_leader,
                           live_html=args.live_html)
    os.makedirs(args.save_folder, exist_ok=True)

    global_batch = args.batch_size
    per_host_batch = max(global_batch // world, 1)
    rng = jax.random.PRNGKey(args.seed)

    # metric history rides inside every checkpoint so a resumed run keeps
    # plotting/reporting the full curve (reference model.py:426-468:
    # per-epoch loss/wer/cer_results + per-checkpoint val and trainval
    # streams; restore train.py:854-872)
    _HIST_KEYS = ("loss_results", "wer_results", "cer_results",
                  "checkpoint_loss_results", "checkpoint_wer_results",
                  "checkpoint_cer_results", "trainval_checkpoint_loss_results",
                  "trainval_checkpoint_wer_results",
                  "trainval_checkpoint_cer_results")
    history = {k: list(package.get(k) or []) if package else []
               for k in _HIST_KEYS}

    # Async checkpointing: device_get must run on the loop thread (the next
    # step DONATES the state buffers, so the snapshot has to complete before
    # that dispatch), but the npz serialization + multi-hundred-MB disk
    # write + curriculum CSVs move to a single-worker thread — the loop
    # resumes after the snapshot instead of stalling for the write
    # (reference save sites train.py:701-727 block the epoch loop).
    ckpt_writer = ThreadPoolExecutor(max_workers=1)  # 1 => writes stay ordered
    ckpt_errors: list = []  # async write failures -> nonzero exit at the end
    ckpt_done: list = []    # completed writes; drained on the MAIN thread
    # (logger/observers/stdout are single-threaded objects — the worker only
    # touches files and these two GIL-atomic lists)

    def drain_ckpt_events():
        while ckpt_done:
            path_, ep_, it_ = ckpt_done.pop(0)
            logger.log("checkpoint", path=path_, epoch=ep_, iteration=it_)
            obs.emit("on_checkpoint", ep_ or 0, it_ or 0, path_)
            say(f"  saved {path_}")

    def save_package(path, epoch=None, iteration=None, avg_loss=None):
        if not is_leader:
            return
        drain_ckpt_events()  # report earlier completions from this thread
        host_state = jax.device_get(state)          # the snapshot
        hist = {k: list(v) for k, v in history.items()}
        snaps = [(path + ".curriculum.csv", train_dataset.curriculum.snapshot()),
                 # validation curriculum sidecars (reference
                 # save_validation_curriculums, train.py:515-532)
                 (path + ".val.curriculum.csv",
                  val_dataset.curriculum.snapshot())]
        if trainval_dataset is not None:
            snaps.append((path + ".trainval.curriculum.csv",
                          trainval_dataset.curriculum.snapshot()))

        def write():
            try:
                pkg = ckpt.serialize(meta, host_state, labels.labels,
                                     audio_conf.to_dict(), epoch=epoch,
                                     iteration=iteration,
                                     checkpoint=checkpoint_id,
                                     avg_loss=avg_loss, history=hist)
                ckpt.save(path, pkg)
                for p, store in snaps:
                    store.save(p)
                ckpt_done.append((path, epoch, iteration))
            except Exception as e:  # surface, never kill the writer thread
                ckpt_errors.append((path, e))
                print(f"checkpoint write FAILED for {path}: {e}",
                      file=sys.stderr, flush=True)

        ckpt_writer.submit(write)

    def run_validation(epoch, tag="val"):
        # reference check_model_quality also feeds the val dataset's
        # curriculum history (train.py:376-381)
        summary = evaluate(val_loader, eval_step, state, decoder, labels,
                           dataset=val_dataset, update_curriculum=True,
                           all_reduce=world > 1, to_device=to_device)
        say(f"[{tag}] epoch {epoch + 1}: loss {summary['loss']:.3f} "
            f"WER {summary['wer']:.2f} CER {summary['cer']:.2f} "
            f"(utt-avg {summary['utt_wer']:.2f}/{summary['utt_cer']:.2f})")
        logger.log(tag, step=epoch, **summary)
        if tag == "val_checkpoint":
            history["checkpoint_loss_results"].append(float(summary["loss"]))
            history["checkpoint_wer_results"].append(float(summary["wer"]))
            history["checkpoint_cer_results"].append(float(summary["cer"]))
        if trainval_loader is not None:
            tv = evaluate(trainval_loader, eval_step, state, decoder, labels,
                          dataset=trainval_dataset, update_curriculum=True,
                          all_reduce=world > 1, to_device=to_device)
            say(f"[trainval] epoch {epoch + 1}: WER {tv['wer']:.2f} "
                f"CER {tv['cer']:.2f}")
            logger.log("trainval", step=epoch, **tv)
            if tag == "val_checkpoint":
                history["trainval_checkpoint_loss_results"].append(
                    float(tv["loss"]))
                history["trainval_checkpoint_wer_results"].append(
                    float(tv["wer"]))
                history["trainval_checkpoint_cer_results"].append(
                    float(tv["cer"]))
        return summary

    samples_since_ckpt = 0
    profiling = False
    global_step = 0

    # -- async metric pipeline --------------------------------------------
    # The reference paid a full device->host sync + greedy decode +
    # Levenshtein on the main thread every batch (train.py:575-591). Here
    # the readback of step N's metrics happens only after step N+1 has been
    # dispatched (double-buffering: host blocks on a step that is already
    # done while the next one runs), and the string decode + edit distance +
    # curriculum update run on a worker thread. Curriculum state is only
    # consumed at epoch/checkpoint boundaries, where we drain the worker.
    decode_pool = ThreadPoolExecutor(max_workers=1,
                                     thread_name_prefix="decode")
    decode_futures: list = []
    last_wer = [0.0]  # latest worker-computed batch WER, for the log line

    def _decode_and_update(m_host, batch, paths):
        results = decode_batch_greedy(decoder, m_host, batch, labels)
        for i, (tr, ref, w, c, wr, cr) in enumerate(results):
            train_dataset.update_curriculum(paths[i], ref, tr, None,
                                            c / cr, w / wr)
        if results:
            last_wer[0] = float(np.mean([w / wr for _, _, w, _, wr, _
                                         in results]))
        return results

    def drain_decodes():
        for f in decode_futures:
            f.result()
        decode_futures.clear()

    def maybe_profile(step):
        """jax.profiler trace window around [profile_start, +profile_steps)
        (the reference had no profiler at all, SURVEY §5; this is the
        TPU-native replacement for its wall-clock AverageMeters)."""
        nonlocal profiling
        if not args.profile_dir or not is_leader:
            return
        if not profiling and step == args.profile_start:
            jax.profiler.start_trace(args.profile_dir)
            profiling = True
            say(f"  profiler trace started -> {args.profile_dir}")
        elif profiling and step >= args.profile_start + args.profile_steps:
            jax.profiler.stop_trace()
            profiling = False
            say("  profiler trace stopped")

    for epoch in range(start_epoch, args.epochs):
        train_dataset.set_curriculum_epoch(epoch, sample=args.use_curriculum,
                                           sample_size=args.curriculum_ratio)
        if world > 1:
            sampler = DistributedBucketingSampler(
                len(train_dataset), per_host_batch, num_replicas=world,
                rank=jax.process_index())
        else:
            sampler = BucketingSampler(len(train_dataset), per_host_batch)
        # SortaGrad: no shuffle on epoch 0 (reference train.py:89-94, 669-671)
        if not args.no_shuffle and (epoch > 0 or args.no_sorta_grad):
            sampler.shuffle(epoch)
        elif args.reverse_sort:
            # longest-first: peak memory load on the very first batches
            # (reference train.py:93-94, 933-935)
            sampler.reverse()
        # prefetch must cover a whole dispatch group: pull_group() drains
        # spd batches in a burst, and a 2-deep queue would serialize the
        # loader against the k-step device program
        loader = AudioDataLoader(train_dataset, sampler, _pad_bs(per_host_batch),
                                 bucket, args.num_workers,
                                 prefetch=max(2, spd + 1))

        loss_meter = AverageMeter()
        watch = StopWatch()
        epoch_t0 = time.perf_counter()
        it = start_iter
        start_iter = 0
        obs.emit("on_epoch_start", epoch)

        pending = None  # tagged record of dispatch N-1, read after N starts

        def account_step(loss, greedy, out_lens, skipped, grad_norm,
                         pbatch, ppaths, pit):
            """Account one (micro)batch: meters, async decode, logs."""
            if not np.isfinite(loss):
                loss = 1000.0  # reporting clamp (reference train.py:609-611)
            n_valid = int(np.asarray(pbatch["valid"]).sum())
            loss_meter.update(loss, n_valid)
            # greedy decode + Levenshtein + curriculum on the worker thread
            # (reference did this inline every batch, train.py:575-591)
            decode_futures.append(decode_pool.submit(
                _decode_and_update, {"greedy": greedy, "out_lens": out_lens},
                pbatch, ppaths))
            obs.emit("on_batch_end", epoch, pit, loss=loss)
            watch.mark_batch()
            if pit % 10 == 0:
                drain_ckpt_events()
                say(f"epoch {epoch + 1} iter {pit + 1}/{len(loader)} "
                    f"loss {loss:.3f} (avg {loss_meter.avg:.3f}) "
                    f"wer {100 * last_wer[0]:.1f} "
                    f"batch {watch.batch_time.avg:.2f}s "
                    f"data {watch.data_time.avg:.2f}s "
                    f"lr {get_lr(state.opt_state):.2e}")
                logger.log("train", step=epoch * len(loader) + pit,
                           loss=loss, avg_loss=loss_meter.avg,
                           lr=get_lr(state.opt_state), skipped=skipped)
            if args.log_params and pit % 100 == 0 and is_leader:
                logger.log_params(jax.device_get(state.params),
                                  float(grad_norm),
                                  epoch * len(loader) + pit)

        def process_pending():
            """Read back + account the previously dispatched step(s). Called
            AFTER the next step has been dispatched, so the device transfer
            waits on work that is already complete while the new step runs."""
            nonlocal pending
            if pending is None:
                return
            tag, m, pb, pp, pit = pending
            pending = None
            if tag == "single":
                if world > 1:
                    m = metrics_to_local(m, mesh)
                account_step(float(m["loss"]), np.asarray(m["greedy"]),
                             np.asarray(m["out_lens"]),
                             bool(m["step_skipped"]), m["grad_norm"],
                             pb, pp, pit)
                return
            # group: stacked (k, ...) metrics; account live microbatches only
            loss_np = np.asarray(m["loss"])
            greedy_np = np.asarray(m["greedy"])
            lens_np = np.asarray(m["out_lens"])
            skip_np = np.asarray(m["step_skipped"])
            norm_np = np.asarray(m["grad_norm"])
            for j, (b_j, p_j) in enumerate(zip(pb, pp)):
                account_step(float(loss_np[j]), greedy_np[j], lens_np[j],
                             bool(skip_np[j]), norm_np[j], b_j, p_j, pit + j)

        batches = loader.iter_from(it)

        def pull():
            """Next host batch + its (async) device transfer. Called right
            after step N is dispatched, so batch N+1's H2D copy overlaps
            step N's compute — on a transport-limited host link this turns
            per-iter cost from transfer+compute into max(transfer, compute)."""
            b = next(batches, None)
            if b is None:
                return None
            watch.mark_data()
            return b, to_device(b)

        def start_readback(m):
            if world == 1:
                # start the device->host copies now; by the time
                # process_pending() reads them (after the NEXT dispatch) the
                # transfers have ridden alongside compute — one overlapped
                # round trip instead of one blocking trip per metric
                for v in m.values():
                    if hasattr(v, "copy_to_host_async"):
                        v.copy_to_host_async()

        def maybe_sample_checkpoint():
            nonlocal checkpoint_id, samples_since_ckpt, state
            if not (args.checkpoint_per_samples
                    and samples_since_ckpt >= args.checkpoint_per_samples):
                return
            # flush the pipeline so the checkpoint's curriculum CSVs and
            # loss average include every step up to this one
            process_pending()
            drain_decodes()
            checkpoint_id += 1
            save_package(os.path.join(
                args.save_folder,
                f"deepspeech_checkpoint_{checkpoint_id:04d}.ckpt"),
                epoch=epoch, iteration=it, avg_loss=loss_meter.avg)
            run_validation(epoch, tag="val_checkpoint")
            samples_since_ckpt = 0
            if args.checkpoint_anneal != 1.0:
                # set_lr swaps only the injected-hyperparams scalar; the
                # rest of the optimizer state stays on device untouched
                old_lr = get_lr(state.opt_state)
                new_lr = old_lr / args.checkpoint_anneal
                state = state.replace(
                    opt_state=set_lr(state.opt_state, new_lr))
                say(f"  checkpoint anneal -> lr {new_lr:.2e}")
                # LR-finder stream: (lr, loss) points for a loss-vs-LR
                # plot (reference LRPlotWindow, train.py:254-314, 414-421)
                logger.log("lr_find", step=checkpoint_id, lr=old_lr,
                           loss=loss_meter.avg)

        held = [None]  # one-batch lookahead across pull_group calls

        def pull_group():
            """Next k SAME-SHAPE host batches, stacked and transferred as ONE
            (k, B, ...) superbatch. Like pull(), the transfer is async and
            overlaps the in-flight k-step program.

            Groups never mix bucket shapes: train-mode BatchNorm statistics
            include bucket-padding frames (reference semantics — its dense
            (T, B, H) BN sees pad frames too, model.py:82-96), so widening a
            batch to a common shape would CHANGE its numerics. A shape
            switch closes the group early (live-masked tail lanes); under
            bucketing, consecutive batches share shapes for long runs, so
            full groups dominate."""
            group = []
            while len(group) < spd:
                b = held[0] or next(batches, None)
                held[0] = None
                if b is None:
                    break
                if group and (b["audio"].shape != group[0]["audio"].shape
                              or b["targets"].shape != group[0]["targets"].shape):
                    held[0] = b  # different bucket: starts the next group
                    break
                watch.mark_data()
                group.append(b)
            if not group:
                return None
            paths_g = [b.get("paths") for b in group]
            stacked, live = stack_microbatches(
                [{k: v for k, v in b.items() if k != "paths"}
                 for b in group], spd)
            if mesh is not None:
                sb = stacked_batch_sharding(mesh)
                dev = {k: jax.device_put(v, sb) for k, v in stacked.items()}
                live_d = jax.device_put(live, replicated(mesh))
            else:
                dev = {k: jax.device_put(v) for k, v in stacked.items()}
                live_d = jax.device_put(live)
            return group, paths_g, dev, live_d

        if spd == 1:
            nxt = pull()
            while nxt is not None:
                batch, dev_batch = nxt
                maybe_profile(global_step)
                paths = batch.get("paths")
                obs.emit("on_batch_start", epoch, it)
                rng, step_key = jax.random.split(rng)
                state, m = train_step(state, dev_batch, step_key)
                nxt = pull()  # start batch N+1's transfer while step N runs
                start_readback(m)
                process_pending()  # overlap: account step N-1 while N runs
                pending = ("single", m, batch, paths, it)
                n_valid = int(np.asarray(batch["valid"]).sum())
                it += 1
                global_step += 1
                samples_since_ckpt += n_valid
                maybe_sample_checkpoint()
        else:
            nxt = pull_group()
            while nxt is not None:
                group, paths_g, dev, live_d = nxt
                maybe_profile(global_step)
                for j in range(len(group)):
                    obs.emit("on_batch_start", epoch, it + j)
                # the SAME per-step keys the k=1 loop would draw (numerics
                # parity); tail-padding lanes reuse the last key (unused)
                if len(group) == spd:
                    rng, keys_arr = split_chain(rng)
                else:  # epoch tail: advance the chain by exactly k' steps
                    keys = []
                    for _ in group:
                        rng, step_key = jax.random.split(rng)
                        keys.append(step_key)
                    while len(keys) < spd:
                        keys.append(keys[-1])
                    keys_arr = jnp.stack(keys)
                if mesh is not None:
                    keys_arr = jax.device_put(keys_arr, replicated(mesh))
                state, m = train_step(state, dev, keys_arr, live_d,
                                      noise_extra)
                nxt = pull_group()  # group N+1's H2D rides the k-step scan
                start_readback(m)
                process_pending()
                pending = ("group", m, group, paths_g, it)
                n_valid = sum(int(np.asarray(b["valid"]).sum())
                              for b in group)
                it += len(group)
                global_step += len(group)
                samples_since_ckpt += n_valid
                maybe_sample_checkpoint()
        process_pending()
        drain_decodes()

        epoch_time = time.perf_counter() - epoch_t0
        say(f"epoch {epoch + 1} done in {epoch_time:.1f}s "
            f"avg loss {loss_meter.avg:.3f}")
        logger.log("epoch", step=epoch, loss=loss_meter.avg,
                   seconds=epoch_time)
        obs.emit("on_epoch_end", epoch, loss=loss_meter.avg,
                 seconds=epoch_time)

        summary = run_validation(epoch)
        history["loss_results"].append(float(loss_meter.avg))
        history["wer_results"].append(float(summary["wer"]))
        history["cer_results"].append(float(summary["cer"]))

        if args.checkpoint:
            save_package(os.path.join(args.save_folder,
                                      f"deepspeech_epoch_{epoch + 1:03d}.ckpt"),
                         epoch=epoch, iteration=0, avg_loss=loss_meter.avg)
        # anneal LR per epoch (reference train.py:746-767); scalar-only
        # update, no host round-trip of the optimizer state
        new_lr = get_lr(state.opt_state) / args.learning_anneal
        state = state.replace(opt_state=set_lr(state.opt_state, new_lr))
        say(f"  learning rate annealed -> {new_lr:.2e}")
        # best model by WER+CER (reference train.py:769-787)
        quality = summary["wer"] + summary["cer"]
        if best_quality is None or quality < best_quality:
            best_quality = quality
            save_package(os.path.join(args.save_folder, "best_model.ckpt"),
                         epoch=epoch, iteration=0, avg_loss=loss_meter.avg)

    if profiling:
        jax.profiler.stop_trace()
    decode_pool.shutdown(wait=True)
    save_package(os.path.join(args.save_folder, "deepspeech_final.ckpt"),
                 epoch=args.epochs - 1, iteration=0)
    ckpt_writer.shutdown(wait=True)  # flush queued checkpoint writes
    drain_ckpt_events()
    logger.close()
    if ckpt_errors:
        # the synchronous saver would have crashed the run; the async one
        # must not turn a lost checkpoint into a silent success
        print(f"{len(ckpt_errors)} checkpoint write(s) FAILED, e.g. "
              f"{ckpt_errors[0][0]}: {ckpt_errors[0][1]}",
              file=sys.stderr, flush=True)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
