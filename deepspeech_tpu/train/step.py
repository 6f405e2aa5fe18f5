"""Pure jitted train/eval steps.

One compiled program does the whole reference hot loop body
(reference train.py:555-647) on device: featurize -> forward -> CTC ->
backward -> clip -> NaN guard -> update, plus the greedy argmax the loop
needs for curriculum/WER bookkeeping. Only small arrays (loss, argmax ids,
lengths) come back to host, keeping the curriculum feedback loop off the
step's critical path (the reference instead decoded on host every batch,
train.py:575-591).

NaN semantics follow the reference:
* NaN logits are zeroed before the loss (train.py:595-598);
* if any logit is NaN the optimizer step is skipped (train.py:625-630);
* the inf->1000 loss clamp for *reporting* happens host-side (train.py:609-611).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from deepspeech_tpu.audio.features import AudioConf, featurize_batch
from deepspeech_tpu.ops.ctc import ctc_loss


@flax.struct.dataclass
class InferenceState:
    """Params-only state for eval/transcribe (a valid jit pytree)."""
    params: Any
    batch_stats: Any


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx):
        return cls(params=variables["params"],
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(variables["params"]),
                   step=jnp.zeros((), jnp.int32))


@dataclasses.dataclass(frozen=True)
class StepConfig:
    audio_conf: AudioConf = AudioConf()
    normalize: str = "max_frame"
    from_audio: bool = True      # batch carries raw audio (device featurize)
    stft_method: str = "auto"    # pallas kernel on TPU, matmul elsewhere
    max_frame_jitter: bool = True  # reference data_loader_aug.py:213-214
    # on-device additive noise (augment/noise_device.py; reference
    # audio_aug.py:79-107 AddNoise semantics). Active when > 0 AND the
    # batch carries a "noise_bank" — the loader/CLI uploads the pool once.
    device_noise_prob: float = 0.0
    device_noise_limit: float = 0.2


def _featurize(batch, cfg: StepConfig, rng, train: bool):
    if cfg.from_audio:
        jitter = aug_key = noise_key = None
        if train and rng is not None:
            k_jit, aug_key, noise_key = jax.random.split(rng, 3)
            if cfg.max_frame_jitter:
                jitter = jax.random.uniform(
                    k_jit, (batch["audio"].shape[0],), minval=-0.5, maxval=0.5)
        audio = batch["audio"]
        if "audio_scale" in batch:
            # quantized wire formats (data/loader.py BucketSpec.wire_dtype):
            # decode on device — int16 halves the host->device bytes
            # (linear descale), mulaw8 quarters them (mu-law expansion)
            if audio.dtype == jnp.int8:
                v = audio.astype(jnp.float32) * (1.0 / 127.0)
                audio = (jnp.sign(v) * jnp.expm1(jnp.abs(v) * jnp.log(256.0))
                         * (1.0 / 255.0)) * batch["audio_scale"][:, None]
            else:
                audio = (audio.astype(jnp.float32)
                         * batch["audio_scale"][:, None])
        if (cfg.device_noise_prob > 0 and noise_key is not None
                and "noise_bank" in batch):
            from deepspeech_tpu.augment.noise_device import add_noise_batch
            audio = add_noise_batch(
                audio, batch["audio_lengths"], noise_key,
                batch["noise_bank"], batch["noise_bank_lengths"],
                cfg.device_noise_prob, cfg.device_noise_limit,
                reflect_pad=cfg.audio_conf.n_fft // 2)
        return featurize_batch(audio, batch["audio_lengths"],
                               cfg.audio_conf, cfg.normalize,
                               method=cfg.stft_method, jitter=jitter,
                               aug_key=aug_key)
    return batch["spect"], batch["spect_lengths"]


def _train_step_body(model, tx: optax.GradientTransformation,
                     cfg: StepConfig) -> Callable:
    """Un-jitted step body: train_step(state, batch, rng, live=None).

    ``live`` (optional traced bool) gates the whole state transition:
    a dead step computes but keeps params/opt_state/batch_stats/step
    unchanged — used by :func:`make_multi_train_step` so a ragged tail
    group (fewer real batches than ``steps_per_dispatch``) reuses the
    same compiled program with padding microbatches that are exactly
    neutral (zero grads alone would NOT be: SGD momentum still moves
    params and BN stats still decay on an all-padding batch).
    """

    def loss_fn(params, batch_stats, batch, rng, spect, spect_lengths):
        (logits, probs, out_lens), updated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            spect, spect_lengths, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(rng, 1)})
        logits_has_nan = jnp.isnan(logits).any()
        logits = jnp.where(jnp.isnan(logits), 0.0, logits)
        per_sample = ctc_loss(logits, out_lens, batch["targets"],
                              batch["target_lengths"])
        # `valid` masks bucket-padding rows (short final bins); reference
        # semantics divide by the real sample count (train.py:600-601)
        valid = batch.get("valid", jnp.ones(logits.shape[0], jnp.float32))
        finite = jnp.isfinite(per_sample) & (valid > 0)
        loss = (jnp.where(finite, per_sample, 0.0).sum()
                / jnp.maximum(valid.sum(), 1.0))
        aux = dict(batch_stats=updated["batch_stats"],
                   per_sample=per_sample, logits_has_nan=logits_has_nan,
                   greedy=jnp.argmax(logits, -1).astype(jnp.int32),
                   out_lens=out_lens)
        return loss, aux

    def train_step(state: TrainState, batch, rng, live=None):
        spect, spect_lengths = _featurize(batch, cfg, rng, train=True)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng, spect, spect_lengths)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # reference skips the optimizer step on NaN logits (train.py:625-630);
        # we extend the guard to non-finite grads (same intent, stronger).
        # Per-leaf where-selects are load-bearing: scaling the updates by an
        # ok-flag fails on NaN updates (NaN * 0 == NaN, see test_step_guard),
        # and lax.cond measured slower at runtime and 5x slower to compile.
        grads_ok = jnp.logical_and(
            jnp.logical_not(aux["logits_has_nan"]),
            jnp.isfinite(optax.global_norm(grads)))
        new_stats = aux["batch_stats"]
        step_inc = 1
        if live is not None:
            grads_ok = jnp.logical_and(grads_ok, live)
            new_stats = jax.tree.map(
                lambda n, o: jnp.where(live, n, o),
                new_stats, state.batch_stats)
            step_inc = live.astype(jnp.int32)
        take = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(grads_ok, n, o), new, old)
        state = TrainState(
            params=take(new_params, state.params),
            batch_stats=new_stats,
            opt_state=take(new_opt, state.opt_state),
            step=state.step + step_inc)
        metrics = dict(loss=loss, per_sample=aux["per_sample"],
                       greedy=aux["greedy"], out_lens=aux["out_lens"],
                       grad_norm=optax.global_norm(grads),
                       step_skipped=jnp.logical_not(grads_ok))
        return state, metrics

    return train_step


def make_train_step(model, tx: optax.GradientTransformation,
                    cfg: StepConfig = StepConfig(),
                    donate: bool = True) -> Callable:
    """Returns jitted train_step(state, batch, rng) -> (state, metrics).

    batch dict: audio (B,S) + audio_lengths (B,) [or spect/spect_lengths],
    targets (B,L), target_lengths (B,). metrics: loss (reporting semantics),
    per-sample losses, greedy ids + lengths for host decode, grad-norm,
    step_skipped flag.
    """
    return jax.jit(_train_step_body(model, tx, cfg),
                   donate_argnums=(0,) if donate else ())


def make_multi_train_step(model, tx: optax.GradientTransformation,
                          cfg: StepConfig = StepConfig(),
                          donate: bool = True) -> Callable:
    """k steps per device dispatch: the TPU-idiomatic answer to per-batch
    host sync (reference train.py:575-591, 690).

    Returns multi_step(state, stacked, keys, live, shared) -> (state, m):

    * ``stacked``: batch dict with a leading microbatch axis (k, B, ...) —
      k host batches np.stack'ed (data/loader.py stack_microbatches). The
      train CLI only groups batches of the SAME bucket shape: train-mode
      BatchNorm statistics include padding frames (reference dense-BN
      semantics), so zero-padding a batch wider is not numerics-neutral;
    * ``keys``: (k, 2) uint32 — the SAME per-step PRNG keys the k=1 loop
      would have drawn, so augmentation noise matches exactly;
    * ``live``: (k,) bool — False marks tail-padding microbatches whose
      state transition is suppressed (see :func:`_train_step_body`);
    * ``shared``: per-run device-resident extras (noise bank) that every
      microbatch reuses, kept out of the scanned axis.

    One ``lax.scan`` runs the k full step bodies back to back on device;
    the host pays one dispatch + one metrics readback per k batches, so
    the ~25 ms tunnel round trip amortizes k-fold. Metrics come back
    stacked (k, ...) and the loop accounts each microbatch exactly as at
    k=1 (curriculum CER is at most k steps stale — the sampler already
    tolerates that).
    """
    body = _train_step_body(model, tx, cfg)

    def multi_step(state: TrainState, stacked, keys, live, shared):
        def scan_body(s, x):
            batch, key, lv = x
            b = dict(batch)
            b.update(shared)
            return body(s, b, key, lv)

        return jax.lax.scan(scan_body, state, (stacked, keys, live))

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, cfg: StepConfig = StepConfig()) -> Callable:
    """eval_step(state, batch) -> metrics with loss + greedy ids + probs."""

    def eval_step(state: TrainState, batch):
        spect, spect_lengths = _featurize(batch, cfg, rng=None, train=False)
        logits, probs, out_lens = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            spect, spect_lengths, False)
        per_sample = ctc_loss(logits, out_lens, batch["targets"],
                              batch["target_lengths"])
        valid = batch.get("valid", jnp.ones(logits.shape[0], jnp.float32))
        finite = jnp.isfinite(per_sample) & (valid > 0)
        loss = (jnp.where(finite, per_sample, 0.0).sum()
                / jnp.maximum(valid.sum(), 1.0))
        return dict(loss=loss, per_sample=per_sample,
                    greedy=jnp.argmax(logits, -1).astype(jnp.int32),
                    out_lens=out_lens, probs=probs)

    return jax.jit(eval_step)
