"""Audio dataset over a manifest, TPU-first.

Reference counterpart: SpectrogramDataset (reference data_loader_aug.py:322-520).
Key design difference: the default sample payload is the *augmented raw
waveform*, not a spectrogram — the STFT + normalization run batched inside
the compiled train step on TPU (deepspeech_tpu.audio.features.featurize_batch),
so CPU workers only do file I/O and waveform augs. A host spectrogram mode
(``emit="spect"``) keeps parity with the reference's worker-side front-end
for eval tooling and golden tests.

Per-sample augmentation RNG is derived from (seed, epoch, index) so any
sample is reproducible in isolation (the reference relied on process-global
random state).
"""

from __future__ import annotations

import numpy as np

from deepspeech_tpu.audio.dsp import resample
from deepspeech_tpu.audio.features import AudioConf, parse_audio_np
from deepspeech_tpu.audio.io import load_audio_norm
from deepspeech_tpu.augment.spectrogram import FrequencyMask, SOneOf, TimeMask
from deepspeech_tpu.augment.waveform import build_waveform_pipeline
from deepspeech_tpu.data.curriculum import Curriculum, CurriculumStore
from deepspeech_tpu.data.manifest import read_manifest
from deepspeech_tpu.text.labels import Labels


class AudioDataset:
    """Manifest-backed dataset of (audio-or-spect, target ids, path).

    :param audio_conf: front-end + aug probabilities (AudioConf or dict).
    :param manifest_filepath: CSV ``wav,txt[,duration]``.
    :param labels: alphabet string or Labels.
    :param normalize: normalization mode (only used when emit="spect").
    :param augment: enable waveform augs (prob from audio_conf.noise_prob).
    :param aug_type: pipeline variant 0-3 (reference data_loader_aug.py:
        367-412; the reference hardcodes 0 at :355, here it is selectable).
    :param emit: "audio" (device featurize; default) or "spect" (host parity).
    :param curriculum_filepath: optional CSV to preload CER history.
    """

    def __init__(self, audio_conf, manifest_filepath: str, labels,
                 normalize: str = "max_frame", augment: bool = False,
                 max_items: int | None = None,
                 curriculum_filepath: str | None = None,
                 emit: str = "audio", seed: int = 123456,
                 aug_type: int = 0):
        self.conf = (audio_conf if isinstance(audio_conf, AudioConf)
                     else AudioConf.from_dict(audio_conf))
        self.labels = labels if isinstance(labels, Labels) else Labels(labels)
        self.normalize = normalize
        self.augment = augment
        self.emit = emit
        self.seed = seed
        self.epoch = 0

        self.all_ids = read_manifest(manifest_filepath, max_items)
        self.ids = list(self.all_ids)
        self._transcript_cache: dict[str, list[int]] = {}

        noise_samples = ()
        if self.conf.noise_dir:
            import glob
            noise_samples = sorted(glob.glob(self.conf.noise_dir))
        self.augs = (build_waveform_pipeline(self.conf.noise_prob,
                                             noise_samples,
                                             self.conf.sample_rate,
                                             aug_type=aug_type)
                     if augment else None)
        # host-side SpecAugment for emit="spect" parity
        # (reference data_loader_aug.py:424-433)
        self.augs_spect = None
        if augment and self.conf.aug_prob_spect > 0:
            self.augs_spect = SOneOf(
                [FrequencyMask(bands=2, prob=self.conf.aug_prob_spect,
                               dropout_width=20),
                 TimeMask(bands=2, prob=self.conf.aug_prob_spect,
                          dropout_length=50, max_dropout_ratio=0.15)],
                prob=self.conf.noise_prob)

        if curriculum_filepath:
            self.curriculum = CurriculumStore.load(curriculum_filepath)
        else:
            self.curriculum = CurriculumStore(
                [wav for wav, _, _ in self.all_ids])

    # -- sample access -------------------------------------------------------

    def _rng(self, index: int) -> np.random.Generator:
        return np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, index]))

    def load_waveform(self, audio_path: str, rng=None) -> np.ndarray:
        y, sr = load_audio_norm(audio_path)
        if sr != self.conf.sample_rate:
            y = resample(y, sr, self.conf.sample_rate)
        if self.augs is not None and rng is not None:
            y, _ = self.augs(y, self.conf.sample_rate, rng)
        return np.asarray(y, np.float32)

    def parse_transcript(self, transcript_path: str) -> list[int]:
        """Memoized text -> ids (reference data_loader_aug.py:505-514)."""
        if transcript_path not in self._transcript_cache:
            if not transcript_path:
                ids = self.labels.parse("")
            else:
                with open(transcript_path, encoding="utf8") as f:
                    ids = self.labels.parse(f.read())
            self._transcript_cache[transcript_path] = ids
        return self._transcript_cache[transcript_path]

    def get_reference_transcript(self, txt_path: str) -> str:
        return self.labels.render_transcript(self.parse_transcript(txt_path))

    def __getitem__(self, index: int) -> dict:
        wav, txt, dur = self.ids[index]
        rng = self._rng(index) if self.augment else None
        y = self.load_waveform(wav, rng)
        target = np.asarray(self.parse_transcript(txt), np.int32)
        sample = {"path": wav, "target": target, "duration": dur}
        if self.emit == "spect":
            spect = parse_audio_np(y, self.conf, self.normalize,
                                   jitter_rng=rng if self.augment else None)
            if self.augs_spect is not None and rng is not None:
                spect = self.augs_spect(spect, rng)
            sample["spect"] = spect.astype(np.float32)
        else:
            sample["audio"] = y
        return sample

    def __len__(self):
        return len(self.ids)

    # -- curriculum (reference data_loader_aug.py:462-503) --------------------

    def get_curriculum_info(self, item):
        wav, txt, _ = item
        row = self.curriculum.get(wav)
        if row is None:
            return self.get_reference_transcript(txt), 0.999
        return row["text"], row["cer"]

    def set_curriculum_epoch(self, epoch: int, sample: bool = False,
                             sample_size: float = 0.5):
        """Resample this epoch's id list by curriculum probability, then
        epoch-seeded shuffle (reference data_loader_aug.py:468-483)."""
        self.epoch = epoch
        if sample:
            self.ids = list(Curriculum.sample(
                self.all_ids, self.get_curriculum_info, epoch=epoch,
                min=len(self.all_ids) * sample_size))
        else:
            self.ids = list(self.all_ids)
        np.random.default_rng(epoch).shuffle(self.ids)

    def update_curriculum(self, wav, reference, transcript, offsets, cer,
                          wer, times_used=None):
        """``times_used=None`` increments the per-utterance counter, matching
        the reference's ``curriculum[filename]['times_used'] + 1`` at every
        update site (reference train.py:376-381, 481-486, 581-586)."""
        self.curriculum.update(wav, reference, transcript, offsets, cer, wer,
                               times_used)

    def save_curriculum(self, path: str):
        self.curriculum.save(path)
