"""Datapipe tests: manifest, curriculum math, samplers, collate, dataset+loader."""

import os

import numpy as np
import pytest

from deepspeech_tpu.audio.io import save_wav
from deepspeech_tpu.data import (
    AudioDataLoader, AudioDataset, BucketingSampler, BucketSpec, Curriculum,
    CurriculumStore, DistributedBucketingSampler, collate_batch,
    create_manifest, merge_manifests, read_manifest, write_manifest,
)

SR = 16000
ALPHABET = "_'ABCDEFGHIJKLMNOPQRSTUVWXYZ2 "


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """4 synthetic utterances in the reference's wav/txt layout + manifest."""
    root = tmp_path_factory.mktemp("corpus")
    wav_dir, txt_dir = root / "wav", root / "txt"
    wav_dir.mkdir(), txt_dir.mkdir()
    rng = np.random.default_rng(0)
    texts = ["hello world", "a b c", "test utterance here", "hi"]
    rows = []
    for i, (text, dur) in enumerate(zip(texts, [0.4, 0.3, 0.6, 0.2])):
        y = (rng.standard_normal(int(SR * dur)) * 0.1).astype(np.float32)
        wav = wav_dir / f"utt{i}.wav"
        txt = txt_dir / f"utt{i}.txt"
        save_wav(str(wav), y, SR)
        txt.write_text(text)
        rows.append((str(wav), str(txt), dur))
    manifest = root / "manifest.csv"
    write_manifest(str(manifest), sorted(rows, key=lambda r: r[2]))
    return {"root": root, "manifest": str(manifest), "rows": rows}


class TestManifest:
    def test_read_write_roundtrip(self, corpus, tmp_path):
        rows = read_manifest(corpus["manifest"])
        assert len(rows) == 4
        assert all(os.path.exists(w) for w, _, _ in rows)
        assert rows == sorted(rows, key=lambda r: r[2])

    def test_create_manifest_sorts_and_prunes(self, corpus, tmp_path):
        out = tmp_path / "m.csv"
        n = create_manifest(str(corpus["root"]), str(out),
                            min_duration=0.25, max_duration=0.5)
        rows = read_manifest(str(out))
        assert n == len(rows) == 2  # 0.3 and 0.4 s survive
        durs = [r[2] for r in rows]
        assert durs == sorted(durs)
        assert all(t.endswith(".txt") for _, t, _ in rows)

    def test_merge_manifests(self, corpus, tmp_path):
        out = tmp_path / "merged.csv"
        n = merge_manifests([corpus["manifest"], corpus["manifest"]],
                            str(out), min_duration=0, max_duration=15)
        assert n == 8


class TestCurriculum:
    def test_get_prob_reference_values(self):
        # oracle values from the reference's own __main__ self-check
        # (reference data/curriculum.py:34-45)
        assert Curriculum.get_prob("", 0) == pytest.approx(0.02)
        assert Curriculum.get_prob("", 0.1) == pytest.approx(0.12)
        assert Curriculum.get_prob("", 1) == pytest.approx(0.02)
        assert Curriculum.get_prob("hello guys", 0.2) == pytest.approx(0.22)
        assert Curriculum.get_prob("hello guys", 0.1) == pytest.approx(0.12)

    def test_sample_empty_items_raises(self):
        # the reference spins forever here (its while-loop can never reach
        # ``min`` with no items, reference curriculum.py:10-21); we raise
        with pytest.raises(ValueError, match="no items"):
            list(Curriculum.sample([], lambda it: ("", 0.2), epoch=0, min=1))

    def test_sample_deterministic_and_min(self):
        items = [(f"wav{i}", f"text {i}", 0.3) for i in range(50)]
        getter = lambda it: (it[1], 0.2)  # peak probability
        a = list(Curriculum.sample(items, getter, epoch=3, min=10))
        b = list(Curriculum.sample(items, getter, epoch=3, min=10))
        assert a == b
        assert len(a) >= 10

    def test_store_csv_roundtrip(self, tmp_path):
        store = CurriculumStore(["w1", "w2"])
        store.update("w1", "ref text", "hyp text", None, 0.25, 0.5)
        path = tmp_path / "c.csv"
        store.save(str(path))
        loaded = CurriculumStore.load(str(path))
        assert loaded.info("w1")[1] == 0.25
        assert loaded.info("w2") == ("", 0.999)
        assert loaded.info("missing", "fb") == ("fb", 0.999)
        # times_used survives the CSV round trip as an int (reference
        # persists it in the curriculum sidecars, train.py:581-586).
        assert loaded.get("w1")["times_used"] == 1
        assert loaded.get("w2")["times_used"] == 0

    def test_store_times_used_increments(self, tmp_path):
        """Default update increments the counter like the reference's
        ``curriculum[wav]['times_used'] + 1`` (reference train.py:581-586),
        including across a save/load cycle and for unseen wavs."""
        store = CurriculumStore(["w1"])
        store.update("w1", "r", "h", None, 0.2, 0.3)
        store.update("w1", "r", "h", None, 0.2, 0.3)
        assert store.get("w1")["times_used"] == 2
        store.update("new_wav", "r", "h", None, 0.2, 0.3)
        assert store.get("new_wav")["times_used"] == 1
        path = tmp_path / "c.csv"
        store.save(str(path))
        loaded = CurriculumStore.load(str(path))
        loaded.update("w1", "r", "h", None, 0.2, 0.3)
        assert loaded.get("w1")["times_used"] == 3
        # explicit override still honored (reference passes it explicitly)
        loaded.update("w1", "r", "h", None, 0.2, 0.3, times_used=7)
        assert loaded.get("w1")["times_used"] == 7


class TestSamplers:
    def test_bucketing_covers_all_once(self):
        s = BucketingSampler(10, batch_size=3)
        seen = [i for b in s for i in b]
        assert sorted(seen) == list(range(10))
        assert len(s) == 4 and len(s.bins[-1]) == 1

    def test_bucketing_shuffle_epoch_deterministic(self):
        s1, s2 = BucketingSampler(20, 4), BucketingSampler(20, 4)
        s1.shuffle(5), s2.shuffle(5)
        assert s1.bins == s2.bins
        s2.shuffle(6)
        assert s1.bins != s2.bins

    def test_distributed_partition(self):
        n, bs, world = 17, 2, 4
        all_bins = []
        for rank in range(world):
            s = DistributedBucketingSampler(n, bs, num_replicas=world, rank=rank)
            bins = list(s)
            assert len(bins) == len(s)
            all_bins.append(bins)
        counts = [len(b) for b in all_bins]
        assert len(set(counts)) == 1  # equal bins per rank
        flat = [i for bins in all_bins for b in bins for i in b]
        assert set(flat) == set(range(n))  # covers all (with pad duplicates)

    def test_distributed_shuffle_agrees_across_ranks(self):
        samplers = [DistributedBucketingSampler(20, 2, 2, r) for r in range(2)]
        for s in samplers:
            s.shuffle(7)
        assert samplers[0].bins == samplers[1].bins


class TestCollate:
    def _samples(self, lens, tlens):
        rng = np.random.default_rng(0)
        return [{"audio": rng.standard_normal(l).astype(np.float32),
                 "target": rng.integers(1, 29, t).astype(np.int32),
                 "path": f"p{i}"} for i, (l, t) in enumerate(zip(lens, tlens))]

    def test_static_bucket_shapes(self):
        b = collate_batch(self._samples([15000, 9000], [12, 40]), 4)
        assert b["audio"].shape == (4, 16000)      # next 1 s boundary
        assert b["targets"].shape == (4, 50)        # min_target
        assert list(b["audio_lengths"][:2]) == [15000, 9000]
        assert list(b["valid"]) == [1, 1, 0, 0]
        assert b["paths"][2] == ""

    def test_same_bucket_same_shape(self):
        b1 = collate_batch(self._samples([17000], [55]), 2)
        b2 = collate_batch(self._samples([30000], [90]), 2)
        assert b1["audio"].shape == (2, 32000) == b2["audio"].shape
        assert b1["targets"].shape == (2, 100) == b2["targets"].shape

    def test_spect_mode(self):
        rng = np.random.default_rng(0)
        samples = [{"spect": rng.standard_normal((161, 73)).astype(np.float32),
                    "target": np.asarray([1, 2], np.int32), "path": "x"}]
        b = collate_batch(samples, 2)
        assert b["spect"].shape == (2, 161, 100)
        assert b["spect_lengths"][0] == 73


class TestDatasetLoader:
    def test_dataset_getitem(self, corpus):
        ds = AudioDataset({}, corpus["manifest"], ALPHABET)
        s = ds[0]
        assert s["audio"].dtype == np.float32
        assert s["target"].ndim == 1 and (s["target"] > 0).all()
        assert ds.get_reference_transcript(corpus["rows"][0][1]) != ""

    def test_dataset_augment_reproducible(self, corpus):
        conf = {"noise_prob": 0.9}
        ds = AudioDataset(conf, corpus["manifest"], ALPHABET, augment=True)
        a, b = ds[1]["audio"], ds[1]["audio"]
        np.testing.assert_array_equal(a, b)
        ds.set_curriculum_epoch(1)
        # epoch in the rng seed: different epoch may change augs; just loads
        assert ds[1]["audio"] is not None

    def test_spect_emit_parity_shape(self, corpus):
        ds = AudioDataset({}, corpus["manifest"], ALPHABET, emit="spect")
        s = ds[0]
        assert s["spect"].shape[0] == 161

    def test_curriculum_epoch_sampling(self, corpus):
        ds = AudioDataset({}, corpus["manifest"], ALPHABET)
        for wav, txt, _ in ds.all_ids:
            ds.update_curriculum(wav, "ref", "hyp", None, 0.2, 0.3)
        ds.set_curriculum_epoch(2, sample=True, sample_size=0.5)
        assert len(ds) >= 2
        ds.set_curriculum_epoch(3, sample=False)
        assert len(ds) == 4

    def test_loader_end_to_end(self, corpus):
        ds = AudioDataset({}, corpus["manifest"], ALPHABET)
        sampler = BucketingSampler(len(ds), batch_size=2)
        loader = AudioDataLoader(ds, sampler, batch_size=2, num_workers=2)
        batches = list(loader)
        assert len(batches) == 2
        for b in batches:
            assert b["audio"].shape[0] == 2
            assert b["valid"].sum() == 2

    def test_loader_mid_epoch_resume(self, corpus):
        ds = AudioDataset({}, corpus["manifest"], ALPHABET)
        sampler = BucketingSampler(len(ds), batch_size=1)
        loader = AudioDataLoader(ds, sampler, batch_size=1)
        rest = list(loader.iter_from(2))
        assert len(rest) == 2
