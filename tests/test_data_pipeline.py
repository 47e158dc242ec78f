"""Data pipeline tests: DataPrepper sentinels, padded batching, bucketing,
batch-size switching, vocoder collate, taco preprocessing."""
import numpy as np
import pytest

from etts.data import (Dataset, DataPrepper, load_files, collate_vocoder,
                       pad_to_multiple)
from etts.text import Pipeline


class FakeTokenizer:
    def __call__(self, phonemes):
        return [ord(c) % 50 + 1 for c in phonemes]


def _mk_samples(tmp_path, n=7, rng=None):
    rng = rng or np.random.default_rng(0)
    meldir = tmp_path / "mels"
    meldir.mkdir(exist_ok=True)
    lines = []
    for i in range(n):
        mel = rng.standard_normal((10 + 3 * i, 8)).astype(np.float32)
        np.save(meldir / f"u{i}.npy", mel)
        lines.append(f"u{i}|text {i}|fonemz{i}\n")
    meta = tmp_path / "meta.txt"
    meta.write_text("".join(lines))
    return meta, meldir


CONFIG = dict(mel_channels=8, mel_start_value=0.5, mel_end_value=-0.5)


class TestDataPrepper:
    def test_sentinels_and_stop(self, tmp_path):
        meta, meldir = _mk_samples(tmp_path)
        samples, alphabet = load_files(meta, meldir)
        prep = DataPrepper(CONFIG, FakeTokenizer())
        mel, tokens, stop, spk = prep(samples[0])
        np.testing.assert_allclose(mel[0], 0.5)   # start vector
        np.testing.assert_allclose(mel[-1], -0.5)  # end vector
        assert stop[-1] == 2 and (stop[:-1] == 1).all()
        assert spk[0] == np.inf  # dummy no-speaker marker

    def test_load_files_limits(self, tmp_path):
        meta, meldir = _mk_samples(tmp_path)
        samples, _ = load_files(meta, meldir, num_samples=3)
        assert len(samples) == 4  # reference counts with > (off-by-one kept)


class TestDataset:
    def _ds(self, tmp_path, **kw):
        meta, meldir = _mk_samples(tmp_path)
        samples, _ = load_files(meta, meldir)
        prep = DataPrepper(CONFIG, FakeTokenizer())
        return Dataset(samples, prep, batch_size=2, mel_channels=8,
                       pad_mel_multiple=16, pad_text_multiple=8, **kw)

    def test_padded_shapes(self, tmp_path):
        ds = self._ds(tmp_path)
        mel, tokens, stop, spk = ds.next_batch()
        assert mel.shape[0] == 2 and mel.shape[1] % 16 == 0
        assert tokens.shape[1] % 8 == 0
        assert stop.shape[1] == mel.shape[1]

    def test_infinite_iteration(self, tmp_path):
        ds = self._ds(tmp_path)
        for _ in range(10):  # > one epoch of 3 batches
            ds.next_batch()

    @pytest.mark.parametrize("n_skip", [1, 3, 7, 11])
    def test_seek_matches_consumed_stream(self, tmp_path, n_skip):
        # seek(n) == consuming n batches: the resumed stream must continue
        # exactly where the killed run stopped (incl. across epochs; 7
        # samples / batch 2 -> 3 batches per epoch)
        ref = self._ds(tmp_path)
        for _ in range(n_skip):
            ref.next_batch()
        ds = self._ds(tmp_path)
        assert ds.batches_per_epoch() == 3
        ds.seek(n_skip)
        for _ in range(4):
            want, got = ref.next_batch(), ds.next_batch()
            for w, g in zip(want, got):
                np.testing.assert_array_equal(w, g)

    @pytest.mark.parametrize("n_skip", [2, 5])
    def test_seek_bucketed(self, tmp_path, n_skip):
        kw = dict(bucket_by_length=True, bucket_groups=2)
        ref = self._ds(tmp_path, **kw)
        for _ in range(n_skip):
            ref.next_batch()
        ds = self._ds(tmp_path, **kw)
        ds.seek(n_skip)
        for _ in range(4):
            want, got = ref.next_batch(), ds.next_batch()
            for w, g in zip(want, got):
                np.testing.assert_array_equal(w, g)

    def test_seek_zero_batches_per_epoch_fails_fast(self, tmp_path):
        # fewer samples than one batch under drop_remainder: the stream
        # never yields, so seek must raise, not hang in next_batch()
        meta, meldir = _mk_samples(tmp_path, n=3)
        samples, _ = load_files(meta, meldir)
        prep = DataPrepper(CONFIG, FakeTokenizer())
        ds = Dataset(samples, prep, batch_size=64, mel_channels=8,
                     pad_mel_multiple=16, pad_text_multiple=8,
                     drop_remainder=True)
        assert ds.batches_per_epoch() == 0
        with pytest.raises(ValueError, match="0 batches per epoch"):
            ds.seek(5)

    def test_seek_drop_prone_replays(self, tmp_path):
        # a drop-prone preprocessor has no static epoch structure: seek must
        # still produce the stream-continuation semantics (replay path)
        from etts.data import ForwardDataPrepper
        rng = np.random.default_rng(3)
        files = []
        for i in range(6):
            mel = rng.standard_normal((20 + 30 * i, 8)).astype(np.float32)
            tok = np.arange(4 + i, dtype=np.int32)
            dur = np.ones(4 + i, np.float32)
            f = tmp_path / f"fwd{i}.npy"
            np.save(f, np.array([mel, tok, dur], dtype=object),
                    allow_pickle=True)
            files.append(f)
        prep = ForwardDataPrepper(max_frames=120)  # drops the longest mels
        assert prep.may_drop
        mk = lambda: Dataset(files, prep, batch_size=2, mel_channels=8,
                             pad_mel_multiple=128)
        assert mk().batches_per_epoch() is None
        ref = mk()
        for _ in range(3):
            ref.next_batch()
        ds = mk()
        ds.seek(3)
        for _ in range(3):
            want, got = ref.next_batch(), ds.next_batch()
            for w, g in zip(want, got):
                np.testing.assert_array_equal(w, g)

    def test_change_batches(self, tmp_path):
        ds = self._ds(tmp_path)
        ds.change_batches(3)
        mel, *_ = ds.next_batch()
        assert mel.shape[0] == 3

    def test_sharding_partitions(self, tmp_path):
        meta, meldir = _mk_samples(tmp_path)
        samples, _ = load_files(meta, meldir)
        prep = DataPrepper(CONFIG, FakeTokenizer())
        d0 = Dataset(samples, prep, 1, shard_index=0, num_shards=2,
                     mel_channels=8)
        d1 = Dataset(samples, prep, 1, shard_index=1, num_shards=2,
                     mel_channels=8)
        assert len(d0) + len(d1) == len(samples)

    def test_bucketing_reduces_padding(self, tmp_path):
        ds_plain = self._ds(tmp_path, bucket_by_length=False)
        ds_bucket = self._ds(tmp_path, bucket_by_length=True, bucket_groups=4)

        def padding_waste(ds):
            waste = 0
            for batch in ds.all_batches():
                mel = batch[0]
                real = (np.abs(mel).sum(-1) > 0).sum()
                waste += mel.shape[0] * mel.shape[1] - real
            return waste

        assert padding_waste(ds_bucket) <= padding_waste(ds_plain)


class TestVocoderCollate:
    def test_window_alignment(self):
        rng = np.random.default_rng(0)
        hop, pad, seq = 10, 2, 50
        items = []
        for _ in range(3):
            t_mel = 30
            mel = rng.standard_normal((8, t_mel)).astype(np.float32)
            quant = rng.integers(0, 512, t_mel * hop)
            items.append((mel, quant))
        x, y, mels = collate_vocoder(items, seq, hop, pad, mode="RAW", bits=9,
                                     rng=rng)
        assert x.shape == (3, seq) and y.shape == (3, seq)
        assert mels.shape == (3, seq // hop + 2 * pad, 8)
        assert np.abs(x).max() <= 1.0
        assert y.max() < 512 and y.min() >= 0

    def test_mol_mode_float_targets(self):
        rng = np.random.default_rng(1)
        items = [(rng.standard_normal((8, 30)).astype(np.float32),
                  rng.integers(0, 2 ** 16, 300)) for _ in range(2)]
        x, y, mels = collate_vocoder(items, 50, 10, 2, mode="MOL", rng=rng)
        assert np.abs(y).max() <= 1.0  # float targets in MOL mode


class TestTacoBuilder:
    def test_linear_and_mel(self):
        from etts.data.taco_builders import taco_linear_and_mel, find_endpoint
        cfg = dict(sampling_rate=16000, n_fft=2048, hop_length=200,
                   win_length=800, mel_channels=80, f_min=40, f_max=None,
                   preemphasis=0.97, ref_level_db=20, min_level_db=-100)
        t = np.arange(8000) / 16000
        y = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        linear, mel = taco_linear_and_mel(y, cfg)
        assert linear.shape[1] == 1025 and mel.shape[1] == 80
        assert linear.shape[0] == mel.shape[0]
        assert 0.0 <= linear.min() and linear.max() <= 1.0
        # endpoint on signal+silence
        sig = np.concatenate([y, np.zeros(16000 * 2, np.float32)])
        ep = find_endpoint(sig, 16000)
        assert 7000 < ep < 16000 * 1.5


class TestTransplant:
    def test_transplant_and_freeze_mask(self):
        import jax.numpy as jnp
        from etts.train.transplant import (transplant_params,
                                           text_encoder_freeze_mask)
        target = {"TextEncoder": {"w": jnp.zeros((3, 3))},
                  "Decoder": {"w": jnp.zeros((2,))}}
        donor = {"TextEncoder": {"w": jnp.ones((3, 3))},
                 "Decoder": {"w": jnp.ones((4,))}}  # shape mismatch
        new, copied, skipped = transplant_params(target, donor)
        assert copied == 1
        np.testing.assert_allclose(np.asarray(new["TextEncoder"]["w"]), 1.0)
        np.testing.assert_allclose(np.asarray(new["Decoder"]["w"]), 0.0)
        # text-only transplant
        new2, c2, _ = transplant_params(target, donor, only_text_encoder=True)
        assert c2 == 1
        mask = text_encoder_freeze_mask(target)
        assert mask["TextEncoder"]["w"] is True
        assert mask["Decoder"]["w"] is False


class TestPrefetcher:
    def test_prefetch_delivers_batches(self, tmp_path):
        from etts.data import Prefetcher
        meta, meldir = _mk_samples(tmp_path)
        samples, _ = load_files(meta, meldir)
        prep = DataPrepper(CONFIG, FakeTokenizer())
        ds = Prefetcher(Dataset(samples, prep, 2, mel_channels=8))
        shapes = set()
        for _ in range(6):
            mel, tokens, stop, spk = ds.next_batch()
            assert mel.shape[0] == 2
            shapes.add(mel.shape)
        ds.stop()


class TestParallelBuilders:
    """njobs fan-out must be byte-identical to the serial path."""

    def _mk_wavs(self, tmp_path, n=5, sr=8000):
        from etts.data.audio_io import save_wav
        rng = np.random.default_rng(0)
        wav_dir = tmp_path / "wavs"
        wav_dir.mkdir()
        for i in range(n):
            save_wav(0.4 * rng.standard_normal(sr // 2 + 256 * i),
                     str(wav_dir / f"u{i}.wav"), sr)
        return wav_dir

    def test_vocoder_builder_njobs_equivalence(self, tmp_path):
        from etts.data.builders import build_vocoder_dataset
        cfg = dict(sampling_rate=8000, n_fft=512, hop_length=128,
                   win_length=512, mel_channels=8, f_min=0, f_max=None)
        wav_dir = self._mk_wavs(tmp_path)
        out1 = build_vocoder_dataset(wav_dir, tmp_path / "s1", cfg, mode="RAW",
                                     bits=9, njobs=1, progress=False)
        out4 = build_vocoder_dataset(wav_dir, tmp_path / "s4", cfg, mode="RAW",
                                     bits=9, njobs=4, progress=False)
        import pickle as pkl
        with open(f"{out1}/dataset.pkl", "rb") as f:
            d1 = pkl.load(f)
        with open(f"{out4}/dataset.pkl", "rb") as f:
            d4 = pkl.load(f)
        assert d1 == d4 and len(d1) == 5
        for item_id, _ in d1:
            np.testing.assert_array_equal(
                np.load(f"{out1}/mel/{item_id}.npy"),
                np.load(f"{out4}/mel/{item_id}.npy"))
            np.testing.assert_array_equal(
                np.load(f"{out1}/quant/{item_id}.npy"),
                np.load(f"{out4}/quant/{item_id}.npy"))

    def test_parallel_phonemize_matches_serial(self):
        from etts.data.builders import _parallel_phonemize
        from etts.text.tokenizer import GraphemeBackend
        texts = [f"hello world number {i}" for i in range(600)]
        ph = GraphemeBackend()
        assert _parallel_phonemize(ph, texts, 1) == \
            _parallel_phonemize(ph, texts, 8)


class TestFastForwardPermutation:
    @pytest.mark.parametrize("n_steps", [0, 2, 5, 13])
    def test_matches_consumed_stream(self, n_steps):
        from etts.data import fast_forward_permutation
        n, bs = 11, 2  # 5 batches/epoch
        def stream(rng, skip=0):
            while True:
                order = rng.permutation(n)
                start = skip * bs
                skip = 0
                for i in range(start, len(order) - bs + 1, bs):
                    yield tuple(order[i:i + bs])
        ref = stream(np.random.default_rng(9))
        for _ in range(n_steps):
            next(ref)
        rng2 = np.random.default_rng(9)
        skip = fast_forward_permutation(rng2, n, bs, n_steps)
        got = stream(rng2, skip)
        for _ in range(7):
            assert next(ref) == next(got)
