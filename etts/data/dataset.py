"""Host-side input pipeline (tf-free, torch-free).

Replaces `TransformerTTS/preprocessing/data_handling.py` (generator Dataset,
DataPrepper sentinels, runtime batch-size switching) and the vocoder dataset /
random-crop collate of `WaveRNN/utility/dataset.py:16-91`.

TPU-specific design: padded batch shapes are rounded up to configurable
multiples (``pad_text_multiple`` / ``pad_mel_multiple``) so XLA sees a small,
bounded set of shapes instead of one compile per utterance length — the JAX
equivalent of the reference's implicit "retrace forever" tf.data behavior.
For data parallelism, ``Dataset`` can shard per host (``shard_index`` /
``num_shards``).
"""
from __future__ import annotations

import os
from random import Random
from typing import Callable, Optional, Sequence

import numpy as np

__all__ = ["load_files", "DataPrepper", "ForwardDataPrepper", "Dataset",
           "VocoderDataset", "collate_vocoder", "pad_to_multiple",
           "fast_forward_permutation"]


def fast_forward_permutation(rng, n_items: int, batch_size: int,
                             n_steps: int) -> int:
    """Resume helper for driver-local batch closures that draw
    ``rng.permutation(n_items)`` once per epoch (wavernn/tacotron): advance
    the generator past the epochs ``n_steps`` consumed batches span and
    return the in-epoch batch offset to skip. ``Dataset.seek`` is the
    full-featured equivalent for Dataset streams."""
    epoch_b = n_items // batch_size
    if not n_steps or not epoch_b:
        return 0
    n_epochs, skip = divmod(n_steps, epoch_b)
    for _ in range(n_epochs):
        rng.permutation(n_items)
    return skip


def load_files(metafile, mel_dir, spk_embed_dir=None, num_samples=None):
    """Parse an `id|text|phonemes` metafile into sample tuples
    (`data_handling.py:59-83`). Returns (samples, alphabet)."""
    samples, alphabet, count = [], set(), 0
    with open(metafile, "r", encoding="utf-8") as f:
        for line in f.readlines():
            parts = line.split("|")
            if len(parts) < 3:
                continue
            text = parts[1].strip().lower()
            phonemes = parts[2].strip()
            mel_file = os.path.join(str(mel_dir), parts[0] + ".npy")
            spk_file = (os.path.join(str(spk_embed_dir), parts[0] + ".npy")
                        if spk_embed_dir is not None else None)
            samples.append((phonemes, text, mel_file, spk_file))
            alphabet.update(list(text))
            count += 1
            if num_samples is not None and count > num_samples:
                break
    return samples, sorted(alphabet)


class DataPrepper:
    """Sample tuple -> (mel+sentinels, token ids, stop probs, spk embed)
    (`data_handling.py:86-108`): start vector +0.5 prepended, end vector -0.5
    appended, stop-prob 2 at the final frame, dummy [inf] when no speaker."""

    may_drop = False  # never returns None -> Dataset.seek can fast-forward

    def __init__(self, config: dict, tokenizer):
        self.start_vec = np.ones((1, config["mel_channels"])) * config["mel_start_value"]
        self.end_vec = np.ones((1, config["mel_channels"])) * config["mel_end_value"]
        self.tokenizer = tokenizer

    def __call__(self, sample):
        phonemes, text, mel_path, spk_path = sample
        mel = np.load(mel_path)
        spk = np.array([np.inf]) if spk_path is None else np.load(spk_path)
        return self._run(phonemes, text, mel, spk)

    def _run(self, phonemes, text, mel, spk_embed):
        tokens = np.asarray(self.tokenizer(phonemes), np.int32)
        norm_mel = np.concatenate([self.start_vec, mel, self.end_vec],
                                  axis=0).astype(np.float32)
        stop = np.ones(norm_mel.shape[0], np.int32)
        stop[-1] = 2
        return norm_mel, tokens, stop, np.asarray(spk_embed, np.float32)


class GTADataPrepper(DataPrepper):
    """DataPrepper plus a frozen checkpoint's teacher-forced (GTA) mel.

    Free-run-matched fine-tuning (VERDICT r4 #6): the decoder trains on the
    model's OWN predicted frames as input (the distribution it sees when
    free-running) while targets stay ground truth. `scripts/make_gta.py
    --tts_out` writes the aligned GTA mels; this prepper pairs each sample
    with its GTA mel (same sentinels, trimmed/padded to the GT length so the
    5-tuple collates shape-equal). Analogous to the reference's GTA vocoder
    workflow (`/root/reference/WaveRNN/utility/dataset.py:16-30`) applied one
    level up the stack."""

    def __init__(self, config: dict, tokenizer, gta_dir):
        super().__init__(config, tokenizer)
        self.gta_dir = str(gta_dir)

    def __call__(self, sample):
        phonemes, text, mel_path, spk_path = sample
        mel = np.load(mel_path)
        spk = np.array([np.inf]) if spk_path is None else np.load(spk_path)
        uid = os.path.splitext(os.path.basename(mel_path))[0]
        gta = np.load(os.path.join(self.gta_dir, uid + ".npy"))
        t = mel.shape[0]
        if gta.shape[0] < t:  # off-by-one safety: repeat-pad the last frame
            gta = np.concatenate(
                [gta, np.repeat(gta[-1:], t - gta.shape[0], 0)], axis=0)
        gta = gta[:t]
        norm_mel, tokens, stop, spk = self._run(phonemes, text, mel, spk)
        norm_gta = np.concatenate([self.start_vec, gta, self.end_vec],
                                  axis=0).astype(np.float32)
        return norm_mel, tokens, stop, spk, norm_gta


class ForwardDataPrepper:
    """npy triple (mel, phonemes, durations) loader (`data_handling.py:111-115`).

    Samples longer than ``max_frames`` (the Expand bucket) are skipped
    (returns None; the Dataset drops them)."""

    def __init__(self, max_frames: Optional[int] = None):
        self.max_frames = max_frames

    @property
    def may_drop(self):
        return self.max_frames is not None

    def __call__(self, sample):
        mel, tokens, durations = np.load(str(sample), allow_pickle=True)
        if self.max_frames is not None and mel.shape[0] > self.max_frames:
            return None
        return (np.asarray(mel, np.float32), np.asarray(tokens, np.int32),
                np.asarray(durations, np.float32))


def pad_to_multiple(n: int, m: Optional[int]) -> int:
    if not m:
        return n
    return ((n + m - 1) // m) * m


def _pad_batch(arrays, pad_multiple=None, extra_len=0):
    """Stack variable-length numpy arrays with trailing-zero padding on axis 0."""
    max_len = max(a.shape[0] for a in arrays) + extra_len
    max_len = pad_to_multiple(max_len, pad_multiple)
    out = np.zeros((len(arrays), max_len) + arrays[0].shape[1:],
                   arrays[0].dtype)
    for i, a in enumerate(arrays):
        out[i, :a.shape[0]] = a
    return out


class Dataset:
    """Shuffling, padded-batching, infinitely-repeating iterator over samples.

    API parity with `data_handling.py:10-56`: ``next_batch`` /
    ``all_batches`` / ``change_batches``. Adds per-host sharding and
    pad-to-multiple bucketing.
    """

    def __init__(self, samples, preprocessor: Callable, batch_size: int,
                 shuffle=True, drop_remainder=True, mel_channels=80, seed=42,
                 pad_text_multiple: Optional[int] = 8,
                 pad_mel_multiple: Optional[int] = 32,
                 shard_index: int = 0, num_shards: int = 1,
                 bucket_by_length: bool = False, bucket_groups: int = 32):
        self._random = Random(seed)
        self._samples = list(samples)[shard_index::num_shards]
        self.preprocessor = preprocessor
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.mel_channels = mel_channels
        self.pad_text_multiple = pad_text_multiple
        self.pad_mel_multiple = pad_mel_multiple
        # length bucketing: sort groups of batch_size*bucket_groups items by
        # output length, batch within a group, shuffle batch order
        # (datafeeder.py:87-92 / BinnedLengthSampler, dataset.py:189-218)
        self.bucket_by_length = bucket_by_length
        self.bucket_groups = bucket_groups
        self.data_iter = self._infinite_iter()

    def __len__(self):
        return len(self._samples)

    def _collate(self, items):
        if len(items[0]) == 4:  # autoregressive: (mel, tokens, stop, spk)
            mels, tokens, stops, spks = zip(*items)
            batch = (
                _pad_batch(mels, self.pad_mel_multiple),
                _pad_batch(tokens, self.pad_text_multiple),
                _pad_batch(stops, self.pad_mel_multiple),
                np.stack([np.atleast_1d(s) for s in spks]),
            )
            return batch
        if len(items[0]) == 5:  # GTA fine-tune: (..., gta_mel), see
            mels, tokens, stops, spks, gtas = zip(*items)  # GTADataPrepper
            return (
                _pad_batch(mels, self.pad_mel_multiple),
                _pad_batch(tokens, self.pad_text_multiple),
                _pad_batch(stops, self.pad_mel_multiple),
                np.stack([np.atleast_1d(s) for s in spks]),
                _pad_batch(gtas, self.pad_mel_multiple),
            )
        # forward: (mel, tokens, durations)
        mels, tokens, durs = zip(*items)
        return (_pad_batch(mels, self.pad_mel_multiple),
                _pad_batch(tokens, self.pad_text_multiple),
                _pad_batch(durs, self.pad_text_multiple))

    def _one_epoch(self, skip_batches: int = 0):
        samples = self._samples[:]
        if self.shuffle:
            self._random.shuffle(samples)
        if self.bucket_by_length:
            it = self._bucketed_epoch(samples)
            for _ in range(skip_batches):  # data-dependent sort -> replay
                next(it, None)
            yield from it
            return
        if skip_batches:
            # batch k is samples[k*bs:(k+1)*bs]: skipping needs no loads
            samples = samples[skip_batches * self.batch_size:]
        buf = []
        for s in samples:
            item = self.preprocessor(s)
            if item is None:
                continue
            buf.append(item)
            if len(buf) == self.batch_size:
                yield self._collate(buf)
                buf = []
        if buf and not self.drop_remainder:
            yield self._collate(buf)

    def _bucketed_epoch(self, samples):
        group_n = self.batch_size * self.bucket_groups
        for g in range(0, len(samples), group_n):
            items = [it for it in (self.preprocessor(s)
                                   for s in samples[g:g + group_n])
                     if it is not None]
            items.sort(key=lambda it: it[0].shape[0])  # by mel length
            batches = [items[i:i + self.batch_size]
                       for i in range(0, len(items), self.batch_size)]
            if self.drop_remainder and batches and \
                    len(batches[-1]) < self.batch_size:
                batches = batches[:-1]
            self._random.shuffle(batches)
            for b in batches:
                yield self._collate(b)

    def _infinite_iter(self, skip_batches: int = 0):
        while True:
            yield from self._one_epoch(skip_batches)
            skip_batches = 0

    def batches_per_epoch(self) -> Optional[int]:
        """Deterministic epoch batch count, or None when it depends on data
        (a drop-prone preprocessor makes batch composition data-dependent)."""
        if getattr(self.preprocessor, "may_drop", True):
            return None
        n, bs = len(self._samples), self.batch_size
        if not self.bucket_by_length:
            e = n // bs
            return e if self.drop_remainder else -(-n // bs)
        group_n = bs * self.bucket_groups
        total = 0
        for g in range(0, n, group_n):
            gl = min(group_n, n - g)
            total += gl // bs if self.drop_remainder else -(-gl // bs)
        return total

    def seek(self, n_batches: int):
        """Fast-forward the infinite stream by ``n_batches`` so a resumed run
        CONTINUES the data stream where the killed run stopped, instead of
        replaying it from batch 0 (the reference's tf.data generator restarts
        too — `data_handling.py:30-39` — so replay-from-0 is parity; this is
        the TPU-side improvement: no re-exposure to early batches, and no
        fresh (bucket-shape x current-r) compiles for shapes the original run
        only ever traced under earlier scheduled r values).

        Cost: skipped whole epochs advance the shuffle rng with same-length
        dummy shuffles (no sample loads); the in-epoch offset slices the
        sample list directly (non-bucketed) or replays at most one epoch
        (bucketing sorts by data-dependent mel length). Drop-prone
        preprocessors (ForwardDataPrepper with max_frames) replay the full
        stream — correct, just not O(1)."""
        if n_batches <= 0:
            return
        epoch = self.batches_per_epoch()
        if epoch == 0:
            # drop_remainder with fewer samples than one batch: the infinite
            # iterator never yields, so the next_batch() replay below would
            # hang silently. Fail fast instead (ADVICE r3).
            raise ValueError(
                f"Dataset.seek: dataset yields 0 batches per epoch "
                f"({len(self._samples)} samples < batch_size "
                f"{self.batch_size} with drop_remainder) — cannot resume a "
                "stream that never produced a batch")
        if epoch is None:
            for _ in range(n_batches):
                self.next_batch()
            return
        n_epochs, offset = divmod(n_batches, epoch)
        dummy = list(range(len(self._samples)))
        for _ in range(n_epochs):
            if self.shuffle:
                self._random.shuffle(dummy)  # same draws as a real epoch
            if self.bucket_by_length:
                group_n = self.batch_size * self.bucket_groups
                for g in range(0, len(self._samples), group_n):
                    gl = min(group_n, len(self._samples) - g)
                    nb = (gl // self.batch_size if self.drop_remainder
                          else -(-gl // self.batch_size))
                    self._random.shuffle(list(range(nb)))  # batch-order draw
        self.data_iter = self._infinite_iter(skip_batches=offset)

    def next_batch(self):
        return next(self.data_iter)

    def all_batches(self):
        return self._one_epoch()

    def change_batches(self, batch_size: int):
        """Runtime batch-size switching (`data_handling.py:41-46`; used by the
        MINE batch-size schedule)."""
        self.batch_size = batch_size
        self.data_iter = self._infinite_iter()


# ---------------------------------------------------------------------------
# Vocoder dataset (WaveRNN)
# ---------------------------------------------------------------------------

class VocoderDataset:
    """Paired {data}/mel/*.npy + {data}/quant/*.npy (or gta/) store
    (`WaveRNN/utility/dataset.py:16-30`). Mel files are (n_mels, t)."""

    def __init__(self, ids: Sequence[str], path: str, train_gta: bool = False):
        self.metadata = list(ids)
        self.mel_path = os.path.join(path, "gta" if train_gta else "mel")
        self.quant_path = os.path.join(path, "quant")

    def __getitem__(self, index):
        item_id = self.metadata[index]
        m = np.load(os.path.join(self.mel_path, f"{item_id}.npy"))
        x = np.load(os.path.join(self.quant_path, f"{item_id}.npy"))
        return m, x

    def __len__(self):
        return len(self.metadata)


def _label_to_float(x, bits):
    return 2.0 * x / (2 ** bits - 1.0) - 1.0


def collate_vocoder(batch, seq_len: int, hop_length: int, pad: int,
                    mode: str = "MOL", bits: int = 9,
                    rng: Optional[np.random.Generator] = None):
    """Random-crop collate (`WaveRNN/utility/dataset.py:65-91`): aligned mel
    window (with `pad` context) + quantized-sample window; returns
    (x[t], y[t+1], mels)."""
    rng = rng or np.random.default_rng()
    mel_win = seq_len // hop_length + 2 * pad
    max_offsets = [x[0].shape[-1] - 2 - (mel_win + 2 * pad) for x in batch]
    mel_offsets = [int(rng.integers(0, o)) for o in max_offsets]
    sig_offsets = [(o + pad) * hop_length for o in mel_offsets]
    mels = np.stack([x[0][:, mel_offsets[i]:mel_offsets[i] + mel_win]
                     for i, x in enumerate(batch)]).astype(np.float32)
    labels = np.stack([x[1][sig_offsets[i]:sig_offsets[i] + seq_len + 1]
                       for i, x in enumerate(batch)]).astype(np.int64)
    x = labels[:, :seq_len]
    y = labels[:, 1:]
    x_bits = 16 if mode == "MOL" else bits
    x = _label_to_float(x.astype(np.float32), x_bits)
    if mode == "MOL":
        y = _label_to_float(y.astype(np.float32), x_bits)
    # models take (b, t_mel, n_mels)
    return x, y, mels.transpose(0, 2, 1)


class Prefetcher:
    """Background-thread batch prefetch: overlaps host-side loading/collation
    with device compute (the role of the reference's DataFeeder thread +
    tf.FIFOQueue, `gst_tacotron/datasets/datafeeder.py:18-97`, and tf.data's
    prefetch). Wraps any object with ``next_batch()``."""

    def __init__(self, dataset, depth: int = 2, device_put=None):
        import queue
        import threading
        self.dataset = dataset
        self._q = queue.Queue(maxsize=depth)
        self._device_put = device_put
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            batch = self.dataset.next_batch()
            if self._device_put is not None:
                batch = self._device_put(batch)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.2)
                    break
                except Exception:  # queue.Full
                    continue

    def next_batch(self):
        return self._q.get()

    def change_batches(self, batch_size: int):
        # drain, switch, refill
        self.dataset.change_batches(batch_size)
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass

    def stop(self):
        self._stop.set()
