"""GST-Tacotron offline preprocessing.

Replaces `gst_tacotron/preprocess.py` + `datasets/{ljspeech,blizzard,
blizzard2013}.py`: per-utterance linear + mel spectrogram npys and a
`train.txt` metadata file (`linear_file|mel_file|n_frames|text`), with the
TF1-flavor audio chain (`gst_tacotron/util/audio.py`): preemphasis 0.97, dB
with ref level 20, [0, 1] normalization, LINEAR spectrograms for the
Griffin-Lim head.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..ops.stft import stft, mel_filterbank
from ..ops.normalizers import amp_to_db, normalize_db, preemphasis
from .audio_io import load_wav

__all__ = ["build_tacotron_dataset", "taco_linear_and_mel", "find_endpoint"]


def taco_linear_and_mel(wav, config):
    """wav -> (linear (t, n_freq), mel (t, n_mels)) in Tacotron's [0,1]
    convention (gst_tacotron/util/audio.py:94-118)."""
    import jax.numpy as jnp
    y = preemphasis(jnp.asarray(wav, jnp.float32),
                    config.get("preemphasis", 0.97))
    D = stft(y, config["n_fft"], config["hop_length"], config["win_length"])
    mag = jnp.abs(D)
    ref_db = config.get("ref_level_db", 20)
    min_db = config.get("min_level_db", -100)
    linear = normalize_db(amp_to_db(mag) - ref_db, min_db)
    basis = jnp.asarray(mel_filterbank(config["sampling_rate"],
                                       config["n_fft"],
                                       config["mel_channels"],
                                       config.get("f_min", 0) or 0,
                                       config.get("f_max")))
    mel = normalize_db(amp_to_db(basis @ mag) - ref_db, min_db)
    return np.asarray(linear).T, np.asarray(mel).T


def find_endpoint(wav, sample_rate, threshold_db=-40.0, min_silence_sec=0.8):
    """First long-silence endpoint (gst_tacotron/util/audio.py:55-62)."""
    window = int(sample_rate * min_silence_sec)
    hop = window // 4
    threshold = 10 ** (threshold_db / 20.0)
    for x in range(hop, len(wav) - window, hop):
        if np.max(np.abs(wav[x:x + window])) < threshold:
            return x + hop
    return len(wav)


def _iter_ljspeech(data_dir, config, column_sep="|"):
    """metadata.csv rows `id|...|text` + wavs/ (ljspeech.py / blizzard2013.py
    layout: blizzard2013-segmented uses the same metafile|wav scheme)."""
    wav_dir = Path(data_dir) / config.get("wav_subdir_name", "wavs")
    meta = Path(data_dir) / config.get("metadata_filename", "metadata.csv")
    with open(meta, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(column_sep)
            if len(parts) >= 2:
                name = parts[0].split(".")[0]
                yield str(wav_dir / (name + ".wav")), parts[-1], None


def _parse_blizzard_labels(path, end_buffer=0.05):
    """.lab silence trimming offsets (blizzard.py:62-75)."""
    labels = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) >= 3:
                labels.append((float(parts[0]), " ".join(parts[2:])))
    start, end = 0.0, None
    if labels and labels[0][1] == "sil":
        start = labels[0][0]
    if len(labels) >= 2 and labels[-1][1] == "sil":
        end = labels[-2][0] + end_buffer
    return start, end


def _iter_blizzard(data_dir, config,
                   books=("ATrampAbroad", "TheManThatCorruptedHadleyburg"),
                   min_confidence=90.0):
    """Blizzard audiobook layout: per-book sentence_index.txt (tab-separated,
    confidence-filtered) + wav/ + lab/ silence labels (blizzard.py:21-37)."""
    for book in books:
        index_file = Path(data_dir) / book / "sentence_index.txt"
        if not index_file.exists():
            continue
        with open(index_file, encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split("\t")
                if line.startswith("#") or len(parts) != 8:
                    continue
                if float(parts[3]) <= min_confidence:
                    continue
                wav = Path(data_dir) / book / "wav" / f"{parts[0]}.wav"
                lab = Path(data_dir) / book / "lab" / f"{parts[0]}.lab"
                trim = _parse_blizzard_labels(lab) if lab.exists() else None
                yield str(wav), parts[5], trim


DATASET_FORMATS = {"ljspeech": _iter_ljspeech, "blizzard2013": _iter_ljspeech,
                   "blizzard": _iter_blizzard}


def build_tacotron_dataset(config: dict, *, out_dir=None, column_sep="|",
                           dataset_format: str = "ljspeech",
                           max_out_frames: int | None = None,
                           njobs: int = 16, progress=True):
    """wavs + metadata -> {out}/taco-linear-*.npy, taco-mel-*.npy, train.txt
    (`gst_tacotron/preprocess.py` dispatch over `datasets/{ljspeech,blizzard,
    blizzard2013}.py`). ``dataset_format`` selects the reader; blizzard trims
    leading/trailing silence from .lab labels and drops over-length
    utterances, as the reference does."""
    data_dir = Path(config["data_directory"])
    out = Path(out_dir or data_dir / "taco_training")
    out.mkdir(parents=True, exist_ok=True)
    reader = DATASET_FORMATS[dataset_format]
    rows = list(reader(data_dir, config, column_sep) if
                dataset_format in ("ljspeech", "blizzard2013")
                else reader(data_dir, config))

    from .builders import _pipelined_feature_extract

    sr = config["sampling_rate"]

    def _load(item):
        _, (wav_path, text, trim) = item
        y, _ = load_wav(wav_path, sr)
        if trim is not None:
            start, end = trim
            y = y[int(start * sr): int(end * sr) if end else len(y)]
        return y

    def _compute(item, y):
        if max_out_frames is not None and \
                len(y) > max_out_frames * config["hop_length"]:
            return None  # over-length: dropped, as the reference does
        return taco_linear_and_mel(y, config)

    def _save(item, result):
        if result is None:
            return None
        idx, (_, text, _) = item
        linear, mel = result
        lin_f = f"taco-linear-{idx:05d}.npy"
        mel_f = f"taco-mel-{idx:05d}.npy"
        np.save(out / lin_f, linear.astype(np.float32), allow_pickle=False)
        np.save(out / mel_f, mel.astype(np.float32), allow_pickle=False)
        return f"{lin_f}|{mel_f}|{linear.shape[0]}|{text}\n"

    lines = _pipelined_feature_extract(list(enumerate(rows)), _load, _compute,
                                       _save, njobs, progress)
    with open(out / "train.txt", "w", encoding="utf-8") as f:
        f.writelines([ln for ln in lines if ln is not None])
    return str(out)
