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


def build_tacotron_dataset(config: dict, *, out_dir=None, column_sep="|",
                           progress=True):
    """metadata.csv + wavs -> {out}/taco-linear-*.npy, taco-mel-*.npy,
    train.txt (`gst_tacotron/datasets/ljspeech.py:23-69` behavior)."""
    data_dir = Path(config["data_directory"])
    out = Path(out_dir or data_dir / "taco_training")
    out.mkdir(parents=True, exist_ok=True)
    wav_dir = data_dir / config.get("wav_subdir_name", "wavs")
    meta = data_dir / config.get("metadata_filename", "metadata.csv")

    rows = []
    with open(meta, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(column_sep)
            if len(parts) >= 2:
                name = parts[0].split(".")[0]
                rows.append((name, parts[-1]))

    lines = []
    it = rows
    if progress:
        try:
            import tqdm
            it = tqdm.tqdm(rows)
        except ImportError:
            pass
    for idx, (name, text) in enumerate(it):
        y, _ = load_wav(str(wav_dir / (name + ".wav")),
                        config["sampling_rate"])
        linear, mel = taco_linear_and_mel(y, config)
        lin_f = f"taco-linear-{idx:05d}.npy"
        mel_f = f"taco-mel-{idx:05d}.npy"
        np.save(out / lin_f, linear.astype(np.float32), allow_pickle=False)
        np.save(out / mel_f, mel.astype(np.float32), allow_pickle=False)
        lines.append(f"{lin_f}|{mel_f}|{linear.shape[0]}|{text}\n")
    with open(out / "train.txt", "w", encoding="utf-8") as f:
        f.writelines(lines)
    return str(out)
