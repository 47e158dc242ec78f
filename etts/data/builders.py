"""Offline dataset builders.

Replaces `TransformerTTS/create_dataset.py` (metadata -> cleaned text ->
batch-phonemized cache -> seeded shuffle -> test/train metafiles -> per-
utterance mel npys) and the WaveRNN preprocessing (mel + quantized-sample
stores). Mel extraction runs jitted on the accelerator; phonemization is a
host subprocess fan-out.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from ..ops.audio import AudioProcessor
from ..ops.normalizers import mu_law_encode, float_to_label
from ..text import Pipeline
from .audio_io import load_wav

__all__ = ["build_tts_dataset", "build_vocoder_dataset"]


def _read_metadata(meta_file, column_sep="|"):
    rows = []
    with open(meta_file, "r", encoding="utf-8") as f:
        for line in f.readlines():
            parts = line.split(column_sep)
            filename, text = parts[0], parts[-1].strip()
            if filename.endswith(".wav"):
                filename = filename.split(".")[0]
            rows.append((filename, text))
    return rows


def build_tts_dataset(config: dict, *, cache_phonemes=True,
                      recompute_phonemes=False, column_sep="|", njobs=16,
                      phonemizer_backend=None, progress=True):
    """create_dataset.py:37-91 semantics: cleaned+phonemized metafiles and
    per-utterance mel .npy files (stored (t, n_mels) like the reference)."""
    del njobs  # phonemizer backend fans out internally when using espeak
    data_dir = Path(config["data_directory"])
    target_dir = Path(config.get("train_data_directory") or data_dir)
    wav_dir = data_dir / config.get("wav_subdir_name", "wavs")
    meta_file = data_dir / config.get("metadata_filename", "metadata.csv")
    mel_dir = target_dir / "mels"
    mel_dir.mkdir(parents=True, exist_ok=True)

    phon_path = target_dir / "phonemes.npy"
    pipeline = Pipeline.default_training_pipeline(
        config["phoneme_language"], add_start_end=True, with_stress=False,
        backend=phonemizer_backend)
    if phon_path.exists() and not recompute_phonemes:
        audio_data = np.load(phon_path)
    else:
        rows = _read_metadata(meta_file, column_sep)
        cleaned = [(fn, pipeline.cleaner(tx)) for fn, tx in rows]
        phonemes = [pipeline.phonemizer(tx) for _, tx in cleaned]
        audio_data = np.array([(fn, tx, ph) for (fn, tx), ph in
                               zip(cleaned, phonemes)])
        if cache_phonemes:
            np.save(phon_path, audio_data, allow_pickle=True)

    np.random.seed(42)
    np.random.shuffle(audio_data)
    n_test = int(config.get("n_test", 100))
    lines = ["|".join([fn, tx, ph]) + "\n" for fn, tx, ph in audio_data]
    with open(target_dir / "test_metafile.txt", "w+", encoding="utf-8") as f:
        f.writelines(lines[:n_test])
    with open(target_dir / "train_metafile.txt", "w+", encoding="utf-8") as f:
        f.writelines(lines[n_test:-1] if len(lines) > n_test + 1 else lines[n_test:])

    audio = AudioProcessor(config)
    it = audio_data
    if progress:
        try:
            import tqdm
            it = tqdm.tqdm(audio_data)
        except ImportError:
            pass
    for row in it:
        filename = row[0]
        y, _ = load_wav(str(wav_dir / (filename + ".wav")),
                        config["sampling_rate"])
        mel = np.asarray(audio.mel_spectrogram(y))
        np.save(mel_dir / filename, mel.T)  # (t, n_mels), reference layout
    return str(target_dir)


def _quantize(y, mode: str, bits: int, mu_law: bool, peak_norm: bool):
    if peak_norm:
        y = y / max(np.max(np.abs(y)), 1e-8)
    if mode == "RAW":
        if mu_law:
            q = np.asarray(mu_law_encode(y, 2 ** bits))
        else:
            q = np.asarray(float_to_label(y, bits))
    else:  # MOL: 16-bit labels
        q = np.asarray(float_to_label(y, 16))
    return q.astype(np.int64)


def build_vocoder_dataset(wav_dir, out_dir, config: dict, *, mode="MOL",
                          bits=9, mu_law=True, peak_norm=False,
                          extension=".wav", progress=True):
    """WaveRNN preprocess: {out}/mel/*.npy ((n_mels, t), WaveRNN layout),
    {out}/quant/*.npy, {out}/dataset.pkl with ids."""
    out = Path(out_dir)
    (out / "mel").mkdir(parents=True, exist_ok=True)
    (out / "quant").mkdir(parents=True, exist_ok=True)
    audio = AudioProcessor({**config, "normalizer": "WaveRNN"})
    wavs = sorted(Path(wav_dir).glob(f"*{extension}"))
    dataset = []
    it = wavs
    if progress:
        try:
            import tqdm
            it = tqdm.tqdm(wavs)
        except ImportError:
            pass
    for w in it:
        y, _ = load_wav(str(w), config["sampling_rate"])
        # vocoder convention: mel in [0, 1] ((x+4)/8 of the TTS range)
        mel = (np.asarray(audio.mel_spectrogram(y)) + 4.0) / 8.0
        quant = _quantize(y, mode, bits, mu_law, peak_norm)
        item_id = w.stem
        np.save(out / "mel" / f"{item_id}.npy", mel.astype(np.float32))
        np.save(out / "quant" / f"{item_id}.npy", quant)
        dataset.append((item_id, mel.shape[-1]))
    with open(out / "dataset.pkl", "wb") as f:
        pickle.dump(dataset, f)
    return str(out)
