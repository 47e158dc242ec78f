"""Offline dataset builders.

Replaces `TransformerTTS/create_dataset.py` (metadata -> cleaned text ->
batch-phonemized cache -> seeded shuffle -> test/train metafiles -> per-
utterance mel npys) and the WaveRNN preprocessing (mel + quantized-sample
stores). Mel extraction runs jitted on the accelerator; phonemization is a
host subprocess fan-out.
"""
from __future__ import annotations

import pickle
from concurrent.futures import ThreadPoolExecutor
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


_PHONEME_BATCH = 250  # sentences per worker batch (`create_dataset.py:61`)


def _parallel_phonemize(phonemizer, texts, njobs):
    """Fan phonemization out over ``njobs`` threads in 250-sentence batches
    (the espeak backend shells out per chunk, so threads parallelize the
    subprocess wall time; `create_dataset.py:16,61` used joblib with the same
    batch size)."""
    if njobs <= 1 or len(texts) <= 1:
        return [phonemizer(t) for t in texts]
    batches = [texts[i:i + _PHONEME_BATCH]
               for i in range(0, len(texts), _PHONEME_BATCH)]

    def run(batch):
        return [phonemizer(t) for t in batch]

    with ThreadPoolExecutor(max_workers=njobs) as pool:
        out = []
        for res in pool.map(run, batches):
            out.extend(res)
    return out


def _pipelined_feature_extract(items, load_fn, compute_fn, save_fn, njobs,
                               progress=True):
    """IO-parallel / compute-serial extraction pipeline.

    ``load_fn(item)`` and ``save_fn(item, result)`` run on a thread pool
    (wav decode + npy writes release the GIL); ``compute_fn(item, loaded)``
    runs serially on the main thread (the accelerator serializes anyway).
    Mirrors the reference's ProcessPoolExecutor fan-out
    (`gst_tacotron/datasets/ljspeech.py:23-33`) without forking around JAX.
    """
    it = range(len(items))
    if progress:
        try:
            import tqdm
            it = tqdm.tqdm(it)
        except ImportError:
            pass
    results = []
    if njobs <= 1:
        for i in it:
            results.append(save_fn(items[i], compute_fn(items[i],
                                                        load_fn(items[i]))))
        return results
    with ThreadPoolExecutor(max_workers=njobs) as pool:
        window = njobs * 2  # bounded prefetch of loads
        loads = {i: pool.submit(load_fn, items[i])
                 for i in range(min(window, len(items)))}
        saves = []
        for i in it:
            loaded = loads.pop(i).result()
            nxt = i + window
            if nxt < len(items):
                loads[nxt] = pool.submit(load_fn, items[nxt])
            out = compute_fn(items[i], loaded)
            saves.append(pool.submit(save_fn, items[i], out))
        results = [s.result() for s in saves]
    return results


def build_tts_dataset(config: dict, *, cache_phonemes=True,
                      recompute_phonemes=False, column_sep="|", njobs=16,
                      phonemizer_backend=None, progress=True):
    """create_dataset.py:37-91 semantics: cleaned+phonemized metafiles and
    per-utterance mel .npy files (stored (t, n_mels) like the reference)."""
    data_dir = Path(config["data_directory"])
    target_dir = Path(config.get("train_data_directory") or data_dir)
    wav_dir = data_dir / config.get("wav_subdir_name", "wavs")
    meta_file = data_dir / config.get("metadata_filename", "metadata.csv")
    mel_dir = target_dir / "mels"
    mel_dir.mkdir(parents=True, exist_ok=True)

    phon_path = target_dir / "phonemes.npy"
    phonemizer_backend = phonemizer_backend or config.get(
        "phonemizer_backend")
    pipeline = Pipeline.default_training_pipeline(
        config["phoneme_language"], add_start_end=True, with_stress=False,
        backend=phonemizer_backend)
    if phon_path.exists() and not recompute_phonemes:
        audio_data = np.load(phon_path)
    else:
        rows = _read_metadata(meta_file, column_sep)
        cleaned = [(fn, pipeline.cleaner(tx)) for fn, tx in rows]
        phonemes = _parallel_phonemize(pipeline.phonemizer,
                                       [tx for _, tx in cleaned], njobs)
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

    def _load(row):
        y, _ = load_wav(str(wav_dir / (row[0] + ".wav")),
                        config["sampling_rate"])
        return y

    def _compute(row, y):
        return np.asarray(audio.mel_spectrogram(y))

    def _save(row, mel):
        np.save(mel_dir / row[0], mel.T)  # (t, n_mels), reference layout

    _pipelined_feature_extract(list(audio_data), _load, _compute, _save,
                               njobs, progress)
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
                          extension=".wav", njobs=16, progress=True):
    """WaveRNN preprocess: {out}/mel/*.npy ((n_mels, t), WaveRNN layout),
    {out}/quant/*.npy, {out}/dataset.pkl with ids."""
    out = Path(out_dir)
    (out / "mel").mkdir(parents=True, exist_ok=True)
    (out / "quant").mkdir(parents=True, exist_ok=True)
    audio = AudioProcessor({**config, "normalizer": "WaveRNN"})
    wavs = sorted(Path(wav_dir).glob(f"*{extension}"))

    def _load(w):
        y, _ = load_wav(str(w), config["sampling_rate"])
        return y

    def _compute(w, y):
        # vocoder convention: mel in [0, 1] ((x+4)/8 of the TTS range)
        mel = (np.asarray(audio.mel_spectrogram(y)) + 4.0) / 8.0
        quant = _quantize(y, mode, bits, mu_law, peak_norm)
        return mel, quant

    def _save(w, result):
        mel, quant = result
        item_id = w.stem
        np.save(out / "mel" / f"{item_id}.npy", mel.astype(np.float32))
        np.save(out / "quant" / f"{item_id}.npy", quant)
        return (item_id, mel.shape[-1])

    dataset = _pipelined_feature_extract(wavs, _load, _compute, _save, njobs,
                                         progress)
    with open(out / "dataset.pkl", "wb") as f:
        pickle.dump(dataset, f)
    return str(out)
