"""Word error rate with the reference's number-normalization
(`objective_measure.py:101-137`: jiwer + num2words replaced by a pure
Levenshtein + our verbalizer). ASR transcription is gated on the optional
SpeechRecognition package (network ASR is unavailable offline)."""
from __future__ import annotations

import re

import numpy as np

from ..text.numbers_en import number_to_words

__all__ = ["wer", "normalize_for_wer", "transcribe"]

_num_re = re.compile(r"[0-9]+")
_punct_re = re.compile(r"[^\w\s']")


def normalize_for_wer(text: str) -> list[str]:
    """lowercase, verbalize digits, strip punctuation, split words."""
    text = text.lower()
    text = _num_re.sub(lambda m: number_to_words(int(m.group(0)), andword=""),
                       text)
    text = _punct_re.sub(" ", text)
    return text.split()


def _edit_distance(ref: list, hyp: list) -> int:
    n, m = len(ref), len(hyp)
    prev = np.arange(m + 1)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i
        for j in range(1, m + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return int(prev[m])


def wer(reference: str, hypothesis: str) -> float:
    ref = normalize_for_wer(reference)
    hyp = normalize_for_wer(hypothesis)
    if not ref:
        return 0.0 if not hyp else 1.0
    return _edit_distance(ref, hyp) / len(ref)


_W2V2 = {}


def _transcribe_wav2vec2(wav, sr_hz):
    """Offline ASR via a locally-cached HuggingFace wav2vec2 CTC model
    (greedy decode). Returns None when no weights are cached (zero-egress
    environments cannot download them)."""
    try:
        import torch
        from transformers import (Wav2Vec2ForCTC, Wav2Vec2Processor)
        name = "facebook/wav2vec2-base-960h"
        if "model" not in _W2V2:
            _W2V2["proc"] = Wav2Vec2Processor.from_pretrained(
                name, local_files_only=True)
            _W2V2["model"] = Wav2Vec2ForCTC.from_pretrained(
                name, local_files_only=True).eval()
    except Exception:  # noqa: BLE001 — no package or no cached weights
        return None
    try:
        proc, model = _W2V2["proc"], _W2V2["model"]
        if sr_hz != 16000:
            from scipy.signal import resample_poly
            wav = resample_poly(np.asarray(wav, np.float64), 16000, sr_hz)
        inputs = proc(np.asarray(wav, np.float32), sampling_rate=16000,
                      return_tensors="pt")
        with torch.no_grad():
            logits = model(inputs.input_values).logits
        ids = logits.argmax(-1)[0]
        return proc.decode(ids)
    except Exception:  # noqa: BLE001 — degenerate input (e.g. shorter than
        # the conv receptive field) must not escape: transcribe() contracts
        # to return None so callers fall through to the next backend instead
        # of zeroing every metric for the pair (objective_measure catch-all)
        return None


def transcribe(wav_path: str):
    """ASR for the WER-syn/WER-ori regime (objective_measure.py:101-137).

    Backends, in order: (1) the reference's Google recognizer via the
    optional SpeechRecognition package (needs network); (2) offline
    wav2vec2-CTC when its weights are in the local HF cache; (3) the repo's
    own tiny char-CTC transcriber when a checkpoint is registered
    (``ETTS_CTC_ASR=<ckpt.npz>`` or ``ctc_asr.set_default_model`` — train one
    offline with ``scripts/train_ctc_asr.py``; smoke-level, see its module
    docstring). Returns None when none is available — the CSV then carries
    an empty WER column, documented in PARITY.md."""
    try:
        import speech_recognition as sr
        r = sr.Recognizer()
        with sr.AudioFile(wav_path) as source:
            audio = r.record(source)
        return r.recognize_google(audio)
    except Exception:  # noqa: BLE001
        pass
    try:
        from ..data.audio_io import load_wav
        wav, sr_hz = load_wav(wav_path)
    except Exception:  # noqa: BLE001
        return None
    out = _transcribe_wav2vec2(wav, sr_hz)
    if out is not None:
        return out
    try:
        from .ctc_asr import default_transcriber
        tr = default_transcriber()
        if tr is not None:
            return tr.transcribe_wav(wav, sr_hz)
    except Exception:  # noqa: BLE001
        pass
    return None
