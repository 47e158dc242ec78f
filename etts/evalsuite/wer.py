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


def transcribe(wav_path: str):
    """Google ASR via the optional SpeechRecognition package (the reference's
    recognizer, objective_measure.py:101-137); None offline."""
    try:
        import speech_recognition as sr
    except ImportError:
        return None
    r = sr.Recognizer()
    with sr.AudioFile(wav_path) as source:
        audio = r.record(source)
    try:
        return r.recognize_google(audio)
    except Exception:  # noqa: BLE001
        return None
