"""Amplitude/dB normalizers, mu-law companding, preemphasis, quantization.

Covers the reference's three normalization families:
  - ``MelGAN``  — log of clipped amplitude (`TransformerTTS/utils/audio.py:86-96`)
  - ``WaveRNNNorm`` — amp->dB->[0,1]->[-4,4] (`TransformerTTS/utils/audio.py:99-119`)
  - WaveRNN vocoder dB normalization with ref level (`WaveRNN/utility/dsp.py:54-79`)
plus mu-law encode/decode and label<->float quantization
(`WaveRNN/utility/dsp.py:8-15,94-105`) and preemphasis IIR filters
(`WaveRNN/utility/dsp.py:86-91`, `gst_tacotron/util/audio.py`).

All functions accept jnp or np arrays and stay jittable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "amp_to_db", "db_to_amp", "MelGAN", "WaveRNNNorm", "get_normalizer",
    "normalize_db", "denormalize_db", "spectrogram_db", "mu_law_encode",
    "mu_law_decode", "label_to_float", "float_to_label", "preemphasis",
    "deemphasis",
]


def amp_to_db(x):
    return 20.0 * jnp.log10(jnp.maximum(1e-5, x))


def db_to_amp(x):
    return jnp.power(10.0, x * 0.05)


class MelGAN:
    """log of clipped amplitude mel (reference `utils/audio.py:86-96`)."""

    clip_min = 1.0e-5

    def __init__(self, config: dict | None = None):
        del config

    def normalize(self, S):
        return jnp.log(jnp.clip(S, min=self.clip_min))

    def denormalize(self, S):
        return jnp.exp(S)


class WaveRNNNorm:
    """amp -> dB -> [0, 1] -> [-max_norm, max_norm] (reference `utils/audio.py:99-119`).

    This is the TTS<->vocoder interchange contract: TTS mels live in [-4, 4].
    """

    def __init__(self, config: dict | None = None, min_level_db: float = -100.0,
                 max_norm: float = 4.0):
        del config
        self.min_level_db = min_level_db
        self.max_norm = max_norm

    def normalize(self, S):
        S = amp_to_db(S)
        S = jnp.clip((S - self.min_level_db) / -self.min_level_db, 0.0, 1.0)
        return (S * 2.0 * self.max_norm) - self.max_norm

    def denormalize(self, S):
        S = (S + self.max_norm) / (2.0 * self.max_norm)
        S = (jnp.clip(S, 0.0, 1.0) * -self.min_level_db) + self.min_level_db
        return db_to_amp(S)


_NORMALIZERS = {"MelGAN": MelGAN, "WaveRNN": WaveRNNNorm}


def get_normalizer(name: str, config: dict | None = None):
    if name not in _NORMALIZERS:
        raise ValueError(f"normalizer must be one of {sorted(_NORMALIZERS)}, got {name!r}")
    return _NORMALIZERS[name](config)


def normalize_db(S_db, min_level_db: float = -100.0):
    """dB -> [0, 1] (vocoder convention, `WaveRNN/utility/dsp.py:54-55`)."""
    return jnp.clip((S_db - min_level_db) / -min_level_db, 0.0, 1.0)


def denormalize_db(S, min_level_db: float = -100.0):
    return (jnp.clip(S, 0.0, 1.0) * -min_level_db) + min_level_db


def spectrogram_db(mag, ref_level_db: float = 20.0, min_level_db: float = -100.0):
    """Linear-magnitude -> normalized dB spectrogram (`WaveRNN/utility/dsp.py:70-73`)."""
    return normalize_db(amp_to_db(mag) - ref_level_db, min_level_db)


# ---------------------------------------------------------------------------
# mu-law and quantization
# ---------------------------------------------------------------------------

def mu_law_encode(x, mu: int):
    """float [-1,1] -> integer label [0, mu-1] (`WaveRNN/utility/dsp.py:94-97`)."""
    m = mu - 1
    fx = jnp.sign(x) * jnp.log1p(m * jnp.abs(x)) / jnp.log1p(jnp.float32(m))
    return jnp.floor((fx + 1.0) / 2.0 * m + 0.5)


def mu_law_decode(y, mu: int, from_labels: bool = True):
    """Inverse of :func:`mu_law_encode` (`WaveRNN/utility/dsp.py:100-105`)."""
    import math
    if from_labels:
        y = label_to_float(y, math.log2(mu))
    m = mu - 1
    return jnp.sign(y) / m * ((1 + m) ** jnp.abs(y) - 1.0)


def label_to_float(x, bits):
    return 2.0 * x / (2.0 ** bits - 1.0) - 1.0


def float_to_label(x, bits):
    x = (x + 1.0) * (2.0 ** bits - 1.0) / 2.0
    return jnp.clip(x, 0.0, 2.0 ** bits - 1.0)


# ---------------------------------------------------------------------------
# preemphasis (first-order IIR/FIR) — scan-based, jittable
# ---------------------------------------------------------------------------

def preemphasis(x, coef: float = 0.97):
    """y[t] = x[t] - coef * x[t-1] (FIR; `WaveRNN/utility/dsp.py:86-87`)."""
    return jnp.concatenate([x[:1], x[1:] - coef * x[:-1]])


def deemphasis(x, coef: float = 0.97):
    """Inverse filter y[t] = x[t] + coef * y[t-1] — a lax.scan IIR."""

    def step(carry, xt):
        yt = xt + coef * carry
        return yt, yt

    _, y = jax.lax.scan(step, jnp.zeros((), x.dtype), x)
    return y
