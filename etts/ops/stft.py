"""Jittable spectral ops: framing, STFT/ISTFT, mel filterbank, mel spectrogram.

TPU-native replacement for the librosa calls in the reference
(`TransformerTTS/utils/audio.py:20-40`, `WaveRNN/utility/dsp.py:70-83`,
`gst_tacotron/util/audio.py:94-118`). Everything here is pure jnp, static-shape,
and fuses under jit; the mel filterbank is a precomputed constant matrix so the
mel projection is a single MXU matmul.

Conventions match librosa defaults so that datasets produced by the reference
pipeline are bit-compatible in spirit:
  - periodic Hann window of ``win_length``, zero-padded centered to ``n_fft``
  - center=True framing with reflect padding of ``n_fft // 2``
  - Slaney-scale mel filters with Slaney area normalization (librosa default)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hann_window",
    "frame",
    "stft",
    "istft",
    "mel_filterbank",
    "linear_to_mel",
    "MelSpectrogram",
]


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic (fftbins=True) Hann window, as scipy.signal.get_window('hann', n)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


def _padded_window(win_length: int, n_fft: int, dtype=np.float32) -> np.ndarray:
    """Hann window of win_length, centered in an n_fft buffer (librosa util.pad_center)."""
    if win_length > n_fft:
        raise ValueError(f"win_length {win_length} > n_fft {n_fft}")
    w = hann_window(win_length, dtype)
    lpad = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=dtype)
    out[lpad:lpad + win_length] = w
    return out


def frame(y: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """Slice a 1-D signal into overlapping frames: (n_frames, frame_length).

    Static-shape gather — XLA lowers this to an efficient strided load.
    """
    n_frames = 1 + (y.shape[-1] - frame_length) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(frame_length)[None, :])
    return y[..., idx]


def n_frames(n_samples: int, n_fft: int, hop_length: int,
             center: bool = True) -> int:
    """Frame count :func:`stft` produces for an ``n_samples`` signal.

    Single source of truth for the framing formula — consumers (e.g. the
    CTC transcriber trimming its decode region to the unpadded wav) must
    use this rather than re-deriving ``1 + n // hop`` by hand (ADVICE r3:
    a framing change here would silently mis-trim their logits)."""
    if center:
        n_samples = n_samples + 2 * (n_fft // 2)
    return max(1, 1 + (n_samples - n_fft) // hop_length)


def stft(y: jax.Array, n_fft: int, hop_length: int, win_length: int,
         center: bool = True) -> jax.Array:
    """Complex STFT of a 1-D waveform; returns (1 + n_fft//2, n_frames).

    Matches ``librosa.stft`` (reference `TransformerTTS/utils/audio.py:29-34`).
    """
    window = jnp.asarray(_padded_window(win_length, n_fft))
    if center:
        pad = n_fft // 2
        y = jnp.pad(y, (pad, pad), mode="reflect")
    frames = frame(y, n_fft, hop_length)  # (n_frames, n_fft)
    spec = jnp.fft.rfft(frames * window[None, :], axis=-1)
    return spec.T  # (n_fft//2+1, n_frames) — librosa layout


def istft(spec: jax.Array, n_fft: int, hop_length: int, win_length: int,
          center: bool = True, length: int | None = None) -> jax.Array:
    """Inverse STFT with windowed overlap-add and COLA normalization.

    ``spec`` is (1 + n_fft//2, n_frames) as returned by :func:`stft`.
    """
    window = jnp.asarray(_padded_window(win_length, n_fft))
    frames = jnp.fft.irfft(spec.T, n=n_fft, axis=-1)  # (n_frames, n_fft)
    frames = frames * window[None, :]
    n_frames = frames.shape[0]
    total = n_fft + hop_length * (n_frames - 1)
    # overlap-add via scatter-add
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(n_fft)[None, :]).reshape(-1)
    y = jnp.zeros(total, frames.dtype).at[idx].add(frames.reshape(-1))
    wsq = jnp.zeros(total, frames.dtype).at[idx].add(
        jnp.broadcast_to(window[None, :] ** 2, (n_frames, n_fft)).reshape(-1))
    y = y / jnp.maximum(wsq, 1e-10)
    if center:
        y = y[n_fft // 2: total - n_fft // 2]
    if length is not None:
        y = y[:length]
    return y


# ---------------------------------------------------------------------------
# Mel filterbank (Slaney scale + Slaney norm, librosa defaults)
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3          # Slaney linear region step (Hz per mel)
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = float(np.log(6.4) / 27.0)


def _hz_to_mel(f):
    f = np.asanyarray(f, dtype=np.float64)
    mel = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mel = np.where(log_region,
                   _MIN_LOG_MEL + np.log(np.maximum(f, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP,
                   mel)
    return mel


def _mel_to_hz(m):
    m = np.asanyarray(m, dtype=np.float64)
    f = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    f = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)
    return f


@functools.lru_cache(maxsize=8)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, 1 + n_fft//2).

    Equivalent to ``librosa.filters.mel`` defaults (htk=False, norm='slaney') as
    used by the reference (`TransformerTTS/utils/audio.py:21-27`,
    `WaveRNN/utility/dsp.py:49-51`).
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)  # (n_mels+2,)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # (n_mels+2, n_bins)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def linear_to_mel(spec_mag: jax.Array, mel_basis: jax.Array) -> jax.Array:
    """Project magnitude spectrogram (n_bins, t) to mel (n_mels, t): one matmul."""
    return jnp.matmul(mel_basis, spec_mag, precision=jax.lax.Precision.HIGHEST)


class MelSpectrogram:
    """Static-config mel-spectrogram extractor: wav (n,) -> mel (n_mels, t).

    The whole chain (frame -> window -> rfft -> |.| -> mel matmul) is one jitted
    XLA program; the mel matrix lives in HBM as a constant and the projection
    hits the MXU.
    """

    def __init__(self, sample_rate: int, n_fft: int, hop_length: int,
                 win_length: int, n_mels: int, fmin: float = 0.0,
                 fmax: float | None = None):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mels = n_mels
        self.fmin = fmin
        self.fmax = fmax
        self.mel_basis = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)

    def magnitude(self, wav: jax.Array) -> jax.Array:
        return jnp.abs(stft(wav, self.n_fft, self.hop_length, self.win_length))

    def __call__(self, wav: jax.Array) -> jax.Array:
        return linear_to_mel(self.magnitude(wav), jnp.asarray(self.mel_basis))
