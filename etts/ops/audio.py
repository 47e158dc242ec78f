"""AudioProcessor — the public audio frontend facade.

API parity with the reference ``Audio`` class (`TransformerTTS/utils/audio.py:9-72`):
``mel_spectrogram(wav)`` produces what the acoustic models are trained to
reproduce, ``reconstruct_waveform(mel)`` inverts a normalized mel back to audio
via NNLS mel inversion + Griffin-Lim. Both paths are jitted end-to-end.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .stft import MelSpectrogram, mel_filterbank
from .normalizers import get_normalizer
from .griffin_lim import griffin_lim, nnls

__all__ = ["AudioProcessor"]


class AudioProcessor:
    def __init__(self, config: dict):
        self.config = config
        self.sampling_rate = config["sampling_rate"]
        self.n_fft = config["n_fft"]
        self.hop_length = config["hop_length"]
        self.win_length = config["win_length"]
        self.mel_channels = config["mel_channels"]
        self.f_min = config.get("f_min", 0) or 0
        self.f_max = config.get("f_max", None)
        self.normalizer = get_normalizer(config.get("normalizer", "WaveRNN"), config)
        self._mel = MelSpectrogram(self.sampling_rate, self.n_fft, self.hop_length,
                                   self.win_length, self.mel_channels,
                                   self.f_min, self.f_max)
        self._jit_mel = jax.jit(lambda w: self.normalizer.normalize(self._mel(w)))

    def _normalize(self, S):
        return self.normalizer.normalize(S)

    def _denormalize(self, S):
        return self.normalizer.denormalize(S)

    def mel_spectrogram(self, wav) -> jax.Array:
        """wav (n,) -> normalized mel (mel_channels, t). What models train on."""
        return self._jit_mel(jnp.asarray(wav, jnp.float32))

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def _reconstruct(self, mel, n_iter):
        amp_mel = self._denormalize(mel)
        basis = jnp.asarray(mel_filterbank(self.sampling_rate, self.n_fft,
                                           self.mel_channels, self.f_min, self.f_max))
        mag = nnls(basis, amp_mel)
        return griffin_lim(mag, self.n_fft, self.hop_length, self.win_length,
                           n_iter=n_iter)

    def reconstruct_waveform(self, mel, n_iter: int = 32) -> jax.Array:
        """Normalized mel (mel_channels, t) -> waveform via Griffin-Lim
        (`TransformerTTS/utils/audio.py:42-58` behavior).

        Very short mels (early stop-token fires) are right-padded with
        near-silence so the ISTFT/reflect-pad chain stays valid; the output is
        trimmed back to hop*t samples."""
        mel = jnp.asarray(mel, jnp.float32)
        t = mel.shape[1]
        t_min = self.n_fft // self.hop_length + 2
        if t < t_min:
            pad_val = float(self.normalizer.normalize(jnp.asarray(1e-5)))
            mel = jnp.pad(mel, ((0, 0), (0, t_min - t)),
                          constant_values=pad_val)
        wav = self._reconstruct(mel, n_iter)
        return wav[: self.hop_length * t]
