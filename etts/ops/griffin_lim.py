"""Griffin-Lim phase reconstruction and mel->linear inversion, fully jittable.

Replaces ``librosa.griffinlim`` + ``librosa.feature.inverse.mel_to_stft``
(`TransformerTTS/utils/audio.py:42-58`) and the TF1 in-graph Griffin-Lim
(`gst_tacotron/util/audio.py:78-91`). Fixed-iteration ``lax.fori_loop`` so the
whole reconstruction compiles to one XLA program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .stft import stft, istft, mel_filterbank

__all__ = ["griffin_lim", "mel_to_linear", "nnls"]


def griffin_lim(mag: jax.Array, n_fft: int, hop_length: int, win_length: int,
                n_iter: int = 32, momentum: float = 0.99,
                key: jax.Array | None = None, length: int | None = None) -> jax.Array:
    """Reconstruct a waveform from a magnitude spectrogram (n_bins, t).

    Accelerated Griffin-Lim (momentum form, as librosa). ``key`` seeds the
    random initial phase; ``None`` gives zero phase (deterministic).
    """
    mag = jnp.asarray(mag, jnp.float32)
    if key is not None:
        phase = jax.random.uniform(key, mag.shape, jnp.float32, -np.pi, np.pi)
        angles = jnp.exp(1j * phase).astype(jnp.complex64)
    else:
        angles = jnp.ones(mag.shape, jnp.complex64)

    def project(ang):
        """mag*angles -> time -> STFT (the GL projection pair)."""
        y = istft(mag * ang, n_fft, hop_length, win_length)
        rebuilt = stft(y, n_fft, hop_length, win_length)
        # istft of a center-padded stft loses trailing partial frames; re-pad
        t = mag.shape[1] - rebuilt.shape[1]
        if t > 0:
            rebuilt = jnp.pad(rebuilt, ((0, 0), (0, t)))
        return rebuilt[:, :mag.shape[1]]

    def body(_, carry):
        angles, tprev = carry
        rebuilt = project(angles)
        upd = rebuilt - (momentum / (1.0 + momentum)) * tprev
        angles = upd / jnp.maximum(jnp.abs(upd), 1e-16)
        return angles, rebuilt

    angles, _ = jax.lax.fori_loop(0, n_iter, body, (angles, jnp.zeros_like(angles)))
    return istft(mag * angles, n_fft, hop_length, win_length, length=length)


def nnls(A: jax.Array, B: jax.Array, n_iter: int = 40) -> jax.Array:
    """Non-negative least squares ``argmin_{X>=0} |A X - B|`` via projected
    gradient with Nesterov momentum (FISTA-like). Jittable, fixed iterations.

    Used for mel->linear inversion, standing in for librosa's scipy NNLS.
    """
    A = jnp.asarray(A, jnp.float32)
    B = jnp.asarray(B, jnp.float32)
    # Lipschitz constant of grad: ||A^T A||_2; cheap power iteration at trace time
    AtA = A.T @ A
    v = jnp.ones((AtA.shape[0], 1), jnp.float32)
    for _ in range(8):
        v = AtA @ v
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    L = jnp.maximum((v.T @ AtA @ v)[0, 0], 1e-8)
    AtB = A.T @ B
    x0 = jnp.clip(jnp.linalg.pinv(A) @ B, 0.0, None)

    def body(i, carry):
        x, y, t = carry
        grad = AtA @ y - AtB
        x_new = jnp.clip(y - grad / L, 0.0, None)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return x_new, y_new, t_new

    x, _, _ = jax.lax.fori_loop(0, n_iter, body, (x0, x0, jnp.float32(1.0)))
    return x


def mel_to_linear(mel_amp: jax.Array, sample_rate: int, n_fft: int,
                  n_mels: int, fmin: float = 0.0, fmax: float | None = None,
                  n_iter: int = 40) -> jax.Array:
    """Invert an amplitude mel spectrogram (n_mels, t) to a linear magnitude
    spectrogram (1+n_fft//2, t), as ``librosa.feature.inverse.mel_to_stft``
    with power=1 (`TransformerTTS/utils/audio.py:46-52`)."""
    basis = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax))
    return nnls(basis, jnp.asarray(mel_amp, jnp.float32), n_iter=n_iter)
