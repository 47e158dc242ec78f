"""Padding / look-ahead masks and sinusoidal positional encodings.

Mirrors `TransformerTTS/model/transformer_utils.py:10-74` semantics: masks are
float tensors where 1 marks a *masked* (padded / future) position, broadcast as
(batch, 1, 1, length); mel padding keys off all-zero frames (the zero frame is
reserved — see SURVEY §2.7).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "positional_encoding",
    "encoder_padding_mask",
    "mel_padding_mask",
    "look_ahead_mask",
]


def positional_encoding(max_position: int, model_dim: int) -> np.ndarray:
    """Sinusoidal table (1, max_position, model_dim), sin at even / cos at odd dims."""
    pos = np.arange(max_position)[:, None].astype(np.float64)
    i = np.arange(model_dim)[None, :].astype(np.float64)
    angle = pos / np.power(10000.0, (2 * (i // 2)) / float(model_dim))
    angle[:, 0::2] = np.sin(angle[:, 0::2])
    angle[:, 1::2] = np.cos(angle[:, 1::2])
    return angle[None].astype(np.float32)


def encoder_padding_mask(token_ids: jnp.ndarray) -> jnp.ndarray:
    """(b, t) int ids -> (b, 1, 1, t) float mask; 1 where id == 0 (pad)."""
    return (token_ids == 0).astype(jnp.float32)[:, None, None, :]


def mel_padding_mask(mel: jnp.ndarray) -> jnp.ndarray:
    """(b, t, c) -> (b, 1, 1, t); a frame is padding iff all channels are 0."""
    zero = jnp.sum(jnp.abs(mel), axis=-1) == 0
    return zero.astype(jnp.float32)[:, None, None, :]


def look_ahead_mask(size: int) -> jnp.ndarray:
    """(size, size) upper-triangular mask; 1 above the diagonal (future)."""
    return 1.0 - jnp.tril(jnp.ones((size, size), jnp.float32))
