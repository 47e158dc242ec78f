"""Duration-regulated sequence expansion without ragged tensors.

TPU-first replacement for the reference's ``Expand`` layer
(`TransformerTTS/model/layers.py:645-683`), which repeats each phoneme vector
``durations[i]`` times and left-packs the result. The RaggedTensor construction
there is host-bound and shape-dynamic; here we build a fixed-capacity gather:

  starts  = cumsum(durations) - durations           # frame index where phoneme i begins
  src[t]  = searchsorted(starts, t, 'right') - 1    # which phoneme produced frame t
  out[t]  = x[src[t]]  masked by t < total

Output capacity ``max_frames`` is static (bucketed by the data pipeline), so
the op jits once per bucket and lowers to a single gather — no host sync.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["regulate_lengths"]


def regulate_lengths(x: jax.Array, durations: jax.Array, max_frames: int):
    """Expand (b, n, d) by integer durations (b, n) into (b, max_frames, d).

    Frames beyond ``sum(durations)`` are zero (the reserved padding frame).
    Returns (expanded, total_lengths).
    """
    durations = jnp.maximum(jnp.round(durations), 0.0).astype(jnp.int32)
    csum = jnp.cumsum(durations, axis=1)              # (b, n) end positions
    total = csum[:, -1]                               # (b,)
    t = jnp.arange(max_frames)[None, :, None]         # (1, T, 1)
    # src[b, t] = number of phonemes whose segment ends at or before t
    src = jnp.sum(t >= csum[:, None, :], axis=-1)     # (b, T) in [0, n]
    src = jnp.minimum(src, x.shape[1] - 1)
    out = jnp.take_along_axis(x, src[:, :, None], axis=1)
    valid = (jnp.arange(max_frames)[None, :] < total[:, None])
    return out * valid[:, :, None].astype(x.dtype), total
