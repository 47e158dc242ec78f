"""Scaled dot-product attention core.

Functional equivalent of `TransformerTTS/model/transformer_utils.py:24-58`:
additive -1e9 masking where mask==1, softmax over keys. Computed in fp32 for
numerical stability regardless of the activation dtype, output cast back.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["scaled_dot_product_attention"]


def scaled_dot_product_attention(q, k, v, mask=None):
    """q (..., tq, d), k (..., tk, d), v (..., tk, dv); mask broadcastable to
    (..., tq, tk), 1 = masked. Returns (output, attention_weights)."""
    dtype = q.dtype
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(k.shape[-1]))
    if mask is not None:
        logits = logits + mask.astype(jnp.float32) * -1e9
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...qk,...kv->...qv", weights.astype(dtype), v,
                     preferred_element_type=jnp.float32).astype(dtype)
    return out, weights
