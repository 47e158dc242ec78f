"""GRU cell and scan-based GRU layer.

TPU-native replacement for the cuDNN GRUs in the reference (GST reference
encoder `TransformerTTS/model/layers.py:543`, WaveRNN dual GRUs
`WaveRNN/models/fatchord_version.py:110-111`). Gate math follows the
torch/cuDNN convention (reset gate applied to the hidden projection of the
candidate), which is also what the fused Pallas WaveRNN kernel implements, so
the same parameters drive both the scan path and the kernel path.

Parameters are plain pytrees: ``{"wi": (in, 3h), "wh": (h, 3h), "bi": (3h,),
"bh": (3h,)}`` with gate order [r, z, n].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gru_init", "gru_cell", "gru_scan"]


def gru_init(key, input_dim: int, hidden_dim: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    scale_i = 1.0 / jnp.sqrt(jnp.float32(input_dim))
    scale_h = 1.0 / jnp.sqrt(jnp.float32(hidden_dim))
    return {
        "wi": (jax.random.uniform(k1, (input_dim, 3 * hidden_dim), dtype) * 2 - 1) * scale_i,
        "wh": (jax.random.uniform(k2, (hidden_dim, 3 * hidden_dim), dtype) * 2 - 1) * scale_h,
        "bi": jnp.zeros((3 * hidden_dim,), dtype),
        "bh": jnp.zeros((3 * hidden_dim,), dtype),
    }


def gru_cell(params, x, h):
    """One step: x (b, in), h (b, hidden) -> new h."""
    hd = h.shape[-1]
    gi = jnp.dot(x, params["wi"], preferred_element_type=jnp.float32) + params["bi"]
    gh = jnp.dot(h, params["wh"], preferred_element_type=jnp.float32) + params["bh"]
    i_r, i_z, i_n = gi[..., :hd], gi[..., hd:2 * hd], gi[..., 2 * hd:]
    h_r, h_z, h_n = gh[..., :hd], gh[..., hd:2 * hd], gh[..., 2 * hd:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return ((1.0 - z) * n + z * h).astype(h.dtype)


def gru_scan(params, xs, h0=None, reverse: bool = False):
    """Full-sequence GRU: xs (b, t, in) -> (b, t, hidden), final h.

    The input projection for all timesteps is hoisted out of the scan into one
    large MXU matmul; only the small recurrent matmul stays sequential.
    """
    b, t, _ = xs.shape
    hd = params["wh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((b, hd), xs.dtype)
    gi_all = (jnp.einsum("bti,ih->bth", xs, params["wi"],
                         preferred_element_type=jnp.float32) + params["bi"])

    def step(h, gi):
        gh = jnp.dot(h, params["wh"], preferred_element_type=jnp.float32) + params["bh"]
        i_r, i_z, i_n = gi[..., :hd], gi[..., hd:2 * hd], gi[..., 2 * hd:]
        h_r, h_z, h_n = gh[..., :hd], gh[..., hd:2 * hd], gh[..., 2 * hd:]
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = ((1.0 - z) * n + z * h).astype(h.dtype)
        return h_new, h_new

    h_final, ys = jax.lax.scan(step, h0, jnp.swapaxes(gi_all, 0, 1),
                               reverse=reverse)
    return jnp.swapaxes(ys, 0, 1), h_final
