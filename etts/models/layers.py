"""Transformer-TTS building blocks (flax.linen), TPU-first.

Functional re-design of `TransformerTTS/model/layers.py` preserving its
behavioral quirks (SURVEY §2.7):
  - MHA output projection takes concat([query_input, attention]) (layers.py:144)
  - HeadDrop zeroes exactly ``drop_n`` random heads/batch, rescales by n/(n-k)
  - DecoderPrenet dropout is ALWAYS on, including inference (layers.py:398-401),
    with a runtime-variable rate passed as a traced scalar (so the piecewise-
    linear schedule never forces a retrace)
  - positional encodings are r-strided under the reduction factor (layers.py:245)

Differences from the reference that are deliberate TPU choices:
  - dropout rates and drop_n_heads are traced values, not rebuilt tf.functions
  - attention supports an explicit functional KV cache for O(T) incremental
    decode (the reference re-runs the whole prefix each step — predict loop at
    `AutoregressiveTransformer.py:279-295`)
  - normalization='batch' maps to cross-replica-friendly BatchNorm with a
    mutable 'batch_stats' collection.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.attention import scaled_dot_product_attention
from ..ops.masking import positional_encoding
from ..ops.gru import gru_scan

Dtype = Any

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "linear": lambda x: x,
    "sigmoid": jax.nn.sigmoid,
}


def act(name: str):
    return _ACTIVATIONS[name]


def variable_rate_dropout(x, rate, rng):
    """Inverted dropout with a *traced* rate (always applied)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / jnp.maximum(keep, 1e-8), 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Conv / FFN residual-norm stacks
# ---------------------------------------------------------------------------

class CNNResNorm(nn.Module):
    """Conv1D stack + per-layer norm + residual (+final norm).

    Mirrors `layers.py:7-47`: n_layers-1 hidden convs with inner activation,
    a last conv to out_size, then norm(x + conv_out).
    """
    out_size: int
    n_layers: int
    hidden_size: int
    kernel_size: int
    inner_activation: str = "relu"
    last_activation: str = "linear"
    padding: str = "SAME"
    normalization: str = "batch"
    dtype: Dtype = jnp.float32

    def _norm(self, x, train: bool, name: str):
        if self.normalization == "layer":
            return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)(x)
        if self.normalization == "batch":
            return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                epsilon=1e-3, dtype=self.dtype,
                                axis_name=None, name=name)(x)
        raise ValueError(f"normalization must be layer|batch, got {self.normalization}")

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        pad = "CAUSAL" if self.padding.lower() == "causal" else "SAME"
        x = inputs
        for i in range(self.n_layers - 1):
            x = nn.Conv(self.hidden_size, (self.kernel_size,), padding=pad,
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = self._norm(x, train, f"norm_{i}")
            x = act(self.inner_activation)(x)
        x = nn.Conv(self.out_size, (self.kernel_size,), padding=pad,
                    dtype=self.dtype, name="last_conv")(x)
        x = self._norm(x, train, "norm_last")
        x = act(self.last_activation)(x)
        return self._norm(inputs + x, train, "norm_out")


class FFNResNorm(nn.Module):
    """Dense-Dense + LN + relu + dropout + LN(x + res) (`layers.py:50-71`).

    Note the reference's unusual order: LN then activation, dropout after."""
    model_dim: int
    dense_hidden_units: int
    dropout_rate: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Dense(self.dense_hidden_units, dtype=self.dtype, name="d1")(x)
        y = nn.Dense(self.model_dim, dtype=self.dtype, name="d2")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(y)
        y = jax.nn.relu(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="last_ln")(x + y)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

def head_drop(x, drop_n, rng):
    """Zero exactly ``drop_n`` random heads per batch item, rescale the rest
    (`layers.py:74-97`). ``drop_n`` is a traced int32 scalar; drop_n==0 is the
    identity by construction."""
    b, h = x.shape[0], x.shape[1]
    if h == 1:
        return x
    scores = jax.random.uniform(rng, (b, h))
    ranks = jnp.argsort(jnp.argsort(scores, axis=-1), axis=-1)  # 0..h-1 per row
    keep = (ranks >= drop_n).astype(x.dtype)[:, :, None, None]
    scale = (h / jnp.maximum(h - drop_n, 1)).astype(x.dtype)
    return x * keep * scale


class MultiHeadAttention(nn.Module):
    """MHA with the reference's concat-query output projection (`layers.py:100-147`).

    Supports an optional functional KV self-attention cache for incremental
    decode: pass ``cache={'k': (b,h,T,d), 'v': (b,h,T,d)}`` and ``cache_index``
    when q covers a single new step; returns (out, attn, new_cache).
    """
    model_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    def _split(self, x):
        b, t, _ = x.shape
        depth = self.model_dim // self.num_heads
        return x.reshape(b, t, self.num_heads, depth).transpose(0, 2, 1, 3)

    @nn.compact
    def __call__(self, v, k, q_in, mask, train: bool = False,
                 drop_n_heads=0, cache=None, cache_index=None,
                 kv_override=None):
        assert self.model_dim % self.num_heads == 0
        q = self._split(nn.Dense(self.model_dim, dtype=self.dtype,
                                 name="wq")(q_in))
        if kv_override is not None:
            # precomputed, already head-split K/V (cross-attention fast path)
            k, v = kv_override
        else:
            k = self._split(nn.Dense(self.model_dim, dtype=self.dtype,
                                     name="wk")(k))
            v = self._split(nn.Dense(self.model_dim, dtype=self.dtype,
                                     name="wv")(v))

        new_cache = None
        if cache is not None:
            # insert this step's k/v at cache_index, attend over the prefix
            k = jax.lax.dynamic_update_slice(cache["k"], k, (0, 0, cache_index, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v, (0, 0, cache_index, 0))
            new_cache = {"k": k, "v": v}
            T = k.shape[2]
            future = (jnp.arange(T)[None, None, None, :] > cache_index)
            mask = future.astype(jnp.float32) if mask is None else \
                jnp.maximum(mask, future.astype(jnp.float32))

        attn_out, attn_w = scaled_dot_product_attention(q, k, v, mask)
        if train:
            attn_out = head_drop(attn_out, drop_n_heads,
                                 self.make_rng("dropout"))
        b, _, tq, _ = attn_out.shape
        concat = attn_out.transpose(0, 2, 1, 3).reshape(b, tq, self.model_dim)
        out = nn.Dense(self.model_dim, dtype=self.dtype, name="dense")(
            jnp.concatenate([q_in, concat], axis=-1))
        return out, attn_w, new_cache


class SelfAttentionResNorm(nn.Module):
    """MHA + LN + dropout + LN(x + out) (`layers.py:150-168`)."""
    model_dim: int
    num_heads: int
    dropout_rate: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = False, drop_n_heads=0,
                 cache=None, cache_index=None):
        attn, w, new_cache = MultiHeadAttention(
            self.model_dim, self.num_heads, self.dtype, name="mha")(
            x, x, x, mask, train=train, drop_n_heads=drop_n_heads,
            cache=cache, cache_index=cache_index)
        attn = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(attn)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(attn)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                            name="last_ln")(out + x), w, new_cache


class SelfAttentionDenseBlock(nn.Module):
    model_dim: int
    num_heads: int
    dense_hidden_units: int
    dropout_rate: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = False, drop_n_heads=0,
                 cache=None, cache_index=None):
        x, w, new_cache = SelfAttentionResNorm(
            self.model_dim, self.num_heads, self.dropout_rate, self.dtype,
            name="sarn")(x, mask, train, drop_n_heads, cache, cache_index)
        x = FFNResNorm(self.model_dim, self.dense_hidden_units,
                       self.dropout_rate, self.dtype, name="ffn")(x, train)
        return x, w, new_cache


class SelfAttentionConvBlock(nn.Module):
    model_dim: int
    num_heads: int
    dropout_rate: float
    conv_filters: int
    kernel_size: int
    conv_activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = False, drop_n_heads=0,
                 cache=None, cache_index=None):
        x, w, new_cache = SelfAttentionResNorm(
            self.model_dim, self.num_heads, self.dropout_rate, self.dtype,
            name="sarn")(x, mask, train, drop_n_heads, cache, cache_index)
        x = CNNResNorm(out_size=self.model_dim, n_layers=2,
                       hidden_size=self.conv_filters,
                       kernel_size=self.kernel_size,
                       inner_activation=self.conv_activation,
                       last_activation=self.conv_activation,
                       padding="SAME", normalization="batch",
                       dtype=self.dtype, name="conv")(x, train=train)
        return x, w, new_cache


class SelfAttentionBlocks(nn.Module):
    """Stacked self-attention blocks with scalar-scaled, r-strided positional
    encoding (`layers.py:215-255`). dense_blocks first, conv blocks after."""
    model_dim: int
    feed_forward_dimension: int
    num_heads: Sequence[int]
    maximum_position_encoding: int
    dropout_rate: float
    dense_blocks: int
    conv_filters: int
    kernel_size: int
    conv_activation: str = "relu"
    name_prefix: str = "enc"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.pos_encoding = positional_encoding(
            self.maximum_position_encoding, self.model_dim)
        self.blocks_dense = [
            SelfAttentionDenseBlock(self.model_dim, h, self.feed_forward_dimension,
                                    self.dropout_rate, self.dtype,
                                    name=f"SADB_{i}")
            for i, h in enumerate(self.num_heads[:self.dense_blocks])]
        self.blocks_conv = [
            SelfAttentionConvBlock(self.model_dim, h, self.dropout_rate,
                                   self.conv_filters, self.kernel_size,
                                   self.conv_activation, self.dtype,
                                   name=f"SACB_{i}")
            for i, h in enumerate(self.num_heads[self.dense_blocks:])]
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, inputs, padding_mask, train: bool = False,
                 drop_n_heads=0, reduction_factor: int = 1,
                 pos_offset: int | None = None):
        seq_len = inputs.shape[1]
        x = inputs * jnp.sqrt(jnp.asarray(self.model_dim, inputs.dtype))
        pe = jnp.asarray(self.pos_encoding, inputs.dtype)
        if pos_offset is None:
            x = x + pe[:, :seq_len * reduction_factor:reduction_factor, :]
        else:  # incremental decode: single-position slice
            x = x + jax.lax.dynamic_slice(
                pe, (0, pos_offset * reduction_factor, 0),
                (1, seq_len, pe.shape[-1]))
        x = self.dropout(x, deterministic=not train)
        attention_weights = {}
        for i, block in enumerate(self.blocks_dense):
            x, w, _ = block(x, padding_mask, train, drop_n_heads)
            attention_weights[f"{self.name_prefix}_DenseBlock{i + 1}_SelfAttention"] = w
        for i, block in enumerate(self.blocks_conv):
            x, w, _ = block(x, padding_mask, train, drop_n_heads)
            attention_weights[f"{self.name_prefix}_ConvBlock{i + 1}_SelfAttention"] = w
        return x, attention_weights


class CrossAttentionResnorm(nn.Module):
    """Cross-MHA + dropout + LN(attn + q) (`layers.py:258-274`)."""
    model_dim: int
    num_heads: int
    dropout_rate: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask, train: bool = False, drop_n_heads=0,
                 kv_override=None):
        attn, w, _ = MultiHeadAttention(self.model_dim, self.num_heads,
                                        self.dtype, name="mha")(
            v, k, q, mask, train=train, drop_n_heads=drop_n_heads,
            kv_override=kv_override)
        attn = nn.Dropout(self.dropout_rate, deterministic=not train)(attn)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                            name="layernorm")(attn + q), w


class CrossAttentionDenseBlock(nn.Module):
    model_dim: int
    num_heads: int
    dense_hidden_units: int
    dropout_rate: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc_output, look_ahead_mask, padding_mask,
                 train: bool = False, drop_n_heads=0,
                 cache=None, cache_index=None):
        kv_cache = None if cache is None else {"k": cache["k"], "v": cache["v"]}
        cross_kv = (cache.get("ck"), cache.get("cv")) \
            if cache is not None and "ck" in cache else None
        attn1, _, new_kv = SelfAttentionResNorm(
            self.model_dim, self.num_heads, self.dropout_rate, self.dtype,
            name="sarn")(x, look_ahead_mask, train, drop_n_heads,
                         kv_cache, cache_index)
        attn2, w, = CrossAttentionResnorm(
            self.model_dim, self.num_heads, self.dropout_rate, self.dtype,
            name="carn")(attn1, enc_output, enc_output, padding_mask,
                         train, drop_n_heads, kv_override=cross_kv)
        out = FFNResNorm(self.model_dim, self.dense_hidden_units,
                         self.dropout_rate, self.dtype, name="ffn")(attn2, train)
        new_cache = None
        if cache is not None:
            new_cache = dict(new_kv)
            if "ck" in cache:
                new_cache["ck"], new_cache["cv"] = cache["ck"], cache["cv"]
        return out, w, new_cache


class CrossAttentionConvBlock(nn.Module):
    model_dim: int
    num_heads: int
    conv_filters: int
    dropout_rate: float
    kernel_size: int
    conv_padding: str = "causal"
    conv_activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc_output, look_ahead_mask, padding_mask,
                 train: bool = False, drop_n_heads=0,
                 cache=None, cache_index=None):
        kv_cache = None if cache is None else {"k": cache["k"], "v": cache["v"]}
        cross_kv = (cache.get("ck"), cache.get("cv")) \
            if cache is not None and "ck" in cache else None
        attn1, _, new_kv = SelfAttentionResNorm(
            self.model_dim, self.num_heads, self.dropout_rate, self.dtype,
            name="sarn")(x, look_ahead_mask, train, drop_n_heads,
                         kv_cache, cache_index)
        attn2, w = CrossAttentionResnorm(
            self.model_dim, self.num_heads, self.dropout_rate, self.dtype,
            name="carn")(attn1, enc_output, enc_output, padding_mask,
                         train, drop_n_heads, kv_override=cross_kv)
        conv = CNNResNorm(out_size=self.model_dim, n_layers=2,
                          hidden_size=self.conv_filters,
                          kernel_size=self.kernel_size,
                          inner_activation=self.conv_activation,
                          last_activation=self.conv_activation,
                          padding=self.conv_padding, normalization="batch",
                          dtype=self.dtype, name="conv")
        if cache is None:
            return conv(attn2, train=train), w, None
        # incremental: causal convs need their receptive field — keep a rolling
        # window of past block inputs in the cache (zero-init matches the
        # causal left zero-padding of training, so results are exact)
        window = jnp.concatenate([cache["conv"], attn2], axis=1)
        out = conv(window, train=train)[:, -attn2.shape[1]:, :]
        new_cache = dict(new_kv, conv=window[:, attn2.shape[1]:, :])
        if "ck" in cache:
            new_cache["ck"], new_cache["cv"] = cache["ck"], cache["cv"]
        return out, w, new_cache


class CrossAttentionBlocks(nn.Module):
    """Decoder stack: self-attn + cross-attn per block (`layers.py:331-376`)."""
    model_dim: int
    feed_forward_dimension: int
    num_heads: Sequence[int]
    maximum_position_encoding: int
    dropout_rate: float
    dense_blocks: int
    conv_filters: int
    conv_activation: str = "relu"
    conv_padding: str = "causal"
    conv_kernel: int = 3
    name_prefix: str = "dec"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.pos_encoding = positional_encoding(
            self.maximum_position_encoding, self.model_dim)
        n_dense = self.dense_blocks
        self.blocks_dense = [
            CrossAttentionDenseBlock(self.model_dim, h,
                                     self.feed_forward_dimension,
                                     self.dropout_rate, self.dtype,
                                     name=f"CADB_{i}")
            for i, h in enumerate(self.num_heads[:n_dense])]
        self.blocks_conv = [
            CrossAttentionConvBlock(self.model_dim, h, self.conv_filters,
                                    self.dropout_rate, self.conv_kernel,
                                    self.conv_padding, self.conv_activation,
                                    self.dtype, name=f"CACB_{i}")
            for i, h in enumerate(self.num_heads[n_dense:])]
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, inputs, enc_output, decoder_padding_mask,
                 encoder_padding_mask, train: bool = False, drop_n_heads=0,
                 reduction_factor: int = 1, caches=None, cache_index=None,
                 pos_offset: int | None = None):
        seq_len = inputs.shape[1]
        x = inputs * jnp.sqrt(jnp.asarray(self.model_dim, inputs.dtype))
        pe = jnp.asarray(self.pos_encoding, inputs.dtype)
        if pos_offset is None:
            x = x + pe[:, :seq_len * reduction_factor:reduction_factor, :]
        else:
            x = x + jax.lax.dynamic_slice(
                pe, (0, pos_offset * reduction_factor, 0),
                (1, seq_len, pe.shape[-1]))
        x = self.dropout(x, deterministic=not train)
        attention_weights = {}
        new_caches = [] if caches is not None else None
        all_blocks = list(self.blocks_dense) + list(self.blocks_conv)
        n_dense = len(self.blocks_dense)
        for i, block in enumerate(all_blocks):
            cache_i = caches[i] if caches is not None else None
            x, w, nc = block(x, enc_output, decoder_padding_mask,
                             encoder_padding_mask, train, drop_n_heads,
                             cache_i, cache_index)
            if new_caches is not None:
                new_caches.append(nc)
            kind = ("DenseBlock" if i < n_dense else "ConvBlock")
            j = i + 1 if i < n_dense else i - n_dense + 1
            attention_weights[f"{self.name_prefix}_{kind}{j}_CrossAttention"] = w
        return x, attention_weights, new_caches


# ---------------------------------------------------------------------------
# Prenet / Postnet / GST / duration
# ---------------------------------------------------------------------------

class DecoderPrenet(nn.Module):
    """Two relu Dense layers with ALWAYS-ON dropout at a runtime rate
    (`layers.py:379-402` — "use dropout also in inference")."""
    model_dim: int
    dense_hidden_units: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, dropout_rate):
        rng = self.make_rng("prenet")
        r1, r2 = jax.random.split(rng)
        x = jax.nn.relu(nn.Dense(self.dense_hidden_units, dtype=self.dtype,
                                 name="d1")(x))
        x = variable_rate_dropout(x, dropout_rate, r1)
        x = jax.nn.relu(nn.Dense(self.model_dim, dtype=self.dtype,
                                 name="d2")(x))
        x = variable_rate_dropout(x, dropout_rate, r2)
        return x


class Postnet(nn.Module):
    """Stop-token Dense(3) + causal conv residual stack (`layers.py:588-615`)."""
    mel_channels: int
    conv_filters: int
    conv_layers: int
    kernel_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        stop = nn.Dense(3, dtype=self.dtype, name="stop_linear")(x)
        conv_out = CNNResNorm(out_size=self.mel_channels,
                              kernel_size=self.kernel_size, padding="causal",
                              inner_activation="tanh", last_activation="linear",
                              hidden_size=self.conv_filters,
                              n_layers=self.conv_layers, normalization="batch",
                              dtype=self.dtype, name="conv_blocks")(x, train=train)
        return {"mel_linear": x, "final_output": conv_out, "stop_prob": stop}


class ReferenceEncoderGST(nn.Module):
    """GST reference encoder: 6x strided Conv2D+BN+relu -> GRU -> tanh proj ->
    MHA over tanh'd style-token bank (`layers.py:526-585`)."""
    kernel_size: int
    strides: int
    conv_filters: Sequence[int]
    gru_cell_units: int
    gst_style_embed_dim: int
    multi_num_heads: int
    gst_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel, train: bool = False, drop_n_heads=0):
        b = mel.shape[0]
        x = mel[..., None]  # (b, t, mel, 1)
        for i, f in enumerate(self.conv_filters):
            x = nn.Conv(f, (self.kernel_size, self.kernel_size),
                        strides=(self.strides, self.strides), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"bn_{i}")(x)
            x = jax.nn.relu(x)
        t = x.shape[1]
        x = x.reshape(b, t, -1)
        # params stay fp32 (mixed-precision master copy); compute in self.dtype
        gru_params = {
            "wi": self.param("gru_wi", nn.initializers.lecun_normal(),
                             (x.shape[-1], 3 * self.gru_cell_units),
                             jnp.float32),
            "wh": self.param("gru_wh", nn.initializers.orthogonal(),
                             (self.gru_cell_units, 3 * self.gru_cell_units),
                             jnp.float32),
            "bi": self.param("gru_bi", nn.initializers.zeros,
                             (3 * self.gru_cell_units,), jnp.float32),
            "bh": self.param("gru_bh", nn.initializers.zeros,
                             (3 * self.gru_cell_units,), jnp.float32),
        }
        gru_params = jax.tree.map(lambda p: p.astype(self.dtype), gru_params)
        rnn_out, _ = gru_scan(gru_params, x.astype(self.dtype))
        # last GRU state, tanh-projected (the GST paper's reference embedding)
        ref = nn.Dense(self.gru_cell_units, dtype=self.dtype,
                       name="rnn_proj")(rnn_out[:, -1, :])
        ref = jnp.tanh(ref)[:, None, :]  # (b, 1, gru_units)

        tokens = self.param(
            "gst_tokens",
            nn.initializers.truncated_normal(stddev=0.5),
            (self.gst_heads, self.gst_style_embed_dim // self.multi_num_heads),
            jnp.float32)
        token_bank = jnp.tanh(jnp.tile(tokens[None].astype(self.dtype),
                                       (b, 1, 1)))
        out, attn, _ = MultiHeadAttention(self.gst_style_embed_dim,
                                          self.multi_num_heads, self.dtype,
                                          name="mha")(
            token_bank, token_bank, ref, None, train=train,
            drop_n_heads=drop_n_heads)
        return out, {"gst_attention": attn}, {"GST_tokens": tokens}


class DurationPredictor(nn.Module):
    """Layer-normed conv stack + relu Dense(1) with bias init 1
    (`layers.py:618-642`)."""
    model_dim: int
    kernel_size: int = 3
    conv_padding: str = "same"
    conv_activation: str = "relu"
    conv_block_n: int = 2
    dense_activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = CNNResNorm(out_size=self.model_dim, kernel_size=self.kernel_size,
                       padding=self.conv_padding,
                       inner_activation=self.conv_activation,
                       last_activation=self.conv_activation,
                       hidden_size=self.model_dim, n_layers=self.conv_block_n,
                       normalization="layer", dtype=self.dtype,
                       name="conv_blocks")(x, train=train)
        x = nn.Dense(1, dtype=self.dtype, bias_init=nn.initializers.ones,
                     name="linear")(x)
        return act(self.dense_activation)(x)


# ---------------------------------------------------------------------------
# MINE / CLUB critic networks (`layers.py:405-523`)
# ---------------------------------------------------------------------------

class MineNetFirstOrder(nn.Module):
    """relu MLP -> Dense(1) critic (`layers.py:471-483`)."""
    dense_hidden_units: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.dense_hidden_units):
            x = jax.nn.relu(nn.Dense(f, dtype=self.dtype, name=f"fc_{i}")(x))
        return nn.Dense(1, dtype=self.dtype, name="fc_proj")(x)


class MineNetSecondOrder(nn.Module):
    """Conv1D relu stack -> flatten -> MLP critic (`layers.py:486-504`)."""
    filters: Sequence[int]
    kernel_size: int
    dense_hidden_units: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.filters):
            x = jax.nn.relu(nn.Conv(f, (self.kernel_size,), padding="VALID",
                                    dtype=self.dtype, name=f"conv_{i}")(x))
        x = x.reshape(x.shape[0], -1)
        for i, f in enumerate(self.dense_hidden_units):
            x = jax.nn.relu(nn.Dense(f, dtype=self.dtype, name=f"fc_{i}")(x))
        return nn.Dense(1, dtype=self.dtype, name="fc_proj")(x)


class MineNetLinear(nn.Module):
    """random_normal-initialized Linear stack critic (`layers.py:454-468`);
    operates on (b, 1, d) squeezing/restoring the middle axis."""
    dense_hidden_units: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.squeeze(x, axis=1)
        init = nn.initializers.normal(stddev=0.05)
        for i, f in enumerate(self.dense_hidden_units):
            x = jax.nn.relu(nn.Dense(f, kernel_init=init, bias_init=init,
                                     dtype=self.dtype, name=f"fc_{i}")(x))
        x = nn.Dense(1, kernel_init=init, bias_init=init, dtype=self.dtype,
                     name="fc_proj")(x)
        return x[:, None, :]


class MineNetLinearQ(nn.Module):
    """Linear stack + quadratic term x^T W x + x b (`layers.py:418-451`)."""
    dense_hidden_units: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.squeeze(x, axis=1)
        d = x.shape[-1]
        init = nn.initializers.normal(stddev=0.05)
        wq = self.param("q_w", init, (d, d), self.dtype)
        bq = self.param("q_b", init, (d, 1), self.dtype)
        l_term = x @ bq
        q_term = jnp.sum(x * (x @ wq), axis=1, keepdims=True)
        y = x
        for i, f in enumerate(self.dense_hidden_units):
            y = jax.nn.relu(nn.Dense(f, kernel_init=init, bias_init=init,
                                     dtype=self.dtype, name=f"fc_{i}")(y))
        y = nn.Dense(1, kernel_init=init, bias_init=init, dtype=self.dtype,
                     name="fc_proj")(y)
        return (y + l_term + q_term)[:, None, :]


class CLUBNet(nn.Module):
    """MLP -> Dense(out_dim) (+tanh for log-variance head) (`layers.py:507-523`)."""
    dense_hidden_units: Sequence[int]
    log_var: bool
    out_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.dense_hidden_units):
            x = jax.nn.relu(nn.Dense(f, dtype=self.dtype, name=f"fc_{i}")(x))
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc_proj")(x)
        return jnp.tanh(x) if self.log_var else x


class ProsodyStatEncoder(nn.Module):
    """Explicit per-utterance prosody statistics alongside the GST.

    Round-4 measured that the GST pathway transmits timbre but not pitch at
    corpus scale (PITCH_TRACKING FAIL in every arm): the style bottleneck has
    to DISCOVER prosody from raw reference mels. This block hands the decoder
    the prosody signal explicitly — six deterministic per-utterance statistics
    of the reference mel (pitch-centroid mean/spread, log-energy mean/spread,
    voiced length, centroid movement rate), projected to a small embedding
    that concatenates with the GST output. Supports the reference's
    style-transfer program (`/root/reference/synthesize_sentences.py:31-40`
    sarcasm/commanding/question ref_types) with a controllable pathway.

    Statistics are stop-gradiented (pure measurement, no learned frontend) so
    the projection cannot collude with the text encoder; padding frames
    (all-zero, DataPrepper contract) are masked out. Input mel: TTS layout
    (B, T, n_mels) in [-4, 4]."""
    embed_dim: int = 32
    n_centroid_bins: int = 48
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel):
        m = jax.lax.stop_gradient(mel.astype(jnp.float32))
        valid = (jnp.max(jnp.abs(m), axis=-1) > 1e-3).astype(jnp.float32)
        n = jnp.maximum(jnp.sum(valid, axis=-1), 1.0)          # (B,)

        def mean_(x):                                          # masked over T
            return jnp.sum(x * valid, axis=-1) / n

        def std_(x, mu):
            return jnp.sqrt(mean_((x - mu[:, None]) ** 2) + 1e-6)

        # pitch proxy: energy centroid over the low mel bins (log-mel in
        # [-4, 4] -> bounded linear weights via exp); clamp the window to the
        # actual channel count so small-mel configs (tests) stay valid
        nb = min(self.n_centroid_bins, m.shape[-1])
        e = jnp.exp(m[:, :, :nb])
        bins = jnp.arange(nb, dtype=jnp.float32)
        cent = jnp.sum(e * bins, axis=-1) / jnp.maximum(
            jnp.sum(e, axis=-1), 1e-6)                         # (B, T)
        c_mu = mean_(cent)
        # frame log-energy
        le = jnp.mean(m, axis=-1)                              # (B, T)
        e_mu = mean_(le)
        # centroid movement rate (articulation/tempo proxy)
        both = valid[:, 1:] * valid[:, :-1]
        dc = jnp.sum(jnp.abs(cent[:, 1:] - cent[:, :-1]) * both, axis=-1) \
            / jnp.maximum(jnp.sum(both, axis=-1), 1.0)
        feats = jnp.stack([
            c_mu / nb,
            std_(cent, c_mu) / 12.0,
            e_mu / 4.0,
            std_(le, e_mu) / 2.0,
            n / 500.0,
            dc / 8.0,
        ], axis=-1)                                            # (B, 6)
        out = jnp.tanh(nn.Dense(self.embed_dim, dtype=self.dtype,
                                name="proj")(feats.astype(self.dtype)))
        return out[:, None, :]                                 # (B, 1, dim)
