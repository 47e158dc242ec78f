"""ForwardTransformer — duration-based (FastSpeech-style) acoustic model.

Re-design of the reference `pretrained_models/for_text_encoder/models.py:283-477`
as a single jit-friendly flax module: text encoder -> duration predictor ->
fixed-capacity length regulation (no ragged tensors; see
:mod:`etts.ops.expand`) -> self-attention decoder -> Dense(mel) -> conv postnet.
Loss weights [3, 1] (mel, duration) as in `_compile` (models.py:407-412).

Unlike the reference (which registers this model nowhere — SURVEY §1 code
drift), it is a first-class registered model here.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import (SelfAttentionBlocks, DecoderPrenet, DurationPredictor,
                     CNNResNorm)
from ..ops.masking import encoder_padding_mask, mel_padding_mask
from ..ops.expand import regulate_lengths


class ForwardTransformer(nn.Module):
    encoder_model_dimension: int = 256
    decoder_model_dimension: int = 256
    dropout_rate: float = 0.1
    decoder_num_heads: Sequence[int] = (4, 4, 4, 4)
    encoder_num_heads: Sequence[int] = (4, 4, 4, 4)
    encoder_maximum_position_encoding: int = 1000
    decoder_maximum_position_encoding: int = 10000
    postnet_conv_filters: int = 256
    postnet_conv_layers: int = 5
    postnet_kernel_size: int = 5
    encoder_dense_blocks: int = 4
    decoder_dense_blocks: int = 4
    mel_channels: int = 80
    vocab_size: int = 128
    encoder_attention_conv_filters: int = 256
    decoder_attention_conv_filters: int = 256
    encoder_attention_conv_kernel: int = 3
    decoder_attention_conv_kernel: int = 3
    encoder_feed_forward_dimension: int = 1024
    decoder_feed_forward_dimension: int = 1024
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder_prenet = nn.Embed(self.vocab_size,
                                       self.encoder_model_dimension,
                                       dtype=self.dtype, name="embedding")
        self.encoder = SelfAttentionBlocks(
            model_dim=self.encoder_model_dimension,
            dropout_rate=self.dropout_rate,
            num_heads=self.encoder_num_heads,
            feed_forward_dimension=self.encoder_feed_forward_dimension,
            maximum_position_encoding=self.encoder_maximum_position_encoding,
            dense_blocks=self.encoder_dense_blocks,
            conv_filters=self.encoder_attention_conv_filters,
            kernel_size=self.encoder_attention_conv_kernel,
            conv_activation="relu", name_prefix="Encoder", dtype=self.dtype)
        self.dur_pred = DurationPredictor(
            model_dim=self.encoder_model_dimension, kernel_size=3,
            conv_padding="same", conv_activation="relu", conv_block_n=2,
            dense_activation="relu", dtype=self.dtype)
        self.decoder_prenet = DecoderPrenet(
            model_dim=self.decoder_model_dimension,
            dense_hidden_units=self.decoder_feed_forward_dimension,
            dtype=self.dtype)
        self.decoder = SelfAttentionBlocks(
            model_dim=self.decoder_model_dimension,
            dropout_rate=self.dropout_rate,
            num_heads=self.decoder_num_heads,
            feed_forward_dimension=self.decoder_feed_forward_dimension,
            maximum_position_encoding=self.decoder_maximum_position_encoding,
            dense_blocks=self.decoder_dense_blocks,
            conv_filters=self.decoder_attention_conv_filters,
            kernel_size=self.decoder_attention_conv_kernel,
            conv_activation="relu", name_prefix="Decoder", dtype=self.dtype)
        self.out = nn.Dense(self.mel_channels, dtype=self.dtype)
        self.decoder_postnet = CNNResNorm(
            out_size=self.mel_channels, kernel_size=self.postnet_kernel_size,
            padding="same", inner_activation="tanh", last_activation="linear",
            hidden_size=self.postnet_conv_filters,
            n_layers=self.postnet_conv_layers, normalization="batch",
            dtype=self.dtype)

    def __call__(self, x, target_durations=None, *, max_frames: int,
                 train: bool = False, durations_scalar: float = 1.0,
                 drop_n_heads=0, prenet_dropout: float = 0.0):
        """x: (b, n) token ids. Returns dict with 'mel' (b, max_frames, c),
        'duration' (b, n, 1), masks, attention maps.

        ``max_frames`` is the static output capacity (bucketed upstream)."""
        padding_mask = encoder_padding_mask(x)
        h = self.encoder_prenet(x)
        h, encoder_attention = self.encoder(h, padding_mask, train=train,
                                            drop_n_heads=drop_n_heads)
        durations = self.dur_pred(h, train=train) * durations_scalar
        # zero predicted durations at padded positions (models.py:440)
        durations = (1.0 - padding_mask[:, 0, 0, :, None]) * durations
        used = target_durations if target_durations is not None else durations
        mels, total = regulate_lengths(h, jnp.squeeze(used, -1), max_frames)
        expanded_mask = mel_padding_mask(mels)
        mels = self.decoder_prenet(mels, prenet_dropout)
        mels, decoder_attention = self.decoder(mels, expanded_mask, train=train,
                                               drop_n_heads=drop_n_heads,
                                               reduction_factor=1)
        mels = self.out(mels)
        mels = self.decoder_postnet(mels, train=train)
        return {"mel": mels, "duration": durations,
                "expanded_mask": expanded_mask, "mel_lengths": total,
                "encoder_attention": encoder_attention,
                "decoder_attention": decoder_attention}

    loss_weights = (3.0, 1.0)  # (mel, duration) — models.py:407
