"""GST-Tacotron — CBHG encoder + Bahdanau-attention RNN decoder baseline.

Re-design of `gst_tacotron/models/{tacotron,modules,rnn_wrappers,helpers,
multihead_attention}.py` as jit/scan-friendly flax modules:
  - always-on prenet dropout 0.5 (modules.py:8-13, "Dropout in both training
    and testing")
  - CBHG: K-wide conv bank + maxpool + 2 projection convs + residual + 4-layer
    highway + BiGRU (modules.py:57-96)
  - reference encoder + multi-head "style attention" over tanh'd GST tokens
    with dot or weight-normalized mlp scoring (multihead_attention.py:78-123);
    V is the untransformed token bank tiled per head (:62); heads concatenate
  - random-softmax style weights when no reference mel (tacotron.py:85-91)
  - decoder: prenet -> attention GRU (Bahdanau) -> concat context -> proj ->
    2x zoneout-LSTM residual -> Dense(mel*r), r = outputs_per_step
    (tacotron.py:97-125), as a single `nn.scan`
  - second reference-encoder pass on the predicted mel for the style
    consistency loss (tacotron.py:138-147), shared parameters
  - loss = mel L1 + linear L1 + ref-enc L1 (tacotron.py:172-180); Noam decay +
    global-norm clip 1.0 live in the trainer.

The TF1 `dynamic_decode` is replaced by a fixed-length scan with a finished
flag; post-finish frames are zeroed, matching the all-zero end-token
convention (helpers.py:37).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .layers import variable_rate_dropout
from ..ops.gru import gru_scan

Dtype = Any


class TacoPrenet(nn.Module):
    """Dense stack with ALWAYS-ON dropout 0.5 (modules.py:6-14)."""
    layer_sizes: Sequence[int] = (256, 128)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        rng = self.make_rng("prenet")
        for i, size in enumerate(self.layer_sizes):
            x = jax.nn.relu(nn.Dense(size, dtype=self.dtype,
                                     name=f"dense_{i + 1}")(x))
            x = variable_rate_dropout(x, 0.5, jax.random.fold_in(rng, i))
        return x


class ConvBN1D(nn.Module):
    channels: int
    kernel_size: int
    activation: Any = jax.nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype)(x)
        if self.activation is not None:
            x = self.activation(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            epsilon=1e-3, dtype=self.dtype)(x)


class Highway(nn.Module):
    units: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(nn.Dense(self.units, dtype=self.dtype, name="H")(x))
        t = jax.nn.sigmoid(nn.Dense(
            self.units, dtype=self.dtype,
            bias_init=nn.initializers.constant(-1.0), name="T")(x))
        return h * t + x * (1.0 - t)


class CBHG(nn.Module):
    """Conv bank (1..K) + maxpool + projections + residual + highway + BiGRU.

    ``width`` is the reference's hardcoded 128 (modules.py:62-96), exposed so
    small test configs scale down."""
    K: int
    projections: Sequence[int]
    width: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, mask=None):
        inputs = x
        bank = [ConvBN1D(self.width, k, dtype=self.dtype,
                         name=f"conv1d_{k}")(x, train)
                for k in range(1, self.K + 1)]
        x = jnp.concatenate(bank, axis=-1)
        # max_pooling1d pool 2 stride 1 same
        pad = jnp.pad(x, ((0, 0), (0, 1), (0, 0)), constant_values=-jnp.inf)
        x = jnp.maximum(pad[:, :-1], pad[:, 1:])
        x = ConvBN1D(self.projections[0], 3, dtype=self.dtype,
                     name="proj_1")(x, train)
        x = ConvBN1D(self.projections[1], 3, activation=None,
                     dtype=self.dtype, name="proj_2")(x, train)
        x = x + inputs
        if x.shape[-1] != self.width:
            x = nn.Dense(self.width, dtype=self.dtype, name="dim_match")(x)
        for i in range(4):
            x = Highway(self.width, dtype=self.dtype,
                        name=f"highway_{i + 1}")(x)
        # BiGRU over the sequence
        w = self.width
        fwd = {k: self.param(f"gru_fw_{k}", _gru_init(k, x.shape[-1], w),
                             _gru_shape(k, x.shape[-1], w), self.dtype)
               for k in ("wi", "wh", "bi", "bh")}
        bwd = {k: self.param(f"gru_bw_{k}", _gru_init(k, x.shape[-1], w),
                             _gru_shape(k, x.shape[-1], w), self.dtype)
               for k in ("wi", "wh", "bi", "bh")}
        yf, _ = gru_scan(fwd, x)
        yb, _ = gru_scan(bwd, x, reverse=True)
        return jnp.concatenate([yf, yb], axis=-1)


def _gru_shape(k, in_dim, h):
    return {"wi": (in_dim, 3 * h), "wh": (h, 3 * h),
            "bi": (3 * h,), "bh": (3 * h,)}[k]


def _gru_init(k, in_dim, h):
    if k in ("bi", "bh"):
        return nn.initializers.zeros
    return nn.initializers.lecun_normal() if k == "wi" else nn.initializers.orthogonal()


class TacoReferenceEncoder(nn.Module):
    """Conv2D stride-2 stack + GRU + tanh Dense(128) (modules.py:16-34)."""
    filters: Sequence[int] = (32, 32, 64, 64, 128, 128)
    depth: int = 128
    proj_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel, train: bool):
        x = mel[..., None]
        for i, ch in enumerate(self.filters):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=self.dtype, name=f"conv2d_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"bn_{i}")(x)
            x = jax.nn.relu(x)
        b, t = x.shape[0], x.shape[1]
        x = x.reshape(b, t, -1)
        gp = {k: self.param(f"gru_{k}", _gru_init(k, x.shape[-1], self.depth),
                            _gru_shape(k, x.shape[-1], self.depth), self.dtype)
              for k in ("wi", "wh", "bi", "bh")}
        out, _ = gru_scan(gp, x)
        return jnp.tanh(nn.Dense(self.proj_dim, dtype=self.dtype,
                                 name="ref_proj")(out[:, -1, :]))


class StyleAttention(nn.Module):
    """Multi-head style attention: q/k projected by 1x1 conv, V is the raw
    token bank tiled per head; heads concatenate
    (multihead_attention.py:34-135)."""
    num_heads: int = 4
    num_units: int = 128
    attention_type: str = "mlp_attention"
    normalize: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value):
        assert self.num_units % self.num_heads == 0
        b = query.shape[0]
        q = nn.Dense(self.num_units, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(self.num_units, dtype=self.dtype, name="k_proj")(value)
        d = self.num_units // self.num_heads
        qs = q.reshape(b, -1, self.num_heads, d).transpose(0, 2, 1, 3)
        ks = k.reshape(b, -1, self.num_heads, d).transpose(0, 2, 1, 3)
        vs = jnp.tile(value[:, None], (1, self.num_heads, 1, 1))
        if self.attention_type == "dot_attention":
            qk = jnp.einsum("bhqd,bhkd->bhqk", qs, ks)
            if self.normalize:
                qk = qk * (d ** -0.5)
            w = jax.nn.softmax(qk, axis=-1)
        elif self.attention_type == "mlp_attention":
            v_attn = self.param("attention_v", nn.initializers.lecun_normal(),
                                (1, d), self.dtype)[0]
            if self.normalize:
                g = self.param("attention_g",
                               nn.initializers.constant(float(np.sqrt(1.0 / d))),
                               (), self.dtype)
                bias = self.param("attention_b", nn.initializers.zeros,
                                  (d,), self.dtype)
                normed_v = g * v_attn * jax.lax.rsqrt(jnp.sum(jnp.square(v_attn)))
                add = jnp.sum(normed_v * jnp.tanh(ks + qs + bias), -1,
                              keepdims=True)
            else:
                add = jnp.sum(v_attn * jnp.tanh(ks + qs), -1, keepdims=True)
            w = jax.nn.softmax(add.transpose(0, 1, 3, 2), axis=-1)
        else:
            raise ValueError(self.attention_type)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", w, vs)
        ctx = ctx.transpose(0, 2, 1, 3)
        return ctx.reshape(b, ctx.shape[1], self.num_heads * ctx.shape[-1])


class TacotronDecoderCell(nn.Module):
    """One decoder step: prenet -> attention GRU -> concat context -> proj ->
    2x zoneout-LSTM residual -> Dense(mel*r)."""
    attention_depth: int = 256
    rnn_depth: int = 256
    num_mels: int = 80
    outputs_per_step: int = 2
    prenet_depths: Sequence[int] = (256, 128)
    zoneout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, inputs, keys, values, enc_mask, train: bool):
        """carry: (gru_h, (c1,h1), (c2,h2), context); inputs: (b, mel) frame."""
        gru_h, lstm1, lstm2, context = carry
        x = TacoPrenet(self.prenet_depths, dtype=self.dtype,
                       name="decoder_prenet")(inputs)
        gru_in = jnp.concatenate([x, context], axis=-1)
        gru = nn.GRUCell(self.attention_depth, dtype=self.dtype,
                         name="attention_gru")
        gru_h, gru_out = gru(gru_h, gru_in)
        # Bahdanau additive attention
        q = nn.Dense(self.attention_depth, use_bias=False, dtype=self.dtype,
                     name="query_proj")(gru_out)
        v_attn = self.param("attention_v", nn.initializers.lecun_normal(),
                            (1, self.attention_depth), self.dtype)[0]
        scores = jnp.sum(v_attn * jnp.tanh(keys + q[:, None, :]), axis=-1)
        scores = jnp.where(enc_mask, scores, -1e9)
        align = jax.nn.softmax(scores, axis=-1)
        context = jnp.einsum("bn,bnd->bd", align, values)
        concat = jnp.concatenate([gru_out, context], axis=-1)
        x = nn.Dense(self.rnn_depth, dtype=self.dtype, name="rnn_proj")(concat)
        zrng = self.make_rng("zoneout") if train else jax.random.PRNGKey(0)
        for i in range(2):
            cell = nn.LSTMCell(self.rnn_depth, dtype=self.dtype,
                               name=f"lstm_{i + 1}")
            lstm_carry = lstm1 if i == 0 else lstm2
            (c_old, h_old) = lstm_carry
            (c_new, h_new), out = cell((c_old, h_old), x)
            if train:
                kc, kh = jax.random.split(jax.random.fold_in(zrng, i))
                mc = jnp.floor(1.0 - self.zoneout
                               + jax.random.uniform(kc, c_old.shape))
                mh = jnp.floor(1.0 - self.zoneout
                               + jax.random.uniform(kh, h_old.shape))
                c = (c_new - c_old) * mc + c_old
                h = (h_new - h_old) * mh + h_old
            else:
                c = c_old * self.zoneout + c_new * (1 - self.zoneout)
                h = h_old * self.zoneout + h_new * (1 - self.zoneout)
            x = x + out
            if i == 0:
                lstm1 = (c, h)
            else:
                lstm2 = (c, h)
        frame = nn.Dense(self.num_mels * self.outputs_per_step,
                         dtype=self.dtype, name="frame_proj")(x)
        return (gru_h, lstm1, lstm2, context), (frame, align)


class Tacotron(nn.Module):
    """Full GST-Tacotron (see module docstring)."""
    vocab_size: int = 149
    embed_depth: int = 256
    encoder_depth: int = 256
    attention_depth: int = 256
    rnn_depth: int = 256
    num_mels: int = 80
    num_freq: int = 1025
    outputs_per_step: int = 2
    prenet_depths: Sequence[int] = (256, 128)
    use_gst: bool = True
    num_gst: int = 10
    num_heads: int = 4
    style_embed_depth: int = 256
    style_att_dim: int = 128
    style_att_type: str = "mlp_attention"
    reference_filters: Sequence[int] = (32, 32, 64, 64, 128, 128)
    reference_depth: int = 128
    ref_proj_dim: int = 128
    cbhg_width: int = 128
    max_iters: int = 1000
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(
            self.vocab_size, self.embed_depth,
            embedding_init=nn.initializers.truncated_normal(stddev=0.5),
            dtype=self.dtype, name="text_embedding")
        self.encoder_prenet = TacoPrenet(self.prenet_depths, dtype=self.dtype)
        w = self.cbhg_width
        self.encoder_cbhg = CBHG(K=16, projections=(w, w), width=w,
                                 dtype=self.dtype)
        self.post_cbhg = CBHG(K=8, projections=(2 * w, self.num_mels), width=w,
                              dtype=self.dtype)
        self.linear_proj = nn.Dense(self.num_freq, dtype=self.dtype)
        self.ref_encoder = TacoReferenceEncoder(self.reference_filters,
                                                self.reference_depth,
                                                self.ref_proj_dim,
                                                dtype=self.dtype)
        if self.use_gst:
            self.gst_tokens_p = self.param(
                "style_tokens", nn.initializers.truncated_normal(stddev=0.5),
                (self.num_gst, self.style_embed_depth // self.num_heads),
                self.dtype)
            self.style_attention = StyleAttention(
                num_heads=self.num_heads, num_units=self.style_att_dim,
                attention_type=self.style_att_type, dtype=self.dtype)
        self.decoder_cell = TacotronDecoderCell(
            attention_depth=self.attention_depth, rnn_depth=self.rnn_depth,
            num_mels=self.num_mels, outputs_per_step=self.outputs_per_step,
            prenet_depths=self.prenet_depths, dtype=self.dtype)
        self.memory_proj = nn.Dense(self.attention_depth, use_bias=False,
                                    dtype=self.dtype)

    # -- encoder side ---------------------------------------------------------

    def encode(self, inputs, input_lengths, reference_mel=None,
               train: bool = False):
        emb = self.embedding(inputs)
        pre = self.encoder_prenet(emb)
        enc = self.encoder_cbhg(pre, train)
        b, n = inputs.shape[0], inputs.shape[1]
        if reference_mel is not None:
            ref = self.ref_encoder(reference_mel, train)
            if self.use_gst:
                tokens = jnp.tanh(jnp.tile(self.gst_tokens_p[None], (b, 1, 1)))
                style = self.style_attention(ref[:, None, :], tokens)
            else:
                style = ref[:, None, :]
        else:
            # no reference: random softmax combination of tanh'd tokens
            rw = jax.random.uniform(self.make_rng("style"),
                                    (self.num_heads, self.num_gst))
            rw = jax.nn.softmax(rw, axis=-1)
            style = (rw @ jnp.tanh(self.gst_tokens_p)).reshape(1, 1, -1)
            style = jnp.tile(style, (b, 1, 1))
            ref = None
        style_tiled = jnp.tile(style, (1, n, 1))
        enc_out = jnp.concatenate([enc, style_tiled], axis=-1)
        return enc_out, style, ref

    def ref_encode(self, mel, train: bool = False):
        return self.ref_encoder(mel, train)

    # -- decoder --------------------------------------------------------------

    def _decode(self, enc_out, input_lengths, decoder_inputs, train: bool):
        """Scan the decoder cell over prepared per-step inputs (b, T, mel)."""
        b = enc_out.shape[0]
        keys = self.memory_proj(enc_out)
        enc_mask = (jnp.arange(enc_out.shape[1])[None, :]
                    < input_lengths[:, None])
        zeros = lambda d: jnp.zeros((b, d), self.dtype)
        carry = (zeros(self.attention_depth),
                 (zeros(self.rnn_depth), zeros(self.rnn_depth)),
                 (zeros(self.rnn_depth), zeros(self.rnn_depth)),
                 zeros(enc_out.shape[-1]))

        cell = nn.scan(
            lambda mdl, c, x: mdl(c, x, keys, enc_out, enc_mask, train),
            variable_broadcast="params",
            variable_carry="batch_stats",
            split_rngs={"params": False, "prenet": True, "zoneout": True,
                        "dropout": True},
            in_axes=1, out_axes=1)
        _, (frames, aligns) = cell(self.decoder_cell, carry, decoder_inputs)
        mel = frames.reshape(b, -1, self.num_mels)
        return mel, aligns

    def __call__(self, inputs, input_lengths, mel_targets=None,
                 reference_mel=None, train: bool = False):
        """Teacher-forced graph (training / GTA). Returns dict with
        mel/linear/alignments/style and both ref-encoder outputs."""
        if reference_mel is None:
            reference_mel = mel_targets
        enc_out, style, ref1 = self.encode(inputs, input_lengths,
                                           reference_mel, train)
        r = self.outputs_per_step
        b = inputs.shape[0]
        # teacher forcing: every r-th target frame, shifted by one GO frame
        tf_inputs = mel_targets[:, r - 1::r, :]
        go = jnp.zeros((b, 1, self.num_mels), self.dtype)
        dec_in = jnp.concatenate([go, tf_inputs[:, :-1]], axis=1)
        mel_out, aligns = self._decode(enc_out, input_lengths, dec_in, train)
        post = self.post_cbhg(mel_out, train)
        linear_out = self.linear_proj(post)
        ref2 = self.ref_encoder(mel_out, train)
        return {"mel_outputs": mel_out, "linear_outputs": linear_out,
                "alignments": aligns, "style_embeddings": style,
                "refnet_outputs": ref1, "refnet_outputs2": ref2}

    def generate(self, inputs, input_lengths, reference_mel=None,
                 max_iters: int | None = None):
        """Inference: feed back last predicted frame; post-finish frames are
        zeroed (all-zero end-token convention, helpers.py:37)."""
        max_iters = max_iters or self.max_iters
        enc_out, style, _ = self.encode(inputs, input_lengths, reference_mel,
                                        train=False)
        b = inputs.shape[0]
        keys = self.memory_proj(enc_out)
        enc_mask = (jnp.arange(enc_out.shape[1])[None, :]
                    < input_lengths[:, None])
        zeros = lambda d: jnp.zeros((b, d), self.dtype)
        carry0 = (zeros(self.attention_depth),
                  (zeros(self.rnn_depth), zeros(self.rnn_depth)),
                  (zeros(self.rnn_depth), zeros(self.rnn_depth)),
                  zeros(enc_out.shape[-1]))
        go = jnp.zeros((b, self.num_mels), self.dtype)
        finished0 = jnp.zeros((b,), bool)

        def step(mdl, carry_all, _):
            carry, prev, finished = carry_all
            new_carry, (frame, align) = mdl(carry, prev, keys, enc_out,
                                            enc_mask, False)
            done_now = jnp.all(jnp.abs(frame) < 1e-6, axis=-1) | finished
            frame = jnp.where(finished[:, None], 0.0, frame)
            nxt = frame[:, -self.num_mels:]
            return (new_carry, nxt, done_now), (frame, align)

        scan = nn.scan(step, variable_broadcast="params",
                       variable_carry="batch_stats",
                       split_rngs={"params": False, "prenet": True,
                                   "zoneout": True, "dropout": True},
                       length=max_iters, out_axes=1)
        _, (frames, aligns) = scan(self.decoder_cell, (carry0, go, finished0),
                                   None)
        mel_out = frames.reshape(b, -1, self.num_mels)
        post = self.post_cbhg(mel_out, train=False)
        linear_out = self.linear_proj(post)
        return {"mel_outputs": mel_out, "linear_outputs": linear_out,
                "alignments": aligns, "style_embeddings": style}


def tacotron_loss(out, mel_targets, linear_targets):
    """mel L1 + linear L1 + style-consistency L1 (tacotron.py:172-180)."""
    mel_loss = jnp.mean(jnp.abs(mel_targets - out["mel_outputs"]))
    linear_loss = jnp.mean(jnp.abs(linear_targets - out["linear_outputs"]))
    ref_loss = jnp.mean(jnp.abs(out["refnet_outputs"] - out["refnet_outputs2"]))
    return mel_loss + linear_loss + ref_loss, {
        "mel_loss": mel_loss, "linear_loss": linear_loss,
        "ref_enc_loss": ref_loss}


def noam_learning_rate(init_lr: float, step, warmup_steps: float = 4000.0):
    """Noam decay (tacotron.py:206-210)."""
    step = jnp.asarray(step, jnp.float32) + 1.0
    return init_lr * warmup_steps ** 0.5 * jnp.minimum(
        step * warmup_steps ** -1.5, step ** -0.5)
