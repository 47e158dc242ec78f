"""AutoregressiveTransformer — GST/speaker-conditioned AR acoustic model.

Re-design of `TransformerTTS/model/AutoregressiveTransformer.py` with the four
conditioning modes (``system_type`` in {text, style_text, speaker_text,
speaker_style_text}, ctor :87-95 / call_encoder :124-159), the scheduled
reduction factor r (final Dense predicts mel*max_r, sliced to r*mel and
reshaped to t*r frames, :173-177), the 3-class stop token, and the
teacher-forcing input reshape (shift + r-stride, :318-327).

TPU-first decode: the reference re-runs the whole prefix every step in eager
mode (:279-295). Here ``autoregressive_predict`` runs a ``lax.while_loop`` with
per-block self-attention KV caches (O(T) instead of O(T^2) attention recompute)
and a sliding-window incremental postnet (causal convs recomputed only over
their receptive field), with stop-token early exit. Everything is one compiled
XLA program.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .layers import (SelfAttentionBlocks, CrossAttentionBlocks, DecoderPrenet,
                     Postnet, ReferenceEncoderGST, ProsodyStatEncoder)
from ..ops.masking import (encoder_padding_mask, mel_padding_mask,
                           look_ahead_mask)

SYSTEM_TYPES = ("text", "style_text", "speaker_text", "speaker_style_text")


class AutoregressiveTransformer(nn.Module):
    system_type: str = "speaker_style_text"
    encoder_model_dimension: int = 256
    decoder_model_dimension: int = 256
    encoder_num_heads: Sequence[int] = (4, 4, 4, 4)
    decoder_num_heads: Sequence[int] = (4, 4, 4, 4)
    encoder_maximum_position_encoding: int = 1000
    decoder_maximum_position_encoding: int = 10000
    encoder_dense_blocks: int = 4
    decoder_dense_blocks: int = 4
    encoder_prenet_dimension: int = 256
    decoder_prenet_dimension: int = 256
    postnet_conv_filters: int = 256
    postnet_conv_layers: int = 5
    postnet_kernel_size: int = 5
    dropout_rate: float = 0.1
    mel_start_value: float = 0.5
    mel_end_value: float = -0.5
    mel_channels: int = 80
    vocab_size: int = 128
    ref_encoder_filters: Sequence[int] = (32, 32, 64, 64, 128, 128)
    ref_encoder_kernel_size: int = 3
    ref_encoder_strides: int = 2
    ref_encoder_gru_cell_units: int = 128
    gst_style_embed_dim: int = 256
    gst_multi_num_heads: int = 4
    gst_heads: int = 10
    encoder_attention_conv_filters: int = 256
    decoder_attention_conv_filters: int = 256
    encoder_attention_conv_kernel: int = 3
    decoder_attention_conv_kernel: int = 3
    encoder_feed_forward_dimension: int = 1024
    decoder_feed_forward_dimension: int = 1024
    max_r: int = 10
    # explicit F0/energy conditioning alongside the GST (VERDICT r4 #4):
    # deterministic per-utterance prosody stats of the reference mel,
    # projected and concatenated with the style embedding — see
    # layers.ProsodyStatEncoder. Off by default (reference parity).
    use_prosody_stats: bool = False
    prosody_embed_dim: int = 32
    dtype: Any = jnp.float32

    stop_prob_index: int = 2

    @property
    def has_style(self) -> bool:
        return self.system_type in ("style_text", "speaker_style_text")

    @property
    def has_speaker(self) -> bool:
        return self.system_type in ("speaker_text", "speaker_style_text")

    def setup(self):
        assert self.system_type in SYSTEM_TYPES, self.system_type
        self.text_encoder_prenet = nn.Embed(self.vocab_size,
                                            self.encoder_prenet_dimension,
                                            dtype=self.dtype,
                                            name="TextEmbedding")
        self.text_encoder = SelfAttentionBlocks(
            model_dim=self.encoder_model_dimension,
            dropout_rate=self.dropout_rate,
            num_heads=self.encoder_num_heads,
            feed_forward_dimension=self.encoder_feed_forward_dimension,
            maximum_position_encoding=self.encoder_maximum_position_encoding,
            dense_blocks=self.encoder_dense_blocks,
            conv_filters=self.encoder_attention_conv_filters,
            kernel_size=self.encoder_attention_conv_kernel,
            conv_activation="relu", name_prefix="TextEncoder",
            dtype=self.dtype, name="TextEncoder")
        if self.has_style:
            self.style_encoder = ReferenceEncoderGST(
                conv_filters=self.ref_encoder_filters,
                kernel_size=self.ref_encoder_kernel_size,
                strides=self.ref_encoder_strides,
                gru_cell_units=self.ref_encoder_gru_cell_units,
                gst_style_embed_dim=self.gst_style_embed_dim,
                multi_num_heads=self.gst_multi_num_heads,
                gst_heads=self.gst_heads, dtype=self.dtype,
                name="RefEncoderGST")
            if self.use_prosody_stats:
                self.prosody_encoder = ProsodyStatEncoder(
                    embed_dim=self.prosody_embed_dim, dtype=self.dtype,
                    name="ProsodyStats")
        self.decoder_prenet = DecoderPrenet(
            model_dim=self.decoder_model_dimension,
            dense_hidden_units=self.decoder_prenet_dimension,
            dtype=self.dtype, name="DecoderPrenet")
        self.decoder = CrossAttentionBlocks(
            model_dim=self.decoder_model_dimension,
            dropout_rate=self.dropout_rate,
            num_heads=self.decoder_num_heads,
            feed_forward_dimension=self.decoder_feed_forward_dimension,
            maximum_position_encoding=self.decoder_maximum_position_encoding,
            dense_blocks=self.decoder_dense_blocks,
            conv_filters=self.decoder_attention_conv_filters,
            conv_kernel=self.decoder_attention_conv_kernel,
            conv_activation="relu", conv_padding="causal",
            name_prefix="Decoder", dtype=self.dtype, name="Decoder")
        self.final_proj_mel = nn.Dense(self.mel_channels * self.max_r,
                                       dtype=self.dtype, name="FinalProj")
        self.decoder_postnet = Postnet(mel_channels=self.mel_channels,
                                       conv_filters=self.postnet_conv_filters,
                                       conv_layers=self.postnet_conv_layers,
                                       kernel_size=self.postnet_kernel_size,
                                       dtype=self.dtype, name="Postnet")

    # -- encoder ------------------------------------------------------------

    def encode(self, inputs, targets=None, spk_embed=None,
               train_text_encoder: bool = False,
               train_style_encoder: bool = False, drop_n_heads=0):
        """Conditioning concat of `call_encoder` (:124-159): text encoding,
        optionally concat with tiled GST and/or speaker embeddings along the
        feature axis (dim x1/x2/x3 by system_type)."""
        padding_mask = encoder_padding_mask(inputs)
        x = self.text_encoder_prenet(inputs)
        text_enc_output, text_attn = self.text_encoder(
            x, padding_mask, train=train_text_encoder,
            drop_n_heads=drop_n_heads)

        gst_output, gst_attn, gst_tokens = None, None, None
        parts = [text_enc_output]
        n = text_enc_output.shape[1]
        if self.has_style:
            gst_output, gst_attn, gst_tokens = self.style_encoder(
                targets, train=train_style_encoder, drop_n_heads=drop_n_heads)
            parts.append(jnp.tile(gst_output, (1, n, 1)))
            if self.use_prosody_stats:
                parts.append(jnp.tile(self.prosody_encoder(targets),
                                      (1, n, 1)))
        if self.has_speaker:
            parts.append(jnp.tile(spk_embed, (1, n, 1)))
        enc_output = jnp.concatenate(parts, axis=2) if len(parts) > 1 else parts[0]

        # reference quirk: cross-attention mask recomputed from the (dense)
        # encoder output — effectively all-zeros (`AutoregressiveTransformer.py:158`)
        cross_mask = mel_padding_mask(enc_output)
        return (enc_output, cross_mask, text_attn, gst_attn, gst_tokens,
                gst_output, text_enc_output)

    def encode_style(self, targets, train: bool = False, drop_n_heads=0):
        """Style encoder alone (used by the style-consistency loss,
        `traning_steps.py:42-50`)."""
        return self.style_encoder(targets, train=train, drop_n_heads=drop_n_heads)

    # -- decoder ------------------------------------------------------------

    def decode(self, encoder_output, targets, encoder_padding_mask_,
               train: bool = False, drop_n_heads=0, r: int = 1,
               prenet_dropout: float = 0.5):
        """Teacher-forced full-sequence decode (`call_decoder` :161-181)."""
        dec_pad = mel_padding_mask(targets)
        la = look_ahead_mask(targets.shape[1])
        combined = jnp.maximum(dec_pad, la)
        dec_input = self.decoder_prenet(targets, prenet_dropout)
        dec_output, attn, _ = self.decoder(
            dec_input, encoder_output, combined, encoder_padding_mask_,
            train=train, drop_n_heads=drop_n_heads, reduction_factor=r)
        out_proj = self.final_proj_mel(dec_output)[:, :, :r * self.mel_channels]
        b, t = out_proj.shape[0], out_proj.shape[1]
        mel = out_proj.reshape(b, t * r, self.mel_channels)
        model_out = self.decoder_postnet(mel, train=train)
        model_out.update({"decoder_attention": attn,
                          "decoder_output": dec_output, "linear": mel})
        return model_out

    def decode_step(self, new_frame, encoder_output, encoder_padding_mask_,
                    caches, cache_index, r: int = 1,
                    prenet_dropout: float = 0.5, drop_n_heads=0,
                    return_attention: bool = False):
        """One incremental decode step with KV caches.

        new_frame: (b, 1, mel). Returns (mel_linear_r (b, r, mel), new_caches),
        plus the LAST block's cross-attention (b, heads, 1, n_enc) when
        ``return_attention`` — the same signal duration extraction reads
        (`extract_durations.py:113-120`), here powering the attention-
        completion stop in ``autoregressive_predict``.
        """
        dec_input = self.decoder_prenet(new_frame, prenet_dropout)
        dec_output, attn, new_caches = self.decoder(
            dec_input, encoder_output, None, encoder_padding_mask_,
            train=False, drop_n_heads=drop_n_heads, reduction_factor=r,
            caches=caches, cache_index=cache_index, pos_offset=cache_index)
        out_proj = self.final_proj_mel(dec_output)[:, :, :r * self.mel_channels]
        b = out_proj.shape[0]
        mel = out_proj.reshape(b, r, self.mel_channels)
        if return_attention:
            # insertion order = block order; the final dict entry is the last
            # decoder block (the one duration extraction reads)
            last_key = list(attn)[-1] if attn else None
            return mel, new_caches, (attn[last_key] if last_key else None)
        return mel, new_caches

    def postnet_forward(self, mel_window):
        """Postnet over a causal window (incremental decode helper)."""
        return self.decoder_postnet(mel_window, train=False)

    # -- full forward -------------------------------------------------------

    def __call__(self, inputs, targets, spk_embed=None,
                 train_text_encoder: bool = False,
                 train_style_encoder: bool = False,
                 train_decoder: bool = False, r: int = 1,
                 prenet_dropout: float = 0.5, drop_n_heads=0,
                 style_targets=None):
        # ``style_targets``: optional separate mel for the style/prosody
        # encoders (defaults to ``targets``, the reference's behavior). The
        # scheduled-sampling and GTA-input fine-tune steps corrupt the
        # DECODER input with model predictions; the style reference must
        # stay the clean ground-truth mel, matching serving (where the
        # reference audio is real).
        (enc_out, cross_mask, text_attn, gst_attn, gst_tokens, gst_output,
         text_enc_output) = self.encode(
            inputs, targets if style_targets is None else style_targets,
            spk_embed, train_text_encoder,
            train_style_encoder, drop_n_heads)
        model_out = self.decode(enc_out, targets, cross_mask,
                                train=train_decoder, drop_n_heads=drop_n_heads,
                                r=r, prenet_dropout=prenet_dropout)
        model_out.update({"text_encoder_attention": text_attn,
                          "gst_encoder_attention": gst_attn,
                          "gst_tokens": gst_tokens,
                          "gst_output": gst_output,
                          "text_enc_output": text_enc_output})
        return model_out

    # -- helpers ------------------------------------------------------------

    def start_vector(self, batch: int = 1):
        return jnp.full((batch, 1, self.mel_channels), self.mel_start_value,
                        self.dtype)

    @staticmethod
    def input_reshape(mel, stop_prob, r: int):
        """Teacher-forcing shift + r-stride (`input_reshape` :318-327):
        tar_mel = mel[:, :-1][:, ::r]; tar_real = mel[:, 1:]."""
        tar_inp = mel[:, :-1]
        tar_real = mel[:, 1:]
        tar_stop = stop_prob[:, 1:]
        mel_len = tar_inp.shape[1]
        tar_mel = tar_inp[:, 0::r, :]
        return tar_real, tar_mel, tar_stop, mel_len

    @staticmethod
    def encode_ref(ref_mel, r: int):
        """Reference-mel conditioning input: trim last frame, r-stride (:312-316)."""
        tar = ref_mel[None] if ref_mel.ndim == 2 else ref_mel
        return tar[:, :-1][:, 0::r, :]


# ---------------------------------------------------------------------------
# Incremental AR inference
# ---------------------------------------------------------------------------

def _cross_attention_kv(model: AutoregressiveTransformer, variables,
                        enc_output):
    """Precompute every decoder block's cross-attention K/V from the encoder
    output (static during decode) — saves two enc-length matmuls per block per
    step. Returns a list of (k, v) with shape (b, heads, n_enc, depth)."""
    params = variables["params"]["Decoder"]
    n_dense = model.decoder_dense_blocks
    out = []
    for i, h in enumerate(model.decoder_num_heads):
        name = f"CADB_{i}" if i < n_dense else f"CACB_{i - n_dense}"
        mha = params[name]["carn"]["mha"]
        depth = model.decoder_model_dimension // h
        b, n, _ = enc_output.shape

        def proj(w):
            y = enc_output @ w["kernel"] + w["bias"]
            return y.reshape(b, n, h, depth).transpose(0, 2, 1, 3)

        out.append((proj(mha["wk"]), proj(mha["wv"])))
    return out


def _decoder_cache_spec(model: AutoregressiveTransformer, batch: int,
                        max_steps: int):
    """Zero caches for every decoder block: self-attention KV
    (b, heads, max_steps, depth) plus, for conv blocks, the rolling causal-conv
    input window."""
    caches = []
    n_dense = model.decoder_dense_blocks
    for i, h in enumerate(model.decoder_num_heads):
        depth = model.decoder_model_dimension // h
        z = jnp.zeros((batch, h, max_steps, depth), model.dtype)
        entry = {"k": z, "v": z}
        if i >= n_dense:  # conv block: 2 causal convs of the block kernel
            rf = 2 * (model.decoder_attention_conv_kernel - 1)
            entry["conv"] = jnp.zeros(
                (batch, rf, model.decoder_model_dimension), model.dtype)
        caches.append(entry)
    return caches


def autoregressive_predict(model: AutoregressiveTransformer, variables,
                           inputs, ref_mel=None, spk_embed=None, *,
                           r: int = 1, max_length: int = 1000,
                           key: Optional[jax.Array] = None,
                           prenet_dropout: float = 0.5,
                           stop_enabled: bool = True,
                           attn_stop_patience: Optional[int] = None,
                           max_frames_per_token: Optional[float] = None):
    """jit-compilable greedy AR decode with stop-token early exit.

    inputs: (b, n) token ids; ref_mel (already r-strided via
    ``AutoregressiveTransformer.encode_ref``) when system uses style;
    spk_embed (b, 1, d) when system uses speakers.
    Returns dict with 'mel' (b, max_steps*r, mel) and 'mel_length' (b,) —
    callers slice mel[:, :mel_length] host-side.

    Free-running length-runaway guards (both opt-in, default off = exact
    reference semantics; ROADMAP r5 #3 — the trained mitigation arms all
    measured worse than the baseline, so the operative fix is decode-time):

    - ``attn_stop_patience=N``: ALSO stop an utterance once the last decoder
      block's cross-attention has focused on its final real token for N
      consecutive steps ("text consumed" — the same signal duration
      extraction trusts, `utils/alignments.py:87-165`). Catches stop-head
      misses, the dominant runaway mode.
    - ``max_frames_per_token=F``: hard per-utterance cap of F output frames
      per real input token (a text-proportional ceiling instead of the
      reference's one global max_length). Catches attention loops.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    b = inputs.shape[0]
    max_steps = int(max_length) // r + 1
    n_real = jnp.sum((inputs != 0).astype(jnp.int32), axis=1)  # (b,) tokens
    want_attn = attn_stop_patience is not None
    mel_ch = model.mel_channels
    # postnet receptive field: n_layers causal convs of kernel k
    ctx = model.postnet_conv_layers * (model.postnet_kernel_size - 1)
    W = ctx + r  # static postnet window

    ekey, dkey = jax.random.split(key)
    enc_out, cross_mask, text_attn, gst_attn, gst_tokens, *_ = model.apply(
        variables, inputs, ref_mel, spk_embed, False, False, 0,
        method=AutoregressiveTransformer.encode,
        rngs={"dropout": ekey, "prenet": ekey})

    lin_buf = jnp.zeros((b, W + max_steps * r, mel_ch), model.dtype)
    out_buf = jnp.zeros((b, max_steps * r, mel_ch), model.dtype)
    caches = _decoder_cache_spec(model, b, max_steps)
    for entry, (ck, cv) in zip(caches, _cross_attention_kv(model, variables,
                                                           enc_out)):
        entry["ck"], entry["cv"] = ck, cv
    start = jnp.full((b, 1, mel_ch), model.mel_start_value, model.dtype)

    def cond(carry):
        i, stopped_vec, *_ = carry
        return jnp.logical_and(i < max_steps, jnp.logical_not(stopped_vec.all()))

    def body(carry):
        (i, stopped_vec, last, caches, lin_buf, out_buf, lengths,
         attn_ctr) = carry
        k1, k2 = jax.random.split(jax.random.fold_in(dkey, i))
        step_out = model.apply(
            variables, last, enc_out, cross_mask, caches, i, r,
            prenet_dropout, 0, want_attn,
            method=AutoregressiveTransformer.decode_step,
            rngs={"prenet": k1, "dropout": k2})
        if want_attn:
            mel_r, new_caches, cross_attn = step_out
        else:
            mel_r, new_caches = step_out
            cross_attn = None
        lin_buf2 = jax.lax.dynamic_update_slice(lin_buf, mel_r, (0, W + i * r, 0))
        # causal postnet over the trailing receptive-field window
        window = jax.lax.dynamic_slice(lin_buf2, (0, i * r + r, 0),
                                       (b, W, mel_ch))
        post = model.apply(variables, window,
                           method=AutoregressiveTransformer.postnet_forward)
        final_r = post["final_output"][:, -r:, :]
        out_buf2 = jax.lax.dynamic_update_slice(out_buf, final_r, (0, i * r, 0))
        # stop head over ALL r new frames: at r>1 the stop class can fire on
        # an interior frame of the group (utterance ends of the "wrong"
        # parity) which a last-frame-only check never sees — the decode then
        # runs to max_length (the reference predict loop shares the miss,
        # `AutoregressiveTransformer.py:281-293` checks stop_prob[:, -1] only)
        stop_logits = post["stop_prob"][:, -r:]
        if stop_enabled:
            hit = (jnp.argmax(stop_logits, axis=-1)
                   == model.stop_prob_index)            # (b, r)
        else:
            hit = jnp.zeros((b, r), bool)
        hit_any = hit.any(axis=-1)
        # per-utterance length: frames up to and including the stopping frame
        group_len = jnp.where(hit_any, jnp.argmax(hit, axis=-1) + 1, r)
        stop_now = hit_any
        if want_attn:
            # mean-over-heads focus position of the last block's
            # cross-attention for this step's (single) query
            w = cross_attn.mean(axis=1)[:, -1, :]        # (b, n_enc)
            focus = jnp.argmax(w, axis=-1)
            complete = focus >= n_real - 2               # end token reached
            attn_ctr = jnp.where(complete & ~stopped_vec, attn_ctr + 1, 0)
            stop_now = stop_now | (attn_ctr >= attn_stop_patience)
        if max_frames_per_token is not None:
            cap = jnp.maximum(
                (n_real.astype(jnp.float32)
                 * max_frames_per_token).astype(jnp.int32), r)
            cap_hit = (i + 1) * r >= cap
            group_len = jnp.where(cap_hit & ~hit_any,
                                  jnp.clip(cap - i * r, 1, r), group_len)
            stop_now = stop_now | cap_hit
        new_lengths = jnp.where(stopped_vec, lengths, i * r + group_len)
        next_input = final_r[:, -1:, :]
        return (i + 1, stopped_vec | stop_now, next_input, new_caches,
                lin_buf2, out_buf2, new_lengths, attn_ctr)

    init = (jnp.int32(0), jnp.zeros((b,), bool), start, caches, lin_buf,
            out_buf, jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32))
    (i, stopped_vec, _, _, _, out_buf, lengths, _) = jax.lax.while_loop(
        cond, body, init)
    return {"mel": out_buf, "mel_lengths": lengths,
            "mel_length": lengths.max(), "steps": i,
            "text_encoder_attention": text_attn,
            "gst_encoder_attention": gst_attn, "gst_tokens": gst_tokens}


# ---------------------------------------------------------------------------
# Streamed (chunked) AR inference
# ---------------------------------------------------------------------------

def streaming_decode_init(model: AutoregressiveTransformer, variables,
                          inputs, ref_mel=None, spk_embed=None, *,
                          r: int = 1, max_length: int = 1000, key=None):
    """Encode once and build the decode carry for ``decode_chunk``.

    Returns (state dict, enc pack). The carry holds the KV caches, feedback
    frame, linear-mel ring window, step counter, stop flags and rng — chunked
    decoding is EXACTLY the while_loop decode split at chunk boundaries (same
    per-step rng chain `fold_in(dkey, i)`).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    b = inputs.shape[0]
    max_steps = int(max_length) // r + 1
    ctx = model.postnet_conv_layers * (model.postnet_kernel_size - 1)
    W = ctx + r
    ekey, dkey = jax.random.split(key)
    enc_out, cross_mask, *_ = model.apply(
        variables, inputs, ref_mel, spk_embed, False, False, 0,
        method=AutoregressiveTransformer.encode,
        rngs={"dropout": ekey, "prenet": ekey})
    caches = _decoder_cache_spec(model, b, max_steps)
    for entry, (ck, cv) in zip(caches, _cross_attention_kv(model, variables,
                                                           enc_out)):
        entry["ck"], entry["cv"] = ck, cv
    state = {
        "i": jnp.int32(0),
        "stopped": jnp.zeros((b,), bool),
        "last": jnp.full((b, 1, model.mel_channels), model.mel_start_value,
                         model.dtype),
        "caches": caches,
        "window": jnp.zeros((b, W, model.mel_channels), model.dtype),
        "lengths": jnp.zeros((b,), jnp.int32),
        "dkey": dkey,
    }
    return state, (enc_out, cross_mask)


def make_chunk_decoder(model: AutoregressiveTransformer, *, chunk: int,
                       r: int = 1, prenet_dropout: float = 0.5,
                       stop_enabled: bool = True):
    """Jitted fixed-size decode chunk: state -> (state, mel chunk (b, chunk*r, mel)).

    One compile per chunk size; identical math/rng to autoregressive_predict.
    """
    mel_ch = model.mel_channels
    ctx = model.postnet_conv_layers * (model.postnet_kernel_size - 1)
    W = ctx + r

    @jax.jit
    def decode_chunk(variables, state, enc_pack):
        enc_out, cross_mask = enc_pack
        b = state["last"].shape[0]
        out_chunk = jnp.zeros((b, chunk * r, mel_ch), model.dtype)

        def body(k, carry):
            state, out_chunk = carry
            i = state["i"]
            k1, k2 = jax.random.split(jax.random.fold_in(state["dkey"], i))

            def live(state, out_chunk):
                mel_r, new_caches = model.apply(
                    variables, state["last"], enc_out, cross_mask,
                    state["caches"], i, r, prenet_dropout, 0,
                    method=AutoregressiveTransformer.decode_step,
                    rngs={"prenet": k1, "dropout": k2})
                window = jnp.concatenate([state["window"], mel_r], axis=1)
                post = model.apply(
                    variables, window,
                    method=AutoregressiveTransformer.postnet_forward)
                final_r = post["final_output"][:, -r:, :]
                # all-r-frame stop check (see autoregressive_predict: a
                # last-frame-only check misses interior-parity stops at r>1)
                stop_logits = post["stop_prob"][:, -r:]
                if stop_enabled:
                    hit = (jnp.argmax(stop_logits, axis=-1)
                           == model.stop_prob_index)    # (b, r)
                    stop_now = hit.any(axis=-1)
                else:
                    hit = jnp.zeros((b, r), bool)
                    stop_now = jnp.zeros((b,), bool)
                group_len = jnp.where(stop_now,
                                      jnp.argmax(hit, axis=-1) + 1, r)
                new_lengths = jnp.where(state["stopped"], state["lengths"],
                                        i * r + group_len)
                new_state = dict(
                    state, i=i + 1, stopped=state["stopped"] | stop_now,
                    last=final_r[:, -1:, :], caches=new_caches,
                    window=window[:, r:, :], lengths=new_lengths)
                out2 = jax.lax.dynamic_update_slice(out_chunk, final_r,
                                                    (0, k * r, 0))
                return new_state, out2

            def dead(state, out_chunk):
                return dict(state, i=i + 1), out_chunk

            return jax.lax.cond(state["stopped"].all(), dead, live,
                                state, out_chunk)

        state, out_chunk = jax.lax.fori_loop(0, chunk, body,
                                             (state, out_chunk))
        return state, out_chunk

    return decode_chunk
