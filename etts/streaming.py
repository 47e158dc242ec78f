"""Streamed synthesis: chunked AR decode feeding the vocoder incrementally.

The reference synthesizes whole utterances (`synthesize_sentences.py:34-55`
decodes the full mel, then `WaveRNN/synthesizer_wavernn.py` vocodes it);
first-audio latency equals total latency. Here the AR decode runs in fixed
jitted chunks (`make_chunk_decoder`) and the WaveRNN sample loop carries its
GRU state across chunks (`_run_sample_loop(state=...)`), so audio streams out
while the mel is still being decoded. Both chunked paths are EXACTLY equal to
their one-shot counterparts (same rng chains, same zero boundary conditions;
tested in tests/test_streaming.py).

Chunk-boundary correctness for the vocoder conditioning: each chunk is
upsampled with `pad` frames of real context on both sides, which covers the
MelResNet receptive field (2*pad+1 VALID conv) and the smoothing convs'
accumulated halo (< pad*hop samples), so chunked conditioning equals the
full-sequence computation in the interior.
"""
from __future__ import annotations

import functools
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.autoregressive import (AutoregressiveTransformer,
                                    make_chunk_decoder, streaming_decode_init)
from .models.wavernn import (WaveRNN, _conditioning_streams, _run_sample_loop)
from .ops.normalizers import mu_law_decode

__all__ = ["stream_mel", "stream_vocode", "stream_synthesize"]


def stream_mel(model: AutoregressiveTransformer, variables, inputs,
               ref_mel=None, spk_embed=None, *, chunk: int = 40, r: int = 1,
               max_length: int = 1000, prenet_dropout: float = 0.5,
               stop_enabled: bool = True, key=None,
               _decoder_cache={}) -> Iterator[np.ndarray]:
    """Yield mel chunks (<= chunk*r frames each) for one utterance (b=1)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    init_key = (id(model), "init", r, max_length)
    if init_key not in _decoder_cache:
        # one jitted program for encode + cache build: eager dispatch of the
        # init costs ~1 s of first-audio latency on the TPU tunnel
        _decoder_cache[init_key] = jax.jit(functools.partial(
            streaming_decode_init, model, r=r, max_length=max_length))
    state, enc_pack = _decoder_cache[init_key](
        variables, inputs, ref_mel, spk_embed, key=key)
    cache_key = (id(model), chunk, r, stop_enabled)
    if cache_key not in _decoder_cache:
        _decoder_cache[cache_key] = make_chunk_decoder(
            model, chunk=chunk, r=r, prenet_dropout=prenet_dropout,
            stop_enabled=stop_enabled)
    dec = _decoder_cache[cache_key]
    max_steps = int(max_length) // r + 1
    done_steps = 0
    while done_steps < max_steps:
        state, out = dec(variables, state, enc_pack)
        n_new = min(chunk, max_steps - done_steps)
        done_steps += n_new
        stopped = bool(np.asarray(state["stopped"]).all())
        if stopped:
            length = int(np.asarray(state["lengths"])[0])
            offset = (done_steps - n_new) * r
            take = max(0, min(length - offset, n_new * r))
            if take > 0:
                yield np.asarray(out[0, :take])
            return
        yield np.asarray(out[0, :n_new * r])


def _jit_vocode_chunk(model: WaveRNN, n_frames: int):
    @jax.jit
    def fn(variables, mel_ctx, state):
        mels_up, aux = model.apply(variables, mel_ctx[None], False,
                                   method=WaveRNN.upsample_cond)
        streams, w = _conditioning_streams(model, variables["params"],
                                           mels_up, aux)
        out, new_state = _run_sample_loop(model, streams, w, state["key"],
                                          state=state, return_state=True)
        return out[0], new_state
    return fn


def stream_vocode(model: WaveRNN, variables, mel_chunks, *,
                  chunk_frames: int = 40, mu_law: bool = True, key=None,
                  _fn_cache={}) -> Iterator[np.ndarray]:
    """Consume an iterator of vocoder-convention mel chunks (t_i, n_mels),
    yield waveform chunks of chunk_frames*hop samples (last chunk shorter).

    State (GRU hiddens + feedback sample + rng) carries across chunks; output
    equals the unbatched one-shot `generate` up to its final-fade/trim.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    mu_law = mu_law if model.mode == "RAW" else False
    pad = model.pad
    d = model.rnn_dims
    state = {"h1": jnp.zeros((1, d)), "h2": jnp.zeros((1, d)),
             "x": jnp.zeros((1, 1)), "key": key}
    fkey = (id(model), chunk_frames)
    if fkey not in _fn_cache:
        _fn_cache[fkey] = _jit_vocode_chunk(model, chunk_frames)
    vocode = _fn_cache[fkey]
    n_mels = model.feat_dims
    left = np.zeros((pad, n_mels), np.float32)   # zero left pad (= generate)
    pending = np.zeros((0, n_mels), np.float32)

    def emit(ctx, state):
        wav, state = vocode(variables, jnp.asarray(ctx), state)
        if mu_law:
            wav = mu_law_decode(wav, model.n_classes, from_labels=False)
        return np.asarray(wav), state

    for mel in mel_chunks:
        pending = np.concatenate([pending, np.asarray(mel, np.float32)])
        while pending.shape[0] >= chunk_frames + pad:
            ctx = np.concatenate([left, pending[:chunk_frames + pad]])
            wav, state = emit(ctx, state)
            yield wav
            left = pending[chunk_frames - pad:chunk_frames]
            pending = pending[chunk_frames:]
    # flush: zero right pad (matches the one-shot path's trailing zero pad)
    if pending.shape[0] > 0:
        n = pending.shape[0]
        ctx = np.concatenate([left, pending,
                              np.zeros((pad, n_mels), np.float32)])
        # jit cache key is the frame count; flush sizes vary -> plain call
        mels_up, aux = model.apply(variables, jnp.asarray(ctx)[None], False,
                                   method=WaveRNN.upsample_cond)
        streams, w = _conditioning_streams(model, variables["params"],
                                           mels_up, aux)
        wav, _ = _run_sample_loop(model, streams, w, state["key"],
                                  state=state, return_state=True)
        wav = wav[0]
        if mu_law:
            wav = mu_law_decode(wav, model.n_classes, from_labels=False)
        yield np.asarray(wav)


def stream_synthesize(tts_model, tts_variables, voc_model, voc_variables,
                      inputs, ref_mel=None, spk_embed=None, *,
                      r: int = 1, max_length: int = 1000,
                      mel_chunk: int = 40, prenet_dropout: float = 0.5,
                      stop_enabled: bool = True, mu_law: bool = True,
                      key=None) -> Iterator[np.ndarray]:
    """Text tokens -> streaming waveform chunks (end-to-end).

    Applies the repo's mel contract between the stages: TTS layout (t, n_mels)
    in [-4, 4] -> vocoder store (mel+4)/8 in [0, 1].
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k_tts, k_voc = jax.random.split(key)
    mels = stream_mel(tts_model, tts_variables, inputs, ref_mel, spk_embed,
                      chunk=mel_chunk, r=r, max_length=max_length,
                      prenet_dropout=prenet_dropout,
                      stop_enabled=stop_enabled, key=k_tts)
    scaled = ((np.asarray(m) + 4.0) / 8.0 for m in mels)
    yield from stream_vocode(voc_model, voc_variables, scaled,
                             chunk_frames=mel_chunk * r, mu_law=mu_law,
                             key=k_voc)
