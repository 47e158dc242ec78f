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
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .models.autoregressive import (AutoregressiveTransformer,
                                    make_chunk_decoder, streaming_decode_init)
from .models.wavernn import (WaveRNN, _conditioning_streams, _run_sample_loop)
from .ops.normalizers import mu_law_decode
from .utils.lru import LRU

__all__ = ["stream_mel", "stream_vocode", "stream_synthesize"]


def stream_mel(model: AutoregressiveTransformer, variables, inputs,
               ref_mel=None, spk_embed=None, *, chunk: int = 40, r: int = 1,
               max_length: int = 1000, prenet_dropout: float = 0.5,
               stop_enabled: bool = True, key=None,
               _decoder_cache=LRU(16)) -> Iterator[np.ndarray]:
    """Yield mel chunks (<= chunk*r frames each) for one utterance (b=1)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    # cache values hold a strong ref to the model so an id() can never be
    # recycled by a new model object while its compiled program is cached
    init_key = (id(model), "init", r, max_length)
    if init_key not in _decoder_cache:
        # one jitted program for encode + cache build: eager dispatch of the
        # init costs ~1 s of first-audio latency on the TPU tunnel
        _decoder_cache[init_key] = (model, jax.jit(functools.partial(
            streaming_decode_init, model, r=r, max_length=max_length)))
    state, enc_pack = _decoder_cache[init_key][1](
        variables, inputs, ref_mel, spk_embed, key=key)
    # prenet_dropout is closed over by make_chunk_decoder -> part of the key
    cache_key = (id(model), chunk, r, stop_enabled, float(prenet_dropout))
    if cache_key not in _decoder_cache:
        _decoder_cache[cache_key] = (model, make_chunk_decoder(
            model, chunk=chunk, r=r, prenet_dropout=prenet_dropout,
            stop_enabled=stop_enabled))
    dec = _decoder_cache[cache_key][1]
    max_steps = int(max_length) // r + 1
    done_steps = 0
    if not stop_enabled:
        while done_steps < max_steps:
            state, out = dec(variables, state, enc_pack)
            n_new = min(chunk, max_steps - done_steps)
            done_steps += n_new
            # no host sync at all: the chunk chain stays fully async and
            # downstream stages pipeline behind it (device arrays out)
            yield out[0, :n_new * r]
        return

    # stop-enabled: the stop decision needs a host sync; LAG it one chunk so
    # the sync overlaps the next chunk's device compute instead of
    # serializing the pipeline (~50 ms per sync on a congested TPU tunnel).
    # One speculative chunk may decode past the stop; it is discarded.
    pending = None  # (state_after, out, offset_frames, n_frames)
    while done_steps < max_steps:
        new_state, out = dec(variables, state, enc_pack)
        n_new = min(chunk, max_steps - done_steps)
        if pending is not None:
            p_state, p_out, p_off, p_n = pending
            stopped = bool(np.asarray(p_state["stopped"]).all())
            if stopped:
                length = int(np.asarray(p_state["lengths"])[0])
                take = max(0, min(length - p_off, p_n))
                if take > 0:
                    yield np.asarray(p_out[0, :take])
                return
            yield np.asarray(p_out[0, :p_n])
        pending = (new_state, out, done_steps * r, n_new * r)
        done_steps += n_new
        state = new_state
    if pending is not None:
        p_state, p_out, p_off, p_n = pending
        length = int(np.asarray(p_state["lengths"])[0])
        stopped = bool(np.asarray(p_state["stopped"]).all())
        take = max(0, min(length - p_off, p_n)) if stopped else p_n
        if take > 0:
            yield np.asarray(p_out[0, :take])


def _jit_vocode_chunk(model: WaveRNN, n_frames: int, use_pallas: bool,
                      weight_dtype=None):
    """Jitted one-chunk vocode with carried state.

    TPU path: the fused Pallas kernel with VMEM-resident weights and explicit
    state in/out — the lax.scan path re-streams ~14 MB of weights from HBM
    per SAMPLE (~23 us/step at 512 dims), 10x the kernel.
    ``weight_dtype="int8"`` streams per-column-quantized kernel weights
    (halves the VMEM weight stream that bounds the sample step)."""
    if use_pallas:
        from .ops.pallas.wavernn_cell import wavernn_sample_loop, LANE
        kw = {} if weight_dtype is None else {"weight_dtype": weight_dtype}

        @jax.jit
        def fn(variables, mel_ctx, state):
            mels_up, aux = model.apply(variables, mel_ctx[None], False,
                                       method=WaveRNN.upsample_cond)
            cond = jnp.swapaxes(jnp.concatenate([mels_up, aux], -1), 0, 1)
            params = variables["params"]
            d = model.rnn_dims
            r1 = {k: params[f"rnn1_{k}"] for k in ("wi", "wh", "bi", "bh")}
            r2 = {k: params[f"rnn2_{k}"] for k in ("wi", "wh", "bi", "bh")}
            Wf1, bf1 = params["fc1"]["kernel"], params["fc1"]["bias"]
            Wf2, bf2 = params["fc2"]["kernel"], params["fc2"]["bias"]
            Wf3, bf3 = params["fc3"]["kernel"], params["fc3"]["bias"]
            seed = jax.random.randint(state["key"], (), 0, 2 ** 31 - 1)
            kstate = {"h1": state["h1"], "h2": state["h2"],
                      "x": jnp.broadcast_to(state["x"], (1, LANE))}
            out, new = wavernn_sample_loop(
                cond, params["I"]["kernel"], params["I"]["bias"],
                r1["wi"], r1["wh"], r1["bi"], r1["bh"],
                r2["wi"][:d], r2["wi"][d:], r2["wh"], r2["bi"], r2["bh"],
                Wf1[:d], Wf1[d:], bf1, Wf2[:model.fc_dims],
                Wf2[model.fc_dims:], bf2, Wf3, bf3, seed,
                feat=model.feat_dims, adim=model.aux_dims, mode=model.mode,
                n_classes=model.n_classes, state=kstate, return_state=True,
                **kw)
            return out[:, 0], {"h1": new["h1"], "h2": new["h2"],
                               "x": new["x"][:, :1],
                               "key": jax.random.fold_in(state["key"], 1)}
        return fn

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
                  use_pallas: bool | None = None, int8_weights: bool = False,
                  _fn_cache=LRU(8)) -> Iterator[np.ndarray]:
    """Consume an iterator of vocoder-convention mel chunks (t_i, n_mels),
    yield waveform chunks of chunk_frames*hop samples (last chunk shorter).

    State (GRU hiddens + feedback sample + rng) carries across chunks; output
    equals the unbatched one-shot `generate` up to its final-fade/trim.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    mu_law = mu_law if model.mode == "RAW" else False
    pad = model.pad
    if chunk_frames < pad:
        # a smaller chunk would make the left-context slice negative-length
        # and silently corrupt chunk-boundary conditioning
        raise ValueError(
            f"chunk_frames ({chunk_frames}) must be >= model.pad ({pad})")
    d = model.rnn_dims
    state = {"h1": jnp.zeros((1, d)), "h2": jnp.zeros((1, d)),
             "x": jnp.zeros((1, 1)), "key": key}
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    from .ops.pallas import pallas_available
    use_pallas = use_pallas and pallas_available
    # int8 weight streaming exists only in the kernel path (generate() has
    # the same contract: the flag is a no-op on the lax.scan path)
    wdt = "int8" if (int8_weights and use_pallas) else None
    fkey = (id(model), chunk_frames, use_pallas, wdt)
    if fkey not in _fn_cache:
        # strong model ref in the value prevents stale-id cache aliasing
        _fn_cache[fkey] = (model,
                           _jit_vocode_chunk(model, chunk_frames, use_pallas,
                                             wdt))
    vocode = _fn_cache[fkey][1]
    n_mels = model.feat_dims
    # device-side buffering: a host round-trip per chunk would serialize the
    # pipeline (~30-50 ms each on the TPU tunnel)
    left = jnp.zeros((pad, n_mels), jnp.float32)  # zero left pad (= generate)
    pending = jnp.zeros((0, n_mels), jnp.float32)

    def emit(ctx, state):
        wav, state = vocode(variables, ctx, state)
        if mu_law:
            wav = mu_law_decode(wav, model.n_classes, from_labels=False)
        return wav, state

    from .models.wavernn import _clamp_mels
    for mel in mel_chunks:
        # same serving input contract as the one-shot paths: OOD mel values
        # (runaway free-running decodes) degrade audio, never the worker
        pending = jnp.concatenate([pending,
                                   _clamp_mels(jnp.asarray(mel, jnp.float32))])
        while pending.shape[0] >= chunk_frames + pad:
            ctx = jnp.concatenate([left, pending[:chunk_frames + pad]])
            wav, state = emit(ctx, state)
            yield wav
            left = pending[chunk_frames - pad:chunk_frames]
            pending = pending[chunk_frames:]
    # flush: pad the tail up to the interior chunk shape so it reuses the
    # SAME compiled chunk program (no eager dispatch anywhere in a stream;
    # last-chunk latency == interior-chunk latency). The appended zero frames
    # reproduce the one-shot path's trailing zero pad — samples past the real
    # frame count are trimmed off, and causality + the <= pad conv halo mean
    # the kept samples are bit-identical to the variable-length eager flush.
    if pending.shape[0] > 0:
        n_total = int(pending.shape[0])
        hop = model.hop_length
        emitted = 0
        while emitted < n_total:
            short = chunk_frames + pad - int(pending.shape[0])
            if short > 0:
                pending = jnp.concatenate(
                    [pending, jnp.zeros((short, n_mels), jnp.float32)])
            ctx = jnp.concatenate([left, pending[:chunk_frames + pad]])
            wav, state = emit(ctx, state)
            take = min(chunk_frames, n_total - emitted)
            yield wav[:take * hop]
            left = pending[chunk_frames - pad:chunk_frames]
            pending = pending[chunk_frames:]
            emitted += chunk_frames


def stream_synthesize(tts_model, tts_variables, voc_model, voc_variables,
                      inputs, ref_mel=None, spk_embed=None, *,
                      r: int = 1, max_length: int = 1000,
                      mel_chunk: int = 40, prenet_dropout: float = 0.5,
                      stop_enabled: bool = True, mu_law: bool = True,
                      int8_weights: bool = False,
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
    scaled = ((jnp.asarray(m) + 4.0) / 8.0 for m in mels)  # stays on device
    yield from stream_vocode(voc_model, voc_variables, scaled,
                             chunk_frames=mel_chunk * r, mu_law=mu_law,
                             int8_weights=int8_weights, key=k_voc)
