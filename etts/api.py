"""High-level synthesis API.

`TTSSynthesizer` wraps the AR model the way the reference entry points use it
(`synthesize_sentences.py:14-55`), `VocoderSynthesizer` is the `Synthesize`
class of `WaveRNN/synthesizer_wavernn.py:8-33`, and `TacotronSynthesizer`
mirrors `gst_tacotron/synthesizer.py` (in-graph Griffin-Lim on the linear
spectrogram, inverse preemphasis, endpoint trim).
"""
from __future__ import annotations

from pathlib import Path
import os

import jax
import jax.numpy as jnp
import numpy as np

from .ops.audio import AudioProcessor
from .ops.griffin_lim import griffin_lim
from .ops.normalizers import denormalize_db, db_to_amp, deemphasis
from .utils.config import ConfigManager

__all__ = ["TTSSynthesizer", "VocoderSynthesizer", "TacotronSynthesizer"]


class TTSSynthesizer:
    """AR GST-TransformerTTS text+ref-audio+speaker -> mel."""

    def __init__(self, config_path, session_name=None, checkpoint=None,
                 model_kind="autoregressive"):
        self.cm = ConfigManager(config_path, model_kind, session_name)
        self.config = self.cm.config
        self.model, self.variables, self.step, sched = self.cm.load_model(
            checkpoint)
        self.r = sched.get("reduction_factor", 1)
        self.prenet_dropout = sched.get("decoder_prenet_dropout", 0.5)
        self.audio = AudioProcessor(self.config)
        self.pipeline = self.cm.get_text_pipeline()
        self._decode_cache = {}
        self._fused_broken = set()   # geometries whose fused compile failed
        # free-running runaway guards (etts.models.autoregressive docstring);
        # config defaults, overridable per predict() call
        self.attn_stop_patience = self.config.get("attn_stop_patience")
        self.max_frames_per_token = self.config.get("max_frames_per_token")

    def encode_text(self, text: str):
        return np.asarray(self.pipeline(text), np.int32)

    def _decode_fn(self, max_length: int, attn_stop_patience=None,
                   max_frames_per_token=None):
        """Cached jitted AR decode (the whole encode+while_loop as ONE XLA
        program; eager lax dispatch costs ~100x for serving). Retraces per
        (batch, text_len, ref_len) shape bucket inside jax.jit's own cache."""
        ck = (max_length, attn_stop_patience, max_frames_per_token)
        if ck not in self._decode_cache:
            from .models.autoregressive import autoregressive_predict

            @jax.jit
            def fn(variables, inp, ref, spk, key):
                return autoregressive_predict(
                    self.model, variables, inp, ref, spk, r=self.r,
                    max_length=max_length, key=key,
                    prenet_dropout=self.prenet_dropout,
                    attn_stop_patience=attn_stop_patience,
                    max_frames_per_token=max_frames_per_token)

            self._decode_cache[ck] = fn
        return self._decode_cache[ck]

    def _can_fuse(self) -> bool:
        """Fused Pallas decode supports: TPU, any reduction factor r,
        all-dense decoder blocks with a uniform head count (the flagship
        geometry). Tiny/debug dims stay on the while_loop path — the TPU
        compiler rejects (or crawls on) degenerate sub-lane shapes
        (BENCH_NOTES round-1 note)."""
        if os.environ.get("ETTS_NO_FUSED_DECODE"):
            # crash-forensics / serving mitigation switch: pin the decode to
            # the while_loop path so the fused kernel can be ruled in or out
            # as the source of a worker fault (VERDICT r4 #3)
            return False
        m = self.model
        return (jax.default_backend() == "tpu"
                and m.decoder_model_dimension >= 128
                # the kernel packs the mel frame into one 128-wide lane
                # (build_decode_inputs pads mel -> LANE); wider mels must
                # fall back to the while_loop decoder, not crash in jnp.pad
                and m.mel_channels <= 128
                and m.decoder_dense_blocks == len(m.decoder_num_heads)
                and len(set(m.decoder_num_heads)) == 1)

    def _fused_fn(self, max_length: int, attn_stop_patience=None,
                  max_frames_per_token=None):
        """Cached jitted encode + fused-Pallas-kernel decode (single stream).

        ~4x lower latency than the while_loop path (28.6 vs 115 us/step at
        reference scale on one v5e)."""
        ck = ("fused", max_length, attn_stop_patience, max_frames_per_token)
        if ck not in self._decode_cache:
            from .models.autoregressive import AutoregressiveTransformer
            from .ops.pallas.decoder_step import make_fused_decoder
            decode = make_fused_decoder(
                self.model, r=self.r, max_steps=max_length // self.r + 1,
                attn_stop_patience=attn_stop_patience,
                max_frames_per_token=max_frames_per_token)

            @jax.jit
            def fn(variables, inp, ref, spk, key):
                ekey, dkey = jax.random.split(key)
                enc_out, _, text_attn, gst_attn, gst_tokens, *_ = \
                    self.model.apply(
                        variables, inp, ref, spk, False, False, 0,
                        method=AutoregressiveTransformer.encode,
                        rngs={"dropout": ekey, "prenet": ekey})
                mel, length, steps = decode(variables, enc_out, dkey,
                                            self.prenet_dropout)
                return {"mel": mel, "mel_length": length,
                        "mel_lengths": length[None], "steps": steps,
                        "text_encoder_attention": text_attn,
                        "gst_encoder_attention": gst_attn,
                        "gst_tokens": gst_tokens}

            self._decode_cache[ck] = fn
        return self._decode_cache[ck]

    def _run_decode(self, inp, ref, spk, max_length, key,
                    attn_stop_patience=None, max_frames_per_token=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        asp = (self.attn_stop_patience if attn_stop_patience is None
               else (attn_stop_patience or None))
        mft = (self.max_frames_per_token if max_frames_per_token is None
               else (max_frames_per_token or None))
        ref = ref if self.model.has_style else None
        spk = spk if self.model.has_speaker else None
        if inp.shape[0] == 1 and self._can_fuse():
            fused_ck = ("fused", max_length, asp, mft)
            if fused_ck not in self._fused_broken:
                try:
                    fn = self._fused_fn(max_length, asp, mft)
                    return fn(self.variables, inp, ref, spk, key)
                except Exception as e:  # Mosaic legalization/compile failure
                    import warnings
                    warnings.warn(
                        "fused decode kernel failed "
                        f"({type(e).__name__}: {e}); falling back to the "
                        "while_loop decode path for this geometry")
                    self._fused_broken.add(fused_ck)
        fn = self._decode_fn(max_length, asp, mft)
        return fn(self.variables, inp, ref, spk, key)

    def _reject_forward_conditioning(self, ref_mel, spk_embed):
        """The forward family (ForwardTransformer) takes no style/speaker
        conditioning — fail loudly instead of silently ignoring the args
        (ADVICE r3: a caller passing conditioning got no error and no
        effect). max_length likewise does not apply: the forward model
        emits its whole mel in one shot bounded by config max_frames."""
        if ref_mel is not None or spk_embed is not None:
            raise ValueError(
                "forward-family models take no ref_mel/spk_embed "
                "conditioning (ForwardTransformer is text->mel only); "
                "use an autoregressive system_type for style/speaker "
                "control")

    def predict(self, text, ref_mel=None, spk_embed=None, max_length=1000,
                key=None, speed_regulator=1.0,
                attn_stop_patience=None, max_frames_per_token=None):
        if self.cm.model_kind == "forward":
            self._reject_forward_conditioning(ref_mel, spk_embed)
            out = self.model.apply(
                self.variables, jnp.asarray(self.encode_text(text))[None],
                None, max_frames=int(self.config.get("max_frames", 1280)),
                durations_scalar=1.0 / speed_regulator,
                rngs={"dropout": key if key is not None else jax.random.PRNGKey(0),
                      "prenet": key if key is not None else jax.random.PRNGKey(0)})
            n = int(out["mel_lengths"][0])
            return {"mel": np.asarray(out["mel"][0][:n])}
        inp = jnp.asarray(self.encode_text(text))[None]
        ref = None
        if ref_mel is not None:
            ref = self.model.encode_ref(jnp.asarray(ref_mel), r=self.r)
        spk = None
        if spk_embed is not None:
            spk = jnp.asarray(spk_embed).reshape(1, 1, -1)
        self._check_conditioning(ref, spk)
        out = self._run_decode(inp, ref, spk, max_length, key,
                               attn_stop_patience, max_frames_per_token)
        n = int(out["mel_length"])
        return {"mel": np.asarray(out["mel"][0][:n]),
                "gst_tokens": out.get("gst_tokens"),
                # per-utterance style signal (the token-bank attention of
                # the reference encoder); gst_tokens is the CONSTANT bank
                "gst_attention": out.get("gst_encoder_attention")}

    def predict_many(self, texts, ref_mel=None, spk_embed=None,
                     max_length=1000, key=None,
                     attn_stop_patience=None, max_frames_per_token=None):
        """Batch-synthesize several sentences in ONE decode (serving path):
        token sequences pad to a common length, the while_loop decodes all
        rows with per-utterance stop tracking. Returns a list of mels."""
        seqs = [self.encode_text(t) for t in texts]
        n = max(len(s) for s in seqs)
        inp = np.zeros((len(seqs), n), np.int32)
        for i, s in enumerate(seqs):
            inp[i, :len(s)] = s
        ref = None
        if ref_mel is not None and self.model.has_style:
            ref = self.model.encode_ref(jnp.asarray(ref_mel), r=self.r)
            ref = jnp.tile(ref, (len(seqs), 1, 1))
        spk = None
        if spk_embed is not None and self.model.has_speaker:
            spk = jnp.tile(jnp.asarray(spk_embed).reshape(1, 1, -1),
                           (len(seqs), 1, 1))
        self._check_conditioning(ref, spk)
        out = self._run_decode(jnp.asarray(inp), ref, spk, max_length, key,
                               attn_stop_patience, max_frames_per_token)
        lengths = np.asarray(out["mel_lengths"])
        return [np.asarray(out["mel"][i][:int(lengths[i])])
                for i in range(len(seqs))]

    def _check_conditioning(self, ref, spk):
        """Fail with a clear message instead of a jnp.tile TypeError deep in
        encode when required conditioning for the system_type is missing."""
        st = self.model.system_type
        if self.model.has_style and ref is None:
            raise ValueError(
                f"model system_type={st!r} requires reference-style audio: "
                "pass ref_mel= (e.g. TTSSynthesizer.mel_from_wav(wav))")
        if self.model.has_speaker and spk is None:
            raise ValueError(
                f"model system_type={st!r} requires a speaker embedding: "
                "pass spk_embed= (a d-vector .npy, see "
                "synthesize_sentences_speaker.py --spk_embed_dir)")

    def mel_from_wav(self, wav):
        """Reference-audio wav -> normalized mel (t, n_mels)."""
        return np.asarray(self.audio.mel_spectrogram(np.asarray(wav))).T

    # -- streaming ----------------------------------------------------------

    def _stream_inputs(self, text, ref_mel, spk_embed):
        inp = jnp.asarray(self.encode_text(text))[None]
        ref = None
        if ref_mel is not None and self.model.has_style:
            ref = self.model.encode_ref(jnp.asarray(ref_mel), r=self.r)
        spk = None
        if spk_embed is not None and self.model.has_speaker:
            spk = jnp.asarray(spk_embed).reshape(1, 1, -1)
        return inp, ref, spk

    def stream_mels(self, text, ref_mel=None, spk_embed=None, *,
                    mel_chunk: int = 40, max_length: int = 1000, key=None):
        """Yield mel chunks as they decode (low-latency serving)."""
        from .streaming import stream_mel
        inp, ref, spk = self._stream_inputs(text, ref_mel, spk_embed)
        yield from stream_mel(self.model, self.variables, inp, ref, spk,
                              chunk=mel_chunk, r=self.r,
                              max_length=max_length,
                              prenet_dropout=self.prenet_dropout, key=key)

    def stream(self, text, vocoder: "VocoderSynthesizer", ref_mel=None,
               spk_embed=None, *, mel_chunk: int = 40, max_length: int = 1000,
               key=None, int8_weights=None):
        """Yield waveform chunks end to end (text -> streamed audio).

        Applies the (mel+4)/8 vocoder contract between the stages; first
        audio in ~7 ms at 0.2 s chunks on a v5e (BENCH_NOTES). Works for
        both model families: the AR decode streams mel chunks as they
        decode; the forward model emits its mel in one shot (no feedback
        loop) and streams through chunked vocoding — first audio after one
        chunk's vocode rather than the whole utterance's."""
        from .streaming import stream_synthesize
        if self.cm.model_kind == "forward":
            from .streaming import stream_vocode
            self._reject_forward_conditioning(ref_mel, spk_embed)
            mel = self.predict(text, key=key)["mel"]
            voc_mel = (jnp.asarray(mel) + 4.0) / 8.0
            chunks = (voc_mel[i:i + mel_chunk]
                      for i in range(0, voc_mel.shape[0], mel_chunk))
            yield from stream_vocode(
                vocoder.model, vocoder.variables, chunks,
                chunk_frames=mel_chunk,
                mu_law=vocoder.config.get("mu_law", True), key=key,
                int8_weights=vocoder._int8(int8_weights))
            return
        inp, ref, spk = self._stream_inputs(text, ref_mel, spk_embed)
        yield from stream_synthesize(
            self.model, self.variables, vocoder.model, vocoder.variables,
            inp, ref, spk, r=self.r, max_length=max_length,
            mel_chunk=mel_chunk, prenet_dropout=self.prenet_dropout,
            mu_law=vocoder.config.get("mu_law", True), key=key,
            int8_weights=vocoder._int8(int8_weights))


class VocoderSynthesizer:
    """Batch-folded WaveRNN vocoder (reference `synthesizer_wavernn.py`)."""

    def __init__(self, config_path, session_name=None, checkpoint=None):
        from .utils.checkpoints import CheckpointManager
        from .utils.config import _init_variables
        self.cm = ConfigManager(config_path, "wavernn", session_name)
        self.config = self.cm.config
        self.model = self.cm.get_model(ignore_hash=True)
        variables = _init_variables(self.model, self.config, "wavernn")
        tree = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
                "step": np.int32(0)}
        mngr = CheckpointManager(Path(checkpoint) if checkpoint
                                 else self.cm.weights_dir)
        restored, step = mngr.restore(tree, partial=True)
        if step is not None:
            tree = restored
        self.variables = {"params": tree["params"],
                          "batch_stats": tree["batch_stats"]}

    def generate(self, mel, batched=None, target=None, overlap=None,
                 mu_law=None, key=None, int8_weights=None, use_pallas=None):
        """mel: (t, n_mels) in WaveRNN's [0, 1] convention -> waveform.

        ``int8_weights=True`` streams per-column-quantized kernel weights
        (f32 accumulate) — ~half the VMEM weight traffic that floors the
        sample-step time; config default key ``voc_int8_weights``.
        ``use_pallas=False`` forces the lax.scan sample loop (the fused
        kernel's fallback; ~10x slower but geometry-independent)."""
        from .models.wavernn import generate as _generate
        c = self.config
        return np.asarray(_generate(
            self.model, self.variables, jnp.asarray(mel)[None],
            batched=c.get("voc_gen_batched", True) if batched is None else batched,
            target=c.get("voc_target", 11000) if target is None else target,
            overlap=c.get("voc_overlap", 550) if overlap is None else overlap,
            mu_law=c.get("mu_law", True) if mu_law is None else mu_law,
            key=key, int8_weights=self._int8(int8_weights),
            use_pallas=use_pallas))

    def generate_many(self, mels, target=None, overlap=None, mu_law=None,
                      key=None, int8_weights=None):
        """Vocode a list of mels in ONE sequential pass (serving throughput;
        all utterances' fold rows share the sample loop)."""
        from .models.wavernn import generate_batch
        c = self.config
        wavs = generate_batch(
            self.model, self.variables, [jnp.asarray(m) for m in mels],
            target=c.get("voc_target", 11000) if target is None else target,
            overlap=c.get("voc_overlap", 550) if overlap is None else overlap,
            mu_law=c.get("mu_law", True) if mu_law is None else mu_law,
            key=key, int8_weights=self._int8(int8_weights))
        return [np.asarray(w) for w in wavs]

    def _int8(self, override):
        """True -> int8 dequant path; "mxu" -> native int8 MXU dots
        (etts.models.wavernn._int8_dtype); falsy -> full precision."""
        v = (override if override is not None
             else self.config.get("voc_int8_weights", False))
        return v if v == "mxu" else bool(v)


class TacotronSynthesizer:
    """GST-Tacotron text+ref-mel -> wav via linear-spectrogram Griffin-Lim
    (gst_tacotron/synthesizer.py behavior: dB denorm + power raise +
    Griffin-Lim + inverse preemphasis)."""

    def __init__(self, config_path, session_name=None, checkpoint=None):
        from .utils.checkpoints import CheckpointManager
        from .utils.config import _init_variables
        self.cm = ConfigManager(config_path, "tacotron", session_name)
        self.config = self.cm.config
        self.model = self.cm.get_model(ignore_hash=True)
        variables = _init_variables(self.model, self.config, "tacotron")
        tree = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
                "step": np.int32(0)}
        mngr = CheckpointManager(Path(checkpoint) if checkpoint
                                 else self.cm.weights_dir)
        restored, step = mngr.restore(tree, partial=True)
        if step is not None:
            tree = restored
        self.variables = {"params": tree["params"],
                          "batch_stats": tree["batch_stats"]}

    def synthesize(self, text, reference_mel=None, key=None):
        from .text import text_to_sequence
        from .models.tacotron import Tacotron
        c = self.config
        seq = np.asarray(text_to_sequence(
            text, [c.get("cleaners", "english_cleaners")]), np.int32)
        key = key if key is not None else jax.random.PRNGKey(0)
        rngs = {"prenet": key, "zoneout": jax.random.fold_in(key, 1),
                "dropout": jax.random.fold_in(key, 2),
                "style": jax.random.fold_in(key, 3)}
        ref = (jnp.asarray(reference_mel)[None]
               if reference_mel is not None else None)
        out = self.model.apply(self.variables, jnp.asarray(seq)[None],
                               jnp.asarray([len(seq)]), ref,
                               method=Tacotron.generate, rngs=rngs)
        linear = np.asarray(out["linear_outputs"][0])  # (t, num_freq)
        wav = self._inv_linear(linear)
        return wav, np.asarray(out["alignments"][0])

    def _inv_linear(self, linear):
        c = self.config
        S = denormalize_db(linear.T, c.get("min_level_db", -100))
        amp = db_to_amp(S + c.get("ref_level_db", 20))
        mag = jnp.power(jnp.asarray(amp), c.get("power", 1.5))
        wav = griffin_lim(mag, c["n_fft"], c["hop_length"], c["win_length"],
                          n_iter=c.get("griffin_lim_iters", 60))
        wav = deemphasis(wav, c.get("preemphasis", 0.97))
        return np.asarray(wav)
