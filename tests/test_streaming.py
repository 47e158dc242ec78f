"""Streamed synthesis: chunked decode/vocode must EXACTLY match the one-shot
paths (same rng chains, same zero boundary conditions)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etts.models.autoregressive import (AutoregressiveTransformer,
                                        autoregressive_predict)
from etts.models.wavernn import (WaveRNN, _conditioning_streams,
                                 _run_sample_loop)
from etts.streaming import stream_mel, stream_vocode, stream_synthesize

MEL_C = 12


def _tts():
    model = AutoregressiveTransformer(
        system_type="text", max_r=3,
        encoder_model_dimension=32, decoder_model_dimension=32,
        encoder_num_heads=(2, 2), decoder_num_heads=(2, 2),
        encoder_dense_blocks=2, decoder_dense_blocks=2,
        encoder_feed_forward_dimension=64, decoder_feed_forward_dimension=64,
        encoder_attention_conv_filters=32, decoder_attention_conv_filters=32,
        encoder_prenet_dimension=32, decoder_prenet_dimension=32,
        postnet_conv_filters=32, postnet_conv_layers=2, postnet_kernel_size=3,
        encoder_maximum_position_encoding=100,
        decoder_maximum_position_encoding=400,
        mel_channels=MEL_C, vocab_size=40)
    key = jax.random.PRNGKey(0)
    phon = jax.random.randint(key, (1, 7), 1, 40)
    mel = jax.random.normal(key, (1, 9, MEL_C)) * 0.3
    variables = model.init({"params": key, "dropout": key, "prenet": key},
                           phon, mel, None, r=1)
    return model, variables, phon


def _voc():
    model = WaveRNN(rnn_dims=16, fc_dims=16, bits=4, pad=2,
                    upsample_factors=(2, 5), feat_dims=MEL_C, compute_dims=8,
                    res_out_dims=8, res_blocks=2, hop_length=10,
                    sample_rate=100, mode="MOL")
    key = jax.random.PRNGKey(1)
    t_mel = 9
    x = jnp.zeros((1, (t_mel - 4) * 10))
    mels = jax.random.normal(key, (1, t_mel, MEL_C))
    variables = model.init(jax.random.PRNGKey(2), x, mels, False)
    return model, variables


class TestStreamMel:
    def test_matches_one_shot_decode(self):
        """Chunked decode == while_loop decode, INCLUDING the per-step prenet
        dropout rng chain (fold_in(dkey, i))."""
        model, variables, phon = _tts()
        key = jax.random.PRNGKey(3)
        steps = 11
        ref = autoregressive_predict(model, variables, phon, None, None,
                                     r=1, max_length=steps - 1, key=key,
                                     prenet_dropout=0.5, stop_enabled=False)
        want = np.asarray(ref["mel"][0])
        chunks = list(stream_mel(model, variables, phon, chunk=4, r=1,
                                 max_length=steps - 1, prenet_dropout=0.5,
                                 stop_enabled=False, key=key))
        got = np.concatenate(chunks)
        assert got.shape[0] == steps  # max_steps = max_length//r + 1
        np.testing.assert_allclose(got[:want.shape[0]], want, atol=1e-3)

    def test_stop_trims_stream(self):
        model, variables, phon = _tts()
        sl = variables["params"]["Postnet"]["stop_linear"]
        sl["kernel"] = jnp.zeros_like(sl["kernel"])
        sl["bias"] = jnp.asarray([0.0, 0.0, 10.0])
        chunks = list(stream_mel(model, variables, phon, chunk=4, r=1,
                                 max_length=20, prenet_dropout=0.0,
                                 key=jax.random.PRNGKey(0)))
        total = sum(c.shape[0] for c in chunks)
        assert total == 1  # stop fires on the first frame

    def test_stop_interior_frame_r2(self):
        """At r=2 the always-firing stop head fires on the FIRST frame of the
        group — a last-frame-only check would stream to max_length (the
        soak-trained checkpoint hit exactly this parity miss)."""
        model, variables, phon = _tts()
        sl = variables["params"]["Postnet"]["stop_linear"]
        sl["kernel"] = jnp.zeros_like(sl["kernel"])
        sl["bias"] = jnp.asarray([0.0, 0.0, 10.0])
        chunks = list(stream_mel(model, variables, phon, chunk=4, r=2,
                                 max_length=40, prenet_dropout=0.0,
                                 key=jax.random.PRNGKey(0)))
        total = sum(c.shape[0] for c in chunks)
        assert total == 1  # exact length: stop on frame 0 of the r-group


class TestStreamVocode:
    def test_matches_one_shot_sample_loop(self):
        """Chunked vocoding == one long scan: same conditioning (pad-context
        chunks), same GRU state carry, same rng chain."""
        model, variables = _voc()
        key = jax.random.PRNGKey(5)
        t_mel = 16
        mel = np.asarray(jax.random.uniform(jax.random.PRNGKey(6),
                                            (t_mel, MEL_C)))
        # one-shot: zero-pad (as generate does), upsample, single scan
        padded = jnp.pad(jnp.asarray(mel)[None],
                         ((0, 0), (model.pad, model.pad), (0, 0)))
        mels_up, aux = model.apply(variables, padded, False,
                                   method=WaveRNN.upsample_cond)
        streams, w = _conditioning_streams(model, variables["params"],
                                           mels_up, aux)
        want = np.asarray(_run_sample_loop(model, streams, w, key)[0])

        chunks = list(stream_vocode(model, variables,
                                    [mel[:5], mel[5:9], mel[9:]],
                                    chunk_frames=6, mu_law=False, key=key))
        got = np.concatenate(chunks)
        assert got.shape == want.shape == (t_mel * model.hop_length,)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestStreamSynthesize:
    def test_end_to_end_stream(self):
        tts_model, tts_vars, phon = _tts()
        voc_model, voc_vars = _voc()
        chunks = list(stream_synthesize(
            tts_model, tts_vars, voc_model, voc_vars, phon,
            r=1, max_length=11, mel_chunk=4, prenet_dropout=0.0,
            stop_enabled=False, key=jax.random.PRNGKey(7)))
        wav = np.concatenate(chunks)
        assert wav.shape[0] == 12 * voc_model.hop_length
        assert np.isfinite(wav).all()
        assert np.abs(wav).max() <= 1.0 + 1e-6
        # first chunk arrives after only mel_chunk frames of decoding
        assert chunks[0].shape[0] == 4 * voc_model.hop_length

    def test_forward_model_stream_api(self):
        """TTSSynthesizer.stream's forward-model branch: one-shot mel ->
        chunked vocoding, first audio after one chunk's vocode."""
        from etts.api import TTSSynthesizer, VocoderSynthesizer
        voc_model, voc_vars = _voc()
        mel = np.asarray(jax.random.normal(
            jax.random.PRNGKey(3), (12, MEL_C))) * 2.0  # TTS layout [-4, 4]

        tts = TTSSynthesizer.__new__(TTSSynthesizer)
        tts.cm = type("CM", (), {"model_kind": "forward"})()
        tts.predict = lambda text, key=None: {"mel": mel}
        voc = VocoderSynthesizer.__new__(VocoderSynthesizer)
        voc.model, voc.variables = voc_model, voc_vars
        voc.config = {"mu_law": False}

        chunks = list(tts.stream("ba do", voc, mel_chunk=5,
                                 key=jax.random.PRNGKey(4)))
        wav = np.concatenate(chunks)
        assert wav.shape[0] == 12 * voc_model.hop_length
        assert np.isfinite(wav).all()
        assert chunks[0].shape[0] == 5 * voc_model.hop_length
