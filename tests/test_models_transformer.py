"""Shape/jit tests for the Forward and Autoregressive TransformerTTS models."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etts.models.forward import ForwardTransformer
from etts.models.autoregressive import (AutoregressiveTransformer,
                                        autoregressive_predict)

TINY_AR_ONLY = dict(encoder_prenet_dimension=32, decoder_prenet_dimension=32)
TINY = dict(encoder_model_dimension=32, decoder_model_dimension=32,
            encoder_num_heads=(2, 2), decoder_num_heads=(2, 2),
            encoder_dense_blocks=1, decoder_dense_blocks=1,
            encoder_feed_forward_dimension=64,
            decoder_feed_forward_dimension=64,
            encoder_attention_conv_filters=32,
            decoder_attention_conv_filters=32,
            postnet_conv_filters=32, postnet_conv_layers=2,
            postnet_kernel_size=3, mel_channels=20, vocab_size=50,
            encoder_maximum_position_encoding=100,
            decoder_maximum_position_encoding=300)


def rngs():
    k = jax.random.PRNGKey(0)
    return {"params": k, "dropout": jax.random.fold_in(k, 1),
            "prenet": jax.random.fold_in(k, 2)}


class TestForward:
    def _init(self):
        model = ForwardTransformer(**TINY)
        x = jnp.ones((2, 7), jnp.int32)
        durs = jnp.full((2, 7, 1), 2.0)
        variables = model.init(rngs(), x, durs, max_frames=30)
        return model, variables

    def test_teacher_forced_shapes(self):
        model, variables = self._init()
        x = jnp.array([[1, 2, 3, 4, 0, 0, 0], [1, 2, 3, 4, 5, 6, 7]])
        durs = jnp.full((2, 7, 1), 2.0)
        out, mut = model.apply(variables, x, durs, max_frames=30, train=True,
                               rngs=rngs(), mutable=["batch_stats"])
        assert out["mel"].shape == (2, 30, 20)
        assert out["duration"].shape == (2, 7, 1)
        # padded durations zeroed
        np.testing.assert_allclose(np.asarray(out["duration"][0, 4:]), 0.0)

    def test_inference_uses_predicted_durations(self):
        model, variables = self._init()
        x = jnp.array([[1, 2, 3, 4, 5, 6, 7]])
        f = jax.jit(lambda v, x: model.apply(
            v, x, None, max_frames=40, durations_scalar=1.0,
            rngs={"dropout": jax.random.PRNGKey(3),
                  "prenet": jax.random.PRNGKey(4)}))
        out = f(variables, x)
        assert out["mel"].shape == (1, 40, 20)
        assert int(out["mel_lengths"][0]) >= 0

    def test_speed_regulator_scales_durations(self):
        model, variables = self._init()
        x = jnp.array([[1, 2, 3, 4, 5, 6, 7]])
        outs = {}
        for s in (0.5, 2.0):
            outs[s] = model.apply(
                v_out := variables, x, None, max_frames=60, durations_scalar=s,
                rngs={"dropout": jax.random.PRNGKey(3),
                      "prenet": jax.random.PRNGKey(4)})
        assert int(outs[2.0]["mel_lengths"][0]) >= int(outs[0.5]["mel_lengths"][0])


class TestExpandOp:
    def test_matches_reference_semantics(self):
        # reference Expand docstring example (`layers.py:645-660`)
        from etts.ops.expand import regulate_lengths
        x = jnp.asarray([[[0.5471, 0.8943], [0.7141, 0.9797], [0.5348, 0.1521]]])
        durs = jnp.asarray([[1.0, 3.0, 2.0]])
        out, total = regulate_lengths(x, durs, max_frames=8)
        assert int(total[0]) == 6
        want = np.array([[0.5471, 0.8943], [0.7141, 0.9797], [0.7141, 0.9797],
                         [0.7141, 0.9797], [0.5348, 0.1521], [0.5348, 0.1521],
                         [0., 0.], [0., 0.]])
        np.testing.assert_allclose(np.asarray(out[0]), want, atol=1e-6)


class TestAutoregressive:
    def _init(self, system_type="text"):
        model = AutoregressiveTransformer(system_type=system_type,
                                          max_r=5, gst_style_embed_dim=32,
                                          gst_multi_num_heads=2,
                                          ref_encoder_filters=(4, 8),
                                          ref_encoder_gru_cell_units=16,
                                          **TINY_AR_ONLY, **TINY)
        x = jnp.ones((2, 7), jnp.int32)
        mel = jnp.ones((2, 6, 20))
        spk = jnp.ones((2, 1, 32)) if "speaker" in system_type else None
        variables = model.init(rngs(), x, mel, spk, r=2)
        return model, variables

    @pytest.mark.parametrize("system_type", ["text", "style_text",
                                             "speaker_text",
                                             "speaker_style_text"])
    def test_system_types(self, system_type):
        model, variables = self._init(system_type)
        x = jnp.ones((2, 7), jnp.int32)
        mel = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 20))
        spk = jnp.ones((2, 1, 32)) if "speaker" in system_type else None
        out, _ = model.apply(variables, x, mel, spk, True, True, True, r=2,
                             rngs=rngs(), mutable=["batch_stats"])
        assert out["final_output"].shape == (2, 12, 20)  # t*r frames
        assert out["stop_prob"].shape == (2, 12, 3)
        mult = {"text": 1, "style_text": 2, "speaker_text": 2,
                "speaker_style_text": 3}[system_type]
        assert out["text_enc_output"].shape[-1] == 32
        if "style" in system_type:
            assert out["gst_output"].shape == (2, 1, 32)

    def test_input_reshape(self):
        mel = jnp.arange(2 * 11 * 3, dtype=jnp.float32).reshape(2, 11, 3)
        stop = jnp.ones((2, 11))
        tar_real, tar_mel, tar_stop, mel_len = \
            AutoregressiveTransformer.input_reshape(mel, stop, r=2)
        assert tar_real.shape == (2, 10, 3)
        assert tar_mel.shape == (2, 5, 3)
        assert mel_len == 10
        np.testing.assert_allclose(np.asarray(tar_mel), np.asarray(mel[:, :-1][:, ::2]))

    def test_predict_runs_and_stops(self):
        model, variables = self._init("text")
        x = jnp.ones((1, 7), jnp.int32)
        out = autoregressive_predict(model, variables, x, None, None, r=2,
                                     max_length=20,
                                     key=jax.random.PRNGKey(0))
        assert out["mel"].shape[2] == 20
        assert int(out["steps"]) >= 1
        # exact length accounting: the stop can fire on any frame of the
        # final r-group, so length lands in ((steps-1)*r, steps*r]
        assert (int(out["steps"]) - 1) * 2 < int(out["mel_length"]) \
            <= int(out["steps"]) * 2

    def test_predict_with_style_and_speaker(self):
        model, variables = self._init("speaker_style_text")
        x = jnp.ones((1, 7), jnp.int32)
        ref = AutoregressiveTransformer.encode_ref(
            jax.random.normal(jax.random.PRNGKey(1), (9, 20)), r=2)
        spk = jnp.ones((1, 1, 32))
        out = autoregressive_predict(model, variables, x, ref, spk, r=2,
                                     max_length=12,
                                     key=jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(out["mel"])).all()

    def test_predict_stop_interior_frame_r2(self):
        """An always-firing stop head at r=2 fires on the FIRST frame of the
        group; a last-frame-only check misses interior-parity stops and runs
        to max_length (the soak-trained checkpoint hit exactly this). The
        decode must stop after one step with exact length 1."""
        model, variables = self._init("text")
        sl = variables["params"]["Postnet"]["stop_linear"]
        sl["kernel"] = jnp.zeros_like(sl["kernel"])
        sl["bias"] = jnp.asarray([0.0, 0.0, 10.0])
        x = jnp.ones((1, 7), jnp.int32)
        out = autoregressive_predict(model, variables, x, None, None, r=2,
                                     max_length=20,
                                     key=jax.random.PRNGKey(0))
        assert int(out["steps"]) == 1
        assert int(out["mel_length"]) == 1

    def test_frames_per_token_cap(self):
        """max_frames_per_token bounds output length text-proportionally:
        with a stop head that never fires, a 7-token input at 1.0
        frames/token must stop at exactly 7 frames, not max_length."""
        model, variables = self._init("text")
        sl = variables["params"]["Postnet"]["stop_linear"]
        sl["kernel"] = jnp.zeros_like(sl["kernel"])
        sl["bias"] = jnp.asarray([10.0, 0.0, -10.0])  # stop class never wins
        x = jnp.ones((1, 7), jnp.int32)
        base = autoregressive_predict(model, variables, x, None, None, r=2,
                                      max_length=20,
                                      key=jax.random.PRNGKey(0))
        # runaway to the global cap (max_steps = max_length//r + 1 -> 22)
        assert int(base["mel_length"]) == 22
        out = autoregressive_predict(model, variables, x, None, None, r=2,
                                     max_length=20, key=jax.random.PRNGKey(0),
                                     max_frames_per_token=1.0)
        assert int(out["mel_length"]) == 7
        assert int(out["steps"]) == 4  # ceil(7 / r)

    def test_attn_stop_patience_counter(self):
        """With only 2 real tokens, 'attention focused on the final token'
        (focus >= n_real - 2 = 0) is true from step one, so patience=3 must
        stop the decode after exactly 3 steps regardless of the stop head."""
        model, variables = self._init("text")
        sl = variables["params"]["Postnet"]["stop_linear"]
        sl["kernel"] = jnp.zeros_like(sl["kernel"])
        sl["bias"] = jnp.asarray([10.0, 0.0, -10.0])
        x = jnp.asarray([[1, 2, 0, 0, 0, 0, 0]], jnp.int32)
        out = autoregressive_predict(model, variables, x, None, None, r=2,
                                     max_length=20, key=jax.random.PRNGKey(0),
                                     attn_stop_patience=3)
        assert int(out["steps"]) == 3
        assert int(out["mel_length"]) == 6  # full r-groups, no interior hit

    def test_incremental_decode_matches_teacher_forced(self):
        """KV-cached step decode must agree with the full decode when prenet
        dropout is 0 (the only stochastic part at inference)."""
        model, variables = self._init("text")
        x = jnp.ones((1, 7), jnp.int32)
        r = 2
        enc = model.apply(variables, x, None, None, False, False, 0,
                          method=AutoregressiveTransformer.encode,
                          rngs={"dropout": jax.random.PRNGKey(9),
                                "prenet": jax.random.PRNGKey(9)})
        enc_out, cross_mask = enc[0], enc[1]
        T = 4
        frames = jax.random.normal(jax.random.PRNGKey(5), (1, T, 20))
        # full decode
        full = model.apply(variables, enc_out, frames, cross_mask, False, 0,
                           r, 0.0,
                           method=AutoregressiveTransformer.decode,
                           rngs={"dropout": jax.random.PRNGKey(0),
                                 "prenet": jax.random.PRNGKey(0)})
        # incremental
        from etts.models.autoregressive import _decoder_cache_spec
        caches = _decoder_cache_spec(model, 1, T)
        outs = []
        for i in range(T):
            mel_r, caches = model.apply(
                variables, frames[:, i:i + 1], enc_out, cross_mask, caches,
                i, r, 0.0, 0,
                method=AutoregressiveTransformer.decode_step,
                rngs={"dropout": jax.random.PRNGKey(0),
                      "prenet": jax.random.PRNGKey(0)})
            outs.append(mel_r)
        inc = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(full["linear"]), np.asarray(inc),
                                   atol=2e-4)

    def test_batched_predict_per_utterance_lengths(self):
        """Multi-sentence decode tracks per-row stop lengths."""
        model, variables = self._init("text")
        x = jnp.stack([jnp.ones(7, jnp.int32),
                       jnp.concatenate([jnp.ones(4, jnp.int32),
                                        jnp.zeros(3, jnp.int32)])])
        out = autoregressive_predict(model, variables, x, None, None, r=2,
                                     max_length=16,
                                     key=jax.random.PRNGKey(0))
        lengths = np.asarray(out["mel_lengths"])
        assert lengths.shape == (2,)
        assert (lengths >= 2).all()
        assert int(out["mel_length"]) == lengths.max()


class TestProsodyStats:
    def _mel(self, key, b=2, t=24, c=20, pitch_bin=4.0):
        # synthetic "pitched" mel: energy bump around pitch_bin
        bins = jnp.arange(c, dtype=jnp.float32)
        bump = 3.0 * jnp.exp(-0.5 * ((bins - pitch_bin) / 1.5) ** 2) - 2.0
        mel = jnp.tile(bump, (b, t, 1))
        return mel + 0.1 * jax.random.normal(key, (b, t, c))

    def test_padding_invariance(self):
        from etts.models.layers import ProsodyStatEncoder
        enc = ProsodyStatEncoder(embed_dim=8, n_centroid_bins=16)
        key = jax.random.PRNGKey(0)
        mel = self._mel(key)
        variables = enc.init(key, mel)
        out = enc.apply(variables, mel)
        padded = jnp.pad(mel, ((0, 0), (0, 13), (0, 0)))  # all-zero frames
        out_p = enc.apply(variables, padded)
        assert out.shape == (2, 1, 8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_p),
                                   atol=1e-5)

    def test_pitch_sensitivity_and_grad_isolation(self):
        from etts.models.layers import ProsodyStatEncoder
        enc = ProsodyStatEncoder(embed_dim=8, n_centroid_bins=16)
        key = jax.random.PRNGKey(1)
        lo = self._mel(key, pitch_bin=3.0)
        hi = self._mel(key, pitch_bin=9.0)
        variables = enc.init(key, lo)
        # distinct pitch -> distinct embedding
        d = np.abs(np.asarray(enc.apply(variables, lo))
                   - np.asarray(enc.apply(variables, hi))).max()
        assert d > 1e-3
        # stats are stop-gradiented: d(out)/d(mel) must be exactly zero
        g = jax.grad(lambda m: jnp.sum(enc.apply(variables, m)))(lo)
        assert float(jnp.abs(g).max()) == 0.0

    def test_ar_model_with_prosody_stats(self):
        model = AutoregressiveTransformer(
            system_type="speaker_style_text", max_r=5,
            gst_style_embed_dim=32, gst_multi_num_heads=2,
            ref_encoder_filters=(4, 8), ref_encoder_gru_cell_units=16,
            use_prosody_stats=True, prosody_embed_dim=8,
            **TINY_AR_ONLY, **TINY)
        x = jnp.ones((2, 7), jnp.int32)
        mel = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 20))
        spk = jnp.ones((2, 1, 32))
        variables = model.init(rngs(), x, mel, spk, r=2)
        assert "ProsodyStats" in variables["params"]
        out, _ = model.apply(variables, x, mel, spk, True, True, True, r=2,
                             rngs=rngs(), mutable=["batch_stats"])
        assert out["final_output"].shape == (2, 12, 20)
        # prediction path carries the wider encoder output end to end
        pred = autoregressive_predict(model, variables, x, mel, spk, r=1,
                                      max_length=6,
                                      key=jax.random.PRNGKey(3))
        assert pred["mel"].shape[0] == 2 and pred["mel"].shape[2] == 20
