"""Fused AR decode kernel vs the lax.while_loop decode path.

With prenet_dropout=0 both paths are deterministic; the kernel computes
matmuls with bf16 inputs (f32 accumulate), so parity is up to bf16 rounding.
Run in interpreter mode on a tiny all-dense model (compiled production-scale
validation lives in bench.py / BENCH_NOTES).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etts.models.autoregressive import (AutoregressiveTransformer,
                                        autoregressive_predict)
from etts.ops.pallas.decoder_step import fused_decode, pallas_available

pytestmark = pytest.mark.skipif(not pallas_available,
                                reason="pallas not importable")


def _model_and_vars():
    model = AutoregressiveTransformer(
        system_type="text", max_r=3,
        encoder_model_dimension=64, decoder_model_dimension=64,
        encoder_num_heads=(2, 2), decoder_num_heads=(2, 2),
        encoder_dense_blocks=2, decoder_dense_blocks=2,
        encoder_feed_forward_dimension=96, decoder_feed_forward_dimension=96,
        encoder_attention_conv_filters=64, decoder_attention_conv_filters=64,
        encoder_prenet_dimension=64, decoder_prenet_dimension=32,
        postnet_conv_filters=48, postnet_conv_layers=3, postnet_kernel_size=3,
        encoder_maximum_position_encoding=100,
        decoder_maximum_position_encoding=500,
        mel_channels=12, vocab_size=40)
    key = jax.random.PRNGKey(0)
    phon = jax.random.randint(key, (1, 7), 1, 40)
    mel = jax.random.normal(key, (1, 9, 12)) * 0.3
    variables = model.init({"params": key, "dropout": key, "prenet": key},
                           phon, mel, None, r=1)
    return model, variables, phon


def test_fused_decode_matches_while_loop():
    """Strict parity: identical (bf16-rounded) weights on both sides, kernel
    in f32 compute -> trajectories must agree to float-noise level even
    through 16 steps of autoregressive feedback."""
    model, variables, phon = _model_and_vars()
    # round every matmul weight to bf16 precision on BOTH paths (comparing
    # different roundings under AR feedback amplifies exponentially and says
    # nothing about correctness)
    variables = jax.tree.map(
        lambda x: (x.astype(jnp.bfloat16).astype(jnp.float32)
                   if x.ndim >= 2 else x), variables)
    key = jax.random.PRNGKey(1)
    steps = 16

    ref = autoregressive_predict(model, variables, phon, None, None, r=1,
                                 max_length=steps - 1, key=key,
                                 prenet_dropout=0.0, stop_enabled=False)
    want = np.asarray(ref["mel"][0])          # (steps, mel)

    enc_out, *_ = model.apply(
        variables, phon, None, None, False, False, 0,
        method=AutoregressiveTransformer.encode,
        rngs={"dropout": key, "prenet": key})
    mel, length, n = fused_decode(model, variables, enc_out,
                                  max_steps=steps, key=key,
                                  prenet_dropout=0.0, stop_enabled=False,
                                  interpret=True, compute_dtype="float32")
    got = np.asarray(mel[0][:steps])
    assert got.shape == want.shape
    err = np.abs(got - want)
    assert err.max() < 5e-3, (err.max(), err.mean())
    assert int(n) == steps


def test_fused_decode_bf16_stays_close():
    """Production numerics (bf16 matmul inputs): per-step function is the
    same; trajectory may drift through feedback but must stay finite, bounded,
    and close in the early frames."""
    model, variables, phon = _model_and_vars()
    key = jax.random.PRNGKey(1)
    steps = 12
    ref = autoregressive_predict(model, variables, phon, None, None, r=1,
                                 max_length=steps - 1, key=key,
                                 prenet_dropout=0.0, stop_enabled=False)
    want = np.asarray(ref["mel"][0])
    enc_out, *_ = model.apply(
        variables, phon, None, None, False, False, 0,
        method=AutoregressiveTransformer.encode,
        rngs={"dropout": key, "prenet": key})
    mel, *_ = fused_decode(model, variables, enc_out, max_steps=steps,
                           key=key, prenet_dropout=0.0, stop_enabled=False,
                           interpret=True)
    got = np.asarray(mel[0][:steps])
    assert np.isfinite(got).all()
    # early frames (before feedback accumulates) agree to bf16 noise
    assert np.abs(got[:4] - want[:4]).max() < 0.08


def test_fused_decode_stop_token():
    """Force the stop head to always predict class 2: decode must stop after
    the first frame and report length 1."""
    model, variables, phon = _model_and_vars()
    p = variables["params"]
    sl = p["Postnet"]["stop_linear"]
    sl["kernel"] = jnp.zeros_like(sl["kernel"])
    sl["bias"] = jnp.asarray([0.0, 0.0, 10.0])
    enc_out, *_ = model.apply(
        variables, phon, None, None, False, False, 0,
        method=AutoregressiveTransformer.encode,
        rngs={"dropout": jax.random.PRNGKey(2),
              "prenet": jax.random.PRNGKey(2)})
    mel, length, n = fused_decode(model, variables, enc_out, max_steps=16,
                                  key=jax.random.PRNGKey(3),
                                  prenet_dropout=0.0, stop_enabled=True,
                                  interpret=True)
    assert int(length) == 1
    # frames past the stop must stay zero (buffer was cleared)
    assert np.allclose(np.asarray(mel[0][2:]), 0.0)


def test_fused_decode_frame_cap():
    """max_frames_per_token in the fused kernel: stop head never fires, 7
    tokens at 1.0 frames/token must stop at exactly 7 frames (static cap)."""
    model, variables, phon = _model_and_vars()
    sl = variables["params"]["Postnet"]["stop_linear"]
    sl["kernel"] = jnp.zeros_like(sl["kernel"])
    sl["bias"] = jnp.asarray([10.0, 0.0, -10.0])
    enc_out, *_ = model.apply(
        variables, phon, None, None, False, False, 0,
        method=AutoregressiveTransformer.encode,
        rngs={"dropout": jax.random.PRNGKey(2),
              "prenet": jax.random.PRNGKey(2)})
    mel, length, n = fused_decode(model, variables, enc_out, max_steps=16,
                                  key=jax.random.PRNGKey(3),
                                  prenet_dropout=0.0, stop_enabled=True,
                                  interpret=True, max_frames_per_token=1.0)
    assert int(length) == 7


def test_fused_decode_attn_stop_patience():
    """Attention-completion stop in the fused kernel: with only 2 input
    tokens 'focus on the final token' (>= n_enc_real - 2 = 0) holds from
    step one, so patience=3 stops the decode at exactly 3 frames (r=1)."""
    model, variables, phon = _model_and_vars()
    sl = variables["params"]["Postnet"]["stop_linear"]
    sl["kernel"] = jnp.zeros_like(sl["kernel"])
    sl["bias"] = jnp.asarray([10.0, 0.0, -10.0])
    phon2 = phon[:, :2]
    enc_out, *_ = model.apply(
        variables, phon2, None, None, False, False, 0,
        method=AutoregressiveTransformer.encode,
        rngs={"dropout": jax.random.PRNGKey(2),
              "prenet": jax.random.PRNGKey(2)})
    mel, length, n = fused_decode(model, variables, enc_out, max_steps=16,
                                  key=jax.random.PRNGKey(3),
                                  prenet_dropout=0.0, stop_enabled=True,
                                  interpret=True, attn_stop_patience=3)
    assert int(length) == 3


def test_fused_decode_stop_interior_frame_r2():
    """r=2 with an always-firing stop head: the stop class fires on the FIRST
    frame of the group, which a last-frame-only check never sees (the decode
    would run to max_steps on even-parity utterance ends — the soak-trained
    checkpoint hit exactly this). Exact length accounting: 1 frame."""
    model, variables, phon = _model_and_vars()
    p = variables["params"]
    sl = p["Postnet"]["stop_linear"]
    sl["kernel"] = jnp.zeros_like(sl["kernel"])
    sl["bias"] = jnp.asarray([0.0, 0.0, 10.0])
    enc_out, *_ = model.apply(
        variables, phon, None, None, False, False, 0,
        method=AutoregressiveTransformer.encode,
        rngs={"dropout": jax.random.PRNGKey(2),
              "prenet": jax.random.PRNGKey(2)})
    mel, length, n = fused_decode(model, variables, enc_out, max_steps=10,
                                  r=2, key=jax.random.PRNGKey(3),
                                  prenet_dropout=0.0, stop_enabled=True,
                                  interpret=True)
    assert int(n) == 1          # one decode step ran
    assert int(length) == 1     # stop fired on frame 0 of the r-group


def test_fused_decode_dropout_is_applied():
    """With prenet_dropout > 0 the mel must differ from the rate-0 decode (the
    reference keeps prenet dropout ON at inference). Seed-to-seed variation
    can't be checked here: the interpret-mode PRNG ignores prng_seed (the
    real-TPU kernel is seeded per call)."""
    model, variables, phon = _model_and_vars()
    enc_out, *_ = model.apply(
        variables, phon, None, None, False, False, 0,
        method=AutoregressiveTransformer.encode,
        rngs={"dropout": jax.random.PRNGKey(2),
              "prenet": jax.random.PRNGKey(2)})
    m0, *_ = fused_decode(model, variables, enc_out, max_steps=8,
                          key=jax.random.PRNGKey(10), prenet_dropout=0.0,
                          stop_enabled=False, interpret=True)
    m1, *_ = fused_decode(model, variables, enc_out, max_steps=8,
                          key=jax.random.PRNGKey(10), prenet_dropout=0.5,
                          stop_enabled=False, interpret=True)
    assert np.isfinite(np.asarray(m1)).all()
    assert not np.allclose(np.asarray(m0), np.asarray(m1))


def test_fused_decode_r2_matches_while_loop():
    """Reduction factor r=2: the kernel emits 2 frames/step through the
    packed FinalProj lanes and the per-frame postnet ring; strict f32 parity
    with the while_loop decode."""
    model, variables, phon = _model_and_vars()
    variables = jax.tree.map(
        lambda x: (x.astype(jnp.bfloat16).astype(jnp.float32)
                   if x.ndim >= 2 else x), variables)
    key = jax.random.PRNGKey(4)
    r, steps = 2, 8  # 16 frames

    ref = autoregressive_predict(model, variables, phon, None, None, r=r,
                                 max_length=steps * r - 1, key=key,
                                 prenet_dropout=0.0, stop_enabled=False)
    want = np.asarray(ref["mel"][0])

    enc_out, *_ = model.apply(
        variables, phon, None, None, False, False, 0,
        method=AutoregressiveTransformer.encode,
        rngs={"dropout": key, "prenet": key})
    mel, length, n = fused_decode(model, variables, enc_out,
                                  max_steps=steps, r=r, key=key,
                                  prenet_dropout=0.0, stop_enabled=False,
                                  interpret=True, compute_dtype="float32")
    got = np.asarray(mel[0][:want.shape[0]])
    err = np.abs(got - want)
    assert err.max() < 5e-3, (err.max(), err.mean())
    assert int(length) == steps * r
