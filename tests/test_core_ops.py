"""Golden tests for the small core ops: GRU math, positional encodings, masks,
attention."""
import jax
import jax.numpy as jnp
import numpy as np

from etts.ops import (gru_init, gru_cell, gru_scan, positional_encoding,
                      encoder_padding_mask, mel_padding_mask, look_ahead_mask,
                      scaled_dot_product_attention)


class TestGRU:
    def test_cell_matches_manual_math(self, rng):
        """Torch/cuDNN gate convention: n = tanh(Wn x + r * (Un h))."""
        key = jax.random.PRNGKey(0)
        p = gru_init(key, 3, 4)
        x = jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)
        h = jnp.asarray(rng.standard_normal((2, 4)), jnp.float32)
        got = np.asarray(gru_cell(p, x, h))

        wi, wh = np.asarray(p["wi"]), np.asarray(p["wh"])
        bi, bh = np.asarray(p["bi"]), np.asarray(p["bh"])
        gi = np.asarray(x) @ wi + bi
        gh = np.asarray(h) @ wh + bh

        def sig(v):
            return 1 / (1 + np.exp(-v))

        r = sig(gi[:, :4] + gh[:, :4])
        z = sig(gi[:, 4:8] + gh[:, 4:8])
        n = np.tanh(gi[:, 8:] + r * gh[:, 8:])
        want = (1 - z) * n + z * np.asarray(h)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_scan_equals_stepwise(self, rng):
        key = jax.random.PRNGKey(1)
        p = gru_init(key, 3, 4)
        xs = jnp.asarray(rng.standard_normal((2, 6, 3)), jnp.float32)
        ys, h_final = gru_scan(p, xs)
        h = jnp.zeros((2, 4))
        for t in range(6):
            h = gru_cell(p, xs[:, t], h)
            np.testing.assert_allclose(np.asarray(ys[:, t]), np.asarray(h),
                                       atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_final), np.asarray(h),
                                   atol=1e-5)

    def test_reverse_scan(self, rng):
        key = jax.random.PRNGKey(2)
        p = gru_init(key, 3, 4)
        xs = jnp.asarray(rng.standard_normal((1, 5, 3)), jnp.float32)
        ys_rev, _ = gru_scan(p, xs, reverse=True)
        ys_fwd_flipped, _ = gru_scan(p, xs[:, ::-1])
        np.testing.assert_allclose(np.asarray(ys_rev),
                                   np.asarray(ys_fwd_flipped[:, ::-1]),
                                   atol=1e-5)


class TestPositionalEncoding:
    def test_golden_values(self):
        pe = positional_encoding(50, 4)[0]
        # position 0: sin(0)=0, cos(0)=1 alternating
        np.testing.assert_allclose(pe[0], [0, 1, 0, 1], atol=1e-7)
        # position 1, dim 0: sin(1)
        assert abs(pe[1, 0] - np.sin(1.0)) < 1e-6
        assert abs(pe[1, 1] - np.cos(1.0)) < 1e-6
        # dim 2 uses rate 1/10000^(2/4)
        assert abs(pe[1, 2] - np.sin(1.0 / 100.0)) < 1e-6

    def test_shape(self):
        assert positional_encoding(10, 8).shape == (1, 10, 8)


class TestMasks:
    def test_encoder_padding_mask(self):
        ids = jnp.asarray([[3, 5, 0, 0]])
        m = encoder_padding_mask(ids)
        np.testing.assert_allclose(np.asarray(m[0, 0, 0]), [0, 0, 1, 1])

    def test_mel_padding_mask_zero_frames(self):
        mel = jnp.zeros((1, 3, 4)).at[0, 0].set(1.0)
        m = mel_padding_mask(mel)
        np.testing.assert_allclose(np.asarray(m[0, 0, 0]), [0, 1, 1])

    def test_look_ahead(self):
        m = np.asarray(look_ahead_mask(3))
        np.testing.assert_allclose(m, [[0, 1, 1], [0, 0, 1], [0, 0, 0]])


class TestSDPA:
    def test_uniform_attention_when_equal_keys(self):
        q = jnp.ones((1, 1, 2, 4))
        k = jnp.ones((1, 1, 3, 4))
        v = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 1, 3, 4))
        out, w = scaled_dot_product_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(w), 1.0 / 3.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]),
                                   np.asarray(v.mean(axis=2)[0, 0]), atol=1e-5)

    def test_masked_positions_get_no_weight(self):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (1, 1, 2, 4))
        k = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 3, 4))
        v = jax.random.normal(jax.random.fold_in(key, 2), (1, 1, 3, 4))
        mask = jnp.asarray([0.0, 0.0, 1.0])[None, None, None, :]
        _, w = scaled_dot_product_attention(q, k, v, mask)
        assert float(np.asarray(w)[..., -1].max()) < 1e-6
