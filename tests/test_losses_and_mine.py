"""Loss golden values (reference `TransformerTTS/tests/test_loss.py`) + MINE/CLUB."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etts.utils.losses import (new_scaled_crossentropy, masked_crossentropy,
                               masked_mean_absolute_error,
                               masked_mean_squared_error, weighted_sum_losses,
                               l2_loss)
from etts.utils.scheduling import piecewise_linear_schedule, reduction_schedule
from etts.models.mine import MINE, CLUB, MIState, measure_mi, build_pairs


class TestLossGoldenValues:
    """Exact values from the reference test suite (test_loss.py:11-24)."""

    def setup_method(self):
        self.targets = jnp.asarray([[0, 1, 2]])
        self.logits = jnp.asarray([[[.3, .2, .1], [.3, .2, .1], [.3, .2, .1]]])

    def test_scaled_crossentropy_scaling5(self):
        loss = new_scaled_crossentropy(index=2, scaling=5)(self.targets, self.logits)
        assert abs(float(loss) - 2.3705523014068604) < 1e-5

    def test_scaled_crossentropy_scaling1(self):
        loss = new_scaled_crossentropy(index=2, scaling=1)(self.targets, self.logits)
        assert abs(float(loss) - 0.7679619193077087) < 1e-5

    def test_masked_crossentropy(self):
        loss = masked_crossentropy(self.targets, self.logits)
        assert abs(float(loss) - 0.7679619193077087) < 1e-5

    def test_masked_mae_ignores_all_zero_positions(self):
        t = jnp.asarray([[[1., 1.], [0., 0.]]])  # second frame is padding
        p = jnp.asarray([[[2., 2.], [9., 9.]]])
        # per-pos losses [1, 8], mask [1, 0], keras reduction: sum/2
        assert abs(float(masked_mean_absolute_error(t, p)) - 0.5) < 1e-6

    def test_masked_mse(self):
        t = jnp.asarray([[[1., 1.], [0., 0.]]])
        p = jnp.asarray([[[3., 3.], [9., 9.]]])
        assert abs(float(masked_mean_squared_error(t, p)) - 2.0) < 1e-6

    def test_weighted_sum(self):
        total, vals = weighted_sum_losses(
            (jnp.ones(3), jnp.ones(3)), (jnp.zeros(3), jnp.ones(3)),
            (l2_loss, l2_loss), (2.0, 1.0))
        assert float(total) == 2.0 and float(vals[0]) == 1.0


class TestSchedules:
    def test_piecewise_linear(self):
        sched = [[0, 0.0], [10, 1.0], [20, 1.0]]
        assert piecewise_linear_schedule(0, sched) == 0.0
        assert piecewise_linear_schedule(5, sched) == 0.5
        assert piecewise_linear_schedule(15, sched) == 1.0
        assert piecewise_linear_schedule(100, sched) == 1.0
        assert piecewise_linear_schedule(-5, sched) == 0.0

    def test_reduction(self):
        sched = [[0, 10], [80000, 1]]
        assert reduction_schedule(0, sched) == 10
        assert reduction_schedule(79999, sched) == 10
        assert reduction_schedule(80000, sched) == 1
        assert reduction_schedule(10 ** 6, sched) == 1


class TestMeasureMI:
    def test_kl_no_smoothing_equals_dv_bound(self):
        key = jax.random.PRNGKey(0)
        joint = jax.random.normal(key, (64, 1, 1)) + 1.0
        marginal = jax.random.normal(jax.random.fold_in(key, 1), (64, 1, 1))
        terms = jnp.ones((1, 2))
        mi, new_terms = measure_mi(joint, marginal, terms, 1.0, "KL", [])
        want = float(jnp.mean(joint) - jnp.log(jnp.mean(jnp.exp(marginal))))
        assert abs(float(mi) - want) < 1e-5
        assert new_terms.shape == (1, 2)

    def test_kl_smoothing_blends_prev_term(self):
        joint = jnp.ones((8, 1, 1))
        marginal = jnp.zeros((8, 1, 1))
        terms = jnp.asarray([[0.0, 4.0]])
        mi, new_terms = measure_mi(joint, marginal, terms, 0.5, "KL", [])
        # exp term: 0.5*1 + 0.5*4 = 2.5
        assert abs(float(new_terms[0, 1]) - 2.5) < 1e-6
        assert abs(float(mi) - (1.0 - np.log(2.5))) < 1e-5

    @pytest.mark.parametrize("betas", [[0.0], [1.0], [0.5], [0.0, 0.5, 1.0]])
    def test_reyni_finite(self, betas):
        key = jax.random.PRNGKey(0)
        joint = jax.random.normal(key, (32, 1, 1))
        marginal = jax.random.normal(jax.random.fold_in(key, 1), (32, 1, 1))
        terms = jnp.ones((len(betas), 2))
        mi, new_terms = measure_mi(joint, marginal, terms, 1.0, "reyni", betas)
        assert np.isfinite(float(mi))
        assert new_terms.shape == (len(betas), 2)


class TestPairBuilding:
    def test_shapes(self):
        key = jax.random.PRNGKey(0)
        text = jax.random.normal(key, (8, 12, 16))
        style = jax.random.normal(key, (8, 1, 16))
        spk = jax.random.normal(key, (8, 1, 16))
        for pt, dim in [("style_text", 32), ("style_speaker", 32),
                        ("text_speaker", 32), ("style_text_speaker", 48)]:
            j, m = build_pairs(pt, text, style, spk, key)
            assert j.shape == (8, 1, dim) and m.shape == (8, 1, dim)

    def test_marginal_differs_from_joint(self):
        key = jax.random.PRNGKey(3)
        text = jax.random.normal(key, (16, 5, 8))
        style = jax.random.normal(jax.random.fold_in(key, 9), (16, 1, 8))
        j, m = build_pairs("style_text", text, style, None, key)
        assert not np.allclose(np.asarray(j), np.asarray(m))


class TestMINEModule:
    def _data(self, key):
        ks = jax.random.split(key, 3)
        return (jax.random.normal(ks[0], (32, 10, 16)),
                jax.random.normal(ks[1], (32, 1, 16)),
                jax.random.normal(ks[2], (32, 1, 16)))

    def test_mine_forward_and_grad(self):
        key = jax.random.PRNGKey(0)
        text, style, spk = self._data(key)
        m = MINE(pair_type="style_text", divergence_type="KL",
                 dense_hidden_units=(32, 8))
        state = MIState.create(m.n_beta)
        params = m.init(key, text, style, spk, state, key)

        def loss_fn(p):
            mi, _ = m.apply(p, text, style, spk, state, key)
            return -mi  # gradient ascent on MI

        g = jax.grad(lambda p: loss_fn(p))(params)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    def test_mine_reyni(self):
        key = jax.random.PRNGKey(1)
        text, style, spk = self._data(key)
        m = MINE(pair_type="style_speaker", divergence_type="reyni",
                 beta_values=(0.0, 0.5, 1.0), dense_hidden_units=(16,))
        state = MIState.create(m.n_beta, smoothing_factor=0.9)
        params = m.init(key, text, style, spk, state, key)
        mi, terms = m.apply(params, text, style, spk, state, key)
        assert np.isfinite(float(mi)) and terms.shape == (3, 2)

    def test_club(self):
        key = jax.random.PRNGKey(2)
        text, style, spk = self._data(key)
        c = CLUB(pair_type="style_text", dense_hidden_units=(32,), out_dim=16)
        state = MIState.create(1)
        params = c.init(key, text, style, spk, state, key)
        lld, bound = c.apply(params, text, style, spk, state, key)
        assert np.isfinite(float(lld)) and np.isfinite(float(bound))

    def test_mistate_pytree(self):
        s = MIState.create(3, smoothing_factor=0.8, weight_factor=0.2)
        s2 = jax.tree.map(lambda x: x * 2, s)
        assert s2.smoothing_factor == 0.8  # static field untouched
        assert float(s2.exp_terms[0, 0]) == 2.0
