"""GST-Tacotron shape/behavior tests (tiny config)."""
import jax
import jax.numpy as jnp
import numpy as np

from etts.models.tacotron import Tacotron, tacotron_loss, noam_learning_rate

TINY = dict(vocab_size=30, embed_depth=16, encoder_depth=16,
            attention_depth=16, rnn_depth=16, num_mels=10, num_freq=33,
            outputs_per_step=2, prenet_depths=(16, 8), num_gst=4, num_heads=2,
            style_embed_depth=16, style_att_dim=8,
            reference_filters=(4, 8), reference_depth=8, max_iters=6,
            cbhg_width=8)


def rngs(i=0):
    k = jax.random.PRNGKey(i)
    return {"params": k, "prenet": jax.random.fold_in(k, 1),
            "zoneout": jax.random.fold_in(k, 2),
            "dropout": jax.random.fold_in(k, 3),
            "style": jax.random.fold_in(k, 4)}


def _init(**kw):
    model = Tacotron(**{**TINY, **kw})
    inputs = jnp.ones((2, 7), jnp.int32)
    lengths = jnp.array([7, 5])
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 10))
    linear = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 33))
    variables = model.init(rngs(), inputs, lengths, mel)
    return model, variables, (inputs, lengths, mel, linear)


class TestTacotron:
    def test_teacher_forced_shapes(self):
        model, variables, (inputs, lengths, mel, linear) = _init()
        out, mut = model.apply(variables, inputs, lengths, mel, train=True,
                               rngs=rngs(1), mutable=["batch_stats"])
        assert out["mel_outputs"].shape == (2, 12, 10)
        assert out["linear_outputs"].shape == (2, 12, 33)
        assert out["alignments"].shape == (2, 6, 7)  # (b, T/r, T_in)
        assert out["refnet_outputs"].shape == (2, 128)
        assert out["refnet_outputs2"].shape == (2, 128)

    def test_loss_composition(self):
        model, variables, (inputs, lengths, mel, linear) = _init()
        out, _ = model.apply(variables, inputs, lengths, mel, train=True,
                             rngs=rngs(1), mutable=["batch_stats"])
        total, parts = tacotron_loss(out, mel, linear)
        want = parts["mel_loss"] + parts["linear_loss"] + parts["ref_enc_loss"]
        np.testing.assert_allclose(float(total), float(want), rtol=1e-6)

    def test_generate(self):
        model, variables, (inputs, lengths, mel, _) = _init()
        out = model.apply(variables, inputs, lengths, mel,
                          method=Tacotron.generate, rngs=rngs(2))
        assert out["mel_outputs"].shape == (2, 12, 10)  # max_iters * r
        assert np.isfinite(np.asarray(out["mel_outputs"])).all()

    def test_generate_without_reference_uses_random_gst(self):
        model, variables, (inputs, lengths, _, _) = _init()
        out = model.apply(variables, inputs, lengths, None,
                          method=Tacotron.generate, rngs=rngs(3))
        assert out["mel_outputs"].shape == (2, 12, 10)

    def test_no_gst_raw_ref_embedding(self):
        model, variables, (inputs, lengths, mel, _) = _init(use_gst=False)
        out, _ = model.apply(variables, inputs, lengths, mel, train=True,
                             rngs=rngs(1), mutable=["batch_stats"])
        assert out["style_embeddings"].shape[-1] == 128  # raw ref embedding

    def test_dot_attention_variant(self):
        model, variables, (inputs, lengths, mel, _) = _init(
            style_att_type="dot_attention")
        out, _ = model.apply(variables, inputs, lengths, mel, train=True,
                             rngs=rngs(1), mutable=["batch_stats"])
        assert np.isfinite(np.asarray(out["mel_outputs"])).all()

    def test_grad_flows(self):
        model, variables, (inputs, lengths, mel, linear) = _init()

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                inputs, lengths, mel, train=True, rngs=rngs(1),
                mutable=["batch_stats"])
            total, _ = tacotron_loss(out, mel, linear)
            return total

        g = jax.grad(loss_fn)(variables["params"])
        flat = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)
        assert any(float(jnp.abs(x).max()) > 0 for x in flat)


class TestNoam:
    def test_warmup_and_decay(self):
        lr0 = noam_learning_rate(0.002, 0)
        lr_peak = noam_learning_rate(0.002, 3999)
        lr_late = noam_learning_rate(0.002, 100000)
        assert float(lr0) < float(lr_peak)
        assert float(lr_late) < float(lr_peak)
        # at warmup_steps the two branches meet: lr = init
        np.testing.assert_allclose(float(noam_learning_rate(0.002, 3999)),
                                   0.002, rtol=1e-3)


class TestTrainStepJit:
    def test_jitted_train_step_runs(self):
        """Regression: modules must trace cleanly under the jitted train step
        (a jnp-in-initializer bug only surfaced under jit)."""
        from etts.train import TrainState, make_optimizer, \
            make_tacotron_train_step
        model, variables, (inputs, lengths, mel, linear) = _init()
        tx = make_optimizer([[0, 1e-3]], b2=0.999, clip_norm=1.0)
        state = TrainState.create(variables, tx)
        step = make_tacotron_train_step(model, tx)
        state, metrics = step(state, (inputs, lengths, mel, linear),
                              jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1
