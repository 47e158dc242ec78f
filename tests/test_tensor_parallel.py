"""Tensor-parallel sharding tests on the virtual 8-device mesh: 2x4 (data x
model) training step matches single-device results."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from etts.models.forward import ForwardTransformer
from etts.parallel import make_mesh
from etts.parallel.tp import tp_param_specs, shard_train_state
from etts.train import TrainState, make_optimizer, make_forward_train_step

TINY = dict(encoder_model_dimension=32, decoder_model_dimension=32,
            encoder_num_heads=(4, 4), decoder_num_heads=(4, 4),
            encoder_dense_blocks=2, decoder_dense_blocks=2,
            encoder_feed_forward_dimension=64,
            decoder_feed_forward_dimension=64,
            encoder_attention_conv_filters=32,
            decoder_attention_conv_filters=32,
            postnet_conv_filters=32, postnet_conv_layers=2,
            postnet_kernel_size=3, mel_channels=12, vocab_size=40,
            encoder_maximum_position_encoding=100,
            decoder_maximum_position_encoding=300)


def _setup():
    model = ForwardTransformer(**TINY)
    key = jax.random.PRNGKey(0)
    mel = jax.random.normal(key, (4, 20, 12))
    phon = jax.random.randint(key, (4, 10), 1, 40)
    durs = jnp.full((4, 10), 2.0)
    variables = model.init({"params": key, "dropout": key, "prenet": key},
                           phon, durs[..., None], max_frames=20)
    tx = make_optimizer([[0, 1e-3]])
    return model, variables, tx, (mel, phon, durs), key


class TestTPSpecs:
    def test_rules_applied(self):
        _, variables, _, _, _ = _setup()
        specs = tp_param_specs(variables["params"])
        flat = jax.tree_util.tree_flatten_with_path(specs)[0]
        col = [s for p, s in flat if s == P(None, "model")]
        row = [s for p, s in flat if s == P("model", None)]
        assert len(col) > 0 and len(row) > 0
        # output projections of the concat-query MHA stay replicated
        for path, s in flat:
            ps = "/".join(str(getattr(x, "key", x)) for x in path)
            if "mha/dense" in ps:
                assert s == P(), ps

    def test_tp_step_matches_single_device(self):
        assert len(jax.devices()) == 8
        model, variables, tx, batch, key = _setup()
        step = make_forward_train_step(model, tx, max_frames=20)

        s1 = TrainState.create(variables, tx)
        s1, m1 = step(s1, batch, key)

        mesh = make_mesh(("data", "model"), (2, 4))
        s8 = shard_train_state(TrainState.create(variables, tx), mesh)
        data_sharding = lambda x: NamedSharding(
            mesh, P("data", *([None] * (x.ndim - 1))))
        batch8 = tuple(jax.device_put(x, data_sharding(x)) for x in batch)
        s8, m8 = step(s8, batch8, key)

        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=2e-4)
        # sharded params updated identically
        p1 = s1.params["encoder"]["SADB_0"]["ffn"]["d1"]["kernel"]
        p8 = s8.params["encoder"]["SADB_0"]["ffn"]["d1"]["kernel"]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=3e-5)
        # and actually sharded over the model axis
        assert "model" in str(p8.sharding)


class TestWaveRNNTensorParallel:
    def test_wavernn_tp_step_matches_single_device(self):
        """WaveRNN I/fc projections column-parallel over a 2x4 mesh: one
        training step must match single-device results."""
        from etts.models.wavernn import WaveRNN
        from etts.train import make_wavernn_train_step
        assert len(jax.devices()) == 8
        model = WaveRNN(rnn_dims=16, fc_dims=16, bits=4, pad=2,
                        upsample_factors=(2, 5), feat_dims=8, compute_dims=8,
                        res_out_dims=8, res_blocks=1, hop_length=10,
                        sample_rate=100, mode="RAW")
        key = jax.random.PRNGKey(0)
        x = jax.random.uniform(key, (4, 50), minval=-1, maxval=1)
        y = jax.random.randint(key, (4, 50), 0, 16)
        mels = jax.random.normal(key, (4, 9, 8))
        variables = model.init(key, x, mels, False)
        tx = make_optimizer([[0, 1e-3]])
        step = make_wavernn_train_step(model, tx)
        batch = (x, y, mels)

        s1 = TrainState.create(variables, tx)
        s1, m1 = step(s1, batch, key)

        mesh = make_mesh(("data", "model"), (2, 4))
        specs = tp_param_specs(variables["params"])
        flat = jax.tree_util.tree_flatten_with_path(specs)[0]
        sharded = ["/".join(str(getattr(x_, "key", x_)) for x_ in p)
                   for p, s in flat if s != P()]
        assert any("fc1" in p for p in sharded)
        assert any(p.startswith("I/") for p in sharded)
        assert not any("rnn1_wi" in p for p in sharded)  # gates replicated
        s8 = shard_train_state(TrainState.create(variables, tx), mesh)
        dsh = lambda a: NamedSharding(mesh, P("data",
                                              *([None] * (a.ndim - 1))))
        batch8 = tuple(jax.device_put(a, dsh(a)) for a in batch)
        s8, m8 = step(s8, batch8, key)
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=2e-4)


class TestExtendedARRules:
    def test_embedding_and_finalproj_sharded(self):
        from etts.models.autoregressive import AutoregressiveTransformer
        model = AutoregressiveTransformer(
            system_type="text", max_r=2, encoder_prenet_dimension=32,
            decoder_prenet_dimension=32, **TINY)
        key = jax.random.PRNGKey(0)
        mel = jax.random.normal(key, (2, 11, 12)) * 0.3
        phon = jax.random.randint(key, (2, 6), 1, 40)
        variables = model.init({"params": key, "dropout": key, "prenet": key},
                               phon, mel[:, ::2], None, r=2)
        specs = tp_param_specs(variables["params"])
        assert specs["TextEmbedding"]["embedding"] == P("model", None)
        assert specs["FinalProj"]["kernel"] == P(None, "model")
        assert specs["FinalProj"]["bias"] == P("model")
