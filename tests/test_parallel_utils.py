"""Mesh/sharding utility tests on the virtual 8-device backend."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etts.parallel import (make_mesh, shard_batch, replicate,
                           local_batch_slice)


class TestMakeMesh:
    def test_1d_all_devices(self):
        mesh = make_mesh(("data",))
        assert mesh.devices.shape == (8,)
        assert mesh.axis_names == ("data",)

    def test_2d_with_wildcard(self):
        mesh = make_mesh(("data", "model"), (-1, 2))
        assert mesh.devices.shape == (4, 2)

    def test_explicit_sizes(self):
        mesh = make_mesh(("a", "b"), (2, 4))
        assert mesh.devices.shape == (2, 4)

    def test_multi_axis_requires_sizes(self):
        with pytest.raises(ValueError):
            make_mesh(("a", "b"))


class TestSharding:
    def test_shard_batch_places_leading_dim(self):
        mesh = make_mesh(("data",))
        x = jnp.arange(16.0).reshape(8, 2)
        (xs,) = shard_batch((x,), mesh)
        assert "data" in str(xs.sharding.spec)
        np.testing.assert_allclose(np.asarray(xs), np.asarray(x))

    def test_replicate(self):
        mesh = make_mesh(("data",))
        tree = {"w": jnp.ones((4, 4))}
        r = replicate(tree, mesh)
        assert r["w"].sharding.is_fully_replicated

    def test_local_batch_slice_single_host(self):
        s = local_batch_slice(32)
        assert s == slice(0, 32)  # single-process run


class TestSequenceParallel:
    def test_seq_sharded_step_matches_replicated(self):
        """Context parallelism (SURVEY §5 long-context strategy): sharding the
        teacher-forcing mel over a 'seq' mesh axis must not change the step's
        numerics — GSPMD partitions LN/FFN/convs along time and inserts the
        gathers attention needs."""
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from etts.models.autoregressive import AutoregressiveTransformer
        from etts.parallel import make_mesh
        from etts.train import (TrainState, make_optimizer,
                                make_autoregressive_train_step)
        assert len(jax.devices()) == 8
        model = AutoregressiveTransformer(
            system_type="text", max_r=2,
            encoder_model_dimension=32, decoder_model_dimension=32,
            encoder_num_heads=(2, 2), decoder_num_heads=(2, 2),
            encoder_dense_blocks=2, decoder_dense_blocks=2,
            encoder_feed_forward_dimension=64,
            decoder_feed_forward_dimension=64,
            encoder_attention_conv_filters=32,
            decoder_attention_conv_filters=32,
            encoder_prenet_dimension=32, decoder_prenet_dimension=32,
            postnet_conv_filters=32, postnet_conv_layers=2,
            postnet_kernel_size=3, mel_channels=12, vocab_size=40,
            encoder_maximum_position_encoding=100,
            decoder_maximum_position_encoding=300)
        key = jax.random.PRNGKey(0)
        b, t_mel = 2, 33  # 32 teacher frames -> 16 r-strided, 4-way sharded
        mel = jax.random.normal(key, (b, t_mel, 12)) * 0.3
        mel = mel.at[:, 0].set(0.5).at[:, -1].set(-0.5)
        phon = jax.random.randint(key, (b, 7), 1, 40)
        stop = jnp.ones((b, t_mel), jnp.int32).at[:, -1].set(2)
        spk = jnp.zeros((b, 1))
        batch = (mel, phon, stop, spk)
        variables = model.init({"params": key, "dropout": key, "prenet": key},
                               phon, mel[:, ::2], None, r=2)
        tx = make_optimizer([[0, 1e-3]])

        plain = make_autoregressive_train_step(model, tx)
        s1 = TrainState.create(variables, tx)
        s1, m1, _ = plain(s1, batch, jnp.zeros(()), key, r=2,
                          prenet_dropout=0.0)

        mesh = make_mesh(("data", "seq"), (2, 4))
        sharding = NamedSharding(mesh, P("data", "seq", None))
        seq = make_autoregressive_train_step(model, tx,
                                             seq_sharding=sharding)
        s2 = TrainState.create(variables, tx)
        s2, m2, _ = seq(s2, batch, jnp.zeros(()), key, r=2,
                        prenet_dropout=0.0)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=2e-4)
