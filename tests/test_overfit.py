"""Training-correctness proof: models overfit a single tiny batch to low loss.
Slower than unit tests but the strongest signal that gradients, masking, and
teacher forcing are all wired correctly."""
import jax
import jax.numpy as jnp
import numpy as np

from etts.models.autoregressive import AutoregressiveTransformer
from etts.models.forward import ForwardTransformer
from etts.train import (TrainState, make_optimizer,
                        make_autoregressive_train_step,
                        make_forward_train_step)

TINY = dict(encoder_model_dimension=32, decoder_model_dimension=32,
            encoder_num_heads=(2,), decoder_num_heads=(2,),
            encoder_dense_blocks=1, decoder_dense_blocks=1,
            encoder_feed_forward_dimension=64,
            decoder_feed_forward_dimension=64,
            encoder_attention_conv_filters=32,
            decoder_attention_conv_filters=32,
            postnet_conv_filters=32, postnet_conv_layers=2,
            postnet_kernel_size=3, mel_channels=8, vocab_size=30,
            encoder_maximum_position_encoding=50,
            decoder_maximum_position_encoding=200)


def test_autoregressive_overfits_single_batch():
    model = AutoregressiveTransformer(system_type="text", max_r=2,
                                      encoder_prenet_dimension=32,
                                      decoder_prenet_dimension=32, **TINY)
    key = jax.random.PRNGKey(0)
    t_mel = 13
    mel = jax.random.normal(key, (2, t_mel, 8)) * 0.3
    mel = mel.at[:, 0].set(0.5).at[:, -1].set(-0.5)
    phon = jax.random.randint(key, (2, 6), 1, 30)
    stop = jnp.ones((2, t_mel), jnp.int32).at[:, -1].set(2)
    spk = jnp.zeros((2, 1))
    batch = (mel, phon, stop, spk)
    variables = model.init({"params": key, "dropout": key, "prenet": key},
                           phon, mel[:, ::2], None, r=2)
    tx = make_optimizer([[0, 3e-3]])
    state = TrainState.create(variables, tx)
    step = make_autoregressive_train_step(model, tx)
    losses = []
    for i in range(400):
        state, m, _ = step(state, batch, jnp.zeros(()),
                           jax.random.fold_in(key, i), r=2,
                           prenet_dropout=0.0, drop_n_heads=0)
        losses.append(float(m["losses"]["output"]))
    # mel MAE should collapse well below its initial value
    assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])


def test_forward_overfits_single_batch():
    model = ForwardTransformer(**TINY)
    key = jax.random.PRNGKey(1)
    mel = jax.random.normal(key, (2, 16, 8)) * 0.3
    phon = jax.random.randint(key, (2, 8), 1, 30)
    durs = jnp.full((2, 8), 2.0)
    variables = model.init({"params": key, "dropout": key, "prenet": key},
                           phon, durs[..., None], max_frames=16)
    tx = make_optimizer([[0, 3e-3]])
    state = TrainState.create(variables, tx)
    step = make_forward_train_step(model, tx, max_frames=16)
    losses = []
    for i in range(400):
        state, m = step(state, (mel, phon, durs), jax.random.fold_in(key, i))
        losses.append(float(m["mel_loss"]))
    assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])


def test_autoregressive_overfits_in_bfloat16():
    """Mixed precision (bf16 compute / fp32 master params): the same overfit
    recipe must converge, and params must remain fp32 throughout."""
    model = AutoregressiveTransformer(system_type="text", max_r=2,
                                      encoder_prenet_dimension=32,
                                      decoder_prenet_dimension=32,
                                      dtype=jnp.bfloat16, **TINY)
    key = jax.random.PRNGKey(0)
    t_mel = 13
    mel = jax.random.normal(key, (2, t_mel, 8)) * 0.3
    mel = mel.at[:, 0].set(0.5).at[:, -1].set(-0.5)
    phon = jax.random.randint(key, (2, 6), 1, 30)
    stop = jnp.ones((2, t_mel), jnp.int32).at[:, -1].set(2)
    spk = jnp.zeros((2, 1))
    batch = (mel, phon, stop, spk)
    variables = model.init({"params": key, "dropout": key, "prenet": key},
                           phon, mel[:, ::2], None, r=2)
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(variables["params"]))
    tx = make_optimizer([[0, 3e-3]])
    state = TrainState.create(variables, tx)
    step = make_autoregressive_train_step(model, tx)
    losses = []
    for i in range(400):
        state, m, _ = step(state, batch, jnp.zeros(()),
                           jax.random.fold_in(key, i), r=2,
                           prenet_dropout=0.0, drop_n_heads=0)
        losses.append(float(m["losses"]["output"]))
    assert losses[-1] < 0.35 * losses[0], (losses[0], losses[-1])
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))
