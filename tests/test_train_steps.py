"""Integration tests: jitted train steps reduce loss on tiny overfit batches,
MINE joint training runs, and data-parallel training over an 8-device CPU mesh
matches single-device results."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etts.models.autoregressive import AutoregressiveTransformer
from etts.models.forward import ForwardTransformer
from etts.models.wavernn import WaveRNN
from etts.models.mine import MINE, MIState
from etts.train import (TrainState, make_optimizer, interp_schedule,
                        make_forward_train_step,
                        make_autoregressive_train_step,
                        make_autoregressive_val_step, make_mine_update,
                        make_wavernn_train_step)
from etts.parallel import make_mesh, shard_batch, replicate

TINY = dict(encoder_model_dimension=32, decoder_model_dimension=32,
            encoder_num_heads=(2, 2), decoder_num_heads=(2, 2),
            encoder_dense_blocks=2, decoder_dense_blocks=2,
            encoder_feed_forward_dimension=64,
            decoder_feed_forward_dimension=64,
            encoder_attention_conv_filters=32,
            decoder_attention_conv_filters=32,
            postnet_conv_filters=32, postnet_conv_layers=2,
            postnet_kernel_size=3, mel_channels=12, vocab_size=40,
            encoder_maximum_position_encoding=100,
            decoder_maximum_position_encoding=300)


def _ar_batch(key, b=4, t_mel=21, t_text=9, mel_c=12, spk_d=16):
    ks = jax.random.split(key, 3)
    mel = jax.random.normal(ks[0], (b, t_mel, mel_c)) * 0.5
    mel = mel.at[:, 0, :].set(0.5).at[:, -1, :].set(-0.5)
    phonemes = jax.random.randint(ks[1], (b, t_text), 1, 40)
    stop = jnp.ones((b, t_mel), jnp.int32).at[:, -1].set(2)
    spk = jax.random.normal(ks[2], (b, spk_d))
    return mel, phonemes, stop, spk


class TestForwardTraining:
    def test_loss_decreases(self):
        model = ForwardTransformer(**TINY)
        key = jax.random.PRNGKey(0)
        mel = jax.random.normal(key, (2, 20, 12))
        phon = jax.random.randint(key, (2, 10), 1, 40)
        durs = jnp.full((2, 10), 2.0)
        variables = model.init(
            {"params": key, "dropout": key, "prenet": key},
            phon, durs[..., None], max_frames=20)
        tx = make_optimizer([[0, 1e-3]])
        state = TrainState.create(variables, tx)
        step = make_forward_train_step(model, tx, max_frames=20)
        losses = []
        for i in range(15):
            state, m = step(state, (mel, phon, durs),
                            jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 15


class TestAutoregressiveTraining:
    def _setup(self, system_type="speaker_style_text", use_style_loss=False):
        model = AutoregressiveTransformer(
            system_type=system_type, max_r=5,
            encoder_prenet_dimension=32, decoder_prenet_dimension=32,
            gst_style_embed_dim=32, gst_multi_num_heads=2,
            ref_encoder_filters=(4, 8), ref_encoder_gru_cell_units=16,
            **TINY)
        key = jax.random.PRNGKey(0)
        batch = _ar_batch(key)
        mel, phon, stop, spk = batch
        spk_in = spk[:, None, :] if model.has_speaker else None
        variables = model.init(
            {"params": key, "dropout": key, "prenet": key},
            phon, mel[:, ::5], spk_in, r=5)
        tx = make_optimizer([[0, 1e-3]])
        state = TrainState.create(variables, tx)
        step = make_autoregressive_train_step(
            model, tx, use_style_loss=use_style_loss)
        return model, state, step, batch, tx

    def test_loss_decreases_r5(self):
        model, state, step, batch, _ = self._setup()
        key = jax.random.PRNGKey(1)
        mi = jnp.zeros(())
        losses = []
        for i in range(12):
            state, m, aux = step(state, batch, mi, jax.random.fold_in(key, i),
                                 r=5, prenet_dropout=0.0)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]

    def test_r_change_retraces_but_runs(self):
        model, state, step, batch, _ = self._setup()
        key = jax.random.PRNGKey(1)
        for r in (5, 1):
            state, m, aux = step(state, batch, jnp.zeros(()), key, r=r)
            assert np.isfinite(float(m["loss"]))

    def test_style_loss_branch(self):
        model, state, step, batch, _ = self._setup(use_style_loss=True)
        state, m, _ = step(state, batch, jnp.zeros(()), jax.random.PRNGKey(2),
                           r=5)
        assert float(m["style_loss"]) > 0

    def test_scheduled_sampling_zero_rate_matches_plain(self):
        # ss_rate=0: every mix draw is False, so the two-pass step must be
        # numerically identical to the plain teacher-forced step
        model, state, plain, batch, tx = self._setup()
        ss = make_autoregressive_train_step(model, tx,
                                            scheduled_sampling=True)
        key = jax.random.PRNGKey(3)
        _, m0, _ = plain(state, batch, jnp.zeros(()), key, r=5)
        _, m1, _ = ss(state, batch, jnp.zeros(()), key, r=5, ss_rate=0.0)
        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                                   rtol=1e-6)

    def test_scheduled_sampling_full_rate_differs_and_trains(self):
        model, state, plain, batch, tx = self._setup()
        ss = make_autoregressive_train_step(model, tx,
                                            scheduled_sampling=True)
        key = jax.random.PRNGKey(3)
        _, m0, _ = plain(state, batch, jnp.zeros(()), key, r=5)
        losses = []
        for i in range(8):
            state, m, _ = ss(state, batch, jnp.zeros(()),
                             jax.random.fold_in(key, i), r=5, ss_rate=1.0)
            losses.append(float(m["loss"]))
            assert np.isfinite(losses[-1])
        # predicted decoder inputs from random init differ from GT frames
        assert abs(losses[0] - float(m0["loss"])) > 1e-6
        assert losses[-1] < losses[0]  # still trains

    def test_gta_inputs_identity_matches_plain(self):
        # gta == gt mel -> the GTA-input step is numerically the plain step
        model, state, plain, batch, tx = self._setup()
        gta = make_autoregressive_train_step(model, tx, gta_inputs=True)
        key = jax.random.PRNGKey(4)
        _, m0, _ = plain(state, batch, jnp.zeros(()), key, r=5)
        _, m1, _ = gta(state, batch + (batch[0],), jnp.zeros(()), key, r=5)
        np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                                   rtol=1e-6)

    def test_gta_inputs_differs_and_trains(self):
        # corrupted decoder inputs (a frozen model's predictions stand-in):
        # loss differs from the plain step but still decreases — targets and
        # the style reference stay ground truth
        model, state, plain, batch, tx = self._setup()
        gta_step = make_autoregressive_train_step(model, tx, gta_inputs=True)
        key = jax.random.PRNGKey(4)
        mel = batch[0]
        noisy = mel + 0.3 * jax.random.normal(key, mel.shape)
        _, m0, _ = plain(state, batch, jnp.zeros(()), key, r=5)
        losses = []
        for i in range(10):
            state, m, _ = gta_step(state, batch + (noisy,), jnp.zeros(()),
                                   jax.random.fold_in(key, i), r=5)
            losses.append(float(m["loss"]))
            assert np.isfinite(losses[-1])
        assert abs(losses[0] - float(m0["loss"])) > 1e-6
        assert losses[-1] < losses[0]

    def test_gta_prepper_pairs_and_collates(self, tmp_path):
        from etts.data.dataset import GTADataPrepper, Dataset
        import yaml  # noqa: F401  (config dict built inline)
        mel_dir = tmp_path / "mels"
        gta_dir = tmp_path / "gta"
        mel_dir.mkdir(); gta_dir.mkdir()
        rng = np.random.default_rng(0)
        samples = []
        for i, t in enumerate((11, 14, 9)):
            np.save(mel_dir / f"u{i}.npy",
                    rng.standard_normal((t, 12)).astype(np.float32))
            # off-by-one shorter GTA exercises the repeat-pad safety
            np.save(gta_dir / f"u{i}.npy",
                    rng.standard_normal((t - (i == 1), 12)).astype(np.float32))
            samples.append(("ab", "ab", str(mel_dir / f"u{i}.npy"), None))
        cfg = {"mel_channels": 12, "mel_start_value": 0.5,
               "mel_end_value": -0.5}
        tok = lambda s: [1, 2]
        prepper = GTADataPrepper(cfg, tok, gta_dir)
        item = prepper(samples[0])
        assert len(item) == 5 and item[0].shape == item[4].shape
        assert np.allclose(item[4][0], 0.5) and np.allclose(item[4][-1], -0.5)
        ds = Dataset(samples, prepper, 3, shuffle=False, drop_remainder=False,
                     mel_channels=12)
        batch = next(ds.all_batches())
        assert len(batch) == 5 and batch[0].shape == batch[4].shape

    def test_scheduled_sampling_rate_is_traced_not_static(self):
        # ss_rate changes must NOT retrace (schedules run every step)
        model, state, _, batch, tx = self._setup()
        ss = make_autoregressive_train_step(model, tx,
                                            scheduled_sampling=True)
        key = jax.random.PRNGKey(3)
        for rate in (0.0, 0.3, 0.7):
            state, m, _ = ss(state, batch, jnp.zeros(()), key, r=5,
                             ss_rate=rate)
        assert np.isfinite(float(m["loss"]))
        assert ss._cache_size() == 1  # one trace across all rates

    def test_mi_hinge_adds_constant(self):
        model, state, step, batch, _ = self._setup()
        key = jax.random.PRNGKey(3)
        _, m0, _ = step(state, batch, jnp.zeros(()), key, r=5,
                        prenet_dropout=0.0)
        _, m1, _ = step(state, batch, jnp.asarray(2.0), key, r=5,
                        prenet_dropout=0.0)
        np.testing.assert_allclose(float(m1["loss"]) - float(m0["loss"]),
                                   0.1 * 2.0, rtol=1e-4)

    def test_val_step(self):
        model, state, _, batch, _ = self._setup()
        val = make_autoregressive_val_step(model)
        out = val(state, batch, jax.random.PRNGKey(0), r=5)
        assert "decoder_attention" in out
        assert np.isfinite(float(out["tts_loss"]))

    def test_adversarial_mine_decreases_mi(self):
        """With mine_adversarial on, the MI estimate is inside the TTS tape:
        a fixed critic's MI estimate must DECREASE as the encoders train
        against it (the reference's hinge is gradient-free and cannot do this)."""
        model, state, _, batch, tx = self._setup()
        key = jax.random.PRNGKey(5)
        mine = MINE(pair_type="style_text", divergence_type="KL",
                    dense_hidden_units=(16,))
        mi_state = MIState.create(mine.n_beta, weight_factor=1.0)
        # critic initialized on embeddings from a plain pass
        plain = make_autoregressive_train_step(model, tx)
        state, _, aux = plain(state, batch, jnp.zeros(()), key, r=5,
                              prenet_dropout=0.0)
        mine_vars = mine.init(key, aux["text_enc_output"], aux["gst_output"],
                              batch[3][:, None, :], mi_state, key)
        adv = make_autoregressive_train_step(
            model, tx, mi_weight_factor=5.0,
            adversarial_mine=[("MINE", mine)])
        mi_vals = []
        for i in range(12):
            # fixed rng: same char pick/permutation -> deterministic objective
            state, m, _ = adv(state, batch,
                              ([mine_vars["params"]], mi_state), key,
                              r=5, prenet_dropout=0.0)
            mi_vals.append(float(m["mi_live"]))
        assert np.isfinite(mi_vals[-1])
        assert mi_vals[-1] < mi_vals[0], mi_vals

    def test_adversarial_club_branch(self):
        """adversarial_mine with a CLUB net: the upper BOUND (not lld) enters
        the tape and the step runs/produces finite mi_live."""
        from etts.models.mine import CLUB
        model, state, _, batch, tx = self._setup()
        key = jax.random.PRNGKey(6)
        club = CLUB(pair_type="style_text", dense_hidden_units=(16,),
                    out_dim=32)
        mi_state = MIState.create(1)
        plain = make_autoregressive_train_step(model, tx)
        state, _, aux = plain(state, batch, jnp.zeros(()), key, r=5,
                              prenet_dropout=0.0)
        club_vars = club.init(key, aux["text_enc_output"], aux["gst_output"],
                              batch[3][:, None, :], mi_state, key)
        adv = make_autoregressive_train_step(
            model, tx, mi_weight_factor=1.0,
            adversarial_mine=[("CLUB", club)])
        state, m, _ = adv(state, batch, ([club_vars["params"]], mi_state),
                          key, r=5, prenet_dropout=0.0)
        assert np.isfinite(float(m["mi_live"]))
        assert np.isfinite(float(m["loss"]))

    def test_joint_mine_training(self):
        model, state, step, batch, _ = self._setup()
        key = jax.random.PRNGKey(4)
        mine = MINE(pair_type="style_text", divergence_type="KL",
                    dense_hidden_units=(16,))
        mi_state = MIState.create(mine.n_beta, weight_factor=0.1)
        # embeddings from a first TTS pass
        state, m, aux = step(state, batch, mi_state.mi_loss, key, r=5)
        mine_vars = mine.init(key, aux["text_enc_output"], aux["gst_output"],
                              batch[3][:, None, :], mi_state, key)
        mine_tx = make_optimizer([[0, 1e-4]])
        mine_state = TrainState.create(mine_vars, mine_tx)
        mine_step = make_mine_update(mine, mine_tx, kind="MINE")
        for i in range(3):
            state, m, aux = step(state, batch, mi_state.mi_loss,
                                 jax.random.fold_in(key, i), r=5)
            mine_state, mi, terms = mine_step(
                mine_state, aux["text_enc_output"], aux["gst_output"],
                batch[3][:, None, :], mi_state, jax.random.fold_in(key, 100 + i))
            mi_state = mi_state.replace(mi_loss=mi, exp_terms=terms)
        assert np.isfinite(float(mi_state.mi_loss))

    def test_mine_zoo_update_matches_per_net(self):
        """Fused zoo dispatch == sequential per-net updates, bit-exactly
        (incl. the reference's last-net-exp_terms carry)."""
        from etts.train import make_mine_zoo_update
        from etts.models.mine import CLUB
        model, state, step, batch, _ = self._setup()
        key = jax.random.PRNGKey(11)
        nets = [("MINE", MINE(pair_type="style_text", divergence_type="KL",
                              dense_hidden_units=(16,))),
                ("CLUB", CLUB(pair_type="style_text",
                              dense_hidden_units=(16,), out_dim=32))]
        mi_state = MIState.create(nets[0][1].n_beta, weight_factor=0.1)
        _, _, aux = step(state, batch, mi_state.mi_loss, key, r=5)
        text, gst = aux["text_enc_output"], aux["gst_output"]
        spk = batch[3][:, None, :]
        mine_tx = make_optimizer([[0, 1e-4]])
        states = [TrainState.create(
            net.init(jax.random.fold_in(key, 100 + i), text, gst, spk,
                     mi_state, key), mine_tx) for i, (_, net) in
            enumerate(nets)]
        rngs = tuple(jax.random.fold_in(key, 7919 + i)
                     for i in range(len(nets)))

        # reference path: one dispatch per net, last terms win
        want_states, want_mis, terms = [], [], mi_state.exp_terms
        for i, (kind, net) in enumerate(nets):
            st, mi, terms = make_mine_update(net, mine_tx, kind=kind)(
                states[i], text, gst, spk, mi_state, rngs[i])
            want_states.append(st)
            want_mis.append(mi)

        zoo = make_mine_zoo_update(nets, mine_tx)
        got_states, got_mis, got_terms = zoo(states, text, gst, spk,
                                             mi_state, rngs)
        np.testing.assert_array_equal(np.asarray(got_mis),
                                      np.asarray(want_mis))
        np.testing.assert_array_equal(np.asarray(got_terms),
                                      np.asarray(terms))
        for ws, gs in zip(want_states, got_states):
            jax.tree.map(np.testing.assert_array_equal, ws.params, gs.params)


class TestWaveRNNTraining:
    def test_loss_decreases(self):
        model = WaveRNN(rnn_dims=16, fc_dims=16, bits=4, pad=2,
                        upsample_factors=(2, 5), feat_dims=8, compute_dims=8,
                        res_out_dims=8, res_blocks=1, hop_length=10,
                        sample_rate=100, mode="RAW")
        key = jax.random.PRNGKey(0)
        t_mel = 9
        x = jax.random.uniform(key, (2, 50), minval=-1, maxval=1)
        y = jax.random.randint(key, (2, 50), 0, 16)
        mels = jax.random.normal(key, (2, t_mel, 8))
        variables = model.init(key, x, mels, False)
        tx = make_optimizer([[0, 3e-3]])
        state = TrainState.create(variables, tx)
        step = make_wavernn_train_step(model, tx)
        losses = []
        for i in range(10):
            state, m = step(state, (x, y, mels), jax.random.fold_in(key, i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]


class TestDataParallel:
    def test_eight_device_mesh_matches_single_device(self):
        assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
        model = ForwardTransformer(**TINY)
        key = jax.random.PRNGKey(0)
        mel = jax.random.normal(key, (8, 20, 12))
        phon = jax.random.randint(key, (8, 10), 1, 40)
        durs = jnp.full((8, 10), 2.0)
        variables = model.init(
            {"params": key, "dropout": key, "prenet": key},
            phon, durs[..., None], max_frames=20)
        tx = make_optimizer([[0, 1e-3]])
        step = make_forward_train_step(model, tx, max_frames=20)

        # single device
        s1 = TrainState.create(variables, tx)
        s1, m1 = step(s1, (mel, phon, durs), key)

        # 8-device data parallel
        mesh = make_mesh(("data",))
        s8 = replicate(TrainState.create(variables, tx), mesh)
        batch = shard_batch((mel, phon, durs), mesh)
        s8, m8 = step(s8, batch, key)
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=2e-4)
        # params identical after one step
        d1 = jax.tree.leaves(s1.params)[0]
        d8 = jax.tree.leaves(s8.params)[0]
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d8), atol=2e-5)

    def test_schedule_interp(self):
        f = interp_schedule([[0, 0.0], [10, 1.0]])
        assert abs(float(f(5)) - 0.5) < 1e-6

