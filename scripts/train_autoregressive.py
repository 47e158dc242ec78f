"""Joint AR-TTS + MINE training driver.

Re-implements `TransformerTTS/train_autoregressive.py`: seeded setup, MINE net
zoo per pair type (MINE/CLUB/MINE_CLUB x pairs, :69-102), carried MI state
(:103-108), checkpoint restore for the TTS and every MINE net (:114-125), twin
datasets (TTS batch + scheduled MINE batch, :190-199), main loop applying the
lr/prenet-dropout/reduction-factor/head-drop schedules, TensorBoard summaries,
periodic checkpoints, and periodic AR prediction with Griffin-Lim audio
(:218-335). Data-parallel over all local devices via a 1-D mesh.
"""
import argparse

import _bootstrap  # noqa: F401

import numpy as np
import jax
import jax.numpy as jnp
import tqdm

from etts.data import Dataset, DataPrepper, Prefetcher, load_files
from etts.models.autoregressive import autoregressive_predict, AutoregressiveTransformer
from etts.models.mine import MINE, CLUB, MIState
from etts.parallel import (make_mesh, shard_batch, replicate,
                           local_shard, add_multihost_args,
                           maybe_init_multihost)
from etts.train import (TrainState, make_optimizer,
                        make_autoregressive_train_step, make_mine_zoo_update)
from etts.utils import ConfigManager, CheckpointManager
from etts.utils.display import ValueWindow
from etts.utils.logging import SummaryManager
from etts.utils.scheduling import piecewise_linear_schedule, reduction_schedule


def build_mine_zoo(config, key, text_dim, style_dim, spk_dim):
    """MINE/CLUB nets per pair type (`train_autoregressive.py:69-102`).

    CLUB's variational net predicts the pair's TARGET embedding, so its
    out_dim must match that embedding's width (text enc dim for style_text,
    the d-vector dim otherwise) — the reference never varies these from 256,
    which masked the coupling."""
    nets = []
    mine_type = config.get("mine_type", "MINE")
    for pair in config["mine_pair_types"]:
        if mine_type in ("MINE", "MINE_CLUB"):
            nets.append(("MINE", MINE(pair_type=pair,
                                      divergence_type=config["divergence_type"],
                                      beta_values=tuple(config["mine_beta_values"]),
                                      dense_hidden_units=tuple(
                                          config["mine_dense_hidden_units"]),
                                      conv_filters=tuple(config["mine_conv_filters"]),
                                      conv_kernel=config["mine_conv_kernel"])))
        if mine_type in ("CLUB", "MINE_CLUB"):
            out_dim = text_dim if pair == "style_text" else spk_dim
            nets.append(("CLUB", CLUB(pair_type=pair,
                                      out_dim=out_dim,
                                      dense_hidden_units=tuple(
                                          config["mine_dense_hidden_units"]))))
    return nets


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="dir with data_config.yaml + autoregressive_config.yaml")
    parser.add_argument("--session_name", type=str, default=None)
    parser.add_argument("--reset_dir", action="store_true")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--force", action="store_true",
                        help="skip interactive dir-reset prompts")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax profiler trace of steps 10-30")
    parser.add_argument("--gta_mel_dir", type=str, default=None,
                        help="dir of frozen-checkpoint teacher-forced mels "
                        "(make_gta.py --tts_out): free-run-matched fine-tune "
                        "— decoder inputs come from these, targets/style "
                        "stay ground truth (VERDICT r4 #6)")
    add_multihost_args(parser)
    args = parser.parse_args()
    maybe_init_multihost(args)  # before any jax device use

    np.random.seed(42)
    cm = ConfigManager(args.config, "autoregressive", args.session_name)
    config = cm.config
    cm.create_remove_dirs(clear_dir=args.reset_dir, force=args.force)
    cm.dump_config()
    cm.print_config()

    model = cm.get_model(ignore_hash=True)
    pipeline = cm.get_text_pipeline()
    key = jax.random.PRNGKey(42)

    # datasets ---------------------------------------------------------------
    train_meta = cm.train_datadir / "train_metafile.txt"
    spk_dir = (cm.train_datadir / "spk_embeds"
               if model.has_speaker else None)
    if spk_dir is not None and not spk_dir.exists():
        raise FileNotFoundError(
            f"system_type={config['system_type']!r} needs precomputed speaker "
            f"embeddings (GE2E d-vectors, reference README:14-16) in "
            f"{spk_dir}; none found")
    samples, _ = load_files(train_meta, cm.train_datadir / "mels", spk_dir,
                            config.get("n_samples"))
    if args.gta_mel_dir:
        from etts.data.dataset import GTADataPrepper
        prepper = GTADataPrepper(config, pipeline.tokenizer, args.gta_mel_dir)
    else:
        prepper = DataPrepper(config, pipeline.tokenizer)
    tts_batch = config.get("tts_batch_size", 8)
    dataset = Dataset(samples, prepper, tts_batch,
                      mel_channels=config["mel_channels"])
    mine_dataset = None
    if config.get("use_mine"):
        mine_bs = reduction_schedule(0, config["mine_batch_size_schedule"])
        mine_dataset = Dataset(samples, prepper, mine_bs,
                               mel_channels=config["mel_channels"], seed=43)

    # model/optimizer state ----------------------------------------------------
    from etts.utils.config import _init_variables
    variables = _init_variables(model, config, "autoregressive")
    frozen_mask = None
    if config.get("use_pretrained"):
        # freeze the text encoder subtree (transplant freeze, :136-169)
        frozen_mask = jax.tree.map(lambda _: False, variables["params"])
        for name in ("TextEncoder", "TextEmbedding"):
            if name in frozen_mask:
                frozen_mask[name] = jax.tree.map(lambda _: True,
                                                 frozen_mask[name])
    tx = make_optimizer(config["learning_rate_tts_schedule"],
                        frozen_mask=frozen_mask)
    state = TrainState.create(variables, tx)

    ckpt = CheckpointManager(cm.weights_dir,
                             max_to_keep=config.get("keep_n_weights"),
                             keep_every_n_hours=config.get(
                                 "keep_checkpoint_every_n_hours"))
    state, rstep = ckpt.restore_state(state)
    if rstep is not None:
        print(f"restored TTS weights at step {rstep}")

    # MINE zoo -----------------------------------------------------------------
    mine_nets, mine_states, mine_ckpts = [], [], []
    mine_zoo_step = None
    mi_state = MIState.create(
        n_beta=len(config.get("mine_beta_values", [0])),
        smoothing_factor=config.get("mine_smoothing_factor", 1.0),
        weight_factor=config.get("mine_weight_factor", 0.1))
    if config.get("use_mine"):
        text_dim = config["encoder_model_dimension"]
        style_dim = config["gst_style_embed_dim"]
        # d-vector width comes from the data, not a constant: the reference
        # hardcodes 256 (GE2E), but any precomputed embedding is legal here
        spk_dim = (int(np.load(samples[0][3]).shape[-1])
                   if model.has_speaker else 1)
        dummy_text = jnp.zeros((4, 8, text_dim))
        dummy_style = jnp.zeros((4, 1, style_dim))
        dummy_spk = jnp.zeros((4, 1, spk_dim))
        mine_tx = make_optimizer(config["learning_rate_mine_schedule"])
        mine_nets = build_mine_zoo(config, key, text_dim, style_dim, spk_dim)
        for i, (kind, net) in enumerate(mine_nets):
            vars_i = net.init(jax.random.fold_in(key, 100 + i), dummy_text,
                              dummy_style, dummy_spk, mi_state, key)
            st = TrainState.create(vars_i, mine_tx)
            mngr = CheckpointManager(cm.mine_weights_dir[i])
            st, rs = mngr.restore_state(st)
            mine_states.append(st)
            mine_ckpts.append(mngr)
        # all net updates fused into ONE dispatch (independent subgraphs
        # schedule concurrently; MI scalars sync on the metrics cadence);
        # an empty zoo (e.g. system_type derives no pairs) degrades to
        # MI-less training rather than crashing
        mine_zoo_step = (make_mine_zoo_update(mine_nets, mine_tx)
                         if mine_nets else None)

    # train step ---------------------------------------------------------------
    # opt-in research mode: compute MI inside the TTS tape so the adversarial
    # game is real (the faithful default keeps the reference's gradient-free
    # previous-step hinge)
    adversarial = bool(config.get("mine_adversarial")) and bool(mine_nets)
    # optional context parallelism over a 'seq' mesh axis for very long
    # reference audio (config sequence_parallel: N shards t_mel N ways)
    # exposure-bias mitigation: enable the two-pass scheduled-sampling step
    # only when the schedule is ever nonzero (the extra pass costs ~2x)
    ss_schedule = config.get("scheduled_sampling_schedule", [[0, 0.0]])
    ss_enabled = any(float(v) > 0 for _, v in ss_schedule)

    seq_n = int(config.get("sequence_parallel", 1))
    mesh = None
    seq_sharding = None
    if seq_n > 1 and len(jax.devices()) >= seq_n:
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = make_mesh(("data", "seq"), (-1, seq_n))
        seq_sharding = NamedSharding(mesh, P("data", "seq", None))
    elif len(jax.devices()) > 1:
        mesh = make_mesh(("data",))
    train_step = make_autoregressive_train_step(
        model, tx,
        stop_scaling=config.get("stop_loss_scaling", 1.0),
        use_style_loss=config.get("use_style_loss", False),
        mi_weight_factor=config.get("mine_weight_factor", 0.1),
        train_text_encoder=config.get("train_text_encoder", True),
        train_style_encoder=config.get("train_style_encoder", True),
        train_decoder=config.get("train_decoder", True),
        adversarial_mine=(mine_nets if adversarial else None),
        seq_sharding=seq_sharding,
        scheduled_sampling=ss_enabled,
        gta_inputs=bool(args.gta_mel_dir))

    if mesh is not None:
        state = replicate(state, mesh)

    summary = SummaryManager(model, cm.log_dir, config)
    # rolling average displays (reference n_steps_avg_losses)
    avg_windows = {n: ValueWindow(n)
                   for n in config.get("n_steps_avg_losses", [100])}
    max_steps = args.max_steps or config["max_steps"]
    start_step = int(state.step)
    if start_step:
        # resume continues the data stream (no replay of early batches, no
        # fresh bucket-shape x current-r compiles) — see Dataset.seek
        dataset.seek(start_step)
        if mine_dataset is not None and config.get("mine_sep_call"):
            # the MINE stream cannot be continued exactly across batch-size
            # schedule boundaries (change_batches resets the iterator even in
            # an uninterrupted run); apply the CURRENT scheduled size first so
            # the loop's change_batches check doesn't discard the seek, then
            # fast-forward by the step count — the approximation avoids
            # re-exposing the earliest batches, which is the point
            cur_bs = reduction_schedule(start_step,
                                        config["mine_batch_size_schedule"])
            if cur_bs != mine_dataset.batch_size:
                mine_dataset.change_batches(cur_bs)
            mine_dataset.seek(start_step)
    dataset = Prefetcher(dataset)

    t = tqdm.trange(start_step, max_steps, initial=start_step,
                    total=max_steps, disable=jax.process_index() != 0)
    for step in t:
        batch = dataset.next_batch()
        r = reduction_schedule(step, config["reduction_factor_schedule"])
        drop_n = reduction_schedule(step, config["head_drop_schedule"])
        prenet_dropout = piecewise_linear_schedule(
            step, config["decoder_prenet_dropout_schedule"])
        ss_rate = (piecewise_linear_schedule(step, ss_schedule)
                   if ss_enabled else 0.0)
        if mesh is not None:
            batch = shard_batch(local_shard(batch), mesh)
        mi_arg = (([st.params for st in mine_states], mi_state)
                  if adversarial else mi_state.mi_loss)
        state, metrics, aux = train_step(
            state, batch, mi_arg, jax.random.fold_in(key, step),
            r=r, prenet_dropout=prenet_dropout, drop_n_heads=drop_n,
            ss_rate=ss_rate)

        if mine_zoo_step is not None:
            if config.get("mine_sep_call"):
                mb = mine_dataset.next_batch()
                mel, phon, stop, spk = mb
                spk_in = spk[:, None, :] if model.has_speaker else None
                tar_mel = mel[:, :-1][:, ::r]
                enc = model.apply(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    jnp.asarray(phon), jnp.asarray(tar_mel), spk_in,
                    True, True, drop_n,
                    method=AutoregressiveTransformer.encode,
                    rngs={"dropout": jax.random.fold_in(key, step + 1),
                          "prenet": jax.random.fold_in(key, step + 2)},
                    mutable=["batch_stats"])[0]
                text_out, gst_out = enc[6], enc[5]
                spk_for_mine = spk_in
            else:
                text_out, gst_out = aux["text_enc_output"], aux["gst_output"]
                spk_for_mine = (batch[3][:, None, :] if model.has_speaker
                                else jnp.zeros((text_out.shape[0], 1, 1)))
            rngs = tuple(jax.random.fold_in(key, 7919 * (step + 1) + i)
                         for i in range(len(mine_nets)))
            mine_states, mi_vals, terms = mine_zoo_step(
                mine_states, text_out, gst_out, spk_for_mine, mi_state, rngs)
            # sum over nets; LAST net's exp_terms carry (reference parity,
            # traning_steps.py:84)
            mi_state = mi_state.replace(mi_loss=jnp.sum(mi_vals),
                                        exp_terms=terms)
            # MINE batch size schedule
            new_bs = reduction_schedule(step, config["mine_batch_size_schedule"])
            if mine_dataset is not None and new_bs != mine_dataset.batch_size:
                mine_dataset.change_batches(new_bs)

        # metrics sync every sync_every steps only: float(loss) forces a
        # host<->device round trip (tens of ms on a congested tunnel), which
        # would otherwise serialize every step against the wire. jax's async
        # dispatch keeps the device busy between syncs.
        sync_every = int(config.get("metrics_sync_frequency", 10))
        if step % sync_every == 0 or step + 1 == max_steps:
            loss_val = float(metrics["loss"])
            for w in avg_windows.values():
                w.append(loss_val)
            t.set_postfix(loss=loss_val,
                          **{f"avg{n}": round(w.average, 4)
                             for n, w in avg_windows.items()})
            if np.isnan(loss_val) or loss_val > 1e4:
                raise RuntimeError(
                    f"Loss exploded to {loss_val} at step {step}")
            summary.add_scalar("train/loss", loss_val, step=step)
            for k, v in metrics["losses"].items():
                summary.add_scalar(f"train/{k}", float(v), step=step)
            summary.add_scalar("meta/reduction_factor", r, step=step)
            summary.add_scalar("meta/prenet_dropout", prenet_dropout,
                               step=step)
            if ss_enabled:
                summary.add_scalar("meta/scheduled_sampling_rate",
                                   float(ss_rate), step=step)
            if mine_zoo_step is not None:
                # MI scalars sync here (not per step): each float() is a
                # host<->device round trip
                for i, mv in enumerate(np.asarray(mi_vals)):
                    summary.add_scalar(f"mi/{mine_nets[i][0]}_{i}",
                                       float(mv), step=step)
        if args.profile_dir and step == start_step + 10:
            jax.profiler.start_trace(args.profile_dir)
        if args.profile_dir and step == start_step + 30:
            jax.profiler.stop_trace()

        if (step + 1) % config["weights_save_frequency"] == 0 or step + 1 == max_steps:
            # guard EVERY save, not only metrics-sync steps: a loss that
            # goes NaN between syncs must never overwrite a good rolling
            # checkpoint (max_to_keep). One cheap device-side scalar sync.
            loss_now = float(metrics["loss"])
            if not np.isfinite(loss_now) or loss_now > 1e4:
                raise RuntimeError(
                    f"Loss exploded to {loss_now} at step {step} "
                    "(pre-checkpoint guard)")
            ckpt.save_state(step + 1, state)
            for i, mngr in enumerate(mine_ckpts):
                mngr.save_state(step + 1, mine_states[i])

        if (step + 1) % config["prediction_frequency"] == 0 and \
                (step + 1) >= config.get("prediction_start_step", 0):
            mel, phon, stop, spk = jax.device_get(batch)
            ref = model.encode_ref(jnp.asarray(mel[0]), r=r)
            spk_in = (jnp.asarray(spk[0])[None, None, :]
                      if model.has_speaker else None)
            out = autoregressive_predict(
                model, {"params": jax.device_get(state.params),
                        "batch_stats": jax.device_get(state.batch_stats)},
                jnp.asarray(phon[:1]), ref if model.has_style else None,
                spk_in, r=r, max_length=min(mel.shape[1] * 2, 1000),
                key=jax.random.fold_in(key, step),
                prenet_dropout=prenet_dropout)
            pred_mel = np.asarray(out["mel"][0][: int(out["mel_length"])])
            summary.display_mel(pred_mel, tag="prediction/mel", step=step)
            if (step + 1) >= config.get("audio_start_step", 0) and \
                    (step + 1) % config.get("audio_prediction_frequency",
                                            10 ** 9) == 0:
                summary.display_audio("prediction/audio", pred_mel, step=step)

    print("Done.")


if __name__ == "__main__":
    main()
