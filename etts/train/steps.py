"""Jitted train/val steps for all four model families.

The joint TTS+MINE step reproduces `TransformerTTS/model/traning_steps.py`:
  - TTS loss = MAE(final) + scaled stop CE + MAE(mel_linear), weights [1,1,1]
    (`AutoregressiveTransformer._compile` :224-231)
  - optional style-consistency loss: re-encode the predicted mel through the
    style encoder, l2 against the first pass (:42-50)
  - total = tts + weight_factor * max(0, mi_loss) where mi_loss is the
    PREVIOUS step's MI estimate carried in MIState — a constant under the
    gradient tape, exactly as in the reference (:53; the MI term shapes the
    loss trace/logging, not the TTS gradient)
  - each MINE net updates by gradient ASCENT on its MI estimate (:77-82),
    either on the same batch's embeddings or on a separate fresh batch
    (``mine_sep_call``, :59-68).

All steps take schedule-derived scalars (lr is inside the optimizer; prenet
dropout and drop_n_heads are traced) so schedules never retrace; the reduction
factor r changes static shapes and keys a small jit cache.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from ..utils.losses import (masked_mean_absolute_error, new_scaled_crossentropy,
                            weighted_sum_losses, l2_loss)
from ..models.autoregressive import AutoregressiveTransformer
from ..models.mine import MIState
from ..models.tacotron import tacotron_loss
from ..models.wavernn import discretized_mix_logistic_loss

__all__ = [
    "make_forward_train_step", "make_forward_val_step",
    "make_autoregressive_train_step", "make_autoregressive_val_step",
    "make_mine_update", "make_mine_zoo_update", "make_wavernn_train_step",
    "make_tacotron_train_step",
]


def _split_rngs(rng, names):
    keys = jax.random.split(rng, len(names))
    return dict(zip(names, keys))


# ---------------------------------------------------------------------------
# Forward transformer
# ---------------------------------------------------------------------------

def make_forward_train_step(model, tx, max_frames: int, seq_sharding=None):
    """Loss weights [3, 1] (mel, duration) — forward `_compile`
    (models.py:407-412). ``seq_sharding``: optional context-parallel
    NamedSharding for the target mels (see make_autoregressive_train_step)."""

    @jax.jit
    def step(state, batch, rng):
        mel, phonemes, durations = batch
        if seq_sharding is not None:
            mel = jax.lax.with_sharding_constraint(mel, seq_sharding)
        durations = durations[..., None]
        mel_len = mel.shape[1]

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                phonemes, durations, max_frames=max_frames, train=True,
                rngs=_split_rngs(rng, ["dropout", "prenet"]),
                mutable=["batch_stats"])
            loss, vals = weighted_sum_losses(
                (mel, durations),
                (out["mel"][:, :mel_len, :], out["duration"]),
                (masked_mean_absolute_error, masked_mean_absolute_error),
                (3.0, 1.0))
            return loss, (vals, mut, out)

        (loss, (vals, mut, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            params=jax.tree.map(lambda p, u: p + u, state.params, updates),
            opt_state=opt_state, batch_stats=mut["batch_stats"],
            step=state.step + 1)
        return new_state, {"loss": loss, "mel_loss": vals[0],
                           "duration_loss": vals[1]}

    return step


def make_forward_val_step(model, max_frames: int):
    @jax.jit
    def step(state, batch, rng):
        mel, phonemes, durations = batch
        durations = durations[..., None]
        mel_len = mel.shape[1]
        out = model.apply(state.variables(), phonemes, durations,
                          max_frames=max_frames, train=False,
                          rngs=_split_rngs(rng, ["dropout", "prenet"]))
        loss, vals = weighted_sum_losses(
            (mel, durations), (out["mel"][:, :mel_len, :], out["duration"]),
            (masked_mean_absolute_error, masked_mean_absolute_error),
            (3.0, 1.0))
        return {"loss": loss, "mel_loss": vals[0], "duration_loss": vals[1]}, out

    return step


# ---------------------------------------------------------------------------
# Autoregressive transformer (+ optional style loss + MI hinge)
# ---------------------------------------------------------------------------

def make_autoregressive_train_step(model: AutoregressiveTransformer, tx, *,
                                   stop_scaling: float = 8.0,
                                   use_style_loss: bool = False,
                                   mi_weight_factor: float = 0.1,
                                   train_text_encoder: bool = True,
                                   train_style_encoder: bool = True,
                                   train_decoder: bool = True,
                                   adversarial_mine=None,
                                   seq_sharding=None,
                                   scheduled_sampling: bool = False,
                                   gta_inputs: bool = False):
    """``adversarial_mine``: optional zoo of ``(kind, net)`` MINE/CLUB modules
    (as built by the driver). When given, the step signature becomes
    ``step(state, batch, mine_params_list, mi_state, rng, *, r, ...)`` and the
    MI estimate is computed INSIDE the TTS loss tape on the live embeddings, so
    ``mi_weight_factor`` genuinely pushes the encoders toward disentanglement.
    The faithful default (None) keeps the reference's gradient-free hinge on
    the previous step's scalar (`traning_steps.py:53`).

    ``seq_sharding``: optional NamedSharding (e.g. P('data', 'seq', None))
    applied to the teacher-forcing mel tensors — context parallelism for very
    long reference audio: GSPMD keeps LN/FFN/conv activations sharded along
    time (spatial conv partitioning with halo exchange) and inserts the
    gathers attention needs. SURVEY §5 long-context strategy, TPU-native.

    ``scheduled_sampling``: exposure-bias mitigation (parallel scheduled
    sampling for transformers): an extra teacher-forced pass produces the
    model's own frame predictions (stop-gradient, inference-style dropout),
    and each reduced decoder-input position is replaced by the prediction
    with probability ``ss_rate`` (a traced scalar — schedules don't
    retrace). Targets stay ground truth. With ss_rate=0 the step is
    bit-identical to the plain teacher-forced step. The reference never
    mitigates its exposure bias (its free-running quality silently degrades
    past the dropout switch); this is the TPU-side improvement, motivated by
    the round-3 soak's checkpoint-selection curve.

    ``gta_inputs``: free-run-matched fine-tuning (VERDICT r4 #6). The batch
    carries a fifth tensor — a FROZEN checkpoint's teacher-forced (GTA)
    prediction aligned 1:1 with the GT mel (`scripts/make_gta.py --tts_out`,
    `GTADataPrepper`) — which becomes the decoder input, while targets and
    the style reference stay ground truth. Unlike ``scheduled_sampling``,
    the input distribution is stationary (no evolving-model feedback) and
    costs no second forward pass."""
    stop_ce = new_scaled_crossentropy(index=2, scaling=stop_scaling)
    loss_fns = (masked_mean_absolute_error, stop_ce,
                masked_mean_absolute_error)

    @functools.partial(jax.jit, static_argnames=("r",))
    def step(state, batch, mi_loss, rng, *, r: int, prenet_dropout=0.5,
             drop_n_heads=0, ss_rate=0.0):
        if gta_inputs:
            mel, phonemes, stop, spk, gta_mel = batch
        else:
            mel, phonemes, stop, spk = batch
        if seq_sharding is not None:
            mel = jax.lax.with_sharding_constraint(mel, seq_sharding)
        spk_in = spk[:, None, :] if model.has_speaker else None
        tar_real, tar_mel, tar_stop, mel_len = model.input_reshape(mel, stop, r)
        if seq_sharding is not None:
            tar_real = jax.lax.with_sharding_constraint(tar_real, seq_sharding)
            tar_mel = jax.lax.with_sharding_constraint(tar_mel, seq_sharding)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            dec_inp = tar_mel
            style_tar = None
            if gta_inputs:
                # free-run-matched fine-tune (VERDICT r4 #6): the decoder
                # input is a FROZEN checkpoint's teacher-forced prediction
                # (the distribution free-running feeds back), targets stay
                # ground truth, the style encoder keeps the clean GT mel
                _, gta_tar, _, _ = model.input_reshape(gta_mel, stop, r)
                # keep the GO frame + sentinels exact (the model must still
                # learn the start transition from the true start vector)
                dec_inp = gta_tar.at[:, :1].set(tar_mel[:, :1])
                style_tar = tar_mel
            if scheduled_sampling:
                # pass 1: the model's own teacher-forced predictions under
                # inference-style stochasticity (train flags off, prenet
                # dropout as served). stop_gradient: only pass 2 trains.
                ss_rng = jax.random.fold_in(rng, 13)
                out1 = model.apply(
                    variables, phonemes, tar_mel, spk_in,
                    False, False, False,
                    r=r, prenet_dropout=prenet_dropout, drop_n_heads=0,
                    rngs=_split_rngs(ss_rng, ["dropout", "prenet"]),
                    mutable=False)
                # final_output[:, t] predicts mel[:, t+1]; prepend the GO
                # frame and re-apply the teacher-forcing shift + r-stride to
                # get the predicted decoder input in tar_mel's layout
                pred_full = jnp.concatenate(
                    [mel[:, :1],
                     jax.lax.stop_gradient(out1["final_output"][:, :mel_len])],
                    axis=1)
                pred_tar = pred_full[:, :-1][:, 0::r, :]
                mix = jax.random.bernoulli(
                    jax.random.fold_in(ss_rng, 1), ss_rate,
                    (tar_mel.shape[0], tar_mel.shape[1], 1))
                dec_inp = jnp.where(mix, pred_tar, tar_mel)
                # the style reference must stay the clean GT mel — the
                # round-4 ss arms fed the mixed input to the GST too,
                # corrupting the style pathway they were regularizing
                style_tar = tar_mel
            out, mut = model.apply(
                variables, phonemes, dec_inp, spk_in,
                train_text_encoder, train_style_encoder, train_decoder,
                r=r, prenet_dropout=prenet_dropout, drop_n_heads=drop_n_heads,
                style_targets=style_tar,
                rngs=_split_rngs(rng, ["dropout", "prenet"]),
                mutable=["batch_stats"])
            tts_loss, vals = weighted_sum_losses(
                (tar_real, tar_stop, tar_real),
                (out["final_output"][:, :mel_len, :],
                 out["stop_prob"][:, :mel_len, :],
                 out["mel_linear"][:, :mel_len, :]),
                loss_fns, (1.0, 1.0, 1.0))
            style_loss = jnp.zeros(())
            if use_style_loss and model.has_style:
                gst2, _, _ = model.apply(
                    variables, out["final_output"], train_style_encoder,
                    drop_n_heads,
                    method=AutoregressiveTransformer.encode_style,
                    rngs=_split_rngs(jax.random.fold_in(rng, 7),
                                     ["dropout", "prenet"]),
                    mutable=["batch_stats"])[0]
                style_loss = l2_loss(gst2, out["gst_output"])
            tts_total = tts_loss + style_loss
            if adversarial_mine is not None:
                # live MI inside the tape: gradients flow from the critic's
                # estimate back into text/style embeddings (critic params are
                # inputs, not differentiated — the adversarial game is real)
                mine_params_list, mi_state = mi_loss
                spk_m = (spk_in if model.has_speaker
                         else jnp.zeros((tar_mel.shape[0], 1, 1)))
                mi_live = jnp.zeros(())
                for i, (kind, net) in enumerate(adversarial_mine):
                    k = jax.random.fold_in(rng, 101 + i)
                    res = net.apply({"params": mine_params_list[i]},
                                    out["text_enc_output"], out["gst_output"],
                                    spk_m, mi_state, k)
                    # MINE -> (mi, terms); CLUB -> (lld, bound): use the bound
                    mi_live = mi_live + (res[1] if kind == "CLUB" else res[0])
                total = tts_total + mi_weight_factor * jnp.maximum(0.0, mi_live)
            else:
                # MI hinge: previous-step MI, constant w.r.t. params (:53)
                mi_live = jax.lax.stop_gradient(
                    jnp.asarray(mi_loss, jnp.float32))
                total = tts_total + mi_weight_factor * jnp.maximum(0.0, mi_live)
            return total, (tts_total, style_loss, vals, out, mut, mi_live)

        (total, (tts_total, style_loss, vals, out, mut, mi_live)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            params=jax.tree.map(lambda p, u: p + u, state.params, updates),
            opt_state=opt_state, batch_stats=mut["batch_stats"],
            step=state.step + 1)
        metrics = {"loss": total, "tts_loss": tts_total,
                   "style_loss": style_loss, "mi_live": mi_live,
                   "losses": {"output": vals[0], "stop_prob": vals[1],
                              "mel_linear": vals[2]}}
        aux = {"text_enc_output": out["text_enc_output"],
               "gst_output": out["gst_output"],
               "decoder_attention": out["decoder_attention"],
               "reduced_target": tar_mel, "final_output": out["final_output"]}
        return new_state, metrics, aux

    return step


def make_autoregressive_val_step(model: AutoregressiveTransformer, *,
                                 stop_scaling: float = 8.0):
    """Teacher-forced validation (`_gta_forward`/`_val_step` :195-222); also
    the duration-extraction forward (extract_durations.py:125-146)."""
    stop_ce = new_scaled_crossentropy(index=2, scaling=stop_scaling)
    loss_fns = (masked_mean_absolute_error, stop_ce,
                masked_mean_absolute_error)

    @functools.partial(jax.jit, static_argnames=("r",))
    def step(state, batch, rng, *, r: int = 1):
        mel, phonemes, stop, spk = batch[:4]  # tolerate GTA 5-tuples
        spk_in = spk[:, None, :] if model.has_speaker else None
        tar_real, tar_mel, tar_stop, mel_len = model.input_reshape(mel, stop, r)
        out = model.apply(state.variables(), phonemes, tar_mel, spk_in,
                          False, False, False, r=r, prenet_dropout=0.5,
                          rngs=_split_rngs(rng, ["dropout", "prenet"]))
        tts_loss, vals = weighted_sum_losses(
            (tar_real, tar_stop, tar_real),
            (out["final_output"][:, :mel_len, :],
             out["stop_prob"][:, :mel_len, :],
             out["mel_linear"][:, :mel_len, :]),
            loss_fns, (1.0, 1.0, 1.0))
        out.update({"tts_loss": tts_loss,
                    "losses": {"output": vals[0], "stop_prob": vals[1],
                               "mel_linear": vals[2]},
                    "reduced_target": tar_mel})
        return out

    return step


def _mine_update_core(mine_model, tx, kind: str = "MINE"):
    """Un-jitted body of one MI net's gradient-ascent update
    (traning_steps.py:77-82); see make_mine_update / make_mine_zoo_update."""

    def step(state, text_enc_out, gst_out, spk, mi_state: MIState, rng):
        def loss_fn(params):
            if kind == "CLUB":
                lld, bound = mine_model.apply({"params": params}, text_enc_out,
                                              gst_out, spk, mi_state, rng)
                # train by maximizing likelihood; report the bound as MI
                return -lld, (bound, mi_state.exp_terms)
            mi, terms = mine_model.apply({"params": params}, text_enc_out,
                                         gst_out, spk, mi_state, rng)
            return -mi, (mi, terms)

        (_, (mi, terms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            params=jax.tree.map(lambda p, u: p + u, state.params, updates),
            opt_state=opt_state, step=state.step + 1)
        return new_state, mi, terms

    return step


def make_mine_update(mine_model, tx, kind: str = "MINE"):
    """One MI net's gradient-ascent update (traning_steps.py:77-82).

    Returns step(mine_state, text_enc_out, gst_out, spk, mi_state, rng) ->
    (new_mine_state, mi_value, new_exp_terms)."""
    return jax.jit(_mine_update_core(mine_model, tx, kind))


def make_mine_zoo_update(nets, tx):
    """The WHOLE MINE zoo's updates fused into one jitted dispatch.

    ``nets`` is the driver's ``[(kind, net), ...]`` zoo. The per-net update
    subgraphs are independent, so XLA schedules them concurrently and the
    driver pays one dispatch per step instead of one per net — and the MI
    scalars come back as a stacked device array, so the host can defer the
    ``float()`` sync to the metrics cadence instead of blocking on every
    net every step.

    Reference-parity quirks kept: ``mi_total`` is the SUM over nets and the
    LAST net's exp_terms become the carried state, exactly as the eager loop
    in `traning_steps.py:59-84` leaves `mi_holder`.

    Returns step(states, text_enc_out, gst_out, spk, mi_state, rngs) ->
    (new_states, mis (n,), last_terms) where ``rngs`` is one key per net."""
    if not nets:
        raise ValueError(
            "make_mine_zoo_update needs a non-empty zoo — check mine_type "
            "(MINE|CLUB|MINE_CLUB) and that system_type derives pair types")
    cores = [_mine_update_core(net, tx, kind) for kind, net in nets]

    @jax.jit
    def step(states, text_enc_out, gst_out, spk, mi_state: MIState, rngs):
        new_states, mis, terms = [], [], mi_state.exp_terms
        for i, core in enumerate(cores):
            ns, mi, terms = core(states[i], text_enc_out, gst_out, spk,
                                 mi_state, rngs[i])
            new_states.append(ns)
            mis.append(mi)
        return new_states, jnp.stack(mis), terms

    return step


# ---------------------------------------------------------------------------
# WaveRNN
# ---------------------------------------------------------------------------

def make_wavernn_train_step(model, tx):
    """Cross-entropy (RAW) or discretized-MoL loss (train_wavernn.py:119)."""

    @jax.jit
    def step(state, batch, rng):
        x, y, mels = batch

        def loss_fn(params):
            logits, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, mels, True, mutable=["batch_stats"])
            if model.mode == "MOL":
                loss = discretized_mix_logistic_loss(logits, y[..., None])
            else:
                logp = jax.nn.log_softmax(logits, axis=-1)
                onehot = jax.nn.one_hot(y.astype(jnp.int32),
                                        logits.shape[-1])
                loss = -jnp.mean(jnp.sum(onehot * logp, axis=-1))
            return loss, mut

        (loss, mut), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            params=jax.tree.map(lambda p, u: p + u, state.params, updates),
            opt_state=opt_state, batch_stats=mut["batch_stats"],
            step=state.step + 1)
        return new_state, {"loss": loss}

    return step


# ---------------------------------------------------------------------------
# Tacotron
# ---------------------------------------------------------------------------

def make_tacotron_train_step(model, tx):
    """mel L1 + linear L1 + ref-consistency L1, Noam lr + clip handled by tx;
    loss-explosion guard mirrors `gst_tacotron/train.py:100-102` host-side."""

    @jax.jit
    def step(state, batch, rng):
        inputs, input_lengths, mel_targets, linear_targets = batch

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                inputs, input_lengths, mel_targets, train=True,
                rngs=_split_rngs(rng, ["prenet", "zoneout", "dropout",
                                       "style"]),
                mutable=["batch_stats"])
            total, parts = tacotron_loss(out, mel_targets, linear_targets)
            return total, (parts, mut, out)

        (loss, (parts, mut, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            params=jax.tree.map(lambda p, u: p + u, state.params, updates),
            opt_state=opt_state, batch_stats=mut["batch_stats"],
            step=state.step + 1)
        return new_state, {"loss": loss, **parts,
                           "alignments": out["alignments"]}

    return step
