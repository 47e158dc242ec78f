"""WaveRNN vocoder training driver.

Re-implements `WaveRNN/train_wavernn.py`: dataset over mel/ + quant/ stores,
random-crop collate, CE (RAW) or MoL loss, periodic test-set generation +
checkpoints, CLI lr/batch/gta overrides.
"""
import argparse
import pickle
import random
from pathlib import Path

import _bootstrap  # noqa: F401

import numpy as np
import jax
import tqdm

from etts.data import (VocoderDataset, collate_vocoder,
                       fast_forward_permutation)
from etts.data.audio_io import save_wav
from etts.models.wavernn import generate
from etts.parallel import (make_mesh, shard_batch, replicate,
                           local_shard, add_multihost_args,
                           maybe_init_multihost)
from etts.train import TrainState, make_optimizer, make_wavernn_train_step
from etts.utils import ConfigManager, CheckpointManager
from etts.utils.logging import SummaryManager


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--data", type=str, required=True,
                        help="dir with mel/ quant/ dataset.pkl")
    parser.add_argument("--session_name", type=str, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--gta", action="store_true",
                        help="train on GTA mels (gta/ subdir)")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--force", action="store_true")
    add_multihost_args(parser)
    args = parser.parse_args()
    maybe_init_multihost(args)  # before any jax device use

    cm = ConfigManager(args.config, "wavernn", args.session_name)
    config = cm.config
    cm.create_remove_dirs(force=args.force)
    cm.dump_config()
    model = cm.get_model(ignore_hash=True)
    key = jax.random.PRNGKey(1234)

    with open(Path(args.data) / "dataset.pkl", "rb") as f:
        dataset_index = pickle.load(f)
    # drop utterances too short for a training window (collate needs
    # mel_win + 2*pad + margin frames)
    seq_hops = config.get("voc_seq_len_hops", 5)
    min_mel = seq_hops + 4 * config.get("voc_pad", 2) + 3
    ids = [x[0] for x in dataset_index if x[1] > min_mel]
    if args.gta:
        # the GTA store is metafile-driven (make_gta) and can be a strict
        # subset of the quant store (e.g. the dataset builder's split drops
        # an utterance); train only on ids that actually have GTA mels
        gta_dir = Path(args.data) / "gta"
        have = {p.stem for p in gta_dir.glob("*.npy")}
        missing = [i for i in ids if i not in have]
        if missing:
            print(f"gta: skipping {len(missing)} ids without GTA mels "
                  f"(e.g. {missing[0]})")
        ids = [i for i in ids if i in have]
    random.seed(1234)
    random.shuffle(ids)
    n_test = config.get("voc_test_samples", 50)
    test_ids, train_ids = ids[-n_test:], ids[:-n_test]
    train_set = VocoderDataset(train_ids, args.data, args.gta)
    test_set = VocoderDataset(test_ids, args.data, args.gta)

    batch_size = args.batch_size or config.get("voc_batch_size", 64)
    seq_len = config.get("voc_seq_len_hops", 5) * config["hop_length"]
    # separate generators: the permutation stream must be a pure function of
    # the epoch count so resume can replay it exactly; crop offsets are iid
    # draws that interleave per batch and need no replay
    perm_rng = np.random.default_rng(1234)
    crop_rng = np.random.default_rng(4321)

    def batches(skip_batches: int = 0):
        while True:
            order = perm_rng.permutation(len(train_set))
            start = skip_batches * batch_size
            skip_batches = 0
            for i in range(start, len(order) - batch_size + 1, batch_size):
                items = [train_set[j] for j in order[i:i + batch_size]]
                yield collate_vocoder(items, seq_len, config["hop_length"],
                                      config.get("voc_pad", 2),
                                      mode=model.mode,
                                      bits=config.get("bits", 9),
                                      rng=crop_rng)

    from etts.utils.config import _init_variables
    variables = _init_variables(model, config, "wavernn")
    lr = args.lr or float(np.array(config["learning_rate_tts_schedule"])[0, 1])
    tx = make_optimizer([[0, lr]])
    state = TrainState.create(variables, tx)
    ckpt = CheckpointManager(cm.weights_dir)
    state, rstep = ckpt.restore_state(state)
    if rstep is not None:
        print(f"restored vocoder weights at step {rstep}")

    step_fn = make_wavernn_train_step(model, tx)
    mesh = make_mesh(("data",)) if len(jax.devices()) > 1 else None
    if mesh is not None:
        state = replicate(state, mesh)

    summary = SummaryManager(model, cm.log_dir, config)
    max_steps = args.max_steps or config.get("voc_total_steps", 2_000_000)
    gen_every = config.get("voc_checkpoint_every", 25000)
    # resume continues the shuffled sample stream (skipped whole epochs
    # advance the dedicated permutation rng identically; crop offsets are
    # iid draws from their own generator, so their stream needn't replay)
    it = batches(fast_forward_permutation(perm_rng, len(train_set),
                                          batch_size, int(state.step)))
    t = tqdm.trange(int(state.step), max_steps, initial=int(state.step),
                    disable=jax.process_index() != 0,
                    total=max_steps)
    for step in t:
        b = next(it)
        if mesh is not None:
            b = shard_batch(local_shard(b), mesh)
        state, metrics = step_fn(state, b, jax.random.fold_in(key, step))
        # sync metrics every N steps only: float() is a host round trip that
        # would serialize every step against the device tunnel
        if step % int(config.get("metrics_sync_frequency", 10)) == 0 \
                or step + 1 == max_steps:
            loss_val = float(metrics["loss"])
            t.set_postfix(loss=loss_val)
            summary.add_scalar("train/loss", loss_val, step=step)
        if (step + 1) % gen_every == 0 or step + 1 == max_steps:
            ckpt.save_state(step + 1, state)
            # gen_testset (train_wavernn.py:54-57, gen_wavernn.py:10-34)
            variables_now = {"params": jax.device_get(state.params),
                             "batch_stats": jax.device_get(state.batch_stats)}
            for k in range(min(config.get("voc_gen_at_checkpoint", 5),
                               len(test_set))):
                mel, _ = test_set[k]
                wav = generate(model, variables_now, mel.T[None],
                               batched=config.get("voc_gen_batched", True),
                               target=config.get("voc_target", 11000),
                               overlap=config.get("voc_overlap", 550),
                               mu_law=config.get("mu_law", True),
                               # disjoint from the train stream; fold_in
                               # rejects negative ints (uint32 folds only)
                               key=jax.random.fold_in(
                                   jax.random.fold_in(key, 0x67656E), k))
                out = cm.log_dir / f"gen_{step + 1}_{k}.wav"
                save_wav(np.asarray(wav), out, config["sampling_rate"])
    print("Done.")


if __name__ == "__main__":
    main()
