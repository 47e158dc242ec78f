"""Forward (duration-based) TransformerTTS training driver.

Re-implements `TransformerTTS/train_forward.py:33-194`: npy-triple dataset from
extract_durations output, train/val steps, duration histograms, timed
predictions, orbax checkpoints.
"""
import argparse

import _bootstrap  # noqa: F401

import numpy as np
import jax
import tqdm

from etts.data import Dataset, ForwardDataPrepper
from etts.parallel import (make_mesh, shard_batch, replicate,
                           local_shard, add_multihost_args,
                           maybe_init_multihost)
from etts.train import (TrainState, make_optimizer, make_forward_train_step,
                        make_forward_val_step)
from etts.utils import ConfigManager, CheckpointManager
from etts.utils.logging import SummaryManager


def _filter_overlong(files, max_frames):
    """Drop triples whose mel exceeds ``max_frames`` (the Expand bucket).

    Frame counts live in a sidecar ``.frame_counts.json`` next to the data
    (mtime-validated), so only the first launch pays a full corpus read —
    the triples are pickled object arrays that cannot be header-peeked."""
    import json
    import os
    from pathlib import Path
    if not files:
        return files
    cache_path = Path(files[0]).parent / ".frame_counts.json"
    try:
        cache = json.loads(cache_path.read_text())
    except Exception:  # noqa: BLE001 — absent/corrupt cache: rebuild
        cache = {}
    keep, changed = [], False
    for f in files:
        name = Path(f).name
        mtime = os.stat(f).st_mtime_ns
        ent = cache.get(name)
        if ent is None or ent[0] != mtime:
            mel = np.load(str(f), allow_pickle=True)[0]
            ent = [mtime, int(mel.shape[0])]
            cache[name] = ent
            changed = True
        if ent[1] <= max_frames:
            keep.append(f)
    if changed:
        try:
            cache_path.write_text(json.dumps(cache))
        except OSError:
            pass
    return keep


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--session_name", type=str, default=None)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--force", action="store_true")
    add_multihost_args(parser)
    args = parser.parse_args()
    maybe_init_multihost(args)  # before any jax device use

    np.random.seed(42)
    cm = ConfigManager(args.config, "forward", args.session_name)
    config = cm.config
    cm.create_remove_dirs(force=args.force)
    cm.dump_config()

    model = cm.get_model(ignore_hash=True)
    key = jax.random.PRNGKey(42)
    max_frames = config.get("max_frames", 1280)

    train_files = sorted((cm.train_datadir / "forward_data" / "train").glob("*.npy"))
    val_files = sorted((cm.train_datadir / "forward_data" / "val").glob("*.npy"))
    # pre-filter over-length samples ONCE so the epoch structure is static
    # (Dataset.seek can then fast-forward on resume without replaying loads);
    # frame counts are cached in a sidecar so later launches skip the scan
    train_files = _filter_overlong(train_files, max_frames)
    val_files = _filter_overlong(val_files, max_frames)
    prepper = ForwardDataPrepper(max_frames=None)
    batch = config.get("tts_batch_size", 16)
    dataset = Dataset(train_files, prepper, batch,
                      mel_channels=config["mel_channels"],
                      pad_mel_multiple=max_frames)
    val_dataset = Dataset(val_files, prepper, batch, shuffle=False,
                          mel_channels=config["mel_channels"],
                          pad_mel_multiple=max_frames) if val_files else None

    from etts.utils.config import _init_variables
    variables = _init_variables(model, config, "forward")
    tx = make_optimizer(config["learning_rate_tts_schedule"])
    state = TrainState.create(variables, tx)
    ckpt = CheckpointManager(cm.weights_dir,
                             max_to_keep=config.get("keep_n_weights"),
                             keep_every_n_hours=config.get(
                                 "keep_checkpoint_every_n_hours"))
    state, rstep = ckpt.restore_state(state)
    if rstep is not None:
        print(f"restored weights at step {rstep}")
        dataset.seek(int(state.step))  # continue the stream, don't replay

    train_step = make_forward_train_step(model, tx, max_frames=max_frames)
    val_step = make_forward_val_step(model, max_frames=max_frames)
    mesh = make_mesh(("data",)) if len(jax.devices()) > 1 else None
    if mesh is not None:
        state = replicate(state, mesh)

    summary = SummaryManager(model, cm.log_dir, config)
    max_steps = args.max_steps or config["max_steps"]
    t = tqdm.trange(int(state.step), max_steps, initial=int(state.step),
                    disable=jax.process_index() != 0,
                    total=max_steps)
    for step in t:
        b = dataset.next_batch()
        if mesh is not None:
            b = shard_batch(local_shard(b), mesh)
        state, metrics = train_step(state, b, jax.random.fold_in(key, step))
        # sync metrics every N steps only (host round trip per float())
        if step % int(config.get("metrics_sync_frequency", 10)) == 0 \
                or step + 1 == max_steps:
            t.set_postfix(loss=float(metrics["loss"]))
            for k, v in metrics.items():
                summary.add_scalar(f"train/{k}", float(v), step=step)
        if (step + 1) % config.get("weights_save_frequency", 10000) == 0 \
                or step + 1 == max_steps:
            ckpt.save_state(step + 1, state)
        if val_dataset is not None and \
                (step + 1) % config.get("prediction_frequency", 10000) == 0:
            # disjoint rng stream from the train steps (fold_in rejects
            # negative ints: uint32 folds only)
            vm, out = val_step(state, val_dataset.next_batch(),
                               jax.random.fold_in(
                                   jax.random.fold_in(key, 0x76616C), step))
            summary.add_scalar("val/loss", float(vm["loss"]), step=step)
            summary.add_histogram("val/durations",
                                  np.asarray(out["duration"]), step=step)
    print("Done.")


if __name__ == "__main__":
    main()
