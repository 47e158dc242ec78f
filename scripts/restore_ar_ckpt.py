"""Restore the committed fp16 params export into a real orbax checkpoint.

`artifacts/soak/ar_best_14k_params_fp16.npz` preserves the round-3 training
soak's best (14k-step) AR parameters as a flat
``{jax.tree_util.keystr(path): fp16 array}`` dict so the trained model
outlives the gitignored `.soak/` workspace (artifacts/soak/README.md). This
script inverts that export: it rebuilds the model's parameter pytree from a
config dir, overwrites every leaf from the npz (cast back to the leaf's
dtype), and writes a canonical orbax checkpoint
(``{params, opt_state, batch_stats, step}``, etts/utils/checkpoints.py) into
a session weights dir so every inference consumer (eval_soak, make_gta,
synthesize_sentences*) can load it via ``--checkpoint``.

`--model_kind wavernn` (etc.) restores any export_params_npz.py artifact —
e.g. `artifacts/soak/voc_gta26k_params_fp16.npz` into a `vocsoak` session.

The opt_state is a FRESH optimizer init (the export holds no Adam moments);
a fine-tune resumed from a restored checkpoint re-warms its optimizer, which
must be disclosed next to any resulting numbers. Contingency tooling for
host wipes — when the TPU is available, retraining the session
(scripts/tpu_queue_round4.sh `curve20k`) is preferred.
"""
import argparse
from pathlib import Path

import _bootstrap  # noqa: F401

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--npz", default="artifacts/soak/ar_best_14k_params_fp16.npz")
    p.add_argument("--config", required=True, help="config dir (e.g. .soak)")
    p.add_argument("--model_kind", default="autoregressive",
                   help="model kind the npz was exported from "
                        "(autoregressive | wavernn | ...)")
    p.add_argument("--session_name", required=True, help="e.g. curve20k")
    p.add_argument("--step", type=int, default=14000)
    a = p.parse_args()

    import jax
    from etts.train import TrainState, make_optimizer
    from etts.utils.checkpoints import CheckpointManager
    from etts.utils.config import ConfigManager, _init_variables

    cm = ConfigManager(a.config, a.model_kind, a.session_name)
    model = cm.get_model()
    variables = _init_variables(model, cm.config, a.model_kind)

    flat = dict(np.load(a.npz))
    # export_params_npz.py prefixes running batch statistics with
    # "batch_stats:"; split them out so the params walk below only sees
    # parameter keys (GRU/attention models export none of these).
    bstats_flat = {k[len("batch_stats:"):]: v for k, v in flat.items()
                   if k.startswith("batch_stats:")}
    flat = {k: v for k, v in flat.items()
            if not k.startswith("batch_stats:")}
    used = set()

    def _restore_leaf(path, leaf):
        key = jax.tree_util.keystr(path)
        if key not in flat:
            raise SystemExit(f"npz is missing parameter {key} "
                             f"(model/config mismatch?)")
        arr = flat[key]
        if arr.shape != leaf.shape:
            raise SystemExit(f"shape mismatch at {key}: npz {arr.shape} "
                             f"vs model {leaf.shape}")
        used.add(key)
        return arr.astype(leaf.dtype)

    params = jax.tree_util.tree_map_with_path(_restore_leaf,
                                              variables["params"])
    unused = sorted(set(flat) - used)
    if unused:
        raise SystemExit(f"npz holds {len(unused)} parameters the model "
                         f"does not: {unused[:5]} ...")

    batch_stats = variables.get("batch_stats", {})
    if bstats_flat:
        def _restore_bs(path, leaf):
            key = jax.tree_util.keystr(path)
            if key not in bstats_flat:
                raise SystemExit(f"npz is missing batch stat {key}")
            return bstats_flat[key].astype(leaf.dtype)
        batch_stats = jax.tree_util.tree_map_with_path(_restore_bs,
                                                       batch_stats)

    tx = make_optimizer(cm.config["learning_rate_tts_schedule"])
    state = TrainState.create({"params": params,
                               "batch_stats": batch_stats}, tx)
    state = state.replace(step=np.int32(a.step))
    ckpt = CheckpointManager(cm.weights_dir,
                             max_to_keep=cm.config.get("keep_n_weights"))
    ckpt.save_state(a.step, state)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"restored {n/1e6:.2f}M params from {a.npz} "
          f"-> {cm.weights_dir}/{a.step}")


if __name__ == "__main__":
    main()
