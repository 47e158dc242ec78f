"""Export a trained session's params to a committed fp16 npz artifact.

Generic inverse-of-`scripts/restore_ar_ckpt.py` for ANY model kind: loads
the latest (or a given) orbax checkpoint from a session's weights dir and
writes a flat ``{jax.tree_util.keystr(path): fp16 array}`` dict, the same
layout `artifacts/soak/ar_best_14k_params_fp16.npz` uses. The point is
durability: the round-4 host rebooted three times, wiping every gitignored
checkpoint each time — params exported through this script live in
`artifacts/` under git and can be rebuilt into a real orbax checkpoint via
restore_ar_ckpt.py (AR) or loaded directly by offline analysis.

fp16 halves the artifact size; for inference-quality weights that cast is
lossless in practice (the reference ships fp32 torch checkpoints,
/root/reference/WaveRNN/models/fatchord_version.py:385-408, but its
generation numerics survive fp16 rounding — and our int8 gate bounds far
coarser quantization).
"""
import argparse
from pathlib import Path

import _bootstrap  # noqa: F401

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True, help="config dir (e.g. .soak)")
    p.add_argument("--model_kind", default="wavernn")
    p.add_argument("--session_name", required=True)
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--out", required=True, help="output .npz path")
    a = p.parse_args()

    import jax
    from etts.utils.checkpoints import CheckpointManager
    from etts.utils.config import ConfigManager, _init_variables

    cm = ConfigManager(a.config, a.model_kind, a.session_name)
    model = cm.get_model()
    variables = _init_variables(model, cm.config, a.model_kind)

    ckpt = CheckpointManager(cm.weights_dir)
    tree = {"params": variables["params"]}
    if variables.get("batch_stats"):
        tree["batch_stats"] = variables["batch_stats"]
    restored, step = ckpt.restore(tree, step=a.step, partial=True)
    if step is None:
        # ADVICE r4: with no checkpoint on disk, restore() hands back the
        # freshly-initialized tree — exporting that would commit random
        # weights labeled as trained params. Fail loudly instead.
        raise SystemExit(f"no checkpoint found under {cm.weights_dir} — "
                         "refusing to export untrained init params")

    flat = {}
    def _collect(prefix):
        def f(path, leaf):
            flat[prefix + jax.tree_util.keystr(path)] = (
                np.asarray(leaf).astype(np.float16))
            return leaf
        return f
    jax.tree_util.tree_map_with_path(_collect(""), restored["params"])
    if restored.get("batch_stats"):
        # batch-norm models need their running statistics to round-trip
        # (ADVICE r4: init-time stats silently degrade inference)
        jax.tree_util.tree_map_with_path(_collect("batch_stats:"),
                                         restored["batch_stats"])

    out = Path(a.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, **flat)
    n = sum(v.size for v in flat.values())
    print(f"exported {n / 1e6:.2f}M params (step {step}) -> {out} "
          f"({out.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
