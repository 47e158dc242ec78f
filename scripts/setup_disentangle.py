"""Build the entangled corpus + base/mine config dirs for the TPU
reference-scale disentanglement experiment."""
import subprocess
import sys
from pathlib import Path
import yaml

root = Path("/root/repo")
out = root / ".soak_ent"
if not (out / "metadata.csv").exists():
    subprocess.run([sys.executable, "scripts/make_synth_corpus.py", "--out",
                    str(out), "--n_utts", "240", "--entangle_style"],
                   cwd=root, check=True)
    subprocess.run([sys.executable, "scripts/create_dataset.py", "--config",
                    str(out), "--njobs", "8", "--phonemizer_backend",
                    "grapheme"], cwd=root, check=True)
d = yaml.safe_load(open(out / "data_config.yaml"))
a = yaml.safe_load(open(out / "autoregressive_config.yaml"))
a.update(dict(max_steps=10000, use_mine=False, mine_adversarial=False,
              metrics_sync_frequency=10,
              reduction_factor_schedule=[[0, 10], [2000, 5], [5000, 2]],
              decoder_prenet_dropout_schedule=[[0, 0.0], [5000, 0.0],
                                               [7000, 0.5]],
              weights_save_frequency=2000, keep_n_weights=6,
              prediction_start_step=10**9, audio_start_step=10**9))
for name, mine in (("base", False), ("mine", True)):
    cfg = root / f".soak_ent_{name}"
    cfg.mkdir(exist_ok=True)
    dd = dict(d)
    dd["log_directory"] = str(cfg / "checkpoints")
    yaml.safe_dump(dd, open(cfg / "data_config.yaml", "w"))
    aa = dict(a)
    if mine:
        aa.update(dict(use_mine=True, mine_adversarial=True,
                       mine_type="MINE", mine_weight_factor=0.5,
                       mine_sep_call=False))
    aa["log_directory"] = str(cfg / "checkpoints")
    yaml.safe_dump(aa, open(cfg / "autoregressive_config.yaml", "w"))
print("ent setup done")
