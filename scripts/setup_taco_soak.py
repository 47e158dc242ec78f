"""Build the GST-Tacotron soak workspace over the synthetic corpus.

VERDICT r4 weak #7: the Tacotron family (etts/models/tacotron.py) passes unit
and CLI-smoke tests but has zero trained evidence. This sets up the first
soak: a `.soak_taco` config dir whose data_directory reuses the existing
`.soak` synthetic corpus (wavs + metadata.csv are already ljspeech-layout)
and whose train_data_directory receives the taco linear+mel feature store
(`build_tacotron_dataset`, TF1-convention specs — `gst_tacotron/preprocess.py`
parity). The queue then runs `train_tacotron.py` and `eval_tacotron.py`
against it. Reference workflow: `/root/reference/gst_tacotron/train.py:46-123`.

    python scripts/setup_taco_soak.py [--corpus .soak] [--out .soak_taco]
"""
import argparse
from pathlib import Path

import _bootstrap  # noqa: F401

import yaml


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", default=".soak",
                   help="existing corpus dir (wavs/ + metadata.csv)")
    p.add_argument("--out", default=".soak_taco")
    p.add_argument("--njobs", type=int, default=8)
    p.add_argument("--max_out_frames", type=int, default=900)
    args = p.parse_args()

    root = Path.cwd()
    corpus = root / args.corpus
    out = root / args.out
    out.mkdir(exist_ok=True)
    train_dir = out / "train"

    base = yaml.safe_load(open(corpus / "data_config.yaml"))
    data_cfg = dict(base)
    data_cfg.update(
        data_directory=str(corpus),
        train_data_directory=str(train_dir),
        log_directory=str(out / "checkpoints"),
        session_name="tacosoak",
    )
    yaml.safe_dump(data_cfg, open(out / "data_config.yaml", "w"))

    taco = yaml.safe_load(open(root / "configs/default/tacotron_config.yaml"))
    # reference-scale model; shorten the GL polish + keep audio dumps cheap.
    # num_freq must match the corpus n_fft: n_fft//2 + 1.
    taco.update(num_freq=base["n_fft"] // 2 + 1, griffin_lim_iters=30,
                max_iters=400, batch_size=16,
                weights_save_frequency=2000, keep_n_weights=6)
    yaml.safe_dump(taco, open(out / "tacotron_config.yaml", "w"))

    merged = dict(data_cfg)
    merged.update(taco)
    if not (train_dir / "train.txt").exists():
        from etts.data.taco_builders import build_tacotron_dataset
        build_tacotron_dataset(merged, out_dir=train_dir,
                               dataset_format="ljspeech",
                               max_out_frames=args.max_out_frames,
                               njobs=args.njobs)
    n = sum(1 for _ in open(train_dir / "train.txt", encoding="utf-8"))
    print(f"taco soak workspace ready: {out} ({n} training rows)")


if __name__ == "__main__":
    main()
