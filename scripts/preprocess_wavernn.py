"""Offline WaveRNN preprocessing CLI.

Builds the vocoder training store (`mel/`, `quant/`, `dataset.pkl`) that
`train_wavernn.py --data` consumes, from a directory of wavs — the offline
step the reference's WaveRNN data layout assumes (`WaveRNN/utility/
dataset.py` loads exactly this store). IO fans out over --njobs threads.
"""
import argparse
from pathlib import Path

import _bootstrap  # noqa: F401

import yaml

from etts.data.builders import build_vocoder_dataset


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="config dir with data_config.yaml "
                             "(+ wavernn_config.yaml)")
    parser.add_argument("--wav_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--extension", type=str, default=".wav")
    parser.add_argument("--njobs", type=int, default=16)
    args = parser.parse_args()

    # plain two-YAML merge — no training-session keys needed for preprocessing
    cfg = {}
    for name in ("data_config.yaml", "wavernn_config.yaml"):
        p = Path(args.config) / name
        if p.exists():
            with open(p) as f:
                cfg.update(yaml.safe_load(f) or {})
    out = build_vocoder_dataset(
        args.wav_dir, args.out_dir, cfg,
        mode=cfg.get("voc_mode", "MOL"),
        bits=int(cfg.get("bits", 9)),
        mu_law=bool(cfg.get("mu_law", True)),
        peak_norm=bool(cfg.get("peak_norm", False)),
        extension=args.extension, njobs=args.njobs)
    print(f"vocoder dataset written to {out}")


if __name__ == "__main__":
    main()
