"""Offline TTS dataset builder CLI (reference `TransformerTTS/create_dataset.py`)."""
import argparse

import _bootstrap  # noqa: F401

import yaml
from pathlib import Path

from etts.data.builders import build_tts_dataset


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", dest="CONFIG", type=str, required=True)
    parser.add_argument("--dont_cache_phonemes", dest="CACHE_PHON",
                        action="store_false")
    parser.add_argument("--njobs", dest="NJOBS", type=int, default=16)
    parser.add_argument("--col_sep", dest="COLUMN_SEP", type=str, default="|")
    parser.add_argument("--recompute_phon", dest="RECOMPUTE_PHON",
                        action="store_true")
    parser.add_argument("--phonemizer_backend", type=str, default=None,
                        choices=[None, "espeak", "grapheme", "rule"])
    args = parser.parse_args()
    with open(Path(args.CONFIG) / "data_config.yaml") as f:
        config = yaml.safe_load(f)
    out = build_tts_dataset(config, cache_phonemes=args.CACHE_PHON,
                            recompute_phonemes=args.RECOMPUTE_PHON,
                            column_sep=args.COLUMN_SEP, njobs=args.NJOBS,
                            phonemizer_backend=args.phonemizer_backend)
    if args.phonemizer_backend:
        # record the backend so training/inference pipelines phonemize with
        # the same vocabulary the dataset was built with
        cfg_path = Path(args.CONFIG) / "data_config.yaml"
        with open(cfg_path) as f:
            dc = yaml.safe_load(f)
        if dc.get("phonemizer_backend") != args.phonemizer_backend:
            dc["phonemizer_backend"] = args.phonemizer_backend
            with open(cfg_path, "w") as f:
                yaml.safe_dump(dc, f)
    print(f"\nDone. Dataset written to {out}")


if __name__ == "__main__":
    main()
