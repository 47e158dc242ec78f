"""WaveRNN generation CLI (reference `WaveRNN/gen_wavernn.py` parity, with the
extra-argument bug at :34 fixed): vocode the held-out test set or a single mel
file, batched or unbatched."""
import argparse
import os
import pickle
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--session_name", type=str, default=None)
    parser.add_argument("--file", type=str, default=None,
                        help="single mel .npy ((n_mels, t) or (t, n_mels))")
    parser.add_argument("--data", type=str, default=None,
                        help="vocoder dataset dir for test-set generation")
    parser.add_argument("--samples", type=int, default=5)
    parser.add_argument("--batched", dest="batched", action="store_true")
    parser.add_argument("--unbatched", dest="batched", action="store_false")
    parser.set_defaults(batched=True)
    parser.add_argument("--target", type=int, default=None)
    parser.add_argument("--overlap", type=int, default=None)
    parser.add_argument("--out_dir", type=str, default="voc_out")
    args = parser.parse_args()

    from etts.utils.xla_cache import force_cpu_if_requested
    force_cpu_if_requested()
    from etts.api import VocoderSynthesizer
    from etts.data.audio_io import save_wav

    voc = VocoderSynthesizer(args.config, args.session_name)
    sr = voc.config["sampling_rate"]
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    n_mels = voc.model.feat_dims

    def vocode(mel, name):
        mel = np.asarray(mel, np.float32)
        # accept (n_mels, t) (the store layout) or (t, n_mels)
        if mel.shape[0] == n_mels and mel.shape[1] != n_mels:
            mel = mel.T
        elif mel.shape[1] != n_mels and mel.shape[0] < mel.shape[1]:
            mel = mel.T
        wav = voc.generate(mel, batched=args.batched, target=args.target,
                           overlap=args.overlap)
        batch_str = "batched" if args.batched else "unbatched"
        save_wav(wav, out_dir / f"{name}_{batch_str}.wav", sr)
        print(f"wrote {name}_{batch_str}.wav ({len(wav) / sr:.2f}s)")

    if args.file:
        vocode(np.load(args.file), Path(args.file).stem)
    elif args.data:
        with open(Path(args.data) / "dataset.pkl", "rb") as f:
            ids = [x[0] for x in pickle.load(f)][-args.samples:]
        for item_id in ids:
            mel = np.load(Path(args.data) / "mel" / f"{item_id}.npy")
            vocode(mel, item_id)
    else:
        parser.error("need --file or --data")


if __name__ == "__main__":
    main()
