"""Tacotron synthesis CLI (reference `gst_tacotron/eval.py` +
`synthesize_sentences.py` behavior): text (+optional reference wav) -> wav via
the linear-spectrogram Griffin-Lim head, with endpoint trimming and alignment
plot."""
import argparse
from pathlib import Path

import _bootstrap  # noqa: F401

import numpy as np

SENTENCES = [
    "Scientists at the CERN laboratory say they have discovered a new particle.",
    "There's a way to measure the acute emotional intelligence that has never gone out of style.",
    "President Trump met with other leaders at the Group of Twenty conference.",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--session_name", type=str, default=None)
    parser.add_argument("--sentences", type=str, nargs="*", default=None)
    parser.add_argument("--sentences_file", type=str, default=None,
                        help="id|text metafile: synthesize each row and name "
                        "the output <id>.wav so objective_measure.py can "
                        "pair it with the ground-truth wav (taco soak)")
    parser.add_argument("--reference_audio", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default="taco_out")
    parser.add_argument("--n_utts", type=int, default=10)
    args = parser.parse_args()

    from etts.api import TacotronSynthesizer
    from etts.data.audio_io import load_wav, save_wav
    from etts.data.taco_builders import taco_linear_and_mel, find_endpoint

    synth = TacotronSynthesizer(args.config, args.session_name)
    sr = synth.config["sampling_rate"]
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    ref_mel = None
    if args.reference_audio:
        y, _ = load_wav(args.reference_audio, sr)
        _, ref_mel = taco_linear_and_mel(y, synth.config)

    rows = [(f"eval_{i}", t)
            for i, t in enumerate(args.sentences or SENTENCES)]
    if args.sentences_file:
        rows = []
        with open(args.sentences_file, encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split("|")
                if len(parts) >= 2:
                    rows.append((parts[0], parts[1]))
        rows = rows[:args.n_utts]

    for i, (uid, text) in enumerate(rows):
        print(f"[{uid}] {text!r}")
        wav, alignment = synth.synthesize(text, reference_mel=ref_mel)
        wav = np.asarray(wav)[:find_endpoint(np.asarray(wav), sr)]
        save_wav(wav, out_dir / f"{uid}.wav", sr)
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.figure(figsize=(8, 4))
            plt.imshow(alignment.T, aspect="auto", origin="lower")
            plt.xlabel("decoder step")
            plt.ylabel("encoder step")
            plt.savefig(out_dir / f"{uid}_align.png", dpi=120)
            plt.close()
        except Exception:  # noqa: BLE001
            pass
    print(f"Wrote outputs to {out_dir}")


if __name__ == "__main__":
    main()
