"""Train the tiny offline char-CTC transcriber (WER backend 3).

Reads a metadata.csv (``id|text``) + wav directory — the same corpus layout
``create_dataset.py`` consumes — trains `etts.evalsuite.ctc_asr.CTCAsrModel`
full-batch (small corpora) or in minibatches, and writes a flat ``.npz``
checkpoint that `objective_measure.py` / ``wer.transcribe`` pick up via
``ETTS_CTC_ASR=<ckpt>``. Smoke-level ASR for zero-egress environments; see
`etts/evalsuite/ctc_asr.py` for the honesty caveats.
"""
import argparse
from pathlib import Path

import _bootstrap  # noqa: F401

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--metadata", type=str, required=True,
                        help="metadata.csv with id|text lines")
    parser.add_argument("--wav_dir", type=str, required=True)
    parser.add_argument("--out", type=str, required=True,
                        help="output checkpoint (.npz)")
    parser.add_argument("--steps", type=int, default=600)
    parser.add_argument("--lr", type=float, default=3e-3)
    parser.add_argument("--n_mels", type=int, default=40)
    parser.add_argument("--hidden", type=int, default=96)
    parser.add_argument("--max_utts", type=int, default=0,
                        help="cap the corpus size (0 = all)")
    parser.add_argument("--log_every", type=int, default=50)
    args = parser.parse_args()

    from etts.data.audio_io import load_wav
    from etts.evalsuite.ctc_asr import train_ctc_asr, save_ckpt, greedy_decode
    from etts.evalsuite.wer import wer

    pairs, sr = [], None
    with open(args.metadata, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) < 2:
                continue
            wav_path = Path(args.wav_dir) / f"{parts[0]}.wav"
            if not wav_path.exists():
                continue
            wav, sr = load_wav(str(wav_path))
            pairs.append((np.asarray(wav), parts[1]))
            if args.max_utts and len(pairs) >= args.max_utts:
                break
    if not pairs:
        raise SystemExit("no (wav, text) pairs found")
    print(f"training char-CTC on {len(pairs)} utterances at {sr} Hz")
    model, params, loss = train_ctc_asr(
        pairs, sr, steps=args.steps, lr=args.lr, n_mels=args.n_mels,
        hidden=args.hidden, log_every=args.log_every)
    save_ckpt(args.out, params, sr, args.n_mels, args.hidden)
    print(f"final ctc loss {loss:.4f}; checkpoint -> {args.out}")

    # train-set WER smoke report (greedy decode)
    from etts.evalsuite.ctc_asr import CTCTranscriber
    tr = CTCTranscriber(args.out)
    ws = []
    for wav, text in pairs[:10]:
        hyp = tr.transcribe_wav(wav, sr)
        ws.append(wer(text, hyp))
    print(f"train-set WER (first {len(ws)}): {np.mean(ws):.3f}")


if __name__ == "__main__":
    main()
