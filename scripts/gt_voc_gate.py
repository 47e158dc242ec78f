"""Neural-vs-Griffin-Lim vocoder gate on GROUND-TRUTH mels (VERDICT r4 #2).

The two-process e2e gate (eval_soak --decode_out -> vocode_dir -> eval_soak
--mels_in --gl_scores) was host-wiped twice immediately before its scoring
phase could run (SOAK_NOTES "host wipe"). This is the minimal decisive arm
of the same gate, needing NO TTS decode: the VERDICT criterion compares the
trained WaveRNN against Griffin-Lim on the SAME ground-truth mels, both
scored against the ground-truth wav —

  per held-out utt:  mel = AudioProcessor.mel_spectrogram(gt_wav)
    neural = WaveRNN((mel+4)/8 store contract)   GL = reconstruct_waveform(mel)
    STOI / MCD / RMSE_F0 / PESQ_proxy of each vs gt_wav

Gate PASSES when mean STOI(neural) > mean STOI(GL) and the MCD direction
agrees. Runs vocoder-only (the long-mel worker fault needs the TTS
transformer co-resident — voc_fault_matrix.json); GT mels are short and
kernel-safe. Reference premise this measures: WaveRNN > Griffin-Lim
(`/root/reference/WaveRNN/README.md`; `synthesize_sentences.py:54-66`
vocodes neurally, never GL).
"""
import argparse
import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import _bootstrap  # noqa: E402,F401

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=".soak")
    p.add_argument("--voc_session", default="vocsoak")
    p.add_argument("--n_utts", type=int, default=8)
    p.add_argument("--out", default="artifacts/soak/r5/gt_voc_gate.csv")
    p.add_argument("--voc_scan", action="store_true",
                   help="force the lax.scan sample loop")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--wav_out", default=None,
                   help="also save the neural/GL wavs here")
    args = p.parse_args()

    import jax
    from etts.api import VocoderSynthesizer
    from etts.data.audio_io import load_wav, save_wav
    from etts.evalsuite.metrics import compute_all_metrics
    from etts.ops.audio import AudioProcessor

    cfg_dir = Path(args.config)
    voc = VocoderSynthesizer(args.config, args.voc_session)
    sr = voc.config["sampling_rate"]
    audio = AudioProcessor(voc.config)

    utts = []
    with open(cfg_dir / "test_metafile.txt", encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) >= 2:
                utts.append(parts[0])
            if len(utts) >= args.n_utts:
                break
    if not utts:
        raise SystemExit(f"no held-out rows in {cfg_dir}/test_metafile.txt")

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    wav_dir = Path(args.wav_out) if args.wav_out else None
    if wav_dir:
        wav_dir.mkdir(parents=True, exist_ok=True)

    keys = ["MCD", "FD", "RMSE_F0", "STOI", "PESQ_proxy"]
    rows, sums = [], {f"{a}_{k}": [] for a in ("voc", "gl") for k in keys}
    # incremental CSV: every scored utt survives a later worker fault
    with open(out_path, "w", newline="") as fcsv:
        w = csv.writer(fcsv)
        w.writerow(["utt", "frames"]
                   + [f"voc_{k}" for k in keys] + [f"gl_{k}" for k in keys])
        for i, uid in enumerate(utts):
            gt, _ = load_wav(str(cfg_dir / "wavs" / f"{uid}.wav"), sr)
            gt = np.asarray(gt)
            mel_t = np.asarray(audio.mel_spectrogram(gt)).T  # (t, n_mels)
            try:
                wav_voc = np.asarray(voc.generate(
                    (mel_t + 4.0) / 8.0, key=jax.random.PRNGKey(1000 + i),
                    int8_weights=args.int8 or None,
                    use_pallas=False if args.voc_scan else None))
            except Exception as e:  # a worker fault poisons the backend
                print(f"CRASHED on {uid} ({mel_t.shape[0]}f): "
                      f"{type(e).__name__}: {e}", flush=True)
                break
            wav_gl = np.asarray(audio.reconstruct_waveform(mel_t.T))
            if wav_dir:
                save_wav(wav_voc, str(wav_dir / f"{uid}_voc.wav"), sr)
                save_wav(wav_gl, str(wav_dir / f"{uid}_gl.wav"), sr)
            m_voc = compute_all_metrics(gt, wav_voc, sr)
            m_gl = compute_all_metrics(gt, wav_gl, sr)
            row = [uid, mel_t.shape[0]]
            for arm, m in (("voc", m_voc), ("gl", m_gl)):
                for k in keys:
                    row.append(round(float(m[k]), 4))
                    sums[f"{arm}_{k}"].append(float(m[k]))
            w.writerow(row)
            fcsv.flush()
            rows.append(row)
            print(f"[{i + 1}/{len(utts)}] {uid} ({mel_t.shape[0]}f) "
                  f"voc STOI {m_voc['STOI']:.3f} MCD {m_voc['MCD']:.1f} | "
                  f"gl STOI {m_gl['STOI']:.3f} MCD {m_gl['MCD']:.1f}",
                  flush=True)

    if not rows:
        raise SystemExit("no utterance scored")
    mean = {k: float(np.mean(v)) for k, v in sums.items() if v}
    print(f"\n=== GT-mel vocoder gate ({len(rows)} utts, "
          f"{'scan' if args.voc_scan else 'kernel'}"
          f"{', int8' if args.int8 else ''}) ===")
    print(f"{'metric':<12} {'neural':>9} {'GL-of-GT':>9}")
    for k in keys:
        print(f"{k:<12} {mean[f'voc_{k}']:>9.3f} {mean[f'gl_{k}']:>9.3f}")
    stoi_win = mean["voc_STOI"] > mean["gl_STOI"]
    mcd_win = mean["voc_MCD"] < mean["gl_MCD"]
    print(f"\nVOCODER_GATE: {'PASS' if stoi_win and mcd_win else 'FAIL'} "
          f"(STOI {'neural' if stoi_win else 'GL'} wins, "
          f"MCD {'neural' if mcd_win else 'GL'} wins)")


if __name__ == "__main__":
    main()
