"""Score free-running synthesis from a trained soak checkpoint.

Post-soak evidence (VERDICT r2 #3): load the trained AR checkpoint through
the real inference API, synthesize every held-out test utterance free-running
(stop-enabled, speaker d-vector + GST reference from the ground-truth wav),
Griffin-Lim to waveform, and score against the ground truth with the full
`etts.evalsuite` metric bundle — including WER through the corpus-trained
char-CTC transcriber. Writes syn wavs + a CSV and prints a summary row.
"""
import argparse
import csv
from pathlib import Path

import _bootstrap  # noqa: F401

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--session_name", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--n_utts", type=int, default=10)
    parser.add_argument("--max_length", type=int, default=600)
    parser.add_argument("--ctc_ckpt", type=str, default=None,
                        help="char-CTC checkpoint for WER")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="restore this weights dir step path instead of "
                             "latest (e.g. .../autoregressive_weights/8000)")
    parser.add_argument("--vocoder_session", type=str, default=None,
                        help="vocode with this trained WaveRNN session "
                             "(same config dir) instead of Griffin-Lim")
    parser.add_argument("--voc_config", type=str, default=None,
                        help="config dir for the vocoder session when its "
                             "architecture differs from --config (e.g. the "
                             "CPU-scale contingency vocoder)")
    parser.add_argument("--also_gl", action="store_true",
                        help="with --vocoder_session: additionally "
                             "Griffin-Lim every synthesized mel and score "
                             "it, so one run yields the neural-vs-GL "
                             "comparison from the SAME mels (VERDICT r3 "
                             "missing #1 'done' criterion)")
    parser.add_argument("--voc_scan", action="store_true",
                        help="force the lax.scan vocoder sample loop (the "
                        "fused kernel's fallback) — the neural-vs-GL gate "
                        "does not depend on WHICH loop runs the same model, "
                        "and the kernel's long-mel worker fault must not "
                        "hold the quality measurement hostage")
    parser.add_argument("--model_kind", type=str, default="autoregressive",
                        choices=["autoregressive", "forward"])
    parser.add_argument("--attn_stop_patience", type=int, default=None,
                        help="decode-time runaway guard: stop after N steps "
                        "of cross-attention focus on the final token "
                        "(ROADMAP r5 #3)")
    parser.add_argument("--frames_per_token", type=float, default=None,
                        help="decode-time runaway guard: cap output at F "
                        "frames per real input token")
    parser.add_argument("--int8_gate", action="store_true",
                        help="PERCEPTUAL int8 acceptance gate (VERDICT r3 "
                             "do #6): vocode each mel twice (f32 and int8 "
                             "weight streaming) and gate on the quality "
                             "delta vs GT (mean dSTOI <= 0.01, dMCD <= 1.0) "
                             "instead of raw sample-agreement rates. "
                             "Requires --vocoder_session; int8 streaming "
                             "exists only on the TPU Pallas path")
    parser.add_argument("--decode_out", type=str, default=None,
                        help="two-phase mode, phase A: run the TTS decode "
                             "(and Griffin-Lim scoring) WITHOUT a vocoder, "
                             "saving every synthesized mel (and the first 3 "
                             "ground-truth mels for the ceiling row) as .npy "
                             "into this dir for a later vocoder-only process. "
                             "Round-5 forensics (artifacts/soak/"
                             "voc_fault_matrix.json) proved the long-mel "
                             "worker fault needs the TTS model CO-RESIDENT "
                             "with the vocoder: the identical mel vocodes "
                             "fine in a fresh process, so the gate runs "
                             "decode and vocode in separate processes")
    parser.add_argument("--mels_in", type=str, default=None,
                        help="two-phase mode, phase B: skip the TTS model "
                             "entirely; load mels saved by --decode_out and "
                             "vocode + score them (requires "
                             "--vocoder_session)")
    parser.add_argument("--gl_scores", type=str, default=None,
                        help="phase B: path to phase A's scores.csv; prints "
                             "the neural-vs-GL comparison table from it")
    args = parser.parse_args()
    if args.decode_out and (args.mels_in or args.vocoder_session):
        raise SystemExit("--decode_out is the vocoder-less decode phase")
    if args.mels_in and not args.vocoder_session:
        raise SystemExit("--mels_in requires --vocoder_session")
    # fail fast on flag-dependency misuse, before any model loading
    if args.int8_gate and not args.vocoder_session:
        raise SystemExit("--int8_gate requires --vocoder_session")
    if args.also_gl and not args.vocoder_session:
        raise SystemExit("--also_gl requires --vocoder_session")

    import json

    import jax
    from etts.data.audio_io import load_wav, save_wav
    from etts.evalsuite.metrics import compute_all_metrics

    out_dir = Path(args.out_dir)
    (out_dir / "syn").mkdir(parents=True, exist_ok=True)
    mels_dir = Path(args.mels_in) if args.mels_in else None
    decode_dir = Path(args.decode_out) if args.decode_out else None
    if decode_dir:
        decode_dir.mkdir(parents=True, exist_ok=True)
    manifest = {}

    tts = None
    if mels_dir is None:
        from etts.api import TTSSynthesizer
        tts = TTSSynthesizer(args.config, args.session_name,
                             checkpoint=args.checkpoint,
                             model_kind=args.model_kind)
        config = tts.config
        print(f"restored checkpoint step {tts.step}")
    else:
        # phase B: the TTS transformer must NOT enter this process (the
        # co-residency worker fault above); read the config only
        from etts.utils.config import ConfigManager
        config = ConfigManager(args.config, args.model_kind,
                               args.session_name).config
        manifest = json.loads((mels_dir / "manifest.json").read_text())
    sr = config["sampling_rate"]
    # corpus files live where the config's data_directory points (the config
    # dir itself when unset) -- a config dir may hold only the yamls
    cfg_dir = Path(config.get("data_directory") or args.config)

    vocoder = None
    if args.vocoder_session:
        from etts.api import VocoderSynthesizer
        vocoder = VocoderSynthesizer(args.voc_config or args.config,
                                     args.vocoder_session)

    def to_wav(mel_t80, key):
        """TTS mel (t, 80) in [-4, 4] -> waveform (trained WaveRNN when
        given, else Griffin-Lim), via the (mel+4)/8 store contract."""
        if vocoder is not None:
            return np.asarray(vocoder.generate(
                (mel_t80 + 4.0) / 8.0, key=key,
                use_pallas=False if args.voc_scan else None))
        return np.asarray(tts.audio.reconstruct_waveform(mel_t80.T,
                                                         n_iter=32))

    # held-out utterances: id|text|phonemes
    rows = []
    with open(cfg_dir / "test_metafile.txt", encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) >= 2:
                rows.append((parts[0], parts[1]))
    rows = rows[:args.n_utts]
    if not rows:
        raise SystemExit(f"no held-out 'id|text' rows in "
                         f"{cfg_dir / 'test_metafile.txt'} (or --n_utts 0)")

    transcriber = None
    if args.ctc_ckpt:
        from etts.evalsuite.ctc_asr import CTCTranscriber
        from etts.evalsuite.wer import wer
        transcriber = CTCTranscriber(args.ctc_ckpt)

    def gl_wav(mel_t80):
        return np.asarray(tts.audio.reconstruct_waveform(mel_t80.T,
                                                         n_iter=32))

    if args.also_gl and mels_dir is not None:
        raise SystemExit("phase B has no Griffin-Lim (the TTS audio stack "
                         "stays out of the vocoder process); pass phase A's "
                         "scores.csv via --gl_scores instead")

    int8_deltas = []
    results = []
    gl_results = []
    for i, (uid, text) in enumerate(rows):
        gt_path = cfg_dir / "wavs" / f"{uid}.wav"
        gt, _ = load_wav(str(gt_path), sr)
        if mels_dir is not None:
            mel = np.load(mels_dir / f"{uid}.npy")
            gt_frames = int(manifest[uid]["gt_frames"])
        else:
            ref_mel = tts.mel_from_wav(gt)
            gt_frames = ref_mel.shape[0]
            spk = None
            spk_path = cfg_dir / "spk_embeds" / f"{uid}.npy"
            if getattr(tts.model, "has_speaker", False) and spk_path.exists():
                spk = np.load(spk_path)
            out = tts.predict(text, ref_mel=ref_mel, spk_embed=spk,
                              max_length=args.max_length,
                              key=jax.random.PRNGKey(i),
                              attn_stop_patience=args.attn_stop_patience,
                              max_frames_per_token=args.frames_per_token)
            mel = np.asarray(out["mel"])
            if decode_dir is not None:
                np.save(decode_dir / f"{uid}.npy", mel)
                manifest[uid] = {"gt_frames": gt_frames, "text": text}
        # crash-resume: reuse a wav vocoded by an earlier (possibly
        # worker-faulted) run of this script or by scripts/vocode_dir.py
        # into the mels dir; skip utts vocode_dir marked as crashers
        def _existing(name):
            for d in ([out_dir / "syn"] + ([mels_dir] if mels_dir else [])):
                if (d / name).exists():
                    return np.asarray(load_wav(str(d / name), sr)[0])
            return None

        if mels_dir is not None and (mels_dir / f"{uid}.crashed").exists():
            print(f"{uid}: SKIPPED (crash marker from vocode_dir)",
                  flush=True)
            continue
        # an int8-only crash degrades that utt to f32 scoring (the int8
        # kernel path has no scan fallback) instead of dropping it
        int8_ok = not (mels_dir is not None
                       and (mels_dir / f"{uid}_int8.crashed").exists())
        syn_path = out_dir / "syn" / f"{uid}.wav"
        wav = _existing(f"{uid}.wav") if mels_dir is not None else None
        if wav is None:
            wav = to_wav(mel, jax.random.PRNGKey(1000 + i))
            save_wav(wav, str(syn_path), sr)
        elif not syn_path.exists():
            save_wav(wav, str(syn_path), sr)
        if args.int8_gate and vocoder is not None and int8_ok:
            wav8 = _existing(f"{uid}_int8.wav")
            if wav8 is None:
                wav8 = np.asarray(vocoder.generate(
                    (mel + 4.0) / 8.0, key=jax.random.PRNGKey(1000 + i),
                    int8_weights=True,
                    use_pallas=False if args.voc_scan else None))
                save_wav(wav8, str(out_dir / "syn" / f"{uid}_int8.wav"), sr)
            m8 = compute_all_metrics(np.asarray(gt), wav8, sr)
            m_f32 = compute_all_metrics(np.asarray(gt), wav, sr)
            int8_deltas.append((m_f32["STOI"] - m8["STOI"],
                                m8["MCD"] - m_f32["MCD"]))
        if args.also_gl:
            wgl = gl_wav(mel)
            mg = compute_all_metrics(np.asarray(gt), wgl, sr)
            if transcriber is not None:
                mg["WER_syn"] = wer(text, transcriber.transcribe_wav(wgl, sr))
            gl_results.append(mg)
            save_wav(wgl, str(out_dir / "syn" / f"{uid}_gl.wav"), sr)
        m = compute_all_metrics(np.asarray(gt), wav, sr)
        m["file"] = uid
        m["mel_frames"] = mel.shape[0]
        m["gt_frames"] = gt_frames
        if transcriber is not None:
            hyp = transcriber.transcribe_wav(wav, sr)
            m["WER_syn"] = wer(text, hyp)
            m["WER_ori"] = wer(text, transcriber.transcribe_wav(
                np.asarray(gt), sr))
            m["hyp"] = hyp
        results.append(m)
        print(f"{uid}: mel {mel.shape[0]}f (gt {gt_frames}f) "
              f"MCD {m['MCD']:.2f} STOI {m['STOI']:.3f}"
              + (f" WER {m['WER_syn']:.2f}" if transcriber else ""), flush=True)

    if decode_dir is not None:
        (decode_dir / "manifest.json").write_text(json.dumps(manifest))
        print(f"saved {len(manifest)} mels to {decode_dir}", flush=True)

    if args.gl_scores:
        with open(args.gl_scores, newline="") as f:
            for row in csv.DictReader(f):
                gl_results.append({k: float(v) for k, v in row.items()
                                   if v not in (None, "", "None")
                                   and k not in ("file", "hyp")})

    # context baselines: resynthesis of the GROUND-TRUTH mel through the
    # same waveform backend (acoustic-model-independent metric ceiling)
    # and white noise (floor)
    ceiling_name = "voc-of-GT" if vocoder is not None else "GL-of-GT"
    rng = np.random.default_rng(0)
    base, glgt = [], []
    for j, (uid, btext) in enumerate(rows[:3]):
        gt, _ = load_wav(str(cfg_dir / "wavs" / f"{uid}.wav"), sr)
        gt = np.asarray(gt)
        noise = rng.standard_normal(len(gt)).astype(np.float32) * 0.3
        base.append(compute_all_metrics(gt, noise, sr))
        gwav = None
        if mels_dir is not None:
            if (mels_dir / f"gt_{uid}.crashed").exists():
                continue
            gmel = np.load(mels_dir / f"gt_{uid}.npy")
            for d in (out_dir / "syn", mels_dir):
                if (d / f"gt_{uid}.wav").exists():
                    gwav = np.asarray(
                        load_wav(str(d / f"gt_{uid}.wav"), sr)[0])
                    break
        else:
            gmel = tts.mel_from_wav(gt)
            if decode_dir is not None:
                np.save(decode_dir / f"gt_{uid}.npy", np.asarray(gmel))
        if gwav is None:
            gwav = to_wav(gmel, jax.random.PRNGKey(2000 + j))
            if mels_dir is not None:
                save_wav(gwav, str(out_dir / "syn" / f"gt_{uid}.wav"), sr)
        gm = compute_all_metrics(gt, gwav, sr)
        if transcriber is not None:
            gm["WER_syn"] = wer(btext, transcriber.transcribe_wav(gwav, sr))
        glgt.append(gm)
    keys = ["MCD", "FD", "RMSE_F0", "STOI", "PESQ_proxy"]
    if transcriber is not None:
        keys += ["WER_syn", "WER_ori"]
    with open(out_dir / "scores.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["file", "mel_frames", "gt_frames"]
                           + keys + (["hyp"] if transcriber else []))
        w.writeheader()
        for m in results:
            w.writerow({k: m.get(k) for k in w.fieldnames})

    def agg(ms, k):
        vals = [m[k] for m in ms if m.get(k) is not None
                and np.isfinite(m[k])]
        return float(np.mean(vals)) if vals else float("nan")

    print(f"\n=== soak eval summary (mean over {len(results)} "
          f"held-out utts) ===")
    for k in keys:
        line = f"  {k:12s} syn {agg(results, k):8.3f}"
        if glgt and k in glgt[0]:
            line += f"   {ceiling_name} {agg(glgt, k):8.3f}"
        if base and k in base[0]:
            line += f"   noise {agg(base, k):8.3f}"
        print(line)
    if gl_results:
        print("\n=== neural vocoder vs Griffin-Lim (SAME synthesized mels) ===")
        for k in keys:
            if k in gl_results[0]:
                print(f"  {k:12s} neural {agg(results, k):8.3f}   "
                      f"GL {agg(gl_results, k):8.3f}")
    ratios = [m["mel_frames"] / m["gt_frames"] for m in results]
    if ratios:
        print(f"  length ratio syn/gt: mean {np.mean(ratios):.2f} "
              f"min {np.min(ratios):.2f} max {np.max(ratios):.2f}")

    if int8_deltas:
        d_stoi = float(np.mean([d[0] for d in int8_deltas]))
        d_mcd = float(np.mean([d[1] for d in int8_deltas]))
        ok = d_stoi <= 0.01 and d_mcd <= 1.0
        print(f"\n=== int8 perceptual gate (vs f32, same trained vocoder, "
              f"{len(int8_deltas)} utts) ===")
        print(f"  mean dSTOI (f32 - int8): {d_stoi:+.4f}  (gate <= 0.01)")
        print(f"  mean dMCD  (int8 - f32): {d_mcd:+.3f}  (gate <= 1.0)")
        print(f"INT8_GATE: {'PASS' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()
