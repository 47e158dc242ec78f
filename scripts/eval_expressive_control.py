"""Measure expressive control of a trained GST+speaker AR model.

The reference's E2E scripts exist to demonstrate style transfer — the same
sentence synthesized under sarcasm/commanding/question reference audio
(`/root/reference/synthesize_sentences.py:34-73`) and style x speaker
permutations (`train_autoregressive.py:286-335`) — but never MEASURE that
conditioning changes the output. This script does, on the synthetic corpus
whose prosody dimensions (pitch scale, tempo) stand in for those styles:

  1. style transfer: each held-out sentence is synthesized under three
     CONTROLLED reference prosodies (low/slow, neutral, high/fast carrier
     audio rendered with pinned (pitch_scale, tempo)); output mean voiced
     F0 must rank with the reference pitch and output duration with the
     reference tempo.
  2. speaker transfer: the same sentence + neutral style under each
     speaker's d-vector; outputs are classified by nearest GT mel-envelope
     centroid and must track the CONDITIONED speaker.

A measurement-validity sanity check first classifies ground-truth wavs and
measures the carrier references themselves (if the F0/timbre measures can't
resolve the corpus's own contrasts, the eval is void). Writes one CSV and
prints PASS/FAIL verdict lines; a style swap that does nothing FAILS.
"""
import argparse
import csv
from pathlib import Path

import _bootstrap  # noqa: F401

import numpy as np

# corpus renderer (same module the corpus was built with)
from make_synth_corpus import SPEAKERS, WORDS, render, SR as CORPUS_SR

# (pitch_scale, tempo, vib_depth, vib_rate) — corpus analogue of the
# reference's commanding / neutral / question reference audio
STYLES = {
    "low_slow": (0.90, 1.15, 0.00, 5.0),
    "neutral": (1.00, 1.00, 0.01, 5.0),
    "high_fast": (1.12, 0.85, 0.02, 5.0),
}
# carriers spanning the WIDE corpus range (make_synth_corpus.WIDE_RANGES),
# for models trained with --prosody_range wide (ROADMAP r5 #2)
STYLES_WIDE = {
    "low_slow": (0.78, 1.35, 0.00, 5.0),
    "neutral": (1.00, 1.00, 0.01, 5.0),
    "high_fast": (1.30, 0.70, 0.02, 5.0),
}
CARRIER = "do me ku ri na su"  # fixed mid-register carrier sentence


def mean_voiced_f0(wav, sr):
    from etts.evalsuite.metrics import f0_autocorr
    f0 = f0_autocorr(wav, sr, fmin=100.0, fmax=800.0)
    voiced = f0[f0 > 0]
    return float(voiced.mean()) if voiced.size else 0.0


def harmonic_profile(wav, sr, n_harm=4):
    """Pitch-invariant timbre: mean normalized amplitudes of harmonics
    1..n_harm relative to the frame's F0. This is exactly the quantity the
    corpus's per-speaker timbre controls (make_synth_corpus.SPEAKERS), so
    nearest-profile classification is the corpus's native speaker ID.
    (Mel-envelope centroids only reach ~0.7 GT accuracy — the corpus's wide
    per-word pitch range confounds them.)"""
    from etts.evalsuite.metrics import f0_autocorr
    wav = np.asarray(wav)
    f0s = f0_autocorr(wav, sr, fmin=100.0, fmax=800.0)
    frame = int(sr * 0.040)
    hop = int(sr * 0.010)
    win = np.hanning(frame)
    freqs = np.fft.rfftfreq(frame, 1 / sr)
    profs = []
    for t, f0 in enumerate(f0s):
        if f0 <= 0:
            continue
        seg = wav[t * hop:t * hop + frame]
        if len(seg) < frame:
            break
        sp = np.abs(np.fft.rfft(seg * win))
        amps = []
        for k in range(1, n_harm + 1):
            idx = int(np.argmin(np.abs(freqs - k * f0)))
            amps.append(sp[max(0, idx - 2):idx + 3].max())
        amps = np.asarray(amps)
        if amps[0] > 1e-6:
            profs.append(amps / (np.linalg.norm(amps) + 1e-12))
    return (np.mean(profs, axis=0) if profs else np.zeros(n_harm))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--session_name", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--n_utts", type=int, default=6)
    p.add_argument("--max_length", type=int, default=600)
    p.add_argument("--styles", choices=["default", "wide"], default="default",
                   help="'wide' probes carriers spanning the wide-prosody "
                   "corpus range (for --prosody_range wide models)")
    a = p.parse_args()
    if a.styles == "wide":
        STYLES.clear()
        STYLES.update(STYLES_WIDE)

    import jax
    from etts.api import TTSSynthesizer
    from etts.data.audio_io import load_wav, save_wav

    out_dir = Path(a.out_dir)
    (out_dir / "syn").mkdir(parents=True, exist_ok=True)
    tts = TTSSynthesizer(a.config, a.session_name, checkpoint=a.checkpoint)
    sr = tts.config["sampling_rate"]
    assert sr == CORPUS_SR
    cfg_dir = Path(tts.config.get("data_directory") or a.config)
    print(f"restored checkpoint step {tts.step}")

    # ---- controlled style references ------------------------------------
    # per-speaker carriers: training refs are always matched-speaker, so a
    # cross-timbre carrier would be out of distribution for the GST encoder
    ref_wavs = {(s, spk): render(CARRIER, spk, np.random.default_rng(0),
                                 prosody=pros)
                for s, pros in STYLES.items() for spk in SPEAKERS}
    ref_mels = {k: tts.mel_from_wav(w) for k, w in ref_wavs.items()}
    ref_f0 = {s: mean_voiced_f0(ref_wavs[(s, "spk0")], sr) for s in STYLES}
    print("carrier reference mean F0:",
          {s: round(v, 1) for s, v in ref_f0.items()})
    assert ref_f0["high_fast"] > ref_f0["neutral"] > ref_f0["low_slow"], \
        "F0 measure cannot resolve the corpus's own pitch contrast (void)"

    # ---- speaker classifier (analytic harmonic profiles) + sanity --------
    refp = {s: np.asarray(v) / np.linalg.norm(v)
            for s, v in SPEAKERS.items()}
    spk_names = sorted(refp)

    def classify(wav):
        prof = harmonic_profile(wav, sr)
        sims = {s: float(np.dot(prof, r)) for s, r in refp.items()}
        return max(sims, key=sims.get), sims

    gt_files = sorted((cfg_dir / "wavs").glob("*.wav"))[:30]
    gt_acc = np.mean([classify(load_wav(str(f), sr)[0])[0]
                      == f.name.split("_")[0] for f in gt_files])
    print(f"GT speaker-classifier sanity accuracy: {gt_acc:.2f}")
    assert gt_acc > 0.9, "timbre classifier cannot separate GT speakers (void)"

    # held-out sentences + their own d-vectors
    rows = []
    with open(cfg_dir / "test_metafile.txt", encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) >= 2:
                rows.append((parts[0], parts[1]))
    rows = rows[:a.n_utts]
    dvecs = {s: np.load(sorted((cfg_dir / "spk_embeds").glob(f"{s}_*.npy"))[0])
             for s in spk_names}

    records = []
    # ---- 1. style transfer: same sentence under 3 reference prosodies ----
    for i, (uid, text) in enumerate(rows):
        own_spk = uid.split("_")[0]
        gst_by_style = {}
        for style in STYLES:
            out = tts.predict(text, ref_mel=ref_mels[(style, own_spk)],
                              spk_embed=dvecs[own_spk],
                              max_length=a.max_length,
                              key=jax.random.PRNGKey(i))
            mel = out["mel"]
            gst = out.get("gst_attention")
            if isinstance(gst, dict):  # {"gst_attention": (b, h, 1, tokens)}
                gst = next(iter(gst.values()))
            if gst is not None:
                gst_by_style[style] = np.asarray(gst).ravel()
            wav = np.asarray(tts.audio.reconstruct_waveform(mel.T, n_iter=32))
            save_wav(wav, str(out_dir / "syn" / f"{uid}_{style}.wav"), sr)
            records.append(dict(
                kind="style", uid=uid, text=text, style=style,
                cond_spk=own_spk, frames=mel.shape[0],
                out_f0=round(mean_voiced_f0(wav, sr), 2),
                ref_f0=round(ref_f0[style], 2)))
            print(f"{uid} [{style}]: {mel.shape[0]}f "
                  f"F0 {records[-1]['out_f0']:.0f}Hz")
        if len(gst_by_style) == len(STYLES):
            # diagnosis: do the three refs even produce distinct GST
            # embeddings? If not, the style bottleneck is saturated and no
            # downstream tracking is possible.
            lo, ne, hi = (gst_by_style[s] for s in
                          ("low_slow", "neutral", "high_fast"))
            d = (np.linalg.norm(lo - hi)
                 / (np.linalg.norm(ne) + 1e-9))
            print(f"  gst(low vs high) relative distance: {d:.4f}")

    # ---- 2. speaker transfer: neutral style, swapped d-vectors -----------
    for i, (uid, text) in enumerate(rows):
        for spk in spk_names:
            out = tts.predict(text, ref_mel=ref_mels[("neutral", spk)],
                              spk_embed=dvecs[spk],
                              max_length=a.max_length,
                              key=jax.random.PRNGKey(100 + i))
            mel = out["mel"]
            wav = np.asarray(tts.audio.reconstruct_waveform(mel.T, n_iter=32))
            save_wav(wav, str(out_dir / "syn" / f"{uid}_as_{spk}.wav"), sr)
            pred_spk, _ = classify(wav)
            records.append(dict(kind="speaker", uid=uid, text=text,
                                style="neutral", cond_spk=spk,
                                frames=mel.shape[0], pred_spk=pred_spk))
            print(f"{uid} [spk={spk}]: classified {pred_spk} "
                  f"{'OK' if pred_spk == spk else 'MISS'}")

    # ---- verdicts ---------------------------------------------------------
    sty = [r for r in records if r["kind"] == "style"]
    by_style = {s: [r for r in sty if r["style"] == s] for s in STYLES}
    mean_f0 = {s: float(np.mean([r["out_f0"] for r in by_style[s]
                                 if r["out_f0"]])) for s in STYLES}
    mean_frames = {s: float(np.mean([r["frames"] for r in by_style[s]]))
                   for s in STYLES}
    pitch_pass = (mean_f0["high_fast"] > mean_f0["neutral"] * 1.02
                  and mean_f0["neutral"] > mean_f0["low_slow"] * 1.02)
    tempo_pass = mean_frames["low_slow"] > mean_frames["high_fast"] * 1.05
    spkr = [r for r in records if r["kind"] == "speaker"]
    spk_acc = np.mean([r["pred_spk"] == r["cond_spk"] for r in spkr])
    spk_pass = spk_acc >= 2 / 3

    with open(out_dir / "expressive_control.csv", "w", newline="") as f:
        cols = ["kind", "uid", "text", "style", "cond_spk", "frames",
                "out_f0", "ref_f0", "pred_spk"]
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        for r in records:
            w.writerow({c: r.get(c, "") for c in cols})

    print("\n=== expressive control verdict ===")
    print(f"mean output F0 by style: "
          f"{ {s: round(v, 1) for s, v in mean_f0.items()} } "
          f"(ref: { {s: round(ref_f0[s], 1) for s in STYLES} })")
    print(f"mean output frames by style: "
          f"{ {s: round(v, 1) for s, v in mean_frames.items()} }")
    print(f"speaker-swap classification accuracy: {spk_acc:.2f} "
          f"(chance {1 / len(spk_names):.2f})")
    print(f"PITCH_TRACKING: {'PASS' if pitch_pass else 'FAIL'}")
    print(f"TEMPO_TRACKING: {'PASS' if tempo_pass else 'FAIL'}")
    print(f"SPEAKER_TRACKING: {'PASS' if spk_pass else 'FAIL'}")


if __name__ == "__main__":
    main()
