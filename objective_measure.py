"""Objective evaluation of synthesized speech vs original recordings.

Public entry-point parity with the reference `objective_measure.py`: per-pair
DTW-aligned metrics (MCD, Frame Disturbance, F0-RMSE, STOI, optional PESQ,
WER via optional ASR), cached original-side features, multiprocessing pool
fan-out (:321,344-346), per-model mean CSVs aggregated into tab-separated
`all_score*.log` files (:349-397). Metric implementations live in
`etts.evalsuite` (pure numpy; see its docstring for the pysptk/pyworld/pystoi
replacements).
"""
import argparse
import os
import sys
from functools import partial
from multiprocessing import Pool
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("ETTS_FORCE_CPU"):
    # metric workers never need the TPU; keep them off the (possibly
    # congested) device tunnel — must run before first jax device use
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def score_pair(pair, sr):
    from etts.evalsuite import compute_all_metrics, wer
    from etts.evalsuite.wer import transcribe
    from etts.data.audio_io import load_wav
    ref_path, syn_path, text = pair
    try:
        ref, _ = load_wav(ref_path, sr)
        syn, _ = load_wav(syn_path, sr)
        metrics = compute_all_metrics(ref, syn, sr)
        if text:
            hyp_syn = transcribe(syn_path)
            hyp_ref = transcribe(ref_path)
            metrics["WER_syn"] = wer(text, hyp_syn) if hyp_syn else None
            metrics["WER_ori"] = wer(text, hyp_ref) if hyp_ref else None
        metrics["file"] = Path(syn_path).name
        return metrics
    except Exception as e:  # bad-file fallback to zeros (:163-166)
        print(f"! failed on {syn_path}: {e}")
        return {"file": Path(syn_path).name, "MCD": 0.0, "FD": 0.0,
                "RMSE_F0": 0.0, "STOI": 0.0, "PESQ": None, "PESQ_proxy": None,
                "voiced_overlap": 0.0}


def find_pairs(ref_dir, syn_dir, texts):
    pairs = []
    for syn in sorted(Path(syn_dir).glob("*.wav")):
        ref = Path(ref_dir) / syn.name
        if not ref.exists():
            stem = syn.stem.split("__")[0]
            ref = Path(ref_dir) / f"{stem}.wav"
        if ref.exists():
            # regime outputs are named text__style__spk.wav; the WER text is
            # keyed by the text id
            text = texts.get(syn.stem) or texts.get(syn.stem.split("__")[0])
            pairs.append((str(ref), str(syn), text))
    return pairs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ref_dir", type=str, required=True,
                        help="original recordings")
    parser.add_argument("--syn_dirs", type=str, nargs="+", required=True,
                        help="one dir of synthesized wavs per model/regime")
    parser.add_argument("--texts", type=str, default=None,
                        help="metafile id|text for WER")
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--workers", type=int, default=min(30, os.cpu_count()))
    parser.add_argument("--out", type=str, default="all_score.log")
    args = parser.parse_args()

    texts = {}
    if args.texts:
        with open(args.texts, encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split("|")
                if len(parts) >= 2:
                    texts[parts[0]] = parts[1]

    metric_keys = ["MCD", "FD", "RMSE_F0", "STOI", "PESQ", "PESQ_proxy",
                   "WER_syn", "WER_ori"]
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)

    def _model_names(dirs):
        """Disambiguate generic leaf names (".../curve_14000/syn") so two
        models' per-file CSVs don't overwrite each other: colliding names
        absorb parent path levels until unique, with an index suffix as the
        last resort for identical paths."""
        parts = [[x for x in Path(d).parts if x != os.sep] for d in dirs]
        names = [p[-1] if p else "syn" for p in parts]
        depth = 1
        while len(set(names)) < len(names) and \
                depth < max(len(p) for p in parts):
            depth += 1
            dup = {n for n in names if names.count(n) > 1}
            names = ["_".join(p[-min(depth, len(p)):]) if n in dup else n
                     for p, n in zip(parts, names)]
        seen, out = {}, []
        for n in names:
            k = seen.get(n, 0)
            out.append(n if k == 0 else f"{n}_{k}")
            seen[n] = k + 1
        return out

    _names = dict(zip(args.syn_dirs, _model_names(args.syn_dirs)))

    def model_name_of(d):
        return _names[d]

    rows = []
    for syn_dir in args.syn_dirs:
        pairs = find_pairs(args.ref_dir, syn_dir, texts)
        if not pairs:
            print(f"! no ref/syn pairs found for {syn_dir}")
            continue
        print(f"{syn_dir}: scoring {len(pairs)} pairs with "
              f"{args.workers} workers")
        with Pool(args.workers) as pool:
            results = pool.map(partial(score_pair, sr=args.sr), pairs)
        # per-model per-file CSV, next to the aggregate log (the reference
        # wrote into the CWD; keep outputs where --out points)
        import csv
        model_name = model_name_of(syn_dir)
        csv_path = Path(args.out).parent / f"score_{model_name}.csv"
        with open(csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["file"] + metric_keys)
            writer.writeheader()
            for r in results:
                writer.writerow({k: r.get(k) for k in ["file"] + metric_keys})
        means = {}
        for k in metric_keys:
            vals = [r[k] for r in results
                    if r.get(k) is not None and np.isfinite(r[k])]
            means[k] = float(np.mean(vals)) if vals else float("nan")
        rows.append((model_name, means))
        print("  " + "  ".join(f"{k}={v:.4f}" for k, v in means.items()))

    with open(args.out, "w") as f:
        f.write("model\t" + "\t".join(metric_keys) + "\n")
        for name, means in rows:
            f.write(name + "\t"
                    + "\t".join(f"{means[k]:.6f}" for k in metric_keys) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
