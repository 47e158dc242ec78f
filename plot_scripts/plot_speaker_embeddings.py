"""t-SNE visualization of speaker-embedding npys
(reference `plot_scripts/plot_speaker_embeddings.py:10-45` parity; bioinfokit
scatter replaced with plain matplotlib)."""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--embed_dir", type=str, required=True,
                        help="dir of <speaker>_<utt>.npy d-vectors")
    parser.add_argument("--out", type=str, default="speaker_tsne.png")
    parser.add_argument("--perplexity", type=float, default=30.0)
    args = parser.parse_args()

    from sklearn.manifold import TSNE
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    files = sorted(Path(args.embed_dir).glob("*.npy"))
    embeds = np.stack([np.load(f).reshape(-1) for f in files])
    speakers = [f.stem.split("_")[0] for f in files]
    uniq = sorted(set(speakers))
    labels = np.array([uniq.index(s) for s in speakers])

    tsne = TSNE(n_components=2, perplexity=min(args.perplexity,
                                               max(2, len(files) - 1) / 3),
                random_state=42)
    pts = tsne.fit_transform(embeds)
    plt.figure(figsize=(8, 8))
    cmap = plt.get_cmap("tab20")
    for i, s in enumerate(uniq):
        m = labels == i
        plt.scatter(pts[m, 0], pts[m, 1], s=12, color=cmap(i % 20), label=s)
    if len(uniq) <= 20:
        plt.legend(fontsize=7)
    plt.title(f"t-SNE of {len(files)} speaker embeddings ({len(uniq)} speakers)")
    plt.savefig(args.out, dpi=150, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
