"""Generate ground-truth-aligned (GTA) mels for vocoder fine-tuning.

The reference's WaveRNN supports training on a `gta/` store
(`WaveRNN/utility/dataset.py:16-30`, `train_wavernn.py --gta`) but the repo
never shipped the generator. This script closes the loop: run the trained AR
model teacher-forced over the dataset and write its predicted mels (converted
to the vocoder's [0, 1] convention and (n_mels, t) layout) as
{voc_data}/gta/<id>.npy.
"""
import argparse
from pathlib import Path

import _bootstrap  # noqa: F401

import numpy as np
import jax
import tqdm

from etts.data import Dataset, DataPrepper, load_files
from etts.train import TrainState, make_optimizer, make_autoregressive_val_step
from etts.utils import ConfigManager


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--session_name", type=str, default=None)
    parser.add_argument("--voc_data", type=str, default=None,
                        help="vocoder dataset dir (gta/ is created inside)")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="checkpoint step dir (default: latest) — GTA "
                        "should use the BEST free-running checkpoint, not "
                        "the last (exposure bias, SOAK_NOTES.md)")
    parser.add_argument("--tts_out", type=str, default=None,
                        help="also write raw TTS-layout GTA mels ((t, n_mels)"
                        " in [-4, 4]) here — decoder inputs for the AR "
                        "free-run-matched fine-tune (GTADataPrepper)")
    args = parser.parse_args()

    cm = ConfigManager(args.config, "autoregressive", args.session_name)
    config = cm.config
    model, variables, step, sched = cm.load_model(
        checkpoint_path=args.checkpoint)
    r = sched.get("reduction_factor", 1)
    pipeline = cm.get_text_pipeline()
    prepper = DataPrepper(config, pipeline.tokenizer)
    tx = make_optimizer([[0, 1e-9]])
    state = TrainState.create(variables, tx)
    val_step = make_autoregressive_val_step(model)
    key = jax.random.PRNGKey(0)

    if not args.voc_data and not args.tts_out:
        raise SystemExit("nothing to write: pass --voc_data and/or --tts_out")
    gta_dir = None
    if args.voc_data:
        gta_dir = Path(args.voc_data) / "gta"
        gta_dir.mkdir(parents=True, exist_ok=True)
    tts_dir = None
    if args.tts_out:
        tts_dir = Path(args.tts_out)
        tts_dir.mkdir(parents=True, exist_ok=True)
    # speaker-conditioned models need their d-vectors teacher-forced too
    # (same contract as the training driver)
    spk_dir = (cm.train_datadir / "spk_embeds"
               if model.has_speaker else None)
    if spk_dir is not None and not spk_dir.exists():
        raise FileNotFoundError(
            f"system_type={config['system_type']!r} needs speaker embeddings "
            f"in {spk_dir}; none found")
    n = 0
    for split in ("train_metafile.txt", "test_metafile.txt"):
        samples, _ = load_files(cm.train_datadir / split,
                                cm.train_datadir / "mels", spk_dir)
        ids = [Path(s[2]).stem for s in samples]
        ds = Dataset(samples, prepper, args.batch_size, shuffle=False,
                     drop_remainder=False, mel_channels=config["mel_channels"])
        idx = 0
        for batch in tqdm.tqdm(ds.all_batches(), desc=split):
            out = val_step(state, batch, key, r=r)
            pred = np.asarray(out["final_output"])  # (b, t, mel) in [-4, 4]
            mel_in = np.asarray(batch[0])
            for b in range(pred.shape[0]):
                mel_len = int((np.abs(mel_in[b]).sum(-1) != 0).sum()) - 2
                raw = pred[b, :mel_len]  # (t, n_mels) in [-4, 4]
                if gta_dir is not None:
                    # vocoder store convention: (n_mels, t) in [0, 1]
                    np.save(gta_dir / f"{ids[idx]}.npy",
                            ((raw.T + 4.0) / 8.0).astype(np.float32))
                if tts_dir is not None:
                    np.save(tts_dir / f"{ids[idx]}.npy",
                            raw.astype(np.float32))
                idx += 1
                n += 1
    print(f"wrote {n} GTA mels to {gta_dir or ''} {tts_dir or ''}")


if __name__ == "__main__":
    main()
