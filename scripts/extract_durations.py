"""Extract per-phoneme durations from a trained AR model's cross-attention.

Re-implements `TransformerTTS/extract_durations.py` (with its call-signature
bugs fixed — SURVEY §2.7): teacher-forced batches through the AR model at r=1,
last decoder block's cross-attention -> integer durations via
`etts.align.get_durations_from_alignment`, written as (mel, phonemes,
durations) npy triples for forward-model training.
"""
import argparse

import _bootstrap  # noqa: F401

import numpy as np
import jax
import tqdm

from etts.align import get_durations_from_alignment
from etts.data import Dataset, DataPrepper, load_files
from etts.train import TrainState, make_optimizer, make_autoregressive_val_step
from etts.utils import ConfigManager


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--session_name", type=str, default=None)
    parser.add_argument("--best", dest="best", action="store_true",
                        help="use best attention head instead of weighted avg")
    parser.add_argument("--binary", dest="binary", action="store_true")
    parser.add_argument("--fix_jumps", dest="fix_jumps", action="store_true")
    parser.add_argument("--fill_mode_max", dest="fill_mode_max",
                        action="store_true")
    parser.add_argument("--use_GT", action="store_true",
                        help="store ground-truth mels instead of predicted")
    parser.add_argument("--batch_size", type=int, default=16)
    args = parser.parse_args()
    fill_mode = "max" if args.fill_mode_max else "next"

    cm = ConfigManager(args.config, "autoregressive", args.session_name)
    config = cm.config
    model, variables, step, sched = cm.load_model()
    r = sched.get("reduction_factor", 1)
    assert r == 1, ("duration extraction requires a model trained to "
                    f"reduction factor 1, got r={r} "
                    "(extract_durations.py:110-111)")

    pipeline = cm.get_text_pipeline()
    prepper = DataPrepper(config, pipeline.tokenizer)
    tx = make_optimizer([[0, 1e-9]])
    state = TrainState.create(variables, tx)
    val_step = make_autoregressive_val_step(
        model, stop_scaling=config.get("stop_loss_scaling", 1.0))
    key = jax.random.PRNGKey(0)

    out_root = cm.train_datadir / "forward_data"
    for split, metafile in (("train", "train_metafile.txt"),
                            ("val", "test_metafile.txt")):
        out_dir = out_root / split
        out_dir.mkdir(parents=True, exist_ok=True)
        samples, _ = load_files(cm.train_datadir / metafile,
                                cm.train_datadir / "mels", None,
                                config.get("n_samples"))
        dataset = Dataset(samples, prepper, args.batch_size, shuffle=False,
                          drop_remainder=False,
                          mel_channels=config["mel_channels"])
        idx = 0
        for batch in tqdm.tqdm(dataset.all_batches(), desc=split):
            out = val_step(state, batch, key, r=1)
            # last decoder block's cross-attention (extract_durations.py:113-120)
            last_key = sorted(out["decoder_attention"].keys())[-1]
            attention = np.asarray(out["decoder_attention"][last_key])
            mel, phonemes, stop, spk = batch
            # masks/unpadding always come from the GT mel (reliable all-zero
            # padding); when --use_GT is off, store the model's teacher-forced
            # prediction instead (final_output[f] aligns with mel[1+f])
            predicted = np.asarray(out["final_output"])
            durations, unpad_mels, unpad_phon, final_align = \
                get_durations_from_alignment(
                    attention, np.asarray(mel), np.asarray(phonemes),
                    weighted=not args.best, binary=args.binary,
                    fix_jumps=args.fix_jumps, fill_gaps=True,
                    fill_mode=fill_mode)
            for i in range(len(durations)):
                store_mel = unpad_mels[i]
                if not args.use_GT:
                    store_mel = predicted[i, :unpad_mels[i].shape[0], :]
                sample = np.array([store_mel, unpad_phon[i],
                                   durations[i]], dtype=object)
                np.save(out_dir / f"{split}_{idx}.npy", sample,
                        allow_pickle=True)
                idx += 1
        print(f"{split}: wrote {idx} triples to {out_dir}")


if __name__ == "__main__":
    main()
