"""Set up the GTA free-run-matched fine-tune arm (VERDICT r4 #6).

Seeds a `.soak_gtaft` config dir + session from the free-running-best 14k
checkpoint; the queue then fine-tunes to 20k with `--gta_mel_dir` (decoder
inputs = the FROZEN 14k model's teacher-forced predictions, targets + style
reference stay ground truth — `etts/train/steps.py` ``gta_inputs``) and
scores checkpoints with eval_soak. Baseline to beat: WER_syn 0.794 /
length ratio 1.39 at 14k (artifacts/soak/eval_curve.csv). Unlike the
round-4 scheduled-sampling arms (all negative), the corrupted-input
distribution here is stationary and the style pathway stays clean.
"""
import argparse
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent))
import _bootstrap  # noqa: E402,F401
from setup_expbias import build_config_dir  # noqa: E402
from setup_finetune import seed_session  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--soak_dir", default=".soak")
    p.add_argument("--src_session", default=".soak_curve20k")
    p.add_argument("--seed_step", type=int, default=14000)
    a = p.parse_args()

    soak = Path(a.soak_dir).resolve()
    ckroot = Path(yaml.safe_load(
        (soak / "data_config.yaml").read_text())["log_directory"])
    if not ckroot.is_absolute():
        ckroot = soak.parent / ckroot

    gta_dir = soak.parent / (soak.name + "_gtaft")
    build_config_dir(soak, gta_dir, {
        "max_steps": 20000,
        "session_name": None,
    })
    seed_session(ckroot / a.src_session / "autoregressive_weights",
                 a.seed_step,
                 ckroot / f"{gta_dir.name}_ft" / "autoregressive_weights")
    print("\nqueue commands:")
    print(f"  python scripts/make_gta.py --config {a.soak_dir} "
          f"--session_name curve20k --tts_out {a.soak_dir}/gta_mels "
          f"--checkpoint <14k>")
    print(f"  python scripts/train_autoregressive.py --config {gta_dir} "
          f"--session_name ft --max_steps 20000 "
          f"--gta_mel_dir {a.soak_dir}/gta_mels")


if __name__ == "__main__":
    main()
