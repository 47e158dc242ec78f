"""Seed a fine-tune session from another session's checkpoint.

Copies ONE orbax step dir (+ root metadata) from a source session's weights
dir into a fresh session under a (possibly different) config dir, so the
training driver resumes from that step under the NEW config's schedules.
Used by the round-4 exposure-bias experiment: fine-tune the best (14k)
free-running AR checkpoint with scheduled sampling enabled.

The copy-resume mechanic (orbax discovers copied step dirs by scan) is
regression-tested in tests/test_checkpoint_finetune.py.
"""
import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import _bootstrap  # noqa: E402,F401 (repo-root import path)


def seed_session(src_weights: Path, step: int, dst_weights: Path) -> None:
    src_step = src_weights / str(step)
    if not src_step.is_dir():
        raise SystemExit(f"no checkpoint at {src_step}")
    dst_weights.mkdir(parents=True, exist_ok=True)
    dst_step = dst_weights / str(step)
    if dst_step.exists():
        print(f"{dst_step} already exists; leaving as-is")
    else:
        shutil.copytree(src_step, dst_step)
    meta = src_weights / "_CHECKPOINT_METADATA"
    if meta.exists() and not (dst_weights / "_CHECKPOINT_METADATA").exists():
        shutil.copy(meta, dst_weights)
    print(f"seeded {dst_weights} with step {step} from {src_weights}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src_weights", required=True,
                   help="source session weights dir "
                        "(e.g. .soak/checkpoints/.soak_curve20k/"
                        "autoregressive_weights)")
    p.add_argument("--step", type=int, required=True)
    p.add_argument("--dst_weights", required=True,
                   help="destination weights dir (the new session's)")
    a = p.parse_args()
    seed_session(Path(a.src_weights), a.step, Path(a.dst_weights))


if __name__ == "__main__":
    main()
