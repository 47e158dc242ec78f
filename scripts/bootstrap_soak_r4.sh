#!/bin/bash
# Rebuild the gitignored .soak/ workspace from committed code after a host
# wipe (the round-4 VM reboot deleted all untracked state: corpus, dataset,
# CTC checkpoint, vocoder store, every orbax checkpoint). Everything here is
# deterministic (seeded) and CPU-only except the CTC trainer, which the
# serial TPU queue may run on-device. Idempotent: each stage is skipped when
# its output already exists, so the queue can re-run it after a failure.
#
# The AR checkpoints themselves are NOT restored here — the queue retrains
# the curve20k session (20k steps, ~30 min on the v5e) so every downstream
# consumer gets genuine orbax checkpoints with opt_state, matching how the
# round-3 evidence was produced (SOAK_NOTES.md "Checkpoint curve").
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

if [ ! -f .soak/metadata.csv ]; then
  echo "[bootstrap] synth corpus"
  python scripts/make_synth_corpus.py --out .soak
fi

# curve20k needs dense checkpoint retention (SOAK_NOTES: keep 40, save 2k)
python - <<'EOF'
import yaml
p = ".soak/autoregressive_config.yaml"
cfg = yaml.safe_load(open(p))
if cfg.get("keep_n_weights") != 40:
    cfg["keep_n_weights"] = 40
    yaml.safe_dump(cfg, open(p, "w"))
    print("[bootstrap] keep_n_weights -> 40")
EOF

if [ ! -f .soak/train_metafile.txt ]; then
  echo "[bootstrap] create_dataset (grapheme backend, as in round 3)"
  ETTS_FORCE_CPU=1 python scripts/create_dataset.py --config .soak \
    --njobs 4 --phonemizer_backend grapheme
fi

if [ ! -f .soak/ctc_asr.npz ]; then
  echo "[bootstrap] char-CTC transcriber (train split only)"
  python scripts/train_ctc_asr.py --metadata .soak/train_metafile.txt \
    --wav_dir .soak/wavs --out .soak/ctc_asr.npz
fi

if [ ! -d .soak/voc ] || [ -z "$(ls .soak/voc 2>/dev/null)" ]; then
  echo "[bootstrap] wavernn vocoder store"
  ETTS_FORCE_CPU=1 python scripts/preprocess_wavernn.py --config .soak \
    --wav_dir .soak/wavs --out_dir .soak/voc --njobs 4
fi

echo "[bootstrap] done"
