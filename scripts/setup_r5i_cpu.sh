#!/bin/bash
# Round-5i CPU-side workspace builds, run niced WHILE queue5h owns the TPU so
# the 5i TPU queue starts training the moment 5h finishes. Serial (the host
# has one CPU core; CLAUDE.md) and idempotent (each phase skips if its output
# exists). Rebuilds the post-wipe arms the 5f queue never got to run:
#   - .soak_gtaft  : GTA free-run-matched fine-tune seed     (VERDICT r4 #6)
#   - .soak_taco   : Tacotron linear+mel feature store        (VERDICT r4 #7)
#   - .soak_pros + .soak_pros_ps2 : wide-prosody corpus + the
#     prosody-stats + always-on-prenet-dropout pitch arm      (VERDICT r4 #4)
set -u
cd /root/repo
export PYTHONUNBUFFERED=1 ETTS_FORCE_CPU=1
LOG=/tmp/setup_r5i.log
exec >>"$LOG" 2>&1

echo "=== setup_r5i $(date) ==="

if [ ! -d .soak/checkpoints/.soak_gtaft_ft ]; then
  echo "--- setup_gtaft ---"
  nice -n 19 python scripts/setup_gtaft.py || echo "setup_gtaft FAILED"
fi

if [ ! -f .soak_taco/train/train.txt ]; then
  echo "--- setup_taco_soak ---"
  nice -n 19 python scripts/setup_taco_soak.py --corpus .soak \
    --out .soak_taco --njobs 2 || echo "setup_taco FAILED"
fi

if [ ! -f .soak_pros/metadata.csv ]; then
  echo "--- pros corpus ---"
  nice -n 19 python scripts/make_synth_corpus.py --out .soak_pros \
    --n_utts 420 --prosody_range wide || echo "pros corpus FAILED"
fi

if [ ! -f .soak_pros/train_metafile.txt ]; then
  echo "--- pros dataset ---"
  nice -n 19 python scripts/create_dataset.py --config .soak_pros --njobs 2 \
    --phonemizer_backend grapheme || echo "pros dataset FAILED"
fi

if [ ! -f .soak_pros_ps2/autoregressive_config.yaml ]; then
  echo "--- ps2 config (prosody stats + prenet dropout 0.5 from step 0) ---"
  mkdir -p .soak_pros_ps2
  cp .soak_pros/data_config.yaml .soak_pros_ps2/
  nice -n 19 python - <<'EOF'
import yaml
c = yaml.safe_load(open(".soak_pros/autoregressive_config.yaml"))
c["use_prosody_stats"] = True
c["prosody_embed_dim"] = 32
c["decoder_prenet_dropout_schedule"] = [[0, 0.5]]
c["weights_save_frequency"] = 2000   # deadline-truncated trains keep a tail
c["keep_n_weights"] = 10
yaml.safe_dump(c, open(".soak_pros_ps2/autoregressive_config.yaml", "w"))
print("wrote .soak_pros_ps2 config")
EOF
fi

touch /tmp/setup_r5i.done
echo "=== setup_r5i DONE $(date) ==="
