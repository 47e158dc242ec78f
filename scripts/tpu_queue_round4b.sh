#!/bin/bash
# Round-4 phase-2 TPU queue: the SEEDED scheduled-sampling fine-tune evals
# (the phase-1 "ssft" arm trained from scratch because setup_expbias.py
# crashed before seeding — fixed; ft2 resumes from the 14k baseline ckpt)
# plus the regimes rerun with the B-padded WaveRNN kernel (the phase-1
# crash was an unaligned fold count, see etts/ops/pallas/wavernn_cell.py).
# Waits for the ft2 trainer to finish before touching the TPU.
cd /root/repo
export PYTHONUNBUFFERED=1
mkdir -p artifacts/soak/r4

# serialize behind the running ft2 trainer (one TPU process at a time)
if [ -f /tmp/r4_ssft2.pid ]; then
  while kill -0 "$(cat /tmp/r4_ssft2.pid)" 2>/dev/null; do sleep 20; done
fi

tcp_ok() {
  python -c "import socket;socket.create_connection(('127.0.0.1',8113),3).close()" 2>/dev/null
}
probe() {
  timeout 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jax.jit(lambda a: a + 1)(jnp.zeros(()))
x.block_until_ready()
print("TPU OK:", jax.devices())
EOF
}

snap() {
  local name=$1; shift
  tail -c 200K "/tmp/r4_$name.log" > "artifacts/soak/r4/$name.log" 2>/dev/null
  for src in "$@"; do
    if [ -d "$src" ]; then
      find "$src" -maxdepth 2 \( -name '*.csv' -o -name '*.log' -o -name '*.json' \) \
        -exec cp {} "artifacts/soak/r4/" \; 2>/dev/null
    elif [ -f "$src" ]; then
      cp "$src" "artifacts/soak/r4/" 2>/dev/null
    fi
  done
  git add artifacts/soak >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "queue r4b: $name results" || true
}

run() {
  local name=$1; shift
  if [ -f "/tmp/r4_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt $(date) ==="
    if timeout 3600 "$@" >"/tmp/r4_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r4_${name}.ok"
      snap "$name" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r4_$name.log"
    snap "${name}_failed"
    sleep 60
    until tcp_ok && probe; do sleep 60; done
  done
  echo "$name FAILED twice — continuing with next job"
  return 1
}
SNAP_EXTRA=()

# --- 1. seeded fine-tune evals (the REAL exposure-bias ssft arm) ---
for CK in 16000 18000 20000; do
  SNAP_EXTRA=(.soak/eval/ft2_$CK)
  run ft2_eval$CK python scripts/eval_soak.py --config .soak_ss \
                   --session_name ft2 --out_dir .soak/eval/ft2_$CK \
                   --checkpoint .soak/checkpoints/.soak_ss_ft2/autoregressive_weights/$CK \
                   --ctc_ckpt .soak/ctc_asr.npz
done

# --- 2. regimes rerun with the fold-count-padded kernel (VERDICT do #9) ---
SNAP_EXTRA=()
run regimes2     python synthesize_sentences_speaker.py --tts_config .soak \
                   --sessions curve20k \
                   --checkpoint .soak/checkpoints/.soak_curve20k/autoregressive_weights/14000 \
                   --test_sentences .soak/test_metafile.txt \
                   --combo_file .soak/eval/combos.txt \
                   --ref_audio_dir .soak/wavs --spk_embed_dir .soak/spk_embeds \
                   --regimes syn_norm rand text_rand style_rand \
                   --out_dir .soak/eval/regimes --max_length 600 \
                   --voc_config .soak --voc_session vocsoak
SNAP_EXTRA=(artifacts/soak/all_score_r4.log)
run regime_score2 env ETTS_CTC_ASR=.soak/ctc_asr.npz \
                   python objective_measure.py --ref_dir .soak/wavs \
                   --syn_dirs .soak/eval/regimes/curve20k/syn_norm \
                              .soak/eval/regimes/curve20k/rand \
                              .soak/eval/regimes/curve20k/text_rand \
                              .soak/eval/regimes/curve20k/style_rand \
                   --texts .soak/test_metafile.txt \
                   --out artifacts/soak/all_score_r4.log

echo "[queue] $(date) round-4b queue COMPLETE"
