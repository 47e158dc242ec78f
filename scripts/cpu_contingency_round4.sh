#!/bin/bash
# Round-4 CPU contingency (axon tunnel outage, down since 2026-08-17 19:30
# UTC): produce trained-vocoder + fully-neural-E2E evidence (VERDICT r3
# missing #1) at CPU scale so the round has it even if the TPU never
# returns. Uses the reduced .soak_voccpu vocoder (rnn 256) at ~2.8 s/step
# on the 1-core host. Session name `cvoc` is disjoint from the TPU queue's
# `vocsoak`, so the two can never clobber each other; the TPU queue kills
# this script (pid file below) when the tunnel comes back so the host core
# goes to the TPU jobs' input pipelines.
cd /root/repo
export PYTHONUNBUFFERED=1 ETTS_FORCE_CPU=1
mkdir -p artifacts/soak/r4cpu
echo $$ > /tmp/cpu_contingency.pid

run() {
  local name=$1; shift
  if [ -f "/tmp/r4cpu_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  echo "=== $name $(date) ==="
  if nice -n 19 timeout 21600 "$@" >"/tmp/r4cpu_$name.log" 2>&1; then
    touch "/tmp/r4cpu_${name}.ok"
    echo "$name OK $(date)"
    return 0
  fi
  echo "$name FAILED; tail:"
  tail -5 "/tmp/r4cpu_$name.log"
  return 1
}

snap() {
  for n in "$@"; do
    tail -c 100K "/tmp/r4cpu_$n.log" > "artifacts/soak/r4cpu/$n.log" 2>/dev/null
  done
  find .soak/eval/e2e_voc_cpu -name '*.csv' -exec cp {} artifacts/soak/r4cpu/ \; 2>/dev/null
  git add artifacts/soak >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "r4 CPU contingency: vocoder soak + neural E2E results" || true
}

# 1. WaveRNN soak on GT mels (5k steps, ~4h)
run cvoc_soak python scripts/train_wavernn.py --config .soak_voccpu \
    --data .soak/voc --session_name cvoc --max_steps 5000 --force

# 2. GTA fine-tune from the 14k AR checkpoint's store (+1.5k steps, ~1.2h)
run cvoc_gta python scripts/train_wavernn.py --config .soak_voccpu \
    --data .soak/voc --session_name cvoc --gta --max_steps 6500

# 3. fully neural E2E: trained AR (14k) -> trained WaveRNN -> wav, scored
#    vs GT with WER; --also_gl gives the neural-vs-GL table from SAME mels
run cvoc_e2e python scripts/eval_soak.py --config .soak \
    --session_name curve20k \
    --checkpoint .soak/checkpoints/.soak_curve20k/autoregressive_weights/14000 \
    --ctc_ckpt .soak/ctc_asr.npz \
    --vocoder_session cvoc --voc_config .soak_voccpu --also_gl \
    --out_dir .soak/eval/e2e_voc_cpu --n_utts 6

snap cvoc_soak cvoc_gta cvoc_e2e
echo "[cpu-contingency] $(date) COMPLETE"
