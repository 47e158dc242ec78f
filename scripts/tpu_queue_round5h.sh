#!/bin/bash
# Round-5h recovery queue — the host was re-imaged mid-round-5 (third wipe of
# the build), deleting the gitignored .soak workspace, every orbax
# checkpoint, /tmp job state, and the XLA compile cache. The 5g wrap-up queue
# (gating on /tmp/queue5f.done) never ran.
#
# What survives in git: both flagship weight exports
# (artifacts/soak/ar_best_14k_params_fp16.npz — the 14k AR TTS model;
# artifacts/soak/voc_gta26k_params_fp16.npz — the 26k GTA-fine-tuned WaveRNN)
# plus all committed logs/score tables. This queue rebuilds the workspace
# deterministically and spends the remaining wall budget on the two
# highest-value open items from VERDICT.md r4:
#   #1 a warm .jax_cache + fresh green bench record (the driver captures
#      BENCH_r05 at round end — cold compiles are its biggest risk), and
#   #2 the guarded-decode neural-vs-GL vocoder gate (the 5g design: runaway
#      guards give kernel-safe mels AND meaningful content; two-process
#      decode/vocode per the co-residency fault verdict, SOAK_NOTES).
#
# Strictly serial; one TPU process at a time; one CPU core (CLAUDE.md).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
export ETTS_VOC_SYNC=1
mkdir -p artifacts/soak/r5
echo $$ > /tmp/queue5h.pid

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
  local name=$1 src_log=$2; shift 2
  tail -c 200K "$src_log" > "artifacts/soak/r5/$name.log" 2>/dev/null
  for src in "$@"; do
    if [ -d "$src" ]; then
      find "$src" -maxdepth 2 \( -name '*.csv' -o -name '*.log' -o -name '*.json' \) \
        -exec cp {} "artifacts/soak/r5/" \; 2>/dev/null
    elif [ -f "$src" ]; then
      case "$src" in
        *.npz) cp "$src" "artifacts/soak/" 2>/dev/null ;;
        *)     cp "$src" "artifacts/soak/r5/" 2>/dev/null ;;
      esac
    fi
  done
  git add artifacts/soak >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "queue r5h: $name results" || true
}
run() {
  local name=$1; shift
  if [ -f "/tmp/r5h_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in $(seq 1 "${RUN_ATTEMPTS:-2}"); do
    echo "=== $name attempt $attempt $(date) ==="
    if timeout "${JOB_TIMEOUT:-3600}" "$@" >"/tmp/r5h_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r5h_${name}.ok"
      snap "$name" "/tmp/r5h_$name.log" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r5h_$name.log"
    snap "${name}_failed" "/tmp/r5h_$name.log"
    sleep 60
    until tcp_ok && probe; do sleep 60; done
  done
  echo "$name FAILED twice — continuing with next job"
  SNAP_EXTRA=()
  return 1
}
SNAP_EXTRA=()

until tcp_ok && probe; do sleep 60; done

# --- 0. rebuild the wiped workspace (deterministic; CTC trains on-device) ---
JOB_TIMEOUT=7200 \
run bootstrap    bash scripts/bootstrap_soak_r4.sh
run restore_ar   env ETTS_FORCE_CPU=1 python scripts/restore_ar_ckpt.py \
                   --config .soak --session_name curve20k --step 14000
run restore_voc  env ETTS_FORCE_CPU=1 python scripts/restore_ar_ckpt.py \
                   --npz artifacts/soak/voc_gta26k_params_fp16.npz \
                   --model_kind wavernn --config .soak \
                   --session_name vocsoak --step 26000

# --- 1. warm the compile cache + fresh green bench record (VERDICT #1) ---
SNAP_EXTRA=()
JOB_TIMEOUT=5400 \
run bench_warm   python bench.py
cp /tmp/r5h_bench_warm.log artifacts/soak/r5/bench_r5h.log 2>/dev/null || true
git add artifacts/soak/r5/bench_r5h.log >/dev/null 2>&1
git diff --cached --quiet || git commit -q -m "queue r5h: post-wipe bench record (cache rewarmed)" || true

CK14=.soak/checkpoints/.soak_curve20k/autoregressive_weights/14000

# --- 2. guarded-decode neural-vs-GL gate (VERDICT #2, 5g design) ---
SNAP_EXTRA=(.soak/eval/e2e_gl5h)
JOB_TIMEOUT=7200 \
run e2eg_decode  python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/e2e_gl5h \
                  --checkpoint $CK14 --ctc_ckpt .soak/ctc_asr.npz \
                  --attn_stop_patience 3 --frames_per_token 12.0 \
                  --decode_out .soak/eval/e2e_mels5h
JOB_TIMEOUT=7200 RUN_ATTEMPTS=4 \
run e2eg_prevoc  python scripts/vocode_dir.py --voc_config .soak \
                  --voc_session vocsoak --in_dir .soak/eval/e2e_mels5h \
                  --skip_existing
JOB_TIMEOUT=7200 RUN_ATTEMPTS=3 \
run e2eg_prevoc8 python scripts/vocode_dir.py --voc_config .soak \
                  --voc_session vocsoak --in_dir .soak/eval/e2e_mels5h \
                  --skip_existing --int8 --suffix _int8
SNAP_EXTRA=(.soak/eval/e2e_voc5h)
JOB_TIMEOUT=7200 RUN_ATTEMPTS=3 \
run e2eg_vocode  python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/e2e_voc5h \
                  --mels_in .soak/eval/e2e_mels5h \
                  --ctc_ckpt .soak/ctc_asr.npz --vocoder_session vocsoak \
                  --int8_gate --gl_scores .soak/eval/e2e_gl5h/scores.csv

touch /tmp/queue5h.done
echo "[queue5h] $(date) COMPLETE"
