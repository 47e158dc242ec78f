#!/bin/bash
# Round-4c TPU queue (session restart after the 2026-08-18 ~23:43 VM
# reboot wiped all untracked state AGAIN). Rebuilds the workspace, then
# runs the ROADMAP round-5 quality items that need no new code:
#
#   1. kernel bisection grid (ROADMAP #5) — info first, so the fix can be
#      developed while the rest trains
#   2. bootstrap + curve20k retrain (prerequisite for everything)
#   3. 20k-step WaveRNN soak + GTA fine-tune (ROADMAP #1: 5x the round-4
#      4k budget; gate = neural beats GL on STOI from the same mels)
#   4. bench records (also re-warms the wiped .jax_cache for the driver)
#
# Strictly serial: one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
mkdir -p artifacts/soak/r4

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
  tail -c 200K "/tmp/r4c_$name.log" > "artifacts/soak/r4/$name.log" 2>/dev/null
  for src in "$@"; do
    if [ -d "$src" ]; then
      find "$src" -maxdepth 2 \( -name '*.csv' -o -name '*.log' -o -name '*.json' \) \
        -exec cp {} "artifacts/soak/r4/" \; 2>/dev/null
    elif [ -f "$src" ]; then
      cp "$src" "artifacts/soak/r4/" 2>/dev/null
    fi
  done
  git add artifacts/soak >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "queue r4c: $name results" || true
}

run() {
  local name=$1; shift
  if [ -f "/tmp/r4c_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt $(date) ==="
    if timeout "${JOB_TIMEOUT:-3600}" "$@" >"/tmp/r4c_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r4c_${name}.ok"
      snap "$name" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r4c_$name.log"
    snap "${name}_failed"
    sleep 60
    until tcp_ok && probe; do sleep 60; done
  done
  echo "$name FAILED twice — continuing with next job"
  return 1
}
SNAP_EXTRA=()

# --- 1. kernel-fault bisection grid (ROADMAP r5 #5) ---
# subprocess-isolated per grid point; a crash marks the point and waits
# for backend recovery internally. 2h budget: each crash costs minutes
# of worker restart.
SNAP_EXTRA=(artifacts/soak/kernel_bisect.json)
JOB_TIMEOUT=7200 run bisect python scripts/bisect_wavernn_kernel.py

# --- 2. rebuild wiped state ---
run bootstrap    bash scripts/bootstrap_soak_r4.sh
run curve20k     python scripts/train_autoregressive.py --config .soak \
                   --session_name curve20k --max_steps 20000 --force

# --- 3. ROADMAP #1: vocoder at 5x the round-4 training budget ---
JOB_TIMEOUT=7200 run voc20k \
                 python scripts/train_wavernn.py --config .soak \
                   --data .soak/voc --session_name vocsoak --max_steps 20000
run make_gta     python scripts/make_gta.py --config .soak \
                   --session_name curve20k --voc_data .soak/voc \
                   --checkpoint .soak/checkpoints/.soak_curve20k/autoregressive_weights/14000
run voc_gta      python scripts/train_wavernn.py --config .soak \
                   --data .soak/voc --session_name vocsoak --gta --max_steps 26000
SNAP_EXTRA=(.soak/eval/e2e_voc20k)
run eval_e2e20k  python scripts/eval_soak.py --config .soak \
                   --session_name curve20k --out_dir .soak/eval/e2e_voc20k \
                   --checkpoint .soak/checkpoints/.soak_curve20k/autoregressive_weights/14000 \
                   --ctc_ckpt .soak/ctc_asr.npz --vocoder_session vocsoak \
                   --int8_gate --also_gl

# --- 4. bench records (re-warm .jax_cache for the driver) ---
run bench_main   python bench.py
run bench_serve  python bench.py --serve
run bench_curve  python bench.py --train_curve

echo "[queue] $(date) round-4c queue COMPLETE"
