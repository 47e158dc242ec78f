#!/bin/bash
# Round-5d TPU queue — staged behind round-5c:
#   1. eval_e2e20k_scan: the VERDICT #2 neural-vs-GL gate on the lax.scan
#      vocoder loop — the gate measures the trained MODEL, not the kernel,
#      so the kernel's long-mel worker fault must not block it. No
#      --int8_gate (int8 streaming exists only on the Pallas path).
#   2. bisect3: trained-weights kernel isolation at the crash geometry
#      (every prior bisect grid point used random weights).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
mkdir -p artifacts/soak/r5
echo $$ > /tmp/queue5d.pid

if [ -f /tmp/queue5c.pid ]; then
  while kill -0 "$(cat /tmp/queue5c.pid)" 2>/dev/null; do sleep 60; done
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
  git diff --cached --quiet || git commit -q -m "queue r5d: $name results" || true
}

run() {
  local name=$1; shift
  if [ -f "/tmp/r5d_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt $(date) ==="
    if timeout "${JOB_TIMEOUT:-3600}" "$@" >"/tmp/r5d_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r5d_${name}.ok"
      snap "$name" "/tmp/r5d_$name.log" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r5d_$name.log"
    snap "${name}_failed" "/tmp/r5d_$name.log"
    sleep 60
    until tcp_ok && probe; do sleep 60; done
  done
  echo "$name FAILED twice — continuing with next job"
  SNAP_EXTRA=()
  return 1
}
SNAP_EXTRA=()

until tcp_ok && probe; do sleep 60; done

CK14=.soak/checkpoints/.soak_curve20k/autoregressive_weights/14000

# --- 1. VERDICT #2 gate, scan vocoder loop (kernel-fault independent) ---
SNAP_EXTRA=(.soak/eval/e2e_voc20k_scan)
JOB_TIMEOUT=10800 \
run eval_e2e20k_scan python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/e2e_voc20k_scan \
                  --checkpoint $CK14 \
                  --ctc_ckpt .soak/ctc_asr.npz --vocoder_session vocsoak \
                  --voc_scan --also_gl

# --- 2. trained-weights kernel isolation ---
SNAP_EXTRA=(artifacts/soak/kernel_bisect3.json)
JOB_TIMEOUT=10800 \
run bisect3     python scripts/bisect_wavernn_kernel.py --phase3 \
                  --out artifacts/soak/kernel_bisect3.json

touch /tmp/queue5d.done
echo "[queue] $(date) round-5d queue COMPLETE"
