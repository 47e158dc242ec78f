#!/bin/bash
# Round-5g wrap-up queue: runs after round-5f completes.
#   1. Forensics: phase-instrumented fault matrix on a 608-frame e2e mel —
#      the r5f isolation runs proved fresh single-mel processes fault at
#      THIS length while the matrix's 602f cells all passed, so the two
#      lengths must differ in live-fold geometry; the last PHASE_OK line
#      names the faulting program.
#   2. Guarded-decode e2e gate arm: the 5f e2e mels are all 608f runaways
#      (decode ran without the r4 runaway guards), which both trips the
#      fold-geometry fault and scores runaway content; this arm decodes
#      with --attn_stop_patience 3 --frames_per_token 12 (r4-measured
#      length ratio 1.27) giving kernel-safe mels and a meaningful
#      neural-vs-GL table.
#   3. One more pass of the 5f script — run() .ok markers skip successes,
#      so this retries only failed jobs (with the per-mel-isolated,
#      scan-fallback vocode_dir).
#   4. A final fresh bench record (re-warms .jax_cache for the driver's
#      end-of-round BENCH_r05 capture).
# Strictly serial; one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
export ETTS_VOC_SYNC=1
mkdir -p artifacts/soak/r5
echo $$ > /tmp/queue5g.pid

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
      cp "$src" "artifacts/soak/r5/" 2>/dev/null
    fi
  done
  git add artifacts/soak >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "queue r5g: $name results" || true
}
run() {
  local name=$1; shift
  if [ -f "/tmp/r5g_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in $(seq 1 "${RUN_ATTEMPTS:-2}"); do
    echo "=== $name attempt $attempt $(date) ==="
    if timeout "${JOB_TIMEOUT:-3600}" "$@" >"/tmp/r5g_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r5g_${name}.ok"
      snap "$name" "/tmp/r5g_$name.log" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r5g_$name.log"
    snap "${name}_failed" "/tmp/r5g_$name.log"
    sleep 60
    until tcp_ok && probe; do sleep 60; done
  done
  echo "$name FAILED twice — continuing with next job"
  SNAP_EXTRA=()
  return 1
}
SNAP_EXTRA=()

until [ -f /tmp/queue5f.done ]; do sleep 120; done
echo "[queue5g] $(date) 5f done"
until tcp_ok && probe; do sleep 60; done

CK14=.soak/checkpoints/.soak_curve20k/autoregressive_weights/14000

# --- 1. forensics at the faulting 608f geometry ---
SNAP_EXTRA=(artifacts/soak/voc_fault_matrix_608.json)
JOB_TIMEOUT=7200 \
run fault608    python scripts/voc_fault_matrix.py --config .soak \
                  --session_name vocsoak --dump .soak/trigger608.npz \
                  --out artifacts/soak/voc_fault_matrix_608.json \
                  --cells pallas:raw pallas:clamp pallas:short301 scan:raw

# --- 2. guarded-decode e2e gate arm ---
SNAP_EXTRA=(.soak/eval/e2e_gl5g)
JOB_TIMEOUT=7200 \
run e2eg_decode  python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/e2e_gl5g \
                  --checkpoint $CK14 --ctc_ckpt .soak/ctc_asr.npz \
                  --attn_stop_patience 3 --frames_per_token 12.0 \
                  --decode_out .soak/eval/e2e_mels5g
JOB_TIMEOUT=7200 \
run e2eg_prevoc  python scripts/vocode_dir.py --voc_config .soak \
                  --voc_session vocsoak --in_dir .soak/eval/e2e_mels5g \
                  --skip_existing
JOB_TIMEOUT=7200 \
run e2eg_prevoc8 python scripts/vocode_dir.py --voc_config .soak \
                  --voc_session vocsoak --in_dir .soak/eval/e2e_mels5g \
                  --skip_existing --int8 --suffix _int8
SNAP_EXTRA=(.soak/eval/e2e_voc5g)
JOB_TIMEOUT=7200 \
run e2eg_vocode  python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/e2e_voc5g \
                  --mels_in .soak/eval/e2e_mels5g \
                  --ctc_ckpt .soak/ctc_asr.npz --vocoder_session vocsoak \
                  --int8_gate --gl_scores .soak/eval/e2e_gl5g/scores.csv

# --- 3. retry pass over 5f failures ---
echo "[queue5g] $(date) retry pass over 5f"
bash /tmp/queue5f_run.sh >> /tmp/queue5f_retry.log 2>&1 || true

# --- 4. final bench record ---
echo "[queue5g] $(date) final bench"
if timeout 3600 python bench.py > /tmp/r5g_bench_final.log 2>&1; then
  tail -c 200K /tmp/r5g_bench_final.log > artifacts/soak/r5/bench_final.log
  git add artifacts/soak/r5/bench_final.log >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "queue r5g: final bench record" || true
fi
touch /tmp/queue5g.done
echo "[queue5g] $(date) COMPLETE"
