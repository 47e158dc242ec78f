#!/bin/bash
# Round-5j TPU queue — fourth host wipe, final-hour recovery.
#
# The wipe destroyed the freshly rebuilt 5h workspace (incl. the decoded +
# isolated-vocoded e2e mels5h wavs) BEFORE the e2eg_vocode scoring job could
# run — the second time the neural-vs-GL gate lost its inputs at the scoring
# step. With ~1h of wall left there is no budget for the full bootstrap +
# decode + per-mel vocode chain again, so this queue lands the minimal
# decisive arm instead:
#
#   1. (already running when this starts) bench.py re-warms .jax_cache for
#      the driver's end-of-round BENCH_r05 capture -> commit the record
#   2. corpus + dataset only (no CTC, no vocoder store — the gate needs
#      neither), restore the 26k GTA vocoder from the committed fp16 npz
#   3. scripts/gt_voc_gate.py: neural-vs-GL on GROUND-TRUTH mels
#      (VERDICT r4 #2's actual criterion; no TTS decode required)
#
# Strictly serial; one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
mkdir -p artifacts/soak/r5
echo $$ > /tmp/queue5j.pid
: "${DEADLINE_TS:?set DEADLINE_TS (epoch seconds)}"

left() { echo $(( DEADLINE_TS - $(date +%s) )); }
tcp_ok() {
  python -c "import socket;socket.create_connection(('127.0.0.1',8113),3).close()" 2>/dev/null
}
snap() {
  local name=$1 src_log=$2; shift 2
  tail -c 200K "$src_log" > "artifacts/soak/r5/$name.log" 2>/dev/null
  for src in "$@"; do
    [ -f "$src" ] && cp "$src" "artifacts/soak/r5/" 2>/dev/null
  done
  git add artifacts/soak >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "queue r5j: $name results" || true
}
run() {
  local name=$1; shift
  if [ -f "/tmp/r5j_${name}.ok" ]; then return 0; fi
  local budget; budget=$(left)
  if [ "$budget" -lt "${EST:-120}" ]; then
    echo "=== $name SKIPPED: ${budget}s left < EST ${EST:-120}s ==="
    return 1
  fi
  local tmo=${JOB_TIMEOUT:-1800}
  if [ "$tmo" -gt "$budget" ]; then tmo=$budget; fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt (timeout ${tmo}s, $(left)s left) $(date) ==="
    if timeout "$tmo" "$@" >"/tmp/r5j_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r5j_${name}.ok"
      snap "$name" "/tmp/r5j_$name.log" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r5j_$name.log"
    snap "${name}_failed" "/tmp/r5j_$name.log"
    [ "$(left)" -lt "${EST:-120}" ] && break
    sleep 30
    until tcp_ok; do sleep 30; done
  done
  SNAP_EXTRA=()
  return 1
}
SNAP_EXTRA=()

# --- 0. wait for the already-running bench warm (pid file), commit it ----
if [ -f /tmp/r5j_bench.pid ]; then
  while kill -0 "$(cat /tmp/r5j_bench.pid)" 2>/dev/null; do sleep 20; done
fi
if grep -q '"metric"' /tmp/r5j_bench_warm.log 2>/dev/null; then
  snap bench_warm /tmp/r5j_bench_warm.log
else
  snap bench_warm_failed /tmp/r5j_bench_warm.log
fi

# --- 1. minimal workspace: corpus + dataset + vocoder restore (CPU) ------
EST=300 JOB_TIMEOUT=900 \
run corpus     python scripts/make_synth_corpus.py --out .soak
EST=300 JOB_TIMEOUT=1200 \
run dataset    env ETTS_FORCE_CPU=1 python scripts/create_dataset.py \
                 --config .soak --njobs 4 --phonemizer_backend grapheme
EST=180 JOB_TIMEOUT=900 \
run restore_voc env ETTS_FORCE_CPU=1 python scripts/restore_ar_ckpt.py \
                 --npz artifacts/soak/voc_gta26k_params_fp16.npz \
                 --model_kind wavernn --config .soak \
                 --session_name vocsoak --step 26000

# --- 2. the gate (TPU, vocoder-only process) ------------------------------
SNAP_EXTRA=(artifacts/soak/r5/gt_voc_gate.csv)
EST=420 JOB_TIMEOUT=2400 \
run gt_gate    python scripts/gt_voc_gate.py --config .soak \
                 --voc_session vocsoak --n_utts 8 \
                 --out artifacts/soak/r5/gt_voc_gate.csv

touch /tmp/queue5j.done
echo "[queue5j] $(date) COMPLETE ($(left)s before deadline)"
