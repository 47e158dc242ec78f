#!/bin/bash
# Round-5a TPU queue — the evidence agenda from VERDICT r4, in gate order:
#
#   1. eval_e2e20k rerun (VERDICT #2): the 26k GTA vocoder vs Griffin-Lim
#      from the SAME mels — the weights sat committed while the round-4 job
#      died with its log lost to the snap bug (ADVICE r4 #2, fixed here:
#      snap() now takes the source log explicitly).
#   2. regimes_k (VERDICT #3 done-criterion): the EXACT round-4b regimes2
#      invocation that killed the worker — kernel path (no --voc_scan),
#      guards OFF, max_length 600 — with ETTS_DUMP_COND forensics so a crash
#      leaves the trigger tensor on disk; kernel_replay.py then replays the
#      dumps (trained weights, subprocess-isolated) if the job failed.
#   3. objective scoring of the regimes_k outputs.
#   4. bench --serve / --train_curve driver records (main record already
#      landed green this round: artifacts/soak/r5/bench_main.log).
#
# Strictly serial: one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
mkdir -p artifacts/soak/r5
echo $$ > /tmp/queue5a.pid

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

# snap NAME SRC_LOG [extra paths...] — ADVICE r4 #2: the source log is an
# explicit argument, so failure snapshots copy the log that actually exists.
snap() {
  local name=$1 src_log=$2; shift 2
  tail -c 200K "$src_log" > "artifacts/soak/r5/$name.log" 2>/dev/null
  for src in "$@"; do
    if [ -d "$src" ]; then
      find "$src" -maxdepth 2 \( -name '*.csv' -o -name '*.log' -o -name '*.json' \) \
        -exec cp {} "artifacts/soak/r5/" \; 2>/dev/null
    elif [ -f "$src" ]; then
      case "$src" in
        *.npz) cp "$src" "artifacts/soak/" 2>/dev/null ;;  # canonical home only
        *)     cp "$src" "artifacts/soak/r5/" 2>/dev/null ;;
      esac
    fi
  done
  git add artifacts/soak >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "queue r5a: $name results" || true
}

run() {
  local name=$1; shift
  if [ -f "/tmp/r5a_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt $(date) ==="
    if timeout "${JOB_TIMEOUT:-3600}" "$@" >"/tmp/r5a_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r5a_${name}.ok"
      snap "$name" "/tmp/r5a_$name.log" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r5a_$name.log"
    snap "${name}_failed" "/tmp/r5a_$name.log"
    sleep 60
    until tcp_ok && probe; do sleep 60; done
  done
  echo "$name FAILED twice — continuing with next job"
  SNAP_EXTRA=()
  return 1
}
SNAP_EXTRA=()

CK14=.soak/checkpoints/.soak_curve20k/autoregressive_weights/14000

# --- 1. VERDICT #2: fully-neural E2E with the 26k GTA vocoder vs GL ---
SNAP_EXTRA=(.soak/eval/e2e_voc20k)
JOB_TIMEOUT=10800 \
run eval_e2e20k env ETTS_DUMP_COND=.soak/conddump_eval \
                python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/e2e_voc20k \
                  --checkpoint $CK14 \
                  --ctc_ckpt .soak/ctc_asr.npz --vocoder_session vocsoak \
                  --int8_gate --also_gl

# --- 2. VERDICT #3: the exact round-4b crashing invocation, kernel path,
# guards OFF (reproduces runaway mels), with conditioning forensics ---
SNAP_EXTRA=()
JOB_TIMEOUT=10800 \
run regimes_k   env ETTS_DUMP_COND=.soak/conddump \
                python synthesize_sentences_speaker.py --tts_config .soak \
                  --sessions curve20k \
                  --checkpoint $CK14 \
                  --test_sentences .soak/test_metafile.txt \
                  --combo_file .soak/eval/combos.txt \
                  --ref_audio_dir .soak/wavs --spk_embed_dir .soak/spk_embeds \
                  --regimes syn_norm rand text_rand style_rand \
                  --out_dir .soak/eval/regimes_k --max_length 600 \
                  --voc_config .soak --voc_session vocsoak

if [ ! -f /tmp/r5a_regimes_k.ok ] && ls .soak/conddump/cond_*.npz >/dev/null 2>&1; then
  SNAP_EXTRA=(artifacts/soak/kernel_replay.json)
  JOB_TIMEOUT=10800 \
  run replay_dumps python scripts/kernel_replay.py --config .soak \
                    --session_name vocsoak --dump_dir .soak/conddump \
                    --out artifacts/soak/kernel_replay.json
fi

# --- 3. score the guards-off kernel-path regime outputs ---
if [ -d .soak/eval/regimes_k/curve20k/syn_norm ]; then
  SNAP_EXTRA=(artifacts/soak/all_score_r5k.log)
  run regime_score_k env ETTS_CTC_ASR=.soak/ctc_asr.npz \
                    python objective_measure.py --ref_dir .soak/wavs \
                    --syn_dirs .soak/eval/regimes_k/curve20k/syn_norm \
                               .soak/eval/regimes_k/curve20k/rand \
                               .soak/eval/regimes_k/curve20k/text_rand \
                               .soak/eval/regimes_k/curve20k/style_rand \
                    --texts .soak/test_metafile.txt \
                    --out artifacts/soak/all_score_r5k.log
fi

# --- 4. remaining driver records ---
run bench_serve python bench.py --serve
run bench_curve python bench.py --train_curve
snap bench_serve /tmp/r5a_bench_serve.log
snap bench_curve /tmp/r5a_bench_curve.log

touch /tmp/queue5a.done
echo "[queue] $(date) round-5a queue COMPLETE"
