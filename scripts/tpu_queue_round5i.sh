#!/bin/bash
# Round-5i TPU queue — the post-wipe training arms the 5f queue never reached
# (workspaces rebuilt by scripts/setup_r5i_cpu.sh on CPU while 5h ran):
#   1. GTA free-run-matched fine-tune + eval               (VERDICT r4 #6)
#   2. Tacotron trained evidence: 8k soak + synthesis + score (VERDICT r4 #7)
#   3. ps2 pitch arm: prosody stats + prenet dropout 0.5 from step 0
#      (VERDICT r4 #4; the 5b ps arm's localization says the decoder reads F0
#      from its own history under teacher forcing — always-on prenet dropout
#      is the reference's own countermeasure, autoregressive_config.yaml)
#
# DEADLINE_TS (epoch secs, required) bounds the whole queue: each job knows
# its wall estimate (EST) and is skipped when the remaining budget is
# smaller; long trains are timeout-truncated to the remaining budget minus a
# reserve so their periodic checkpoints (every 2000 steps) still get
# evaluated. Strictly serial; one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
export ETTS_VOC_SYNC=1
mkdir -p artifacts/soak/r5
echo $$ > /tmp/queue5i.pid
: "${DEADLINE_TS:?set DEADLINE_TS (epoch seconds)}"

left() { echo $(( DEADLINE_TS - $(date +%s) )); }

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
  git diff --cached --quiet || git commit -q -m "queue r5i: $name results" || true
}
# run NAME CMD... — honors EST (skip if deadline too close), JOB_TIMEOUT
# (clamped to the remaining budget minus RESERVE so follow-up jobs fit),
# RUN_ATTEMPTS. A timeout "failure" of a training job still leaves periodic
# checkpoints for the eval jobs, so the queue continues either way.
run() {
  local name=$1; shift
  if [ -f "/tmp/r5i_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  local budget; budget=$(left)
  if [ "$budget" -lt "${EST:-300}" ]; then
    echo "=== $name SKIPPED: ${budget}s left < EST ${EST:-300}s ==="
    return 1
  fi
  local tmo=$(( budget - ${RESERVE:-300} ))
  if [ "${JOB_TIMEOUT:-3600}" -lt "$tmo" ]; then tmo=${JOB_TIMEOUT:-3600}; fi
  for attempt in $(seq 1 "${RUN_ATTEMPTS:-2}"); do
    echo "=== $name attempt $attempt (timeout ${tmo}s, $(left)s left) $(date) ==="
    if timeout "$tmo" "$@" >"/tmp/r5i_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r5i_${name}.ok"
      snap "$name" "/tmp/r5i_$name.log" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r5i_$name.log"
    snap "${name}_failed" "/tmp/r5i_$name.log"
    [ "$(left)" -lt "${EST:-300}" ] && break
    sleep 60
    until tcp_ok && probe; do sleep 60; done
  done
  echo "$name gave up — continuing with next job"
  SNAP_EXTRA=()
  return 1
}
latest_ck() {  # latest step number in an orbax weights dir
  ls "$1" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1
}
SNAP_EXTRA=()

# gate on the 5h queue: done marker, or its process gone
while [ ! -f /tmp/queue5h.done ] && kill -0 "$(cat /tmp/queue5h.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
until tcp_ok && probe; do sleep 60; done

CK14=.soak/checkpoints/.soak_curve20k/autoregressive_weights/14000

# --- 1. GTA free-run-matched fine-tune (VERDICT #6) ---------------------
# compile-cached: same model family + shapes as the curve20k session
if [ -d .soak/checkpoints/.soak_gtaft_ft ]; then
  EST=1500 JOB_TIMEOUT=3600 \
  run gta_mels   python scripts/make_gta.py --config .soak \
                   --session_name curve20k --checkpoint $CK14 \
                   --tts_out .soak/gta_mels
  EST=2100 JOB_TIMEOUT=5400 RESERVE=1500 RUN_ATTEMPTS=1 \
  run gtaft      python scripts/train_autoregressive.py --config .soak_gtaft \
                   --session_name ft --max_steps 20000 \
                   --gta_mel_dir .soak/gta_mels
  GCK=$(latest_ck .soak/checkpoints/.soak_gtaft_ft/autoregressive_weights)
  if [ -n "${GCK:-}" ] && [ "$GCK" -gt 14000 ]; then
    SNAP_EXTRA=(.soak/eval/gtaft_$GCK)
    EST=900 JOB_TIMEOUT=2400 \
    run gtaft_eval$GCK python scripts/eval_soak.py --config .soak_gtaft \
                   --session_name ft --out_dir .soak/eval/gtaft_$GCK \
                   --checkpoint .soak/checkpoints/.soak_gtaft_ft/autoregressive_weights/$GCK \
                   --ctc_ckpt .soak/ctc_asr.npz
  fi
fi

# --- 2. Tacotron trained evidence (VERDICT #7) --------------------------
if [ -f .soak_taco/train/train.txt ]; then
  EST=2700 JOB_TIMEOUT=7200 RESERVE=1800 RUN_ATTEMPTS=1 \
  run taco_train python scripts/train_tacotron.py --config .soak_taco \
                   --max_steps 8000 --force
  TCK=$(latest_ck .soak_taco/checkpoints/.soak_taco_tacosoak/tacotron_weights)
  if [ -n "${TCK:-}" ]; then
    SNAP_EXTRA=(.soak_taco/eval)
    EST=900 JOB_TIMEOUT=2400 \
    run taco_eval  python scripts/eval_tacotron.py --config .soak_taco \
                   --sentences_file .soak/test_metafile.txt \
                   --out_dir .soak_taco/eval
    if ls .soak_taco/eval/*.wav >/dev/null 2>&1; then
      SNAP_EXTRA=(artifacts/soak/taco_score_r5.log)
      EST=600 JOB_TIMEOUT=1800 \
      run taco_score env ETTS_CTC_ASR=.soak/ctc_asr.npz \
                   python objective_measure.py --ref_dir .soak/wavs \
                     --syn_dirs .soak_taco/eval \
                     --texts .soak/test_metafile.txt \
                     --out artifacts/soak/taco_score_r5.log
    fi
  fi
fi

# --- 3. ps2 pitch arm (VERDICT #4) ---------------------------------------
if [ -f .soak_pros_ps2/autoregressive_config.yaml ]; then
  EST=2400 JOB_TIMEOUT=9000 RESERVE=1800 RUN_ATTEMPTS=1 \
  run ps2_train  python scripts/train_autoregressive.py --config .soak_pros_ps2 \
                   --session_name ps2 --max_steps 14000 --force
  PCK=$(latest_ck .soak_pros/checkpoints/.soak_pros_ps2_ps2/autoregressive_weights)
  if [ -n "${PCK:-}" ]; then
    for STY in wide default; do
      SNAP_EXTRA=(.soak_pros/eval/ps2_expr_$STY)
      EST=800 JOB_TIMEOUT=2400 \
      run ps2_expr_$STY python scripts/eval_expressive_control.py \
                   --config .soak_pros_ps2 --session_name ps2 \
                   --checkpoint .soak_pros/checkpoints/.soak_pros_ps2_ps2/autoregressive_weights/$PCK \
                   --out_dir .soak_pros/eval/ps2_expr_$STY --n_utts 6 \
                   --styles $STY
    done
  fi
fi

# --- 4. leftovers if the budget allows: bracket the gtaft curve ----------
if [ -d .soak/checkpoints/.soak_gtaft_ft ]; then
  for CK in 16000 18000; do
    [ -d .soak/checkpoints/.soak_gtaft_ft/autoregressive_weights/$CK ] || continue
    SNAP_EXTRA=(.soak/eval/gtaft_$CK)
    EST=900 JOB_TIMEOUT=2400 \
    run gtaft_eval$CK python scripts/eval_soak.py --config .soak_gtaft \
                   --session_name ft --out_dir .soak/eval/gtaft_$CK \
                   --checkpoint .soak/checkpoints/.soak_gtaft_ft/autoregressive_weights/$CK \
                   --ctc_ckpt .soak/ctc_asr.npz
  done
fi

touch /tmp/queue5i.done
echo "[queue5i] $(date) COMPLETE ($(left)s before deadline)"
