#!/bin/bash
# Round-4f TPU queue — the wide-prosody arm (ROADMAP r5 #2) from the never-
# run 4d plan, staged behind tpu_queue_round4e.sh. PITCH/TEMPO control
# measured FAIL at default-corpus scale in every round-4 arm; this trains
# the same AR recipe on a corpus where pitch/tempo are first-order variance
# factors and re-runs the expressive-control eval with both carriers.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
mkdir -p artifacts/soak/r4

if [ -f /tmp/queue4e.pid ]; then
  while kill -0 "$(cat /tmp/queue4e.pid)" 2>/dev/null; do sleep 60; done
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
  tail -c 200K "/tmp/r4f_$name.log" > "artifacts/soak/r4/$name.log" 2>/dev/null
  for src in "$@"; do
    if [ -d "$src" ]; then
      find "$src" -maxdepth 2 \( -name '*.csv' -o -name '*.log' -o -name '*.json' \) \
        -exec cp {} "artifacts/soak/r4/" \; 2>/dev/null
    elif [ -f "$src" ]; then
      cp "$src" "artifacts/soak/r4/" 2>/dev/null
    fi
  done
  git add artifacts/soak >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "queue r4f: $name results" || true
}

run() {
  local name=$1; shift
  if [ -f "/tmp/r4f_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt $(date) ==="
    if timeout "${JOB_TIMEOUT:-3600}" "$@" >"/tmp/r4f_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r4f_${name}.ok"
      snap "$name" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r4f_$name.log"
    snap "${name}_failed"
    sleep 60
    until tcp_ok && probe; do sleep 60; done
  done
  echo "$name FAILED twice — continuing with next job"
  return 1
}
SNAP_EXTRA=()

run pros_corpus  python scripts/make_synth_corpus.py --out .soak_pros \
                   --n_utts 420 --prosody_range wide
run pros_dataset env ETTS_FORCE_CPU=1 python scripts/create_dataset.py \
                   --config .soak_pros --njobs 4 --phonemizer_backend grapheme
JOB_TIMEOUT=7200 run pros_train \
                 python scripts/train_autoregressive.py --config .soak_pros \
                   --session_name pros --max_steps 14000 --force
for STY in default wide; do
  SNAP_EXTRA=(.soak_pros/eval/expr_$STY)
  run pros_expr_$STY python scripts/eval_expressive_control.py \
                   --config .soak_pros --session_name pros \
                   --checkpoint .soak_pros/checkpoints/.soak_pros_pros/autoregressive_weights/14000 \
                   --out_dir .soak_pros/eval/expr_$STY --n_utts 6 \
                   --styles $STY
done

echo "[queue] $(date) round-4f queue COMPLETE"
