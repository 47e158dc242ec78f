#!/bin/bash
# Round-5c TPU queue — staged behind round-5b. The remaining VERDICT r4
# agenda:
#
#   1. mel_replay_eval: voc_phase_probe over the eval-path mel dumps (the
#      exact trigger mels, trained weights, pallas vs scan, phase-synced,
#      30-line tracebacks) — the frame-level localization of the vocoder
#      worker fault.
#   2. GTA free-run-matched fine-tune (VERDICT #6): make_gta --tts_out from
#      the frozen 14k ckpt, fine-tune 14k->20k on GTA decoder inputs,
#      eval_soak the 16k/18k/20k checkpoints (baseline: WER_syn 0.794).
#   3. Disentanglement weight sweep + CLUB bracket (VERDICT #5): 5 arms
#      (base/w02/w05/w20/club) x 10k steps on the entangled corpus, each
#      evaluated with fresh MINE lower + CLUB upper bounds + linear probe.
#   4. Tacotron trained evidence (VERDICT #7): build the taco feature store
#      over the .soak corpus, train 8k steps, synthesize + objective-score.
#
# Strictly serial; one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
mkdir -p artifacts/soak/r5
echo $$ > /tmp/queue5c.pid

if [ -f /tmp/queue5b.pid ]; then
  while kill -0 "$(cat /tmp/queue5b.pid)" 2>/dev/null; do sleep 60; done
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
  git diff --cached --quiet || git commit -q -m "queue r5c: $name results" || true
}

run() {
  local name=$1; shift
  if [ -f "/tmp/r5c_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt $(date) ==="
    if timeout "${JOB_TIMEOUT:-3600}" "$@" >"/tmp/r5c_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r5c_${name}.ok"
      snap "$name" "/tmp/r5c_$name.log" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r5c_$name.log"
    snap "${name}_failed" "/tmp/r5c_$name.log"
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

# --- 1. frame-level fault localization on the real trigger mels ---
if ls .soak/conddump_eval/mel_*.npz >/dev/null 2>&1; then
  SNAP_EXTRA=(artifacts/soak/voc_phase_probe_eval.json)
  JOB_TIMEOUT=10800 \
  run mel_replay_eval python scripts/voc_phase_probe.py --config .soak \
                    --session_name vocsoak --dump_dir .soak/conddump_eval \
                    --out artifacts/soak/voc_phase_probe_eval.json
fi

# --- 2. GTA free-run-matched fine-tune (VERDICT #6) ---
run gtaft_setup  python scripts/setup_gtaft.py
run gta_mels     python scripts/make_gta.py --config .soak \
                   --session_name curve20k --checkpoint $CK14 \
                   --tts_out .soak/gta_mels
JOB_TIMEOUT=7200 \
run gtaft        python scripts/train_autoregressive.py --config .soak_gtaft \
                   --session_name ft --max_steps 20000 \
                   --gta_mel_dir .soak/gta_mels
for CK in 16000 18000 20000; do
  SNAP_EXTRA=(.soak/eval/gtaft_$CK)
  run gtaft_eval$CK python scripts/eval_soak.py --config .soak_gtaft \
                   --session_name ft --out_dir .soak/eval/gtaft_$CK \
                   --checkpoint .soak/checkpoints/.soak_gtaft_ft/autoregressive_weights/$CK \
                   --ctc_ckpt .soak/ctc_asr.npz
done

# --- 3. disentanglement weight sweep + CLUB bracket (VERDICT #5) ---
run ent_setup    env ETTS_FORCE_CPU=1 python scripts/setup_disentangle.py
for ARM in base w02 mine w20 club; do
  JOB_TIMEOUT=7200 \
  run ent_$ARM   python scripts/train_autoregressive.py \
                   --config .soak_ent_$ARM --session_name X \
                   --max_steps 10000 --force
  SNAP_EXTRA=(artifacts/soak/disentangle_r5_$ARM.csv)
  run ent_eval_$ARM python scripts/eval_disentanglement.py \
                   --config .soak_ent_$ARM --sessions X \
                   --pairs style_text --probe_first_token --club \
                   --batch_size 64 --max_batches 3 --critic_steps 1500 \
                   --out artifacts/soak/disentangle_r5_$ARM.csv
done

# --- 4. Tacotron trained evidence (VERDICT #7) ---
run taco_setup   env ETTS_FORCE_CPU=1 python scripts/setup_taco_soak.py \
                   --corpus .soak --out .soak_taco
JOB_TIMEOUT=10800 \
run taco_train   python scripts/train_tacotron.py --config .soak_taco \
                   --max_steps 8000 --force
SNAP_EXTRA=(.soak_taco/eval)
run taco_eval    python scripts/eval_tacotron.py --config .soak_taco \
                   --sentences_file .soak/test_metafile.txt \
                   --out_dir .soak_taco/eval
if ls .soak_taco/eval/*.wav >/dev/null 2>&1; then
  SNAP_EXTRA=(artifacts/soak/taco_score_r5.log)
  run taco_score env ETTS_CTC_ASR=.soak/ctc_asr.npz \
                   python objective_measure.py --ref_dir .soak/wavs \
                   --syn_dirs .soak_taco/eval \
                   --texts .soak/test_metafile.txt \
                   --out artifacts/soak/taco_score_r5.log
fi

touch /tmp/queue5c.done
echo "[queue] $(date) round-5c queue COMPLETE"
