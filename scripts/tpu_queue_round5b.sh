#!/bin/bash
# Round-5b TPU queue — fault localization + the blocked round-5 gates, in
# dependency order:
#
#   1. fault_probe (VERDICT #3): subprocess-isolated decode_fault_probe —
#      round-5a showed the worker dies at the FIRST vocoder sync while
#      tts.predict already host-synced, i.e. the corruption suspect is the
#      fused AR decoder kernel at eval geometry (max_length 600), not the
#      vocoder. Cases: fused@600, while_loop@600, fused@120.
#   2. eval_e2e20k_wl (VERDICT #2): the 26k-GTA-vocoder-vs-GL gate, decoded
#      on the while_loop path (ETTS_NO_FUSED_DECODE=1) so the measurement is
#      not hostage to the kernel fault; vocoder still runs the fused Pallas
#      sample kernel (the component under test).
#   3. regimes_wl + scoring (VERDICT #3 done-criterion, vocoder half): the
#      exact round-4b regimes protocol, kernel vocoder path, guards off.
#   4. ps_train + ps_expr_* (VERDICT #4): the wide-prosody arm re-trained
#      WITH ProsodyStatEncoder (use_prosody_stats: True) and re-scored by
#      eval_expressive_control — the decisive pitch-pathway experiment.
#
# Strictly serial; one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
mkdir -p artifacts/soak/r5
echo $$ > /tmp/queue5b.pid

# wait for round-5a to finish
if [ -f /tmp/queue5a.pid ]; then
  while kill -0 "$(cat /tmp/queue5a.pid)" 2>/dev/null; do sleep 60; done
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
  git diff --cached --quiet || git commit -q -m "queue r5b: $name results" || true
}

run() {
  local name=$1; shift
  if [ -f "/tmp/r5b_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt $(date) ==="
    if timeout "${JOB_TIMEOUT:-3600}" "$@" >"/tmp/r5b_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r5b_${name}.ok"
      snap "$name" "/tmp/r5b_$name.log" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r5b_$name.log"
    snap "${name}_failed" "/tmp/r5b_$name.log"
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

# --- 1. localize the worker fault (decoder kernel vs vocoder phases) ---
SNAP_EXTRA=(artifacts/soak/decode_fault_probe.json)
JOB_TIMEOUT=10800 \
run fault_probe python scripts/decode_fault_probe.py --config .soak \
                  --session curve20k --checkpoint $CK14 \
                  --vocoder_session vocsoak \
                  --out artifacts/soak/decode_fault_probe.json

sleep 60; until tcp_ok && probe; do sleep 60; done

# --- 2. VERDICT #2: neural-vs-GL gate on the while_loop decode path ---
SNAP_EXTRA=(.soak/eval/e2e_voc20k)
JOB_TIMEOUT=10800 \
run eval_e2e20k_wl env ETTS_NO_FUSED_DECODE=1 ETTS_DUMP_COND=.soak/conddump_eval \
                python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/e2e_voc20k \
                  --checkpoint $CK14 \
                  --ctc_ckpt .soak/ctc_asr.npz --vocoder_session vocsoak \
                  --int8_gate --also_gl

# --- 3. VERDICT #3: regimes protocol, fused vocoder kernel, guards off ---
SNAP_EXTRA=()
JOB_TIMEOUT=10800 \
run regimes_wl  env ETTS_NO_FUSED_DECODE=1 ETTS_DUMP_COND=.soak/conddump \
                python synthesize_sentences_speaker.py --tts_config .soak \
                  --sessions curve20k \
                  --checkpoint $CK14 \
                  --test_sentences .soak/test_metafile.txt \
                  --combo_file .soak/eval/combos.txt \
                  --ref_audio_dir .soak/wavs --spk_embed_dir .soak/spk_embeds \
                  --regimes syn_norm rand text_rand style_rand \
                  --out_dir .soak/eval/regimes_k --max_length 600 \
                  --voc_config .soak --voc_session vocsoak

if [ ! -f /tmp/r5b_regimes_wl.ok ] && ls .soak/conddump/mel_*.npz >/dev/null 2>&1; then
  SNAP_EXTRA=(artifacts/soak/voc_phase_probe.json)
  JOB_TIMEOUT=10800 \
  run mel_replay  python scripts/voc_phase_probe.py --config .soak \
                    --session_name vocsoak --dump_dir .soak/conddump \
                    --out artifacts/soak/voc_phase_probe.json
fi

if ls .soak/eval/regimes_k/curve20k/syn_norm/*.wav >/dev/null 2>&1; then
  SNAP_EXTRA=(artifacts/soak/all_score_r5k.log)
  run regime_score_wl env ETTS_CTC_ASR=.soak/ctc_asr.npz \
                    python objective_measure.py --ref_dir .soak/wavs \
                    --syn_dirs .soak/eval/regimes_k/curve20k/syn_norm \
                               .soak/eval/regimes_k/curve20k/rand \
                               .soak/eval/regimes_k/curve20k/text_rand \
                               .soak/eval/regimes_k/curve20k/style_rand \
                    --texts .soak/test_metafile.txt \
                    --out artifacts/soak/all_score_r5k.log
fi

# --- 4. VERDICT #4: prosody-stats training arm on the wide-prosody corpus ---
if [ ! -d .soak_pros_ps ]; then
  mkdir -p .soak_pros_ps
  cp .soak_pros/data_config.yaml .soak_pros_ps/
  python - <<'EOF'
import yaml
c = yaml.safe_load(open(".soak_pros/autoregressive_config.yaml"))
c["use_prosody_stats"] = True
c["prosody_embed_dim"] = 32
yaml.safe_dump(c, open(".soak_pros_ps/autoregressive_config.yaml", "w"))
print("wrote .soak_pros_ps config")
EOF
fi

JOB_TIMEOUT=9000 \
run ps_train    python scripts/train_autoregressive.py --config .soak_pros_ps \
                  --session_name ps --max_steps 14000 --force

for STY in default wide; do
  SNAP_EXTRA=(.soak_pros/eval/ps_expr_$STY)
  run ps_expr_$STY python scripts/eval_expressive_control.py \
                  --config .soak_pros_ps --session_name ps \
                  --checkpoint .soak_pros/checkpoints/.soak_pros_ps_ps/autoregressive_weights/14000 \
                  --out_dir .soak_pros/eval/ps_expr_$STY --n_utts 6 \
                  --styles $STY
done

touch /tmp/queue5b.done
echo "[queue] $(date) round-5b queue COMPLETE"
