#!/bin/bash
# Round-5e TPU queue — consolidates the remaining 5c/5d agenda, REORDERED so
# the VERDICT r4 headline gates run before the long sweeps (round budget):
#
#   1. fault_matrix: phase-instrumented per-axis crash probe on the real
#      trigger mel (values/weights/bucket/length x pallas/scan) — names the
#      faulting vocoder phase and tests the [0,1] clamp mitigation.
#   2. eval_e2e20k (VERDICT #2): neural-vs-GL gate, fused kernel path, with
#      the serving mel clamp now default; scan-path fallback job if it fails.
#   3. regimes protocol on the kernel path (VERDICT #3 done-criterion:
#      no --voc_scan, max_length 600) + objective scoring.
#   4. GTA free-run-matched fine-tune chain (VERDICT #6).
#   5. bisect3: trained-weights kernel isolation at the crash geometry.
#   6. Disentanglement weight sweep + CLUB bracket (VERDICT #5).
#   7. Tacotron trained evidence (VERDICT #7).
#
# Strictly serial; one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
mkdir -p artifacts/soak/r5
echo $$ > /tmp/queue5e.pid

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
  git diff --cached --quiet || git commit -q -m "queue r5e: $name results" || true
}

run() {
  local name=$1; shift
  if [ -f "/tmp/r5e_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt $(date) ==="
    if timeout "${JOB_TIMEOUT:-3600}" "$@" >"/tmp/r5e_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r5e_${name}.ok"
      snap "$name" "/tmp/r5e_$name.log" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r5e_$name.log"
    snap "${name}_failed" "/tmp/r5e_$name.log"
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

# --- 1. decisive fault matrix on the real trigger mel ---
if [ -f .soak/conddump_eval/mel_0.npz ]; then
  SNAP_EXTRA=(artifacts/soak/voc_fault_matrix.json)
  JOB_TIMEOUT=14400 \
  run fault_matrix python scripts/voc_fault_matrix.py --config .soak \
                    --session_name vocsoak --dump .soak/conddump_eval/mel_0.npz \
                    --out artifacts/soak/voc_fault_matrix.json
fi

# --- 2. VERDICT #2: neural-vs-GL gate, fused kernel path, clamp default ---
SNAP_EXTRA=(.soak/eval/e2e_voc20k)
JOB_TIMEOUT=10800 \
run eval_e2e20k  python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/e2e_voc20k \
                  --checkpoint $CK14 \
                  --ctc_ckpt .soak/ctc_asr.npz --vocoder_session vocsoak \
                  --int8_gate --also_gl

if [ ! -f /tmp/r5e_eval_e2e20k.ok ]; then
  SNAP_EXTRA=(.soak/eval/e2e_voc20k_scan)
  JOB_TIMEOUT=10800 \
  run eval_e2e20k_scan python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/e2e_voc20k_scan \
                  --checkpoint $CK14 \
                  --ctc_ckpt .soak/ctc_asr.npz --vocoder_session vocsoak \
                  --voc_scan --also_gl
fi

# --- 3. VERDICT #3 done-criterion: regimes on the fused kernel path ---
SNAP_EXTRA=()
JOB_TIMEOUT=10800 \
run regimes_k   python synthesize_sentences_speaker.py --tts_config .soak \
                  --sessions curve20k \
                  --checkpoint $CK14 \
                  --test_sentences .soak/test_metafile.txt \
                  --combo_file .soak/eval/combos.txt \
                  --ref_audio_dir .soak/wavs --spk_embed_dir .soak/spk_embeds \
                  --regimes syn_norm rand text_rand style_rand \
                  --out_dir .soak/eval/regimes_k5e --max_length 600 \
                  --voc_config .soak --voc_session vocsoak

if ls .soak/eval/regimes_k5e/curve20k/syn_norm/*.wav >/dev/null 2>&1; then
  SNAP_EXTRA=(artifacts/soak/all_score_r5e.log)
  run regime_score env ETTS_CTC_ASR=.soak/ctc_asr.npz \
                    python objective_measure.py --ref_dir .soak/wavs \
                    --syn_dirs .soak/eval/regimes_k5e/curve20k/syn_norm \
                               .soak/eval/regimes_k5e/curve20k/rand \
                               .soak/eval/regimes_k5e/curve20k/text_rand \
                               .soak/eval/regimes_k5e/curve20k/style_rand \
                    --texts .soak/test_metafile.txt \
                    --out artifacts/soak/all_score_r5e.log
fi

# --- 4. GTA free-run-matched fine-tune (VERDICT #6) ---
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

# --- 5. trained-weights kernel isolation (forensics completeness) ---
SNAP_EXTRA=(artifacts/soak/kernel_bisect3.json)
JOB_TIMEOUT=10800 \
run bisect3     python scripts/bisect_wavernn_kernel.py --phase3 \
                  --out artifacts/soak/kernel_bisect3.json

# --- 6. disentanglement weight sweep + CLUB bracket (VERDICT #5) ---
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

# --- 7. Tacotron trained evidence (VERDICT #7) ---
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

touch /tmp/queue5e.done
echo "[queue] $(date) round-5e queue COMPLETE"
