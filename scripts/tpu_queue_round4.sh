#!/bin/bash
# Round-4 TPU job queue. Run by the tunnel watcher (strictly serial; one
# TPU process at a time). Each job logs to /tmp/r4_<name>.log.
#
# Ordered by VERDICT r3 priority: green bench record (do #1), trained
# vocoder + neural E2E (do #2, missing #1), disentanglement experiment
# (do #3, missing #2), expressive control (do #4, missing #3), the
# multi-speaker regime protocol (do #9), then the exposure-bias arms
# (do #5) which are mitigation experiments, not missing capabilities.
#
# After every job the queue snapshots its log + result CSVs into
# artifacts/soak/r4/ and commits, so evidence survives even if the round
# ends mid-queue. Validate edits with: python scripts/preflight_queue.py
cd /root/repo
export PYTHONUNBUFFERED=1
mkdir -p artifacts/soak/r4

# the tunnel is back: reclaim the 1-core host from the CPU contingency so
# TPU jobs' input pipelines aren't starved (scripts/cpu_contingency_round4.sh)
if [ -f /tmp/cpu_contingency.pid ]; then
  kill "$(cat /tmp/cpu_contingency.pid)" 2>/dev/null || true
  rm -f /tmp/cpu_contingency.pid
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
  # snap <name> [result files/dirs...] — archive the job log and results,
  # then commit so nothing is lost if the round ends mid-queue.
  local name=$1; shift
  tail -c 200K "/tmp/r4_$name.log" > "artifacts/soak/r4/$name.log" 2>/dev/null
  for src in "$@"; do
    if [ -d "$src" ]; then
      find "$src" -maxdepth 2 \( -name '*.csv' -o -name '*.log' -o -name '*.json' \) \
        -exec cp {} "artifacts/soak/r4/" \; 2>/dev/null
    elif [ -f "$src" ]; then
      cp "$src" "artifacts/soak/r4/" 2>/dev/null
    fi
  done
  git add artifacts/soak >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "queue r4: $name results" || true
}

run() {
  local name=$1; shift
  if [ -f "/tmp/r4_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt $(date) ==="
    if timeout 5400 "$@" >"/tmp/r4_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r4_${name}.ok"
      snap "$name" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r4_$name.log"
    snap "${name}_failed"
    sleep 60
    until tcp_ok && probe; do sleep 60; done
  done
  echo "$name FAILED twice — continuing with next job"
  return 1
}
SNAP_EXTRA=()

# --- 1. driver-record benches (VERDICT do #1) ---
run bench_main   python bench.py
run bench_serve  python bench.py --serve
run bench_curve  python bench.py --train_curve

# --- 1b. rebuild wiped state (2026-08-18 VM reboot deleted all untracked
# state: .soak corpus/dataset/CTC/voc store and every orbax checkpoint).
# bootstrap is deterministic CPU rebuild; curve20k retrains the 20k-step
# checkpoint-curve session so downstream jobs get genuine checkpoints. ---
run bootstrap    bash scripts/bootstrap_soak_r4.sh
run curve20k     python scripts/train_autoregressive.py --config .soak \
                   --session_name curve20k --max_steps 20000 --force

# --- 2. trained vocoder + fully neural E2E (VERDICT do #2, missing #1) ---
run vocsoak      python scripts/train_wavernn.py --config .soak \
                   --data .soak/voc --session_name vocsoak --max_steps 4000
run make_gta     python scripts/make_gta.py --config .soak \
                   --session_name curve20k --voc_data .soak/voc \
                   --checkpoint .soak/checkpoints/.soak_curve20k/autoregressive_weights/14000
run vocsoak_gta  python scripts/train_wavernn.py --config .soak \
                   --data .soak/voc --session_name vocsoak --gta --max_steps 6000
SNAP_EXTRA=(.soak/eval/e2e_voc)
run eval_e2e     python scripts/eval_soak.py --config .soak \
                   --session_name curve20k --out_dir .soak/eval/e2e_voc \
                   --checkpoint .soak/checkpoints/.soak_curve20k/autoregressive_weights/14000 \
                   --ctc_ckpt .soak/ctc_asr.npz --vocoder_session vocsoak \
                   --int8_gate --also_gl

# --- 3. disentanglement experiment (VERDICT do #3, missing #2) ---
run ent_setup    python scripts/setup_disentangle.py
run ent_base     python scripts/train_autoregressive.py --config .soak_ent_base \
                   --session_name A --max_steps 10000 --force
run ent_mine     python scripts/train_autoregressive.py --config .soak_ent_mine \
                   --session_name B --max_steps 10000 --force
run ent_eval_a   python scripts/eval_disentanglement.py --config .soak_ent_base \
                   --sessions A --pairs style_text --probe_first_token \
                   --batch_size 64 --max_batches 3 --critic_steps 1500 \
                   --out artifacts/soak/disentangle_base.csv
run ent_eval_b   python scripts/eval_disentanglement.py --config .soak_ent_mine \
                   --sessions B --pairs style_text --probe_first_token \
                   --batch_size 64 --max_batches 3 --critic_steps 1500 \
                   --out artifacts/soak/disentangle_mine.csv

# --- 4. expressive-control measurement (VERDICT do #4, missing #3) ---
for CK in 14000 20000; do
  SNAP_EXTRA=(.soak/eval/expr_$CK)
  run expr_ctl$CK python scripts/eval_expressive_control.py --config .soak \
                   --session_name curve20k \
                   --checkpoint .soak/checkpoints/.soak_curve20k/autoregressive_weights/$CK \
                   --out_dir .soak/eval/expr_$CK --n_utts 6
done

# --- 5. multi-speaker regime protocol end to end (VERDICT do #9) ---
# the reference's headline evaluation: 4 regimes -> objective_measure ->
# all_score.log (/root/reference/objective_measure.py:210-311)
run combos       python scripts/make_combo_file.py \
                   --metafile .soak/test_metafile.txt \
                   --out .soak/eval/combos.txt --n 12
run regimes      python synthesize_sentences_speaker.py --tts_config .soak \
                   --sessions curve20k \
                   --checkpoint .soak/checkpoints/.soak_curve20k/autoregressive_weights/14000 \
                   --test_sentences .soak/test_metafile.txt \
                   --combo_file .soak/eval/combos.txt \
                   --ref_audio_dir .soak/wavs --spk_embed_dir .soak/spk_embeds \
                   --regimes syn_norm rand text_rand style_rand \
                   --out_dir .soak/eval/regimes --max_length 600 \
                   --voc_config .soak --voc_session vocsoak
run regime_score env ETTS_CTC_ASR=.soak/ctc_asr.npz \
                   python objective_measure.py --ref_dir .soak/wavs \
                   --syn_dirs .soak/eval/regimes/curve20k/syn_norm \
                              .soak/eval/regimes/curve20k/rand \
                              .soak/eval/regimes/curve20k/text_rand \
                              .soak/eval/regimes/curve20k/style_rand \
                   --texts .soak/test_metafile.txt \
                   --out artifacts/soak/all_score_r4.log

# --- 6. exposure-bias mitigation (VERDICT do #5) ---
# arm ssft: scheduled-sampling fine-tune of the free-running-best (14k)
# checkpoint to 20k; arm drop: always-on prenet dropout from scratch
run expbias_setup python scripts/setup_expbias.py
run ssft         python scripts/train_autoregressive.py --config .soak_ss \
                   --session_name ft --max_steps 20000 --force
for CK in 16000 18000 20000; do
  SNAP_EXTRA=(.soak/eval/ssft_$CK)
  run ssft_eval$CK python scripts/eval_soak.py --config .soak_ss \
                   --session_name ft --out_dir .soak/eval/ssft_$CK \
                   --checkpoint .soak/checkpoints/.soak_ss_ft/autoregressive_weights/$CK \
                   --ctc_ckpt .soak/ctc_asr.npz
done

# --- 6b. style-consistency fine-tune arm, then re-measure control ---
run stylesc      python scripts/train_autoregressive.py --config .soak_style \
                   --session_name sc --max_steps 20000 --force
SNAP_EXTRA=(.soak/eval/expr_sc)
run expr_ctl_sc  python scripts/eval_expressive_control.py --config .soak_style \
                   --session_name sc \
                   --checkpoint .soak/checkpoints/.soak_style_sc/autoregressive_weights/20000 \
                   --out_dir .soak/eval/expr_sc --n_utts 6

# --- 7. always-on-dropout arm (VERDICT do #5, hypothesis test) ---
run dropt        python scripts/train_autoregressive.py --config .soak_drop \
                   --session_name d5 --max_steps 20000 --force
for CK in 14000 20000; do
  SNAP_EXTRA=(.soak/eval/drop_$CK)
  run drop_eval$CK python scripts/eval_soak.py --config .soak_drop \
                   --session_name d5 --out_dir .soak/eval/drop_$CK \
                   --checkpoint .soak/checkpoints/.soak_drop_d5/autoregressive_weights/$CK \
                   --ctc_ckpt .soak/ctc_asr.npz
done

echo "[queue] $(date) round-4 queue COMPLETE"
