#!/bin/bash
# Round-4e TPU queue — relaunch after the THIRD VM reboot (2026-08-19
# ~02:20 UTC) wiped .soak/.jax_cache//tmp again mid-4c. Differences from 4c:
#
#   * the 14k AR checkpoint is RESTORED from the committed fp16 export
#     (scripts/restore_ar_ckpt.py) instead of a 30-min curve20k retrain —
#     the wall-clock budget no longer affords retraining before the vocoder
#     chain, and every consumer here is inference-only (fresh-opt_state
#     caveat does not apply; disclosed in SOAK_NOTES regardless).
#   * the trained vocoder params are EXPORTED to artifacts/ right after
#     training, so a fourth reboot cannot erase the evidence.
#   * the decode-guard measurements (queue 4d item 1) and the guarded
#     4-regime rerun are folded in after the vocoder chain.
#
# Strictly serial: one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
mkdir -p artifacts/soak/r4

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
  tail -c 200K "/tmp/r4e_$name.log" > "artifacts/soak/r4/$name.log" 2>/dev/null
  for src in "$@"; do
    if [ -d "$src" ]; then
      find "$src" -maxdepth 2 \( -name '*.csv' -o -name '*.log' -o -name '*.json' \) \
        -exec cp {} "artifacts/soak/r4/" \; 2>/dev/null
    elif [ -f "$src" ]; then
      cp "$src" "artifacts/soak/r4/" 2>/dev/null
    fi
  done
  git add artifacts/soak >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "queue r4e: $name results" || true
}

run() {
  local name=$1; shift
  if [ -f "/tmp/r4e_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt $(date) ==="
    if timeout "${JOB_TIMEOUT:-3600}" "$@" >"/tmp/r4e_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r4e_${name}.ok"
      snap "$name" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r4e_$name.log"
    snap "${name}_failed"
    sleep 60
    until tcp_ok && probe; do sleep 60; done
  done
  echo "$name FAILED twice — continuing with next job"
  return 1
}
SNAP_EXTRA=()

CK14=.soak/checkpoints/.soak_curve20k/autoregressive_weights/14000

# --- 1. rebuild wiped state (idempotent) + 14k restore from fp16 export ---
run bootstrap   bash scripts/bootstrap_soak_r4.sh
run restore14k  python scripts/restore_ar_ckpt.py --config .soak \
                  --session_name curve20k
# the combo file is consumed by the guarded regime rerun at the end
run combos_g    python scripts/make_combo_file.py \
                  --metafile .soak/test_metafile.txt \
                  --out .soak/eval/combos.txt --n 12

# --- 2. ROADMAP r5 #1: vocoder at 5x the round-4 training budget ---
JOB_TIMEOUT=7200 run voc20k \
                python scripts/train_wavernn.py --config .soak \
                  --data .soak/voc --session_name vocsoak --max_steps 20000
run make_gta    python scripts/make_gta.py --config .soak \
                  --session_name curve20k --voc_data .soak/voc \
                  --checkpoint $CK14
run voc_gta     python scripts/train_wavernn.py --config .soak \
                  --data .soak/voc --session_name vocsoak --gta \
                  --max_steps 26000
SNAP_EXTRA=(artifacts/soak/voc_gta26k_params_fp16.npz)
run voc_export  python scripts/export_params_npz.py --config .soak \
                  --model_kind wavernn --session_name vocsoak \
                  --out artifacts/soak/voc_gta26k_params_fp16.npz
SNAP_EXTRA=(.soak/eval/e2e_voc20k)
run eval_e2e20k python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/e2e_voc20k \
                  --checkpoint $CK14 \
                  --ctc_ckpt .soak/ctc_asr.npz --vocoder_session vocsoak \
                  --int8_gate --also_gl

# --- 3. decode-time runaway guards at the 14k baseline (queue 4d item 1;
# guard-free baseline row: eval_curve.csv @14k, WER_syn 0.794, len 1.39) ---
SNAP_EXTRA=(.soak/eval/guards_attn)
run guards_attn python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/guards_attn \
                  --checkpoint $CK14 --ctc_ckpt .soak/ctc_asr.npz \
                  --attn_stop_patience 3
SNAP_EXTRA=(.soak/eval/guards_cap)
run guards_cap  python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/guards_cap \
                  --checkpoint $CK14 --ctc_ckpt .soak/ctc_asr.npz \
                  --frames_per_token 12.0
SNAP_EXTRA=(.soak/eval/guards_both)
run guards_both python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/guards_both \
                  --checkpoint $CK14 --ctc_ckpt .soak/ctc_asr.npz \
                  --attn_stop_patience 3 --frames_per_token 12.0

# --- 4. bench records (re-warm the wiped .jax_cache for the driver) ---
# op-legalization probes first: bench only times int8_mxu when the
# committed probe record says the toolchain legalizes the int8 dots
SNAP_EXTRA=(artifacts/soak/mosaic_ops_probe.json)
run mosaic_probe python scripts/probe_mosaic_ops.py
run bench_main  python bench.py
run bench_serve python bench.py --serve

# --- 5. guarded 4-regime protocol (queue 4d item 3): same checkpoint +
# trained vocoder as the round-4 table, delta = the runaway guards ---
JOB_TIMEOUT=7200 run regimes_g \
                python synthesize_sentences_speaker.py --tts_config .soak \
                  --sessions curve20k \
                  --checkpoint $CK14 \
                  --test_sentences .soak/test_metafile.txt \
                  --combo_file .soak/eval/combos.txt \
                  --ref_audio_dir .soak/wavs --spk_embed_dir .soak/spk_embeds \
                  --regimes syn_norm rand text_rand style_rand \
                  --out_dir .soak/eval/regimes_g --max_length 600 \
                  --attn_stop_patience 3 --frames_per_token 12.0 \
                  --voc_config .soak --voc_session vocsoak --voc_scan
SNAP_EXTRA=(artifacts/soak/all_score_r4guards.log)
run regime_score_g env ETTS_CTC_ASR=.soak/ctc_asr.npz \
                  python objective_measure.py --ref_dir .soak/wavs \
                  --syn_dirs .soak/eval/regimes_g/curve20k/syn_norm \
                             .soak/eval/regimes_g/curve20k/rand \
                             .soak/eval/regimes_g/curve20k/text_rand \
                             .soak/eval/regimes_g/curve20k/style_rand \
                  --texts .soak/test_metafile.txt \
                  --out artifacts/soak/all_score_r4guards.log

run bench_curve python bench.py --train_curve

# --- 6. kernel-fault bisection phase 2 (data-dependence sweep) — last:
# worker crashes cost minutes of restart each, so nothing may queue behind
SNAP_EXTRA=(artifacts/soak/kernel_bisect2.json)
JOB_TIMEOUT=7200 run bisect2 python scripts/bisect_wavernn_kernel.py \
                  --phase2 --out artifacts/soak/kernel_bisect2.json

echo "[queue] $(date) round-4e queue COMPLETE"
