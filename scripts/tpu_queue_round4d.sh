#!/bin/bash
# Round-4d TPU queue — phase 2 of the quality agenda, launched after
# tpu_queue_round4c.sh completes (waits on its pid file):
#
#   1. decode-time runaway guards measured at the 14k baseline checkpoint
#      (ROADMAP r5 #3): attention-completion stop and frames-per-token cap,
#      separately and combined, against the guard-free eval_curve row.
#   2. wide-prosody arm (ROADMAP r5 #2): corpus where pitch/tempo are
#      first-order variance factors -> 14k train -> expressive-control eval
#      with both default and wide carriers.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
mkdir -p artifacts/soak/r4

if [ -f /tmp/queue4c.pid ]; then
  while kill -0 "$(cat /tmp/queue4c.pid)" 2>/dev/null; do sleep 30; done
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
  tail -c 200K "/tmp/r4d_$name.log" > "artifacts/soak/r4/$name.log" 2>/dev/null
  for src in "$@"; do
    if [ -d "$src" ]; then
      find "$src" -maxdepth 2 \( -name '*.csv' -o -name '*.log' -o -name '*.json' \) \
        -exec cp {} "artifacts/soak/r4/" \; 2>/dev/null
    elif [ -f "$src" ]; then
      cp "$src" "artifacts/soak/r4/" 2>/dev/null
    fi
  done
  git add artifacts/soak >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "queue r4d: $name results" || true
}

run() {
  local name=$1; shift
  if [ -f "/tmp/r4d_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
    echo "=== $name attempt $attempt $(date) ==="
    if timeout "${JOB_TIMEOUT:-3600}" "$@" >"/tmp/r4d_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r4d_${name}.ok"
      snap "$name" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r4d_$name.log"
    snap "${name}_failed"
    sleep 60
    until tcp_ok && probe; do sleep 60; done
  done
  echo "$name FAILED twice — continuing with next job"
  return 1
}
SNAP_EXTRA=()

CK14=.soak/checkpoints/.soak_curve20k/autoregressive_weights/14000

# --- 0. Mosaic op-legalization probes (ROADMAP r5 #4 groundwork) ---
SNAP_EXTRA=(artifacts/soak/mosaic_ops_probe.json)
run mosaic_probe python scripts/probe_mosaic_ops.py

# --- 0b. kernel-fault bisection phase 2 (data-dependence sweep): the full
# geometry grid PASSED with finite cond (kernel_bisect.json), so probe
# extreme/NaN/Inf conditioning + the full generate() path at crash length
SNAP_EXTRA=(artifacts/soak/kernel_bisect2.json)
JOB_TIMEOUT=7200 run bisect2 python scripts/bisect_wavernn_kernel.py \
                   --phase2 --out artifacts/soak/kernel_bisect2.json

# --- 1. decode-time runaway guards at the 14k baseline (ROADMAP r5 #3) ---
# guard-free baseline row for the same checkpoint: eval_curve.csv @14k
# (WER_syn 0.794, len ratio 1.39)
SNAP_EXTRA=(.soak/eval/guards_attn)
run guards_attn  python scripts/eval_soak.py --config .soak \
                   --session_name curve20k --out_dir .soak/eval/guards_attn \
                   --checkpoint $CK14 --ctc_ckpt .soak/ctc_asr.npz \
                   --attn_stop_patience 3
SNAP_EXTRA=(.soak/eval/guards_cap)
run guards_cap   python scripts/eval_soak.py --config .soak \
                   --session_name curve20k --out_dir .soak/eval/guards_cap \
                   --checkpoint $CK14 --ctc_ckpt .soak/ctc_asr.npz \
                   --frames_per_token 12.0
SNAP_EXTRA=(.soak/eval/guards_both)
run guards_both  python scripts/eval_soak.py --config .soak \
                   --session_name curve20k --out_dir .soak/eval/guards_both \
                   --checkpoint $CK14 --ctc_ckpt .soak/ctc_asr.npz \
                   --attn_stop_patience 3 --frames_per_token 12.0

# --- 2. wide-prosody arm (ROADMAP r5 #2) ---
run pros_corpus  python scripts/make_synth_corpus.py --out .soak_pros \
                   --n_utts 420 --prosody_range wide
run pros_dataset env ETTS_FORCE_CPU=1 python scripts/create_dataset.py \
                   --config .soak_pros --njobs 4 --phonemizer_backend grapheme
run pros_train   python scripts/train_autoregressive.py --config .soak_pros \
                   --session_name pros --max_steps 14000 --force
for STY in default wide; do
  SNAP_EXTRA=(.soak_pros/eval/expr_$STY)
  run pros_expr_$STY python scripts/eval_expressive_control.py \
                   --config .soak_pros --session_name pros \
                   --checkpoint .soak_pros/checkpoints/.soak_pros_pros/autoregressive_weights/14000 \
                   --out_dir .soak_pros/eval/expr_$STY --n_utts 6 \
                   --styles $STY
done

# --- 3. 4-regime protocol WITH the runaway guards (the round-4 table's WER
# columns were dominated by free-running length runaway; same checkpoint +
# vocoder, so the delta is attributable to the guards) ---
run combos_g     python scripts/make_combo_file.py \
                   --metafile .soak/test_metafile.txt \
                   --out .soak/eval/combos.txt --n 12
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
                   --voc_config .soak --voc_session vocsoak
SNAP_EXTRA=(artifacts/soak/all_score_r4guards.log)
run regime_score_g env ETTS_CTC_ASR=.soak/ctc_asr.npz \
                   python objective_measure.py --ref_dir .soak/wavs \
                   --syn_dirs .soak/eval/regimes_g/curve20k/syn_norm \
                              .soak/eval/regimes_g/curve20k/rand \
                              .soak/eval/regimes_g/curve20k/text_rand \
                              .soak/eval/regimes_g/curve20k/style_rand \
                   --texts .soak/test_metafile.txt \
                   --out artifacts/soak/all_score_r4guards.log

echo "[queue] $(date) round-4d queue COMPLETE"
