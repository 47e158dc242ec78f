#!/bin/bash
# Round-5f TPU queue — rerun of the 5e agenda with the co-residency fault
# DESIGNED OUT: voc_fault_matrix.json proved the long-mel worker fault needs
# the TTS transformer co-resident with the WaveRNN vocoder in one process
# (vocoder alone passes every cell incl. the raw trigger mel; eval/regimes
# with both resident crash deterministically). Every TTS+vocoder job is now
# two serial processes: decode (saves mels) then vocode (vocode_dir.py /
# eval_soak --mels_in).
#
#   1. e2e gate (VERDICT r4 #2): decode+GL arm, then vocoder arm from the
#      SAME mels, fused kernel path, int8 gate.
#   2. regimes protocol (VERDICT #3 done-criterion: kernel path, no
#      --voc_scan, max_length 600) + objective scoring.
#   3. GTA free-run-matched fine-tune chain (VERDICT #6).
#   4. Tacotron trained evidence (VERDICT #7).
#   5. Disentanglement weight sweep + CLUB bracket (VERDICT #5).
#   6. bisect3: trained-weights kernel isolation (forensics completeness).
#
# Strictly serial; one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
# block between vocoder phases: the ONLY configuration that has ever passed
# the 600-frame trigger geometry on hardware is the fault matrix's
# phase-synced run (artifacts/soak/voc_fault_matrix.json); the pipelined
# production dispatch faulted even vocoder-only (r5f e2e_vocode attempts 1-2)
export ETTS_VOC_SYNC=1
mkdir -p artifacts/soak/r5
echo $$ > /tmp/queue5f.pid

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
  git diff --cached --quiet || git commit -q -m "queue r5f: $name results" || true
}

run() {
  local name=$1; shift
  if [ -f "/tmp/r5f_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in $(seq 1 "${RUN_ATTEMPTS:-2}"); do
    echo "=== $name attempt $attempt $(date) ==="
    if timeout "${JOB_TIMEOUT:-3600}" "$@" >"/tmp/r5f_$name.log" 2>&1; then
      echo "$name OK"
      touch "/tmp/r5f_${name}.ok"
      snap "$name" "/tmp/r5f_$name.log" "${SNAP_EXTRA[@]}"
      SNAP_EXTRA=()
      return 0
    fi
    echo "$name FAILED (attempt $attempt); tail:"
    tail -5 "/tmp/r5f_$name.log"
    snap "${name}_failed" "/tmp/r5f_$name.log"
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

# --- 1. VERDICT #2: neural-vs-GL gate, two-phase ---
# phase A: TTS decode + Griffin-Lim arm (vocoder-free process), mels saved
SNAP_EXTRA=(.soak/eval/e2e_gl5f)
JOB_TIMEOUT=7200 \
run e2e_decode   python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/e2e_gl5f \
                  --checkpoint $CK14 --ctc_ckpt .soak/ctc_asr.npz \
                  --decode_out .soak/eval/e2e_mels5f
# phase B pre-vocode: vocode_dir with crash markers + skip_existing makes
# monotonic progress across worker-fault retries (each crash loses at most
# the in-flight mel, which the retry skips)
JOB_TIMEOUT=7200 RUN_ATTEMPTS=5 \
run e2e_prevoc   python scripts/vocode_dir.py --voc_config .soak \
                  --voc_session vocsoak --in_dir .soak/eval/e2e_mels5f \
                  --skip_existing
JOB_TIMEOUT=7200 RUN_ATTEMPTS=5 \
run e2e_prevoc8  python scripts/vocode_dir.py --voc_config .soak \
                  --voc_session vocsoak --in_dir .soak/eval/e2e_mels5f \
                  --skip_existing --int8 --suffix _int8
# phase B: scores the pre-vocoded wavs (vocodes any stragglers itself),
# fused kernel path, SAME mels as the GL arm, int8 gate
SNAP_EXTRA=(.soak/eval/e2e_voc5f)
JOB_TIMEOUT=7200 RUN_ATTEMPTS=3 \
run e2e_vocode   python scripts/eval_soak.py --config .soak \
                  --session_name curve20k --out_dir .soak/eval/e2e_voc5f \
                  --mels_in .soak/eval/e2e_mels5f \
                  --ctc_ckpt .soak/ctc_asr.npz --vocoder_session vocsoak \
                  --int8_gate --gl_scores .soak/eval/e2e_gl5f/scores.csv

# --- 2. VERDICT #3 done-criterion: regimes on the fused kernel path ---
JOB_TIMEOUT=10800 \
run regimes_decode python synthesize_sentences_speaker.py --tts_config .soak \
                  --sessions curve20k \
                  --checkpoint $CK14 \
                  --test_sentences .soak/test_metafile.txt \
                  --combo_file .soak/eval/combos.txt \
                  --ref_audio_dir .soak/wavs --spk_embed_dir .soak/spk_embeds \
                  --regimes syn_norm rand text_rand style_rand \
                  --out_dir .soak/eval/regimes_k5f --max_length 600 \
                  --save_mels
JOB_TIMEOUT=10800 RUN_ATTEMPTS=6 \
run regimes_vocode python scripts/vocode_dir.py --voc_config .soak \
                  --voc_session vocsoak --in_dir .soak/eval/regimes_k5f \
                  --skip_existing

if ls .soak/eval/regimes_k5f/curve20k/syn_norm/*.wav >/dev/null 2>&1; then
  SNAP_EXTRA=(artifacts/soak/all_score_r5f.log)
  run regime_score env ETTS_CTC_ASR=.soak/ctc_asr.npz \
                    python objective_measure.py --ref_dir .soak/wavs \
                    --syn_dirs .soak/eval/regimes_k5f/curve20k/syn_norm \
                               .soak/eval/regimes_k5f/curve20k/rand \
                               .soak/eval/regimes_k5f/curve20k/text_rand \
                               .soak/eval/regimes_k5f/curve20k/style_rand \
                    --texts .soak/test_metafile.txt \
                    --out artifacts/soak/all_score_r5f.log
fi

# --- 3. VERDICT #4 pitch arm: prosody stats + ALWAYS-ON prenet dropout ---
# Hypothesis from the ps arm's FAIL (flat output F0, tempo tracks): under
# teacher forcing the decoder reads pitch from its own history, so every
# conditioning pathway (GST, explicit prosody stats) is ignored for F0. The
# reference's mechanism against exactly this is decoder prenet dropout 0.5
# (kept on at inference, autoregressive_config.yaml:68-70) — but the soak
# schedule only reaches 0.5 at step 12k of 14k. ps2 trains with dropout 0.5
# from STEP 0 so the decoder must lean on conditioning from the start.
if [ ! -d .soak_pros_ps2 ]; then
  mkdir -p .soak_pros_ps2
  cp .soak_pros/data_config.yaml .soak_pros_ps2/
  python - <<'EOF'
import yaml
c = yaml.safe_load(open(".soak_pros_ps/autoregressive_config.yaml"))
c["decoder_prenet_dropout_schedule"] = [[0, 0.5]]
yaml.safe_dump(c, open(".soak_pros_ps2/autoregressive_config.yaml", "w"))
print("wrote .soak_pros_ps2 config")
EOF
fi
JOB_TIMEOUT=9000 \
run ps2_train   python scripts/train_autoregressive.py --config .soak_pros_ps2 \
                  --session_name ps2 --max_steps 14000 --force
for STY in wide default; do
  SNAP_EXTRA=(.soak_pros/eval/ps2_expr_$STY)
  run ps2_expr_$STY python scripts/eval_expressive_control.py \
                  --config .soak_pros_ps2 --session_name ps2 \
                  --checkpoint .soak_pros/checkpoints/.soak_pros_ps2_ps2/autoregressive_weights/14000 \
                  --out_dir .soak_pros/eval/ps2_expr_$STY --n_utts 6 \
                  --styles $STY
done

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

# --- 5. Tacotron trained evidence (VERDICT #7) ---
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

# --- 7. trained-weights kernel isolation (forensics completeness) ---
SNAP_EXTRA=(artifacts/soak/kernel_bisect3.json)
JOB_TIMEOUT=10800 \
run bisect3     python scripts/bisect_wavernn_kernel.py --phase3 \
                  --out artifacts/soak/kernel_bisect3.json

touch /tmp/queue5f.done
echo "[queue] $(date) round-5f queue COMPLETE"
