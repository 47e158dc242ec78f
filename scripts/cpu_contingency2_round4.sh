#!/bin/bash
# Round-4 CPU contingency, stage 2: the reference's headline evaluation
# protocol (4 speaker/style regimes -> objective_measure -> all_score log,
# /root/reference/objective_measure.py:210-311) end to end on CPU with the
# stage-1 trained vocoder. Waits for stage 1 (cvoc_e2e) to finish; exits
# if the TPU tunnel returned meanwhile (the hardware queue runs the
# full-scale version of this protocol itself).
cd /root/repo
export PYTHONUNBUFFERED=1 ETTS_FORCE_CPU=1
mkdir -p artifacts/soak/r4cpu

while [ ! -f /tmp/r4cpu_cvoc_e2e.ok ]; do
  if [ -f /tmp/TUNNEL_IS_BACK ]; then
    echo "[cpu-contingency2] tunnel returned; hardware queue owns the protocol. Exiting."
    exit 0
  fi
  sleep 120
done
if [ -f /tmp/TUNNEL_IS_BACK ]; then
  echo "[cpu-contingency2] tunnel returned; exiting."
  exit 0
fi
echo $$ > /tmp/cpu_contingency.pid

run() {
  local name=$1; shift
  if [ -f "/tmp/r4cpu_${name}.ok" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  echo "=== $name $(date) ==="
  if nice -n 19 timeout 14400 "$@" >"/tmp/r4cpu_$name.log" 2>&1; then
    touch "/tmp/r4cpu_${name}.ok"
    echo "$name OK $(date)"
    return 0
  fi
  echo "$name FAILED; tail:"
  tail -5 "/tmp/r4cpu_$name.log"
  return 1
}

run combos_cpu python scripts/make_combo_file.py \
    --metafile .soak/test_metafile.txt \
    --out .soak/eval/combos_cpu.txt --n 6

run regimes_cpu python synthesize_sentences_speaker.py --tts_config .soak \
    --sessions curve20k \
    --checkpoint .soak/checkpoints/.soak_curve20k/autoregressive_weights/14000 \
    --test_sentences .soak/test_metafile.txt \
    --combo_file .soak/eval/combos_cpu.txt \
    --ref_audio_dir .soak/wavs --spk_embed_dir .soak/spk_embeds \
    --regimes syn_norm rand text_rand style_rand \
    --out_dir .soak/eval/regimes_cpu --max_length 600 \
    --voc_config .soak_voccpu --voc_session cvoc

run regime_score_cpu env ETTS_CTC_ASR=.soak/ctc_asr.npz \
    python objective_measure.py --ref_dir .soak/wavs \
    --syn_dirs .soak/eval/regimes_cpu/curve20k/syn_norm \
               .soak/eval/regimes_cpu/curve20k/rand \
               .soak/eval/regimes_cpu/curve20k/text_rand \
               .soak/eval/regimes_cpu/curve20k/style_rand \
    --texts .soak/test_metafile.txt \
    --out artifacts/soak/all_score_r4cpu.log

for n in combos_cpu regimes_cpu regime_score_cpu; do
  tail -c 100K "/tmp/r4cpu_$n.log" > "artifacts/soak/r4cpu/$n.log" 2>/dev/null
done
git add artifacts/soak >/dev/null 2>&1
git diff --cached --quiet || git commit -q -m "r4 CPU contingency: 4-regime protocol all_score log" || true
echo "[cpu-contingency2] $(date) COMPLETE"
