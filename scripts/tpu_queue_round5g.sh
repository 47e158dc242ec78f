#!/bin/bash
# Round-5g wrap-up queue: runs after round-5f completes.
#   1. One more pass of the 5f script — run() .ok markers skip everything
#      that succeeded, so this retries only the failed jobs (with the
#      per-mel-isolated vocode_dir that landed mid-5f).
#   2. A final fresh bench record (also re-warms .jax_cache for the
#      driver's end-of-round BENCH_r05 capture).
# Strictly serial; one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
export ETTS_VOC_SYNC=1
echo $$ > /tmp/queue5g.pid

until [ -f /tmp/queue5f.done ]; do sleep 120; done
echo "[queue5g] $(date) 5f done; retry pass"

bash /tmp/queue5f_run.sh >> /tmp/queue5f_retry.log 2>&1 || true

echo "[queue5g] $(date) final bench"
if timeout 3600 python bench.py > /tmp/r5g_bench_final.log 2>&1; then
  tail -c 200K /tmp/r5g_bench_final.log > artifacts/soak/r5/bench_final.log
  git add artifacts/soak/r5/bench_final.log >/dev/null 2>&1
  git diff --cached --quiet || git commit -q -m "queue r5g: final bench record" || true
fi
touch /tmp/queue5g.done
echo "[queue5g] $(date) COMPLETE"
