"""Replay ETTS_DUMP_COND mel dumps through the vocoder, phase-synced.

Kernel-fault forensics phase 0b (VERDICT r4 #3): the round-5a crashes
surfaced at the COND dump's own device_get — the worker died executing device
work enqueued BEFORE the sample kernel (AR decode had already host-synced, so
the suspect set is the upsample/fold program or the conditioning concat).
``etts/models/wavernn.py::generate`` now persists the host-side input mel
before any vocoder device work; this script replays each saved mel in a
SUBPROCESS with ``ETTS_VOC_SYNC=1``, so a worker fault's traceback names the
phase that enqueued the faulting program (upsample vs cond vs sample kernel
vs finalize) and the sweep survives the crash.

    python scripts/voc_phase_probe.py --config .soak --session_name vocsoak \
        --dump_dir .soak/conddump_eval --out artifacts/soak/voc_phase_probe.json

Serving contract under test: fatchord WaveRNN batched generate
(`/root/reference/WaveRNN/models/fatchord_version.py:150-243`).
"""
import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import _bootstrap  # noqa: E402,F401

CHILD = r"""
import os
import sys
import numpy as np
import jax
if os.environ.get("ETTS_FORCE_CPU"):
    # sitecustomize pins JAX_PLATFORMS=axon; only this call switches backends
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
config_dir, session, dump, use_pallas = sys.argv[1:5]
from etts.api import VocoderSynthesizer

voc = VocoderSynthesizer(config_dir, session)
rec = np.load(dump)
mel_keys = sorted(k for k in rec.files if k.startswith("mel"))
mel_keys = [k for k in mel_keys if k not in ("mel_counter",)]
kw = {}
if use_pallas == "scan":
    kw["use_pallas"] = False
for k in mel_keys:
    mel = rec[k]
    if mel.ndim == 3:
        mel = mel[0]
    print(f"PHASE mel={k} shape={mel.shape} "
          f"finite={bool(np.isfinite(mel).all())} "
          f"range=({float(mel.min()):.3f},{float(mel.max()):.3f})",
          flush=True)
    wav = voc.generate(mel, key=jax.random.PRNGKey(0), **kw)
    print(f"DONE {k} wav={wav.shape} finite={bool(np.isfinite(wav).all())}",
          flush=True)
print("CHILD_OK", flush=True)
"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--session_name", required=True)
    p.add_argument("--dump_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--timeout", type=int, default=1800)
    p.add_argument("--modes", nargs="*", default=["pallas", "scan"])
    a = p.parse_args()

    dumps = sorted(Path(a.dump_dir).glob("mel_*.npz"))
    if not dumps:
        print(f"no mel_*.npz dumps in {a.dump_dir}")
        Path(a.out).write_text(json.dumps({"dumps": 0, "cases": []}))
        return

    cases = []
    for dump in dumps:
        for mode in a.modes:
            t0 = time.time()
            env = dict(os.environ, ETTS_VOC_SYNC="1", ETTS_DUMP_COND="")
            env.pop("ETTS_DUMP_COND", None)
            proc = subprocess.run(
                [sys.executable, "-c", CHILD, a.config, a.session_name,
                 str(dump), mode],
                capture_output=True, text=True, timeout=a.timeout, env=env)
            ok = proc.returncode == 0 and "CHILD_OK" in proc.stdout
            tail = (proc.stdout.strip().splitlines()[-6:]
                    + proc.stderr.strip().splitlines()[-30:])
            case = {"dump": dump.name, "mode": mode, "ok": ok,
                    "rc": proc.returncode, "sec": round(time.time() - t0, 1),
                    "tail": tail}
            cases.append(case)
            print(json.dumps(case), flush=True)
    summary = {"dumps": len(dumps), "cases": cases,
               "all_ok": all(c["ok"] for c in cases)}
    Path(a.out).write_text(json.dumps(summary, indent=1))
    print(f"wrote {a.out}: all_ok={summary['all_ok']}")


if __name__ == "__main__":
    main()
