"""Decisive vocoder worker-fault matrix (VERDICT r4 #3, round-5 phase 4).

What round 5 established so far (artifacts/soak/voc_phase_probe.json +
kernel_bisect{,2}.json):

  - the fused AR DECODER is exonerated (decode_fault_probe.json);
  - the sample loop crashes on the REAL trigger mels with TRAINED weights on
    BOTH the Pallas kernel and the lax.scan path — so the Pallas kernel
    itself is exonerated too;
  - synthetic conditioning (even NaN/Inf/x100) at the same geometry PASSES
    with random weights, and full generate() with random weights + OOD mels
    PASSES.

Remaining axes: {real mel values} x {trained weights} x {bucketed finalize
geometry} x {mel length}. This probe walks each axis with ONE subprocess per
cell, replicating ``wavernn.generate`` phase by phase with a hard
``block_until_ready`` + tiny ``device_get`` after every phase, so the child's
last PHASE_OK line names the faulting program even when the worker dies.

Variants (mode=pallas unless noted):
  raw        trigger mel verbatim (expected CRASH -> which phase?)
  clamp      mel clipped to the [0, 1] training range (the serving
             mitigation now default in generate(); PASS = value-triggered)
  nobucket   raw values, bucket=False (full==live folds; smaller finalize)
  randw      raw values through freshly-initialized weights (weights axis)
  short301   raw values truncated to 301 frames (length axis)
  raw_scan   raw, lax.scan sample loop (cross-check of voc_phase_probe)

Reference serving contract: fatchord batched generate
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
import os, sys
import numpy as np
import jax, jax.numpy as jnp
if os.environ.get("ETTS_FORCE_CPU"):
    # sitecustomize pins JAX_PLATFORMS=axon; only this call switches backends
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
config_dir, session, dump, mode, variant = sys.argv[1:6]
from etts.api import VocoderSynthesizer
from etts.models import wavernn as W

voc = VocoderSynthesizer(config_dir, session)
model, variables = voc.model, voc.variables
rec = np.load(dump)
mel = rec["mel"] if "mel" in rec.files else rec[sorted(rec.files)[0]]
if mel.ndim == 3:
    mel = mel[0]
bucket = True
if variant == "clamp":
    mel = np.clip(mel, 0.0, 1.0)
elif variant == "short301":
    mel = mel[:301]
elif variant == "nobucket":
    bucket = False
elif variant == "randw":
    x0 = jnp.zeros((1, (20 - 2 * model.pad) * model.hop_length))
    variables = model.init(jax.random.PRNGKey(1), x0,
                           jnp.asarray(mel[None, :20]), False)
print(f"VARIANT {variant} mode={mode} mel={mel.shape} "
      f"range=({mel.min():.3f},{mel.max():.3f})", flush=True)

target, overlap = 11000, 550
mels = jnp.asarray(mel, jnp.float32)[None]
t_mel = mels.shape[1]
wave_len = (t_mel - 1) * model.hop_length
if bucket:
    t_pad = W._bucket_len(t_mel)
    mels = jnp.pad(mels, ((0, 0), (0, t_pad - t_mel), (0, 0)))

def mark(name, x):
    x = jax.block_until_ready(x)
    head = x[0] if isinstance(x, tuple) else x
    probe = np.asarray(jax.device_get(jnp.ravel(head)[:4]))
    print(f"PHASE_OK {name} probe={probe[:2]}", flush=True)
    return x

mels_up, aux = mark("upsample_fold", W._upsample_and_fold(
    model, variables, mels, target, overlap, True))
cm = mark("cond_stats", (jnp.max(jnp.abs(mels_up)), jnp.max(jnp.abs(aux))))
print(f"COND_MAX mels_up={float(cm[0]):.6g} aux={float(cm[1]):.6g}",
      flush=True)
full = mels_up.shape[0]
if bucket:
    live = W._live_folds(t_mel * model.hop_length, target, overlap, full)
    mels_up, aux = mels_up[:live], aux[:live]
print(f"GEOM t_mel={t_mel} full={full} live={mels_up.shape[0]} "
      f"fold_len={mels_up.shape[1]}", flush=True)
if mode == "pallas":
    output = mark("sample_pallas", W._run_pallas_loop(
        model, variables["params"], mels_up, aux, jax.random.PRNGKey(0)))
else:
    streams, w = W._conditioning_streams(model, variables["params"],
                                         mels_up, aux)
    output = mark("sample_scan", W._run_sample_loop(
        model, streams, w, jax.random.PRNGKey(0)))
if output.shape[0] < full:
    output = mark("pad_rows",
                  jnp.pad(output, ((0, full - output.shape[0]), (0, 0))))
out = mark("finalize", W._finalize_jit(model, output, True, overlap, False,
                                       jnp.int32(wave_len)))
wav = np.asarray(out[:wave_len])
print(f"TRANSFER_OK wav={wav.shape} finite={bool(np.isfinite(wav).all())}",
      flush=True)
print("CHILD_OK", flush=True)
"""

CELLS = [  # (mode, variant)
    ("pallas", "raw"),
    ("pallas", "clamp"),
    ("pallas", "nobucket"),
    ("pallas", "randw"),
    ("pallas", "short301"),
    ("scan", "raw"),
]


def tpu_ok(timeout=300):
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax,jax.numpy as jnp;"
             "jax.jit(lambda a:a+1)(jnp.zeros(())).block_until_ready();"
             "print('TPU OK')"],
            capture_output=True, text=True, timeout=timeout)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--session_name", required=True)
    p.add_argument("--dump", required=True, help="one mel_*.npz trigger dump")
    p.add_argument("--out", required=True)
    p.add_argument("--timeout", type=int, default=2400)
    p.add_argument("--cells", nargs="*", default=None,
                   help="subset like pallas:raw scan:raw")
    a = p.parse_args()

    cells = ([tuple(c.split(":", 1)) for c in a.cells] if a.cells else CELLS)
    out_path = Path(a.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    cases = []
    for mode, variant in cells:
        t0 = time.time()
        # the probe owns OOD handling per-variant; disable the API clamp
        env = dict(os.environ, ETTS_VOC_NO_CLAMP="1")
        env.pop("ETTS_DUMP_COND", None)
        try:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD, a.config, a.session_name,
                 a.dump, mode, variant],
                capture_output=True, text=True, timeout=a.timeout, env=env)
            ok = proc.returncode == 0 and "CHILD_OK" in proc.stdout
            phases = [ln for ln in proc.stdout.splitlines()
                      if ln.startswith(("PHASE_OK", "COND_MAX", "GEOM",
                                        "VARIANT", "TRANSFER_OK"))]
            tail = proc.stderr.strip().splitlines()[-12:]
            rc = proc.returncode
        except subprocess.TimeoutExpired as e:
            ok, rc = False, -9
            phases = [ln for ln in (e.stdout or "").splitlines()
                      if ln.startswith(("PHASE_OK", "COND_MAX", "GEOM",
                                        "VARIANT"))]
            tail = ["TIMEOUT"]
        case = {"mode": mode, "variant": variant, "ok": ok, "rc": rc,
                "sec": round(time.time() - t0, 1), "phases": phases,
                "tail": tail if not ok else tail[-2:]}
        cases.append(case)
        print(json.dumps(case), flush=True)
        # incremental record: a later cell's crash cannot discard this one
        out_path.write_text(json.dumps({"dump": a.dump, "cases": cases},
                                       indent=1))
        if not ok:
            for _ in range(20):
                time.sleep(30)
                if tpu_ok():
                    break
    print(f"wrote {a.out}: "
          f"{sum(c['ok'] for c in cases)}/{len(cases)} cells pass")


if __name__ == "__main__":
    main()
