"""Localize the TPU worker fault: fused AR decode kernel vs vocoder phases.

Evidence (round-5a): eval_soak / synthesize_sentences_speaker kill the TPU
worker at the FIRST vocoder device sync, while `tts.predict` (which host-syncs
its mel) has already completed — the classic signature of an out-of-bounds
write in an earlier kernel corrupting worker state that the NEXT program trips
over. The only Pallas program preceding the crash point is the fused decoder
kernel (`etts/ops/pallas/decoder_step.py`) at eval geometry max_length=600;
bench decodes far shorter and survives.

Each case runs in a SUBPROCESS (the worker fault must not kill the sweep):
    1. restore the AR checkpoint, predict the first held-out row EXACTLY as
       eval_soak does (same key/max_length/conditioning),
    2. after predict's own host sync, run a fresh trivial jit program + sync
       (any corruption surfaces HERE, with no vocoder involvement),
    3. a 1024x1024 matmul + sync,
    4. if --vocoder_session: vocode the mel with ETTS_VOC_SYNC=1.
Cases: fused @600, while_loop @600 (ETTS_NO_FUSED_DECODE=1), fused @120.
If (fused600 crashes at step 2) and (wl600 passes all steps), the decoder
kernel is the criminal and the vocoder kernel is exonerated.

    python scripts/decode_fault_probe.py --config .soak --session curve20k \
        --checkpoint .soak/checkpoints/.soak_curve20k/autoregressive_weights/14000 \
        --vocoder_session vocsoak --out artifacts/soak/decode_fault_probe.json
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
sys.path.insert(0, "/root/repo")
(config_dir, session, checkpoint, voc_session, max_length, utt_idx) = sys.argv[1:7]
max_length, utt_idx = int(max_length), int(utt_idx)
from pathlib import Path
from etts.api import TTSSynthesizer
from etts.data.audio_io import load_wav

tts = TTSSynthesizer(config_dir, session, checkpoint=checkpoint or None)
cfg_dir = Path(tts.config.get("data_directory") or config_dir)
rows = []
with open(cfg_dir / "test_metafile.txt", encoding="utf-8") as f:
    for line in f:
        parts = line.strip().split("|")
        if len(parts) >= 2:
            rows.append((parts[0], parts[1]))
uid, text = rows[utt_idx]
gt, _ = load_wav(str(cfg_dir / "wavs" / f"{uid}.wav"), tts.config["sampling_rate"])
ref_mel = tts.mel_from_wav(gt)
spk = None
spk_path = cfg_dir / "spk_embeds" / f"{uid}.npy"
if getattr(tts.model, "has_speaker", False) and spk_path.exists():
    spk = np.load(spk_path)
print("STEP predict", flush=True)
out = tts.predict(text, ref_mel=ref_mel, spk_embed=spk,
                  max_length=max_length, key=jax.random.PRNGKey(utt_idx))
mel = out["mel"]
print(f"STEP predict done mel={mel.shape} finite={bool(np.isfinite(mel).all())} "
      f"range=({float(mel.min()):.2f},{float(mel.max()):.2f})", flush=True)
print("STEP trivial_jit", flush=True)
x = jax.jit(lambda a: a + 1)(jnp.zeros(()))
x.block_until_ready()
print("STEP trivial_jit done", flush=True)
print("STEP matmul", flush=True)
m = jax.jit(lambda a: a @ a)(jnp.ones((1024, 1024), jnp.bfloat16))
m.block_until_ready()
print("STEP matmul done", flush=True)
if voc_session:
    print("STEP vocoder", flush=True)
    from etts.api import VocoderSynthesizer
    voc = VocoderSynthesizer(config_dir, voc_session)
    wav = voc.generate((mel + 4.0) / 8.0, key=jax.random.PRNGKey(1000))
    print(f"STEP vocoder done wav={wav.shape} "
          f"finite={bool(np.isfinite(wav).all())}", flush=True)
print("CHILD_OK", flush=True)
"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--session", required=True)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--vocoder_session", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--utt", type=int, default=0)
    p.add_argument("--timeout", type=int, default=3600)
    p.add_argument("--cases", nargs="*",
                   default=["fused600", "wl600", "fused120"])
    a = p.parse_args()

    specs = {
        "fused600": (600, {}),
        "wl600": (600, {"ETTS_NO_FUSED_DECODE": "1"}),
        "fused120": (120, {}),
        "wl120": (120, {"ETTS_NO_FUSED_DECODE": "1"}),
    }
    results = []
    for name in a.cases:
        max_len, extra_env = specs[name]
        env = dict(os.environ, ETTS_VOC_SYNC="1", **extra_env)
        env.pop("ETTS_DUMP_COND", None)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", CHILD, a.config, a.session, a.checkpoint,
             a.vocoder_session, str(max_len), str(a.utt)],
            capture_output=True, text=True, timeout=a.timeout, env=env)
        steps = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("STEP") or ln == "CHILD_OK"]
        ok = proc.returncode == 0 and "CHILD_OK" in proc.stdout
        # the last STEP line without a matching "done" is where it died
        died_at = None
        if not ok and steps:
            last = steps[-1]
            died_at = last.replace("STEP ", "").split()[0] \
                if last.startswith("STEP") and "done" not in last else \
                "after:" + last.replace("STEP ", "").split()[0]
        case = {"case": name, "ok": ok, "rc": proc.returncode,
                "died_at": died_at, "sec": round(time.time() - t0, 1),
                "steps": steps, "stderr_tail":
                    proc.stderr.strip().splitlines()[-30:]}
        results.append(case)
        print(json.dumps({k: case[k] for k in
                          ("case", "ok", "rc", "died_at", "sec")}),
              flush=True)
        time.sleep(30)  # give a crashed worker time to restart
    Path(a.out).write_text(json.dumps({"cases": results}, indent=1))
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
