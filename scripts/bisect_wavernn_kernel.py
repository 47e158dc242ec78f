"""Bisect the WaveRNN Pallas kernel's long-mel TPU fault (ROADMAP r5 #5).

Round-4 evidence: the fused sample loop (`etts/ops/pallas/wavernn_cell.py`)
deterministically crashes the v5e worker on the regime protocol's long-mel
vocodes (~10 fold rows -> padded B=16, T=12100 per fold) while B in {1..8}
and B=56/T=12100 (bench --serve) run fine, and the same mels vocode cleanly
through the lax.scan loop (so the data is finite; the fault is the kernel).

This sweep runs each (B, T) geometry in a SUBPROCESS with synthetic finite
conditioning, so a worker crash marks one grid point and the sweep
continues after the backend recovers. Run on the TPU host:

    python scripts/bisect_wavernn_kernel.py            # default grid
    python scripts/bisect_wavernn_kernel.py --bs 10 16 24 --ts 6050 12100

Interpretation: CRASH at (16, 12100) but PASS at (16, 6050) points at the
grid-step count (T_pad/chunk) interacting with the padded-B layout; CRASH
only when cond comes from a real runaway mel would point at data after all.
Reference for the serving contract this kernel accelerates:
`/root/reference/WaveRNN/models/fatchord_version.py:180-220`.
"""
import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import _bootstrap  # noqa: E402,F401

CHILD = r"""
import sys
import jax, jax.numpy as jnp
B, T, mode = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
variant = sys.argv[4] if len(sys.argv) > 4 else "normal"
sys.path.insert(0, "/root/repo")
from etts.ops.pallas.wavernn_cell import wavernn_sample_loop

if variant.startswith("trained"):
    # phase 3 (round 5): every prior grid point used RANDOM weights — the
    # trained-weights ingredient was never isolated. Load the vocsoak
    # checkpoint and run the kernel on synthetic cond at the crash geometry.
    from etts.utils.config import ConfigManager, _init_variables
    from etts.utils.checkpoints import CheckpointManager
    cm = ConfigManager(".soak", "wavernn", "vocsoak")
    model = cm.get_model()
    variables = _init_variables(model, cm.config, "wavernn")
    mngr = CheckpointManager(cm.weights_dir)
    restored, step = mngr.restore({"params": variables["params"]},
                                  partial=True)
    assert step is not None, "no trained vocoder checkpoint"
    p = restored["params"]
    d = model.rnn_dims
    feat, adim = model.feat_dims, model.aux_dims
    mode = model.mode
    k = jax.random.PRNGKey(0)
    cond = jax.random.normal(k, (T, B, feat + 4 * adim)) * 0.5
    if variant == "trained_big":
        cond = cond * 40.0  # runaway-mel-scale conditioning
    Wf1, bf1 = p["fc1"]["kernel"], p["fc1"]["bias"]
    Wf2, bf2 = p["fc2"]["kernel"], p["fc2"]["bias"]
    out = wavernn_sample_loop(
        cond, p["I"]["kernel"], p["I"]["bias"],
        p["rnn1_wi"], p["rnn1_wh"], p["rnn1_bi"], p["rnn1_bh"],
        p["rnn2_wi"][:d], p["rnn2_wi"][d:], p["rnn2_wh"],
        p["rnn2_bi"], p["rnn2_bh"],
        Wf1[:d], Wf1[d:], bf1, Wf2[:model.fc_dims], Wf2[model.fc_dims:], bf2,
        p["fc3"]["kernel"], p["fc3"]["bias"], seed=7,
        feat=feat, adim=adim, mode=mode, n_classes=model.n_classes)
    out.block_until_ready()
    import numpy as np
    np.asarray(out)
    print("CHILD_OK", out.shape)
    sys.exit(0)

d, fc, feat, adim = 512, 512, 80, 32
n_out = 30 if mode == "MOL" else 512
k = jax.random.PRNGKey(0)
ks = iter(jax.random.split(k, 24))
s = 0.08
w = lambda shape: jax.random.normal(next(ks), shape, jnp.float32) * s
cond = jax.random.normal(next(ks), (T, B, feat + 4 * adim)) * 0.5
# phase-2 variants: the full grid PASSED with finite normal cond, so the
# regimes2 worker fault must be data-dependent (the crashing combo free-ran
# to the length cap -> runaway mels feeding the upsampler)
if variant == "scale50":
    cond = cond * 100.0
elif variant == "nan":
    cond = cond.at[T // 2 :, :, :].set(jnp.nan)
elif variant == "inf":
    cond = cond.at[T // 2 :, :, :].set(jnp.inf)
out = wavernn_sample_loop(
    cond, w((1 + feat + adim, d)), w((d,)),
    w((d, 3 * d)), w((d, 3 * d)), w((3 * d,)), w((3 * d,)),
    w((d, 3 * d)), w((adim, 3 * d)), w((d, 3 * d)), w((3 * d,)), w((3 * d,)),
    w((d, fc)), w((adim, fc)), w((fc,)),
    w((fc, fc)), w((adim, fc)), w((fc,)),
    w((fc, n_out)), w((n_out,)), seed=7,
    feat=feat, adim=adim, mode=mode, n_classes=n_out)
out.block_until_ready()
import numpy as np
if variant == "normal":
    assert np.isfinite(np.asarray(out[-8:])).all()
else:
    np.asarray(out)  # device readback only: the probe is "does it crash"
print("CHILD_OK", out.shape)
"""

# full generate() path with random weights (upsampler + fold + kernel +
# crossfade): covers the possibility that the fault lives OUTSIDE the
# sample loop. mel values: "runaway" free-running mels renormed (mel+4)/8
# can leave [0, 1]; the extreme variant feeds exactly that.
CHILD_FULL = r"""
import sys
import jax, jax.numpy as jnp, numpy as np
t_mel, variant = int(sys.argv[1]), sys.argv[2]
sys.path.insert(0, "/root/repo")
from etts.models.wavernn import WaveRNN, generate
model = WaveRNN(mode="MOL")  # reference scale (512/512, hop 200)
k = jax.random.PRNGKey(0)
mel = jax.random.uniform(k, (1, t_mel, 80))
if variant == "extreme":
    mel = mel * 3.0 - 1.0   # leaves [0,1] the way runaway TTS mels do
elif variant == "nan":
    mel = mel.at[:, t_mel // 2 :, :].set(jnp.nan)
x0 = jnp.zeros((1, (20 - 2 * model.pad) * model.hop_length))
variables = model.init(jax.random.PRNGKey(1), x0, mel[:, :20], False)
wav = generate(model, variables, mel, mu_law=False, key=k, bucket=True)
np.asarray(wav)
print("CHILD_OK", wav.shape)
"""


def probe(timeout=300):
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax,jax.numpy as jnp;"
         "jax.jit(lambda a:a+1)(jnp.zeros(())).block_until_ready();"
         "print('TPU OK')"],
        capture_output=True, text=True, timeout=timeout)
    return r.returncode == 0


def _run_point(key, argv, results, timeout):
    r = subprocess.run(argv, capture_output=True, text=True, timeout=timeout)
    ok = r.returncode == 0 and "CHILD_OK" in r.stdout
    results[key] = "PASS" if ok else "CRASH"
    print(f"{key}: {results[key]}"
          + ("" if ok else f"  [{r.stderr.strip().splitlines()[-1][:120] if r.stderr.strip() else 'no stderr'}]"),
          flush=True)
    if not ok:
        # worker may be restarting; wait for the backend before the next
        # grid point so one crash doesn't cascade
        for _ in range(20):
            time.sleep(30)
            try:
                if probe():
                    break
            except subprocess.TimeoutExpired:
                pass


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, nargs="*", default=[8, 10, 16, 24, 56])
    p.add_argument("--ts", type=int, nargs="*", default=[6050, 12100])
    p.add_argument("--mode", default="MOL", choices=["MOL", "RAW"])
    p.add_argument("--timeout", type=int, default=600)
    p.add_argument("--out", default="artifacts/soak/kernel_bisect.json")
    p.add_argument("--phase3", action="store_true",
                   help="trained-weights isolation: the vocsoak checkpoint "
                   "+ synthetic cond at the crash geometry (every prior "
                   "grid point used random weights)")
    p.add_argument("--phase2", action="store_true",
                   help="data-dependence sweep (the full geometry grid "
                   "PASSED with finite cond): extreme/NaN/Inf conditioning "
                   "into the kernel, plus the FULL generate() path at the "
                   "regimes crash length with in-range / runaway / NaN mels")
    a = p.parse_args()

    results = {}
    if a.phase3:
        for B, T, variant in ((11, 12100, "trained"), (16, 12100, "trained"),
                              (16, 12100, "trained_big"),
                              (8, 12100, "trained"), (16, 6050, "trained")):
            _run_point(f"kernel_B{B}_T{T}_{variant}",
                       [sys.executable, "-c", CHILD, str(B), str(T), a.mode,
                        variant], results, a.timeout)
    elif a.phase2:
        for variant in ("scale50", "nan", "inf"):
            _run_point(f"kernel_B16_T12100_{variant}",
                       [sys.executable, "-c", CHILD, "16", "12100", a.mode,
                        variant], results, a.timeout)
        # t_mel 604 ~ the regimes crash combo (--max_length 600 + sentinels):
        # ~120k samples -> 11 fold rows -> padded B=16, fold len 12100
        for variant in ("normal", "extreme", "nan"):
            _run_point(f"fullgen_t604_{variant}",
                       [sys.executable, "-c", CHILD_FULL, "604", variant],
                       results, a.timeout)
    else:
        for T in a.ts:
            for B in a.bs:
                _run_point(f"B{B}_T{T}",
                           [sys.executable, "-c", CHILD, str(B), str(T),
                            a.mode], results, a.timeout)
    Path(a.out).parent.mkdir(parents=True, exist_ok=True)
    Path(a.out).write_text(json.dumps(results, indent=1))
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
