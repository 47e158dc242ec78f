"""Replay ETTS_DUMP_COND crash dumps through the fused WaveRNN kernel.

Kernel-fault phase 3 (VERDICT r4 #3): the synthetic geometry/data sweeps all
PASS (`artifacts/soak/kernel_bisect{,2}.json`), so the regimes-protocol
worker fault must depend on the exact (trained weights, real conditioning)
pair. The regime rerun now dumps the exact tensor entering the kernel
(`etts/models/wavernn.py::_run_pallas_loop`, env ``ETTS_DUMP_COND``); this
script replays each dump with the TRAINED vocoder weights in a SUBPROCESS,
so a worker crash marks the case and the sweep continues. Also replays a
sanitized copy of each dump to check the `_sanitize_cond` mitigation.

    python scripts/kernel_replay.py --config .soak --session_name vocsoak \
        --dump_dir .soak/conddump --out artifacts/soak/kernel_replay.json

Reference for the serving contract: fatchord WaveRNN batched generate
(`/root/reference/WaveRNN/models/fatchord_version.py:150-243`).
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
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
config_dir, session, dump, sanitize = sys.argv[1:5]
from etts.utils.config import ConfigManager, _init_variables
from etts.utils.checkpoints import CheckpointManager
from etts.models.wavernn import _run_pallas_loop, _sanitize_cond

cm = ConfigManager(config_dir, "wavernn", session)
model = cm.get_model()
variables = _init_variables(model, cm.config, "wavernn")
mngr = CheckpointManager(cm.weights_dir)
restored, step = mngr.restore({"params": variables["params"]}, partial=True)
assert step is not None, "no trained vocoder checkpoint"
params = restored["params"]

rec = np.load(dump)
cond = jnp.asarray(rec["cond"])  # (T, B, feat + 4*adim), pre-sanitize layout
if sanitize == "1":
    cond = _sanitize_cond(cond)
T, B, C = cond.shape
feat, adim = model.feat_dims, model.aux_dims
mels_up = jnp.swapaxes(cond[:, :, :feat], 0, 1)
aux = jnp.swapaxes(cond[:, :, feat:], 0, 1)
out = _run_pallas_loop(model, params, mels_up, aux, jax.random.PRNGKey(0))
out.block_until_ready()
arr = np.asarray(out)
print("CHILD_OK", arr.shape, "finite", bool(np.isfinite(arr).all()))
"""


def probe(timeout=300):
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax,jax.numpy as jnp;"
         "jax.jit(lambda a:a+1)(jnp.zeros(())).block_until_ready();"
         "print('TPU OK')"],
        capture_output=True, text=True, timeout=timeout)
    return r.returncode == 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--session_name", default="vocsoak")
    p.add_argument("--dump_dir", required=True)
    p.add_argument("--timeout", type=int, default=900)
    p.add_argument("--out", default="artifacts/soak/kernel_replay.json")
    a = p.parse_args()

    dumps = sorted(Path(a.dump_dir).glob("cond_*.npz"))
    results = {}
    if not dumps:
        results["note"] = f"no dumps under {a.dump_dir}"
    for dump in dumps:
        rec_stats = {}
        import numpy as np
        c = np.load(dump)["cond"]
        rec_stats["shape"] = list(c.shape)
        rec_stats["nan"] = int(np.isnan(c).sum())
        rec_stats["inf"] = int(np.isinf(c).sum())
        rec_stats["absmax"] = float(np.abs(c[np.isfinite(c)]).max()
                                    if np.isfinite(c).any() else np.nan)
        for sanitize in ("0", "1"):
            key = f"{dump.name}_sanitize{sanitize}"
            r = subprocess.run(
                [sys.executable, "-c", CHILD, a.config, a.session_name,
                 str(dump), sanitize],
                capture_output=True, text=True, timeout=a.timeout)
            ok = r.returncode == 0 and "CHILD_OK" in r.stdout
            results[key] = ("PASS " + r.stdout.strip().splitlines()[-1]
                            if ok else "CRASH " + (
                                r.stderr.strip().splitlines()[-1][:200]
                                if r.stderr.strip() else "no stderr"))
            print(f"{key}: {results[key]}", flush=True)
            if not ok:  # wait for the worker before the next case
                for _ in range(20):
                    time.sleep(30)
                    try:
                        if probe():
                            break
                    except subprocess.TimeoutExpired:
                        pass
        results[f"{dump.name}_stats"] = rec_stats
    Path(a.out).parent.mkdir(parents=True, exist_ok=True)
    Path(a.out).write_text(json.dumps(results, indent=1))
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
