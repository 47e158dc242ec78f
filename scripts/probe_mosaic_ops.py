"""Probe which Mosaic/Pallas TPU ops legalize on this toolchain (ROADMAP r5 #4).

The WaveRNN kernel's int8 mode currently dequantizes the FULL weight
matrices on the VPU every sample step (`wavernn_cell.py::wdot`), which round-4
measured as a net loss at B=8 (80.3 ms vs 75.6 ms bf16). The fix is int8xint8
dots on the MXU with in-kernel activation quantization — but that needs ops
the kernel's comments record as non-legalizable on an earlier toolchain
(`sitofp`, float iota). Each probe runs in a SUBPROCESS so a Mosaic
legalization error or worker fault marks one probe and the sweep continues.

Writes one JSON line per probe + a summary to --out.
"""
import argparse
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import _bootstrap  # noqa: E402,F401

PROBES = {
    # f32 -> int8 (fptosi + trunc): activation quantization needs this
    "f32_to_i8": r"""
def kernel(x_ref, o_ref):
    q = jnp.clip(jnp.round(x_ref[:] * 12.7), -127, 127).astype(jnp.int8)
    o_ref[:] = q
x = jax.random.normal(jax.random.PRNGKey(0), (8, 256), jnp.float32)
out = pl.pallas_call(kernel,
    out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int8))(x)
ref = np.clip(np.round(np.asarray(x) * 12.7), -127, 127).astype(np.int8)
assert (np.asarray(out) == ref).mean() > 0.999, "value mismatch"
""",
    # i8 x i8 -> i32 MXU dot
    "i8_dot_i32": r"""
def kernel(a_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
k = jax.random.PRNGKey(0)
a = jax.random.randint(k, (8, 512), -127, 128, jnp.int8)
w = jax.random.randint(jax.random.fold_in(k, 1), (512, 256), -63, 64, jnp.int8)
out = pl.pallas_call(kernel,
    out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32))(a, w)
ref = np.asarray(a, np.int32) @ np.asarray(w, np.int32)
assert (np.asarray(out) == ref).all(), "value mismatch"
""",
    # i32 -> f32 (sitofp): recorded as non-legalizable on the round-2 toolchain
    "i32_to_f32": r"""
def kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:].astype(jnp.float32) * 0.5
x = jax.random.randint(jax.random.PRNGKey(0), (8, 256), -100000, 100000,
                       jnp.int32)
out = pl.pallas_call(kernel,
    out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32))(x)
ref = np.asarray(x, np.float32) * 0.5
assert np.allclose(np.asarray(out), ref), "value mismatch"
""",
    # i8 -> bf16 (current dequant path; known-good control)
    "i8_to_bf16": r"""
def kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:].astype(jnp.bfloat16) * jnp.bfloat16(2.0)
x = jax.random.randint(jax.random.PRNGKey(0), (8, 256), -127, 128, jnp.int8)
out = pl.pallas_call(kernel,
    out_shape=jax.ShapeDtypeStruct((8, 256), jnp.bfloat16))(x)
ref = np.asarray(x, np.float32) * 2.0
assert np.allclose(np.asarray(out, np.float32), ref), "value mismatch"
""",
    # bf16 x bf16 dot where one side was int8-dequantized in-register but the
    # dot contracts 512 at once (the shape the real kernel uses)
    "i8_dequant_dot": r"""
def kernel(a_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], w_ref[:].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
k = jax.random.PRNGKey(0)
a = jax.random.normal(k, (8, 512), jnp.bfloat16)
w = jax.random.randint(jax.random.fold_in(k, 1), (512, 1536), -63, 64,
                       jnp.int8)
out = pl.pallas_call(kernel,
    out_shape=jax.ShapeDtypeStruct((8, 1536), jnp.float32))(a, w)
ref = np.asarray(a, np.float32) @ np.asarray(w, np.float32)
assert np.allclose(np.asarray(out), ref, rtol=2e-2, atol=2.0), "mismatch"
""",
}

HEADER = r"""
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="artifacts/soak/mosaic_ops_probe.json")
    p.add_argument("--timeout", type=int, default=300)
    a = p.parse_args()

    results = {}
    for name, body in PROBES.items():
        r = subprocess.run([sys.executable, "-c",
                            HEADER + body + "\nprint('PROBE_OK')"],
                           capture_output=True, text=True, timeout=a.timeout)
        ok = r.returncode == 0 and "PROBE_OK" in r.stdout
        err = ""
        if not ok:
            lines = [ln for ln in r.stderr.strip().splitlines() if ln.strip()]
            err = lines[-1][:200] if lines else "no stderr"
        results[name] = {"ok": ok, "err": err}
        print(f"{name}: {'OK' if ok else 'FAIL  [' + err + ']'}", flush=True)
    Path(a.out).parent.mkdir(parents=True, exist_ok=True)
    Path(a.out).write_text(json.dumps(results, indent=1))
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
