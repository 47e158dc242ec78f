"""Multi-host (multi-process) data-parallel training over a DCN-style mesh.

Spawns two real OS processes, each owning 2 virtual CPU devices, joined via
``jax.distributed`` (gloo over localhost). Both run ONE jitted DP train step
through the actual driver helpers (init_multihost / local_shard / shard_batch /
replicate) and must agree with each other AND with a single-process run of the
same global batch. SURVEY §2.5 multi-host obligation.
"""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = ["-m", "etts.parallel._multihost_worker"]


def _run_worker(port, pid, nprocs, devices=2):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={devices}",
               PYTHONPATH=REPO)
    return subprocess.Popen(
        [sys.executable, *WORKER, "--port", str(port),
         "--process_id", str(pid), "--num_processes", str(nprocs)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)


def _loss_of(out: str) -> float:
    m = re.search(r"MULTIHOST_LOSS ([-\d.einf]+)", out)
    assert m, f"no MULTIHOST_LOSS in output:\n{out}"
    return float(m.group(1))


def test_two_process_dp_matches_single_process():
    # single-process reference: same global batch, 4 local devices
    ref = _run_worker(_free_port(), 0, 1, devices=4)
    ref_out, _ = ref.communicate(timeout=600)
    assert ref.returncode == 0, ref_out
    ref_loss = _loss_of(ref_out)

    # two processes x 2 devices = the same 4-device global mesh over "DCN"
    port = _free_port()
    procs = [_run_worker(port, pid, 2) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out
    losses = [_loss_of(o) for o in outs]
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    np.testing.assert_allclose(losses[0], ref_loss, rtol=2e-4)


def _run_worker_ckpt(port, pid, nprocs, ckpt_dir, devices=2):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={devices}",
               PYTHONPATH=REPO)
    return subprocess.Popen(
        [sys.executable, *WORKER, "--port", str(port),
         "--process_id", str(pid), "--num_processes", str(nprocs),
         "--ckpt_dir", str(ckpt_dir)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)


def test_two_process_checkpoint_save_restore_and_logging(tmp_path):
    """VERDICT r2 #7: a checkpoint saved mid-run by the 2-process group can be
    restored by BOTH processes (identical continued loss), and only the
    primary process writes TensorBoard event files."""
    ckpt_dir = tmp_path / "ckpts"
    port = _free_port()
    procs = [_run_worker_ckpt(port, pid, 2, ckpt_dir) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out
    resume = []
    for out in outs:
        m = re.search(r"MULTIHOST_RESUME_LOSS ([-\d.einf]+)", out)
        assert m, f"no MULTIHOST_RESUME_LOSS in output:\n{out}"
        resume.append(float(m.group(1)))
    np.testing.assert_allclose(resume[0], resume[1], rtol=1e-6)
    # exactly one saved step, no duplicate/racing step dirs
    step_dirs = [d for d in ckpt_dir.iterdir()
                 if d.is_dir() and d.name.isdigit()]
    assert len(step_dirs) == 1, sorted(d.name for d in step_dirs)
    # primary-only TB events: one writer -> one event file
    events = list((ckpt_dir / "logs").rglob("events.out.tfevents.*"))
    assert len(events) == 1, events
