"""Preflight-validate the staged TPU job queue without touching the TPU.

Parses ``scripts/tpu_queue_round4.sh`` (or any queue file in the same
``run <name> <cmd...>`` format), and for every job checks, CPU-only:

1. the script file exists;
2. every ``--flag`` the job passes is recognized by the script's argparse
   (discovered by running ``<script> --help`` with ``ETTS_FORCE_CPU=1``);
3. every argument that names an *input* path exists on disk — output paths
   and paths that an earlier queue job (setup/train) creates are waived.

This exists because each queue job runs under ``timeout 5400`` with one
retry: a single unrecognized flag or missing asset burns three hours of
scarce tunnel time. Run it after every queue edit:

    ETTS_FORCE_CPU=1 python scripts/preflight_queue.py

Exit code 0 = queue is launch-ready; 1 = at least one finding.
"""
from __future__ import annotations

import os
import re
import shlex
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

OUTPUT_FLAGS = {"--out", "--out_dir", "--out_path", "--profile_dir"}
# Prefixes a setup/train job in the queue creates before they are consumed.
# Since the 2026-08-18 host wipe the whole .soak* tree is queue-created
# (scripts/bootstrap_soak_r4.sh + the curve20k retrain + the setup_* jobs).
CREATED_BY_QUEUE = (".soak",)


def parse_queue(path: Path):
    """Yield (job_name, argv) per ``run`` line; follows ``\\`` continuations
    and expands the queue's simple ``for CK in ...`` loops."""
    text = re.sub(r"\\\n\s*", " ", path.read_text())
    jobs = []
    loop_vals: list[str] = []
    for line in text.splitlines():
        line = line.strip()
        m = re.match(r"for CK in ([\d ]+); do", line)
        if m:
            loop_vals = m.group(1).split()
            continue
        if line.startswith("done"):
            loop_vals = []
            continue
        if not line.startswith("run "):
            continue
        for v in loop_vals or [None]:
            body = line[4:].replace("$CK", v) if v is not None else line[4:]
            argv = shlex.split(body)
            jobs.append((argv[0], argv[1:]))
    return jobs


def strip_env_prefix(argv: list[str]) -> list[str]:
    if argv and argv[0] == "env":
        argv = argv[1:]
        while argv and "=" in argv[0] and not argv[0].startswith("-"):
            argv = argv[1:]
    return argv


def looks_like_path(a: str) -> bool:
    return ("/" in a or a.startswith(".soak")
            or a.endswith((".txt", ".npz", ".csv", ".log", ".yaml", ".npy")))


def main() -> int:
    queue = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        REPO / "scripts" / "tpu_queue_round4.sh")
    env = dict(os.environ, ETTS_FORCE_CPU="1", PYTHONUNBUFFERED="1")

    jobs = parse_queue(queue)
    if not jobs:
        print(f"preflight: no `run` jobs found in {queue}")
        return 1
    print(f"preflight: {len(jobs)} job invocations in {queue.name}")

    findings: list[str] = []
    helps: dict[str, str] = {}

    for name, argv in jobs:
        argv = strip_env_prefix(argv)
        if not argv:
            continue
        if argv[0] == "python":
            script, args = Path(argv[1]), argv[2:]
        elif argv[0].endswith(".py"):
            script, args = Path(argv[0]), argv[1:]
        else:
            continue  # non-python job; nothing to check
        spath = REPO / script
        if not spath.exists():
            findings.append(f"[{name}] script missing: {script}")
            continue

        key = str(script)
        if key not in helps:
            try:
                r = subprocess.run(
                    [sys.executable, str(spath), "--help"],
                    capture_output=True, text=True, timeout=300,
                    env=env, cwd=REPO)
                helps[key] = r.stdout + r.stderr
            except subprocess.TimeoutExpired:
                helps[key] = ""
        htext = helps[key]
        if not htext or "usage" not in htext.lower():
            # No argparse --help (e.g. bench.py checks sys.argv literally,
            # and its backend probe runs before any flag handling): fall
            # back to matching flag literals against the script source.
            htext = spath.read_text()

        pending_flag: str | None = None
        for a in args:
            if a.startswith("--"):
                flag = a.split("=")[0]
                if flag not in htext:
                    findings.append(f"[{name}] {script}: unknown flag {flag}")
                pending_flag = None if "=" in a else flag
                continue
            flag = pending_flag  # not cleared: nargs='+' flags take several values
            if flag in OUTPUT_FLAGS:
                continue
            if not looks_like_path(a):
                continue
            if (REPO / a).exists():
                continue
            if any(a.startswith(p) for p in CREATED_BY_QUEUE):
                print(f"  waived [{name}] {a} (created by an earlier job)")
                continue
            findings.append(f"[{name}] {script}: input path missing: {a}")

    if findings:
        print(f"\npreflight FINDINGS ({len(findings)}):")
        for f in findings:
            print(f"  {f}")
        return 1
    print("preflight OK: every job's script, flags, and input paths check out")
    return 0


if __name__ == "__main__":
    sys.exit(main())
