"""CLI smoke tests: every public entry point imports and prints --help."""
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).parent.parent

SCRIPTS = [
    "scripts/create_dataset.py",
    "scripts/train_autoregressive.py",
    "scripts/train_forward.py",
    "scripts/train_wavernn.py",
    "scripts/train_tacotron.py",
    "scripts/extract_durations.py",
    "scripts/eval_tacotron.py",
    "scripts/export_gst_embeddings.py",
    "scripts/make_gta.py",
    "scripts/preprocess_wavernn.py",
    "scripts/make_synth_corpus.py",
    "scripts/train_ctc_asr.py",
    "scripts/eval_soak.py",
    "scripts/eval_disentanglement.py",
    "synthesize_sentences.py",
    "synthesize_sentences_speaker.py",
    "gen_wavernn.py",
    "objective_measure.py",
    "plot_scripts/plot_speaker_embeddings.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_help_works(script):
    out = subprocess.run(
        [sys.executable, str(ROOT / script), "--help"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "PYTHONPATH": str(ROOT)},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "usage" in out.stdout.lower()


def test_bench_importable():
    import importlib.util
    spec = importlib.util.spec_from_file_location("bench", ROOT / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # defines main() without running it
    assert callable(mod.main)


def test_graft_entry_importable():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft", ROOT / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.entry) and callable(mod.dryrun_multichip)


def test_eval_soak_flag_dependencies_fail_fast():
    """--int8_gate / --also_gl without --vocoder_session must exit before
    any model loading (a queue job must not burn minutes to hit the check)."""
    for flag in ("--int8_gate", "--also_gl"):
        out = subprocess.run(
            [sys.executable, str(ROOT / "scripts/eval_soak.py"),
             "--config", "x", "--session_name", "s", "--out_dir", "/tmp/o",
             flag],
            capture_output=True, text=True, timeout=120,
            env={"PATH": "/usr/bin:/bin:/usr/local/bin",
                 "JAX_PLATFORMS": "cpu", "HOME": "/root",
                 "PYTHONPATH": str(ROOT)},
        )
        assert out.returncode != 0
        assert "requires --vocoder_session" in out.stderr


def test_eval_soak_two_phase_flag_dependencies_fail_fast():
    """Two-phase mode contracts (the co-residency fault workaround): phase A
    (--decode_out) must refuse any vocoder flag, phase B (--mels_in) must
    demand one — both before any model loading."""
    env = {"PATH": "/usr/bin:/bin:/usr/local/bin", "JAX_PLATFORMS": "cpu",
           "HOME": "/root", "PYTHONPATH": str(ROOT)}
    base = [sys.executable, str(ROOT / "scripts/eval_soak.py"),
            "--config", "x", "--session_name", "s", "--out_dir", "/tmp/o"]
    out = subprocess.run(
        base + ["--decode_out", "/tmp/m", "--vocoder_session", "v"],
        capture_output=True, text=True, timeout=120, env=env)
    assert out.returncode != 0
    assert "vocoder-less decode phase" in out.stderr
    out = subprocess.run(
        base + ["--mels_in", "/tmp/m"],
        capture_output=True, text=True, timeout=120, env=env)
    assert out.returncode != 0
    assert "requires --vocoder_session" in out.stderr


def test_vocode_dir_help_works():
    out = subprocess.run(
        [sys.executable, str(ROOT / "scripts/vocode_dir.py"), "--help"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "PYTHONPATH": str(ROOT)},
    )
    assert out.returncode == 0
    assert "usage" in out.stdout.lower()


def test_make_combo_file_creates_parent_dirs(tmp_path):
    """Regression: the queue passes --out into a not-yet-existing eval dir."""
    meta = tmp_path / "meta.txt"
    meta.write_text("id1|one.\nid2|two.\nid3|three.\n", encoding="utf-8")
    out = tmp_path / "deep" / "nested" / "combos.txt"
    res = subprocess.run(
        [sys.executable, str(ROOT / "scripts/make_combo_file.py"),
         "--metafile", str(meta), "--out", str(out), "--n", "4"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "PYTHONPATH": str(ROOT)},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    rows = out.read_text(encoding="utf-8").splitlines()
    assert len(rows) == 4
    assert all(len(r.split("|")) == 3 for r in rows)
