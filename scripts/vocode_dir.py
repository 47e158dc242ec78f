"""Vocode a directory tree of saved TTS mels in a vocoder-only process.

Counterpart of `--save_mels` (synthesize_sentences_speaker.py) and
`--decode_out` (eval_soak.py): round-5 forensics isolated the long-mel TPU
worker fault to the TTS transformer being CO-RESIDENT with the WaveRNN
vocoder in one process — the identical trigger mel vocodes cleanly in a
fresh process on both the Pallas and scan paths
(artifacts/soak/voc_fault_matrix.json). So the serving/eval protocol splits
decode and vocode into two serial TPU processes; this is the vocode half.

Walks ``--in_dir`` recursively for ``*.npy`` mels in the TTS (t, n_mels)
[-4, 4] layout, vocodes each through the trained WaveRNN via the
(mel+4)/8 store contract (reference `WaveRNN/gen_wavernn.py:29-42`), and
writes ``<same stem>.wav`` next to each npy.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import _bootstrap  # noqa: E402,F401

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--voc_config", type=str, required=True)
    parser.add_argument("--voc_session", type=str, required=True)
    parser.add_argument("--in_dir", type=str, required=True)
    parser.add_argument("--int8", action="store_true",
                        help="int8 vocoder kernel weights")
    parser.add_argument("--voc_scan", action="store_true",
                        help="force the lax.scan sample loop")
    parser.add_argument("--skip_existing", action="store_true",
                        help="resume: skip mels whose wav already exists "
                             "and mels with a .crashed marker from a prior "
                             "worker-fault run (monotonic progress under "
                             "deterministic faults)")
    parser.add_argument("--suffix", type=str, default="",
                        help="append to the wav stem (e.g. _int8 so an int8 "
                             "pass does not overwrite the f32 wavs)")
    parser.add_argument("--no_isolate", action="store_true",
                        help="vocode every mel in THIS process instead of "
                             "one fresh subprocess per mel. Isolation is the "
                             "default because the long-mel TPU worker fault "
                             "is a device-state condition: the EXACT trigger "
                             "mel passes in a fresh single-mel process "
                             "(artifacts/soak/voc_fault_matrix.json) but "
                             "faults once other programs/geometries are "
                             "resident — incl. the short-mel buckets this "
                             "very loop compiles first (r5f e2e_prevoc "
                             "attempt 1 faulted vocoder-only, after 3 short "
                             "gt mels)")
    parser.add_argument("--one", type=str, default=None,
                        help=argparse.SUPPRESS)  # isolation child: one mel
    parser.add_argument("--one_seed", type=int, default=0,
                        help=argparse.SUPPRESS)
    args = parser.parse_args()

    mels = ([Path(args.one)] if args.one
            else sorted(Path(args.in_dir).rglob("*.npy")))
    if not mels:
        raise SystemExit(f"no .npy mels under {args.in_dir}")

    if args.one is None and not args.no_isolate:
        # parent: one fresh subprocess per pending mel — a worker fault
        # kills only that mel's process; the parent marks it and moves on,
        # so the whole directory completes in ONE queue attempt
        import os
        import subprocess
        # a wedged tunnel request hangs forever rather than raising (r5f
        # e2e_prevoc attempt 2: 25 min silent on one mel) — bound each child
        # default covers a cold long-mel kernel compile on the contended
        # 1-core host (~15 min observed) with margin
        child_timeout = int(os.environ.get("ETTS_VOC_CHILD_TIMEOUT", "1800"))
        done = failed = 0
        kernel_fault_streak = 0  # consecutive kernel-child faults
        for i, path in enumerate(mels):
            wav_path = path.with_name(path.stem + args.suffix + ".wav")
            marker = path.with_name(path.stem + args.suffix + ".crashed")
            if args.skip_existing and (wav_path.exists() or marker.exists()):
                continue
            cmd = [sys.executable, __file__, "--voc_config", args.voc_config,
                   "--voc_session", args.voc_session, "--in_dir", args.in_dir,
                   "--one", str(path), "--one_seed", str(1000 + i)]
            if args.int8:
                cmd.append("--int8")
            if args.voc_scan:
                cmd.append("--voc_scan")
            if args.suffix:
                cmd += ["--suffix", args.suffix]

            def _child(extra=()):
                try:
                    return subprocess.run(list(cmd) + list(extra),
                                          timeout=child_timeout).returncode
                except subprocess.TimeoutExpired:
                    return "timeout"

            # after 2 consecutive kernel-child faults (each one a worker
            # crash + ~6 min recovery), assume the batch shares the faulting
            # fold geometry and go scan-first for the remaining mels
            scan_first = (not (args.voc_scan or args.int8)
                          and kernel_fault_streak >= 2)
            if scan_first:
                print(f"{path.stem}: scan-first (kernel fault streak "
                      f"{kernel_fault_streak})", flush=True)
                rc = _child(("--voc_scan",))
            else:
                rc = _child()
                if args.voc_scan or args.int8:
                    pass
                elif rc != 0:
                    # kernel-path fault at this mel's fold geometry: retry
                    # once in a fresh child on the geometry-independent
                    # lax.scan sample loop — SAME trained vocoder, so quality
                    # gates keep their neural wav; only the loop
                    # implementation differs (int8 weight streaming is
                    # kernel-only: no scan retry there)
                    kernel_fault_streak += 1
                    print(f"retrying {path.stem} on the scan loop (kernel "
                          f"child rc={rc})", flush=True)
                    rc = _child(("--voc_scan",))
                    if rc == 0 and wav_path.exists() and marker.exists():
                        marker.unlink()  # the kernel child's marker is stale
                else:
                    kernel_fault_streak = 0
            if rc == 0 and wav_path.exists():
                done += 1
            else:
                failed += 1
                if not marker.exists():
                    marker.write_text(f"isolated vocode rc={rc}\n")
                print(f"CRASHED (isolated, rc={rc}) on {path.stem} — "
                      f"marker written, continuing", flush=True)
        print(f"vocoded {done} mels under {args.in_dir}"
              + (f" ({failed} marked crashed)" if failed else ""))
        raise SystemExit(0 if failed == 0 else 3)

    import jax
    from etts.api import VocoderSynthesizer
    from etts.data.audio_io import save_wav

    voc = VocoderSynthesizer(args.voc_config, args.voc_session)
    sr = voc.config["sampling_rate"]

    done = 0
    for i, path in enumerate(mels):
        wav_path = path.with_name(path.stem + args.suffix + ".wav")
        crash_marker = path.with_name(path.stem + args.suffix + ".crashed")
        if args.one is None and args.skip_existing and (
                wav_path.exists() or crash_marker.exists()):
            continue
        mel = np.load(path)
        seed = args.one_seed if args.one else 1000 + i
        try:
            wav = voc.generate((mel + 4.0) / 8.0,
                               key=jax.random.PRNGKey(seed),
                               int8_weights=args.int8 or None,
                               use_pallas=False if args.voc_scan else None)
        except Exception as e:
            # a TPU worker fault poisons the whole backend: mark this mel so
            # the retry skips straight past it, and exit — every completed
            # wav above already survives on disk
            crash_marker.write_text(f"{type(e).__name__}: {e}\n")
            print(f"CRASHED on {path.stem} ({mel.shape[0]}f): "
                  f"{type(e).__name__} — marker written, exiting",
                  flush=True)
            raise SystemExit(3)
        save_wav(np.asarray(wav), str(wav_path), sr)
        done += 1
        print(f"[{done}/{len(mels)}] {path.stem} ({mel.shape[0]}f)",
              flush=True)
    if args.one is None:
        print(f"vocoded {done} mels under {args.in_dir}")


if __name__ == "__main__":
    main()
