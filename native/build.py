"""Build the native helpers into shared libraries (no pybind11 needed —
plain C ABI + ctypes). Called lazily from etts.evalsuite.dtw on first use;
can also be run directly: ``python native/build.py``."""
import os
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent


def build_dtw(force=False) -> str | None:
    src = HERE / "dtw.cpp"
    out = HERE / "libdtw.so"
    if out.exists() and not force and out.stat().st_mtime >= src.stat().st_mtime:
        return str(out)
    for cxx in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cxx, "-O3", "-march=native", "-shared", "-fPIC",
                 str(src), "-o", str(out)],
                check=True, capture_output=True)
            return str(out)
        except (FileNotFoundError, subprocess.CalledProcessError):
            continue
    return None


if __name__ == "__main__":
    path = build_dtw(force="--force" in sys.argv)
    print(path or "no C++ compiler found")
