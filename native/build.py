"""Build the native prefetch engine on demand (g++, cached by mtime)."""

from __future__ import annotations

import subprocess
from pathlib import Path

HERE = Path(__file__).resolve().parent
SRC = HERE / "window_prefetch.cpp"
OUT = HERE / "_window_prefetch.so"


def ensure_built() -> Path:
    if OUT.exists() and OUT.stat().st_mtime >= SRC.stat().st_mtime:
        return OUT
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           str(SRC), "-o", str(OUT)]
    subprocess.run(cmd, check=True, capture_output=True)
    return OUT


if __name__ == "__main__":
    print(ensure_built())
