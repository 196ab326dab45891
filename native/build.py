"""Build the native prefetch engine on demand.

The shared object is never committed (gitignored); it is rebuilt whenever
the source content hash changes, so a stale or foreign-arch binary can
never be picked up (a bare mtime check would accept a prebuilt .so from a
fresh clone, where checkout gives both files the same timestamp).
"""

from __future__ import annotations

import hashlib
import subprocess
from pathlib import Path

HERE = Path(__file__).resolve().parent
SRC = HERE / "window_prefetch.cpp"
OUT = HERE / "_window_prefetch.so"
STAMP = HERE / "_window_prefetch.hash"


def _src_hash() -> str:
    return hashlib.sha256(SRC.read_bytes()).hexdigest()


def ensure_built() -> Path:
    h = _src_hash()
    if OUT.exists() and STAMP.exists() and STAMP.read_text().strip() == h:
        return OUT
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           str(SRC), "-o", str(OUT)]
    subprocess.run(cmd, check=True, capture_output=True)
    STAMP.write_text(h)
    return OUT


if __name__ == "__main__":
    print(ensure_built())
