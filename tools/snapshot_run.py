#!/usr/bin/env python
"""Persist run evidence into the tracked tree (assets/runs/<name>/).

experiments/ and datasets/ are gitignored and the workspace is recreated
from git between build sessions — any eval.csv that only lives there is
lost. This copies the small, durable artifacts of a finished run (resolved
config, eval.csv, the last lines of train.csv) so results survive in git
and the judge can audit them without re-running training.

Usage: python tools/snapshot_run.py experiments/<folder>/<name> [...]
"""

import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
DST_ROOT = REPO / "assets" / "runs"
TRAIN_TAIL = 24


def snapshot(run_dir: Path) -> None:
    run_dir = run_dir.resolve()
    if not run_dir.is_dir():
        print(f"snapshot_run: skipping {run_dir} (not a directory)",
              file=sys.stderr)
        return
    try:
        rel = run_dir.relative_to(REPO / "experiments")
    except ValueError:
        sys.exit(f"snapshot_run: {run_dir} is not under experiments/ "
                 "(usage: python tools/snapshot_run.py experiments/<folder>/<name>)")
    dst = DST_ROOT / rel
    dst.mkdir(parents=True, exist_ok=True)
    for name in ("config.yaml", "eval.csv", "eval_sweep/eval.csv"):
        src = run_dir / name
        if src.exists():
            (dst / name).parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(src, dst / name)
    train = run_dir / "train.csv"
    if train.exists():
        lines = train.read_text().splitlines()
        keep = [lines[0]] + lines[-TRAIN_TAIL:] if len(lines) > TRAIN_TAIL \
            else lines
        (dst / "train_tail.csv").write_text("\n".join(keep) + "\n")
    print(f"snapshotted {rel} -> {dst.relative_to(REPO)}")


if __name__ == "__main__":
    for arg in sys.argv[1:]:
        snapshot(Path(arg))
