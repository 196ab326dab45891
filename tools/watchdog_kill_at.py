#!/usr/bin/env python
"""Kill a background queue's whole process tree at a wall-clock deadline.

Usage: python tools/watchdog_kill_at.py <epoch_seconds> <pidfile>

The round-end bench capture needs an idle chip (RESULTS.md round-3: CPU/chip
contention cost the capture 0.24x); stage scripts wrap long steps in
`timeout` but a stage *started* before the deadline can run hours past it.
This watchdog sleeps to the deadline, then walks /proc to find every live
descendant of the pidfile's process (no pattern matching — PID-exact) and
TERMs them bottom-up, escalating to KILL after a grace period.
"""

import os
import signal
import sys
import time


def descendants(root: int) -> list[int]:
    """All live descendant PIDs of ``root``, children before parents."""
    kids: dict[int, list[int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                ppid = int(f.read().split(")")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            continue
        kids.setdefault(ppid, []).append(int(pid))
    out: list[int] = []

    def walk(p: int) -> None:
        for c in kids.get(p, []):
            walk(c)
            out.append(c)

    walk(root)
    return out


def main() -> None:
    deadline, pidfile = float(sys.argv[1]), sys.argv[2]
    while time.time() < deadline:
        time.sleep(min(30.0, max(1.0, deadline - time.time())))
    try:
        with open(pidfile) as f:
            root = int(f.read().strip())
    except (OSError, ValueError):
        print("watchdog: no pidfile, nothing to do")
        return
    targets = descendants(root) + [root]
    for sig in (signal.SIGTERM, signal.SIGKILL):
        survivors = []
        for pid in targets:
            try:
                os.kill(pid, sig)
                survivors.append(pid)
            except ProcessLookupError:
                pass
            except OSError as e:
                print(f"watchdog: kill {pid} failed: {e}")
        print(f"watchdog: sent {sig.name} to {survivors}")
        if sig == signal.SIGTERM and survivors:
            time.sleep(20)
            targets = [p for p in survivors if os.path.exists(f"/proc/{p}")]
            if not targets:
                break


if __name__ == "__main__":
    main()
