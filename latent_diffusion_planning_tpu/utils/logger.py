"""Metrics logging: averaged meters → CSV + console (+ optional TensorBoard).

Capability parity with the reference's utils/logger.py: train/eval meter
groups that average between dumps, CSV files with stale-row compaction on
restart, colored console lines, optional TensorBoard writer; wandb hooks are
gated on availability (not installed in this image).
"""

from __future__ import annotations

import csv
import datetime
import os
import shutil
from collections import defaultdict
from pathlib import Path
from typing import Any, Mapping

COLOR = {"yellow": 33, "green": 32}


def _colored(text: str, color: str) -> str:
    return f"\033[{COLOR[color]}m{text}\033[0m"


class AverageMeter:
    def __init__(self) -> None:
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1) -> None:
        self.total += float(value) * n
        self.count += n

    def value(self) -> float:
        return self.total / max(1, self.count)


class MetersGroup:
    def __init__(self, csv_path: Path, formatting: str, use_tb: bool,
                 tb_dir: Path | None = None):
        self._csv_path = csv_path
        self._formatting = formatting
        self._meters: dict[str, AverageMeter] = defaultdict(AverageMeter)
        self._csv_file = None
        self._csv_writer = None
        self._tb = None
        if use_tb and tb_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=str(tb_dir))
            except Exception:
                self._tb = None

    def log(self, key: str, value: Any, n: int = 1) -> None:
        self._meters[key].update(float(value), n)

    def _prime_csv(self, keys: list[str], step: int) -> None:
        """(Re)open the CSV; on restart drop rows at/after the current step
        (stale-row compaction, parity logger.py:81-95) and rewrite headers if
        the key set changed."""
        rows: list[dict] = []
        if self._csv_path.exists():
            with open(self._csv_path) as f:
                reader = csv.DictReader(f)
                rows = [r for r in reader
                        if r.get("step") and float(r["step"]) < step]
        fieldnames = sorted(set(keys) | {"step"}
                            | (set(rows[0].keys()) if rows else set()))
        tmp = self._csv_path.with_suffix(".tmp")
        with open(tmp, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=fieldnames, restval=0.0)
            writer.writeheader()
            for r in rows:
                writer.writerow(r)
        shutil.move(tmp, self._csv_path)
        self._csv_file = open(self._csv_path, "a", newline="")
        self._csv_writer = csv.DictWriter(self._csv_file,
                                          fieldnames=fieldnames, restval=0.0)

    def _dump_csv(self, data: dict) -> None:
        if self._csv_writer is None or set(data.keys()) - set(
                self._csv_writer.fieldnames):
            if self._csv_file:
                self._csv_file.close()
            self._prime_csv(list(data.keys()), int(data["step"]))
        self._csv_writer.writerow(data)
        self._csv_file.flush()

    def _dump_console(self, data: dict, prefix: str) -> None:
        label = f"{prefix + ':':<14}"
        pieces = [f"| {_colored(label, self._formatting)}"]
        for key, value in sorted(data.items()):
            if key == "step":
                continue
            pieces.append(f"{key}: {value:.4f}" if isinstance(value, float)
                          else f"{key}: {value}")
        print(f"step: {int(data['step'])} " + " | ".join(pieces[:12]))

    def dump(self, step: int, prefix: str) -> dict:
        if not self._meters:
            return {}
        data = {k: m.value() for k, m in self._meters.items()}
        data["step"] = step
        self._dump_csv(data)
        self._dump_console(data, prefix)
        if self._tb is not None:
            for k, v in data.items():
                if k != "step":
                    self._tb.add_scalar(f"{prefix}/{k}", v, step)
        self._meters.clear()
        return data


class Logger:
    """Train/eval metric sink.

    ``logger.log('train/loss', v, step)``; dumps averaged values on
    ``dump(step)``. RAM gauge injected into train dumps (parity
    logger.py:209-211).
    """

    def __init__(self, log_dir: str | Path, use_tb: bool = False,
                 log_stdout: bool = False, use_wandb: bool = False,
                 wandb_kwargs: Mapping[str, Any] | None = None):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        tb_dir = self.log_dir / "tb" if use_tb else None
        self._train = MetersGroup(self.log_dir / "train.csv", "yellow",
                                  use_tb, tb_dir)
        self._eval = MetersGroup(self.log_dir / "eval.csv", "green",
                                 use_tb, tb_dir)
        self._stdout_file = (open(self.log_dir / "stdout.log", "a")
                             if log_stdout else None)
        # wandb backend (parity: reference logger.py:147-148 + per-driver
        # wandb.init, train_bc.py:246-252). Gated on availability — the
        # package is not in this image, so the run degrades to CSV/TB with a
        # note instead of failing.
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                if wandb.run is None:
                    wandb.init(dir=str(self.log_dir),
                               **dict(wandb_kwargs or {}))
            except Exception as e:  # noqa: BLE001 — offline image
                print(f"[logger] wandb unavailable ({e!r}); CSV/TB only")
                self._wandb = None

    def _group(self, key: str) -> MetersGroup:
        return self._train if key.startswith("train") else self._eval

    def log(self, key: str, value: Any, step: int | None = None) -> None:
        self._group(key).log(key.split("/", 1)[1], value)

    def log_metrics(self, metrics: Mapping[str, Any], step: int,
                    prefix: str = "train") -> None:
        for k, v in metrics.items():
            try:
                self.log(f"{prefix}/{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def dump(self, step: int, prefix: str | None = None) -> None:
        if prefix in (None, "train"):
            try:
                import resource
                ram_gb = resource.getrusage(
                    resource.RUSAGE_SELF).ru_maxrss / 1e6
                self._train.log("ram_gb", ram_gb)
            except Exception:
                pass
            data = self._train.dump(step, "train")
            self._wandb_log(data, "train", step)
        if prefix in (None, "eval"):
            data = self._eval.dump(step, "eval")
            self._wandb_log(data, "eval", step)

    def _wandb_log(self, data: Mapping[str, Any], prefix: str,
                   step: int) -> None:
        if self._wandb is not None and data:
            self._wandb.log({f"{prefix}/{k}": v for k, v in data.items()
                             if k != "step"}, step=step)

    def note(self, text: str) -> None:
        stamp = datetime.datetime.now().strftime("%H:%M:%S")
        line = f"[{stamp}] {text}"
        print(line)
        if self._stdout_file:
            self._stdout_file.write(line + os.linesep)
            self._stdout_file.flush()
