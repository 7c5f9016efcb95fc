"""Step-merged CSV metrics logger.

Counterpart of the reference's ``step_csv_logger`` (``lit_gpt/utils.py:405-432``),
which wraps Fabric's CSVLogger and merges rows sharing a step at save time.
Here the merge happens on ingest: one row per step, columns are the union of
all metric names ever logged, written as ``metrics.csv`` under
``<out_dir>/<name>/version_<n>/``.
"""

from __future__ import annotations

import csv
import os
from pathlib import Path
from typing import Optional


class StepCSVLogger:
    def __init__(self, out_dir, name: str = "logs", flush_every: int = 50):
        base = Path(out_dir) / name
        base.mkdir(parents=True, exist_ok=True)
        versions = [
            int(d.name.split("_")[1])
            for d in base.glob("version_*")
            if d.name.split("_")[-1].isdigit()
        ]
        self.log_dir = base / f"version_{max(versions) + 1 if versions else 0}"
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.log_dir / "metrics.csv"
        self._rows: dict[int, dict] = {}
        self._columns: list[str] = ["step"]
        self._flush_every = flush_every
        self._since_flush = 0

    def log_dict(self, metrics: dict, step: Optional[int] = None) -> None:
        if step is None:
            step = max(self._rows, default=-1) + 1
        row = self._rows.setdefault(step, {"step": step})
        row.update(metrics)
        for k in metrics:
            if k not in self._columns:
                self._columns.append(k)
        self._since_flush += 1
        if self._since_flush >= self._flush_every:
            self.save()

    def save(self) -> None:
        with open(self.path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._columns, restval="")
            writer.writeheader()
            for step in sorted(self._rows):
                writer.writerow(self._rows[step])
        self._since_flush = 0

    def finalize(self) -> None:
        self.save()
