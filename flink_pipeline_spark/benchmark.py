"""Experiment harness (SURVEY.md §3.3): the reference experiment.py's
protocol — N repeats x <=M retries, per-attempt timing, append-CSV
results with header-once (SNK2) — around any callable workload.

Driver-side orchestration stays plain Python (as in the reference);
the workload itself is where Spark runs.
"""

from __future__ import annotations

import csv
import os
import time
from collections.abc import Callable
from dataclasses import dataclass

CSV_FIELDS = (
    "repeat_num",
    "attempt_num",
    "retcode",
    "log_file",
    "total_secs",
    "bcl_secs",
    "align_secs",
)


@dataclass
class ExperimentConf:
    results_csv: str
    num_repeats: int = 3  # experiment.py:370
    max_retries: int = 3  # experiment.py:20


class Experiment:
    """Run ``workload()`` num_repeats times, retrying each repeat up to
    max_retries on failure (reference experiment.py:338-359); append one
    CSV row per attempt, writing the header only when the file is new
    (experiment.py:332-336)."""

    def __init__(self, conf: ExperimentConf) -> None:
        self.conf = conf

    def _record(self, row: dict) -> None:
        path = self.conf.results_csv
        new = not os.path.exists(path)
        with open(path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=CSV_FIELDS)
            if new:
                w.writeheader()
            w.writerow(row)

    def execute(self, workload: Callable[[], dict | None]) -> bool:
        """workload returns optional phase timings {'bcl_secs':..,
        'align_secs':..}; raises on failure. Returns overall success."""
        all_ok = True
        for repeat in range(1, self.conf.num_repeats + 1):
            ok = False
            for attempt in range(1, self.conf.max_retries + 1):
                t0 = time.time()
                phases: dict = {}
                try:
                    phases = workload() or {}
                    retcode = 0
                    ok = True
                except Exception:  # noqa: BLE001 — retry semantics
                    retcode = 1
                self._record(
                    {
                        "repeat_num": repeat,
                        "attempt_num": attempt,
                        "retcode": retcode,
                        "log_file": f"rep_{repeat}_attempt_{attempt}.log",
                        "total_secs": round(time.time() - t0, 3),
                        "bcl_secs": phases.get("bcl_secs", 0.0),
                        "align_secs": phases.get("align_secs", 0.0),
                    }
                )
                if ok:
                    break
            all_ok = all_ok and ok
        return all_ok
