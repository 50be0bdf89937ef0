"""Live job telemetry — the stats.json sidecar (SURVEY.md §2.7 C5).

The reference emits synced-record counts, thread count, memory, rps and
ETA to a stats file every 2 s during sync
(/root/reference/logger/logger.go:127-162). Spark's equivalent signal
comes from the SparkStatusTracker; this monitor samples it on a daemon
thread and appends the same shape of record to ``stats.json``.
"""

from __future__ import annotations

import json
import os
import threading
import time

from pyspark.sql import SparkSession


class StatsMonitor:
    """Background sampler writing one JSON line per tick.

    Fields per tick: elapsed_s, active_stages, active_tasks,
    completed_jobs, executor_count, plus caller-updated counters
    (records_synced -> rps/ETA like the reference's RemainingTime).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        interval_s: float = 2.0,
        total_expected: int | None = None,
    ):
        self.spark = spark
        self.path = path
        self.interval_s = interval_s
        self.total_expected = total_expected
        self.records_synced = 0
        self._stop = threading.Event()
        self._t0 = time.time()
        self._thread: threading.Thread | None = None

    def add_records(self, n: int) -> None:
        self.records_synced += n

    def _sample(self) -> dict:
        tracker = self.spark.sparkContext.statusTracker()
        active = tracker.getActiveStageIds()
        n_tasks = 0
        for sid in active:
            info = tracker.getStageInfo(sid)
            if info:
                n_tasks += info.numActiveTasks
        elapsed = time.time() - self._t0
        rps = self.records_synced / elapsed if elapsed > 0 else 0.0
        eta = (
            (self.total_expected - self.records_synced) / rps
            if self.total_expected and rps > 0
            else None
        )
        return {
            "elapsed_s": round(elapsed, 1),
            "records_synced": self.records_synced,
            "rps": round(rps, 1),
            "eta_s": round(eta, 1) if eta is not None else None,
            "active_stages": len(active),
            "active_tasks": n_tasks,
            "completed_jobs": len(tracker.getJobIdsForGroup(None) or []),
        }

    def _loop(self) -> None:
        while not self._stop.wait(self.interval_s):
            try:
                with open(self.path, "a") as f:
                    f.write(json.dumps(self._sample()) + "\n")
            except Exception:
                pass  # telemetry must never kill the job

    def __enter__(self) -> StatsMonitor:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *a) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
        # final sample so short jobs still record something
        with open(self.path, "a") as f:
            f.write(json.dumps(self._sample()) + "\n")
