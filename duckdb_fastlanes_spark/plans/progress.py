"""Query-progress reporting — the A14 scan-progress analogue.

The reference reports scan progress as ``vectors_read / total_vectors * 100``
per table function instance (src/reader/fls_reader.cpp:556-558, cited for
parity). Spark's equivalent signal is task completion per stage, exposed on
the driver through ``SparkStatusTracker`` — no listener registration or
callback server needed, so this works from plain PySpark in any deploy mode.

``QueryProgress`` samples all active stages while a query runs (start it
before the action, stop it after) and yields snapshots of
``completed_tasks / total_tasks`` — the same monotone 0→100% signal, at
Spark's unit of scan parallelism (the task ≈ the reference's row-group
claim, fls_reader.cpp:337-355).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class ProgressSnapshot:
    ts: float
    active_stages: int
    completed_tasks: int
    total_tasks: int

    @property
    def percent(self) -> float:
        if not self.total_tasks:
            return 0.0
        return 100.0 * self.completed_tasks / self.total_tasks


@dataclass
class QueryProgress:
    """Polls the status tracker on a daemon thread while queries execute."""

    spark: SparkSession
    interval_s: float = 0.05
    snapshots: list[ProgressSnapshot] = field(default_factory=list)
    _stop: threading.Event = field(default_factory=threading.Event)
    _thread: threading.Thread | None = None

    def __enter__(self) -> "QueryProgress":
        self._thread = threading.Thread(target=self._poll, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        assert self._thread is not None
        self._thread.join()

    def _poll(self) -> None:
        tracker = self.spark.sparkContext.statusTracker()
        while not self._stop.is_set():
            stage_ids = tracker.getActiveStageIds()
            done = total = 0
            for sid in stage_ids:
                info = tracker.getStageInfo(sid)
                if info is None:
                    continue
                total += info.numTasks
                done += info.numCompletedTasks
            self.snapshots.append(
                ProgressSnapshot(time.time(), len(stage_ids), done, total)
            )
            time.sleep(self.interval_s)

    @property
    def saw_work(self) -> bool:
        return any(s.total_tasks > 0 for s in self.snapshots)

    @property
    def max_percent(self) -> float:
        return max((s.percent for s in self.snapshots), default=0.0)
