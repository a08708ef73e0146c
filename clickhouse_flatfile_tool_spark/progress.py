"""Ingest/query progress reporting (SURVEY §2.8 O1-O3).

The reference streams per-batch NDJSON progress lines into a chunked HTTP
response (/root/reference/server/server.js:644-649, consumed at
client/src/App.jsx:206-219) — and its ``total`` is self-referential, so the
bar always reads 100% (SURVEY §2.11).  Spark's analog is a listener over real
task metrics; totals come from the scheduler, not from rows-so-far.
"""

from __future__ import annotations

import json
import logging
from collections.abc import Callable
from dataclasses import dataclass, field
from threading import Lock

logger = logging.getLogger("clickhouse_flatfile_tool_spark")


@dataclass
class ProgressTracker:
    """Accumulates task-completion events and emits reference-shaped
    progress dicts ``{"type": "progress", "processed": n, "total": m}``.

    Wire it to ``spark.sparkContext.addSparkListener`` in JVM deployments;
    in pure-PySpark contexts call ``update`` from ``foreachBatch`` or after
    each write stage.  Kept listener-agnostic so it works under Spark
    Connect too (no JVM gateway assumed).
    """

    total: int = 0
    processed: int = 0
    callback: Callable[[dict], None] | None = None
    _lock: Lock = field(default_factory=Lock, repr=False)
    events: list[dict] = field(default_factory=list)

    def update(self, n_rows: int) -> dict:
        with self._lock:
            self.processed += n_rows
            evt = {"type": "progress", "processed": self.processed, "total": self.total}
            self.events.append(evt)
        if self.callback:
            self.callback(evt)
        logger.info(json.dumps(evt))
        return evt

    def finish(self, success: bool = True, message: str = "") -> dict:
        evt = {
            "type": "complete" if success else "error",
            "processed": self.processed,
            "message": message,
        }
        self.events.append(evt)
        if self.callback:
            self.callback(evt)
        return evt


    def set_absolute(self, processed: int, total: int) -> dict:
        """Absolute progress snapshot (scheduler-reported task counts —
        unlike the reference, total comes from the DAG, not rows-so-far)."""
        with self._lock:
            self.processed, self.total = processed, total
            evt = {"type": "progress", "processed": processed, "total": total}
            self.events.append(evt)
        if self.callback:
            self.callback(evt)
        return evt


def run_with_progress(
    spark,
    action: Callable[[], object],
    tracker: ProgressTracker | None = None,
    poll_interval: float = 0.1,
) -> tuple[object, ProgressTracker]:
    """Execute ``action()`` (any DataFrame action / write) while a daemon
    thread polls the scheduler's ``StatusTracker``, emitting progress events
    with REAL task counts — the Spark-native replacement for the reference's
    per-batch NDJSON lines (server.js:644-649), with a total that is not
    self-referential (SURVEY §2.11).
    """
    import uuid
    from threading import Event, Thread

    tracker = tracker or ProgressTracker()
    stop = Event()
    sc = spark.sparkContext
    st = sc.statusTracker()
    # Tag the action's jobs with a unique group so a deterministic final
    # snapshot can be taken from the scheduler AFTER the action returns —
    # a wall-clock poller alone can be starved for the whole (short) job
    # under CPU contention and then reports nothing.
    group = f"cfts-progress-{uuid.uuid4().hex[:8]}"

    def _group_task_counts() -> tuple[int, int]:
        done = total = 0
        for jid in st.getJobIdsForGroup(group):
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None:
                    total += si.numTasks
                    done += si.numCompletedTasks
        return done, total

    def poll() -> None:
        while not stop.is_set():
            done, total = _group_task_counts()
            if total:
                tracker.set_absolute(done, total)
            stop.wait(poll_interval)

    t = Thread(target=poll, daemon=True)
    t.start()
    sc.setJobGroup(group, "run_with_progress")
    try:
        result = action()
        stop.set()
        t.join(timeout=2.0)
        # guaranteed ≥1 real-task-count snapshot, however fast the job ran
        done, total = _group_task_counts()
        if total:
            tracker.set_absolute(done, total)
        tracker.finish(True)
    except Exception as e:  # noqa: BLE001 — surface through tracker, re-raise
        tracker.finish(False, str(e))
        raise
    finally:
        stop.set()
        t.join(timeout=2.0)
        sc.setLocalProperty("spark.jobGroup.id", None)
    return result, tracker


def error_payload(exc: Exception) -> dict:
    """Structured error shape (server.js:185-192): success=false + message;
    stack traces stay in logs, not API responses (the reference leaked them)."""
    return {"success": False, "error": str(exc), "error_type": type(exc).__name__}
