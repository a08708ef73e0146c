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


def error_payload(exc: Exception) -> dict:
    """Structured error shape (server.js:185-192): success=false + message;
    stack traces stay in logs, not API responses (the reference leaked them)."""
    return {"success": False, "error": str(exc), "error_type": type(exc).__name__}
