"""SparkSession factory with scale-aware defaults.

The reference creates one ClickHouse HTTP client per request
(/root/reference/server/server.js:95-124 and every endpoint); Spark's analog is
one long-lived session reused across queries (SURVEY.md §2.9 C2).

Config choices (rationale):
  * AQE on — runtime re-plan: skew-join splitting, partition coalescing,
    dynamic broadcast; this is the 100 TB safety net.
  * ``spark.sql.shuffle.partitions`` default 32 matches the local[32] harness;
    at cluster scale AQE coalescing makes the static number far less critical.
  * Arrow enabled — every pandas UDF transfers columnar batches, not rows.
  * ``maxPartitionBytes`` left at default 128 MB — correct for both local
    parquet fixtures and a 100 TB scan (≈800k input splits on 1000 executors).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "clickhouse-flatfile-tool-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Parameters mirror the knobs a deployment would set; everything else is a
    deliberate default.  ``master`` falls back to ``local[N]`` with N from
    ``$SPARK_GRAFT_CPUS`` (driver contract) or all cores.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet scans: vectorized reader + pushdown are on by default; keep
        # them explicit so a misconfigured deployment can't silently lose them
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # Long-lived multi-query sessions (the api.py server shape, the
        # bench) strand localCheckpoint blocks, broadcasts and shuffle files
        # until a DRIVER full GC lets ContextCleaner's weak refs fire; the
        # 30min default lets them pile up for the whole session.  Measured
        # (OPTIMIZATION_r11.md): a 33-query sequence at 8g degrades
        # late queries ~2x (margin_pairs 8.2s vs 4.3s with a 60s interval).
        # 2min is conservative for any heap size; env-tunable per deployment.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC") or "2min",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def get_spark_with_port_retry(
    ui_port: int = 4040,
    max_retries: int = 10,
    **kwargs,
) -> SparkSession:
    """Port-conflict retry (SURVEY §2.9 C3): the reference walks to the next
    port when its HTTP listener hits EADDRINUSE
    (/root/reference/server/server.js:870-885).  Spark's bindable surface is
    the driver UI; we pin ``spark.ui.port`` and let Spark's own bind loop
    walk ``ui_port .. ui_port+max_retries`` (``spark.port.maxRetries`` is the
    same next-port strategy the reference hand-rolls).  ``kwargs`` pass
    through to :func:`get_spark`.
    """
    extra = dict(kwargs.pop("extra_conf", None) or {})
    extra.setdefault("spark.ui.port", str(ui_port))
    extra.setdefault("spark.port.maxRetries", str(max_retries))
    return get_spark(extra_conf=extra, **kwargs)


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
