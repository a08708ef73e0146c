"""Partition-layout utilities.

Spark's scan parallelism is bounded by input splits, and a parquet file is
splittable only at row-group boundaries.  A compute-heavy operator (shingling,
hashing, pandas-UDF matrix math) fed by a few fat row groups will serialize on
a handful of tasks no matter how many cores exist — the cure is an explicit
round-robin repartition, which costs one cheap shuffle of the raw rows and
buys full map-side parallelism.  At 100 TB inputs arrive pre-split (thousands
of row groups), so the guard below is a no-op there; it exists for the small-
file / single-row-group layouts where it matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism when its
    current layout has fewer partitions — otherwise return it untouched
    (never repartitions *down*; AQE handles coalescing)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
