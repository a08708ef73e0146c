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


def z_value(col_a, col_b, bits: int = 16):
    """Z-order (Morton) value of two non-negative integer columns: the low
    ``bits`` of each, bit-interleaved into one long (a⁰b⁰a¹b¹…).

    Sorting by this value before a partitioned/bucketed write clusters rows
    that are close in BOTH dimensions into the same parquet row groups, so
    min/max statistics prune scans filtered on either column — the
    multi-dimensional generalization of ``sortWithinPartitions`` on a single
    key (Delta/Iceberg Z-ORDER, ClickHouse's mortonEncode index expression).
    Pure shift/or expressions — JVM-side, codegen, no UDF.
    """
    from pyspark.sql import functions as F

    a = (F.col(col_a) if isinstance(col_a, str) else col_a).cast("long")
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(bit_a, 2 * i) + F.shiftleft(bit_b, 2 * i + 1)
    return z


def z_order_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_files: int | None = None,
) -> str:
    """Write ``df`` as parquet range-partitioned and sorted by the Z-value
    of (col_a, col_b): global Z-ranges per file, Z-sorted row groups within
    — both filter dimensions get row-group skipping from one layout."""
    z = z_value(col_a, col_b, bits).alias("__z")
    out = df.withColumn("__z", z)
    out = out.repartitionByRange(
        num_files or df.sparkSession.sparkContext.defaultParallelism, "__z"
    ).sortWithinPartitions("__z")
    out.drop("__z").write.mode("overwrite").parquet(path)
    return path
