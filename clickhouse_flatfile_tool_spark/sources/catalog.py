"""Catalog surface: list tables, describe, ping.

Reference equivalents (SURVEY.md §2.1 S6-S8, §2.9 C1):
  * ``SHOW TABLES`` — /root/reference/server/server.js:139-144, 755-760
  * ``DESCRIBE TABLE t`` → ``[{name, type}]`` — server.js:230-246, 793-803
  * ``client.ping()`` health check — server.js:127-136
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from clickhouse_flatfile_tool_spark.schema import spark_to_clickhouse


def list_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """SHOW TABLES analog: names of tables/views in the catalog."""
    return [t.name for t in spark.catalog.listTables(database)]


def describe_table(spark: SparkSession, table: str) -> list[dict[str, str]]:
    """DESCRIBE analog returning the reference's wire shape: a list of
    ``{name, type}`` dicts (server.js:240-246) — with both the Spark type
    and its ClickHouse mapping."""
    schema = spark.table(table).schema
    return [
        {
            "name": f.name,
            "type": f.dataType.simpleString(),
            "clickhouse_type": spark_to_clickhouse(f.dataType, f.nullable),
        }
        for f in schema.fields
    ]


def ping(spark: SparkSession) -> bool:
    """Health check (server.js:127-136): run a trivial query end-to-end."""
    try:
        return spark.sql("SELECT 1 AS ok").first().ok == 1
    except Exception:
        return False


def analyze_table(
    spark: SparkSession, table: str, columns: list[str] | None = None
) -> None:
    """Collect CBO statistics (``ANALYZE TABLE ... COMPUTE STATISTICS``,
    plus per-column NDV/min/max/null counts when ``columns`` given).

    At 100 TB this is what makes Catalyst's cost-based join reordering and
    broadcast decisions real instead of guessed: sizeInBytes/rowCount feed
    the broadcast threshold, column NDVs feed join-order costs.  Run it
    after bulk loads (the reference has no analog — its "optimizer" is
    whatever ClickHouse does server-side)."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")


def table_stats(spark: SparkSession, table: str) -> dict:
    """Read back the collected statistics (rowCount / sizeInBytes) from the
    catalog — the numbers the optimizer will actually use."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    out: dict = {}
    for r in rows:
        if r.col_name == "Statistics":
            # e.g. "123456 bytes, 1000 rows"
            for part in r.data_type.split(","):
                part = part.strip()
                if part.endswith("bytes"):
                    out["size_bytes"] = int(part.split()[0])
                elif part.endswith("rows"):
                    out["row_count"] = int(part.split()[0])
    return out
