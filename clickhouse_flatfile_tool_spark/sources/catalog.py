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
