"""ClickHouse connector (JDBC), gated so the rest of the engine works without
a ClickHouse server or driver jar present (the test environment has neither).

Reference equivalents:
  * connect with host/port/database/user/password — /root/reference/server/
    server.js:95-124 (defaults localhost:8123/default/default/"")
  * table scan as JSONEachRow — server.js:467-471, 610-618
  * batched INSERT (1000-row batches) — server.js:52, 626-649, 695-718.
    Spark's JDBC writer batches natively (``batchsize``) and writes
    partition-parallel — replacing the reference's O(n²) LIMIT/OFFSET paging
    loop (server.js:603-624, SURVEY.md §2.11) with one distributed pass.

The reference's native port is 9000 and HTTP port 8123; the ClickHouse JDBC
driver speaks HTTP, so the default port here matches 8123
(clickhouse/docker-compose.yml:6-7).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

JDBC_DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"


@dataclass(frozen=True)
class ClickHouseConnection:
    """Connection params, defaults per server.js:99-104."""

    host: str = "localhost"
    port: int = 8123
    database: str = "default"
    user: str = "default"
    password: str = ""  # the reference calls this jwtToken (server.js:98)
    properties: dict[str, str] = field(default_factory=dict)

    @property
    def url(self) -> str:
        return f"jdbc:clickhouse://{self.host}:{self.port}/{self.database}"

    def jdbc_options(self) -> dict[str, str]:
        opts = {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": JDBC_DRIVER,
        }
        opts.update(self.properties)
        return opts


def driver_available(spark: SparkSession) -> bool:
    """True if the ClickHouse JDBC driver jar is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(JDBC_DRIVER)  # noqa: SLF001
        return True
    except Exception:
        return False


def read_jdbc_options(
    conn: ClickHouseConnection,
    table: str,
    columns: list[str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> dict[str, str]:
    """The full JDBC reader option map (pure function — unit-testable without
    a driver jar or server; the env ships neither)."""
    proj = ", ".join(columns) if columns else "*"
    opts = dict(conn.jdbc_options())
    opts["dbtable"] = f"(SELECT {proj} FROM {table}) AS src"
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    return opts


def read_clickhouse_table(
    spark: SparkSession,
    conn: ClickHouseConnection,
    table: str,
    columns: list[str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Scan a ClickHouse table via JDBC.

    ``partition_column`` + bounds split the scan into ``num_partitions``
    parallel range reads — the distributed replacement for the reference's
    single-threaded paged SELECT (server.js:603-624).  Column projection is
    pushed into the remote query via ``dbtable`` subquery so ClickHouse never
    ships unselected columns.
    """
    opts = read_jdbc_options(
        conn, table, columns, partition_column, num_partitions, lower_bound, upper_bound
    )
    return spark.read.format("jdbc").options(**opts).load()


def write_clickhouse_table(
    df: DataFrame,
    conn: ClickHouseConnection,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    order_by: str = "tuple()",
) -> None:
    """Bulk load a DataFrame into ClickHouse.

    Creates the target as ``ENGINE = MergeTree() ORDER BY tuple()`` when
    absent — the reference's DDL (server.js:586-601, 671-678) — via
    ``createTableOptions``.  Batch size default is 10× the reference's 1000
    (server.js:52): prepared-statement batches are far cheaper than the
    reference's string-built INSERT VALUES, and each Spark partition streams
    its own batches concurrently.
    """
    opts = write_jdbc_options(conn, table, batch_size, order_by)
    df.write.format("jdbc").options(**opts).mode(mode).save()


def write_jdbc_options(
    conn: ClickHouseConnection,
    table: str,
    batch_size: int = 10_000,
    order_by: str = "tuple()",
) -> dict[str, str]:
    """The full JDBC writer option map, including the MergeTree DDL
    (pure function — unit-testable without a driver jar or server)."""
    opts = dict(conn.jdbc_options())
    opts.update(
        dbtable=table,
        batchsize=str(batch_size),
        isolationLevel="NONE",
        createTableOptions=f"ENGINE = MergeTree() ORDER BY {order_by}",
    )
    return opts
