from clickhouse_flatfile_tool_spark.sources.files import read_csv, read_parquet, read_table_dir
from clickhouse_flatfile_tool_spark.sources.catalog import list_tables, describe_table, ping

__all__ = [
    "read_csv",
    "read_parquet",
    "read_table_dir",
    "list_tables",
    "describe_table",
    "ping",
]
