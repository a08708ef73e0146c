from clickhouse_flatfile_tool_spark.sinks.writers import (
    create_table_if_absent,
    append_table,
    export_csv,
    bootstrap_sample_data,
)

__all__ = [
    "create_table_if_absent",
    "append_table",
    "export_csv",
    "bootstrap_sample_data",
]
