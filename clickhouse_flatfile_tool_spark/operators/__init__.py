from clickhouse_flatfile_tool_spark.operators import (  # noqa: F401
    dedup,
    events,
    multimodal,
    relational,
    similarity,
    text,
)
