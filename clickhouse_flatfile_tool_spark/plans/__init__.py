from clickhouse_flatfile_tool_spark.plans.explain import explain_str, assert_no_cartesian

__all__ = ["explain_str", "assert_no_cartesian"]
