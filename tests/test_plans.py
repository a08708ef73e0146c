"""Plan-shape assertions: the 100 TB design rules as executable checks
(SURVEY §4.2).  If a future change drops a broadcast hint or breaks predicate
pushdown, these fail."""

from pyspark.sql import functions as F

from clickhouse_flatfile_tool_spark.operators import relational as R
from clickhouse_flatfile_tool_spark.plans import explain_str
from clickhouse_flatfile_tool_spark.plans.explain import pushed_filters


def test_dim_join_broadcasts(tables):
    joined = R.chain_join(
        [tables["lineitem"], R.broadcast_dim(tables["part"])],
        ["l_partkey = p_partkey"],
    )
    plan = explain_str(joined)
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_scan(tables):
    df = tables["lineitem"].filter(F.col("l_quantity") > 45).select("l_orderkey")
    pf = pushed_filters(df)
    assert "l_quantity" in pf, f"expected pushed filter, got: {pf!r}"


def test_column_pruning_in_read_schema(tables):
    df = tables["lineitem"].select("l_orderkey", "l_quantity")
    plan = explain_str(df)
    # ReadSchema should carry only the projected columns, not all 11
    read_schema_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema_lines and "l_extendedprice" not in read_schema_lines[0]


def test_topk_plans_take_ordered(tables):
    df = R.top_k(tables["orders"], 5, F.desc("o_totalprice"))
    assert "TakeOrderedAndProject" in explain_str(df)


def test_minhash_no_cartesian(tables):
    from clickhouse_flatfile_tool_spark.operators import dedup as D
    from clickhouse_flatfile_tool_spark.plans import assert_no_cartesian

    cands = D.minhash_lsh_candidates(tables["documents"].limit(50))
    assert_no_cartesian(cands)
