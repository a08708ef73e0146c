"""Relational operator tests: pagination determinism, joins, aggregation,
windows (SURVEY §2.2-§2.6)."""

import pytest
from pyspark.sql import functions as F

from clickhouse_flatfile_tool_spark.operators import relational as R


def test_page_slice_deterministic(tables):
    from collections import Counter

    li = tables["lineitem"]
    keys = ["l_orderkey", "l_linenumber"]
    p1 = [tuple(r) for r in R.page_slice(li.select(*keys), keys, page=2, page_size=50).collect()]
    p2 = [tuple(r) for r in R.page_slice(li.select(*keys), keys, page=2, page_size=50).collect()]
    assert p1 == p2 and len(p1) == 50
    # pages 1..3 tile the first 150 rows of the global sort (as a multiset —
    # the fixture contains duplicate (orderkey, linenumber) pairs)
    pages = [
        tuple(r)
        for p in (1, 2, 3)
        for r in R.page_slice(li.select(*keys), keys, page=p, page_size=50).collect()
    ]
    prefix = [tuple(r) for r in li.select(*keys).orderBy(*keys).limit(150).collect()]
    assert Counter(pages) == Counter(prefix)


def test_page_size_clamp(tables):
    # MAX_PAGE_SIZE clamp (server.js:54, 465)
    li = tables["lineitem"]
    out = R.page_slice(li, ["l_orderkey", "l_linenumber"], page=1, page_size=99999)
    assert out.count() == R.MAX_PAGE_SIZE


def test_preview_metadata(tables):
    li = tables["lineitem"]
    total = li.count()
    df, meta = R.preview(li, ["l_orderkey"], ["l_orderkey", "l_linenumber"], page=1, page_size=100)
    assert meta.total == total
    assert meta.total_pages == -(-total // 100)
    assert df.columns == ["l_orderkey"]


def test_chain_join_matches_sql(spark, tables):
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    joined = R.chain_join(
        [tables["lineitem"], tables["orders"]], ["l_orderkey = o_orderkey"]
    )
    expected = spark.sql(
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).first().n
    assert joined.count() == expected


def test_chain_join_validation(tables):
    with pytest.raises(ValueError):
        R.chain_join([tables["lineitem"]], [])
    with pytest.raises(ValueError):
        R.chain_join([tables["lineitem"], tables["orders"]], [])


def test_join_types(tables):
    li, o = tables["lineitem"], tables["orders"]
    inner = R.chain_join([o, li], ["o_orderkey = l_orderkey"], how="inner").count()
    left = R.chain_join([o, li], ["o_orderkey = l_orderkey"], how="left").count()
    anti = R.chain_join([o, li], ["o_orderkey = l_orderkey"], how="left_anti").count()
    assert left >= inner
    assert anti == left - inner  # orders with no lineitem appear once in left


def test_join_candidates():
    schemas = {
        "orders": [("o_orderkey", "bigint"), ("x", "string")],
        "lineitem": [("o_orderkey", "bigint"), ("x", "int")],
    }
    cands = R.join_candidates(schemas)
    assert {"left": "lineitem", "right": "orders", "column": "o_orderkey", "type": "bigint"} in cands
    assert all(c["column"] != "x" for c in cands)  # type mismatch excluded


def test_topk_matches_sort(tables):
    o = tables["orders"]
    top = R.top_k(o.select("o_orderkey", "o_totalprice"), 5, F.desc("o_totalprice"), "o_orderkey")
    brute = sorted(
        [(r.o_totalprice, r.o_orderkey) for r in o.select("o_orderkey", "o_totalprice").collect()],
        key=lambda t: (-t[0], t[1]),
    )[:5]
    assert [(r.o_totalprice, r.o_orderkey) for r in top.collect()] == brute


def test_aggregate_modes(tables):
    li = tables["lineitem"]
    plain = R.aggregate(li, ["l_returnflag"], [("count", "l_orderkey", "n")])
    rollup = R.aggregate(li, ["l_returnflag"], [("count", "l_orderkey", "n")], mode="rollup")
    # rollup adds exactly one grand-total row for a single group column
    assert rollup.count() == plain.count() + 1
    total = li.count()
    assert rollup.filter(F.col("l_returnflag").isNull()).first().n == total


def test_top_k_per_group(tables):
    o = tables["orders"]
    out = R.top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_totalprice"), "o_orderkey"],
        2,
    )
    sizes = out.groupBy("o_custkey").count()
    assert sizes.agg(F.max("count")).first()[0] <= 2


def test_set_ops(tables):
    c = tables["customer"]
    a = c.filter("c_acctbal > 0").select("c_custkey")
    b = c.filter("c_acctbal > 5000").select("c_custkey")
    assert R.intersect(a, b).count() == b.count()  # b ⊆ a
    assert R.except_(b, a).count() == 0
    assert R.union_all(a, b).count() == a.count() + b.count()
