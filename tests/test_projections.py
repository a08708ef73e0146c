"""ClickHouse PROJECTION analog: parse → build cells → re-aggregate.

The load-bearing claim is the aggregate algebra — a query grouped by a
SUBSET of projection keys re-aggregated from cells must equal the same
query run directly on the base rows, exactly (cells partition the rows).
"""

import pytest
from pyspark.sql import functions as F

from clickhouse_flatfile_tool_spark.operators import projections as P


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [
            ("a", "x", 1.0),
            ("a", "x", 3.0),
            ("a", "y", 5.0),
            ("b", "x", 7.0),
            ("b", "y", None),  # NULL exercises count(col) semantics
        ],
        "g string, h string, v double",
    )


DDL = (
    "ALTER TABLE t ADD PROJECTION p_gh "
    "(SELECT g, h, sum(v), count(v), min(v), max(v), avg(v) GROUP BY g, h)"
)


def test_parse_projection():
    table, name, keys, aggs = P.parse_projection(DDL)
    assert (table, name) == ("t", "p_gh")
    assert keys == ["g", "h"]
    assert ("sum", "v") in aggs and ("avg", "v") in aggs


def test_parse_rejects_non_key_select():
    with pytest.raises(ValueError):
        P.parse_projection(
            "ALTER TABLE t ADD PROJECTION p (SELECT g, v, sum(v) GROUP BY g)"
        )


def test_reaggregation_matches_direct(spark, base):
    ps = P.ProjectionSet(base)
    ps.add(DDL, cache=False)
    want = [("sum", "v"), ("count", "v"), ("min", "v"), ("max", "v"), ("avg", "v")]
    got = {
        r.g: (r.sum_v, r.count_v, r.min_v, r.max_v, r.avg_v)
        for r in ps.query(["g"], want).collect()
    }
    direct = {
        r.g: (r.s, r.c, r.mn, r.mx, r.av)
        for r in base.groupBy("g")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.avg("v").alias("av"),
        )
        .collect()
    }
    assert got == direct
    # avg re-aggregates through (sum, count) — NOT avg of per-cell avgs:
    # group a has cells (x: avg 2.0 over 2 rows) and (y: avg 5.0 over 1),
    # whose naive mean 3.5 differs from the true 3.0
    assert got["a"][4] == 3.0


def test_chooser_subset_and_fallback(spark, base):
    ps = P.ProjectionSet(base)
    ps.add(DDL, cache=False)
    ps.add(
        "ALTER TABLE t ADD PROJECTION p_g (SELECT g, sum(v) GROUP BY g)",
        cache=False,
    )
    # grouping by g: both match; the 1-key projection is cheaper
    assert ps.choose(["g"], [("sum", "v")]) == "p_g"
    # p_g lacks min cells — must route to p_gh
    assert ps.choose(["g"], [("min", "v")]) == "p_gh"
    # grouping by a non-projection column: no match → base fallback
    assert ps.choose(["h", "g", "v"], [("sum", "v")]) is None
    rows = ps.query(["g"], [("sum", "v")], aliases=["s"]).collect()
    assert {r.g: r.s for r in rows} == {"a": 9.0, "b": 7.0}


def test_holistic_aggregate_rejected(spark, base):
    with pytest.raises(ValueError):
        P.build_projection(base, ["g"], [("median", "v")])


def test_drop_projection(spark, base):
    ps = P.ProjectionSet(base)
    ps.add(DDL)
    ps.drop("p_gh")
    assert ps.projections == {}
    # query still works via fallback
    assert ps.query(["g"], [("sum", "v")], aliases=["s"]).count() == 2


def test_api_projection_endpoints(spark, base):
    from clickhouse_flatfile_tool_spark import api

    base.createOrReplaceTempView("proj_api_t")
    added = api.add_projection(
        spark,
        "ALTER TABLE proj_api_t ADD PROJECTION pa "
        "(SELECT g, sum(v), count(v) GROUP BY g)",
    )
    assert added["success"] and added["cells"] == 2
    out = api.projection_query(
        spark, "proj_api_t", ["g"], [("sum", "v"), ("count", "v")]
    )
    assert out["success"] and out["used_projection"] == "pa"
    got = {r["g"]: (r["sum_v"], r["count_v"]) for r in out["data"]}
    assert got == {"a": (9.0, 3), "b": (7.0, 1)}
    # no matching projection -> base fallback, reported as such
    out2 = api.projection_query(spark, "proj_api_t", ["h"], [("min", "v")])
    assert out2["success"] and out2["used_projection"] is None
    api._PROJECTION_SETS.clear()


def test_api_query_transparent_projection_route(spark, base):
    """The optimize_use_projections analog: plain grouped-aggregate SQL
    over a table with a registered projection answers from cells (route
    reported); a WHERE forces the base-scan path with identical values."""
    from clickhouse_flatfile_tool_spark import api

    base.createOrReplaceTempView("proj_sql_t")
    api.add_projection(
        spark,
        "ALTER TABLE proj_sql_t ADD PROJECTION psql "
        "(SELECT g, sum(v), avg(v) GROUP BY g)",
    )
    out = api.query(
        spark,
        "SELECT g, sum(v) AS s, avg(v) AS a FROM proj_sql_t "
        "GROUP BY g ORDER BY g",
    )
    assert out["success"] and out["used_projection"] == "psql"
    assert [(r["g"], r["s"], r["a"]) for r in out["data"]] == [
        ("a", 9.0, 3.0),
        ("b", 7.0, 7.0),
    ]
    # WHERE needs base columns — must NOT route through the projection
    out2 = api.query(
        spark,
        "SELECT g, sum(v) AS s FROM proj_sql_t WHERE h = 'x' "
        "GROUP BY g ORDER BY g",
    )
    assert out2["success"] and out2["used_projection"] is None
    assert [(r["g"], r["s"]) for r in out2["data"]] == [("a", 4.0), ("b", 7.0)]
    api._PROJECTION_SETS.clear()


def test_refresh_merges_delta_cells(spark, base):
    """Appending a delta and refreshing must equal rebuilding from the
    full data — for every cell kind including the (sum, count) avg
    state."""
    ps = P.ProjectionSet(base)
    ps.add(DDL, cache=False)
    delta = spark.createDataFrame(
        [("a", "x", 9.0), ("c", "z", 2.0)], "g string, h string, v double"
    )
    ps.refresh(delta, "p_gh", cache=False)
    want = [("sum", "v"), ("count", "v"), ("min", "v"), ("max", "v"), ("avg", "v")]
    got = {
        r.g: (r.sum_v, r.count_v, r.min_v, r.max_v, r.avg_v)
        for r in ps.query(["g"], want).collect()
    }
    full = base.unionByName(delta)
    import pyspark.sql.functions as F2

    direct = {
        r.g: (r.s, r.c, r.mn, r.mx, r.av)
        for r in full.groupBy("g")
        .agg(
            F2.sum("v").alias("s"),
            F2.count("v").alias("c"),
            F2.min("v").alias("mn"),
            F2.max("v").alias("mx"),
            F2.avg("v").alias("av"),
        )
        .collect()
    }
    assert got == direct and "c" in got


def test_api_query_routes_ddl(spark, base):
    """CH clients push DDL through the query endpoint: ADD PROJECTION
    executes; mutations point at api.mutate instead of a parse error."""
    from clickhouse_flatfile_tool_spark import api

    base.createOrReplaceTempView("ddl_route_t")
    out = api.query(
        spark,
        "ALTER TABLE ddl_route_t ADD PROJECTION pr "
        "(SELECT g, sum(v) GROUP BY g)",
    )
    assert out["success"] and out["projection"] == "pr"
    mut = api.query(spark, "ALTER TABLE ddl_route_t DELETE WHERE v > 1")
    assert not mut["success"] and "api.mutate" in mut["error"]
    api._PROJECTION_SETS.clear()


def test_api_query_create_materialized_view_final(spark):
    """CREATE MATERIALIZED VIEW ... ENGINE=AggregatingMergeTree through
    the endpoint: -State aliases infer the state_map, the engine
    registers, and FROM mv FINAL merges states (uniqState -> HLL
    estimate)."""
    from clickhouse_flatfile_tool_spark import api
    from clickhouse_flatfile_tool_spark.operators import mergetree

    spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("a", 1, 3.0), ("b", 9, 4.0)],
        "g string, u int, v double",
    ).createOrReplaceTempView("mv_src")
    out = api.query(
        spark,
        "CREATE MATERIALIZED VIEW mv_agg ENGINE = AggregatingMergeTree() "
        "ORDER BY (g) AS SELECT g, sumState(v) AS sv, uniqState(u) AS uu "
        "FROM mv_src GROUP BY g",
    )
    assert out["success"] and out["states"] == {"sv": "sum", "uu": "hll"}
    fin = api.query(
        spark,
        "SELECT g, sv, hll_sketch_estimate(uu) AS users "
        "FROM mv_agg FINAL ORDER BY g",
    )
    assert fin["success"]
    got = {r["g"]: (r["sv"], r["users"]) for r in fin["data"]}
    assert got == {"a": (6.0, 2), "b": (4.0, 1)}
    spark.catalog.dropTempView("mv_agg")
    mergetree._ENGINE_REGISTRY.pop("mv_agg", None)
