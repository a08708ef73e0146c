

def test_max_intersections_hand_computed(spark):
    """Sweep-line peak concurrency: half-open [s, e) — a close at t and an
    open at t do NOT overlap; peak_at is the earliest position reaching
    the max."""
    from clickhouse_flatfile_tool_spark.operators.events import max_intersections

    rows = [
        (1, 0, 10), (1, 5, 15), (1, 10, 20),   # [0,10) [5,15) [10,20): max 2 at t=5
        (2, 0, 5), (2, 5, 10),                 # touching: never overlap -> 1
        (3, 0, 100), (3, 1, 2), (3, 1, 3),     # 3 open during [1,2)
    ]
    df = spark.createDataFrame(rows, "k int, s int, e int")
    out = {r.k: (r.max_intersections, r.peak_at) for r in
           max_intersections(df, "s", "e", key_col="k").collect()}
    assert out[1] == (2, 5)
    assert out[2] == (1, 0)
    assert out[3] == (3, 1)


def test_props_variant_stats_handles_malformed(spark):
    """try_parse_json: malformed/NULL props rows count in n but not in
    n_with_path; sums are exact."""
    from clickhouse_flatfile_tool_spark.operators.events import props_variant_stats

    rows = [
        ("a", '{"k": 5}'),
        ("a", '{"k": 7}'),
        ("a", "not json"),
        ("a", None),
        ("b", '{"other": 1}'),
    ]
    df = spark.createDataFrame(rows, "event_type string, props string")
    out = {r.event_type: (r.n, r.n_with_path, r.sum_path)
           for r in props_variant_stats(df).collect()}
    assert out["a"] == (4, 2, 12)
    assert out["b"] == (1, 0, None)


def test_sparkbar_golden(spark):
    """sparkbar: equal-width buckets, ceil-of-8ths glyphs, spaces for
    empty buckets, full block for the max bucket."""
    from clickhouse_flatfile_tool_spark.operators.events import sparkbar

    rows = [
        # group g: x spans 0..7 -> one bucket per x with buckets=8
        ("g", 0.0, 8.0), ("g", 1.0, 4.0), ("g", 3.0, 2.0), ("g", 7.0, 8.0),
        # group h: single x value -> everything lands in bucket 0
        ("h", 5.0, 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r["k"]: r["bar"] for r in sparkbar(df, ["k"], "x", "y").collect()}
    # g: sums per bucket [8,4,0,2,0,0,0,8] -> levels [8,4,_,2,_,_,_,8]
    assert got["g"] == "█▄ ▂   █"
    assert got["h"] == "█" + " " * 7
