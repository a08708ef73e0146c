

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
