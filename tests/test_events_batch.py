"""Batch event-operator tests mandated by round-1 advice: sequence_match
with overlapping/out-of-order steps, gap_fill at negative epochs and
single-bucket inputs, forward_fill with leading NULL runs, and NTZ parquet
normalization (top-level and nested)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clickhouse_flatfile_tool_spark.operators import events as E

TS = dt.datetime  # fixture rows use naive datetimes; session TZ is UTC


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )


def test_sequence_match_overlapping_conditions(spark):
    """An event satisfying BOTH steps must still serve whichever step the
    greedy pointer is at — single-symbol labeling (first-step-wins) fails
    user 2 here."""
    rows = [
        # user 1: step-2-worthy event comes first, then only weak events → no match
        (1, 1, TS(2024, 1, 1, 10, 0), 60.0),
        (1, 2, TS(2024, 1, 1, 11, 0), 5.0),
        # user 2: weak (step1-only) then strong (satisfies both) → match,
        # even though the strong event also satisfies step 1
        (2, 3, TS(2024, 1, 1, 10, 0), 15.0),
        (2, 4, TS(2024, 1, 1, 11, 0), 60.0),
        # user 3: strong then strong → match (first serves step1, second step2)
        (3, 5, TS(2024, 1, 1, 10, 0), 70.0),
        (3, 6, TS(2024, 1, 1, 11, 0), 80.0),
    ]
    out = {
        r.user_id: r.matched
        for r in E.sequence_match(
            _events(spark, rows), ["value > 10", "value > 50"], key_col="user_id"
        ).collect()
    }
    assert out == {1: 0, 2: 1, 3: 1}


def test_sequence_match_out_of_order_input(spark):
    """Row order in the source must not matter — only event time does."""
    rows = [  # deliberately shuffled: step 2's event appears first in input
        (1, 2, TS(2024, 1, 1, 12, 0), 100.0),
        (1, 1, TS(2024, 1, 1, 10, 0), 20.0),
    ]
    out = E.sequence_match(
        _events(spark, rows), ["value > 10", "value > 50"], key_col="user_id"
    ).collect()
    assert out[0].matched == 1
    # reversed event times → no match
    rows_rev = [
        (1, 2, TS(2024, 1, 1, 9, 0), 100.0),
        (1, 1, TS(2024, 1, 1, 10, 0), 20.0),
    ]
    out = E.sequence_match(
        _events(spark, rows_rev), ["value > 10", "value > 50"], key_col="user_id"
    ).collect()
    assert out[0].matched == 0


def test_sequence_match_tie_breaks_on_event_id(spark):
    """Equal timestamps resolve by tiebreak column: step 2's event must have
    a LARGER (ts, event_id) than step 1's."""
    rows = [
        (1, 1, TS(2024, 1, 1, 10, 0), 20.0),
        (1, 2, TS(2024, 1, 1, 10, 0), 100.0),  # same ts, higher id → after
    ]
    out = E.sequence_match(
        _events(spark, rows), ["value > 10", "value > 50"], key_col="user_id"
    ).collect()
    assert out[0].matched == 1


def test_gap_fill_negative_epoch_floors(spark):
    """Pre-1970 timestamps must floor to the LOWER bucket boundary (cast
    truncates toward zero and would round them up)."""
    rows = [(1, 1, TS(1969, 12, 31, 23, 30), 1.0)]
    df = _events(spark, rows).withColumn("event_type", F.lit("x"))
    out = E.gap_fill(df, step_minutes=60).collect()
    assert len(out) == 1
    assert out[0].bucket == TS(1969, 12, 31, 23, 0)


def test_gap_fill_single_bucket_and_gaps(spark):
    rows = [
        (1, 1, TS(2024, 1, 1, 10, 5), 1.0),
        (1, 2, TS(2024, 1, 1, 10, 55), 2.0),
        (1, 3, TS(2024, 1, 1, 13, 1), 3.0),  # 2-hour gap → 2 zero buckets
    ]
    df = _events(spark, rows).withColumn("event_type", F.lit("x"))
    got = {
        r.bucket: (r.n_events, r.sum_value)
        for r in E.gap_fill(df, step_minutes=60).collect()
    }
    assert got == {
        TS(2024, 1, 1, 10): (2, 3.0),
        TS(2024, 1, 1, 11): (0, 0.0),
        TS(2024, 1, 1, 12): (0, 0.0),
        TS(2024, 1, 1, 13): (1, 3.0),
    }
    # single bucket input → single row, no fill
    one = E.gap_fill(
        _events(spark, rows[:2]).withColumn("event_type", F.lit("x")), step_minutes=60
    ).collect()
    assert len(one) == 1 and one[0].n_events == 2


def test_forward_fill_leading_nulls_stay_null(spark):
    rows = [
        (1, 1, TS(2024, 1, 1, 10), None),  # leading NULL: nothing to carry
        (1, 2, TS(2024, 1, 1, 11), 5.0),
        (1, 3, TS(2024, 1, 1, 12), None),  # filled with 5.0
        (1, 4, TS(2024, 1, 1, 13), None),  # still 5.0 (run of NULLs)
        (2, 5, TS(2024, 1, 1, 10), 7.0),   # other key unaffected
    ]
    out = {
        r.event_id: r.value_filled
        for r in E.forward_fill(_events(spark, rows)).collect()
    }
    assert out == {1: None, 2: 5.0, 3: 5.0, 4: 5.0, 5: 7.0}


@pytest.fixture()
def ntz_parquet(tmp_path):
    """Parquet with TIMESTAMP_NTZ at top level AND nested in a struct and an
    array (isAdjustedToUTC=false — the pandas/pyarrow default)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = dt.datetime(2024, 1, 2, 3, 4, 5)
    ts_type = pa.timestamp("us")  # no tz → NTZ in parquet
    table = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([t, t], ts_type),
            "meta": pa.array(
                [{"created": t}, {"created": t}],
                pa.struct([("created", ts_type)]),
            ),
            "history": pa.array([[t], [t, t]], pa.list_(ts_type)),
        }
    )
    p = str(tmp_path / "ntz.parquet")
    pq.write_table(table, p)
    return p


def _flavors(df):
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


def test_read_parquet_normalizes_ntz_everywhere(spark, ntz_parquet):
    from clickhouse_flatfile_tool_spark.sources.files import read_parquet

    df = read_parquet(spark, ntz_parquet)
    fl = _flavors(df)
    assert fl["ts"] == "timestamp"
    assert fl["meta"] == "struct<created:timestamp>"
    assert fl["history"] == "array<timestamp>"
    row = df.orderBy("id").first()
    assert row.ts == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert row.meta.created == row.ts and row.history[0] == row.ts


def test_read_parquet_evolved_matches_read_parquet(spark, ntz_parquet):
    from clickhouse_flatfile_tool_spark.sources.files import (
        read_parquet,
        read_parquet_evolved,
    )

    a = _flavors(read_parquet(spark, ntz_parquet))
    b = _flavors(read_parquet_evolved(spark, ntz_parquet))
    assert a == b


def test_event_stream_watermark_accepts_normalized_ts(spark, ntz_parquet):
    """The streaming reader must emit watermark-compatible TIMESTAMP (the
    round-1 EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE failure)."""
    from clickhouse_flatfile_tool_spark.streaming.stream_ops import read_event_stream

    stream = read_event_stream(spark, ntz_parquet)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    # withWatermark would raise AnalysisException on NTZ at plan time
    stream.withWatermark("ts", "10 minutes").groupBy(
        F.window("ts", "5 minutes")
    ).count()


def test_gap_fill_interpolated_linear_blend(spark):
    rows = [
        (1, 1, TS(2024, 1, 1, 10, 30), 10.0),
        (1, 2, TS(2024, 1, 1, 13, 30), 40.0),  # 2 empty buckets between
    ]
    df = _events(spark, rows).withColumn("event_type", F.lit("x"))
    got = {
        r.bucket: r.sum_value_interp
        for r in E.gap_fill_interpolated(df, step_minutes=60).collect()
    }
    assert got[TS(2024, 1, 1, 10)] == 10.0
    assert got[TS(2024, 1, 1, 11)] == 20.0   # 1/3 of the way 10 -> 40
    assert got[TS(2024, 1, 1, 12)] == 30.0   # 2/3
    assert got[TS(2024, 1, 1, 13)] == 40.0


def test_tumbling_avg_value_matches_float_average(spark, tables):
    """Regression for the 100x avg bug: the integer-exact avg_value must
    track the plain float average (cents multiplier 200, not 20000)."""
    import pyspark.sql.functions as F
    from clickhouse_flatfile_tool_spark.operators.events import tumbling_window_agg

    ev = tables["events"]
    exact = tumbling_window_agg(ev).select("window_start", "avg_value")
    ref = ev.groupBy(F.window("ts", "10 minutes").alias("w")).agg(
        F.avg("value").alias("fa")
    ).select(F.col("w.start").alias("window_start"), "fa")
    joined = exact.join(ref, "window_start").select(
        F.max(F.abs(F.col("avg_value") - F.col("fa"))).alias("maxdiff")
    )
    assert joined.first().maxdiff < 1e-4


def test_window_funnel_hand_computed(spark):
    from clickhouse_flatfile_tool_spark.operators.events import window_funnel

    rows = [
        # u1: full chain inside the window
        (1, "2024-01-01 10:00:00", 1, "view"),
        (1, "2024-01-01 10:10:00", 2, "click"),
        (1, "2024-01-01 10:20:00", 3, "purchase"),
        # u2: purchase lands past the 1h window of the only view → level 2
        (2, "2024-01-01 10:00:00", 4, "view"),
        (2, "2024-01-01 10:30:00", 5, "click"),
        (2, "2024-01-01 11:30:00", 6, "purchase"),
        # u3: steps out of order → level 1 (view exists, click precedes it)
        (3, "2024-01-01 10:05:00", 7, "click"),
        (3, "2024-01-01 10:10:00", 8, "view"),
        # u4: no step-1 event at all → level 0
        (4, "2024-01-01 10:00:00", 9, "error"),
        # u5: LATER view starts a complete chain the first view can't reach
        (5, "2024-01-01 09:00:00", 10, "view"),
        (5, "2024-01-01 11:00:00", 11, "view"),
        (5, "2024-01-01 11:10:00", 12, "click"),
        (5, "2024-01-01 11:20:00", 13, "purchase"),
        # u6: boundary — purchase exactly at view + 1h counts (<=)
        (6, "2024-01-01 10:00:00", 14, "view"),
        (6, "2024-01-01 10:30:00", 15, "click"),
        (6, "2024-01-01 11:00:00", 16, "purchase"),
    ]
    df = spark.createDataFrame(
        [(u, __import__("datetime").datetime.fromisoformat(t), e, ty) for u, t, e, ty in rows],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    out = {
        r.user_id: r.level
        for r in window_funnel(
            df,
            3600,
            ["event_type = 'view'", "event_type = 'click'", "event_type = 'purchase'"],
        ).collect()
    }
    assert out == {1: 3, 2: 2, 3: 1, 4: 0, 5: 3, 6: 3}


def test_sequence_count_non_overlapping(spark):
    import datetime

    from clickhouse_flatfile_tool_spark.operators.events import sequence_count

    def mk(u, t, e, ty):
        return (u, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=t), e, ty)

    rows = [
        # u1: A B A B → 2 complete non-overlapping A→B chains
        mk(1, 0, 1, "a"), mk(1, 1, 2, "b"), mk(1, 2, 3, "a"), mk(1, 3, 4, "b"),
        # u2: A A B → greedy: first A starts, B completes → 1 (second A ignored mid-chain)
        mk(2, 0, 5, "a"), mk(2, 1, 6, "a"), mk(2, 2, 7, "b"),
        # u3: B A → 0 (wrong order)
        mk(3, 0, 8, "b"), mk(3, 1, 9, "a"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {
        r.user_id: r.n_matches
        for r in sequence_count(
            df, ["event_type = 'a'", "event_type = 'b'"]
        ).collect()
    }
    assert out == {1: 2, 2: 1, 3: 0}


def test_window_funnel_strict_modes(spark):
    from clickhouse_flatfile_tool_spark.operators.events import window_funnel

    steps = ["ev = 'A'", "ev = 'B'", "ev = 'C'"]

    def run(rows, mode=None):
        df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, ev string")
        out = window_funnel(df, 3600, steps, mode=mode).collect()
        return {r.user_id: r.level for r in out}

    from datetime import datetime

    t = lambda s: datetime(2024, 1, 1, 10, 0, s)
    # user 1: A, D, B, C — D between A and B
    rows1 = [(1, i, t(i * 10), e) for i, e in enumerate(["A", "D", "B", "C"])]
    assert run(rows1)[1] == 3                      # default: D ignored
    assert run(rows1, "strict_order")[1] == 1      # D interrupts after A
    # user 2: A, B, C clean — all modes give 3
    rows2 = [(2, i, t(i * 10), e) for i, e in enumerate(["A", "B", "C"])]
    for m in (None, "strict_order", "strict_dedup", "strict_increase"):
        assert run(rows2, m)[2] == 3, m
    # user 3: A, A, B, C — repeated step-1 event
    rows3 = [(3, i, t(i * 10), e) for i, e in enumerate(["A", "A", "B", "C"])]
    assert run(rows3)[3] == 3                      # default: repeat harmless
    # strict_dedup: the first chain (start at event 0) is interrupted by
    # the second A, but the chain STARTING at the second A runs clean
    assert run(rows3, "strict_dedup")[3] == 3
    # user 4: A, B, A, C — repeat of matched step 1 after B
    rows4 = [(4, i, t(i * 10), e) for i, e in enumerate(["A", "B", "A", "C"])]
    assert run(rows4)[4] == 3
    assert run(rows4, "strict_dedup")[4] == 2      # second A interrupts at level 2
    # user 5: A and B share a timestamp
    rows5 = [(5, 0, t(0), "A"), (5, 1, t(0), "B"), (5, 2, t(20), "C")]
    assert run(rows5)[5] == 3                      # default: ties advance
    assert run(rows5, "strict_increase")[5] == 1   # equal ts never matches B...
    # ...but a later B recovers the chain (skip, not interrupt):
    # A(t0) -> B(t10) -> C(t20), strictly increasing all the way
    rows5b = rows5 + [(5, 3, t(10), "B")]
    assert run(rows5b, "strict_increase")[5] == 3


def test_ewma_final_hand_computed(spark):
    import math
    from datetime import datetime

    from clickhouse_flatfile_tool_spark.operators.events import ewma_final

    t0 = datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), 10.0),   # age 2h at tmax
        (1, datetime(2024, 1, 1, 11, 0, 0), 20.0),   # age 1h
        (1, datetime(2024, 1, 1, 12, 0, 0), 40.0),   # newest, weight 1
        (2, t0, 7.0),                                 # single event -> ewma = value
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r.user_id: r for r in ewma_final(df, halflife_seconds=3600.0).collect()}
    w = [0.25, 0.5, 1.0]  # 2^-2, 2^-1, 2^0
    expect = (10 * w[0] + 20 * w[1] + 40 * w[2]) / sum(w)
    assert math.isclose(out[1].ewma, expect, rel_tol=1e-12)
    assert out[1].n_events == 3
    assert out[2].ewma == 7.0 and out[2].n_events == 1
    # newest events dominate: ewma sits between the plain mean and the
    # newest value
    assert (10 + 20 + 40) / 3 < out[1].ewma < 40


def test_lttb_keeps_endpoints_and_spike(spark):
    """LTTB must keep both endpoints and prefer the spike over flat
    neighbors in its bucket; short series pass through unchanged."""
    from clickhouse_flatfile_tool_spark.operators.events import lttb

    pts = [(1, float(i), 1.0) for i in range(12)]
    pts[5] = (1, 5.0, 50.0)  # the spike LTTB exists to keep
    df = spark.createDataFrame(pts, "k int, x double, y double")
    out = {
        r.sel_idx: (r.x, r.y)
        for r in lttb(df, ["k"], "x", "y", n_out=5).collect()
    }
    assert len(out) == 5
    assert out[0] == (0.0, 1.0) and out[4] == (11.0, 1.0)
    assert (5.0, 50.0) in out.values()
    # short series: all points, in x order
    short = spark.createDataFrame(
        [(2, 3.0, 1.0), (2, 1.0, 2.0)], "k int, x double, y double"
    )
    rows = lttb(short, ["k"], "x", "y", n_out=5).orderBy("sel_idx").collect()
    assert [(r.x, r.y) for r in rows] == [(1.0, 2.0), (3.0, 1.0)]
