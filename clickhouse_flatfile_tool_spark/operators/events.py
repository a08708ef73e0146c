"""Event / time-series operators (EXT E6, SURVEY §2.10): tumbling, sliding,
and session windows, plus JSON property extraction.

Fixture: ``events(event_id, ts, user_id, event_type, value, props)`` where
``props`` is a JSON string like ``{"k": 87}`` (FIXTURES.md §1) — the
stringly-typed style the reference's JSONEachRow transfer would produce
(/root/reference/server/server.js:141, 232, 458).

Batch forms live here (oracle-checkable against DuckDB); streaming variants
(watermarks, AvailableNow) are in
:mod:`clickhouse_flatfile_tool_spark.streaming.stream_ops`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType(), True)])


def with_props(df: DataFrame, props_col: str = "props") -> DataFrame:
    """Parse the JSON props column with an explicit schema (never
    schema_of_json over the data — one pass, no sampling)."""
    return df.withColumn("props_s", F.from_json(F.col(props_col), PROPS_SCHEMA))


def tumbling_window_agg(
    df: DataFrame,
    window_duration: str = "10 minutes",
    ts_col: str = "ts",
    group_extra: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window aggregation: count + value stats per window (+ extra
    keys).  ``F.window`` assigns each row to exactly one bucket — map-side,
    no blowup; the shuffle is keyed by (window, extras).

    ``avg_value`` is computed with integer-exact half-up rounding (cent sums
    → ``(c·10⁴·2 + n) div 2n``): values are 2-decimal, so ``avg(value)``
    lands EXACTLY on .xxxx5 rounding boundaries whenever n divides 10⁴
    (e.g. 508.29/8 = 63.536250) and float round-half-up then disagrees
    between engines on the last digit — caught by the sf0.1 oracle diff.
    The quotient uses Spark's ``div`` (truncating long division) — the
    exact twin of the DuckDB oracle's ``//`` at ALL magnitudes; routing
    through double division drifts once the numerator passes 2^53.
    Multiplier is 200 (cents·100·2): cents/(100·n) scaled to 4 decimals —
    a 20000 multiplier here would return the average in CENTS (100× the
    true value), the bug class a cross-engine hash can't catch because
    the oracle mirrors the formula."""
    group_extra = group_extra or []
    cents = F.sum(F.round(F.col("value") * 100).cast("long"))
    n = F.count(F.lit(1))
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), *group_extra)
        .agg(
            n.alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            cents.alias("_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_extra,
            "n_events",
            "sum_value",
            F.expr(
                "CAST((_cents * 200 + n_events) DIV (n_events * 2) AS DOUBLE)"
                " / 10000.0"
            ).alias("avg_value"),
        )
    )


def sliding_window_agg(
    df: DataFrame,
    window_duration: str = "10 minutes",
    slide: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window aggregation — each row lands in window/slide buckets
    (explode factor = duration/slide, bounded and known at plan time)."""
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def session_window_agg(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity.  Uses the built-in ``session_window`` (Spark merges adjacent
    windows in the agg — one shuffle on the user key)."""
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def event_type_funnel(df: DataFrame) -> DataFrame:
    """Per-type event stats with props extraction — exercises from_json +
    groupBy together (the reference-era stringly-JSON pattern done right).

    ``avg_k`` (mean of an integer) uses integer-exact half-up rounding —
    int sums over counts dividing 10⁴ land exactly on .xxxx5 float
    boundaries where engines round apart (same class as the tumbling
    avg_value divergence caught at sf0.1).  Quotient via ``div`` on longs,
    the exact twin of the oracle's ``//`` (see tumbling_window_agg)."""
    return (
        with_props(df)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.sum(F.col("props_s.k").cast("long")).alias("_ksum"),
            F.count(F.col("props_s.k")).alias("_nk"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "event_type",
            "n_events",
            "sum_value",
            F.expr(
                "CAST((_ksum * 20000 + _nk) DIV (_nk * 2) AS DOUBLE) / 10000.0"
            ).alias("avg_k"),
            "first_ts",
            "last_ts",
        )
    )


def multi_resolution_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_cols: list[str] | None = None,
    persist: bool = True,
) -> dict[str, DataFrame]:
    """Hierarchical time rollup: minute → hour → day, where each coarser
    resolution re-aggregates the next finer one instead of rescanning raw
    rows (the continuous-aggregate / hypertable-rollup pattern).

    ``persist=True`` (default) persists the minute and hour levels so
    materializing all three levels really is one full scan plus two tiny
    re-aggregations — WITHOUT it, Spark's lazy lineage recomputes the
    finer level under each coarser one (three full scans, exactly the
    cost this pattern exists to avoid).  The caller owns ``unpersist()``
    when done; in production the levels would be written to storage
    instead.  Only algebraic aggregates are carried (sum/count/min/max —
    they compose exactly); avg is derived as sum/count at read time.
    """
    keys = group_cols or []

    def agg_from(src: DataFrame, trunc: str, ts_in: str) -> DataFrame:
        return (
            src.groupBy(F.date_trunc(trunc, F.col(ts_in)).alias("bucket"), *keys)
            .agg(
                F.sum("v_sum").alias("v_sum"),
                F.sum("v_cnt").alias("v_cnt"),
                F.min("v_min").alias("v_min"),
                F.max("v_max").alias("v_max"),
            )
        )

    base = df.select(
        F.col(ts_col).alias("__ts"),
        *keys,
        F.col(value_col).alias("v_sum"),
        F.lit(1).cast("long").alias("v_cnt"),
        F.col(value_col).alias("v_min"),
        F.col(value_col).alias("v_max"),
    )
    minute = agg_from(base, "minute", "__ts")
    if persist:
        minute = minute.persist()
    hour = agg_from(minute, "hour", "bucket")
    if persist:
        hour = hour.persist()
    day = agg_from(hour, "day", "bucket")
    return {"minute": minute, "hour": hour, "day": day}


def hll_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    lg_k: int = 14,
) -> DataFrame:
    """Re-aggregatable distinct-count rollup: per-hour HLL sketches of
    ``key_col``, MERGED (``hll_union_agg``) — not recomputed — into per-day
    estimates.  This is the ClickHouse ``uniqState``/``uniqMerge``
    (AggregatingMergeTree) pattern: at 100 TB the raw events are scanned
    once to build the tiny hourly sketch table; every coarser resolution
    aggregates sketches, whose size is O(2^lg_k) regardless of row count.

    Exact distinct would need the full key set through the shuffle; the
    sketch shuffle is constant-size per bucket.
    """
    hourly = df.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("hour")).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    daily = hourly.groupBy(F.date_trunc("day", F.col("hour")).alias("day")).agg(
        F.hll_union_agg(F.col("sk")).alias("sk"),
        F.sum("n_events").alias("n_events"),
    )
    return daily.select(
        "day",
        F.hll_sketch_estimate(F.col("sk")).alias("approx_users"),
        "n_events",
    )


def retention_cohorts(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention: users grouped by first-seen date; for each
    (cohort, day-offset) the distinct users active that day.

    Two shuffles total — one groupBy(user) for the first-seen date, one
    groupBy(cohort, offset) for the counts; the activity set is deduped
    per (user, day) BEFORE the join so the join input is bounded by
    users×days, not raw events.
    """
    day = F.to_date(F.col(ts_col))
    first_seen = df.groupBy(F.col(user_col)).agg(F.min(day).alias("cohort"))
    activity = df.select(F.col(user_col), day.alias("day")).distinct()
    return (
        activity.join(first_seen, user_col)
        .groupBy("cohort", F.datediff(F.col("day"), F.col("cohort")).alias("day_offset"))
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def sequence_match(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2)...')`` analog: per key, did the
    step conditions occur in timestamp order (other events may interleave)?

    ``steps`` are SQL boolean expressions over the row (e.g.
    ``["event_type = 'signup'", "event_type = 'purchase'"]``).  Each event
    gets a bitmask of EVERY step it satisfies (an event may satisfy several
    — e.g. steps ``value > 0`` then ``value > 10``); the per-key event list
    (ordered by ts, tiebroken by ``tiebreak_col`` for determinism) is then
    scanned with the classic greedy funnel algorithm: a pointer starts at
    step 1 and advances whenever the current event satisfies the pointed-at
    step.  Greedy earliest-advance is provably optimal for subsequence
    existence, so this matches ClickHouse ``sequenceMatch('(?1).*(?2)…')``
    even when one event satisfies multiple step conditions.

    Scale: one shuffle keyed by ``key_col``; per-key state is the event list
    — the same per-group memory bound ClickHouse's sequenceMatch has
    (reference capability surface is SQL-in-ClickHouse, server.js:837-844).
    The bitmask runs map-side inside codegen; only (ts, tiebreak, int mask)
    structs travel through the shuffle, not full rows; the greedy scan is a
    built-in ``aggregate`` over the sorted array — no UDF.
    """
    n = len(steps)
    if not 1 <= n <= 9:
        raise ValueError("sequence_match supports 1-9 steps")
    mask = F.lit(0)
    for i, cond in enumerate(steps):
        mask = mask + F.when(F.expr(cond), F.lit(1 << i)).otherwise(F.lit(0))
    per_key = (
        df.select(F.col(key_col), F.col(ts_col), F.col(tiebreak_col), mask.alias("m"))
        .groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(ts_col), F.col(tiebreak_col), F.col("m")))
            ).alias("evs")
        )
    )
    # greedy pointer: acc = #steps matched so far; event advances it when the
    # bit for step acc+1 (bit index acc) is set
    progressed = F.aggregate(
        F.transform(F.col("evs"), lambda s: s.getField("m")),
        F.lit(0),
        # bit test via pow (shiftleft's shift amount can't be a Column);
        # exact for the ≤9-bit masks allowed here
        lambda acc, m: F.when(
            (acc < n)
            & (m.bitwiseAND(F.pow(F.lit(2.0), acc.cast("double")).cast("int")) != 0),
            acc + 1,
        ).otherwise(acc),
    )
    return per_key.select(
        F.col(key_col),
        (progressed == n).cast("int").alias("matched"),
    )


def gap_fill(
    df: DataFrame,
    step_minutes: int = 60,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """ClickHouse ``ORDER BY ... WITH FILL STEP`` analog: dense time grid per
    key with zero-filled gaps.

    Buckets events to ``step_minutes`` boundaries and aggregates, then LEFT
    joins that onto the full (key × bucket) grid spanning the table's
    min..max bucket.  The grid is generated with ``sequence()`` + ``explode``
    from a single broadcast 1-row min/max aggregate — no driver collect, no
    per-key range scan.  Grid size = |keys| × (range/step), independent of
    raw row count, so the fill side stays tiny even at 100 TB of events.
    """
    step_s = step_minutes * 60
    # floor (not cast, which truncates toward zero) so pre-1970 negative
    # epochs land on the correct lower bucket boundary, matching ClickHouse
    # toStartOfInterval / WITH FILL
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_s).cast("long") * step_s
    )
    agg = (
        df.select(F.col(key_col), bucket.alias("bucket"), F.col("value"))
        .groupBy(key_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    bounds = df.select(bucket.alias("b")).agg(
        F.min("b").alias("lo"), F.max("b").alias("hi")
    )
    grid = (
        df.select(key_col)
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr(f"interval {step_s} seconds"))
            ).alias("bucket"),
        )
    )
    return grid.join(agg, [key_col, "bucket"], "left").select(
        F.col(key_col),
        F.col("bucket"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
    )


def gap_fill_interpolated(
    df: DataFrame,
    step_minutes: int = 60,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """ClickHouse ``WITH FILL ... INTERPOLATE`` analog: the dense grid from
    :func:`gap_fill`, with the metric LINEARLY INTERPOLATED across empty
    buckets (instead of zero-filled) — time-weighted between the nearest
    non-empty buckets; leading/trailing gaps carry the nearest real value.

    Two window passes over the GRID (|keys|×|buckets| rows — independent of
    raw event count): last/first non-NULL value and its bucket time in each
    direction, then the weighted blend.  O(1) frame state per row.

    The blend is integer-exact: values are 2-decimal (cents are exact longs)
    and bucket times are whole seconds, so ``round(pv + (nv-pv)·frac, 4)``
    is computed as ``(cents·Δt arithmetic) DIV`` on longs — double-float
    blending lands on .xxxx5 boundaries where Spark (exact-binary HALF_UP)
    and other engines (scaled std::round) disagree on the last digit.
    """
    from pyspark.sql import Window

    filled = gap_fill(df, step_minutes, key_col, ts_col)
    real = F.when(F.col("n_events") > 0, F.col("sum_value"))
    real_ts = F.when(F.col("n_events") > 0, F.col("bucket").cast("long"))
    back = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    g = (
        filled.withColumn("__pv", F.last(real, ignorenulls=True).over(back))
        .withColumn("__pt", F.last(real_ts, ignorenulls=True).over(back))
        .withColumn("__nv", F.first(real, ignorenulls=True).over(fwd))
        .withColumn("__nt", F.first(real_ts, ignorenulls=True).over(fwd))
        .withColumn("__ca", F.round(F.col("__pv") * 100).cast("long"))
        .withColumn("__cb", F.round(F.col("__nv") * 100).cast("long"))
        .withColumn("__du", F.col("bucket").cast("long") - F.col("__pt"))
        .withColumn("__dk", F.col("__nt") - F.col("__pt"))
    )
    interp = (
        F.when(F.col("n_events") > 0, F.round(F.col("sum_value"), 4))
        .when(
            F.col("__pv").isNotNull()
            & F.col("__nv").isNotNull()
            & (F.col("__dk") > 0),
            # cents·Δt blend via truncating long DIV — the exact twin of the
            # oracle's // at all magnitudes.  For non-negative values this is
            # round-half-up; for NEGATIVE values both engines truncate toward
            # zero identically (cross-engine agreement holds), but the last
            # digit rounds half-toward-zero rather than half-up there.
            F.expr(
                "CAST(((__ca * __dk + (__cb - __ca) * __du) * 200 + __dk) "
                "DIV (2 * __dk) AS DOUBLE) / 10000.0"
            ),
        )
        .otherwise(F.round(F.coalesce(F.col("__pv"), F.col("__nv")), 4))
    )
    return g.select(
        key_col, "bucket", "n_events", interp.alias("sum_value_interp")
    )


def forward_fill(
    df: DataFrame,
    value_col: str = "value",
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Forward-fill NULLs with the last non-NULL value per key in time order
    (time-series imputation; ClickHouse users reach for
    ``any(x) OVER (... ROWS UNBOUNDED PRECEDING)``-style hacks for this).

    ``F.last(ignorenulls=True)`` over an unbounded-preceding running frame —
    one shuffle + one in-partition sort, no self-join, no per-row lookback
    scan.  Frame state is a single value, so the window is O(1) memory per
    partition regardless of history length.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        f"{value_col}_filled", F.last(F.col(value_col), ignorenulls=True).over(w)
    )


def window_funnel(
    df: DataFrame,
    window_seconds: int,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    mode: str | list[str] | None = None,
) -> DataFrame:
    """ClickHouse ``windowFunnel(window[, mode])(ts, cond1, cond2, …)``
    analog: per key, the maximum number of CONSECUTIVE funnel steps
    completed by any event chain whose events (a) occur in strict
    ``(ts, tiebreak)`` order and (b) all fall within ``window_seconds``
    of the chain's FIRST event.

    Level semantics match ClickHouse's default mode: level ≥ 1 iff any
    event satisfies step 1; level ≥ k iff some step-1 event starts a chain
    reaching step k inside its window.  Greedy earliest-advance from each
    start is optimal for deadline-bounded subsequence existence (the
    deadline is fixed by the start event, so taking every step at its
    earliest opportunity dominates), which is what makes the result
    equal to the SQL EXISTS-chain oracle.

    ``mode`` accepts ClickHouse's strict variants (singly or combined):

    * ``strict_order`` — any in-window event that is NOT the next expected
      step interrupts the chain (A→B→D→C stops at D with level 2)
    * ``strict_dedup`` — an in-window repeat of an ALREADY-matched
      condition interrupts the chain
    * ``strict_increase`` — matched events must have strictly increasing
      timestamps (equal-timestamp candidates are skipped, not fatal)

    Scale shape: one shuffle keyed by ``key_col`` (same bound as
    sequence_match above and as ClickHouse's own windowFunnel, which also
    materializes each key's events); the per-start greedy scan is a
    built-in ``transform``+``aggregate`` over the sorted struct array —
    O(per-key-events²) worst case, all inside codegen, no UDF.
    """
    modes = {mode} if isinstance(mode, str) else set(mode or [])
    unknown = modes - {"strict_order", "strict_dedup", "strict_increase"}
    if unknown:
        raise ValueError(f"unknown windowFunnel mode(s): {sorted(unknown)}")
    strict_order = "strict_order" in modes
    strict_dedup = "strict_dedup" in modes
    strict_increase = "strict_increase" in modes
    n = len(steps)
    if not 1 <= n <= 9:
        raise ValueError("window_funnel supports 1-9 steps")
    mask = F.lit(0)
    for i, cond in enumerate(steps):
        mask = mask + F.when(F.expr(cond), F.lit(1 << i)).otherwise(F.lit(0))
    per_key = (
        df.select(
            F.col(key_col),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),  # exact int64 µs
            F.col(tiebreak_col).alias("tb"),
            mask.alias("m"),
        )
        .groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("t"), F.col("tb"), F.col("m")))
            ).alias("evs")
        )
    )

    def bit(level_col):
        # bit test for a Column-valued bit index (shiftleft needs a literal);
        # exact for the ≤9-bit masks allowed here
        return F.pow(F.lit(2.0), level_col.cast("double")).cast("int")

    evs = F.col("evs")

    # for each start position i whose event satisfies step 1, greedily
    # advance through the tail while inside [t_i, t_i + window].  State
    # carries (lvl, deadline, frozen, last-matched-t) so the strict modes
    # can interrupt (fz) or gate on timestamp monotonicity (lt).
    def fold_step(acc, ev):
        in_window = ev.getField("t") <= acc.getField("dl")
        can_advance = (
            (acc.getField("fz") == 0)
            & (acc.getField("lvl") < n)
            & in_window
            & (ev.getField("m").bitwiseAND(bit(acc.getField("lvl"))) != 0)
        )
        if strict_increase:
            can_advance = can_advance & (ev.getField("t") > acc.getField("lt"))
        advanced = F.struct(
            (acc.getField("lvl") + 1).alias("lvl"),
            acc.getField("dl").alias("dl"),
            acc.getField("fz").alias("fz"),
            ev.getField("t").alias("lt"),
        )
        frozen = F.struct(
            acc.getField("lvl").alias("lvl"),
            acc.getField("dl").alias("dl"),
            F.lit(1).cast("int").alias("fz"),
            acc.getField("lt").alias("lt"),
        )
        out = F.when(can_advance, advanced)
        if strict_order:
            # any other in-window event interrupts (unless the funnel is
            # already complete) — strict_increase skips, so an
            # equal-timestamp next-step event is NOT an interruption there
            interrupts = in_window & (acc.getField("lvl") < n)
            if strict_increase:
                interrupts = interrupts & ~(
                    (ev.getField("m").bitwiseAND(bit(acc.getField("lvl"))) != 0)
                    & (ev.getField("t") <= acc.getField("lt"))
                )
            out = out.when(interrupts, frozen)
        if strict_dedup:
            # in-window repeat of an already-matched condition interrupts;
            # matched steps are 0..lvl-1 = mask (2^lvl − 1)
            matched_mask = (bit(acc.getField("lvl")) - F.lit(1)).cast("int")
            out = out.when(
                in_window
                & (acc.getField("lvl") < n)
                & (ev.getField("m").bitwiseAND(matched_mask) != 0),
                frozen,
            )
        return out.otherwise(acc)

    start_levels = F.transform(
        evs,
        lambda s, i: F.when(
            s.getField("m").bitwiseAND(F.lit(1)) != 0,
            F.aggregate(
                F.slice(evs, i + F.lit(2), F.size(evs)),
                F.struct(
                    F.lit(1).cast("int").alias("lvl"),
                    (s.getField("t") + F.lit(int(window_seconds) * 1_000_000)).alias("dl"),
                    F.lit(0).cast("int").alias("fz"),
                    s.getField("t").alias("lt"),
                ),
                fold_step,
            ).getField("lvl"),
        ).otherwise(F.lit(0)),
    )
    return per_key.select(
        F.col(key_col),
        F.coalesce(F.array_max(start_levels), F.lit(0)).alias("level"),
    )


def retention_flags(
    df: DataFrame,
    conds: list[str],
    key_col: str = "user_id",
) -> DataFrame:
    """ClickHouse ``retention(cond1, cond2, …)`` aggregate analog: per key,
    ``r0 = 1`` iff any event satisfies cond1, and ``r_i = 1`` iff BOTH
    cond1 and cond_i were satisfied by some event (ClickHouse gates every
    later flag on the first condition — the "did the signup cohort come
    back" shape; retention_cohorts above is the full matrix version).

    One groupBy; each condition is a max-of-indicator aggregate that
    combines map-side, so the shuffle carries len(conds) ints per key.
    """
    if not conds:
        raise ValueError("retention_flags needs at least one condition")
    aggs = [
        F.max(F.when(F.expr(c), F.lit(1)).otherwise(F.lit(0))).alias(f"__c{i}")
        for i, c in enumerate(conds)
    ]
    g = df.groupBy(key_col).agg(*aggs)
    out = [F.col("__c0").alias("r0")] + [
        (F.col("__c0") * F.col(f"__c{i}")).alias(f"r{i}")
        for i in range(1, len(conds))
    ]
    return g.select(F.col(key_col), *out)


def sequence_count(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """ClickHouse ``sequenceCount('(?1).*(?2)…')`` analog: per key, how many
    NON-OVERLAPPING completions of the step chain occur in timestamp order
    (greedy left-to-right — each completed chain releases the pointer to
    start matching the next one, the ClickHouse counting rule).

    Same machinery as sequence_match above: per-event step bitmask, one
    shuffle keyed by ``key_col``, a built-in ``aggregate`` scan over the
    (ts, tiebreak)-sorted struct array carrying (progress, count) state.
    """
    n = len(steps)
    if not 1 <= n <= 9:
        raise ValueError("sequence_count supports 1-9 steps")
    mask = F.lit(0)
    for i, cond in enumerate(steps):
        mask = mask + F.when(F.expr(cond), F.lit(1 << i)).otherwise(F.lit(0))
    per_key = (
        df.select(F.col(key_col), F.col(ts_col), F.col(tiebreak_col), mask.alias("m"))
        .groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(ts_col), F.col(tiebreak_col), F.col("m")))
            ).alias("evs")
        )
    )
    state = F.aggregate(
        F.transform(F.col("evs"), lambda s: s.getField("m")),
        F.struct(
            F.lit(0).cast("int").alias("prog"), F.lit(0).cast("long").alias("cnt")
        ),
        lambda acc, m: F.when(
            m.bitwiseAND(
                F.pow(F.lit(2.0), acc.getField("prog").cast("double")).cast("int")
            )
            != 0,
            F.when(
                acc.getField("prog") == n - 1,
                F.struct(
                    F.lit(0).cast("int").alias("prog"),
                    (acc.getField("cnt") + 1).alias("cnt"),
                ),
            ).otherwise(
                F.struct(
                    (acc.getField("prog") + 1).alias("prog"),
                    acc.getField("cnt").alias("cnt"),
                )
            ),
        ).otherwise(acc),
    )
    return per_key.select(F.col(key_col), state.getField("cnt").alias("n_matches"))


def ewma_final(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    halflife_seconds: float = 3600.0,
) -> DataFrame:
    """Per key, the time-decay weighted average of ``value_col`` — each
    observation weighted by ``2^(−Δt/halflife)`` where Δt is its age
    relative to the key's NEWEST event.  The recency-weighted activity
    score (user engagement, error rates, feature freshness).

    NOTE: this is the *normalized decay mean*, NOT ClickHouse's
    ``exponentialMovingAverage``, which is the recursive interpolated EMA
    (``new = prev·2^(−Δt/hl) + x·(1−2^(−Δt/hl))``) — the two diverge for
    finite, non-uniformly-spaced series.  For ClickHouse-matching values
    use :func:`ema_recursive` below.

    The recursive EWMA fold has a closed form over explicit timestamps:
    ``Σ xᵢ·2^(−(t_max−tᵢ)/hl) / Σ 2^(−(t_max−tᵢ)/hl)`` — so instead of a
    sorted per-key fold this is ONE aggregation pass computing max(t),
    the weighted sum, and the weight sum together (decay is computed
    against max(t) via a second pass over the same shuffled group — a
    per-key max join would be a second shuffle; here the two aggregates
    share one).  Exact int64-µs age arithmetic; fully SQL-expressible.
    """
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    grouped = df.groupBy(key_col).agg(
        F.max(t).alias("__tmax"),
        F.collect_list(F.struct(t.alias("t"), F.col(value_col).alias("x"))).alias(
            "__evs"
        ),
    )
    hl_us = float(halflife_seconds) * 1_000_000.0
    w = lambda e: F.pow(F.lit(2.0), -(F.col("__tmax") - e.getField("t")) / F.lit(hl_us))
    num = F.aggregate(
        F.col("__evs"), F.lit(0.0), lambda acc, e: acc + w(e) * e.getField("x")
    )
    den = F.aggregate(F.col("__evs"), F.lit(0.0), lambda acc, e: acc + w(e))
    return grouped.select(
        F.col(key_col),
        F.size("__evs").cast("long").alias("n_events"),
        (num / den).alias("ewma"),
    )


def ema_recursive(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    halflife_seconds: float = 3600.0,
) -> DataFrame:
    """ClickHouse ``exponentialMovingAverage(halflife)(value, time)``:
    the RECURSIVE interpolated EMA over each key's time-ordered events —
    ``emaᵢ = emaᵢ₋₁·a + xᵢ·(1−a)`` with ``a = 2^(−(tᵢ−tᵢ₋₁)/halflife)``.
    Unlike :func:`ewma_final` (normalized decay mean) this matches the
    ClickHouse fold for real epoch timestamps: ClickHouse seeds its state
    at ``(value=0, t=0)``, and for epoch-scale t₁ ≫ halflife the first
    step's decay ``2^(−t₁/hl)`` underflows to 0, so its post-first-event
    state is exactly ``x₁`` — the same as seeding the fold with the first
    element, which is what this does (and what the DuckDB oracle's
    ``list_reduce`` does natively).

    Shape: one groupBy shuffle, then array_sort + a codegen ``aggregate``
    fold per key — no Python, no window, state O(events per key) like any
    per-key sequence op (windowFunnel at events.py::window_funnel uses the
    same machinery).  Reference parity: ClickHouse
    exponentialMovingAverage; the reference tool exposes raw CH SQL
    (server/server.js:444-470).
    """
    hl_us = float(halflife_seconds) * 1_000_000.0
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    grouped = df.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(t.alias("t"), F.col(value_col).cast("double").alias("x"))
            )
        ).alias("__evs")
    )

    def step(acc, e):
        a = F.pow(
            F.lit(2.0), -(e.getField("t") - acc.getField("t")) / F.lit(hl_us)
        )
        return F.struct(
            e.getField("t").alias("t"),
            (acc.getField("x") * a + e.getField("x") * (F.lit(1.0) - a)).alias(
                "x"
            ),
        )

    # seed with the first (earliest) event, fold the rest — mirrors
    # DuckDB list_reduce, whose accumulator IS the first list element
    ema = F.aggregate(
        F.slice(F.col("__evs"), 2, F.greatest(F.size("__evs") - 1, F.lit(0))),
        F.element_at("__evs", 1),
        step,
        lambda acc: acc.getField("x"),
    )
    return grouped.select(
        F.col(key_col),
        F.size("__evs").cast("long").alias("n_events"),
        ema.alias("ema"),
    )


def max_intersections(
    df: DataFrame,
    start_col: str,
    end_col: str,
    key_col: str | None = None,
) -> DataFrame:
    """ClickHouse ``maxIntersections(start, end)`` (+``...Position``): the
    maximum number of simultaneously-open intervals, per key — peak
    concurrency (sessions online at once, overlapping bookings).

    Sweep-line as pure DataFrame ops: each interval explodes to a
    ``(t, +1)`` open and ``(t, −1)`` close event, a running sum ordered by
    ``(t, delta)`` counts the open set (close sorts before open at equal
    t — half-open ``[start, end)`` semantics, matching ClickHouse), and
    the max of the running sum is the answer.  One shuffle keyed by
    ``key_col``; the window is per-key.  With ``key_col=None`` a constant
    key is used — the global sweep is a total order by definition (same
    story as any global maxIntersections), so keep keys for 100 TB use.
    Also returns ``peak_at``: the earliest sweep position reaching the
    max (maxIntersectionsPosition).
    """
    from pyspark.sql.window import Window

    key = F.col(key_col) if key_col else F.lit(0).alias("__k")
    kname = key_col or "__k"
    ev = df.select(
        key.alias(kname) if not key_col else F.col(key_col),
        F.explode(
            F.array(
                F.struct(F.col(start_col).alias("t"), F.lit(1).alias("d")),
                F.struct(F.col(end_col).alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("e"),
    ).select(kname, F.col("e.t").alias("t"), F.col("e.d").alias("d"))
    w = (
        Window.partitionBy(kname)
        .orderBy(F.col("t").asc(), F.col("d").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = ev.withColumn("__open", F.sum("d").over(w))
    return run.groupBy(kname).agg(
        F.max("__open").cast("long").alias("max_intersections"),
        F.min_by(F.col("t"), F.struct((-F.col("__open")).alias("n"), F.col("t"))).alias(
            "peak_at"
        ),
    )


def props_variant_stats(
    df: DataFrame,
    props_col: str = "props",
    group_col: str = "event_type",
    path: str = "$.k",
) -> DataFrame:
    """Semi-structured JSON via Spark 4's VARIANT type — the analog of
    ClickHouse's native ``JSON`` column type (both store a parsed binary
    encoding so repeated path access skips re-parsing, unlike the
    stringly ``get_json_object`` path in :func:`with_props`).

    Parses once (``try_parse_json`` — malformed rows become NULL instead
    of failing the job), extracts ``path`` as a long, and aggregates per
    group: row count, rows where the path exists, and the path sum.
    Pure codegen; one shuffle on the group key.
    """
    v = F.try_parse_json(F.col(props_col))
    k = F.try_variant_get(v, path, "long")
    return (
        df.select(F.col(group_col), k.alias("__k"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("__k").alias("n_with_path"),
            F.sum("__k").alias("sum_path"),
        )
    )


def sparkbar(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    buckets: int = 8,
) -> DataFrame:
    """ClickHouse ``sparkbar(buckets)(x, y)``: per group, a unicode bar
    string (▁..█) of the y-sums over ``buckets`` equal-width x ranges —
    the CH dashboard one-liner histogram.

    Definition (engine-reproducible, mirrored verbatim by the DuckDB
    oracle): bucket = floor((x − min x) / (max x − min x) · buckets)
    clamped to [0, buckets−1]; bar level = ceil(8 · bucket_sum /
    max_bucket_sum) in 1..8 → U+2580+level; a bucket with no rows or a
    non-positive sum renders a space.  ClickHouse's own glyph choice at
    bucket boundaries differs in edge cases (no CH server in the sandbox
    to pin it) — this is the documented uniq-style stance: same shape,
    engine-specific rendering details.

    Shape: one groupBy for the per-group x range (tiny, broadcast), one
    groupBy for (group, bucket) sums with map-side combine, one re-group
    collecting ≤``buckets`` rows per group.  No windows; shuffles carry
    aggregate-reduced rows only.
    """
    rng = df.groupBy(*group_cols).agg(
        F.min(x_col).alias("__xmin"), F.max(x_col).alias("__xmax")
    )
    with_b = df.join(F.broadcast(rng), group_cols).withColumn(
        "__b",
        F.least(
            F.greatest(
                F.floor(
                    (F.col(x_col) - F.col("__xmin"))
                    / F.when(
                        F.col("__xmax") > F.col("__xmin"),
                        F.col("__xmax") - F.col("__xmin"),
                    ).otherwise(F.lit(1))
                    * buckets
                ),
                F.lit(0),
            ),
            F.lit(buckets - 1),
        ).cast("int"),
    )
    sums = with_b.groupBy(*group_cols, "__b").agg(
        F.sum(y_col).alias("__s")
    )
    per_group = sums.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__b"), F.col("__s")))
        ).alias("__m"),
        F.max("__s").alias("__smax"),
    )
    # round the ratio to 9 decimals before ceil: per-engine sum-order ulp
    # noise must not flip a bucket that sits exactly on a level boundary
    level = lambda s: F.least(  # noqa: E731
        F.ceil(F.round(F.lit(8.0) * s / F.col("__smax"), 9)).cast("int"),
        F.lit(8),
    )
    # Spark's char()/chr() wrap at 256 — index a literal glyph array
    glyphs = F.array(*[F.lit(g) for g in "▁▂▃▄▅▆▇█"])
    glyph = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.lit(buckets - 1)),
            lambda b: F.when(
                F.coalesce(F.try_element_at("__m", b.cast("int")), F.lit(0.0))
                > 0,
                F.element_at(
                    glyphs, level(F.try_element_at("__m", b.cast("int")))
                ),
            ).otherwise(F.lit(" ")),
        ),
    )
    return per_group.select(*group_cols, glyph.alias("bar"))


def lttb(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    y_col: str,
    n_out: int = 100,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets time-series downsampling
    (Steinarsson 2013) — the ClickHouse ``largestTriangleThreeBuckets(n)
    (x, y)`` aggregate: keep the first and last point of each series and,
    for each of ``n_out − 2`` even buckets of the interior, the point
    forming the LARGEST triangle with the previously selected point and
    the next bucket's centroid — the classic dashboard downsampler that
    preserves visual extremes where uniform sampling flattens them.

    Deterministic spec (both the operator and its DuckDB oracle implement
    exactly this): points sort by x (unique x per series required);
    interior index i ∈ [1, m−2] lands in bucket ⌊(i−1)·B/(m−2)⌋ with
    B = n_out − 2; the "next anchor" is the next bucket's POSITIONAL
    MIDDLE element (index ⌊len/2⌋ of the bucket) — an exact order-based
    stand-in for the classic centroid, pinned because cross-engine
    floating-point summation order would make averaged centroids differ
    in the last ulp and flip area ties; bucket B−1's anchor is the last
    point; ties on triangle area break to the SMALLEST x (CH picks its
    scan-order first — engine-specific, so the tiebreak is pinned here
    instead).  Areas are then products/differences of exact table values:
    bit-identical on every IEEE-754 engine.  Series with m ≤ n_out pass
    through unchanged (sel_idx = position).

    Scale shape: ONE shuffle on the series keys into ``applyInPandas``
    (Arrow-batched, numpy argmax inside — the selection is inherently
    sequential per series, same memory contract as the ClickHouse
    aggregate which also materializes each group's points).  Output:
    keys + (sel_idx, x, y), n_out rows per series.
    """
    import numpy as np
    import pandas as pd

    out_fields = [df.schema[k] for k in keys] + [
        T.StructField("sel_idx", T.IntegerType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
    ]
    schema = T.StructType(out_fields)

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf["__x"].to_numpy(dtype=float)
        ys = pdf["__y"].to_numpy(dtype=float)
        order = np.argsort(xs, kind="stable")
        xs, ys = xs[order], ys[order]
        m = len(xs)
        if m <= n_out:
            sel = np.arange(m)
        else:
            B = n_out - 2
            sel_list = [0]
            interior = np.arange(1, m - 1)
            bucket = (interior - 1) * B // (m - 2)
            for j in range(B):
                cand = interior[bucket == j]
                if j < B - 1:
                    nxt = interior[bucket == j + 1]
                    mid = nxt[len(nxt) // 2]
                    ax, ay = xs[mid], ys[mid]
                else:
                    ax, ay = xs[m - 1], ys[m - 1]
                px, py = xs[sel_list[-1]], ys[sel_list[-1]]
                area = np.abs(
                    (px - ax) * (ys[cand] - py) - (px - xs[cand]) * (ay - py)
                )
                # largest area; ties -> smallest x (stable argmax)
                sel_list.append(cand[int(np.argmax(area))])
            sel_list.append(m - 1)
            sel = np.asarray(sel_list)
        out = {k: [pdf[k].iloc[0]] * len(sel) for k in keys}
        out["sel_idx"] = np.arange(len(sel), dtype="int32")
        out["x"] = xs[sel]
        out["y"] = ys[sel]
        return pd.DataFrame(out)

    prepped = df.select(
        *keys,
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )
    return prepped.groupBy(*keys).applyInPandas(_one, schema)
