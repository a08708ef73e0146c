"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (SURVEY.md §7.1 slice) on sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (omitted only for
genuinely non-SQL-expressible ops: LSH/SimHash candidates, ANN, streaming —
those get rows-only checks).

Column names are aligned pairwise (Spark ``.alias`` ↔ SQL ``AS``); double
aggregates are rounded on both sides so IEEE summation-order differences
cannot flip the value hash.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_flatfile_tool_spark.operators import (
    dedup,
    events,
    mergetree,
    multimodal,
    relational,
    retrieval,
    sampling,
    similarity,
    text,
)
from clickhouse_flatfile_tool_spark.streaming import stream_ops


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from clickhouse_flatfile_tool_spark.sources.files import read_parquet

    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def _join_arr(col, cast: str = "array<string>"):
    """Serialize a flat array column to a ','-joined string — the driver's
    pandas canonicalizer (sort_values over raw cells) cannot hash list
    cells, so every registry output column must be scalar.  Plain join, not
    JSON: no escaping, so the string is byte-equal to DuckDB's
    ``array_to_string(col, ',')`` regardless of element content."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(c.cast(cast), ",")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's /preview capability on real data — scan →
    join → project → deterministic page (SURVEY §7.1)."""
    d = "/root/testdata/sf0.001"
    li = _t(spark, d, "lineitem")
    o = _t(spark, d, "orders")
    joined = relational.chain_join([li, o], ["l_orderkey = o_orderkey"])
    page = relational.page_slice(
        joined.select("l_orderkey", "l_linenumber", "o_orderdate", "l_extendedprice"),
        order_by=["l_orderkey", "l_linenumber"],
        page=1,
        page_size=100,
    )
    return page


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_preview_page(spark, d):
    li = _t(spark, d, "lineitem")
    return relational.page_slice(
        relational.project(li, ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]),
        order_by=["l_orderkey", "l_linenumber"],
        page=3,
        page_size=100,
    )


def q_count(spark, d):
    return relational.total_count(_t(spark, d, "lineitem"))


def q_filter_project(spark, d):
    li = _t(spark, d, "lineitem")
    out = relational.row_filter(
        relational.project(
            li, ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_returnflag"]
        ),
        "l_quantity > 45 AND l_returnflag = 'R'",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
    )


def q_join_chain(spark, d):
    li, o, c, n, r = (_t(spark, d, t) for t in ["lineitem", "orders", "customer", "nation", "region"])
    joined = relational.chain_join(
        [li, o, relational.broadcast_dim(c), relational.broadcast_dim(n), relational.broadcast_dim(r)],
        [
            "l_orderkey = o_orderkey",
            "o_custkey = c_custkey",
            "c_nationkey = n_nationkey",
            "n_regionkey = r_regionkey",
        ],
    )
    return joined.select(
        "l_orderkey", "l_linenumber", "o_orderdate", "c_custkey", "n_name", "r_name",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
    )


def q_groupby_agg(spark, d):
    li = _t(spark, d, "lineitem")
    out = relational.aggregate(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            ("sum", "l_quantity", "sum_qty"),
            ("sum", "l_extendedprice", "sum_base_price"),
            ("avg", "l_discount", "avg_disc"),
            ("count", "l_orderkey", "count_order"),
        ],
    )
    return out.select(
        "l_returnflag", "l_linestatus",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("sum_base_price", 2).alias("sum_base_price"),
        F.round("avg_disc", 4).alias("avg_disc"),
        "count_order",
    )


def q_topk(spark, d):
    o = _t(spark, d, "orders")
    return relational.top_k(
        o.select("o_orderkey", "o_totalprice"), 10, F.desc("o_totalprice"), F.asc("o_orderkey")
    )


def q_distinct(spark, d):
    return relational.distinct_values(_t(spark, d, "customer"), ["c_mktsegment"])


def q_setops(spark, d):
    c = _t(spark, d, "customer")
    rich = c.filter("c_acctbal > 5000").select("c_custkey")
    building = c.filter("c_mktsegment = 'BUILDING'").select("c_custkey")
    return relational.intersect(rich, building)


def q_union_names(spark, d):
    c = _t(spark, d, "customer").select(F.col("c_name").alias("name"))
    s = _t(spark, d, "supplier").select(F.col("s_name").alias("name"))
    return relational.union_all(c, s).distinct()


def q_window_rank(spark, d):
    o = _t(spark, d, "orders")
    out = relational.ranked(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        "row_number",
        "rk",
    )
    return out.filter("rk <= 3")


def q_window_lag(spark, d):
    o = _t(spark, d, "orders")
    out = relational.with_lag_lead(
        o.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        ["o_custkey"],
        [F.asc("o_orderdate"), F.asc("o_orderkey")],
        "o_totalprice",
    )
    return out.select(
        "o_custkey", "o_orderkey",
        F.round("o_totalprice_lag", 2).alias("prev_price"),
        F.round("o_totalprice_lead", 2).alias("next_price"),
    )


def q_rollup(spark, d):
    li = _t(spark, d, "lineitem")
    out = relational.aggregate(
        li,
        ["l_returnflag", "l_linestatus"],
        [("sum", "l_quantity", "sum_qty"), ("count", "l_orderkey", "n")],
        mode="rollup",
    )
    return out.select("l_returnflag", "l_linestatus", F.round("sum_qty", 2).alias("sum_qty"), "n")


def q_cube(spark, d):
    o = _t(spark, d, "orders")
    out = relational.aggregate(
        o,
        ["o_orderstatus", "o_orderpriority"],
        [("count", "o_orderkey", "n"), ("sum", "o_totalprice", "sum_price")],
        mode="cube",
    )
    return out.select("o_orderstatus", "o_orderpriority", "n", F.round("sum_price", 2).alias("sum_price"))


def q_scalar_funcs(spark, d):
    o = _t(spark, d, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.col("o_orderstatus")).alias("status_u"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.round(F.col("o_totalprice") * 0.1, 4).alias("tithe"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("status_prio"),
    )


def q_array_explode(spark, d):
    """Array surface (§2.6): explode an embedding into elements, re-aggregate
    per vector — the lateral-view shape every array pipeline uses."""
    emb = _t(spark, d, "embeddings")
    ex = emb.select("vec_id", F.explode("embedding").alias("v"))
    return ex.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("dim"),
        F.round(F.max(F.col("v").cast("double")), 6).alias("max_v"),
        F.round(F.sum(F.col("v").cast("double")), 4).alias("sum_v"),
    )


def q_unpivot(spark, d):
    """Wide→long unpivot (melt) — DataFrame.unpivot, checked against the
    UNION ALL oracle formulation."""
    li = _t(spark, d, "lineitem")
    w = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("qty"),
        F.col("l_extendedprice").cast("double").alias("price"),
        F.col("l_discount").cast("double").alias("disc"),
    )
    return w.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["qty", "price", "disc"],
        variableColumnName="metric",
        valueColumnName="val",
    )


def q_pivot(spark, d):
    ev = _t(spark, d, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("user_id")] + [
        F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in types
    ]
    return out.select(*cols)


def q_json_props(spark, d):
    ev = _t(spark, d, "events")
    return events.with_props(ev).select(
        "event_id", "event_type", F.col("props_s.k").alias("k")
    )


def q_tumbling_window(spark, d):
    return events.tumbling_window_agg(
        _t(spark, d, "events"), "10 minutes", group_extra=["event_type"]
    )


def q_sliding_window(spark, d):
    return events.sliding_window_agg(_t(spark, d, "events"), "10 minutes", "5 minutes")


def q_session_window(spark, d):
    return events.session_window_agg(_t(spark, d, "events"), "30 minutes")


def q_event_funnel(spark, d):
    return events.event_type_funnel(_t(spark, d, "events"))


def q_sequence_funnel(spark, d):
    """sequenceMatch analog with OVERLAPPING step conditions (an event with
    value > 50 satisfies both steps) — exercises the greedy per-step pointer,
    which single-symbol labeling gets wrong."""
    return events.sequence_match(
        _t(spark, d, "events"), ["value > 10", "value > 50"], key_col="user_id"
    )


def q_gap_fill(spark, d):
    return events.gap_fill(_t(spark, d, "events"), step_minutes=60)


def q_gap_fill_interp(spark, d):
    """WITH FILL INTERPOLATE analog: linear interpolation across the empty
    buckets of the dense grid."""
    return events.gap_fill_interpolated(_t(spark, d, "events"), step_minutes=60)


def q_forward_fill(spark, d):
    """Forward-fill with deterministically-injected NULLs (fixture has none):
    every 7th event id loses its value, then last-non-NULL-per-user imputes."""
    ev = _t(spark, d, "events").withColumn(
        "value",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value")),
    )
    return events.forward_fill(ev).select("event_id", "user_id", "value_filled")


def q_reservoir_k(spark, d):
    """Deterministic per-language reservoir: exactly 20 uniformly-chosen docs
    per lang, identical across runs/engines (rank by md5(doc_id))."""
    return sampling.deterministic_reservoir(
        _t(spark, d, "documents"), ["lang"], "doc_id", 20
    ).select("doc_id", "lang", "source")


def q_wav_meta(spark, d):
    """REAL multimodal decode round-trip: build a valid RIFF/WAVE payload per
    document (sample rate/channels derived from doc_id, sample count from
    n_chars), then parse the bytes back with the struct-level WAV decoder.
    The oracle recomputes the expected metadata directly from the table
    columns — so any header-layout or parsing bug breaks the hash match."""
    docs = _t(spark, d, "documents").select("doc_id", "n_chars")
    wav = multimodal.synthesize_wav_payloads(docs)
    return multimodal.decode_wav_meta(wav, keep=["doc_id"])


def q_png_meta(spark, d):
    """REAL multimodal decode round-trip #2: build a structurally valid PNG
    per document (signature + IHDR with correct CRC-32 + IEND; width from
    n_chars, height/color type from doc_id), then parse AND CRC-verify the
    bytes back.  The oracle recomputes the metadata from table columns —
    any header-layout, endianness, or CRC bug breaks the hash."""
    docs = _t(spark, d, "documents").select("doc_id", "n_chars")
    png = multimodal.synthesize_png_payloads(docs)
    return multimodal.decode_png_meta(png, keep=["doc_id"])


def q_bmp_meta(spark, d):
    """REAL multimodal decode round-trip #4: structurally valid
    headers-only BMP per document (BITMAPFILEHEADER + BITMAPINFOHEADER,
    little-endian — the byte-order counterpart to PNG's big-endian
    layout), parsed back by the hand-written decoder with magic/header
    validation.  Oracle recomputes metadata from table columns."""
    docs = _t(spark, d, "documents").select("doc_id", "n_chars")
    bmp = multimodal.synthesize_bmp_payloads(docs)
    out = multimodal.decode_bmp_meta(bmp, keep=["doc_id"])
    return out.select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("bits_per_pixel").cast("long").alias("bits_per_pixel"),
    )


def q_jpeg_meta(spark, d):
    """REAL multimodal decode round-trip #3: build a structurally valid
    JPEG marker stream per document (SOI, APP0/JFIF, COM, SOF0/SOF2 frame
    header with per-component entries, EOI; width from n_chars,
    height/components/progressive from doc_id), then walk the markers and
    parse the frame header back.  The oracle recomputes the metadata from
    table columns — any marker-layout, segment-length, or endianness bug
    breaks the hash."""
    docs = _t(spark, d, "documents").select("doc_id", "n_chars")
    jpg = multimodal.synthesize_jpeg_payloads(docs)
    return multimodal.decode_jpeg_meta(jpg, keep=["doc_id"])


def q_pack_sequences(spark, d):
    return text.pack_sequences(_t(spark, d, "documents"), budget_tokens=2048)


def q_pack_bestfit(spark, d):
    """Best-fit-decreasing whole-document packing (text.py::pack_best_fit,
    Ding et al. 2024): fixed-budget bins, no document split, md5-bucketed
    applyInPandas.  No oracle — BFD placement is a sequential algorithm
    SQL can't express; correctness is pytest-proven (budget/assignment/
    bound invariants + golden, tests/test_text.py::test_pack_best_fit_*);
    the driver records the rows-only run."""
    out = text.pack_best_fit(
        _t(spark, d, "documents"), budget_tokens=1024, bucket_chars=1
    )
    return out.orderBy("bucket", "bin_id", "doc_id")


def q_strip_html(spark, d):
    """HTML→text extraction (text.py::strip_html, ClickHouse
    extractTextFromHTML analog): each document wrapped in markup with a
    script block, comment, entities and tags, then stripped back to
    clean text — the Common-Crawl cleanup stage.  Oracle: the identical
    RE2-compatible regexp/replace chain in DuckDB (global flags)."""
    docs = _t(spark, d, "documents")
    html = F.concat(
        F.lit('<div class="doc"><p>'),
        F.col("text"),
        F.lit("</p><script>var x = 1;</script><!-- c -->"
              "&amp;<style>p{}</style>&nbsp;end</div>"),
    )
    return docs.select(
        "doc_id", text.strip_html(html).alias("clean")
    ).orderBy("doc_id")


def q_dataset_mixture(spark, d):
    """Weighted dataset mixture: keep 100% of 'en' docs, 25% of 'de', 10% of
    everything else — membership a pure function of doc_id (md5), so the
    sample is identical across runs/engines."""
    out = sampling.hash_stratified_sample(
        _t(spark, d, "documents"),
        "lang",
        "doc_id",
        {"en": 1.0, "de": 0.25},
        default_fraction=0.10,
    )
    return out.select("doc_id", "lang", "source")


def q_clickhouse_aggs(spark, d):
    """ClickHouse aggregate-function analogs in one pass (the dialect
    translator maps the names: argMax→max_by, argMin→min_by,
    groupArray→collect_list, countIf/sumIf/avgIf→FILTER-style conditionals).
    max_by/min_by determinism: the fixture has a unique extreme price per
    group (verified); ties would need a composite order key.
    """
    li = _t(spark, d, "lineitem")
    high = F.col("l_quantity") > 25
    return li.groupBy("l_returnflag").agg(
        F.max_by("l_suppkey", "l_extendedprice").alias("top_supp"),
        F.min_by("l_suppkey", "l_extendedprice").alias("bottom_supp"),
        F.count(F.when(high, 1)).alias("n_high"),
        F.round(F.sum(F.when(high, F.col("l_extendedprice"))), 2).alias("sum_high"),
        F.round(F.avg(F.when(high, F.col("l_discount"))), 6).alias("avg_disc_high"),
        F.concat_ws(",", F.slice(F.array_sort(F.collect_set("l_linestatus")), 1, 3)).alias(
            "modes_sample"
        ),
    )


def q_quantiles_multi(spark, d):
    """ClickHouse ``quantilesExact(0.25,0.5,0.75)(x)`` analog: one exact
    multi-quantile aggregate per group (single sort, all probs share it)."""
    li = _t(spark, d, "lineitem")
    qs = F.percentile("l_quantity", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return li.groupBy("l_linestatus").agg(
        F.round(qs[0], 4).alias("q25"),
        F.round(qs[1], 4).alias("q50"),
        F.round(qs[2], 4).alias("q75"),
    )


def q_topk_freq(spark, d):
    """ClickHouse ``topK(3)(x)`` analog, exact form: the 3 most frequent
    o_orderpriority values per o_orderstatus — groupBy count (map-side partial)
    then a tiny window over (group, count).  The sketchless exact version is
    oracle-checkable; at 100 TB the same shape works because the window input
    is |groups|×|distinct values|, not raw rows."""
    o = _t(spark, d, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    return relational.top_k_per_group(
        counts, ["o_orderstatus"], [F.desc("n"), F.asc("o_orderpriority")], 3
    ).select("o_orderstatus", "o_orderpriority", "n")


def q_left_join(spark, d):
    c = _t(spark, d, "customer")
    o = _t(spark, d, "orders")
    j = relational.chain_join([c, o], ["c_custkey = o_custkey"], how="left")
    return j.groupBy("c_custkey", "c_name").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("sum_spend"),
    )


def q_semi_join(spark, d):
    c = _t(spark, d, "customer")
    o = _t(spark, d, "orders").filter("o_orderstatus = 'F'")
    j = relational.chain_join([c, o], ["c_custkey = o_custkey"], how="left_semi")
    return j.select("c_custkey", "c_name", "c_mktsegment")


def q_anti_join(spark, d):
    c = _t(spark, d, "customer")
    o = _t(spark, d, "orders")
    j = relational.chain_join([c, o], ["c_custkey = o_custkey"], how="left_anti")
    return j.select("c_custkey", "c_name")


def q_except(spark, d):
    c = _t(spark, d, "customer").select("c_custkey")
    o = _t(spark, d, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return relational.except_(c, o)


def q_asof_join(spark, d):
    ev = _t(spark, d, "events")
    purchases = ev.filter("event_type = 'purchase'").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter("event_type = 'click'")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    out = relational.asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["click_value"],
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.col("ts_asof").alias("click_ts"),
        F.round("click_value_asof", 2).alias("click_value"),
    )


def q_range_join(spark, d):
    p = _t(spark, d, "part")
    bands = spark.createDataFrame(
        [(0.0, 930.0, "low"), (930.0, 960.0, "mid"), (960.0, 1e9, "high")],
        "lo double, hi double, band string",
    )
    j = relational.range_join(
        p.select("p_partkey", "p_retailprice"), bands,
        ["p_retailprice >= lo", "p_retailprice < hi"],
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.sum("p_retailprice"), 2).alias("sum_price"),
    )


def q_full_join(spark, d):
    c = _t(spark, d, "customer").groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s = _t(spark, d, "supplier").groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    j = relational.chain_join([c, s], ["c_nationkey = s_nationkey"], how="full")
    return j.select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"), "n_cust", "n_supp"
    )


def q_event_range_join(spark, d):
    """Big-big interval join via bucketing: clicks within the 10 minutes
    before each purchase by the same user — equi-join on (user, time bucket),
    exact range re-verified after."""
    ev = _t(spark, d, "events")
    # microseconds, not unix_timestamp (which truncates to seconds and
    # flips boundary pairs for sub-second timestamps — caught at sf0.1)
    purch = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ep")
    )
    clicks = (
        ev.filter("event_type = 'click'")
        .select("user_id", F.unix_micros("ts").alias("lo"))
        .withColumn("hi", F.col("lo") + 600 * 1_000_000)
    )
    j = relational.bucketed_range_join(
        purch, clicks, "ep", "lo", "hi", 600.0 * 1_000_000, equi_cols=["user_id"]
    )
    return j.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_recent_clicks"))


def q_tpch_q3(spark, d):
    """TPC-H Q3 shape (shipping priority), native DataFrame: customer dim
    broadcasts, the only shuffle is lineitem⋈orders, then a top-10 by
    revenue — adapted to the fixture (o_orderpriority stands in for the
    missing o_shippriority; deterministic l_orderkey tiebreak added to
    the top-k ordering on BOTH sides)."""
    li, o, c = (_t(spark, d, t) for t in ["lineitem", "orders", "customer"])
    c = c.filter(F.col("c_mktsegment") == "BUILDING")
    o = o.filter(F.col("o_orderdate") < F.lit("1997-06-01"))
    li = li.filter(F.col("l_shipdate") > F.lit("1997-06-01"))
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue")
    )
    return agg.orderBy(
        F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey")
    ).limit(10)


def q_tpch_q8(spark, d):
    """TPC-H Q8 shape (national market share), native DataFrame: the
    nation table joins TWICE (customer's region gate, supplier's share
    nation), all dims broadcast, one lineitem⋈orders shuffle — adapted to
    the fixture vocabulary (region ASIA, part type PROMO, share nation
    NATION_5)."""
    li, o, c, s, p, r = (
        _t(spark, d, t)
        for t in ["lineitem", "orders", "customer", "supplier", "part", "region"]
    )
    n1 = _t(spark, d, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, d, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31"))
    )
    p = p.filter(F.col("p_type") == "PROMO")
    r = r.filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = joined.select(
        F.year("o_orderdate").alias("o_year"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        "nation",
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q_tpch_q4(spark, d):
    """TPC-H Q4 shape (order priority checking), native DataFrame: the
    EXISTS turns into a LEFT SEMI join with a compound (equi + non-equi)
    condition — Spark plans the equi part as the shuffle key and applies
    the date inequality as a join-time filter, so no correlated per-row
    subquery survives.  Adapted to the fixture (no l_commitdate /
    l_receiptdate: "late line" = shipped after the order date)."""
    o = _t(spark, d, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = _t(spark, d, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q7(spark, d):
    """TPC-H Q7 shape (volume shipping), native DataFrame: nation joins
    TWICE (supplier side, customer side), both broadcast along with
    supplier/customer; the bidirectional nation-pair predicate applies
    after the broadcasts so the only shuffle is lineitem⋈orders."""
    li, o, c, s = (
        _t(spark, d, t) for t in ["lineitem", "orders", "customer", "supplier"]
    )
    n1 = _t(spark, d, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, d, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31"))
    )
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q_tpch_q10(spark, d):
    """TPC-H Q10 shape (returned-item reporting), native DataFrame:
    customer/nation broadcast, lineitem pre-filtered to returns before
    the orders shuffle, top-20 by lost revenue with a deterministic
    custkey tiebreak on both engines."""
    li = _t(spark, d, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, d, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    c = _t(spark, d, "customer")
    n = _t(spark, d, "nation")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_tpch_q12(spark, d):
    """TPC-H Q12 shape (shipping modes / priority), native DataFrame: one
    lineitem⋈orders shuffle, then conditional aggregation — the CASE
    pair becomes two map-side partial sums.  Adapted to the fixture
    (l_returnflag stands in for the missing l_shipmode; ship-year window
    replaces the receiptdate window)."""
    li = _t(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = _t(spark, d, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


def q_tpch_q13(spark, d):
    """TPC-H Q13 shape (customer order distribution), native DataFrame:
    LEFT OUTER join with a join-time filter on the right side (so
    customers with zero qualifying orders count as c_count = 0), then a
    two-level aggregation — both shuffles are on low-cardinality keys
    after the first agg.  Adapted to the fixture (o_orderpriority filter
    stands in for the missing o_comment NOT LIKE)."""
    c = _t(spark, d, "customer").select("c_custkey")
    o = _t(spark, d, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q_tpch_q15(spark, d):
    """TPC-H Q15 shape (top supplier), native DataFrame: the revenue view
    aggregates once, its scalar max broadcasts via a 1-row cross join
    (NOT a global window — that would serialize onto one partition), and
    the supplier dim broadcasts into the equality filter."""
    li = _t(spark, d, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = _t(spark, d, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q_tpch_q17(spark, d):
    """TPC-H Q17 shape (small-quantity-order revenue), native DataFrame:
    the correlated per-part AVG subquery becomes ONE grouped aggregate
    broadcast back into the fact filter — the decorrelation Catalyst
    would have to discover is written directly.  Quantities are
    integer-valued doubles, so the 0.2·avg threshold is bit-deterministic
    across engines (exact integer sums < 2^53)."""
    li = _t(spark, d, "lineitem")
    p = _t(spark, d, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(part_avg), F.col("l_partkey") == F.col("pa_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q22(spark, d):
    """TPC-H Q22 shape (global sales opportunity), native DataFrame: the
    uncorrelated AVG threshold broadcasts as a 1-row cross join; the
    NOT EXISTS becomes a LEFT ANTI join against the filtered orders side.
    Adapted to the fixture (c_nationkey stands in for the missing phone
    country code; "no orders since 1999" replaces "no orders ever", which
    is vacuous on the dense fixture)."""
    c = _t(spark, d, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o = (
        _t(spark, d, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01"))
        .select("o_custkey")
    )
    rich_idle = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        rich_idle.groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def q_tpch_q2(spark, d):
    """TPC-H Q2 shape (minimum-cost supplier), native DataFrame.  The
    fixture has no partsupp, so the part↔supplier relationship derives
    from lineitem: supply cost per (part, supplier) = min unit price ever
    shipped (l_extendedprice / l_quantity).  The correlated MIN subquery
    decorrelates into ONE per-part grouped min broadcast back into an
    equality filter — same rewrite as Q17's avg.  Unit prices divide two
    exact integer-valued doubles, so min/equality are bit-deterministic
    across engines."""
    li = _t(spark, d, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    p = _t(spark, d, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey", "p_brand")
    s = _t(spark, d, "supplier")
    n = _t(spark, d, "nation")
    r = _t(spark, d, "region").filter(F.col("r_name") == "ASIA")
    # suppliers in the target region, nation name carried through
    sup = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = ps.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).join(
        F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
    )
    min_cost = offers.groupBy(F.col("p_partkey").alias("mc_key")).agg(
        F.min("supplycost").alias("min_cost")
    )
    return (
        offers.join(F.broadcast(min_cost), F.col("p_partkey") == F.col("mc_key"))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.round("supplycost", 4).alias("supplycost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(100)
    )


def q_tpch_q9(spark, d):
    """TPC-H Q9 shape (product-type profit), native DataFrame: part /
    supplier / nation broadcast, one lineitem⋈orders shuffle, profit
    grouped by (supplier nation, order year).  The fixture has no
    ps_supplycost, so cost proxies as 10% of p_retailprice per unit
    (documented divergence — the SHAPE, a LIKE-filtered 6-table profit
    rollup, is what parity targets)."""
    li, o, s, n = (
        _t(spark, d, t) for t in ["lineitem", "orders", "supplier", "nation"]
    )
    p = _t(spark, d, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        F.col("p_retailprice") * 0.1 * F.col("l_quantity")
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 4).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


def q_tpch_q11(spark, d):
    """TPC-H Q11 shape (important stock identification), native DataFrame:
    per-part "inventory value" for one nation's suppliers, kept only where
    it exceeds 2x the MEAN per-part value (TPC-H's fixed fraction scales
    as 1/SF for exactly this reason — the mean-relative threshold is
    scale-invariant, verified non-empty at sf0.01 AND sf0.1).  The global
    scalar broadcasts via a 1-row cross join (Q15's pattern — never a
    global window); the fixture's value proxy is sum(l_extendedprice)
    over each supplier's shipments standing in for
    ps_supplycost * ps_availqty."""
    li = _t(spark, d, "lineitem")
    s = _t(spark, d, "supplier")
    n = _t(spark, d, "nation").filter(F.col("n_name") == "NATION_3")
    nat_li = li.join(
        F.broadcast(
            s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey")
        ),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    per_part = nat_li.groupBy("l_partkey").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("part_value")
    )
    total = per_part.agg(
        (F.avg("part_value") * 2.0).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


def q_tpch_q16(spark, d):
    """TPC-H Q16 shape (parts/supplier relationship), native DataFrame:
    distinct (part, supplier) pairs from lineitem stand in for partsupp;
    the NOT IN (complaint suppliers) becomes a LEFT ANTI join against the
    negative-balance suppliers (the fixture's complaint stand-in); then a
    COUNT(DISTINCT supplier) per (brand, type, size).  Anti join
    broadcasts (complaint side is tiny); the only shuffle is the distinct
    + grouped count."""
    li = _t(spark, d, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = _t(spark, d, "part").filter(F.col("p_brand") != "Brand#1").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    complained = _t(spark, d, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(complained), F.col("l_suppkey") == F.col("s_suppkey"),
                "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"),
            F.asc("p_size"),
        )
    )


def q_tpch_q20(spark, d):
    """TPC-H Q20 shape (potential part promotion), native DataFrame: the
    doubly-nested IN subqueries decorrelate into two grouped aggregates
    over the same (part, supplier) cell — 1996 shipments vs lifetime
    shipments — compared cell-wise, then a LEFT SEMI join lifts qualifying
    suppliers (no partsupp: "availqty > ½·shipped" becomes "1996 shipped >
    ½·lifetime shipped", the concentrated-recent-supply analog).  Part
    name LIKE gate and nation gate broadcast."""
    li = _t(spark, d, "lineitem")
    p = _t(spark, d, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    cells = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("l_quantity").alias("qty_total"),
            F.sum(
                F.when(F.year("l_shipdate") == 1996, F.col("l_quantity"))
                .otherwise(0.0)
            ).alias("qty_1996"),
        )
        .filter(F.col("qty_1996") > 0.5 * F.col("qty_total"))
        .select("l_suppkey")
    )
    s = _t(spark, d, "supplier")
    n = _t(spark, d, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(cells, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name", "s_suppkey")
    )


def q_tpch_q21(spark, d):
    """TPC-H Q21 shape (suppliers who kept orders waiting), native
    DataFrame.  The EXISTS/NOT-EXISTS double self-join decorrelates into
    ONE per-order aggregate — distinct suppliers, distinct LATE suppliers
    (late = shipped >60 days after order date; the fixture has no
    l_receiptdate), and the identity of the late supplier when unique —
    then filters to multi-supplier orders where exactly one supplier was
    late.  One lineitem⋈orders shuffle + one per-order agg replaces the
    classic triple lineitem scan; supplier/nation broadcast at the end.
    Counts only → hash-deterministic."""
    o = _t(spark, d, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = _t(spark, d, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")
    per_order = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    s = _t(spark, d, "supplier")
    n = _t(spark, d, "nation").filter(F.col("n_name") == "NATION_1")
    blamed = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    return (
        per_order.join(
            F.broadcast(blamed), F.col("late_supp") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


def q_tpch_q5(spark, d):
    """TPC-H Q5 shape, native DataFrame: 6-table star join where every
    dimension (customer/supplier/nation/region) broadcasts, so the only
    shuffle is lineitem⋈orders — the plan that must survive at 100 TB."""
    li, o, c, s, n, r = (
        _t(spark, d, t)
        for t in ["lineitem", "orders", "customer", "supplier", "nation", "region"]
    )
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    r = r.filter(F.col("r_name") == "ASIA")
    joined = relational.chain_join(
        [
            li,
            o,
            relational.broadcast_dim(c),
            relational.broadcast_dim(s),
            relational.broadcast_dim(n),
            relational.broadcast_dim(r),
        ],
        [
            "l_orderkey = o_orderkey",
            "o_custkey = c_custkey",
            "l_suppkey = s_suppkey AND c_nationkey = s_nationkey",
            "s_nationkey = n_nationkey",
            "n_regionkey = r_regionkey",
        ],
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )


def q_tpch_q1(spark, d):
    """TPC-H Q1 (pricing summary report), native DataFrame: the canonical
    scan-heavy aggregation — one pushed-down filter, one groupBy on two
    low-cardinality keys, 8 aggregates computed in a single shuffle with
    map-side partial agg.  Monetary math in integer cents (prices/rates
    have 2 decimals), so every sum is an exact BIGINT on both engines; the
    averages use integer-exact half-up rounding ((2x+y) DIV 2y, the
    events.py convention — round(S/100.0/n, 4) lands on .xxxx5 boundaries
    whenever n divides the scale and the engines' float round-half-up then
    disagrees on the last digit).  BIGINT headroom: the 1e-6-unit charge
    sum is exact to ~2.5e8 rows per (returnflag, linestatus) group
    (~sf100); past that, cast the two money sums to DECIMAL(38,0) on the
    Spark side — DuckDB already sums in HUGEINT."""
    li = _t(spark, d, "lineitem")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    tax_c = F.round(F.col("l_tax") * 100).cast("long")
    disc_price_u = price_c * (F.lit(100).cast("long") - disc_c)      # 1e-4 units
    charge_u = disc_price_u * (F.lit(100).cast("long") + tax_c)      # 1e-6 units
    raw = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_c).alias("__sq"),
            F.sum(price_c).alias("__sp"),
            F.sum(disc_price_u).alias("__sd"),
            F.sum(charge_u).alias("__sc"),
            F.sum(disc_c).alias("__sdisc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    # half-up to 4 decimals of S/(100*n): (S*100*2 + n) DIV 2n, all positive
    avg4 = "CAST((%s * 200 + count_order) DIV (count_order * 2) AS DOUBLE) / 10000.0"
    return raw.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("__sq") / 100.0, 2).alias("sum_qty"),
        F.round(F.col("__sp") / 100.0, 2).alias("sum_base_price"),
        F.round(F.col("__sd") / 10000.0, 2).alias("sum_disc_price"),
        F.round(F.col("__sc") / 1000000.0, 2).alias("sum_charge"),
        F.expr(avg4 % "__sq").alias("avg_qty"),
        F.expr(avg4 % "__sp").alias("avg_price"),
        F.expr(avg4 % "__sdisc").alias("avg_disc"),
        "count_order",
    )


def q_tpch_q19(spark, d):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): the
    classic OR-of-conjunctions query — part is broadcast, the brand/size/
    quantity disjunction is evaluated post-join while the shared
    l_quantity range-envelope predicate pushes into the lineitem scan.
    (The synthetic schema has no p_container/l_shipmode; the disjunction
    uses brand × size × quantity, same plan shape.)"""
    li, p = (_t(spark, d, t) for t in ["lineitem", "part"])
    j = li.where(F.col("l_quantity").between(1, 30)).join(
        relational.broadcast_dim(p), F.col("l_partkey") == F.col("p_partkey")
    )
    b, s, q = F.col("p_brand"), F.col("p_size"), F.col("l_quantity")
    cond = (
        ((b == "Brand#3") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#14") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#25") & s.between(1, 35) & q.between(20, 30))
    )
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    return j.where(cond).agg(
        F.round(F.sum(price_c * (F.lit(100).cast("long") - disc_c)) / 10000.0, 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_salted_join(spark, d):
    """Skew-resistant salted equi-join, checked against the plain-join
    oracle: identical results, but each hot key spreads over 8 reducers."""
    li = _t(spark, d, "lineitem")
    p = _t(spark, d, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    j = relational.salted_join(li, p, key="l_partkey", salt=8)
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def q_grouping_sets(spark, d):
    li = _t(spark, d, "lineitem")
    out = relational.grouping_sets(
        li,
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        ["l_returnflag", "l_linestatus"],
        [("sum", "l_quantity", "sum_qty"), ("count", "l_orderkey", "n")],
    )
    return out.select(
        "l_returnflag", "l_linestatus", F.round("sum_qty", 2).alias("sum_qty"), "n"
    )


def q_ntile(spark, d):
    o = _t(spark, d, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
    keys = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    out = relational.ranked(o, ["o_orderpriority"], keys, "ntile:4", "quartile")
    out = relational.ranked(out, ["o_orderpriority"], keys, "dense_rank", "drk")
    return out.select("o_orderkey", "o_orderpriority", "quartile", "drk")


def q_running_sum(spark, d):
    o = _t(spark, d, "orders").select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    out = relational.running_agg(
        o, ["o_custkey"], [F.asc("o_orderdate"), F.asc("o_orderkey")],
        "o_totalprice", "sum", "running_spend",
    )
    return out.select(
        "o_custkey", "o_orderkey", F.round("running_spend", 2).alias("running_spend")
    )


def q_agg_stats(spark, d):
    """Exact percentile is kept HERE because the query is oracle-checked:
    Spark approx_percentile (GK sketch) and DuckDB approx_quantile (t-digest)
    are different algorithms and cannot hash-match.  The scale path is
    relational.approx_quantiles (mergeable GK sketch, bounded memory),
    asserted against exact within rank tolerance in tests/test_relational.py.

    Split aggregates (r12, guide §2): countDistinct in the same aggregate
    as percentile/stddev forces the two-phase-distinct Expand through the
    percentile value buffers (2× the rows carried past exact-percentile
    state); two aggregates joined on the 3-value group key are
    result-identical and keep each pass lean."""
    li = _t(spark, d, "lineitem")
    distinct_agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    stat_agg = li.groupBy("l_returnflag").agg(
        F.round(F.stddev("l_quantity"), 4).alias("sd_qty"),
        F.round(F.percentile("l_quantity", 0.5), 2).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", 0.9), 2).alias("p90_price"),
    )
    return distinct_agg.join(stat_agg, "l_returnflag").select(
        "l_returnflag", "n_supp", "sd_qty", "median_qty", "p90_price"
    )


def q_dedup_exact(spark, d):
    return dedup.exact_dedup_canonical(_t(spark, d, "documents"))


def q_text_metrics(spark, d):
    docs = _t(spark, d, "documents")
    m = text.with_text_metrics(docs)
    return m.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.round("avg_word_len", 6).alias("avg_word_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
    )


def q_corpus_stats(spark, d):
    # totals pinned to BIGINT (DuckDB sum() -> HUGEINT otherwise); averages
    # derived from the BIGINT totals with integer-exact half-up rounding
    # ((2x+y) DIV 2y, the events.py convention) so no float round can land
    # on a .xxxx5 boundary where engines disagree — this was the only
    # oracled hash failure of rounds 1-2 (DECIMAL in r2, unpinned in r1)
    avg4 = "CAST((%s * 20000 + n_docs) DIV (n_docs * 2) AS DOUBLE) / 10000.0"
    return text.corpus_stats(_t(spark, d, "documents"), ["lang"]).select(
        "lang",
        "n_docs",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.expr(avg4 % "CAST(total_tokens AS BIGINT)").alias("avg_tokens"),
        F.col("total_chars").cast("long").alias("total_chars"),
        F.expr(avg4 % "CAST(total_chars AS BIGINT)").alias("avg_chars"),
        F.col("min_chars").cast("long").alias("min_chars"),
        F.col("max_chars").cast("long").alias("max_chars"),
    )


def q_redact_pii(spark, d):
    """PII scrubbing over text with a synthetic email injected per doc so
    the redaction demonstrably fires (fixture text has no real PII)."""
    docs = _t(spark, d, "documents").withColumn(
        "text",
        F.concat(
            F.lit("contact "),
            F.col("doc_id").cast("string"),
            F.lit("@example.com: "),
            F.col("text"),
        ),
    )
    out = text.redact_pii(docs)
    return out.select(
        "doc_id", "n_pii", F.substring("redacted", 1, 60).alias("red_prefix")
    )


def q_chunk_text(spark, d):
    docs = _t(spark, d, "documents").select("doc_id", "text")
    return text.chunk_text(docs, chunk_size=200, overlap=50, id_cols=["doc_id"])


def q_hash_split(spark, d):
    docs = _t(spark, d, "documents").select("doc_id")
    out = sampling.hash_split(docs, "doc_id")
    return out.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))


def q_quality_score(spark, d):
    return text.with_quality_score(_t(spark, d, "documents")).select("doc_id", "quality_score")


def q_lang_id(spark, d):
    return text.with_lang_id(_t(spark, d, "documents")).select("doc_id", "lang", "lang_pred")


def q_ngram_jaccard(spark, d):
    return dedup.ngram_jaccard_pairs(_t(spark, d, "documents"), threshold=0.5)


def q_minhash_candidates(spark, d):
    return dedup.minhash_lsh_candidates(_t(spark, d, "documents"))


def q_minhash_dedup(spark, d):
    out = dedup.minhash_dedup(_t(spark, d, "documents"), jaccard_threshold=0.8)
    return out.select("doc_id", "lang", "source", "n_chars")


def q_simhash_candidates(spark, d):
    return dedup.simhash_candidates(_t(spark, d, "documents"))


def q_cosine_topk(spark, d):
    emb = _t(spark, d, "embeddings")
    queries_df = emb.filter("vec_id < 10")
    return similarity.cosine_topk(queries_df, emb, k=5)


def q_ann_topk(spark, d):
    emb = _t(spark, d, "embeddings")
    queries_df = emb.filter("vec_id < 10")
    return similarity.ann_cosine_topk(queries_df, emb, k=5)


def q_ann_ivf_topk(spark, d):
    emb = _t(spark, d, "embeddings")
    queries_df = emb.filter("vec_id < 10")
    return similarity.ivf_cosine_topk(queries_df, emb, k=5)


def q_embedding_norm(spark, d):
    emb = _t(spark, d, "embeddings")
    return similarity.with_norm(emb).select("vec_id", F.round("norm", 6).alias("norm"))


def q_embedding_dedup(spark, d):
    emb = _t(spark, d, "embeddings")
    return similarity.cosine_dedup_pairs(emb, cos_threshold=0.4)


def q_embedding_clusters(spark, d):
    """Per-cluster size + cosine-to-centroid cohesion report — the
    cluster-balanced-sampling diagnostic (similarity.py::cluster_report).

    Oracle-upgraded r10 (the ann_recall_suite stance): the seeded
    driver-side k-means is deterministic per input set, so the full
    8-row report is MEASURED and pinned per lineitem cardinality (NULL
    sentinel at unpinned scales).  Stability pre-checked: two back-to-back
    runs byte-identical at all three scales, and the rounded cohesion's
    distance to its 6-dp rounding boundary is ≥2.9e-10 (sf0.01 worst
    case) — ~10⁵× the float-accumulation-order noise scale.  Re-measure +
    re-pin on any quantizer/report change; that forced review is the
    point."""
    emb = _t(spark, d, "embeddings")
    return similarity.cluster_report(emb, n_lists=8)


def q_semdedup_valid(spark, d):
    """SemDeDup validity frame (the sketch_error pattern — hash-proven
    companion for the rows-only semantic_dedup entry): over the corpus
    plus ONE planted exact duplicate of vec 0 under a larger id,

      * n_input — replayed outright by the oracle (count+1);
      * n_survivors — pinned per lineitem cardinality (seeded driver
        k-means, the ann_recall_suite stance; NULL sentinel otherwise);
      * planted_pair_survivors ≡ 1 — identical vectors always share a
        cluster, so exactly one of {0, 90000000} survives (min-id wins);
      * within_cluster_viol ≡ 0 — semantic_dedup's guarantee: re-running
        semantic_dedup_pairs over the SURVIVORS with the same centroids
        (rebuilt with the identical ivf_build_centroids call
        semantic_dedup makes internally: same input/seed/sample) finds
        zero remaining within-cluster pairs ≥ threshold, because any
        surviving pair (a<b) would have dropped b.

    All four quantities in one row via broadcast 1-row aggregates."""
    emb = _t(spark, d, "embeddings")
    planted = emb.unionByName(
        emb.filter(F.col("vec_id") == 0).select(
            F.lit(90000000).cast("long").alias("vec_id"), "embedding", "label"
        )
    )
    surv = similarity.semantic_dedup(
        planted, cos_threshold=0.4, n_clusters=8
    ).localCheckpoint()
    cent = similarity.ivf_build_centroids(
        planted, n_lists=8, sample_size=10_000, seed=42
    )
    viol = similarity.semantic_dedup_pairs(
        surv, cos_threshold=0.4, n_clusters=8, centroids=cent
    )
    a = planted.agg(F.count(F.lit(1)).alias("n_input"))
    s = surv.agg(
        F.count(F.lit(1)).alias("n_survivors"),
        F.sum(
            F.when(F.col("vec_id").isin(0, 90000000), 1).otherwise(0)
        ).alias("planted_pair_survivors"),
    )
    v = viol.agg(F.count(F.lit(1)).alias("within_cluster_viol"))
    return a.join(F.broadcast(s)).join(F.broadcast(v))


def q_semantic_dedup(spark, d):
    """SemDeDup (Abbas et al. 2023): k-means clusters → within-cluster
    cosine pairs → greedy min-id survivor policy.  Rows-only (driver-side
    k-means is not SQL-expressible); pytest asserts planted-dup capture and
    the no-surviving-pair guarantee."""
    emb = _t(spark, d, "embeddings")
    out = similarity.semantic_dedup(emb, cos_threshold=0.9, n_clusters=8)
    return out.select("vec_id", "label")


def q_embedding_dedup_lsh(spark, d):
    emb = _t(spark, d, "embeddings")
    return similarity.embedding_dedup_candidates(emb, cos_threshold=0.4)


def q_gram_matrix(spark, d):
    """Distributed Gram matrix XᵀX over the embedding corpus in integer
    mode (components quantized floor(x·1000+0.5) → int64 products, exactly
    order-independent and engine-reproducible).  mapInPandas emits one d×d
    partial per Arrow batch; ONE d²-row groupBy sums them — the shuffle is
    O(partitions·d²), independent of corpus size.  Feeds pca_project."""
    emb = _t(spark, d, "embeddings")
    return similarity.gram_matrix_long(emb, scale=1000).select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        F.col("g").cast("long").alias("g"),
    )


def q_pca_project(spark, d):
    """PCA: distributed moments (Σx fold + Gram partials) → O(d³) eigh of
    the d×d covariance on the driver (d² floats collected, independent of
    n) → projection as literal-array zip_with/aggregate expressions (pure
    JVM codegen, no UDF).

    Oracle-upgraded r10 (VERDICT r9 #3, the sketch_error pattern): raw
    per-row projections are numpy-eigh-specific, so the hashed frame is
    the sign-canonical VERIFICATION summary instead — per component k,
    the exact integer sum of squares and sum of the quantized projections
    floor(pc·1000+0.5) over the whole corpus (order-independent BIGINT
    arithmetic; ssq/1e6/(n−1) ≈ the eigenvalue, so variance-explained is
    pinned implicitly), plus the driver-side orthonormality residual
    max|CᵀC−I| (identically 0 at 6 dp for a correct eigh).  pca_fit's
    sign canon (largest-|.| coordinate positive) makes the per-component
    quantities deterministic given the fixture's distinct eigenvalues;
    the oracle pins the measured integers per lineitem cardinality with
    a NULL sentinel at unpinned scales.  Tie distance pre-checked (the
    pagerank_docs discipline): the closest any pc·1000+0.5 sits to a
    floor boundary is 5.1e-6 (sf0.001) / 5.0e-4 (sf0.01) / 3.3e-5
    (sf0.1) — ~10⁷× the float-accumulation-order noise scale, and the
    per-scale ssq values are >4% apart so eigenvalues are comfortably
    non-degenerate.  Raw-projection properties
    (orthonormality, eigenvalue order, monotone reconstruction error)
    stay pytest-asserted in tests/test_similarity.py."""
    import numpy as np

    emb = _t(spark, d, "embeddings")
    mu, comps, _ = similarity.pca_fit(emb, k=4)
    out = similarity.pca_project(emb, mu, comps)
    orth = float(np.abs(comps @ comps.T - np.eye(len(comps))).max())
    pairs = out.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("k"),
                        F.floor(
                            F.element_at("pca", i + 1) * 1000 + F.lit(0.5)
                        )
                        .cast("long")
                        .alias("q"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("p")
    ).select("p.k", "p.q")
    return (
        pairs.groupBy("k")
        .agg(
            F.sum(F.col("q") * F.col("q")).alias("ssq_q"),
            F.sum("q").alias("sum_q"),
        )
        .select(
            "k",
            "ssq_q",
            "sum_q",
            F.round(F.lit(orth), 6).alias("orth_residual"),
        )
        .orderBy("k")
    )


def q_doc_fingerprint(spark, d):
    docs = _t(spark, d, "documents")
    return (
        docs.withColumn("fp", text.rolling_fingerprint("text"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_dups"))
        .select("doc_id", "n_dups")
    )


def q_pipeline_filter_dedup(spark, d):
    """Composite training-data pipeline: quality filter → exact dedup →
    multimodal join (the end-to-end shape the EXT operators exist for)."""
    docs = _t(spark, d, "documents")
    emb = _t(spark, d, "embeddings")
    good = text.with_quality_score(docs).filter(F.col("quality_score") >= 0.5)
    surv = (
        good.withColumn("__fp", text.fingerprint("text"))
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return relational.chain_join([surv, emb], ["doc_id = vec_id"]).select("doc_id", "label")


def q_gopher_rules(spark, d):
    """Gopher-style rules quality filter (Rae et al. 2021 table A1 analog):
    per-rule boolean gates + conjunction, cast to 0/1 ints for the
    cross-engine hash.  Pure codegen mapper — zero shuffle at any scale."""
    out = text.gopher_quality_rules(_t(spark, d, "documents"))
    return out.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("r_word_count").cast("int").alias("r_word_count"),
        F.col("r_mean_word_len").cast("int").alias("r_mean_word_len"),
        F.col("r_symbol_ratio").cast("int").alias("r_symbol_ratio"),
        F.col("r_alpha_ratio").cast("int").alias("r_alpha_ratio"),
        F.col("r_stopwords").cast("int").alias("r_stopwords"),
        F.col("gopher_pass").cast("int").alias("gopher_pass"),
    )


def q_boilerplate(spark, d):
    """C4-style repeated-span removal at n-gram granularity: per-doc count
    and ratio of trigrams occurring in >= 5 distinct documents.  Inverted
    index -> doc-frequency groupBy (map-side combine absorbs hot grams) ->
    join back -> per-doc agg."""
    out = dedup.boilerplate_ngrams(_t(spark, d, "documents"), min_docs=5)
    return out.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_boilerplate").cast("long").alias("n_boilerplate"),
        "boilerplate_ratio",
    )


def q_decontaminate(spark, d):
    """Benchmark decontamination (GPT-3/PaLM n-gram-collision procedure):
    every 20th doc stands in for the eval suite; training docs sharing any
    trigram with it are flagged.  Benchmark shingles broadcast — the 100 TB
    side is a map-only probe plus one per-doc groupBy."""
    docs = _t(spark, d, "documents")
    bench = docs.filter("doc_id % 20 = 0")
    train = docs.filter("doc_id % 20 != 0")
    out = dedup.decontaminate(train, bench)
    return out.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_overlap").cast("long").alias("n_overlap"),
        "overlap_ratio",
        F.col("contaminated").cast("int").alias("contaminated"),
    )


def q_bloom_decontaminate(spark, d):
    """decontaminate for benchmark sets beyond broadcast size: benchmark
    shingles → 128 KiB Bloom bitset (pure bit_or aggregation, broadcastable
    at ANY benchmark size) → map-side probe → exact verify join on the
    surviving candidates only (dedup.py::bloom_decontaminate).  False
    positives die in the verify step, so the ORACLE IS THE EXACT PATH's —
    the plan, not the answer, is what changes."""
    docs = _t(spark, d, "documents")
    bench = docs.filter("doc_id % 20 = 0")
    train = docs.filter("doc_id % 20 != 0")
    out = dedup.bloom_decontaminate(train, bench)
    return out.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_overlap").cast("long").alias("n_overlap"),
        "overlap_ratio",
        F.col("contaminated").cast("int").alias("contaminated"),
    )


def q_cms_estimate(spark, d):
    """Count-Min sketch word frequencies (relational.py::cms_table /
    cms_estimate): depth=4 × width=256 md5-bucketed count table — the
    engine-portable bucket function makes the whole sketch, estimates
    included, hash-checkable against DuckDB even in the approximate
    (overcounting) regime.  Mergeability is pytest-asserted."""
    docs = _t(spark, d, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    )
    sketch = relational.cms_table(words, "w", depth=4, hex_chars=2)
    qs = (
        _t(spark, d, "documents")
        .filter("doc_id < 5")
        .select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
        .distinct()
    )
    out = relational.cms_estimate(sketch, qs, "w", depth=4, hex_chars=2)
    return out.select("item", F.col("est").cast("long").alias("est"))


def q_bpe_merges(spark, d):
    """Distributed BPE vocabulary induction (Sennrich et al. 2016): one
    corpus pass builds the vocab-sized word-frequency table; each merge
    iteration runs on that small table only (text.py::bpe_train).

    Oracle-upgraded r10 (VERDICT r9 #3, the pagerank_docs pattern): the
    12 fixed merge iterations are unrolled as DuckDB CTEs; each word's
    symbol sequence rides as a per-symbol-delimiter-wrapped string whose
    replace() IS the greedy non-overlapping merge fold (see _bpe_oracle —
    the encoding's two failure modes and their fix are property-tested in
    test_bpe_merge_replace_equivalence).  The per-iteration winner is the
    (count desc, l, r) ORDER BY LIMIT 1, bytewise-identical tie-break in
    both engines on UTF-8.  Pre-checked: 12 merges all clear the cnt≥2
    early-break at both driver scales, so the oracle's unconditional
    unroll matches."""
    docs = _t(spark, d, "documents")
    return text.bpe_train(docs, num_merges=12)


def q_pipeline_curation(spark, d):
    """Round-3 capstone pipeline: Gopher rules gate → boilerplate-ratio
    filter → benchmark decontamination → per-language token budget, composed
    end-to-end exactly as a pretraining curation pass runs them.  Every
    stage is individually oracle-green; the composition is oracled too."""
    docs = _t(spark, d, "documents")
    bench = docs.filter("doc_id % 20 = 0")
    train = docs.filter("doc_id % 20 != 0")
    g = text.gopher_quality_rules(train).where("gopher_pass").select(
        "doc_id", "lang", "text"
    )
    bp_keep = (
        dedup.boilerplate_ngrams(train, min_docs=5)
        .where("boilerplate_ratio < 0.5")
        .select("doc_id")
    )
    dc_keep = dedup.decontaminate(train, bench).where("NOT contaminated").select(
        "doc_id"
    )
    kept = g.join(bp_keep, "doc_id").join(dc_keep, "doc_id")
    out = sampling.token_budget_trim(kept, token_budget=6000)
    return out.select("doc_id", "lang")


def q_multimodal_join(spark, d):
    docs = _t(spark, d, "documents")
    emb = _t(spark, d, "embeddings")
    joined = relational.chain_join([docs, emb], ["doc_id = vec_id"])
    return joined.select(
        "doc_id", "lang", "label", F.size("embedding").cast("long").alias("dim")
    )


def q_multimodal_features(spark, d):
    docs = _t(spark, d, "documents")
    with_payload = multimodal.attach_payload(docs.select("doc_id", "text", "lang", "source", "n_chars"))
    feats = multimodal.decode_features(with_payload)
    return feats.select("doc_id", "n_bytes", "checksum")


def q_multimodal_frames(spark, d):
    """Video frame-sampling plan: explode-then-decode shape with a
    data-derived duration so the frame count is oracle-checkable."""
    docs = _t(spark, d, "documents").select("doc_id", "n_chars")
    vids = multimodal.attach_payload(
        docs, media_type="video", duration_expr=F.col("n_chars") * 40
    )
    frames = multimodal.frame_sample_plan(vids, every_ms=1000)
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("frame_ts_ms").cast("long").alias("frame_ts_ms"),
    )


def q_sql_tpch(spark, d):
    """Full SQL surface over registered views — same text runs on DuckDB
    (TPC-H Q3 shape: filter + 3-way join + agg + top-k)."""
    for t in ["customer", "orders", "lineitem"]:
        _t(spark, d, t).createOrReplaceTempView(t)
    return relational.sql(spark, _TPCH_Q3)


_TPCH_Q3 = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 20
"""


def q_map_props(spark, d):
    """Map surface (§2.6): JSON → MapType → explode to (key, value) rows —
    map_keys/map_values/explode over a real fixture column."""
    ev = _t(spark, d, "events")
    m = ev.select(
        "event_id",
        F.from_json("props", "map<string,int>").alias("pm"),
    )
    ex = m.select("event_id", F.explode("pm").alias("prop_key", "prop_val"))
    return ex.select("event_id", "prop_key", F.col("prop_val").cast("long").alias("prop_val"))


def q_latest_per_key(spark, d):
    """Keep-latest-row-per-key (argmax dedup) — the standard CDC/log
    compaction shape: one window, one shuffle on the key."""
    ev = _t(spark, d, "events")
    out = relational.ranked(
        ev.select("user_id", "event_id", "ts", "event_type"),
        ["user_id"],
        [F.desc("ts"), F.desc("event_id")],
        "row_number",
        "rn",
    )
    return out.filter("rn = 1").select("user_id", "event_id", "event_type")


def q_hier_rollup(spark, d):
    """Day-level stats computed hierarchically (minute→hour→day re-agg, no
    raw rescan) — the oracle aggregates raw rows directly; results must be
    identical because sum/count/min/max compose exactly."""
    ev = _t(spark, d, "events")
    day = events.multi_resolution_rollup(ev, group_cols=["event_type"])["day"]
    return day.select(
        "bucket",
        "event_type",
        F.round("v_sum", 2).alias("sum_value"),
        F.col("v_cnt").alias("n_events"),
        F.round("v_min", 4).alias("min_value"),
        F.round("v_max", 4).alias("max_value"),
    )


def q_minhash_portable(spark, d):
    """MinHash-LSH with md5-hex minimums — engine-portable hashing, so the
    full shingle→signature→band→bucket-join pipeline hash-matches the DuckDB
    oracle (the xxhash64 fast path, minhash_candidates, stays rows-only)."""
    docs = _t(spark, d, "documents")
    return dedup.minhash_lsh_candidates_portable(docs)


def q_token_histogram(spark, d):
    """Corpus token-count histogram via width_bucket — the fixed-bucket
    shape whose shuffle is O(buckets), not O(rows)."""
    docs = _t(spark, d, "documents")
    m = docs.select(
        F.width_bucket(text.token_count("text"), F.lit(0), F.lit(500), F.lit(20)).alias(
            "bucket"
        )
    )
    return m.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_docs"))


def q_length_trim(spark, d):
    """Percentile-trimmed filter (drop the tails outside [p05, p95] of
    n_chars): the scalar-subquery pattern as a broadcast join of a 1-row
    aggregate — no second scan of the fact side, no driver round-trip.
    Exact percentile stays for oracle determinism (see q_agg_stats);
    relational.approx_quantiles is the sketch path at scale."""
    docs = _t(spark, d, "documents")
    bounds = docs.agg(
        F.percentile("n_chars", 0.05).alias("lo"),
        F.percentile("n_chars", 0.95).alias("hi"),
    )
    return (
        docs.join(F.broadcast(bounds))
        .where("n_chars >= lo AND n_chars <= hi")
        .select("doc_id", "lang", "n_chars")
    )


def q_topk_per_group(spark, d):
    """Per-group top-k (most active users per event type): one shuffle on
    the group key, row_number ≤ k."""
    ev = _t(spark, d, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    return relational.top_k_per_group(
        per_user, ["event_type"], [F.desc("n"), F.asc("user_id")], k=5
    )


def q_window_first_last(spark, d):
    """Analytic window frame surface: first/last/nth value over an explicit
    unbounded frame."""
    from pyspark.sql.window import Window

    ev = _t(spark, d, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


def q_connected_components(spark, d):
    """Connected components over the exact-Jaccard near-dup graph (iterative
    min-label propagation, lineage-truncated per round) — oracled by a
    DuckDB recursive CTE computing reachability minima."""
    docs = _t(spark, d, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    return dedup.connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("comp")
    )


def q_dedup_cc(spark, d):
    """Transitively-correct near-dup dedup: Jaccard pairs → connected
    components → keep the min-id doc per component (A~B, B~C drops B AND C
    even without an A~C pair — greedy pair-drop gets this wrong)."""
    docs = _t(spark, d, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    return dedup.cc_dedup(docs, pairs).select("doc_id", "lang", "source")


_PR_TAIL_A = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform "
    "victor whiskey xray yankee"
)
_PR_TAIL_B = (
    "zulu amber birch cedar dune ember fern grove haze iris jade kelp "
    "larch moss nectar onyx pearl quartz reef slate topaz umber vale "
    "willow zephyr"
)


def q_pagerank_docs(spark, d):
    """PageRank centrality over the exact-Jaccard near-dup graph — ranks
    the canonical exemplar per neighborhood (dedup.py::pagerank; fixed 10
    power iterations, lineage-truncated per round).  ORACLED since r9
    (VERDICT r8 #5): the fixture plants STAR structure — each %10==0 doc
    gets two long-tail variants (+50M/+60M, 25 disjoint tail words each);
    at threshold 0.7 hub↔variant pairs survive (J = N/(N+k)) while
    variant↔variant pairs (J = N/(N+2k)) do not, so hubs out-rank leaves
    and the oracle checks real dynamics, not the all-1.0 fixpoint the
    natural clone-clique graph yields.  Oracle: the 10 rounds UNROLLED as
    DuckDB CTEs over the identical pair replay; round-6 rank precision is
    safe — min distance of any unrounded rank from a rounding boundary is
    1.2e-7 at both gate scales (pre-checked) vs ~1e-15 cross-engine float
    noise."""
    docs = _t(spark, d, "documents").select("doc_id", "text")
    hubs = docs.filter(F.col("doc_id") % 10 == 0)
    va = hubs.select(
        (F.col("doc_id") + F.lit(50_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" " + _PR_TAIL_A)).alias("text"),
    )
    vb = hubs.select(
        (F.col("doc_id") + F.lit(60_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" " + _PR_TAIL_B)).alias("text"),
    )
    pairs = dedup.ngram_jaccard_pairs(
        docs.union(va).union(vb), threshold=0.7
    )
    return (
        dedup.pagerank(pairs)
        .select(F.col("node").alias("doc_id"), "rank")
        .orderBy("doc_id")
    )


def q_collapsing_final(spark, d):
    """CollapsingMergeTree FINAL semantics (ClickHouse upsert/CDC state):
    sign=±1 rows cancel per key; survivors keep their latest +1 state.  One
    hash aggregation — sum(sign) and max(conditional struct) in the same
    shuffle (operators/mergetree.py)."""
    ev = _t(spark, d, "events")
    src = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.round("value", 4).alias("value"),
        F.when(F.pmod("event_id", 4) == 0, F.lit(-1)).otherwise(F.lit(1)).alias("sign"),
    )
    return mergetree.collapsing_final(
        src, ["user_id"], "sign", version_cols=["ts", "event_id"], value_cols=["value"]
    )


def q_summing_final(spark, d):
    """SummingMergeTree FINAL: numeric state columns summed per key at read
    time — one hash agg, map-side partials (the third MergeTree family
    alongside Replacing/Collapsing).  Sum pinned to cents-exact BIGINT so
    the value hash is representation-stable."""
    ev = _t(spark, d, "events").select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    return mergetree.summing_final(ev, ["user_id", "event_type"], ["value_cents"])


def q_aggregating_final(spark, d):
    """AggregatingMergeTree FINAL (the fourth MergeTree family): partial
    (count,sum,min,max) states per (user,event_type) "part" merged to
    event_type at read time, then finalized (avg = sum/count) — the
    -State/-Merge combinator pattern, two hash aggs, cents-exact BIGINTs."""
    ev = _t(spark, d, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    states = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(cents).alias("sum_cents"),
        F.min(cents).alias("min_cents"),
        F.max(cents).alias("max_cents"),
    )
    merged = mergetree.aggregating_final(
        states,
        ["event_type"],
        {"cnt": "count", "sum_cents": "sum", "min_cents": "min", "max_cents": "max"},
    )
    return merged.select(
        "event_type",
        F.col("cnt").cast("long").alias("cnt"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
        "min_cents",
        "max_cents",
        # integer-exact half-up to 6 decimals of S/(100·n): (S·10⁴·2+n) DIV 2n
        F.expr(
            "CAST((sum_cents * 20000 + cnt) DIV (cnt * 2) AS DOUBLE) / 1000000.0"
        ).alias("avg_value"),
    )


def q_replacing_final(spark, d):
    """ReplacingMergeTree FINAL: newest row per key via a partial-aggregatable
    max(struct(version, values)) — the aggregation twin of latest_per_key's
    window formulation (shuffle carries one candidate per key per map task,
    not every row)."""
    ev = _t(spark, d, "events")
    return mergetree.replacing_final(
        ev.select("user_id", "ts", "event_id", "event_type"),
        ["user_id"],
        version_cols=["ts", "event_id"],
        value_cols=["event_type"],
    )


def q_repetition_metrics(spark, d):
    """Gopher-style repetition quality signals (dup-word fraction, top-word
    share) — shuffle-free higher-order array functions."""
    docs = _t(spark, d, "documents")
    out = text.with_repetition_metrics(docs)
    return out.select("doc_id", "dup_line_frac", "dup_word_frac", "top_word_frac")


def q_tfidf_terms(spark, d):
    """Corpus TF-IDF term ranking: one explode + one agg keyed by term;
    corpus size N arrives via broadcast 1-row aggregate, never a driver-side
    count."""
    docs = _t(spark, d, "documents")
    return text.tfidf_top_terms(docs, k=50)


def q_tpch_q18(spark, d):
    """TPC-H Q18 shape (large-volume customers), native DataFrame: the
    HAVING-subquery re-expressed as agg → filter → join; the big side
    aggregates BEFORE joining so the join input is one row per qualifying
    order."""
    li, o, c = (_t(spark, d, t) for t in ["lineitem", "orders", "customer"])
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    out = (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(relational.broadcast_dim(c), o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )
    return relational.top_k(out, 100, F.desc("o_totalprice"), F.asc("o_orderkey"))


def q_tpch_q10(spark, d):
    """TPC-H Q10 shape (returned-item revenue by customer): time-filtered
    orders ⋈ returned lineitems, dims broadcast, revenue agg, top-20.
    Fact sides filter BEFORE the join; only (custkey, revenue) reaches the
    final agg."""
    li, o, c, n = (_t(spark, d, t) for t in ["lineitem", "orders", "customer", "nation"])
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-07-01"))
        )
        .join(li.where(F.col("l_returnflag") == "R"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(relational.broadcast_dim(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(relational.broadcast_dim(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.round(F.sum(rev), 2).alias("revenue")
    )
    return relational.top_k(agg, 20, F.desc("revenue"), F.asc("c_custkey"))


def q_range_frame(spark, d):
    """Time-RANGE window frame: per user, the trailing-1-hour event count and
    value sum at each event (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
    CURRENT ROW) — the frame type rows-based running_sum can't express.
    Spark's rangeBetween needs a numeric ordering key, so the frame runs on
    unix MICROseconds (unix_timestamp would truncate to seconds and shift
    frame membership for sub-second timestamps — caught at sf0.1); the
    oracle uses DuckDB's native interval RANGE frame over the timestamp —
    agreement proves the epoch translation."""
    from pyspark.sql import Window

    ev = _t(spark, d, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_trailing_1h"),
    )


def q_window_dist(spark, d):
    """Distribution window functions: percent_rank and cume_dist of order
    totals within each order status (plus the rank they derive from)."""
    from pyspark.sql import Window

    o = _t(spark, d, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


_RECURSIVE_SQL = """
WITH RECURSIVE months(m, hi) AS (
  SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE),
         CAST(date_trunc('month', max(o_orderdate)) AS DATE) FROM orders
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE), hi FROM months WHERE m < hi
)
SELECT m AS month, count(o_orderkey) AS n_orders
FROM months LEFT JOIN orders ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
GROUP BY m
"""


def q_unigram_surprisal(spark, d):
    """CCNet-style quality signal: mean -ln p(word) per doc against the
    corpus's own unigram distribution."""
    return text.unigram_surprisal(_t(spark, d, "documents"))


def q_quantize_embeddings(spark, d):
    """int8 embedding quantization round-trip, pinned cross-engine: the
    quantized payload is summarized with EXACT integer aggregates (sum /
    min / max of the int8 codes), so any divergence in the scale or
    rounding math breaks the hash."""
    q = similarity.quantize_embeddings(_t(spark, d, "embeddings"))
    codes = F.col("qvec")
    return q.select(
        "vec_id",
        F.round("qscale", 6).alias("qscale"),
        F.aggregate(codes, F.lit(0), lambda a, x: a + x.cast("int")).alias("code_sum"),
        F.array_max(codes).cast("int").alias("code_max"),
        F.array_min(codes).cast("int").alias("code_min"),
    )


def q_array_funcs(spark, d):
    """Higher-order array function depth (§2.6): transform / filter / exists
    / forall / zip_with / sort / slice over the embeddings fixture, checked
    against DuckDB's list_* equivalents."""
    emb = _t(spark, d, "embeddings").where("vec_id < 200")
    v = F.col("embedding")
    return emb.select(
        "vec_id",
        F.round(
            F.aggregate(
                F.transform(v, lambda x: x.cast("double") * 2.0),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            6,
        ).alias("sum_doubled"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        F.exists(v, lambda x: x > 0.49).cast("int").alias("has_large"),
        F.forall(v, lambda x: F.abs(x) <= 0.5).cast("int").alias("all_bounded"),
        F.round(F.element_at(F.array_sort(v), -1).cast("double"), 6).alias("max_elem"),
        F.round(
            F.aggregate(
                F.zip_with(F.slice(v, 1, 8), F.slice(v, 9, 8), lambda a, b: a.cast("double") * b.cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            6,
        ).alias("head_tail_dot"),
    )


def q_string_funcs(spark, d):
    """String function depth (§2.6): regexp extraction/count, translate,
    padding, repeat, reverse, title-case — cross-checked against DuckDB."""
    docs = _t(spark, d, "documents").where("doc_id < 200")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(r"[aeiou]")).cast("long").alias("n_vowels"),
        F.length(F.regexp_replace(t, r"[^a-z]", "")).alias("n_lower"),
        F.substring(F.translate(t, "aeiou", "_____"), 1, 40).alias("masked_prefix"),
        F.lpad(F.col("lang"), 5, ".").alias("lang_padded"),
        F.reverse(F.substring(t, 1, 12)).alias("rev_prefix"),
        F.split_part(t, F.lit(" "), F.lit(2)).alias("second_word"),
    )


def q_integrity_check(spark, d):
    """Referential-integrity audit over the TPC-H-ish FK graph (post-load
    data-quality gate; one left-anti join per relationship)."""
    o = _t(spark, d, "orders")
    c = _t(spark, d, "customer")
    li = _t(spark, d, "lineitem")
    n = _t(spark, d, "nation")
    return relational.integrity_report(
        [
            ("orders->customer", o, "o_custkey", c, "c_custkey"),
            ("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
            ("customer->nation", c, "c_nationkey", n, "n_nationkey"),
        ]
    )


def q_null_semantics(spark, d):
    """NULL-handling semantics in one differential surface (SURVEY §2 P5):
    deterministic NULL injection, then COALESCE, NULLIF, and null-safe
    equality (Spark ``<=>`` ≡ ANSI IS NOT DISTINCT FROM) — the exact
    behaviors that silently diverge between engines when mistranslated."""
    o = _t(spark, d, "orders")
    v = F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(F.col("o_totalprice"))
    w = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(F.col("o_totalprice"))
    return (
        o.select("o_orderkey", v.alias("v"), w.alias("w"))
        .select(
            "o_orderkey",
            F.coalesce("v", "w", F.lit(-1.0)).alias("first_non_null"),
            F.nullif(F.col("v"), F.col("w")).alias("null_if_equal"),
            F.col("v").eqNullSafe(F.col("w")).cast("int").alias("null_safe_eq"),
            (F.col("v") == F.col("w")).cast("int").alias("plain_eq"),
        )
    )


def q_sql_recursive(spark, d):
    """Recursive CTE (Spark 4 WITH RECURSIVE): a dense month spine from the
    orders date range LEFT-joined to per-month counts — the same SQL text
    runs verbatim on DuckDB as the oracle.  The max bound rides INSIDE the
    recursion (a correlated scalar subquery in the step's WHERE re-runs the
    full aggregate every iteration — measured 27 s vs 3 s); the heavy side
    stays a single distributed aggregate."""
    _t(spark, d, "orders").createOrReplaceTempView("orders")
    return relational.sql(spark, _RECURSIVE_SQL)


def q_containment(spark, d):
    """Asymmetric containment pairs (quote / partial-copy detection — the
    case symmetric Jaccard misses)."""
    return dedup.containment_pairs(_t(spark, d, "documents"), threshold=0.6)


def q_dedup_incremental(spark, d):
    """Incremental ingestion dedup: even doc_ids play the historical corpus,
    odd ids the incoming batch; batch rows whose fingerprint exists in the
    corpus (or earlier in the batch) are dropped."""
    docs = _t(spark, d, "documents")
    corpus = docs.where("doc_id % 2 = 0")
    batch = docs.where("doc_id % 2 = 1")
    out = dedup.incremental_exact_dedup(batch, corpus)
    return out.select("doc_id", "lang", "source", "n_chars")


def q_edit_distance(spark, d):
    """ClickHouse editDistance analog (F.levenshtein — also reachable via the
    dialect rename): edit distance between consecutive documents' prefixes.
    Cross-engine agreement with DuckDB's levenshtein pins the semantics."""
    docs = _t(spark, d, "documents").select(
        "doc_id", F.substring("text", 1, 60).alias("t")
    )
    a = docs.where("doc_id < 100").alias("a")
    b = docs.select((F.col("doc_id") - 1).alias("doc_id"), F.col("t").alias("t_b")).alias("b")
    return a.join(b, "doc_id").select(
        "doc_id", F.levenshtein(F.col("t"), F.col("t_b")).alias("edit_dist")
    )


def q_clickhouse_dialect(spark, d):
    """A ClickHouse-flavored query (toStartOfDay/uniqExact/toInt64/toYYYYMM)
    run unchanged through the dialect translator (dialect.py) — the oracle
    is the hand-written ANSI equivalent."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("events")
    ch = (
        "SELECT toStartOfDay(ts) AS day, event_type, "
        "uniqExact(user_id) AS users, toInt64(count(*)) AS n, "
        "toYYYYMM(ts) AS ym "
        "FROM events GROUP BY toStartOfDay(ts), event_type, toYYYYMM(ts)"
    )
    return relational.sql(spark, translate_clickhouse_sql(ch))


def q_cdc_chunks(spark, d):
    """Content-defined chunking (text.py::cdc_chunks): rolling-window md5
    boundaries (expected chunk ≈ 16 words) — chunk-level dedup robust to
    insertions, unlike fixed-size chunking.  md5 buckets make the exact
    chunking engine-portable; insertion-robustness is pytest-asserted."""
    docs = _t(spark, d, "documents")
    out = text.cdc_chunks(docs)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.substring("chunk_text", 1, 40).alias("chunk_prefix"),
        "n_tokens",
    )


def q_fuzzy_pairs(spark, d):
    """Approximate-string self-join (dedup.py::edit_distance_pairs): all
    document pairs whose 30-char text prefixes are within Levenshtein
    distance 2, via PassJoin partition-signature candidates (segments vs
    position-windowed substrings — an equi-join, never all-pairs) + exact
    levenshtein verification.  Oracle = DuckDB brute-force levenshtein
    join, so any false negative in the candidate scheme breaks the hash."""
    docs = _t(spark, d, "documents").select(
        "doc_id", F.substring("text", 1, 30).alias("pref")
    )
    return dedup.edit_distance_pairs(docs, "doc_id", "pref", max_dist=2)


def q_any_join(spark, d):
    """ClickHouse ANY-strictness join (relational.py::any_join): each
    customer picks at most ONE order — deterministically the minimum
    o_orderkey — so the left side never fans out on duplicate right keys.
    The right side collapses via one min_by hash aggregation BEFORE the
    join (no window, no second scan).  Oracle = row_number()-over-key
    subquery + LEFT JOIN."""
    cust = _t(spark, d, "customer").select("c_custkey", "c_name", "c_acctbal")
    orders = _t(spark, d, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
    )
    out = relational.any_join(cust, orders, on="c_custkey", order_col="o_orderkey")
    return out.select(
        "c_custkey",
        "c_name",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "o_orderkey",
        "o_orderdate",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


def q_ccnet_buckets(spark, d):
    """CCNet head/middle/tail quality buckets (text.py::ccnet_buckets):
    per-language ntile(3) over the oracle-proven rounded unigram
    surprisal, id tiebreak — the keep/down-weight/drop split of the CCNet
    curation pipeline, engine-reproducible by construction."""
    return text.ccnet_buckets(_t(spark, d, "documents"))


def q_ewma(spark, d):
    """ClickHouse exponentialMovingAverage analog (events.py::ewma_final):
    per-user time-decay weighted mean of value, weight = 2^(−age/1h)
    against the user's newest event — closed form over explicit
    timestamps, one aggregation pass."""
    out = events.ewma_final(_t(spark, d, "events"), halflife_seconds=3600.0)
    return out.select("user_id", "n_events", F.round("ewma", 6).alias("ewma"))


def q_variant_props(spark, d):
    """ClickHouse native-JSON-type analog via Spark 4 VARIANT
    (events.py::props_variant_stats): props parsed ONCE to the binary
    variant encoding, path extraction + per-type aggregation in codegen —
    the modern engine path next to the stringly get_json_object of
    json_props.  Oracle: DuckDB json_extract over the same rows."""
    out = events.props_variant_stats(_t(spark, d, "events"))
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("n_with_path").cast("long").alias("n_with_path"),
        F.col("sum_path").cast("long").alias("sum_path"),
    )


def q_hard_negatives(spark, d):
    """Hard-negative mining (similarity.py::hard_negatives): per query,
    top-5 most cosine-similar vectors with a DIFFERENT label — the
    contrastive-training near-miss set.  broadcast(queries) ⋈ corpus with
    the label inequality folded into the join filter; oracle is the
    brute-force cross join with the same filter."""
    emb = _t(spark, d, "embeddings")
    return similarity.hard_negatives(emb.filter("vec_id < 10"), emb, k=5)


def q_max_intersections(spark, d):
    """ClickHouse maxIntersections/maxIntersectionsPosition
    (events.py::max_intersections): peak concurrent intervals per user —
    sweep-line as explode(+1/−1) + per-key running sum.  Intervals are
    derived deterministically from event_id so the oracle mirrors the
    exact sweep."""
    ev = _t(spark, d, "events").select(
        "user_id",
        (F.col("event_id") % 1000).alias("s"),
        (F.col("event_id") % 1000 + F.col("event_id") % 50 + 1).alias("e"),
    )
    return events.max_intersections(ev, "s", "e", key_col="user_id")


def q_sequence_match(spark, d):
    """ClickHouse sequenceMatch through the dialect translator
    (dialect.py::_rewrite_sequence_funcs): per user, does a view precede
    a purchase ((?1).*(?2)) and does view→click→purchase occur in order
    ((?1).*(?2).*(?3)) — a codegen aggregate fold over the per-key
    sequence, clocked by the unique event_id (CH accepts any UInt time
    column; uniqueness makes the order total, so the brute-force
    EXISTS-join oracle is exact)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("seq_ev")
    ch_sql = (
        "SELECT user_id, "
        "sequenceMatch('(?1).*(?2)')(event_id, "
        "  event_type = 'view', event_type = 'purchase') AS vp, "
        "sequenceMatch('(?1).*(?2).*(?3)')(event_id, "
        "  event_type = 'view', event_type = 'click', "
        "  event_type = 'purchase') AS vcp "
        "FROM seq_ev GROUP BY user_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_paragraph_dedup(spark, d):
    """Paragraph-granular corpus dedup with reassembly (dedup.py::
    paragraph_dedup — the CCNet first-pass, Wenzek et al. 2020 §3.1):
    paragraphs are synthesized deterministically (newline after every 4
    words, same regex both engines), repeats keep only their first
    corpus-wide occurrence, docs reassemble in original order.  Two
    shuffles: one row_number keyed by paragraph fingerprint, one per-doc
    regroup."""
    docs = _t(spark, d, "documents").select(
        "doc_id",
        F.regexp_replace("text", r"(\S+ \S+ \S+ \S+) ", "$1\n").alias("text"),
    )
    out = dedup.paragraph_dedup(docs)
    return out.select(
        "doc_id",
        F.col("n_paragraphs").cast("long").alias("n_paragraphs"),
        F.col("n_kept").cast("long").alias("n_kept"),
        "text",
    )


def q_zipf_fit(spark, d):
    """Corpus-level Zipf fit (text.py::zipf_fit): ln(freq)~ln(rank) least
    squares over the top-1000 tokens — the one-number distribution-health
    probe (natural text sits near slope −1).  Bounded top-k then regr
    aggregates; never a full-vocab sort."""
    return text.zipf_fit(_t(spark, d, "documents"), top_n=1000)


def q_pr_curve(spark, d):
    """Quality-score calibration curve (text.py::pr_curve): type-token
    ratio as the score, length>250 as the label; precision/recall at each
    quantized threshold scanning high→low.  Threshold frame is bounded by
    quantization (≤1001 points at any corpus size)."""
    w = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    scored = _t(spark, d, "documents").select(
        (F.size(F.array_distinct(w)) / F.size(w)).alias("score"),
        (F.col("n_chars") > 250).alias("label"),
    )
    return text.pr_curve(scored).orderBy(F.desc("threshold"))


def q_clickhouse_funcs3(spark, d):
    """Round-4 ClickHouse function batch through the dialect translator
    (dialect.py): arrayCumSum (one aggregate fold, O(n)), arrayEnumerate
    (transform-by-index — NOT sequence(1, size), which descends for empty
    arrays), countEqual (NULL-safe <=>), bitCount, range with the
    empty-guard slice, exp2.  Oracle = DuckDB list/bit builtins."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("ev_funcs3")
    ch_sql = (
        "SELECT event_id, "
        "arrayCumSum([1, event_id % 5, 2]) AS cum, "
        "arrayEnumerate(range(event_id % 4)) AS en, "
        "countEqual([event_id % 3, 1, 1], 1) AS ce, "
        "bitCount(event_id) AS bc, "
        "range(event_id % 4) AS rg, "
        "round(exp2(event_id % 5), 6) AS e2, "
        "arraySort(arrayIntersect([1, 2, 3, event_id % 5], [2, 3, 9])) AS ai, "
        "arrayPushBack([1, 2], event_id % 7) AS pb, "
        "arrayPopFront([1, 2, 3]) AS pf, "
        "ifNull(NULL, event_id) AS ifn, "
        "tupleElement(tuple(event_id, 'x'), 1) AS te "
        "FROM ev_funcs3 WHERE event_id < 500"
    )
    out = spark.sql(translate_clickhouse_sql(ch_sql))
    # array outputs ','-joined to scalar strings (driver canon can't hash
    # list cells — CORRECTNESS_r04 clickhouse_funcs3 stack); all arrays
    # here are integer-valued so the join is format-exact vs DuckDB
    return out.select(
        "event_id",
        _join_arr(F.col("cum").cast("array<long>")).alias("cum"),
        _join_arr("en").alias("en"),
        F.col("ce").cast("long").alias("ce"),
        F.col("bc").cast("long").alias("bc"),
        _join_arr("rg").alias("rg"),
        "e2",
        _join_arr("ai").alias("ai"),
        _join_arr("pb").alias("pb"),
        _join_arr("pf").alias("pf"),
        F.col("ifn").cast("long").alias("ifn"),
        F.col("te").cast("long").alias("te"),
    )


def q_with_fill(spark, d):
    """ClickHouse ``ORDER BY ... WITH FILL FROM a TO b`` through the SQL
    endpoint (dialect.py::_rewrite_with_fill): day-of-month event counts
    with deliberate gaps (every dom ≡ 1 mod 3 filtered out) filled to the
    full 1..31 progression as NULL-count rows — generated sequence
    FULL-joined on the fill column.  Oracle: DuckDB generate_series left
    join (identical fill semantics)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("ev_fill")
    ch_sql = (
        "SELECT toDayOfMonth(ts) AS dom, count(*) AS n_events "
        "FROM ev_fill WHERE toDayOfMonth(ts) % 3 != 1 "
        "GROUP BY dom ORDER BY dom WITH FILL FROM 1 TO 32"
    )
    out = spark.sql(translate_clickhouse_sql(ch_sql))
    return out.select("dom", F.col("n_events").cast("long").alias("n_events"))


def q_mad_outliers(spark, d):
    """Median/MAD robust outlier flags (relational.py::robust_outliers —
    Iglewicz & Hoaglin modified z-score, k = 3.5): per-event-type cutoff
    statistics the outliers cannot inflate, two grouped medians broadcast
    back onto the row stream.  Oracle: DuckDB medians (both engines
    interpolate the even-count midpoint identically)."""
    ev = _t(spark, d, "events").select("event_id", "event_type", "value")
    out = relational.robust_outliers(ev, "value", ["event_type"])
    return out.select(
        "event_id", "event_type", "mod_z", "is_outlier"
    ).orderBy("event_id")


def q_exactsubstr_dedup(spark, d):
    """ExactSubstr-style repeated-span removal
    (dedup.py::remove_repeated_spans — Lee et al. 2022 keep-one policy at
    3-gram resolution, min span 6 tokens): a shared boilerplate footer
    planted on every 5th document is excised everywhere except the
    canonical first occurrence, alongside whatever duplication the
    fixture corpus itself carries.  String-shingle twin (hashed=False)
    so the oracle compares values; the xxhash64 path is the production
    twin (pytest-equivalence-checked).  Oracle: DuckDB replicating the
    same posting/canonical/island pipeline."""
    docs = _t(spark, d, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(
                    " common footer boilerplate sentence appended here exactly"
                ),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = dedup.remove_repeated_spans(docs, n=3, min_tokens=6, hashed=False)
    return out.orderBy("doc_id")


def _pipeline_e2e_inputs(spark, d):
    """Shared train/bench fixture for the composed funnel (used by
    q_pipeline_e2e and by bench.py's per-stage attribution run)."""
    docs = _t(spark, d, "documents").select("doc_id", "text")
    # sentence structure every 6 words ('.' + newline — the q_c4_rules
    # trick plus terminal punctuation, since the synthetic corpus has
    # none): the C4 line gates then operate on real lines, and short
    # documents (< 3 injected sentences) genuinely fail the page gate.
    # The injection is part of the fixture on BOTH engines, so every
    # downstream stage sees the same tokens.
    train = docs.filter(F.col("doc_id") % 20 != 0).select(
        "doc_id",
        F.expr(
            r"regexp_replace(text, '(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ', '$1.\n')"
        ).alias("text"),
    )
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    return train, bench


def q_pipeline_e2e(spark, d):
    """Composed curation pipeline (pipeline.py::curation_pipeline — the
    RedPajama/Dolma funnel): Gopher gates → C4 page gates → exact dedup
    (min-id survivor) → portable-MinHash near-dedup (LSH → Jaccard ≥ 0.8
    → drop greater id) → ExactSubstr span removal (modifies, never
    drops) → trigram decontamination against a held-out benchmark split
    (doc_id % 20 = 0).  Returns the per-stage provenance funnel
    (stage_idx, stage, docs, dropped, modified) — the table every corpus
    build reports.  Exercises OPERATOR COMPOSITION: every stage is an
    already-proven operator, and the oracle replays the whole funnel in
    DuckDB (portable md5 MinHash makes stage 4 engine-reproducible)."""
    from clickhouse_flatfile_tool_spark.operators.pipeline import (
        curation_pipeline,
    )

    train, bench = _pipeline_e2e_inputs(spark, d)
    _final, provenance = curation_pipeline(train, bench)
    return provenance


def q_pipeline_e2e_fast(spark, d):
    """Production twin of ``pipeline_e2e`` (portable=False: xxhash64
    MinHash banding + hashed ExactSubstr shingles — 8-byte longs through
    every dedup shuffle instead of md5 hex strings).  Benched, not
    registered: the md5 oracle twin is the driver-checked entry, the
    winnow/winnow_fast and exactsubstr/exactsubstr_fast convention;
    pytest asserts mode agreement on the planted funnel fixture."""
    from clickhouse_flatfile_tool_spark.operators.pipeline import (
        curation_pipeline,
    )

    train, bench = _pipeline_e2e_inputs(spark, d)
    _final, provenance = curation_pipeline(train, bench, portable=False)
    return provenance


def q_pipeline_incremental(spark, d):
    """Incremental (daily-batch) curation funnel (pipeline.py::
    curation_pipeline_incremental — the shape a production corpus build
    runs every day: history immutable, only the delta is gated/deduped/
    decontaminated).  Fixture: every document gets the q_pipeline_e2e
    sentence injection, then corpus = doc_id%4==0 (already curated),
    benchmark = doc_id%20==1, natural delta = the rest; planted delta
    rows replay corpus docs verbatim (+10M ids → dropped at the
    incremental-exact stage) and with a 6-word appended tail (+20M ids →
    dropped at neardup when the doc is long enough for Jaccard ≥ 0.8 —
    short docs legitimately survive, both engines agree).  Returns the
    provenance funnel; the oracle replays the full incremental funnel in
    DuckDB (portable md5 MinHash on BOTH sides keeps stage 4
    engine-reproducible)."""
    from clickhouse_flatfile_tool_spark.operators.pipeline import (
        curation_pipeline_incremental,
    )

    delta, corpus, bench = _incr_funnel_frames(spark, d)
    _final, provenance = curation_pipeline_incremental(delta, corpus, bench)
    return provenance


def _incr_funnel_frames(spark, d):
    """Shared fixture for the incremental-funnel entries: corpus =
    doc_id%4==0, benchmark = doc_id%20==1, delta = the rest plus planted
    verbatim clones (+10M ids) and near-clone tails (+20M ids) of corpus
    docs."""
    docs = _t(spark, d, "documents").select(
        "doc_id",
        F.expr(
            r"regexp_replace(text, '(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ', '$1.\n')"
        ).alias("text"),
    )
    corpus = docs.filter(F.col("doc_id") % 4 == 0)
    bench = docs.filter(F.col("doc_id") % 20 == 1)
    natural = docs.filter(
        (F.col("doc_id") % 4 != 0) & (F.col("doc_id") % 20 != 1)
    )
    clones = corpus.filter(F.col("doc_id") % 8 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    nears = corpus.filter(F.col("doc_id") % 8 == 4).select(
        (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" appended near duplicate tail words here")
        ).alias("text"),
    )
    delta = natural.union(clones).union(nears)
    return delta, corpus, bench


def q_pipeline_incremental_prebuilt(spark, d):
    """The PREBUILT-ARTIFACT shape of the incremental funnel (VERDICT r7
    #1 — the 100 TB daily build): corpus fingerprints + banded md5
    signatures are materialized ONCE by dedup.write_corpus_artifacts as
    bucketed catalog tables (__fp / (band, bucket)), then
    curation_pipeline_incremental consumes them via corpus_fps= /
    corpus_banded= — history is probed through the artifacts, never
    re-hashed per batch.  Same fixture and SAME oracle as
    pipeline_incremental: the driver hash-proves the prebuilt path equals
    the recompute path (which equals the full DuckDB funnel replay).
    Hygiene (VERDICT r8 #7): the artifact dir and catalog tables are
    removed in a finally — repeated runs leave /tmp and the warehouse
    clean; the 6-row provenance is localCheckpointed first so the
    returned frame no longer depends on the dropped tables."""
    import shutil
    import tempfile

    from clickhouse_flatfile_tool_spark.operators import dedup as _dd
    from clickhouse_flatfile_tool_spark.operators.pipeline import (
        curation_pipeline_incremental,
    )

    delta, corpus, bench = _incr_funnel_frames(spark, d)
    tmp = tempfile.mkdtemp(prefix="drv_corpus_arts_")
    try:
        arts = _dd.write_corpus_artifacts(
            corpus, tmp, table_prefix="drv_corpus_art"
        )
        _final, provenance = curation_pipeline_incremental(
            delta, corpus, bench,
            corpus_fps=arts["fingerprints"], corpus_banded=arts["banded"],
        )
        return provenance.localCheckpoint()
    finally:
        for t in ("drv_corpus_art_fingerprints", "drv_corpus_art_banded"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(tmp, ignore_errors=True)


def _append_funnel_frames(spark, d):
    """Fixture for the DAILY-APPEND funnel entry (VERDICT r8 #3): two
    consecutive build days over disjoint id spaces.  corpus = doc_id%4==0,
    bench = %20==1; day-1 delta = the %4==1 naturals plus verbatim clones
    of corpus docs (+10M); day-2 delta = the %4∈{2,3} naturals plus
    verbatim copies (+30M) AND near-dup tails (+40M) of the day-1
    naturals — the copies of day-1 ACCEPTED docs can only be dropped via
    the APPENDED artifacts, which is the property under test."""
    docs = _t(spark, d, "documents").select(
        "doc_id",
        F.expr(
            r"regexp_replace(text, '(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ', '$1.\n')"
        ).alias("text"),
    )
    corpus = docs.filter(F.col("doc_id") % 4 == 0)
    bench = docs.filter(F.col("doc_id") % 20 == 1)
    nat1 = docs.filter(
        (F.col("doc_id") % 4 == 1) & (F.col("doc_id") % 20 != 1)
    )
    clones = corpus.filter(F.col("doc_id") % 8 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    delta1 = nat1.union(clones)
    nat2 = docs.filter(
        (F.col("doc_id") % 4 >= 2) & (F.col("doc_id") % 20 != 1)
    )
    copies = nat1.select(
        (F.col("doc_id") + F.lit(30_000_000)).alias("doc_id"), "text"
    )
    nears = nat1.select(
        (F.col("doc_id") + F.lit(40_000_000)).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" appended near duplicate tail words here")
        ).alias("text"),
    )
    delta2 = nat2.union(copies).union(nears)
    return delta1, delta2, corpus, bench


def q_pipeline_incremental_append(spark, d):
    """The DAY-2+ shape of the incremental funnel (VERDICT r8 #3 — what
    every production daily build after the first actually runs,
    previously pytest-only at tests/test_text_dedup.py::
    test_append_corpus_artifacts_daily_loop): day 1 probes delta1
    against write-once corpus artifacts and ACCEPTS a batch;
    dedup.append_corpus_artifacts folds the accepted batch's
    fingerprints/banded signatures into the same bucketed tables
    (insertInto preserves bucket assignment — O(delta), never an
    O(corpus) rebuild); day 2's delta then probes the APPENDED tables.
    Returned: day-2 provenance.  Oracle: a full two-day DuckDB funnel
    replay where day 2 runs against corpus ∪ day-1-accepted — the
    driver hash-proves the appended-artifact probe equals history
    rebuilt from scratch.  Day-2's exact stage drops exactly the
    verbatim copies of day-1-accepted docs, which only the appended
    artifacts can know about."""
    import shutil
    import tempfile

    from clickhouse_flatfile_tool_spark.operators import dedup as _dd
    from clickhouse_flatfile_tool_spark.operators.pipeline import (
        curation_pipeline_incremental,
    )

    delta1, delta2, corpus, bench = _append_funnel_frames(spark, d)
    tmp = tempfile.mkdtemp(prefix="drv_append_arts_")
    try:
        arts = _dd.write_corpus_artifacts(
            corpus, tmp, table_prefix="drv_append_art"
        )
        final1, _p1 = curation_pipeline_incremental(
            delta1, corpus, bench,
            corpus_fps=arts["fingerprints"], corpus_banded=arts["banded"],
        )
        accepted1 = final1.localCheckpoint()
        appended = _dd.append_corpus_artifacts(
            accepted1, tmp, table_prefix="drv_append_art"
        )
        corpus2 = corpus.union(accepted1)
        _f2, provenance2 = curation_pipeline_incremental(
            delta2, corpus2, bench,
            corpus_fps=appended["fingerprints"],
            corpus_banded=appended["banded"],
        )
        # 6 rows — materialize so the returned frame no longer depends
        # on the artifact tables dropped below (the prebuilt entry's
        # hygiene contract)
        return provenance2.localCheckpoint()
    finally:
        for t in ("drv_append_art_fingerprints", "drv_append_art_banded"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(tmp, ignore_errors=True)


def q_pack_valid(spark, d):
    """Validity frame for best-fit-decreasing packing (VERDICT r8 #5 —
    the DuckDB-expressible invariants of text.pack_best_fit): every doc
    packed exactly once, token totals conserved, oversize flags ≡ docs
    over budget, NO regular bin over budget, and the global bin count
    both pinned (placement-regression tripwire, lineitem-count keyed,
    NULL at unpinned scales) and ≥ the ceil(tokens/budget) lower bound.
    BFD placement itself is sequential (pytest-golden); this entry makes
    its correctness FRAME a driver-checked hash."""
    budget = 1024
    packed = text.pack_best_fit(
        _t(spark, d, "documents"), budget_tokens=budget, bucket_chars=1
    )
    bins = packed.groupBy("bucket", "bin_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.max(F.col("oversize").cast("int")).alias("ov"),
    )
    stats = packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("doc_id").alias("n_distinct"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.col("oversize").cast("long")).alias("n_oversize"),
        F.sum(
            F.when(~F.col("oversize"), F.col("n_tokens")).otherwise(F.lit(0))
        ).alias("reg_tokens"),
    )
    binstats = bins.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(
            ((F.col("fill") > budget) & (F.col("ov") == 0)).cast("long")
        ).alias("overfull_bins"),
    )
    return stats.crossJoin(binstats).select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("n_oversize").cast("long").alias("n_oversize"),
        F.col("overfull_bins").cast("long").alias("overfull_bins"),
        F.col("n_bins").cast("long").alias("n_bins"),
        (
            (F.col("n_bins") - F.col("n_oversize"))
            >= F.ceil(F.col("reg_tokens") / F.lit(float(budget)))
        ).cast("int").alias("lb_ok"),
    )


def q_sketch_error(spark, d):
    """|HLL estimate − exact| made a driver-checked hash (VERDICT r8 #5
    for hll_rollup + uniq_state_merge): per-type mv_refresh estimates at
    lg_k=14 AND at lg_k=4, plus the hourly→daily hll_rollup estimate
    sum, each joined to its exact COUNT(DISTINCT) twin and emitted as
    (dim, exact, approx, err_bp).  Exact sides replay in DuckDB; the
    DataSketches estimates are deterministic for a given input set, so
    they are PINNED per fixture scale (lineitem-count keyed, NULL at
    unpinned scales) — any lg_k / library / path change forces a re-pin
    review, which is the point.  At fixture cardinalities the lg_k=14
    sketches are sparse-mode EXACT (err_bp 0 — itself a pinned fact);
    the lg_k=4 rows exercise real estimation error (the pytest ≤2%
    bound covers production lg_k at larger synthetic cardinalities)."""
    ev = _t(spark, d, "events").withColumn("day", F.to_date("ts"))
    exact_t = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact")
    )

    def _per_type(lg_k: int, tag: str):
        daily = mergetree.hll_state(
            ev, ["event_type", "day"], "user_id", lg_k=lg_k
        )
        merged = mergetree.mv_refresh(
            None, daily.drop("day"), ["event_type"], {"uniq_state": "hll"}
        )
        return (
            merged.select(
                "event_type",
                F.hll_sketch_estimate("uniq_state").cast("long").alias(
                    "approx"
                ),
            )
            .join(exact_t, "event_type")
            .select(
                F.concat(F.lit(tag), F.col("event_type")).alias("dim"),
                F.col("exact").cast("long").alias("exact"),
                "approx",
            )
        )

    roll = events.hll_rollup(ev)
    exact_d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.countDistinct("user_id").alias("exact")
    )
    day_sum = (
        roll.join(exact_d, "day")
        .agg(
            F.sum("exact").cast("long").alias("exact"),
            F.sum(F.col("approx_users").cast("long")).alias("approx"),
        )
        .select(F.lit("day_rollup_sum").alias("dim"), "exact", "approx")
    )
    return (
        _per_type(14, "type:")
        .union(_per_type(4, "lgk4:"))
        .union(day_sum)
        .select(
            "dim",
            "exact",
            "approx",
            F.floor(
                F.abs(F.col("approx") - F.col("exact"))
                * 10000
                / F.col("exact")
            ).cast("long").alias("err_bp"),
        )
        .orderBy("dim")
    )


def q_exactsubstr_fast(spark, d):
    """Production twin of ``exactsubstr_dedup`` (xxhash64 shingles — 8-byte
    longs through the shuffle instead of gram strings; pytest asserts the
    two paths produce identical clean_text).  Benched, not registered:
    the oracle twin is the driver-checked entry, the winnow/winnow_fast
    convention."""
    docs = _t(spark, d, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(
                    " common footer boilerplate sentence appended here exactly"
                ),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dedup.remove_repeated_spans(docs, n=3, min_tokens=6, hashed=True)


def q_dict_sql(spark, d):
    """ClickHouse dictionary functions through the SQL endpoint
    (dialect.py::register_dictionary + the dictGet*/dictHas rewrites):
    orders enriched with customer names via correlated scalar subqueries
    that Catalyst decorrelates into a broadcastable left outer join —
    the executor-local hash probe CH's dictionary layout gives.  Every
    10th order probes a planted missing key (default path).  Oracle:
    DuckDB's own correlated scalar subqueries."""
    from clickhouse_flatfile_tool_spark.dialect import (
        register_dictionary,
        translate_clickhouse_sql,
    )

    _t(spark, d, "customer").createOrReplaceTempView("dsql_cust")
    register_dictionary("dsql_dict", "dsql_cust", "c_custkey")
    _t(spark, d, "orders").createOrReplaceTempView("dsql_orders")
    ch_sql = (
        "SELECT o_orderkey, "
        "dictGetOrDefault('dsql_dict', 'c_name', "
        "  if(modulo(o_orderkey, 10) = 0, -1, o_custkey), 'UNK') AS nm, "
        "dictHas('dsql_dict', "
        "  if(modulo(o_orderkey, 10) = 0, -1, o_custkey)) AS h "
        "FROM dsql_orders WHERE o_orderkey < 1000 ORDER BY o_orderkey"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_c4_rules(spark, d):
    """C4-style cleaning bundle (text.py::c4_rules — Raffel et al. 2020
    §2.2): line-level retention (terminal punctuation, ≥5 words, no
    javascript mention) + page gates (≥3 sentences, no brace, no lorem
    ipsum).  The single-line fixture text gets newlines injected every
    6 words (the paragraph_dedup trick) so the line logic is actually
    exercised.  Oracle: DuckDB list_filter over the same split."""
    docs = _t(spark, d, "documents").select(
        "doc_id",
        F.expr(
            r"regexp_replace(text, '(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ', '$1\n')"
        ).alias("text"),
    )
    return text.c4_rules(docs).orderBy("doc_id")


def q_with_fill_interp(spark, d):
    """``WITH FILL … INTERPOLATE (col)`` through the SQL endpoint
    (dialect.py::_rewrite_with_fill): gap-filled day-of-month rows carry
    the per-day sum forward from the last ORIGINAL row — the r5 fix
    carries via an __orig-gated struct, so an original NULL would
    propagate (CH's carry-previous-row rule) instead of skipping to an
    older non-NULL.  Oracle: DuckDB generate_series left join +
    last_value IGNORE NULLS carry (equivalent here because original
    sums are never NULL)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("ev_fill_i")
    ch_sql = (
        "SELECT toDayOfMonth(ts) AS dom, count(*) AS n_events, "
        "round(sum(value), 6) AS sv "
        "FROM ev_fill_i WHERE toDayOfMonth(ts) % 3 != 1 "
        "GROUP BY dom ORDER BY dom WITH FILL FROM 1 TO 32 INTERPOLATE (sv)"
    )
    out = spark.sql(translate_clickhouse_sql(ch_sql))
    return out.select(
        "dom", F.col("n_events").cast("long").alias("n_events"), "sv"
    )


def q_jsonl_scan(spark, d):
    """JSONEachRow source round trip (sources/files.py::write_jsonl +
    read_jsonl): documents project to newline-delimited JSON and read back
    under an explicit schema — the wire format the reference requests on
    every read (server/server.js:141).  Oracle = the same projection
    straight off the parquet view, so the hash proves byte-faithful
    JSON encode/decode of real corpus text (escapes, unicode)."""
    from clickhouse_flatfile_tool_spark.sources.files import read_jsonl, write_jsonl

    docs = (
        _t(spark, d, "documents")
        .filter("doc_id < 200")
        .select("doc_id", "lang", "text")
    )
    tag = os.path.basename(os.path.normpath(d)) or "sf"
    tmp = os.path.join(tempfile.gettempdir(), f"cfts_jsonl_{tag}")
    write_jsonl(docs, tmp)
    back = read_jsonl(spark, tmp, schema="doc_id bigint, lang string, text string")
    return back.select("doc_id", "lang", "text")


def q_winsorize(spark, d):
    """Winsorized robust aggregation: o_totalprice clipped to its
    [k-th smallest, k-th largest] band (k = max(1, ⌊1% · n⌋)) before a
    per-priority sum — the outlier-robust statistics pass a curation
    pipeline runs before computing corpus mixes.  Thresholds come from two
    top-k reductions (orderBy+limit+agg — distributed top-k, no global
    window); the clip itself is pure codegen least/greatest.  Sums are
    exact: 2-decimal money at fixture scale stays integer in cents under
    2^53.  Oracle computes the same k-th order statistics via row_number."""
    o = _t(spark, d, "orders").select("o_orderpriority", "o_totalprice")
    n = o.count()
    k = max(1, n // 100)
    lo = o.orderBy(F.asc("o_totalprice")).limit(k).agg(
        F.max("o_totalprice")
    ).collect()[0][0]
    hi = o.orderBy(F.desc("o_totalprice")).limit(k).agg(
        F.min("o_totalprice")
    ).collect()[0][0]
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.lit(lo)), F.lit(hi))
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(clipped), 2).alias("sum_winsorized"),
    )


def q_dialect_asof(spark, d):
    """ClickHouse ``ASOF JOIN`` through the SQL endpoint
    (dialect.py::_rewrite_asof_join): each purchase event matched to the
    user's latest not-later view event — the CH dialect string runs on
    Spark via a correlated LATERAL subquery (closest-match LIMIT 1).
    The view side is pre-deduped on (user_id, ts) so the asof match is
    unique and the result hash-deterministic.  Oracle: DuckDB's native
    ASOF JOIN over the same SQL shape."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    ev = _t(spark, d, "events")
    ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    ).createOrReplaceTempView("asof_purchase")
    ev.filter(F.col("event_type") == "view").groupBy("user_id", "ts").agg(
        F.round(F.max("value"), 2).alias("vvalue")
    ).select("user_id", F.col("ts").alias("vts"), "vvalue").createOrReplaceTempView(
        "asof_view"
    )
    ch_sql = (
        "SELECT a.event_id, a.user_id, a.ts, "
        "b.vts AS view_ts, b.vvalue AS view_value "
        "FROM asof_purchase a ASOF JOIN asof_view b "
        "ON a.user_id = b.user_id AND a.ts >= b.vts"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_final(spark, d):
    """ClickHouse ``SELECT ... FROM t FINAL`` through the SQL endpoint:
    the view is registered as a ReplacingMergeTree keyed by
    (user_id, event_type) with ts as the version (mergetree.py::
    register_table_engine / final_read; dialect.py::_rewrite_final), so
    FINAL reads the latest value per key — the everyday CH read-time-merge
    idiom (the reference's CREATE TABLE carries the ENGINE clause,
    server/server.js:586-589).  The fixture has no duplicate
    (user_id, event_type, ts) triples, so the max-version row is unique
    and the result hash-deterministic.  Oracle: DuckDB max_by per key."""
    from clickhouse_flatfile_tool_spark.dialect import (
        final_tables,
        translate_clickhouse_sql,
    )
    from clickhouse_flatfile_tool_spark.operators import mergetree

    _t(spark, d, "events").select(
        "user_id", "event_type", "ts", "value"
    ).createOrReplaceTempView("mt_events")
    mergetree.register_table_engine(
        "mt_events",
        "ReplacingMergeTree",
        ["user_id", "event_type"],
        version_cols=["ts"],
        value_cols=["value"],
    )
    ch_sql = (
        "SELECT event_type, count() AS n_keys, "
        "round(sum(value), 6) AS sum_latest "
        "FROM mt_events FINAL GROUP BY event_type ORDER BY event_type"
    )
    # the api.query pre-pass, inlined (driver queries return DataFrames)
    for t in final_tables(ch_sql):
        mergetree.final_read(spark, t).createOrReplaceTempView(f"{t}__final")
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_summap_merge(spark, d):
    """ClickHouse ``sumMap(k, v)`` (the ``-Map`` aggregate combinator,
    relational.py::map_aggregate): stage 1 packs each user's day of events
    into parallel (event_type, value) arrays — the SummingMergeTree
    metric-map row shape — and stage 2 merges the daily maps per user,
    summing equal keys and returning key-sorted parallel arrays.  Oracle:
    DuckDB per-key sums re-assembled with ordered list() aggregates.
    The merged map is exploded back to (user_id, k, v) scalar rows for the
    driver (its pandas canonicalizer can't hash array cells); the values
    still come out of the two-stage map merge, so the shape under test is
    unchanged."""
    ev = _t(spark, d, "events")
    daily = (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("event_type").alias("k"),
                        F.col("value").alias("v"),
                    )
                )
            ).alias("e")
        )
        .select("user_id", F.col("e.k").alias("ks"), F.col("e.v").alias("vs"))
    )
    out = relational.map_aggregate(daily, ["user_id"], "ks", "vs", "sum")
    return (
        out.select("user_id", F.explode(F.arrays_zip("keys", "vals")).alias("kv"))
        .select(
            "user_id",
            F.col("kv.keys").alias("k"),
            F.round("kv.vals", 6).alias("v"),
        )
        .orderBy("user_id", "k")
    )


def q_clickhouse_funcs4(spark, d):
    """Dialect batches 7-9 end-to-end through the SQL endpoint: tokens/
    ngrams/hasToken boundaries, byteHammingDistance (incl. length tail),
    bitTest/bitmaskToList/intExp2, formatReadableSize, array Resize/
    RotateLeft/Product/First/Count/JaccardIndex, the vector family
    (dot product, L2 distance), monthName/dateName/makeDate, Modified
    Julian Day.  Oracle: DuckDB natives (list_* family, printf,
    monthname/dayname, datediff) computing the same values."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "documents").createOrReplaceTempView("cf4_docs")
    ch_sql = (
        "SELECT doc_id, "
        "size(tokens(text)) AS n_toks, "
        "ngrams(substring(text, 1, 10), 3) AS grams3, "
        "hasToken(text, 'the') AS has_the, "
        "byteHammingDistance(lang, 'en') AS hd, "
        "bitTest(doc_id, 3) AS b3, "
        "bitmaskToList(modulo(doc_id, 64)) AS bml, "
        "intExp2(modulo(doc_id, 10)) AS e2, "
        "formatReadableSize(n_chars * 1024) AS frs, "
        "arrayProduct([toFloat64(modulo(doc_id, 5)) + 1, 2]) AS prod, "
        "arrayRotateLeft([n_chars, doc_id, 7], 1) AS rot, "
        "arrayResize([n_chars], 3, 0) AS rsz, "
        "arrayFirst(x -> x > 2, [1, modulo(doc_id, 6), 9]) AS afirst, "
        "arrayCount(x -> modulo(x, 2) = 0, [doc_id, n_chars, 3]) AS acnt, "
        "round(arrayJaccardIndex([modulo(doc_id, 5), 1, 2], [1, 2, 3]), 6) AS aj, "
        "round(arrayDotProduct([1.5, 2.0], [toFloat64(modulo(doc_id, 7)), 2.0]), 6) AS dot, "
        "round(arrayL2Distance([0.0, 0.0], [3.0, toFloat64(modulo(doc_id, 9))]), 6) AS l2, "
        "monthName(makeDate(2020, modulo(doc_id, 12) + 1, 5)) AS mn, "
        "dateName('weekday', makeDate(2024, 3, modulo(doc_id, 28) + 1)) AS wd, "
        "toModifiedJulianDay(makeDate(2024, 1, modulo(doc_id, 28) + 1)) AS mjd "
        "FROM cf4_docs ORDER BY doc_id"
    )
    out = spark.sql(translate_clickhouse_sql(ch_sql))
    # array outputs ','-joined to scalar strings for the driver canon
    return out.select(
        *[
            _join_arr(c).alias(c) if c in ("grams3", "rot", "rsz") else c
            for c in out.columns
        ]
    )


def q_dialect_batch16(spark, d):
    """Dialect batch 16 end-to-end through the SQL endpoint: arrayFill/
    arrayReverseFill (fill from nearest predicate match), arraySplit
    boundary cuts, hasSubstr contiguous subsequence, stringJaccardIndex
    char-set similarity, multiSearchAllPositions per-needle instr,
    regexpQuoteMeta escaping, normalizeQuery literal scrubbing,
    UUIDNumToString byte formatting (over MD5 digests), -OrNull/-OrZero
    parse conversions, interval constructors + timestampAdd arithmetic,
    mid, URLPathHierarchy.  Oracle: DuckDB list comprehensions, CASE
    ladders hand-deriving the fill/split outputs, strpos, TRY_CAST, and
    interval arithmetic computing the same values."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "documents").createOrReplaceTempView("b16_docs")
    ch_sql = (
        "SELECT doc_id, "
        "arrayFill(x -> x != 0, "
        "[modulo(doc_id, 3), 0, modulo(doc_id, 5), 0]) AS af, "
        "arrayReverseFill(x -> x != 0, [0, modulo(doc_id, 3), 0]) AS arf, "
        "arraySplit(x -> x = 1, [1, modulo(doc_id, 2), 3, 1]) AS asp, "
        "hasSubstr([1, modulo(doc_id, 4), 3], [1, 2]) AS hs, "
        "round(stringJaccardIndex(lang, 'english'), 6) AS sj, "
        "multiSearchAllPositions(text, ['the', 'zzzqx']) AS msp, "
        "regexpQuoteMeta(substring(text, 1, 8)) AS qm, "
        "normalizeQuery(concat('SELECT ', toString(doc_id), "
        "' FROM t WHERE x = 5')) AS nq, "
        "UUIDNumToString(MD5(text)) AS um, "
        "toInt64OrNull(substring(text, 1, 2)) AS i64n, "
        "toFloat64OrZero(lang) AS f0, "
        "timestampAdd(DAY, modulo(doc_id, 28), "
        "toDateTime('2024-01-01 00:00:00')) AS tad, "
        "toDateTime('2024-01-01 00:00:00') "
        "+ toIntervalMonth(modulo(doc_id, 12)) AS tim, "
        "mid(text, 3, 5) AS md, "
        "URLPathHierarchy(concat('https://ex.com/a/', lang, '/b')) AS uph "
        "FROM b16_docs ORDER BY doc_id"
    )
    out = spark.sql(translate_clickhouse_sql(ch_sql))
    # array outputs serialized to scalar strings for the driver canon:
    # flat arrays ','-joined, the nested arraySplit result as compact JSON
    # (Spark to_json and DuckDB to_json agree byte-for-byte on int arrays)
    return out.select(
        *[
            F.to_json(F.col(c).cast("array<array<long>>")).alias(c)
            if c == "asp"
            else _join_arr(c).alias(c)
            if c in ("af", "arf", "msp", "uph")
            else c
            for c in out.columns
        ]
    )


def q_dialect_batch18(spark, d):
    """Dialect batch 18 end-to-end through the SQL endpoint: dateTrunc
    rename, toWeek mode-0 (Sunday-start 0-53 week numbering, derived
    arithmetically on both engines), ngramDistance/ngramSearch
    (DISTINCT-set 4-gram variants — CH counts multisets, documented),
    JSONLength (array length / object key count), toJSONString,
    timestamp_diff string-unit form.  Oracle: DuckDB date_trunc /
    dayofweek arithmetic / list-comprehension 4-grams / json_array_length
    + json_keys / to_json / datediff."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "documents").createOrReplaceTempView("b18_docs")
    ch_sql = (
        "SELECT doc_id, "
        "dateTrunc('month', makeDate(2024, modulo(doc_id, 12) + 1, "
        "modulo(doc_id, 28) + 1)) AS mt, "
        "toWeek(makeDate(2024, modulo(doc_id, 12) + 1, "
        "modulo(doc_id, 28) + 1)) AS wk, "
        "toYearWeek(makeDate(2024, modulo(doc_id, 12) + 1, "
        "modulo(doc_id, 28) + 1)) AS yw, "
        "round(ngramDistance(substring(text, 1, 12), "
        "substring(text, 3, 12)), 6) AS nd, "
        "round(ngramSearch(substring(text, 1, 60), 'there'), 6) AS ns, "
        "JSONLength(concat('[', toString(modulo(doc_id, 5)), ',2]')) AS jl, "
        "toJSONString([modulo(doc_id, 3), 7]) AS js, "
        "timestamp_diff('day', toDateTime('2024-01-01 00:00:00'), "
        "makeDate(2024, modulo(doc_id, 12) + 1, 15)) AS td "
        "FROM b18_docs ORDER BY doc_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_batch19(spark, d):
    """Dialect batch 19 end-to-end (row-level half): age complete-unit
    month/day diffs (add-months-clamp-exact), parseDateTime %-syntax,
    extractGroups (literal pattern, first match), arrayShiftLeft with
    default fill, simpleJSONHas, replaceRegexpOne (first-occurrence regex
    replace — DuckDB's regexp_replace default IS first-only, a native
    oracle), timeSlots period counting, toRelativeMonthNum,
    positiveModulo, widthBucket, arrayUnion.  Arrays scalarize via
    arrayStringConcat for the driver canonicalizer."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "documents").createOrReplaceTempView("b19_docs")
    ch_sql = (
        "SELECT doc_id, "
        "age('month', makeDate(2024, 1, 15), "
        "makeDate(2024, modulo(doc_id, 12) + 1, modulo(doc_id, 28) + 1)) "
        "AS agm, "
        "age('day', toDateTime('2024-03-15 00:00:00'), "
        "makeDate(2024, modulo(doc_id, 12) + 1, modulo(doc_id, 28) + 1)) "
        "AS agd, "
        "parseDateTime(concat('2024-0', toString(modulo(doc_id, 9) + 1), "
        "'-05 06:07:08'), '%Y-%m-%d %H:%M:%S') AS pd, "
        "arrayStringConcat(extractGroups(concat(toString(doc_id), '-abc'), "
        "'(\\\\d+)-(\\\\w+)'), ',') AS eg, "
        "arrayStringConcat(arrayMap(__x -> toString(__x), "
        "arrayShiftLeft([1, 2, modulo(doc_id, 5)], 1, 9)), '|') AS asl, "
        "simpleJSONHas(concat('{\"a', toString(modulo(doc_id, 3)), "
        "'\": 1}'), 'a1') AS sj, "
        "replaceRegexpOne(substring(text, 1, 40), '[aeiou]+', '_') AS rro, "
        "arrayCount(__x -> true, "
        "timeSlots(makeDateTime(2024, 3, 15, modulo(doc_id, 24), 0, 0), "
        "modulo(doc_id, 5) * 900)) AS tsn, "
        "toRelativeMonthNum(makeDate(2024, modulo(doc_id, 12) + 1, 1)) "
        "AS rmn, "
        "positiveModulo(doc_id - 50, 7) AS pm, "
        "widthBucket(toFloat64(modulo(n_chars, 100)), 0, 100, 7) AS wb, "
        "arrayStringConcat(arrayMap(__x -> toString(__x), "
        "arraySort(arrayUnion([modulo(doc_id, 3), 1], [2, 1]))), ',') AS au "
        "FROM b19_docs ORDER BY doc_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_batch19_aggs(spark, d):
    """Dialect batch 19 (aggregate half): skewSamp/kurtSamp — CH's
    sample-variance-normalized central moments m3/varSamp^1.5 and
    m4/varSamp², derived in the dialect from Spark's population forms by
    the (varPop/varSamp)^k correction.  Oracle: explicit moment
    arithmetic in DuckDB (its own skewness/kurtosis are the
    bias-corrected g-statistics, a DIFFERENT estimator family)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "documents").createOrReplaceTempView("b19a_docs")
    ch_sql = (
        "SELECT lang, count() AS n, "
        "round(skewSamp(n_chars), 6) AS sk, "
        "round(kurtSamp(n_chars), 6) AS ku "
        "FROM b19a_docs GROUP BY lang ORDER BY lang"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_batch20(spark, d):
    """Dialect batch 20 (scalar half, r6 doc-sweep continuation):
    mapApply entrywise map transform (CH tuple-lambda → struct via
    map_from_entries), isValidJSON / JSONType (VARIANT try_parse_json;
    type tag from the validated document head), addQuarters /
    subtractQuarters, YYYYMMDDToDate / YYYYMMDDhhmmssToDateTime numeric
    serial forms, caseWithExpression (function form of operator CASE),
    dateTime64ToSnowflake.  Map results scalarize as sorted 'k=v' joins
    for the driver canonicalizer."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "documents").createOrReplaceTempView("b20_docs")
    ch_sql = (
        "SELECT doc_id, "
        "concat('A=', toString(mapApply((k, v) -> (upper(k), v * 2), "
        "map('a', modulo(doc_id, 5), 'b', 7))['A']), ',B=', "
        "toString(mapApply((k, v) -> (upper(k), v * 2), "
        "map('a', modulo(doc_id, 5), 'b', 7))['B'])) AS ma, "
        "isValidJSON(concat('{\"x\": ', toString(doc_id), '}')) AS vj, "
        "isValidJSON(concat('{\"x\": ', toString(doc_id))) AS ivj, "
        "JSONType(concat('{\"x\": ', toString(doc_id), '}')) AS jto, "
        "JSONType(toString(modulo(doc_id, 7))) AS jti, "
        "JSONType(concat('\"', lang, '\"')) AS jts, "
        "addQuarters(makeDate(2024, 1, 15), modulo(doc_id, 8)) AS aq, "
        "subtractQuarters(makeDate(2024, 1, 15), modulo(doc_id, 8)) AS sq, "
        "YYYYMMDDToDate(20240100 + modulo(doc_id, 28) + 1) AS ymd, "
        "YYYYMMDDhhmmssToDateTime(20240115000000 + modulo(doc_id, 59)) "
        "AS ymdh, "
        "caseWithExpression(modulo(doc_id, 4), 0, 'zero', 1, 'one', 2, "
        "'two', 'many') AS cw, "
        "dateTime64ToSnowflake(makeDateTime(2024, 1, 15, 0, 0, "
        "modulo(doc_id, 60))) AS sf "
        "FROM b20_docs ORDER BY doc_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_batch20_aggs(spark, d):
    """Dialect batch 20 (aggregate half): ClickHouse's interval /
    time-series aggregates as windowFunnel-style codegen folds —
    exponentialMovingAverage (half-life-weighted mean over the t-sorted
    series), intervalLengthSum (union length of [t, t+600] segments),
    maxIntersections (±1 endpoint sweep, ends before starts at ties),
    deltaSumTimestamp (positive deltas of t-ordered values).  Oracle:
    DuckDB window equivalents — the EMA via its order-independent closed
    form Σv·2^(-(tmax-t)/hl) / Σ2^(-(tmax-t)/hl), the union length via
    gaps-and-islands, the sweep via a running ±1 sum."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("b20_ev")
    ch_sql = (
        "SELECT user_id, "
        "round(exponentialMovingAverage(3600)(value, toUnixTimestamp(ts)), "
        "6) AS ema, "
        "round(intervalLengthSum(toUnixTimestamp(ts), "
        "toUnixTimestamp(ts) + 600), 1) AS ils, "
        "maxIntersections(toUnixTimestamp(ts), toUnixTimestamp(ts) + 600) "
        "AS mi, "
        "round(deltaSumTimestamp(value, toUnixTimestamp(ts)), 6) AS ds "
        "FROM b20_ev GROUP BY user_id ORDER BY user_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_modifiers(spark, d):
    """ClickHouse SELECT-list column modifiers end-to-end
    (dialect.py::_expand_select_modifiers): ``COLUMNS('re')`` regex base
    + ``APPLY(fn)`` wrapping with CH result naming (``sum(col)``), and
    ``* REPLACE`` positional substitution — the chain expands
    against the analysis-probed FROM schema.  Oracle: DuckDB with the
    expansion written out by hand (same quoted result names)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "orders").createOrReplaceTempView("mod_orders")
    _t(spark, d, "region").createOrReplaceTempView("mod_region")
    a = spark.sql(
        translate_clickhouse_sql(
            "SELECT o_orderpriority, "
            "COLUMNS('totalprice|custkey') "
            # inner round at 3 decimals = the true precision of a
            # 2-decimal price x 0.9 (a .xx5 boundary at 2 would split
            # engines); the outer sum rounds at 2 with 5e-3 margin
            "REPLACE(round(o_totalprice * 0.9, 3) AS o_totalprice) "
            "APPLY(sum) "
            "FROM mod_orders GROUP BY o_orderpriority "
            "ORDER BY o_orderpriority",
            spark=spark,
        )
    ).select(
        "o_orderpriority",
        F.round(F.col("`sum(o_totalprice)`"), 2).alias("sum_totalprice"),
        F.col("`sum(o_custkey)`").alias("sum_custkey"),
    )
    b = spark.sql(
        translate_clickhouse_sql(
            "SELECT * REPLACE(upper(r_name) AS r_name) "
            "FROM mod_region ORDER BY r_regionkey",
            spark=spark,
        )
    )
    return a.join(
        b.select(
            F.col("r_regionkey").alias("o_orderpriority_rk"),
            "r_name",
        ),
        F.expr("CAST(substring(o_orderpriority, 1, 1) AS INT) - 1")
        == F.col("o_orderpriority_rk"),
        "left",
    ).select(
        "o_orderpriority", "sum_totalprice", "sum_custkey", "r_name"
    ).orderBy("o_orderpriority")


def q_dialect_batch21(spark, d):
    """Dialect batch 21 (scalar half): bar (full-block ASCII chart),
    space, parseTimeDelta (unit-suffixed duration → seconds),
    formatReadableTimeDelta (CH's '2 hours, 8 minutes' rendering), and
    joinGet over a registered ENGINE=Join table (same derived-table
    scalar-subquery shape as dictGet — Catalyst decorrelates to a
    broadcastable join; missing keys → NULL, the house default
    encoding).  Oracle: DuckDB repeat/regexp list fold/concat_ws and a
    correlated subquery."""
    from clickhouse_flatfile_tool_spark.dialect import (
        register_join_table,
        translate_clickhouse_sql,
    )

    _t(spark, d, "documents").createOrReplaceTempView("b21_docs")
    _t(spark, d, "nation").select(
        "n_nationkey", "n_name"
    ).createOrReplaceTempView("b21_jt")
    register_join_table("b21_jt", "b21_jt", "n_nationkey")
    ch_sql = (
        "SELECT doc_id, "
        "bar(modulo(doc_id, 11), 0, 10, 10) AS br, "
        "length(space(modulo(doc_id, 5))) AS sp, "
        "round(parseTimeDelta(concat(toString(modulo(doc_id, 4)), 'h ', "
        "toString(modulo(doc_id, 60)), 'm')), 1) AS ptd, "
        "formatReadableTimeDelta(modulo(doc_id * 433, 200000)) AS frt, "
        "joinGet('b21_jt', 'n_name', modulo(doc_id, 30)) AS jg "
        "FROM b21_docs ORDER BY doc_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_batch21_aggs(spark, d):
    """Dialect batch 21 (aggregate half): the conditional-combinator
    extensions — curried quantileIf/quantilesIf, medianIf,
    groupUniqArrayIf (CASE-NULL composition; percentile and
    collect_list both ignore NULLs).  Oracle: DuckDB FILTER clauses +
    quantile_cont (same linear interpolation as Spark percentile)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("b21_ev")
    ch_sql = (
        "SELECT event_type, "
        "round(quantileIf(0.5)(value, value > 10), 6) AS q50_hi, "
        "round(medianIf(value, value <= 10), 6) AS med_lo, "
        "round(arraySum(quantilesIf(0.25, 0.75)(value, value > 0)), 6) "
        "AS iqr_sum, "
        "arrayStringConcat(arrayMap(__x -> toString(__x), "
        "arraySort(groupUniqArrayIf(toInt64(value), value < 3))), ',') "
        "AS low_vals "
        "FROM b21_ev GROUP BY event_type ORDER BY event_type"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_batch22(spark, d):
    """Dialect batch 22 (scalar half — the coverage-report closure,
    DIALECT_COVERAGE.md top-uncovered): multiMatchAny/AnyIndex,
    multiSearchFirstIndex, JSONExtractArrayRaw/JSONExtractUInt/
    JSONArrayLength, xor, timeDiff, sigmoid, firstLine,
    appendTrailingCharIfAbsent, add/toMilliseconds, toStartOfISOYear,
    toUInt32OrZero/toDateOrZero, toDecimal64OrNull,
    parseDateTimeBestEffortOrNull, extractAllGroupsHorizontal,
    mapSort/mapReverseSort/mapConcat.  Oracle: DuckDB regexp/json/date
    equivalents and closed forms of the constructed fixtures."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "documents").createOrReplaceTempView("b22_docs")
    ch_sql = (
        "SELECT doc_id, "
        "multiMatchAny(lang, ['^e', 'n$']) AS mma, "
        "multiMatchAnyIndex(lang, ['^e', 'n$']) AS mmi, "
        "multiSearchFirstIndex(text, ['vector', 'join']) AS msf, "
        "arrayStringConcat(JSONExtractArrayRaw(concat('[', "
        "  toString(modulo(doc_id, 7)), ',', toString(modulo(doc_id * 3, 5)), "
        "  ']')), '|') AS jar, "
        "JSONExtractUInt(concat('{\"n\":', toString(modulo(doc_id, 100)), '}'), "
        "  'n') AS jeu, "
        "JSONArrayLength(concat('[', toString(doc_id), ',2,3]')) AS jal, "
        "xor(modulo(doc_id, 2) = 0, modulo(doc_id, 3) = 0) AS xr, "
        "timeDiff(toDateTime('2024-01-01 00:00:00'), "
        "  addSeconds(toDateTime('2024-01-01 00:00:00'), modulo(doc_id, 500))) "
        "  AS td, "
        "round(sigmoid(modulo(doc_id, 9) - 4), 6) AS sg, "
        "firstLine(concat(lang, '\\n', text)) AS fl, "
        "appendTrailingCharIfAbsent(lang, 'n') AS atc, "
        "toMillisecond(addMilliseconds(toDateTime('2024-01-01 00:00:00'), "
        "  modulo(doc_id, 1000))) AS ms, "
        "toStartOfISOYear(addDays(toDate('2020-01-01'), modulo(doc_id, 800))) "
        "  AS isy, "
        "toUInt32OrZero(substring(text, 1, 2)) AS u0, "
        "toUInt32OrZero(toString(modulo(doc_id, 50))) AS u1, "
        "toDateOrZero(substring(text, 1, 4)) AS d0, "
        "toFloat64(toDecimal64OrNull(concat(toString(modulo(doc_id, 90)), "
        "  '.25'), 2)) AS dec2, "
        "parseDateTimeBestEffortOrNull(concat('2024-01-1', "
        "  toString(modulo(doc_id, 9)))) AS pdt, "
        "arrayStringConcat(arrayMap(__g -> arrayStringConcat(__g, ','), "
        "  extractAllGroupsHorizontal(substring(text, 1, 60), '(th)(e)')), '|') "
        "  AS eag, "
        "arrayStringConcat(mapKeys(mapSort(mapConcat("
        "  map(concat('b', toString(modulo(doc_id, 3))), 1), "
        "  map(concat('a', toString(modulo(doc_id, 5))), 2)))), ',') AS msk, "
        "arrayStringConcat(mapKeys(mapReverseSort("
        "  map(concat('b', toString(modulo(doc_id, 3))), 1, "
        "      concat('a', toString(modulo(doc_id, 5))), 2))), ',') AS mrk "
        "FROM b22_docs ORDER BY doc_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_batch23(spark, d):
    """Dialect batch 23 (scalar half — second coverage-closure pass):
    mapUpdate (m2-wins collision policy), isNotDistinctFrom,
    multiSearchAllPositions/FirstPosition, LpNorm/normalizeL2,
    JSONExtractKeysAndValuesRaw, toUUIDOrNull, URL tails
    (cutQueryStringAndFragment, extractURLParameters/Names,
    encode/decodeURLFormComponent).  Oracle: DuckDB position/regexp
    equivalents and closed forms of the constructed fixtures.  The
    random generators (rand32/64, randBernoulli/Exponential/LogNormal)
    are engine-random — pytest range checks, excluded here."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "documents").createOrReplaceTempView("b23_docs")
    ch_sql = (
        "SELECT doc_id, "
        "arrayStringConcat(arrayMap(__x -> toString(__x), mapValues("
        "  mapUpdate(map('a', 1, 'b', toInt64(modulo(doc_id, 5))), "
        "            map('b', toInt64(modulo(doc_id, 7)))))), ',') AS mu, "
        "isNotDistinctFrom(nullIf(modulo(doc_id, 3), 0), "
        "  nullIf(modulo(doc_id, 5), 0)) AS ind, "
        "arrayStringConcat(arrayMap(__x -> toString(__x), "
        "  multiSearchAllPositions(text, ['the', 'join'])), ',') AS msa, "
        "multiSearchFirstPosition(text, ['zebra', 'join']) AS msf, "
        "round(LpNorm([1.0, toFloat64(modulo(doc_id, 4)), 2.0], 3), 6) AS lp3, "
        "round(arrayElement(normalizeL2([3.0, "
        "  toFloat64(modulo(doc_id, 5) + 1)]), 2), 6) AS nl2, "
        "arrayStringConcat(arrayMap(__p -> concat(tupleElement(__p, 1), '=', "
        "  tupleElement(__p, 2)), JSONExtractKeysAndValuesRaw(concat('{\"a\":', "
        "  toString(modulo(doc_id, 9)), ',\"b\":2}'))), '|') AS kvr, "
        "toUUIDOrNull(if(modulo(doc_id, 2) = 0, "
        "  '123e4567-e89b-12d3-a456-426614174000', 'bad')) AS uid, "
        "cutQueryStringAndFragment(concat('http://ex.com/p', "
        "  toString(doc_id), '?q=1#z')) AS cut, "
        "arrayStringConcat(extractURLParameters(concat('http://ex.com/p?a=', "
        "  toString(modulo(doc_id, 3)), '&b=2')), '|') AS ups, "
        "arrayStringConcat(extractURLParameterNames("
        "  'http://ex.com/p?a=1&b=2'), '|') AS upn, "
        "encodeURLFormComponent(concat('v ', toString(modulo(doc_id, 4)))) "
        "  AS efc, "
        "decodeURLFormComponent('x+y%21z') AS dfc "
        "FROM b23_docs ORDER BY doc_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_batch23_aggs(spark, d):
    """Dialect batch 23 (aggregate half): studentTTest/welchTTest
    (two-sample t statistics from pure sums — the meanZTest
    statistic-only stance), sumMapFiltered (key-filtered metric-map
    aggregation), maxIntersectionsPosition (argmax of the ±1 endpoint
    sweep — first position where peak occupancy is reached).  Oracle:
    DuckDB FILTER aggregates for the t statistics, closed-form key sums,
    and an overlap-count replay for the sweep position."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("b23_ev")
    ch_sql = (
        "SELECT event_type, "
        "round(studentTTest(value, modulo(user_id, 2)), 6) AS st, "
        "round(welchTTest(value, modulo(user_id, 2)), 6) AS wt, "
        "round(arrayElement(tupleElement(sumMapFiltered([1, 3])("
        "  [1, 2, 3], [round(value, 2), 1.0, 2.0]), 2), 1), 4) AS sk1, "
        "round(arrayElement(tupleElement(sumMapFiltered([1, 3])("
        "  [1, 2, 3], [round(value, 2), 1.0, 2.0]), 2), 2), 4) AS sk3, "
        "round(maxIntersectionsPosition(value, value + 10), 2) AS mip "
        "FROM b23_ev GROUP BY event_type ORDER BY event_type"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_batch23_window(spark, d):
    """Dialect batch 23 (window half): nonNegativeDerivative — the
    counter-rate window function (per-second positive delta, NULL on
    each partition's first row, negative deltas clamped to 0; DateTime
    second resolution, matching CH's DateTime semantics).  Oracle:
    DuckDB lag replay over the same (event_type, ts, event_id) order."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("b23w_ev")
    ch_sql = (
        # floor(x * 1e6) instead of round(x, 6): the compared value is a
        # d/t rational that lands EXACTLY on .xxxxx5 round ties (2-decimal
        # deltas over integer seconds), where Spark's BigDecimal HALF_UP
        # and DuckDB's double-scaling round disagree; floor of the product
        # is pure IEEE double ops — bit-identical on both engines
        "SELECT event_id, "
        "toInt64(floor(nonNegativeDerivative(value, ts) "
        "OVER (PARTITION BY event_type ORDER BY ts, event_id) * 1000000)) "
        "  AS nnd "
        "FROM b23w_ev ORDER BY event_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_batch25(spark, d):
    """Dialect batch 25 (coverage tail): comparison function-call forms,
    byteSwap (64-bit byte reversal), timezoneOffset (0 under the
    fixed-UTC session), toRelativeWeekNum (Monday-aligned epoch weeks),
    multiplyDecimal, toInt128 wide lane, formatReadableDecimalSize,
    hasTokenOrNull, visibleWidth.  Fixture values are chosen so the
    %.2f rendering never lands on a rounding tie (Java HALF_UP vs C
    printf half-even) and byteSwap stays in the positive BIGINT range.
    Oracle: DuckDB closed forms / printf."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "documents").createOrReplaceTempView("b25_docs")
    ch_sql = (
        "SELECT doc_id, "
        "equals(modulo(doc_id, 3), modulo(doc_id, 5)) AS eq, "
        "greaterOrEquals(modulo(doc_id, 7), 3) AS ge, "
        "byteSwap(modulo(doc_id, 128)) AS bs, "
        "timezoneOffset(toDateTime('2024-06-01 00:00:00')) AS tzo, "
        "toRelativeWeekNum(addDays(toDate('2020-01-01'), "
        "  modulo(doc_id, 400))) AS rwn, "
        "toFloat64(multiplyDecimal(toDecimal64(concat(toString("
        "  modulo(doc_id, 50)), '.25'), 2), toDecimal64('2.00', 2))) AS md, "
        "toString(toInt128(toString(doc_id * 1000000007))) AS i128, "
        "formatReadableDecimalSize(modulo(doc_id, 800) * 1234) AS frd, "
        "hasTokenOrNull(text, 'the') AS ht, "
        "hasTokenOrNull(text, 'a b') AS htn, "
        "visibleWidth(doc_id * 37) AS vw "
        "FROM b25_docs ORDER BY doc_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_batch24(spark, d):
    """Dialect batch 24 — the -State/-Merge/-ForEach/-OrDefault/
    -Resample combinator families, exercised in the REAL two-phase
    shape: the inner query builds per-(type, user) partial states
    (sumState/countState/avgState/quantileState), the outer MERGES them
    per type — exactly ClickHouse's AggregatingMergeTree read path.
    Plus sumForEach (element-wise array sums), sumOrDefault (empty
    state → type default), sumResample (literal-bucket array
    aggregates), sumArgMin/ArgMax, groupArrayInsertAt (slot scatter;
    slot value derived from the position so duplicate writers agree),
    arrayLastIndex.  avgMerge is compared as floor(x*1e6) — S/n
    rationals hit exact round-ties (the batch23_window lesson).
    Oracle: DuckDB single-phase aggregates (merge of partial states ==
    the direct aggregate, which is the semantic claim) + FILTER sums."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("b24_ev")
    ch_sql = (
        "WITH st AS (SELECT event_type, "
        "  round(sumMerge(ps), 4) AS sm, "
        "  countMerge(cs) AS cm, "
        "  toInt64(floor(avgMerge(avs) * 1000000)) AS am, "
        "  round(quantileMerge(0.5)(qs), 4) AS qm "
        "  FROM (SELECT event_type, user_id, "
        "    sumState(round(value, 2)) AS ps, countState(value) AS cs, "
        "    avgState(round(value, 2)) AS avs, "
        "    quantileState(round(value, 2)) AS qs "
        "    FROM b24_ev GROUP BY event_type, user_id) "
        "  GROUP BY event_type), "
        "raw AS (SELECT event_type, "
        "  round(arrayElement(sumForEach([round(value, 2), 1.0]), 1), 4) "
        "    AS fe1, "
        "  round(arrayElement(sumForEach([round(value, 2), 1.0]), 2), 4) "
        "    AS fe2, "
        "  sumOrDefault(CASE WHEN value < 0 THEN value END) AS sod, "
        "  round(arrayElement(sumResample(0, 500, 100)(round(value, 2), "
        "    value), 1), 4) AS rs1, "
        "  round(arrayElement(sumResample(0, 500, 100)(round(value, 2), "
        "    value), 5), 4) AS rs5, "
        "  round(sumArgMin(round(value, 2), modulo(user_id, 10)), 4) AS sam, "
        "  round(sumArgMax(round(value, 2), modulo(user_id, 10)), 4) AS sax, "
        "  arrayStringConcat(arrayMap(__x -> toString(__x), "
        "    groupArrayInsertAt(toInt64(-1), 5)(toInt64(value) % 5 * 10, "
        "    toInt64(value) % 5)), ',') AS gia, "
        "  arrayLastIndex(__x -> __x > 1, [1, toInt64(min(value)), 2, 0]) "
        "    AS ali "
        "  FROM b24_ev GROUP BY event_type) "
        "SELECT st.event_type AS event_type, sm, cm, am, qm, fe1, fe2, "
        "sod, rs1, rs5, sam, sax, gia, ali "
        "FROM st JOIN raw ON st.event_type = raw.event_type "
        "ORDER BY event_type"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_batch22_aggs(spark, d):
    """Dialect batch 22 (aggregate half): corrMatrix / covarSampMatrix
    (explicit n×n pairwise built-in aggregates) and groupArrayLast
    (last-n slice of collect_list; the per-doc arrayJoin fixture emits
    each group's rows adjacently in one task, so collection order is
    the emission order — deterministic, the groupArray caveat
    documented in dialect.py).  Oracle: DuckDB corr/covar_samp and the
    closed-form last-3 of the constructed per-doc array."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("b22_ev")
    _t(spark, d, "documents").createOrReplaceTempView("b22a_docs")
    mat = spark.sql(
        translate_clickhouse_sql(
            "SELECT event_type, "
            "round(arrayElement(arrayElement(corrMatrix(value, "
            "  toFloat64(modulo(user_id, 7))), 1), 2), 6) AS cor12, "
            "round(arrayElement(arrayElement(corrMatrix(value, "
            "  toFloat64(modulo(user_id, 7))), 1), 1), 6) AS cor11, "
            "round(arrayElement(arrayElement(covarSampMatrix(value, "
            "  toFloat64(modulo(user_id, 7))), 2), 1), 6) AS cov21, "
            "round(arrayElement(arrayElement(covarSampMatrix(value, "
            "  toFloat64(modulo(user_id, 7))), 2), 2), 6) AS cov22 "
            "FROM b22_ev GROUP BY event_type"
        )
    )
    # groupArrayLast with n >= the group size (slice no-op) + arraySort:
    # Spark's collection order is partition/buffer-dependent (like
    # groupArray/collect_list — measured: even a single-task group came
    # back rotated), so the hash-checkable driver form proves the rewrite
    # plumbing and the exact last-n slice semantics live in pytest over
    # literal arrays (tests/test_dialect.py::test_batch22_group_array_last)
    last = spark.sql(
        translate_clickhouse_sql(
            "SELECT doc_id, arrayStringConcat(arrayMap(__x -> toString(__x), "
            "arraySort(groupArrayLast(7)(v))), ',') AS last3 FROM "
            "(SELECT doc_id, arrayJoin([modulo(doc_id, 10), "
            "  modulo(doc_id, 7), modulo(doc_id, 5), modulo(doc_id, 3), "
            "  modulo(doc_id, 2)]) AS v FROM b22a_docs) "
            "GROUP BY doc_id"
        )
    )
    return _b22_aggs_join(mat, last)


def _b22_aggs_join(mat, last):
    """Stitch the two aggregate halves into one result frame: the matrix
    half is keyed by event_type (a handful of rows), the last-n half by
    doc_id — disjoint keys, so a tagged union keeps every column in its
    native type (doubles stay DOUBLE: string-rendering floats diverges
    between engines on scientific-notation thresholds)."""
    m = mat.select(
        F.lit("mat").alias("part"),
        F.col("event_type").alias("k"),
        "cor11", "cor12", "cov21", "cov22",
        F.lit(None).cast("string").alias("last3"),
    )
    l = last.select(
        F.lit("last").alias("part"),
        F.col("doc_id").cast("string").alias("k"),
        F.lit(None).cast("double").alias("cor11"),
        F.lit(None).cast("double").alias("cor12"),
        F.lit(None).cast("double").alias("cov21"),
        F.lit(None).cast("double").alias("cov22"),
        "last3",
    )
    return m.union(l).orderBy("part", "k")


def q_dialect_clauses(spark, d):
    """Session-5 SQL clauses end-to-end: scalar WITH (the constant
    feeds the QUALIFY bound) + QUALIFY over a window on aggregated
    output rows — top-10 customers by spend with rank.  Oracle: DuckDB's
    NATIVE QUALIFY machinery over the same aggregation (independent of
    the subquery-wrapping rewrite)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "orders").createOrReplaceTempView("cls_orders")
    ch_sql = (
        "WITH 10 AS topn "
        "SELECT o_custkey, count() AS n, "
        "row_number() OVER (ORDER BY sum(o_totalprice) DESC, o_custkey) "
        "AS rk "
        "FROM cls_orders GROUP BY o_custkey "
        "QUALIFY rk <= topn ORDER BY rk"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql, spark=spark))


def q_distinct_on(spark, d):
    """``SELECT DISTINCT ON (keys)`` through the dialect
    (dialect.py::_rewrite_distinct_on): the earliest order per
    (o_orderstatus, o_orderpriority) cell — first row per key in the
    statement's ORDER BY order.  Oracle: DuckDB's NATIVE Postgres-style
    DISTINCT ON (independent of the row_number rewrite)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "orders").createOrReplaceTempView("don_orders")
    ch_sql = (
        "SELECT DISTINCT ON (o_orderstatus, o_orderpriority) "
        "o_orderstatus, o_orderpriority, o_orderkey, o_orderdate "
        "FROM don_orders "
        "ORDER BY o_orderstatus, o_orderpriority, o_orderdate, o_orderkey"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql, spark=spark))


def q_knn_accuracy(spark, d):
    """Leave-one-out 1-NN label accuracy — the standard embedding-quality
    probe (does nearest-neighbor structure respect labels?): each
    vector's single nearest neighbor (exact cosine, self excluded,
    deterministic cos-DESC/id-ASC tie rule) votes its label; per-label
    accuracy = fraction of agreeing votes.  Built from
    similarity.knn_label_accuracy (cosine_topk_fast(k=1) under the hood —
    the Arrow GEMM path, identical rows to the codegen fold) + two label
    joins + one grouped avg.  The operator is a bounded-SAMPLE probe
    (max_probe raise; at corpus scale the probe is a sample or the exact
    pass swaps to ANN — the fixture fits whole).  Oracle: the
    _COSINE_ORACLE pairwise construction at rk = 1 with the same tie
    rule."""
    emb = _t(spark, d, "embeddings")
    return similarity.knn_label_accuracy(emb, "label", k=1)


def q_semantic_decon(spark, d):
    """Embedding-space decontamination
    (similarity.py::semantic_decontaminate): every 10th embedding plays
    the benchmark, the rest are the corpus; a document is contaminated
    when its MAX cosine against any benchmark vector reaches 0.9.  Plan:
    broadcast(benchmark) x corpus, map-side max — the corpus never
    shuffles.  Oracle: DuckDB cross join + unnest cosine + per-id max
    (the _COSINE_ORACLE construction)."""
    emb = _t(spark, d, "embeddings")
    bench = emb.filter(F.col("vec_id") % 10 == 0)
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    out = similarity.semantic_decontaminate(corpus, bench, threshold=0.9)
    return out.orderBy("vec_id")


def q_dialect_batch17(spark, d):
    """Dialect batch 17 end-to-end: significant-subdomain rule
    (com|net|org|co → third-level label), netloc/basename/
    queryStringAndFragment, %20-exact URL component encoding, ISO year,
    days-since-year-zero (proleptic year 0 = leap), Twitter-snowflake
    round-trip, Euclid-fold gcd/lcm.  Oracle: DuckDB string assembly of
    the same URL parts, isoyear(), datediff from 0001-01-01 + 366, bit
    arithmetic, and its NATIVE gcd/lcm builtins (independent of the
    fold)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "documents").createOrReplaceTempView("b17_docs")
    ch_sql = (
        "SELECT doc_id, "
        "firstSignificantSubdomain(concat('https://news.', lang, "
        "'.com.tr/a/p', toString(doc_id), '?q=1#f')) AS fsd, "
        "cutToFirstSignificantSubdomain(concat('https://news.', lang, "
        "'.com.tr/a/p', toString(doc_id))) AS ctf, "
        "netloc(concat('https://news.', lang, '.com.tr/a/p', "
        "toString(doc_id))) AS nl, "
        "basename(concat('/a/b/p', toString(doc_id))) AS bn, "
        "queryStringAndFragment(concat('https://x.com/p?q=', "
        "toString(doc_id), '#f')) AS qsf, "
        "encodeURLComponent(concat(lang, ' ', lang)) AS enc, "
        "decodeURLComponent(concat(lang, '%20', toString(doc_id))) AS dec, "
        "toISOYear(makeDate(2017, 1, modulo(doc_id, 7) + 1)) AS iy, "
        "toDaysSinceYearZero(makeDate(1970, 1, modulo(doc_id, 28) + 1)) AS dz, "
        "snowflakeToDateTime((doc_id + 345) * 4194304) AS sdt, "
        "dateTimeToSnowflake(snowflakeToDateTime((doc_id + 345) "
        "* 4194304)) AS sf, "
        "gcd(modulo(doc_id, 48), 36) AS g, "
        "lcm(modulo(doc_id, 7) + 1, 6) AS l "
        "FROM b17_docs ORDER BY doc_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_geo(spark, d):
    """Geo dialect functions end-to-end: geohashEncode→geohashDecode
    round-trip (any bit error would shift the recovered cell center, so
    comparing the center's INTEGER bit index proves the encode),
    pointInPolygon ray casting, greatCircleAngle haversine.  Oracle:
    DuckDB derives the cell-center bit indices CLOSED-FORM (floor-scaled
    coordinates, no geohash code at all), tests the box point-in-polygon
    DIRECTLY from the bounds (independent of ray casting), and computes
    the haversine in its own trig.  Coordinates synthesize .25-offset
    grids from doc_id, so no point ever lands on a polygon edge or a
    vertex latitude."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "documents").createOrReplaceTempView("geo_docs")
    ch_sql = (
        "SELECT doc_id, "
        "CAST(round((tupleElement(geohashDecode(geohashEncode(lon, lat, 9)"
        "), 1) + 180.0) / 360.0 * 8388608 - 0.5) AS Int64) AS flon, "
        "CAST(round((tupleElement(geohashDecode(geohashEncode(lon, lat, 9)"
        "), 2) + 90.0) / 180.0 * 4194304 - 0.5) AS Int64) AS flat, "
        "pointInPolygon((lon, lat), "
        "[(-90, -45), (90, -45), (90, 45), (-90, 45)]) AS inside, "
        "round(greatCircleAngle(0.0, 0.0, lon, lat), 6) AS ang "
        "FROM (SELECT doc_id, "
        "modulo(doc_id, 360) - 180 + 0.25 AS lon, "
        "modulo(doc_id, 180) - 90 + 0.25 AS lat FROM geo_docs) "
        "ORDER BY doc_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_ips(spark, d):
    """Dialect batch 14 end-to-end through the SQL endpoint: IP validity
    predicates (strict octets / ::-compressed hex), IPv4 CIDR ranges via
    the positional tuple, bitHammingDistance, the bucket-floor round
    family (roundToExp2/roundDown/roundAge/roundDuration), intExp10,
    replaceOne, UTF-8 validity.  Oracle: DuckDB regexp_matches + integer
    shift math + CASE ladders computing the same values."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "documents").createOrReplaceTempView("cf5_docs")
    ch_sql = (
        "SELECT doc_id, "
        "isIPv4String(concat(toString(modulo(doc_id * 7, 300)), '.0.', "
        " toString(modulo(doc_id, 256)), '.1')) AS ok4, "
        "isIPv6String(concat('2001:db8::', "
        " toString(modulo(doc_id, 99999)))) AS ok6, "
        "IPv4NumToString(modulo(doc_id * 9973, 4294967296)) AS ip, "
        "tupleElement(IPv4CIDRToRange(modulo(doc_id * 9973, 4294967296), "
        " modulo(doc_id, 25) + 8), 1) AS cidr_lo, "
        "tupleElement(IPv4CIDRToRange(modulo(doc_id * 9973, 4294967296), "
        " modulo(doc_id, 25) + 8), 2) AS cidr_hi, "
        "bitHammingDistance(doc_id, n_chars) AS hd, "
        "roundToExp2(n_chars) AS r2, "
        "roundDown(modulo(doc_id, 40), [1, 5, 10, 30]) AS rdn, "
        "roundAge(modulo(doc_id, 90)) AS ra, "
        "roundDuration(modulo(doc_id * 3, 40000)) AS rdur, "
        "intExp10(modulo(doc_id, 8)) AS i10, "
        "replaceOne(lang, 'e', 'E') AS rpl, "
        "isValidUTF8(text) AS vu "
        "FROM cf5_docs ORDER BY doc_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_aggs2(spark, d):
    """Batch-9 aggregate forms through the SQL endpoint: sumCount
    positional tuple via tupleElement, boundingRatio (slope between the
    min-x and max-x points — x is the unique event_id so the endpoints
    are deterministic), argMaxIf/argMinIf dual-CASE combinators.
    Oracle: DuckDB arg_max/arg_min with FILTER."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("da2_events")
    ch_sql = (
        "SELECT event_type, "
        "round(tupleElement(sumCount(value), 1), 6) AS sum_v, "
        "tupleElement(sumCount(value), 2) AS cnt_v, "
        "round(boundingRatio(toFloat64(event_id), value), 6) AS br, "
        "argMaxIf(user_id, event_id, value > 2) AS amx, "
        "argMinIf(user_id, event_id, value > 2) AS amn "
        "FROM da2_events GROUP BY event_type ORDER BY event_type"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_dates2(spark, d):
    """Batch-7 time bucketing through the SQL endpoint: five/fifteen-
    minute and half-hour (timeSlot) epoch-aligned buckets, hours/days
    since epoch (toRelative*Num), millisecond epoch.  Bucket columns are
    emitted as epoch seconds (BIGINT) to keep the comparison timezone-
    free; Spark unix_timestamp and DuckDB epoch_us // 1000000 both
    TRUNCATE sub-seconds (the ::BIGINT cast would round)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("dd2_events")
    ch_sql = (
        "SELECT event_id, "
        "toUnixTimestamp(toStartOfFiveMinutes(ts)) AS b5, "
        "toUnixTimestamp(toStartOfFifteenMinutes(ts)) AS b15, "
        "toUnixTimestamp(timeSlot(ts)) AS slot, "
        "toRelativeHourNum(ts) AS rh, "
        "toRelativeDayNum(ts) AS rd, "
        "toUnixTimestamp64Milli(ts) AS ms "
        "FROM dd2_events ORDER BY event_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_value_entropy(spark, d):
    """ClickHouse ``entropy(x)`` aggregate (relational.py::value_entropy):
    Shannon entropy in bits of each event type's user distribution —
    the distribution-health probe behind CCNet-style corpus monitoring.
    Oracle: DuckDB's native entropy() (log2-based, same definition)."""
    ev = _t(spark, d, "events")
    return relational.value_entropy(
        ev, ["event_type"], "user_id"
    ).orderBy("event_type")


def q_corr_matrix(spark, d):
    """ClickHouse ``corrMatrix(x1..xn)`` (relational.py::corr_matrix):
    all pairwise Pearson correlations of the lineitem measures in one
    aggregation pass, long form.  Oracle: DuckDB corr() per pair via
    UNION ALL."""
    li = _t(spark, d, "lineitem")
    return relational.corr_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount"]
    ).orderBy("col_a", "col_b")


def q_margin_pairs(spark, d):
    """Ratio-margin pair mining (similarity.py::margin_mined_pairs — the
    full Artetxe & Schwenk criterion): mutual top-1 pairs scored by
    cos / mean(the two neighborhood top-4 averages).  Oracle: DuckDB windows —
    rank on unrounded cosine, average the ROUNDED top-4 values exactly
    as cosine_topk emits them."""
    emb = _t(spark, d, "embeddings")
    left = emb.filter(F.col("vec_id") % 2 == 0)
    right = emb.filter(F.col("vec_id") % 2 == 1)
    return similarity.margin_mined_pairs(left, right, margin_k=4).orderBy(
        "left_id"
    )


def q_winnow(spark, d):
    """Winnowing fingerprints (dedup.py::winnow_fingerprints — Schleimer
    et al. 2003, the MOSS local-overlap detector): per-doc count and
    lexicographic extremes of the selected k-gram window minima, k=8 w=8
    (guarantee: shared substrings ≥ 15 chars share a fingerprint).
    Oracle: DuckDB list comprehensions computing the identical md5
    window-min definition.  The candidate-pair stage reuses the
    oracle-proven _bucket_pairs shape (minhash/simhash precedent); the
    fixture's small vocabulary makes its pair graph near-complete, so the
    driver row proves the fingerprint algorithm, not the pairing."""
    fps = dedup.winnow_fingerprints(
        _t(spark, d, "documents"), k=8, w=8
    )
    return fps.select(
        "doc_id",
        F.size("fps").alias("n_fps"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    ).orderBy("doc_id")


def q_winnow_fast(spark, d):
    """Bench-only production twin of ``winnow`` (not in the registry —
    the md5 entry is the oracle path, this is the xxhash64 fast path the
    minhash fast/portable split established): same k/w, 8-byte long
    fingerprints instead of md5 hex strings."""
    fps = dedup.winnow_fingerprints(
        _t(spark, d, "documents"), k=8, w=8, hash_fn="xx"
    )
    return fps.select(
        "doc_id",
        F.size("fps").alias("n_fps"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


def q_sparkbar(spark, d):
    """ClickHouse ``sparkbar(8)(x, y)`` (events.py::sparkbar): per event
    type, the unicode bar string of hourly value sums — the CH dashboard
    one-liner.  Oracle: DuckDB mirrors the documented bucket/level
    definition verbatim (chr() glyphs, ratio rounded to 9 decimals
    before ceil so per-engine sum-order ulps can't flip a boundary)."""
    ev = _t(spark, d, "events").select(
        "event_type",
        F.hour("ts").cast("double").alias("x"),
        "value",
    )
    return events.sparkbar(ev, ["event_type"], "x", "value").orderBy(
        "event_type"
    )


def q_mutual_nn(spark, d):
    """Mutual nearest-neighbor pair mining (similarity.py::mutual_nn_pairs
    — the Artetxe & Schwenk bitext-mining criterion, mutual top-1 cosine):
    embeddings split into even/odd vec_id halves standing in for the two
    languages; a pair survives iff each side is the other's nearest.
    Oracle: DuckDB cross join + both-direction row_number ranking with the
    same (cos DESC, id ASC) tiebreak."""
    emb = _t(spark, d, "embeddings")
    left = emb.filter(F.col("vec_id") % 2 == 0)
    right = emb.filter(F.col("vec_id") % 2 == 1)
    return similarity.mutual_nn_pairs(left, right).orderBy("left_id")


def q_dialect_funnel(spark, d):
    """ClickHouse ``windowFunnel(W)(ts, c1..ck)`` through the SQL dialect
    (dialect.py::_rewrite_window_funnel): per user, max funnel level for
    view→click→purchase within a 24 h window — translated to ONE codegen
    ``aggregate`` fold over the time-sorted events (O(E·k) per key; the
    kept per-level anchor is maximal, so the fold is exact for default
    mode).  Oracle: the DuckDB EXISTS-chain (reference parity:
    server.js:231 passes raw CH SQL through; App.jsx:198 renders it)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("wf_events")
    ch_sql = (
        "SELECT user_id, windowFunnel(86400)(ts, event_type = 'view', "
        "event_type = 'click', event_type = 'purchase') AS lvl "
        "FROM wf_events GROUP BY user_id ORDER BY user_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_sequence_next_node(spark, d):
    """ClickHouse ``sequenceNextNode(direction, base)(ts, val, base_cond,
    cond1..condK)`` through the SQL dialect
    (dialect.py::_rewrite_sequence_next_node): per user, the event type
    FOLLOWING the first consecutive view→click pair — CH's next-action
    journey aggregate, rendered as one time-sorted collect_list + pure
    index probes.  Ties on ts break by event value (the struct sort), so
    the oracle's ORDER BY ts, event_type matches.  Oracle: DuckDB list()
    + generate_series index scan deriving the same anchor and probe."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("snn_events")
    ch_sql = (
        "SELECT user_id, sequenceNextNode('forward', 'first_match')"
        "(ts, event_type, event_type = 'view', event_type = 'view', "
        "event_type = 'click') AS nxt "
        "FROM snn_events GROUP BY user_id ORDER BY user_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_dialect_retention(spark, d):
    """ClickHouse ``retention(c1..ck)`` through the SQL dialect: per-user
    cohort flags [saw view, view∧click, view∧purchase] — the anchor
    condition gates the rest (AggregateFunctionRetention semantics).
    Flags are exploded to columns (posexplode) so the oracle hash covers
    element values and order without relying on array hashing."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("ret_events")
    ch_sql = (
        "SELECT user_id, retention(event_type = 'view', "
        "event_type = 'click', event_type = 'purchase') AS r "
        "FROM ret_events GROUP BY user_id"
    )
    out = spark.sql(translate_clickhouse_sql(ch_sql))
    return out.select(
        "user_id",
        F.col("r").getItem(0).alias("saw_view"),
        F.col("r").getItem(1).alias("view_click"),
        F.col("r").getItem(2).alias("view_purchase"),
    ).orderBy("user_id")


def q_dialect_stats(spark, d):
    """Moment aggregates through the SQL dialect: varPop/varSamp/stddevPop
    map 1:1; covarPop over small-magnitude columns (discount) keeps the
    float summation inside round-6 agreement; skewPop IS Spark skewness
    (both population m3/m2^1.5); kurtPop = Spark kurtosis + 3 (excess →
    Pearson); simpleLinearRegression's slope via positional tupleElement.
    Oracle: DuckDB's sample-adjusted skewness/kurtosis un-adjusted back to
    the population forms (exact algebra, validated per group)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "lineitem").createOrReplaceTempView("st_lineitem")
    ch_sql = (
        "SELECT l_returnflag, "
        "round(varPop(l_quantity), 6) AS var_qty, "
        "round(varSamp(l_quantity), 6) AS vars_qty, "
        "round(stddevPop(l_quantity), 6) AS sd_qty, "
        "round(covarPop(l_quantity, l_discount), 6) AS cov_qd, "
        "round(skewPop(l_discount), 6) AS skew_disc, "
        "round(kurtPop(l_discount), 6) AS kurt_disc, "
        "round(tupleElement(simpleLinearRegression(l_quantity, "
        "l_extendedprice), 1), 6) AS slope "
        "FROM st_lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_image_neardup(spark, d):
    """Image near-duplicate detection (multimodal.py::synthesize_tile_payloads
    → dhash64 → image_neardup_pairs): 9×8 grayscale tiles with planted
    near-dup groups, difference-hashed by a vectorized Arrow batch UDF,
    paired by a 4×16-bit band join — linear candidate generation that is
    EXACT for Hamming ≤ 3 (pigeonhole: 3 flipped bits cannot touch all 4
    bands).  Oracle recomputes the hash from integer arithmetic on doc_id
    alone and brute-forces all pairs — a missed candidate or a bit-order
    bug breaks the hash."""
    docs = _t(spark, d, "documents").select("doc_id")
    tiles = multimodal.synthesize_tile_payloads(docs)
    hashed = multimodal.dhash64(tiles)
    out = multimodal.image_neardup_pairs(hashed)
    return out.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
    ).orderBy("id_a", "id_b")


def q_mutation_update(spark, d):
    """ClickHouse mutation analog (operators/mutations.py): parse
    ``ALTER TABLE … UPDATE``/``DELETE`` statements, build the
    post-mutation frame — UPDATE is ONE projection whose assignments all
    see the pre-mutation row (CH simultaneous-assignment semantics),
    DELETE keeps NULL-predicate rows.  Chains both kinds: purchases get their
    value doubled (exact in binary floating point — a 1.1× bump lands
    on .xx5 rounding boundaries where engines disagree), error events are deleted.  Oracle: the equivalent
    CASE WHEN projection + NOT-coalesce filter."""
    from clickhouse_flatfile_tool_spark.operators import mutations

    ev = _t(spark, d, "events").select("event_id", "event_type", "value")
    _, kind, asg, where = mutations.parse_mutation(
        "ALTER TABLE events UPDATE value = value * 2 "
        "WHERE event_type = 'purchase'"
    )
    bumped = mutations.mutated_frame(ev, kind, asg, where)
    _, kind2, asg2, where2 = mutations.parse_mutation(
        "ALTER TABLE events DELETE WHERE event_type = 'error'"
    )
    out = mutations.mutated_frame(bumped, kind2, asg2, where2)
    return out.select(
        "event_id", "event_type", F.round("value", 2).alias("value")
    )


def q_anova(spark, d):
    """One-way ANOVA (relational.py::anova — ClickHouse
    analysisOfVariance analog): does event value differ across event
    types?  Two partial-aggregatable passes over per-group (n, Σx, Σx²)
    cells.  Oracle: DuckDB computing the identical cell algebra."""
    ev = _t(spark, d, "events")
    out = relational.anova(ev, "event_type", "value")
    return out.select(
        F.round("f_stat", 6).alias("f_stat"), "df_between", "df_within"
    )


def q_embedding_drift(spark, d):
    """Embedding-distribution drift (similarity.py::embedding_drift):
    per-bucket centroids (vec_id % 7 stands in for the day) and cosine
    vs the previous bucket — cells shuffle as buckets × dims, centroids
    reassemble order-safely, lag window over the handful of bucket rows.
    Oracle: DuckDB unnest-with-ordinality + list_dot_product."""
    emb = _t(spark, d, "embeddings").select(
        (F.col("vec_id") % 7).alias("bucket"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    out = similarity.embedding_drift(emb, "bucket")
    return out.orderBy("bucket")


def q_cramers_v(spark, d):
    """Categorical association (relational.py::categorical_association —
    ClickHouse cramersV/contingency/theilsU family): event_type vs the
    user-id bucket, one contingency build.  Oracle: DuckDB running the
    identical cell algebra (incl. the zero-cell chi² mass n − Σe)."""
    ev = _t(spark, d, "events").select(
        "event_type", (F.col("user_id") % 4).alias("ub")
    )
    out = relational.categorical_association(ev, "event_type", "ub")
    return out.select(
        F.round("chi2", 6).alias("chi2"),
        F.round("cramers_v", 6).alias("cramers_v"),
        F.round("cramers_v_bias_corrected", 6).alias("cramers_v_bc"),
        F.round("contingency_coeff", 6).alias("contingency_coeff"),
        F.round("theils_u", 6).alias("theils_u"),
    )


def q_rank_assoc(spark, d):
    """Spearman rank correlation (relational.py::spearman_corr —
    ClickHouse ``rankCorr``): per event type, rho between the event value
    and its epoch second.  Average ranks via the cumulative-count algebra
    over DISTINCT (group, value) cells (never a raw-row sort window,
    guarded by max_cells — the mann_whitney_u scale stance), joined back
    null-safely, one corr() finish.  Oracle: DuckDB avg(row_number) tie
    ranks + corr."""
    ev = _t(spark, d, "events").select(
        "event_type",
        F.col("value").alias("x"),
        F.unix_timestamp("ts").cast("double").alias("y"),
    )
    out = relational.spearman_corr(ev, "x", "y", ["event_type"])
    return out.select(
        "event_type",
        F.round("spearman_rho", 6).alias("rho"),
        "n",
    ).orderBy("event_type")


def q_hypothesis_tests(spark, d):
    """Two-sample hypothesis tests (relational.py::ttest/mann_whitney_u —
    ClickHouse studentTTest/welchTTest/mannWhitneyUTest): click vs
    purchase event values.  U is exact (half-integer rank algebra);
    t-statistics round at 6.  Oracle: DuckDB group stats + the same
    distinct-value cumulative-rank construction."""
    ev = _t(spark, d, "events")
    w = relational.ttest(ev, "event_type", "value", "click", "purchase")
    s = relational.ttest(
        ev, "event_type", "value", "click", "purchase", welch=False
    )
    u = relational.mann_whitney_u(ev, "event_type", "value", "click", "purchase")
    ks = relational.ks_test(ev, "event_type", "value", "click", "purchase")
    z = relational.mean_z_test(
        ev, "event_type", "value", "click", "purchase", 1.5, 2.5
    )
    return (
        w.select(
            F.round("t_stat", 6).alias("welch_t"),
            F.round("deg_f", 4).alias("welch_df"),
        )
        .crossJoin(
            s.select(
                F.round("t_stat", 6).alias("student_t"),
                F.round("deg_f", 4).alias("student_df"),
            )
        )
        .crossJoin(
            u.select(
                "u_stat",
                F.col("n_a").cast("long").alias("n_a"),
                F.col("n_b").cast("long").alias("n_b"),
            )
        )
        .crossJoin(ks.select(F.round("d_stat", 6).alias("ks_d")))
        .crossJoin(z.select(F.round("z_stat", 6).alias("mean_z")))
    )


def q_lttb_downsample(spark, d):
    """ClickHouse largestTriangleThreeBuckets analog (events.py::lttb —
    Steinarsson 2013): each event_type's (event_id, value) series
    downsamples to 10 points; positional-middle anchors and smallest-x
    tiebreaks make the selection bit-deterministic (operator docstring).
    Oracle: the same 8 selection steps unrolled as chained DuckDB CTEs
    (each step max(struct(area, -x, …)) over its bucket against the
    previous step's pick — see _lttb_oracle_sql)."""
    ev = _t(spark, d, "events").select("event_type", "event_id", "value")
    out = events.lttb(ev, ["event_type"], "event_id", "value", n_out=10)
    return out.select(
        "event_type", "sel_idx", "x", F.round("y", 6).alias("y")
    ).orderBy("event_type", "sel_idx")


def _lttb_oracle_sql(n_out: int = 10) -> str:
    """The LTTB spec unrolled as chained CTEs: p (ordered points), mids
    (each interior bucket's positional-middle element), then one CTE per
    bucket selecting max(struct(area, -x, x, y)) against the previous
    selection — recursion-free and engine-portable."""
    B = n_out - 2
    jb = f"((p.i - 1) * {B}) // (p.m - 2)"
    parts = [
        "WITH p AS (SELECT event_type AS k, event_id::DOUBLE AS x, "
        "value::DOUBLE AS y, "
        "row_number() OVER (PARTITION BY event_type ORDER BY event_id) - 1 AS i, "
        "count(*) OVER (PARTITION BY event_type) AS m FROM events), "
        "mids AS (SELECT k, j, x, y FROM ("
        " SELECT p.k, " + jb + " AS j, p.x, p.y, "
        " row_number() OVER (PARTITION BY p.k, " + jb + " ORDER BY p.i) - 1 AS r, "
        " count(*) OVER (PARTITION BY p.k, " + jb + ") AS c "
        " FROM p WHERE p.i BETWEEN 1 AND p.m - 2) WHERE r = c // 2), "
        "lastp AS (SELECT k, x, y FROM p WHERE i = m - 1), "
        "sel_init AS (SELECT k, x, y FROM p WHERE i = 0)"
    ]
    for j in range(B):
        anchor = (
            f"(SELECT k, x AS ax, y AS ay FROM mids WHERE j = {j + 1})"
            if j < B - 1
            else "(SELECT k, x AS ax, y AS ay FROM lastp)"
        )
        prev = f"sel{j - 1}" if j > 0 else "sel_init"
        parts.append(
            f", pick{j} AS (SELECT p.k, max(struct_pack("
            f"a := abs((prev.x - n.ax) * (p.y - prev.y) "
            f"- (prev.x - p.x) * (n.ay - prev.y)), "
            f"nx := -p.x, x := p.x, y := p.y)) AS s "
            f"FROM p JOIN {prev} prev USING (k) "
            f"JOIN {anchor} n ON n.k = p.k "
            f"WHERE p.i BETWEEN 1 AND p.m - 2 AND {jb} = {j} "
            f"GROUP BY p.k)"
        )
        # expose the pick as plain (k, x, y) for the next step's prev
        parts.append(
            f", sel{j} AS (SELECT k, (s).x AS x, (s).y AS y FROM pick{j})"
        )
    selects = [
        "SELECT k AS event_type, 0 AS sel_idx, x, round(y, 6) AS y FROM sel_init"
    ]
    for j in range(B):
        selects.append(
            f"SELECT k, {j + 1}, x, round(y, 6) FROM sel{j}"
        )
    selects.append(
        f"SELECT k, {n_out - 1}, x, round(y, 6) FROM lastp"
    )
    return (
        "".join(parts)
        + " "
        + " UNION ALL ".join(selects)
        + " ORDER BY event_type, sel_idx"
    )


def q_domain_block(spark, d):
    """Domain-blocklist curation (text.py::domain_filter — the UT1 /
    RefinedWeb convention): URLs synthesized deterministically from
    doc_id/source, blocklist hits via host suffix-chain explode against a
    broadcast set — 'spam.net' blocks 's4.spam.net', 'tracker.io' blocks
    'ads.tracker.io', and one exact host.  Oracle: DuckDB computes the
    ground-truth conditions the synthesis implies."""
    docs = _t(spark, d, "documents").select(
        "doc_id",
        "source",
        F.expr(
            "concat('https://', CASE WHEN doc_id % 7 = 0 THEN "
            "concat('s', CAST(doc_id % 5 AS STRING), '.spam.net') "
            "WHEN doc_id % 7 = 1 THEN 'ads.tracker.io' "
            "ELSE concat(source, '.example.com') END, '/p/', doc_id)"
        ).alias("url"),
    )
    bl = spark.createDataFrame(
        [("spam.net",), ("TRACKER.io",), ("src3.example.com",)],
        "domain string",
    )
    out = text.domain_filter(docs, bl)
    return out.select("doc_id", "url", "blocked").orderBy("doc_id")


def q_projection_agg(spark, d):
    """ClickHouse PROJECTION analog (operators/projections.py): an
    (event_type, day) pre-aggregation built from ADD PROJECTION DDL
    answers the coarser per-event_type rollup by re-aggregating cells —
    sum of sums, sum of counts, min of mins, avg via (sum, count) state.
    Exact (cells partition the rows), so the oracle is simply the direct
    aggregate over the base table."""
    from clickhouse_flatfile_tool_spark.operators import projections as P

    ev = _t(spark, d, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    ps = P.ProjectionSet(ev)
    ps.add(
        "ALTER TABLE events ADD PROJECTION p_day "
        "(SELECT event_type, day, sum(value), count(value), min(value), "
        "max(value), avg(value) GROUP BY event_type, day)",
        cache=False,
    )
    out = ps.query(
        ["event_type"],
        [("sum", "value"), ("count", "value"), ("min", "value"),
         ("max", "value"), ("avg", "value")],
        aliases=["sum_v", "cnt_v", "min_v", "max_v", "avg_v"],
    )
    assert ps.choose(["event_type"], [("sum", "value")]) == "p_day"
    return out.select(
        "event_type",
        F.round("sum_v", 4).alias("sum_v"),
        "cnt_v",
        F.round("min_v", 6).alias("min_v"),
        F.round("max_v", 6).alias("max_v"),
        F.round("avg_v", 6).alias("avg_v"),
    ).orderBy("event_type")


def q_ttl_expire(spark, d):
    """ClickHouse table TTL analog (operators/mutations.py::ttl_frame):
    ``ALTER TABLE events MODIFY TTL ts + INTERVAL 10 DAY WHERE
    event_type != 'purchase'`` evaluated at a fixed "now" — rows older
    than 10 days expire unless they are purchases (the WHERE gate).
    ClickHouse applies this at merge time; the frame is the post-merge
    state.  Oracle: the equivalent NOT(expired AND subject) filter."""
    from clickhouse_flatfile_tool_spark.operators import mutations

    ev = _t(spark, d, "events").select("event_id", "ts", "event_type")
    out = mutations.ttl_frame(
        ev,
        "ALTER TABLE events MODIFY TTL ts + INTERVAL 10 DAY DELETE "
        "WHERE event_type != 'purchase'",
        now="2024-01-25 00:00:00",
    )
    return out.select("event_id", "event_type")


def q_ema_recursive(spark, d):
    """ClickHouse exponentialMovingAverage (events.py::ema_recursive): the
    recursive interpolated EMA per user — emaᵢ = emaᵢ₋₁·a + xᵢ·(1−a),
    a = 2^(−Δt/1h), fold seeded with the earliest event (≡ ClickHouse's
    zero-seed for epoch timestamps; see the operator docstring).  Oracle
    is DuckDB list_reduce running the identical fold."""
    out = events.ema_recursive(_t(spark, d, "events"), halflife_seconds=3600.0)
    return out.select("user_id", "n_events", F.round("ema", 6).alias("ema"))


def q_paste_join(spark, d):
    """ClickHouse PASTE JOIN analog (relational.py::paste_join): zip the
    top-10 customers by balance with the top-10 suppliers by balance,
    row-by-row by rank — position defined by an explicit deterministic
    sort (row_number per side + equi-join on position), since block-
    arrival order is not reproducible distributed."""
    cust = (
        _t(spark, d, "customer")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(10)
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"))
    )
    supp = (
        _t(spark, d, "supplier")
        .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .limit(10)
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )
    return relational.paste_join(
        cust,
        supp,
        order_left=[F.desc("c_acctbal"), F.asc("c_custkey")],
        order_right=[F.desc("s_acctbal"), F.asc("s_suppkey")],
    )


def q_dialect_paste(spark, d):
    """ClickHouse ``PASTE JOIN`` through the SQL endpoint
    (dialect.py::_rewrite_paste_join): positional concatenation of the
    nation and region views — position defined by each side's full-row
    sort (CH's block-arrival order is not reproducible distributed; same
    convention as relational.paste_join, driver-green r4), unequal
    lengths truncating to the shorter side (4 filtered regions vs 25
    nations).  The right side is a parenthesized SUBQUERY operand (r6,
    VERDICT r5 #8a — scanner-based operand parsing, plain names no
    longer required).  Oracle: DuckDB row_number zip over the same
    sorts."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "nation").select("n_nationkey", "n_name").createOrReplaceTempView(
        "pj_nation"
    )
    _t(spark, d, "region").select("r_regionkey", "r_name").createOrReplaceTempView(
        "pj_region"
    )
    ch_sql = (
        "SELECT n_nationkey, n_name, r_regionkey, r_name "
        "FROM pj_nation PASTE JOIN "
        "(SELECT r_regionkey, r_name FROM pj_region WHERE r_regionkey < 4) "
        "ORDER BY n_nationkey"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_with_totals(spark, d):
    """ClickHouse ``GROUP BY … WITH TOTALS`` through the SQL endpoint
    (dialect.py::_merge_with_totals): per-priority order counts/sums
    plus ONE grand-total row in a single aggregation pass (GROUPING SETS
    ((keys), ()) — partial aggregates feed both sets).  The totals row
    carries NULL keys (Spark's grouping-set convention; CH ships type
    defaults out-of-band — documented divergence).  Oracle: DuckDB's
    native GROUPING SETS."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "orders").createOrReplaceTempView("wt_orders")
    ch_sql = (
        "SELECT o_orderpriority, count() AS n, "
        "round(sum(o_totalprice), 2) AS s "
        "FROM wt_orders GROUP BY o_orderpriority WITH TOTALS "
        "ORDER BY o_orderpriority"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_nb_quality(spark, d):
    """Model-based quality filter (text.py::nb_classifier_scores): a
    fastText-style linear classifier trained closed-form as hash-bucketed
    naive Bayes (positive class = English docs) and applied as a broadcast
    probe — training is two aggregations, deployment one join, and the
    whole thing (training included) hash-matches the SQL oracle."""
    out = text.nb_classifier_scores(_t(spark, d, "documents"), "lang = 'en'")
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("nb_score", 6).alias("nb_score"),
    )


def q_bm25_rank(spark, d):
    """Okapi BM25 keyword scoring (retrieval.py::bm25_scores): every doc
    matching any of the query terms with its exact BM25 score — corpus
    stats (N, avgdl, per-term df) via broadcast 1-row/|terms|-row
    aggregates, one doc-keyed tf shuffle, zero UDFs.  All matching docs
    are returned (no top-k cutoff) so the oracle compare is immune to
    knife-edge rank boundaries."""
    docs = _t(spark, d, "documents")
    out = retrieval.bm25_scores(docs, ["vector", "hash", "join"])
    return out.select(
        "doc_id",
        F.round("bm25", 6).alias("bm25"),
        F.col("n_terms_matched").cast("long").alias("n_terms_matched"),
    )


def q_hybrid_rrf(spark, d):
    """Hybrid search via Reciprocal Rank Fusion (retrieval.py::rrf_fuse):
    BM25 keyword ranks ⊕ embedding-cosine ranks (query = vec 0's
    embedding; vec_id ↔ doc_id in the fixture), fused as
    Σ 1/(60 + rank) and cut to the top 20.  Fully deterministic and
    SQL-expressible — the oracle recomputes both rank lists and the
    fusion from scratch."""
    docs = _t(spark, d, "documents")
    emb = _t(spark, d, "embeddings")
    bm = retrieval.bm25_topk(docs, ["vector", "hash", "join"], k=50).select(
        "doc_id", "bm25"
    )
    qv = emb.filter("vec_id = 0")
    cos = similarity.cosine_topk(qv, emb, k=50).select(
        F.col("neighbor_id").alias("doc_id"), F.col("cos_sim")
    )
    return retrieval.rrf_fuse(bm, cos, k=20)


def q_canonical_dedup(spark, d):
    """Canonical-URL crawl dedup (text.py::canonical_url): four synthetic
    fetch-variants per resource (tracking params, WWW/case, trailing
    slash+fragment) collapse to one canonical string; survivors = min
    doc_id per canonical with dup_count.  Oracle re-canonicalizes
    independently with DuckDB regex/list functions."""
    docs = _t(spark, d, "documents").select("doc_id")
    base = F.concat(F.lit("/page/"), (F.col("doc_id") / 4).cast("long").cast("string"))
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("https://site.example.com"), base, F.lit("?a=1&b=2")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("https://site.example.com"), base,
                F.lit("?b=2&utm_source=feed&a=1"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("HTTPS://WWW.Site.example.com"), base, F.lit("?a=1&b=2")),
        )
        .otherwise(
            F.concat(
                F.lit("https://site.example.com"), base, F.lit("/?a=1&b=2#section")
            )
        )
    )
    with_cu = docs.withColumn("cu", text.canonical_url(url))
    return (
        with_cu.groupBy("cu")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("cu", "doc_id", F.col("dup_count").cast("long").alias("dup_count"))
    )


def q_mrl_topk(spark, d):
    """Matryoshka-truncated similarity search (similarity.py::mrl_truncate
    + cosine_topk): top-k over the first 16 of 64 dims — the serve-cheap /
    rerank-full pattern.  Truncation without renormalize so the oracle's
    cosine-on-slices is the bit-identical formula (ranking is unaffected
    by renormalization)."""
    emb = _t(spark, d, "embeddings")
    t16 = similarity.mrl_truncate(emb, 16, renormalize=False)
    queries_df = t16.filter("vec_id < 10")
    return similarity.cosine_topk(queries_df, t16, k=5)


def _index_cache_dir(d: str, kind: str) -> str:
    """Persistent ANN-index cache for a fixture dir — the production
    train-once lifecycle (VERDICT r3 #4): the first call builds and
    persists the index; every later search (bench iterations, driver
    correctness run) reads the prebuilt codebooks/codes like a real
    deployment would."""
    tag = os.path.basename(os.path.normpath(d)) or "sf"
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".index_cache", tag, kind)


def q_pq_topk(spark, d):
    """Product-Quantization ANN search against a PREBUILT persisted index
    (similarity.py::pq_build_index/pq_load_index/pq_topk, Jégou et al.
    2011): 64-dim float vectors compress to 16 subspace codes (16×
    storage); search is asymmetric-distance lookup-table sums over the
    codes (map-only corpus pass, per-partition shortlists) + exact cosine
    rerank of the 50-row shortlist.  The codebooks+codes are trained and
    written once per fixture (build-if-absent) — the benched/driven number
    is the production encode+search shape, not in-query training.
    Rows-only: k-means codebooks are not SQL-expressible; recall floors vs
    exact top-k are pytest-asserted
    (tests/test_similarity.py::test_pq_adc_and_rerank_recall)."""
    idx = _index_cache_dir(d, "pq")
    if not os.path.isdir(os.path.join(idx, "codes")):
        emb = similarity.normalize(_t(spark, d, "embeddings"))
        similarity.pq_build_index(emb, idx, m=16, k=64)
    cb, enc = similarity.pq_load_index(spark, idx)
    emb = similarity.normalize(_t(spark, d, "embeddings"))
    queries_df = emb.filter("vec_id < 10")
    return similarity.pq_topk(queries_df, enc, cb, k=5, rerank=50)


def q_ivfpq_topk(spark, d):
    """FAISS-style IVF-PQ search against a PREBUILT persisted index
    (similarity.py::ivfpq_build_index/ivfpq_search): IVF coarse pruning +
    PQ residual codes + ADC lookup tables + exact rerank of the
    shortlist.  Index (centroids, codebooks, encoded corpus) trains once
    per fixture and persists — searches pay only query-side LUTs + the
    pruned ADC scan.  Rows-only: both quantizers are k-means; recall
    floor vs exact is pytest-asserted
    (tests/test_similarity.py::test_ivfpq_recall_and_completeness)."""
    idx = _index_cache_dir(d, "ivfpq")
    if not os.path.isdir(os.path.join(idx, "codes")):
        emb = similarity.normalize(_t(spark, d, "embeddings"))
        similarity.ivfpq_build_index(emb, idx, n_lists=8, m=16, k_codes=32)
    cent, cb, enc = similarity.ivfpq_load_index(spark, idx)
    emb = similarity.normalize(_t(spark, d, "embeddings"))
    queries_df = emb.filter("vec_id < 10")
    return similarity.ivfpq_search(
        queries_df, cent, cb, enc, k=5, n_probe=4, rerank=40
    )


def q_dedup_policy(spark, d):
    """Survivorship-policy exact dedup (dedup.py::exact_dedup_by_policy,
    'longest' policy): keep the longest raw text per normalized-text
    fingerprint group, id-ascending tiebreak — one max_by aggregation, no
    window; oracle uses the equivalent row_number window."""
    docs = _t(spark, d, "documents")
    out = dedup.exact_dedup_by_policy(docs, policy="longest")
    return out.select(
        "doc_id", F.col("dup_count").cast("long").alias("dup_count")
    )


def q_clickhouse_dates(spark, d):
    """ClickHouse date-function family through the dialect translator
    (formatDateTime %-codes, dateDiff unit literal → timestampdiff keyword,
    toDayOfWeek Monday=1 renumbering, toMonday, toStartOfQuarter) — DuckDB
    oracle uses strftime/isodow/date_diff."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("events")
    ch = (
        "SELECT formatDateTime(ts, '%Y-%m-%d') AS day_str, "
        "toDayOfWeek(ts) AS dow, "
        "toInt64(dateDiff('hour', toStartOfDay(ts), ts)) AS hour_of_day, "
        "toMonday(ts) AS week_start, "
        "toQuarter(ts) AS q, "
        "toStartOfInterval(ts, INTERVAL 5 minute) AS bucket5, "
        "toInt64(count(*)) AS n "
        "FROM events GROUP BY formatDateTime(ts, '%Y-%m-%d'), toDayOfWeek(ts), "
        "toInt64(dateDiff('hour', toStartOfDay(ts), ts)), toMonday(ts), "
        "toQuarter(ts), toStartOfInterval(ts, INTERVAL 5 minute)"
    )
    out = relational.sql(spark, translate_clickhouse_sql(ch))
    return out.select(
        "day_str",
        F.col("dow").cast("int").alias("dow"),
        "hour_of_day",
        F.col("week_start").cast("string").alias("week_start"),
        F.col("q").cast("int").alias("q"),
        F.col("bucket5").cast("string").alias("bucket5"),
        "n",
    )


def q_stream_mv(spark, d):
    """Streaming materialized-view maintenance (stream_ops.py::stream_mv):
    micro-batch partial aggregates fold into a versioned persisted state
    with an atomic pointer swap — the Kafka→MV→AggregatingMergeTree
    pipeline.  Rows-only; batch-equivalence pytest-asserted (integer
    count + sum state)."""
    tmp = tempfile.mkdtemp(prefix="cfts_smv_")
    try:
        stream = stream_ops.read_event_stream(spark, os.path.join(d, "events.parquet"))
        proj = stream.select(
            "event_type",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
            F.lit(1).cast("long").alias("n"),
        )
        live = stream_ops.stream_mv(
            spark,
            proj,
            ["event_type"],
            {"cents": "sum", "n": "count"},
            os.path.join(tmp, "state"),
            os.path.join(tmp, "ckpt"),
        )
        return spark.read.parquet(live).select(
            "event_type",
            F.col("cents").cast("long").alias("cents"),
            F.col("n").cast("long").alias("n"),
        )
    finally:
        shutil.rmtree(os.path.join(tmp, "ckpt"), ignore_errors=True)


def q_mv_incremental(spark, d):
    """Materialized-view incremental maintenance
    (mergetree.py::mv_refresh): orders split into 3 deterministic batches,
    each folded into the running AggregatingMergeTree-style state; the
    oracle is the FULL recompute (merge functions are associative, so
    incremental ≡ one-shot).  Money state kept in integer cents so the
    staged fold is bit-exact across engines."""
    from clickhouse_flatfile_tool_spark.operators import mergetree

    o = _t(spark, d, "orders").select(
        "o_orderpriority",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.lit(1).cast("long").alias("n"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("max_cents"),
        (F.col("o_orderkey") % 3).alias("__batch"),
    )
    smap = {"cents": "sum", "n": "count", "max_cents": "max"}
    state = None
    for day in range(3):
        delta = o.filter(F.col("__batch") == day).drop("__batch")
        state = mergetree.mv_refresh(state, delta, ["o_orderpriority"], smap)
    return state.select(
        "o_orderpriority",
        F.col("cents").cast("long").alias("cents"),
        F.col("n").cast("long").alias("n"),
        F.col("max_cents").cast("long").alias("max_cents"),
    )


def q_sequence_count(spark, d):
    """ClickHouse sequenceCount analog (events.py::sequence_count): per
    user, non-overlapping greedy view→click chain completions.

    Oracle-upgraded r10 (VERDICT r9 #3 — directly SQL-expressible after
    all): the greedy left-to-right state machine over DISJOINT step
    conditions is equivalent to counting leftmost non-overlapping regex
    matches of 'a[^b]*b' over the per-user event string in (ts, event_id)
    order — a regex match consumes its span and resumes after it, exactly
    the machine's release-the-pointer-on-completion rule, and events
    matching neither step are state no-ops so they can be dropped before
    stringification.  The DuckDB oracle replays that."""
    ev = _t(spark, d, "events")
    return events.sequence_count(
        ev, ["event_type = 'view'", "event_type = 'click'"]
    ).select("user_id", F.col("n_matches").cast("long").alias("n_matches"))


def q_normalize_unicode(spark, d):
    """Unicode normalization (text.py::normalize_text): NFC composition +
    ICU-convention accent strip via an Arrow-batched pandas_udf — the
    preprocessing pass that makes composed/decomposed text hash together
    before fingerprinting.  A decomposed accented prefix is planted so the
    normalization demonstrably fires (fixture text is ASCII); the oracle is
    DuckDB's ICU nfc_normalize/strip_accents."""
    # DECOMPOSED on purpose (NFC must visibly change it): e+COMBINING
    # ACUTE, A+COMBINING RING, o+COMBINING DIAERESIS, plus NUMERO SIGN
    prefix = "Cafe\u0301 A\u030angstro\u0308m \u2116"
    docs = _t(spark, d, "documents").withColumn(
        "text", F.concat(F.lit(prefix + " "), F.col("text"))
    )
    out = text.normalize_text(docs, strip_accents=False, out_col="nfc")
    out = text.normalize_text(out, strip_accents=True, out_col="stripped")
    return out.select(
        "doc_id",
        F.substring("nfc", 1, 20).alias("nfc_prefix"),
        F.substring("stripped", 1, 20).alias("stripped_prefix"),
        F.length("nfc").cast("long").alias("nfc_len"),
        F.length("stripped").cast("long").alias("stripped_len"),
    )


def q_stream_enrich(spark, d):
    """Stream-static enrichment join (stream_ops.py::stream_enrich): the
    event stream picks up customer-dimension attributes via a broadcast
    map-side probe — stateless, no watermark, dimension re-planned per
    micro-batch.  Rows-only (streaming execution); batch-equivalence is
    pytest-asserted."""
    tmp = tempfile.mkdtemp(prefix="cfts_senrich_")
    out_dir, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
    try:
        stream = stream_ops.read_event_stream(spark, os.path.join(d, "events.parquet"))
        dim = _t(spark, d, "customer").select("c_custkey", "c_name", "c_nationkey")
        result = stream_ops.stream_enrich(
            stream, dim, "user_id", "c_custkey", ["c_name", "c_nationkey"]
        )
        stream_ops.run_available_now(result, out_dir, ckpt)
        return spark.read.parquet(out_dir).select(
            "event_id", "user_id", "c_name", "c_nationkey"
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def q_dsir_weights(spark, d):
    """DSIR importance weights (text.py::dsir_weights): hashed-unigram LM
    log-ratio of target (lang='en' docs) vs the whole corpus — the
    importance-resampling data-selection signal.  md5-hex buckets keep
    both LMs engine-portable, so even the smoothed floors oracle-match."""
    docs = _t(spark, d, "documents")
    out = text.dsir_weights(docs, docs.filter("lang = 'en'"))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("log_ratio", 6).alias("log_ratio"),
    )


def q_bpe_fertility(spark, d):
    """Tokenizer fertility by language: non-whitespace chars per BPE-ish
    token — the compression diagnostic a tokenizer team reads per language
    before training (text.py::bpe_ish_token_count)."""
    docs = _t(spark, d, "documents")
    m = text.with_text_metrics(docs)
    nws_chars = F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
    return (
        m.withColumn("nws", nws_chars)
        .groupBy("lang")
        .agg(
            F.sum("nws").cast("long").alias("total_chars"),
            F.sum("n_bpe_tokens").cast("long").alias("total_bpe"),
            F.round(F.sum("nws") / F.sum("n_bpe_tokens"), 6).alias("fertility"),
        )
    )


def q_shared_spans(spark, d):
    """Cross-doc verbatim shared-span detection (dedup.py::shared_spans) —
    the span-level verification stage of suffix-array substring dedup
    (Lee et al. 2021), bounded to candidate pairs.  Candidates here = docs
    sharing an identical 60-char prefix (the fixture's planted near-dups);
    gaps-and-islands on the position offset finds maximal runs."""
    docs = _t(spark, d, "documents")
    a, b = docs.alias("a"), docs.alias("b")
    pairs = a.join(
        b,
        F.expr(
            "substring(a.text, 1, 60) = substring(b.text, 1, 60) "
            "AND a.doc_id < b.doc_id"
        ),
    ).selectExpr("a.doc_id AS id_a", "b.doc_id AS id_b")
    out = dedup.shared_spans(docs, pairs)
    return out.select(
        "id_a",
        "id_b",
        F.col("longest_run_tokens").cast("long").alias("longest_run_tokens"),
        F.col("n_spans").cast("long").alias("n_spans"),
    )


def q_retention_flags(spark, d):
    """ClickHouse retention(cond1, cond2, …) aggregate analog
    (events.py::retention_flags): per user, did-signup gate ANDed with
    later-condition flags; one groupBy of max-indicators."""
    ev = _t(spark, d, "events")
    return events.retention_flags(
        ev,
        [
            "event_type = 'signup'",
            "event_type = 'purchase'",
            "event_type = 'error'",
        ],
    ).select(
        "user_id",
        F.col("r0").cast("int").alias("r0"),
        F.col("r1").cast("int").alias("r1"),
        F.col("r2").cast("int").alias("r2"),
    )


def q_clickhouse_funcs2(spark, d):
    """Second ClickHouse-dialect depth query: curried uniqUpTo, the
    JSONExtract family over events.props, and IPv4 round-trip math — all
    through the translator (dialect.py), oracled by hand-written ANSI."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    _t(spark, d, "events").createOrReplaceTempView("events")
    ch = (
        "SELECT user_id, "
        "uniqUpTo(3)(event_type) AS up3, "
        "toInt64(max(JSONExtractInt(props, 'k'))) AS max_k, "
        "toInt64(countIf(JSONHas(props, 'k'))) AS n_k, "
        "IPv4NumToString(toInt64(user_id * 7777 + 16909060)) AS ip, "
        "toInt64(IPv4StringToNum(IPv4NumToString(toInt64(user_id * 7777 + 16909060)))) AS ip_rt "
        "FROM events GROUP BY user_id"
    )
    return relational.sql(spark, translate_clickhouse_sql(ch))


def q_dict_lookup(spark, d):
    """ClickHouse dictGetOrDefault analog (relational.py::dict_get): enrich
    orders with customer name + nation key via a BROADCAST dictionary probe
    (map-side, zero shuffle on the fact side — the executor-local hash
    table dictGet keeps).  A planted out-of-range custkey exercises the
    default path."""
    o = _t(spark, d, "orders").withColumn(
        "o_custkey",
        # plant misses: every 50th order probes a key outside the dimension
        F.when(F.col("o_orderkey") % 50 == 0, F.lit(-1)).otherwise(
            F.col("o_custkey")
        ),
    )
    c = _t(spark, d, "customer")
    out = relational.dict_get(
        o,
        c,
        "o_custkey",
        "c_custkey",
        {
            "cust_name": ("c_name", "UNKNOWN"),
            "cust_nation": ("c_nationkey", -1),
        },
    )
    return out.select(
        "o_orderkey",
        "cust_name",
        F.col("cust_nation").cast("long").alias("cust_nation"),
    )


def q_window_funnel(spark, d):
    """ClickHouse windowFunnel(3600)(ts, view, click, purchase) analog
    (events.py::window_funnel): per user, max consecutive funnel depth
    reached by any chain starting at a 'view' with all steps inside one
    hour of it.  Oracle = EXISTS-chain SQL (greedy-from-each-start equals
    chain existence for a deadline fixed by the start event)."""
    ev = _t(spark, d, "events")
    return events.window_funnel(
        ev,
        3600,
        [
            "event_type = 'view'",
            "event_type = 'click'",
            "event_type = 'purchase'",
        ],
    ).select("user_id", F.col("level").cast("int").alias("level"))


def q_url_funcs(spark, d):
    """ClickHouse URL-function family (domain/protocol/path/queryString/
    fragment/extractURLParameter/topLevelDomain/domainWithoutWWW/
    cutQueryString) through the dialect translator → Spark parse_url parts
    (dialect.py _WRAPS + _rewrite_extract_url_parameter).  URLs are
    synthesized deterministically from documents so the DuckDB oracle can
    re-parse them with anchored regexes."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    docs = _t(spark, d, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://www."),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id"),
            F.lit("?lang="),
            F.col("lang"),
            F.lit("&v="),
            F.col("n_chars") % 10,
            F.lit("#s"),
            F.col("doc_id") % 5,
        ).alias("url"),
    )
    docs.createOrReplaceTempView("urls")
    ch = (
        "SELECT doc_id, domain(url) AS host, protocol(url) AS proto, "
        "path(url) AS url_path, queryString(url) AS qs, fragment(url) AS frag, "
        "extractURLParameter(url, 'lang') AS lang, topLevelDomain(url) AS tld, "
        "domainWithoutWWW(url) AS host_nw, cutQueryString(url) AS no_qs "
        "FROM urls"
    )
    return relational.sql(spark, translate_clickhouse_sql(ch))


def q_simhash_verified(spark, d):
    """SimHash banding candidates verified by exact Hamming distance
    (bit_count(xor)) — rows-only (xxhash64 signatures are Spark-side)."""
    docs = _t(spark, d, "documents")
    cands = dedup.simhash_candidates(docs)
    return dedup.simhash_verify(docs, cands, max_hamming=8)


def q_equiheight_hist(spark, d):
    """Equi-depth (ntile) histogram of order totals: per-bucket count and
    value range — the quantile summary whose shuffle is one sort, output
    O(buckets)."""
    o = _t(spark, d, "orders")
    from pyspark.sql.window import Window

    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(10).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


def q_outliers(spark, d):
    """Z-score outlier flagging: per-type mean/stddev via one aggregation
    broadcast back onto the stream of rows (no window sort needed for
    whole-group stats)."""
    ev = _t(spark, d, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev("value").alias("sd")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where((F.col("value") - F.col("mu")) / F.col("sd") > 2.0)
        .select("event_id", "event_type", F.round("value", 4).alias("value"))
    )


def q_skew_report(spark, d):
    """Key-skew diagnostic: per-key counts re-aggregated into the stats that
    decide salting/AQE strategy (max/avg ratio) — two cheap aggregations,
    the second over one row per key."""
    li = _t(spark, d, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_rows"),
        F.round(F.avg("n"), 6).alias("avg_rows"),
        F.round(F.max("n") / F.avg("n"), 6).alias("skew_ratio"),
    )


def q_debounce_events(spark, d):
    """Debounce (batch twin of dropDuplicatesWithinWatermark): keep an event
    only if the previous same-(user,type) event is >10 minutes older — one
    window over the key, no self-join."""
    from pyspark.sql.window import Window

    ev = _t(spark, d, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return (
        ev.withColumn("__prev", prev)
        .where(
            F.col("__prev").isNull()
            | (F.col("ts").cast("long") - F.col("__prev").cast("long") > 600)
        )
        .select("event_id", "user_id", "event_type", "ts")
    )


def q_pipeline_train_prep(spark, d):
    """Full training-data prep pipeline, end to end: quality filter → exact
    dedup (min-id per normalized fingerprint) → 200/50 overlap chunking →
    deterministic md5 hash split; per-split chunk/doc counts.  Every stage
    is the operator already verified standalone — this query verifies their
    composition."""
    docs = _t(spark, d, "documents")
    good = text.with_quality_score(docs).filter(F.col("quality_score") >= 0.5)
    surv_ids = (
        good.withColumn("__fp", text.fingerprint("text"))
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    surv = surv_ids.join(docs.select("doc_id", "text"), "doc_id")
    chunks = text.chunk_text(
        surv.select("doc_id", "text"), chunk_size=200, overlap=50, id_cols=["doc_id"]
    )
    split = sampling.hash_split(chunks, "doc_id")
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


def q_corr_stats(spark, d):
    """Bivariate statistics per group: Pearson correlation and sample
    covariance (one-pass co-moment aggregates, map-side combinable)."""
    li = _t(spark, d, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
    )


def q_pmi_collocations(spark, d):
    """Top bigram collocations by PMI over the corpus — bigrams from zipped
    slices, totals via broadcast 1-row aggregates."""
    docs = _t(spark, d, "documents")
    return text.pmi_collocations(docs, k=50, min_count=5)


def q_char_entropy(spark, d):
    """Per-doc character-distribution Shannon entropy — gibberish/encoding
    noise detector (text.py::char_entropy)."""
    docs = _t(spark, d, "documents")
    return text.char_entropy(docs)


def q_bigram_surprisal(spark, d):
    """Per-doc mean conditional bigram surprisal vs the corpus bigram MLE —
    the context-aware LM-quality gate (text.py::bigram_surprisal)."""
    docs = _t(spark, d, "documents")
    return text.bigram_surprisal(docs)


def q_mixture_weights(spark, d):
    """Temperature-scaled (alpha=0.5) per-language sampling weights — the
    multilingual alpha-sampling rule (sampling.py::temperature_mixture_weights)."""
    docs = _t(spark, d, "documents")
    return sampling.temperature_mixture_weights(docs, alpha=0.5)


def q_token_budget(spark, d):
    """Per-language token-budget trim in deterministic md5(id) order
    (sampling.py::token_budget_trim) — window cumsum, budget 8000 tokens."""
    docs = _t(spark, d, "documents")
    out = sampling.token_budget_trim(docs, token_budget=8000)
    return out.select("doc_id", "lang")


def q_drift_psi(spark, d):
    """Population Stability Index between two corpus snapshots (even/odd
    doc_id halves) over fixed n_chars buckets — the standard ingestion
    drift monitor (relational.py::population_stability)."""
    docs = _t(spark, d, "documents")
    out = relational.population_stability(
        docs.filter("doc_id % 2 = 0"),
        docs.filter("doc_id % 2 = 1"),
        "n_chars",
        edges=[200.0, 400.0, 600.0, 800.0, 1000.0],
    )
    return out.select(
        F.col("bucket").cast("long").alias("bucket"), "p_ref", "p_cur", "psi_term"
    )


def q_approx_topk(spark, d):
    """Misra-Gries mergeable heavy hitters in the exact regime (capacity ≥
    distinct, so no decrement fires and the oracle can check it); the
    approximate regime is property-tested (relational.py::misra_gries_topk)."""
    o = _t(spark, d, "orders")
    return relational.misra_gries_topk(o, "o_orderpriority", k=3, capacity=64)


def q_retention_cohorts(spark, d):
    """Cohort retention (first-seen date × day offset × distinct users) —
    activity deduped per (user, day) before the join."""
    ev = _t(spark, d, "events")
    return events.retention_cohorts(ev)


def q_profile_table(spark, d):
    """Per-column profile of orders (null/distinct counts) in one pass —
    stack to long format, aggregate by column name."""
    o = _t(spark, d, "orders")
    return relational.profile_table(o)


def q_tpch_q6(spark, d):
    """TPC-H Q6 shape (forecast revenue): pure filter + single-row agg — the
    query whose entire cost should be a pushed-down parquet scan."""
    li = _t(spark, d, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


def q_tpch_q14(spark, d):
    """TPC-H Q14 shape (promo revenue share by month): fact filtered before
    the broadcast part join; conditional aggregation for the share."""
    li, p = (_t(spark, d, t) for t in ["lineitem", "part"])
    j = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    ).join(relational.broadcast_dim(p), F.col("l_partkey") == F.col("p_partkey"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy(F.date_trunc("month", "l_shipdate").alias("month")).agg(
        F.round(
            100 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev),
            4,
        ).alias("promo_share")
    )


def q_hll_rollup(spark, d):
    """Sketch-based distinct rollup (uniqState/uniqMerge analog): hourly HLL
    sketches of user_id merged into daily estimates — constant-size shuffle
    state per bucket.

    Oracle-upgraded r10: at the fixture's per-day cardinalities (≤ ~1.4k
    distinct users even at sf0.1) the lg_k=14 DataSketches HLL stays in
    its SPARSE-EXACT regime, so the merged estimate EQUALS the exact
    per-day COUNT(DISTINCT) — measured 0 diff across all 30 days × 3
    scales — and the DuckDB oracle is the exact replay.  If the fixture
    ever outgrows the sparse regime this hash-fails loudly (the forced
    review is the point); real estimation error is pinned separately in
    sketch_error's lg_k=4 branch."""
    ev = _t(spark, d, "events")
    return events.hll_rollup(ev)


def q_uniq_state_merge(spark, d):
    """ClickHouse uniqState/uniqMerge through the MV-maintenance path
    (mergetree.py::hll_state + mv_refresh): per-(event_type, day) HLL
    sketch states of user_id — the AggregatingMergeTree MV rows — folded
    by mv_refresh into per-type distinct-user estimates, exactly the
    -State write / -Merge read split.

    Oracle-upgraded r10: at the fixture's per-type cardinalities (1.5k
    distinct users at sf0.1) the lg_k=14 sketch is SPARSE-EXACT, so the
    folded estimate equals exact COUNT(DISTINCT) — measured 0 diff at all
    three scales — and the oracle is the exact DuckDB replay (hash-fails
    loudly if the fixture ever leaves the sparse regime).  The ≤2 % error
    bound stays pytest-asserted (tests/test_mergetree.py::
    test_uniq_state_merge_estimate_within_bound); real estimation error
    is pinned in sketch_error's lg_k=4 branch."""
    ev = _t(spark, d, "events").withColumn("day", F.to_date("ts"))
    daily = mergetree.hll_state(ev, ["event_type", "day"], "user_id", lg_k=14)
    merged = mergetree.mv_refresh(
        None, daily.drop("day"), ["event_type"], {"uniq_state": "hll"}
    )
    return merged.select(
        "event_type",
        F.hll_sketch_estimate("uniq_state").cast("long").alias("approx_users"),
    ).orderBy("event_type")


def q_stream_tumbling(spark, d):
    """Structured Streaming tumbling windows over the events fixture,
    executed with Trigger.AvailableNow for determinism (rows-only check)."""
    tmp = tempfile.mkdtemp(prefix="cfts_stream_")
    out_dir, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
    try:
        stream = stream_ops.read_event_stream(spark, os.path.join(d, "events.parquet"))
        result = stream_ops.windowed_counts(stream, "10 minutes", "30 minutes")
        stream_ops.run_available_now(result, out_dir, ckpt)
        return spark.read.parquet(out_dir)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def q_stream_dedup(spark, d):
    """Streaming dedup with bounded state (rows-only check)."""
    tmp = tempfile.mkdtemp(prefix="cfts_sdedup_")
    out_dir, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
    try:
        stream = stream_ops.read_event_stream(spark, os.path.join(d, "events.parquet"))
        result = stream_ops.dedup_within_watermark(stream, ["user_id", "event_type"], "2 hours")
        stream_ops.run_available_now(result, out_dir, ckpt)
        return spark.read.parquet(out_dir).select("user_id", "event_type")
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def q_stream_near_dedup(spark, d):
    """Streaming NEAR-dup suppression (stream_ops.py::stream_near_dedup):
    per-row MinHash signatures + dropDuplicatesWithinWatermark.  Input is
    the documents table unioned with a re-crawl copy (same text, new ids,
    1 minute later) — exactly one survivor per distinct signature must
    remain (rows-only; signature ≡ batch path is pytest-proven).
    Timestamps anchor at 2024-01-01, NOT epoch 0: rows at the stream's
    initial watermark (epoch 0) are silently dropped as LATE, which
    would fake the suppression (r6 finding, pytest now asserts the
    survivors are the ORIGINALS)."""
    tmp = tempfile.mkdtemp(prefix="cfts_sndedup_")
    src, out_dir, ckpt = (os.path.join(tmp, p) for p in ("src", "out", "ckpt"))
    try:
        base_ts = 1_704_067_200  # 2024-01-01 00:00:00 UTC
        docs = _t(spark, d, "documents").select("doc_id", "text")
        recrawl = docs.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
        staged = docs.withColumn(
            "__ts", F.timestamp_seconds(F.lit(base_ts))
        ).unionByName(
            recrawl.withColumn("__ts", F.timestamp_seconds(F.lit(base_ts + 60)))
        )
        staged.write.mode("overwrite").parquet(src)
        stream = stream_ops.read_event_stream(spark, src)
        result = stream_ops.stream_near_dedup(stream, watermark="10 minutes")
        stream_ops.run_available_now(result.select("doc_id"), out_dir, ckpt)
        return spark.read.parquet(out_dir)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def q_stream_curation(spark, d):
    """Composed streaming curation (stream_ops.py::
    stream_curation_pipeline — the streaming twin of pipeline_e2e's
    funnel): Gopher gate (stateless) → MinHash near-dup suppression
    within the watermark (the one stateful stage) → Bloom benchmark
    decontamination (stateless probe of the static benchmark's 128 KiB
    bitset literal).  Input: documents + re-crawl copies 1 min later;
    benchmark = the doc_id % 20 = 0 split.  Rows-only (streaming);
    per-stage semantics are pytest-proven on a planted fixture."""
    tmp = tempfile.mkdtemp(prefix="cfts_scur_")
    src, out_dir, ckpt = (os.path.join(tmp, p) for p in ("src", "out", "ckpt"))
    try:
        base_ts = 1_704_067_200  # 2024-01-01; NOT epoch 0 (late-drop trap)
        docs = _t(spark, d, "documents").select("doc_id", "text")
        recrawl = docs.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
        staged = docs.withColumn(
            "__ts", F.timestamp_seconds(F.lit(base_ts))
        ).unionByName(
            recrawl.withColumn("__ts", F.timestamp_seconds(F.lit(base_ts + 60)))
        )
        staged.write.mode("overwrite").parquet(src)
        bench = docs.filter(F.col("doc_id") % 20 == 0)
        stream = stream_ops.read_event_stream(spark, src)
        result = stream_ops.stream_curation_pipeline(
            stream, bench, watermark="10 minutes"
        )
        stream_ops.run_available_now(result.select("doc_id"), out_dir, ckpt)
        return spark.read.parquet(out_dir)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def q_stream_quality_gate(spark, d):
    """Streaming Gopher-rules quality gate — stateless map-only stage, no
    watermark/state store (rows-only; batch≡stream pass-set equivalence is
    asserted in pytest)."""
    tmp = tempfile.mkdtemp(prefix="cfts_sqg_")
    out_dir, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
    try:
        stream = stream_ops.read_event_stream(spark, os.path.join(d, "documents.parquet"))
        gated = stream_ops.stream_quality_gate(stream)
        stream_ops.run_available_now(gated.select("doc_id", "lang", "n_words"), out_dir, ckpt)
        return spark.read.parquet(out_dir)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def q_stream_session(spark, d):
    """Streaming session windows (rows-only check)."""
    tmp = tempfile.mkdtemp(prefix="cfts_ssess_")
    out_dir, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
    try:
        stream = stream_ops.read_event_stream(spark, os.path.join(d, "events.parquet"))
        result = stream_ops.sessionized(stream, "30 minutes", "1 hour")
        stream_ops.run_available_now(result, out_dir, ckpt)
        return spark.read.parquet(out_dir).select("user_id", "n_events")
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def q_stream_stateful(spark, d):
    """Custom stateful streaming op via applyInPandasWithState (rows-only)."""
    tmp = tempfile.mkdtemp(prefix="cfts_sstate_")
    out_dir, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
    try:
        stream = stream_ops.read_event_stream(spark, os.path.join(d, "events.parquet"))
        result = stream_ops.running_user_totals(stream)
        stream_ops.run_available_now(result, out_dir, ckpt)
        return spark.read.parquet(out_dir)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def q_stream_tws(spark, d):
    """Spark 4 transformWithStateInPandas custom stateful op (typed
    ValueState per user) — rows-only; batch equivalence in pytest."""
    tmp = tempfile.mkdtemp(prefix="cfts_stws_")
    out_dir, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
    try:
        stream = stream_ops.read_event_stream(spark, os.path.join(d, "events.parquet"))
        result = stream_ops.user_event_stats_tws(stream)
        stream_ops.run_available_now(result, out_dir, ckpt)
        return spark.read.parquet(out_dir)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def q_stream_interval_join(spark, d):
    """Watermarked stream-stream join (purchases ⋈ clicks within 10 min by
    user) — rows-only check; the batch twin is event_range_join."""
    tmp = tempfile.mkdtemp(prefix="cfts_ssjoin_")
    out_dir, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
    try:
        ev = os.path.join(d, "events.parquet")
        purch = stream_ops.read_event_stream(spark, ev).filter(
            "event_type = 'purchase'"
        ).select("event_id", "user_id", "ts")
        clicks = stream_ops.read_event_stream(spark, ev).filter(
            "event_type = 'click'"
        ).select("user_id", "ts")
        j = stream_ops.stream_interval_join(purch, clicks, lookback="10 minutes")
        stream_ops.run_available_now(
            j.select("event_id", "user_id", F.col("ts_r").alias("click_ts")),
            out_dir,
            ckpt,
        )
        return spark.read.parquet(out_dir)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


# RFC 4180 CSV fixture for the csv_quoted oracle pair (S1 quoting surface:
# embedded commas, doubled quotes, a quoted newline, and a NULL marker).
# Written idempotently to a CONTENT-ADDRESSED path (md5 of the body in the
# filename) so both engines read the very same bytes AND a stale file from
# an earlier round — or a foreign file squatting on a fixed /tmp name —
# can never be silently substituted: changing the body changes the path.
_CSV_QUOTED_BODY = (
    "id,name,val,note\n"
    '1,plain,1.5,hello\n'
    '2,"comma, inside",2.25,NULL\n'
    '3,"quote "" inside",3.75,ok\n'
    '4,"line\nbreak",4.5,NULL\n'
    '5,unquoted,5.0,"trailing, note"\n'
    '6,"tab\there",6.25,last\n'
)
_CSV_QUOTED_PATH = os.path.join(
    tempfile.gettempdir(),
    "cfts_fixtures",
    f"csv_quoted_{hashlib.md5(_CSV_QUOTED_BODY.encode()).hexdigest()[:10]}.csv",
)


def _ensure_csv_quoted_fixture() -> str:
    """Create the quoted-CSV fixture if absent (atomic rename so concurrent
    driver processes never observe a partial file)."""
    if not os.path.exists(_CSV_QUOTED_PATH):
        os.makedirs(os.path.dirname(_CSV_QUOTED_PATH), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(_CSV_QUOTED_PATH))
        with os.fdopen(fd, "w", encoding="utf-8", newline="") as fh:
            fh.write(_CSV_QUOTED_BODY)
        os.replace(tmp, _CSV_QUOTED_PATH)
    return _CSV_QUOTED_PATH


def q_csv_quoted(spark, d):
    """RFC 4180 quoting end-to-end (S1/S2 + the quote/escape/nullValue/
    multiline reader options, sources/files.py:35): embedded separators,
    doubled quotes, quoted newlines, NULL markers.  Reference parses with
    csv-parse defaults (server.js:478-480); DuckDB read_csv is the oracle."""
    from clickhouse_flatfile_tool_spark.sources.files import read_csv

    path = _ensure_csv_quoted_fixture()
    df, _schema = read_csv(
        spark, path, has_header=True, null_value="NULL", multiline=True
    )
    return df.select(
        F.col("id").cast("long").alias("id"),
        "name",
        F.col("val").cast("double").alias("val"),
        "note",
        F.length("name").cast("long").alias("name_len"),
    )


def q_dialect_batch26(spark, d):
    """Dialect batch 26 (coverage tail past batch 25): erf/lgamma closed
    forms (the SAME formula is mirrored in the DuckDB oracle — the hash
    tests the translation; pytest tests accuracy vs math.erf/lgamma),
    emptyArrayToSingle, arrayReduceInRanges, hasSubsequence, unbin,
    bitSlice, morton encode/decode, reinterpret casts, pointInEllipses,
    geohashesInBox (constant-folded; the expected array is pinned and
    cross-checked against the proven geohashEncode in pytest),
    deterministic PROPERTIES of the random family, toDecimal256,
    cutURLParameter, JSONExtractKeysAndValues, formatRow, pads,
    hostName/uptime/sleep, digest lanes."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    # repartition: the fixture parquet is one file -> one scan split, and
    # the heavy projection here is higher-order-lambda work (base58 radix
    # folds) that Spark evaluates interpreted, per partition — splitting
    # the scan parallelizes it 32x (5.8s -> 2.4s at sf0.1; on a real
    # cluster the 100 TB scan is already thousands of splits)
    _t(spark, d, "documents").repartition(32).createOrReplaceTempView(
        "b26_docs"
    )
    ch_sql = (
        "SELECT doc_id, "
        "toInt64(floor(erf(toFloat64(modulo(doc_id, 13)) / 3.0 - 2.0) "
        "  * 10000)) "
        "  AS erf4, "
        "toInt64(floor(lgamma(modulo(doc_id, 10) + 1.5) * 10000)) AS lg4, "
        "arrayStringConcat(arrayMap(__x -> toString(__x), "
        "  emptyArrayToSingle(if(modulo(doc_id, 3) = 0, emptyArrayInt64(), "
        "  [toInt64(doc_id)]))), ',') AS eas, "
        "toInt64(arrayElement(arrayReduceInRanges('sum', [(1, 2), (2, 3)], "
        "  [modulo(doc_id, 5), 1, 2, 3]), 1)) AS arr1, "
        "toInt64(arrayElement(arrayReduceInRanges('sum', [(1, 2), (2, 3)], "
        "  [modulo(doc_id, 5), 1, 2, 3]), 2)) AS arr2, "
        "hasSubsequence(text, 'the') AS hs, "
        "unbin(arrayElement(['01000001', '0100001001000011'], "
        "  toInt32(modulo(doc_id, 2) + 1))) AS ub, "
        "bitSlice('Spark', 9, 16) AS bsl, "
        "mortonEncode(modulo(doc_id, 256), modulo(doc_id, 77)) AS me, "
        "tupleElement(mortonDecode(2, modulo(doc_id * 37, 1024)), 1) AS mdx, "
        "tupleElement(mortonDecode(2, modulo(doc_id * 37, 1024)), 2) AS mdy, "
        "reinterpretAsUInt64(substring('abcdefgh', modulo(doc_id, 5) + 1, 3)) "
        "  AS ri, "
        "reinterpretAsString(65 + modulo(doc_id, 26)) AS rs, "
        "pointInEllipses(modulo(doc_id, 10), modulo(doc_id, 7), "
        "  5, 3, 4, 3) AS pe, "
        "arrayStringConcat(geohashesInBox(-0.5, -0.5, 0.5, 0.5, 3), ',') "
        "  AS gh, "
        "length(randomPrintableASCII(12)) AS rlen, "
        "randBinomial(8, 0.5) BETWEEN 0 AND 8 AS rb_ok, "
        "randPoisson(3.0) >= 0 AS rp_ok, "
        "randConstant() >= 0 AS rc_ok, "
        "toFloat64(toDecimal256(concat(toString(modulo(doc_id, 9)), '.5'), "
        "  1)) AS d256, "
        "cutURLParameter(concat('http://ex.com/?a=', toString(doc_id), "
        "  '&b=2&c=3'), 'b') AS cu, "
        "arrayStringConcat(arrayMap(__e -> concat(tupleElement(__e, 1), "
        "  '=', toString(tupleElement(__e, 2))), JSONExtractKeysAndValues("
        "  concat('{\"k', toString(modulo(doc_id, 3)), '\":', "
        "  toString(doc_id), '}'), 'Int64')), ',') AS kv, "
        "formatRowNoNewline('JSONEachRow', doc_id) AS frj, "
        "formatRow('TSV', doc_id, 'zz') AS frt, "
        "leftPadUTF8(toString(doc_id), 6, '0') AS lp, "
        "length(sipHash128(text)) AS shl, "
        "sipHash128(text) != murmurHash3_128(text) AS hne, "
        "xxh3(text) = xxHash64(text) AS xx, "
        "hostName() AS hn, uptime() AS up, sleep(1) AS sl, "
        "base58Encode(arrayElement(['doc', 'key-1', 'x', "
        "  'a longer payload'], toInt32(modulo(doc_id, 4) + 1))) AS b58, "
        "hex(base58Decode(base58Encode(substring(text, 1, 8)))) AS b58rt "
        "FROM b26_docs ORDER BY doc_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


# batch-27 IPv6 fixture addresses and their Python-ipaddress-derived
# expected values (hex form, RFC 5952 canonical text with CH's
# ::ffff dotted rendering, 6/2-byte cut, /53 CIDR bounds, /32 membership)
_B27_ADDRS = [
    "2001:db8::1", "::1", "1:2:3:4:5:6:7:8", "fe80::1:2",
    "::ffff:192.168.1.1", "2001:0:0:1::1", "1:0:0:1:0:0:0:1",
    "abcd:ef01:2345:6789::",
]
_B27_HEX = [
    "20010DB8000000000000000000000001", "00000000000000000000000000000001",
    "00010002000300040005000600070008", "FE800000000000000000000000010002",
    "00000000000000000000FFFFC0A80101", "20010000000000010000000000000001",
    "00010000000000010000000000000001", "ABCDEF01234567890000000000000000",
]
_B27_CANON = [
    "2001:db8::1", "::1", "1:2:3:4:5:6:7:8", "fe80::1:2",
    "::ffff:192.168.1.1", "2001:0:0:1::1", "1:0:0:1::1",
    "abcd:ef01:2345:6789::",
]
_B27_CUT = [
    "2001:db8::", "::", "1:2:3:4:5::", "fe80::", "::ffff:192.168.0.0",
    "2001:0:0:1::", "1:0:0:1::", "abcd:ef01:2345:6789::",
]
_B27_LO = [
    "20010DB8000000000000000000000000", "00000000000000000000000000000000",
    "00010002000300000000000000000000", "FE800000000000000000000000000000",
    "00000000000000000000000000000000", "20010000000000000000000000000000",
    "00010000000000000000000000000000", "ABCDEF01234560000000000000000000",
]
_B27_HI = [
    "20010DB8000007FFFFFFFFFFFFFFFFFF", "00000000000007FFFFFFFFFFFFFFFFFF",
    "00010002000307FFFFFFFFFFFFFFFFFF", "FE800000000007FFFFFFFFFFFFFFFFFF",
    "00000000000007FFFFFFFFFFFFFFFFFF", "20010000000007FFFFFFFFFFFFFFFFFF",
    "00010000000007FFFFFFFFFFFFFFFFFF", "ABCDEF01234567FFFFFFFFFFFFFFFFFF",
]
_B27_INR = [
    "TRUE", "FALSE", "FALSE", "FALSE", "FALSE", "FALSE", "FALSE", "FALSE",
]


def q_dialect_batch27(spark, d):
    """Dialect batch 27 — the IPv4/IPv6 completeness family: text parse
    (:: compression, dotted tails), RFC 5952 canonical printer, cutIPv6,
    CIDR ranges, membership tests, OrNull gates, mapped conversion.
    Oracle: the Python-ipaddress-derived constants above, indexed per
    row (the literal-expected pattern: the oracle STATES the truth; the
    engine must parse/print its way to it)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    # one-file fixture -> one split; parallelize the lambda-heavy
    # projection (the b26_docs note)
    _t(spark, d, "documents").repartition(32).createOrReplaceTempView(
        "b27_docs"
    )
    arr = "[" + ", ".join(f"'{a}'" for a in _B27_ADDRS) + "]"
    a = f"arrayElement({arr}, toInt32(modulo(doc_id, 8) + 1))"
    v4 = (
        "concat(toString(modulo(doc_id, 256)), '.', "
        "toString(modulo(doc_id * 7, 256)), '.0.', "
        "toString(modulo(doc_id, 100)))"
    )
    ch_sql = (
        "SELECT doc_id, "
        f"hex(IPv6StringToNum({a})) AS h6, "
        f"IPv6NumToString(IPv6StringToNum({a})) AS s6, "
        f"cutIPv6(IPv6StringToNum({a}), 6, 2) AS cut6, "
        f"hex(tupleElement(IPv6CIDRToRange(IPv6StringToNum({a}), 53), 1)) "
        "  AS lo6, "
        f"hex(tupleElement(IPv6CIDRToRange(IPv6StringToNum({a}), 53), 2)) "
        "  AS hi6, "
        f"isIPAddressInRange({a}, '2001:db8::/32') AS inr6, "
        f"IPv4StringToNumOrNull({v4}) AS v4n, "
        "IPv4StringToNumOrNull(concat('300.1.1.', "
        "  toString(modulo(doc_id, 5)))) AS v4bad, "
        f"toIPv4({v4}) AS t4, "
        f"hex(IPv4ToIPv6(toIPv4({v4}))) AS m6, "
        f"isIPAddressInRange({v4}, '10.0.0.0/8') AS inr4 "
        "FROM b27_docs ORDER BY doc_id"
    )
    return spark.sql(translate_clickhouse_sql(ch_sql))


def q_text_similarity(spark, d):
    """jaroSimilarity / jaroWinklerSimilarity / damerauLevenshteinDistance
    as the string_similarity operator (text.py) over overlapping
    document-text windows — oracled against DuckDB's NATIVE
    jaro_similarity / jaro_winkler_similarity / damerau_levenshtein
    (semantics pinned: integer transposition halving, 0.7 Winkler boost
    threshold, full unrestricted Damerau)."""
    docs = _t(spark, d, "documents")
    pairs = docs.select(
        "doc_id",
        F.lower(F.substring("text", 1, 12)).alias("a"),
        F.lower(F.substring("text", 5, 12)).alias("b"),
    )
    out = text.string_similarity(pairs, "a", "b")
    return out.select(
        "doc_id",
        F.round("sim_jaro", 6).alias("jaro"),
        F.round("sim_jaro_winkler", 6).alias("jw"),
        F.col("sim_damerau_levenshtein").alias("dl"),
    ).orderBy("doc_id")


def q_ml_aggregates(spark, d):
    """categoricalInformationValue + stochasticLinearRegression +
    stochasticLogisticRegression analogs (relational.py): exact
    WoE/IV, exact OLS, fixed-schedule IRLS.  The label is a
    deterministic hash-threshold function of user_id (logistic-ish in
    x = user_id % 10, never separable), so DuckDB can replay it
    bit-for-bit; the logistic oracle replays the SAME 5 unrolled Newton
    steps in chained CTEs."""
    ev = (
        _t(spark, d, "events")
        .filter(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select(
            F.col("value").cast("double").alias("value"),
            F.pmod("user_id", F.lit(10)).cast("double").alias("x"),
            (
                F.pmod(F.col("user_id") * 2654435761, F.lit(1000))
                < 300 + 40 * F.pmod("user_id", F.lit(10))
            ).cast("int").alias("lbl"),
            "event_type",
        )
    )
    iv = relational.information_value(ev, "event_type", "lbl")
    lin = relational.linear_regression_fit(ev, "value", ["x"])
    logi = relational.logistic_regression_fit(ev, "lbl", ["x"], iters=5)
    return (
        iv.crossJoin(F.broadcast(lin.select(
            F.col("w0").alias("lin_w0"), F.col("w1").alias("lin_w1"))))
        .crossJoin(F.broadcast(logi.select(
            F.col("w0").alias("log_w0"), F.col("w1").alias("log_w1"))))
        .select(
            F.round("iv", 6).alias("iv"),
            "n_categories",
            "n_skipped",
            F.round("lin_w0", 5).alias("lin_w0"),
            F.round("lin_w1", 5).alias("lin_w1"),
            F.round("log_w0", 5).alias("log_w0"),
            F.round("log_w1", 5).alias("log_w1"),
        )
    )


def q_dict_hierarchy(spark, d):
    """dictGetHierarchy / dictIsIn over a hierarchical dictionary built
    from nation (child = n_nationkey, parent = n_nationkey DIV 2; 0 is
    CH's stop sentinel), probed per customer key.  The chain walk is a
    pure-JVM map-literal fold (relational.dict_hierarchy — the bounded
    broadcast-dict stance); oracle: DuckDB WITH RECURSIVE replay of the
    same walk."""
    nat = _t(spark, d, "nation").select(
        F.col("n_nationkey").alias("child"),
        F.expr("n_nationkey DIV 2").alias("parent"),
    )
    cust = _t(spark, d, "customer").select(
        "c_custkey", F.pmod("c_custkey", F.lit(25)).alias("k")
    )
    out = relational.dict_hierarchy(
        cust, nat, "k", "child", "parent", ancestor=1
    )
    return out.select(
        "c_custkey",
        F.array_join(
            F.transform("hierarchy", lambda x: x.cast("string")), ","
        ).alias("hier"),
        F.col("hierarchy_isin").alias("isin"),
    ).orderBy("c_custkey")


def q_ann_ivf_recall(spark, d):
    """Full-probe IVF identity check (VERDICT r7 #5): with n_probe =
    n_lists the IVF search must return EXACTLY the exact cosine top-k —
    every corpus vector lives in exactly one inverted list and probing
    all lists reaches all of them, so any lost/duplicated candidate in
    the assign/probe/rerank machinery flips the hash.  Oracle: the same
    DuckDB exact-top-k construction that proves cosine_topk
    (_COSINE_ORACLE); this turns the ANN plumbing from rows-only into a
    hash-proven identity, while the pruned-probe production entries
    (ann_ivf_topk, n_probe=4) stay rows-only by design."""
    emb = _t(spark, d, "embeddings")
    queries_df = emb.filter("vec_id < 10")
    return similarity.ivf_cosine_topk(
        queries_df, emb, k=5, n_lists=16, n_probe=16
    )


def q_ann_recall_suite(spark, d):
    """Recall-against-exact companions for the SEEDED ANN family (VERDICT
    r7 #5): one row per method, ``hits`` = |ANN∩exact| and ``total`` =
    |exact| on the fixture's 10 probe queries (or all near-dup pairs):

      lsh      — ann_cosine_topk at bits=4/tables=16 (recall-tuned config
                 so the pin is a meaningful fraction, not 1/50) vs exact
                 cosine top-5
      pq       — pq_topk over the prebuilt index, rerank=50, vs top-5
      ivfpq    — ivfpq_search over the prebuilt index, n_probe=4,
                 rerank=40, vs top-5
      pair_lsh — embedding_dedup_candidates at bits=4/tables=12 vs the
                 exact cosine pair set ≥ 0.4

    DuckDB cannot replay the seeded hyperplanes/k-means, so the oracle
    PINS the measured hit counts per fixture scale (keyed on the
    lineitem cardinality — embeddings is 500 rows at both small scales).
    What the pin guards: silent recall collapse in any candidate path
    and drift in the exact side (whose own exactness is hash-proven by
    cosine_topk/embedding_dedup and the full-probe identity
    ann_ivf_recall).  Integer hit counts over seeded deterministic
    shortlists are stable run-to-run; a parameter or algorithm change
    that moves recall MUST re-measure and re-pin, which is exactly the
    reviewable event the entry exists to force."""
    emb = _t(spark, d, "embeddings")
    queries_df = emb.filter("vec_id < 10")
    exact = similarity.cosine_topk(queries_df, emb, k=5).select(
        "query_id", "neighbor_id"
    )

    def topk_row(method, ann_df):
        hits = ann_df.select("query_id", "neighbor_id").join(
            exact, ["query_id", "neighbor_id"]
        )
        return (
            hits.agg(F.count(F.lit(1)).alias("hits"))
            .crossJoin(exact.agg(F.count(F.lit(1)).alias("total")))
            .select(F.lit(method).alias("method"), "hits", "total")
        )

    lsh = topk_row(
        "lsh",
        similarity.ann_cosine_topk(queries_df, emb, k=5, bits=4, tables=16),
    )
    embn = similarity.normalize(emb)
    qn = embn.filter("vec_id < 10")
    idx = _index_cache_dir(d, "pq")
    if not os.path.isdir(os.path.join(idx, "codes")):
        similarity.pq_build_index(embn, idx, m=16, k=64)
    cb, enc = similarity.pq_load_index(spark, idx)
    pq = topk_row("pq", similarity.pq_topk(qn, enc, cb, k=5, rerank=50))
    idx2 = _index_cache_dir(d, "ivfpq")
    if not os.path.isdir(os.path.join(idx2, "codes")):
        similarity.ivfpq_build_index(embn, idx2, n_lists=8, m=16, k_codes=32)
    cent, cb2, enc2 = similarity.ivfpq_load_index(spark, idx2)
    ivfpq = topk_row(
        "ivfpq",
        similarity.ivfpq_search(
            qn, cent, cb2, enc2, k=5, n_probe=4, rerank=40
        ),
    )
    exact_pairs = similarity.cosine_dedup_pairs(emb, cos_threshold=0.4).select(
        "id_a", "id_b"
    )
    pair_hits = (
        similarity.embedding_dedup_candidates(
            emb, cos_threshold=0.4, bits=4, tables=12
        )
        .select("id_a", "id_b")
        .join(exact_pairs, ["id_a", "id_b"])
    )
    pair_lsh = (
        pair_hits.agg(F.count(F.lit(1)).alias("hits"))
        .crossJoin(exact_pairs.agg(F.count(F.lit(1)).alias("total")))
        .select(F.lit("pair_lsh").alias("method"), "hits", "total")
    )
    return (
        lsh.union(pq).union(ivfpq).union(pair_lsh)
        .select(
            "method",
            F.col("hits").cast("long").alias("hits"),
            F.col("total").cast("long").alias("total"),
        )
        .orderBy("method")
    )


def q_training_shards(spark, d):
    """Equal-token training-shard assignment
    (sampling.assign_training_shards — the trainer-facing layout step
    after curation): each document lands in the shard containing its
    START offset in the global md5(id)-ordered token stream, documents
    never split.  The global running sum is a TWO-LEVEL prefix sum (256
    md5-prefix buckets: within-bucket window cumsum + result-shaped
    bucket-offset cumsum) — never a single-partition global window.
    Fully engine-portable (md5 order key, integer DIV), so the oracle
    replays the exact assignment in DuckDB."""
    docs = _t(spark, d, "documents").select("doc_id", "text")
    out = sampling.assign_training_shards(docs, 2000)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("shard").cast("long").alias("shard"),
    ).orderBy("doc_id")


def q_api_query_roundtrip(spark, d):
    """End-to-end probe of the endpoint facade's GLUE (VERDICT r7 #7):
    the query goes through ``api.query`` — ClickHouse-dialect
    translation, statement routing, page clamping, row serialization —
    not straight to the operator, so the facade itself is driver-checked
    every round (analog of the reference POSTing user SQL to its /query
    endpoint, server/server.js:817-866).  The returned page (a bounded
    list of dicts, the endpoint's own contract) is lifted back into a
    DataFrame with an explicit schema so the driver can hash it."""
    from clickhouse_flatfile_tool_spark import api

    _t(spark, d, "orders").createOrReplaceTempView("api_orders")
    res = api.query(
        spark,
        "SELECT o_orderstatus, count() AS n, "
        "round(avg(o_totalprice), 2) AS avg_price, "
        "toInt64(max(o_custkey)) AS max_ck "
        "FROM api_orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
        page=1,
        page_size=100,
    )
    assert res["success"], res
    return spark.createDataFrame(
        [
            (r["o_orderstatus"], r["n"], r["avg_price"], r["max_ck"])
            for r in res["data"]
        ],
        "o_orderstatus string, n long, avg_price double, max_ck long",
    )


# ---------------------------------------------------------------------------
# ROUND-10 DRIVER WINDOW (the first 50 slots of queries()).  The driver
# checks only these per round; queries() hoists this list to the front of
# the registry, so each round's rotation is a ONE-LIST edit pasted from
# `scripts/registry_window.py --suggest` (unproven first, then proven
# filler by OLDEST last-green round — VERDICT r9 #3's systematic
# re-verification of greens that fingerprints can't see drift for).
#
# r10 composition — all 47 stale entries fit, so NO deferral this round:
#   1-3   the VERDICT r9 #2 oracle upgrades (pca_project pinned-integer
#         verification frame, sequence_count regex-count oracle,
#         bpe_merges unrolled-CTE oracle) — edited entries, re-prove;
#   4     training_shards — ADVICE r9 comment fix in sampling.py staled it;
#   5-47  the dialect family — staled as one block by the expansion-guard
#         budget fix (ADVICE r9; whole-module hash, deliberately coarse);
#         scripts/dialect_equiv.py proved every recorded translation
#         byte-identical across the edit, and selfcheck re-proved all at
#         sf0.001 + sf0.01 before rotation;
#   48-50 four more rows-only upgrades landed mid-round: embedding_clusters
#         (seeded k-means report pinned per scale), the new semdedup_valid
#         companion (identities + pinned survivor count), and the two HLL
#         entries' exact replays (lg_k=14 sparse-exact at fixture
#         cardinalities, measured 0 diff at all scales) — uniq_state_merge
#         takes the last slot and hll_rollup is DEFERRED one round with
#         selfcheck evidence (the r8 WITH-FILL precedent; see
#         registry_window.DEFERRED), so r10 ships 50 unproven exactly.
#         Oldest-green rotation starts at full width in r11 (~45+ filler
#         slots in a dialect-free round; min(last_green_round) is now a
#         printed audit metric).
# ---------------------------------------------------------------------------
_WINDOW_R10 = [
    "pca_project",
    "sequence_count",
    "bpe_merges",
    "training_shards",
    "with_totals",
    "with_fill",
    "with_fill_interp",
    "dialect_batch26",
    "dialect_batch27",
    "clickhouse_funcs3",
    "clickhouse_funcs4",
    "dialect_batch16",
    "dialect_final",
    "sequence_next_node",
    "dialect_geo",
    "dialect_batch17",
    "dialect_clauses",
    "distinct_on",
    "dialect_ips",
    "dialect_aggs2",
    "dialect_dates2",
    "dialect_batch23_aggs",
    "clickhouse_dialect",
    "clickhouse_funcs2",
    "url_funcs",
    "clickhouse_dates",
    "dialect_asof",
    "sequence_match",
    "dialect_funnel",
    "dialect_retention",
    "dialect_stats",
    "dialect_paste",
    "dialect_batch18",
    "dialect_batch19",
    "dialect_batch19_aggs",
    "dialect_batch20",
    "dialect_batch20_aggs",
    "dialect_modifiers",
    "dialect_batch21",
    "dialect_batch21_aggs",
    "dialect_batch22",
    "dialect_batch22_aggs",
    "dialect_batch23_window",
    "dialect_batch24",
    "dialect_batch25",
    "dict_sql",
    "dialect_batch23",
    "embedding_clusters",
    "semdedup_valid",
    "uniq_state_merge",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry order matters: the correctness driver checks the FIRST 50
    # entries per round.  The window is declared in _WINDOW_R10 above and
    # hoisted to the front below; the base dict keeps its historical
    # grouping and no longer encodes the window.
    #
    # Pruned in r3 (near-duplicate variants folded into a sibling that
    # exercises the same operator family; all keep direct pytest coverage):
    #   ntile -> window_rank            distinct -> dedup_exact/groupby_agg
    #   cube -> rollup/grouping_sets    union_names/except -> setops
    #   running_sum -> range_frame      sliding_window -> tumbling_window
    #   embedding_norm -> cosine_topk   token_histogram -> topk_freq
    #   window_first_last -> window_lag map_props -> array_funcs/json_props
    base = {
        "with_totals": q_with_totals,
        "with_fill": q_with_fill,
        "with_fill_interp": q_with_fill_interp,
        "pipeline_incremental_append": q_pipeline_incremental_append,
        "sketch_error": q_sketch_error,
        "pack_valid": q_pack_valid,
        "pagerank_docs": q_pagerank_docs,
        "training_shards": q_training_shards,
        "ann_recall_suite": q_ann_recall_suite,
        "pipeline_incremental_prebuilt": q_pipeline_incremental_prebuilt,
        "dialect_batch26": q_dialect_batch26,
        "dialect_batch27": q_dialect_batch27,
        "clickhouse_funcs3": q_clickhouse_funcs3,
        "clickhouse_funcs4": q_clickhouse_funcs4,
        "dialect_batch16": q_dialect_batch16,
        "dialect_final": q_dialect_final,
        "sequence_next_node": q_sequence_next_node,
        "dialect_geo": q_dialect_geo,
        "dialect_batch17": q_dialect_batch17,
        "dialect_clauses": q_dialect_clauses,
        "distinct_on": q_distinct_on,
        "dialect_ips": q_dialect_ips,
        "dialect_aggs2": q_dialect_aggs2,
        "dialect_dates2": q_dialect_dates2,
        "dialect_batch23_aggs": q_dialect_batch23_aggs,
        "clickhouse_dialect": q_clickhouse_dialect,
        "clickhouse_funcs2": q_clickhouse_funcs2,
        "url_funcs": q_url_funcs,
        "clickhouse_dates": q_clickhouse_dates,
        "dialect_asof": q_dialect_asof,
        "sequence_match": q_sequence_match,
        "dialect_funnel": q_dialect_funnel,
        "dialect_retention": q_dialect_retention,
        "dialect_stats": q_dialect_stats,
        "dialect_paste": q_dialect_paste,
        "dialect_batch18": q_dialect_batch18,
        "dialect_batch19": q_dialect_batch19,
        "dialect_batch19_aggs": q_dialect_batch19_aggs,
        "dialect_batch20": q_dialect_batch20,
        "dialect_batch20_aggs": q_dialect_batch20_aggs,
        "dialect_modifiers": q_dialect_modifiers,
        "dialect_batch21": q_dialect_batch21,
        "dialect_batch21_aggs": q_dialect_batch21_aggs,
        "dialect_batch22": q_dialect_batch22,
        "dialect_batch22_aggs": q_dialect_batch22_aggs,
        "dialect_batch23_window": q_dialect_batch23_window,
        "dialect_batch24": q_dialect_batch24,
        "dialect_batch25": q_dialect_batch25,
        "dict_sql": q_dict_sql,
        "dialect_batch23": q_dialect_batch23,
        # ---- slot 51+: below the window -----------------------------------
        # r8 window leads displaced by the r9 rotation — all 50/50 green
        # at the r8 HEAD (CORRECTNESS_r08) and untouched by any r9 edit
        "dict_hierarchy": q_dict_hierarchy,
        "pipeline_incremental": q_pipeline_incremental,
        "api_query_roundtrip": q_api_query_roundtrip,
        "ann_ivf_recall": q_ann_ivf_recall,
        "dedup_incremental": q_dedup_incremental,
        "ml_aggregates": q_ml_aggregates,
        "pipeline_e2e": q_pipeline_e2e,
        "text_similarity": q_text_similarity,
        # ------------------------------------------------------------------
        # tail: proven green in CORRECTNESS_r01-r05; order immaterial
        # (summap_merge/domain_block/strip_html/winnow/mutual_nn/anova displaced
        # by the r6 batch-20/modifiers/rank_assoc/stream entries -- all
        # r5-green, untouched by any r6 edit; cramers_v and
        # stream_near_dedup stay in the window because r6 edits changed
        # their output/fixture)
        # ------------------------------------------------------------------
        "tpch_q13": q_tpch_q13,
        "tpch_q16": q_tpch_q16,
        "cramers_v": q_cramers_v,
        "stream_near_dedup": q_stream_near_dedup,
        # r7 mid-round rotation: c4_rules / exactsubstr_dedup /
        # mad_outliers / stream_curation (all r6-proven, untouched by any
        # r7 edit) moved to the tail to free window slots for the four
        # new r7 entries (dialect_batch26/27, text_similarity,
        # ml_aggregates)
        "c4_rules": q_c4_rules,
        "rank_assoc": q_rank_assoc,
        "minhash_portable": q_minhash_portable,
        "hypothesis_tests": q_hypothesis_tests,
        "exactsubstr_dedup": q_exactsubstr_dedup,
        "mad_outliers": q_mad_outliers,
        "stream_curation": q_stream_curation,
        "asof_join": q_asof_join,
        "tpch_q9": q_tpch_q9,
        "tpch_q11": q_tpch_q11,
        "tpch_q12": q_tpch_q12,
        "replacing_final": q_replacing_final,
        "anova": q_anova,
        "knn_accuracy": q_knn_accuracy,
        "semantic_decon": q_semantic_decon,
        "mutual_nn": q_mutual_nn,
        "winnow": q_winnow,
        "strip_html": q_strip_html,
        "summap_merge": q_summap_merge,
        "domain_block": q_domain_block,
        "outliers": q_outliers,
        "tpch_q2": q_tpch_q2,
        "tpch_q15": q_tpch_q15,
        "tpch_q17": q_tpch_q17,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "pack_bestfit": q_pack_bestfit,
        "value_entropy": q_value_entropy,
        "corr_matrix": q_corr_matrix,
        "margin_pairs": q_margin_pairs,
        "sparkbar": q_sparkbar,
        "ttl_expire": q_ttl_expire,
        "projection_agg": q_projection_agg,
        "lttb_downsample": q_lttb_downsample,
        "embedding_drift": q_embedding_drift,
        "mutation_update": q_mutation_update,
        "image_neardup": q_image_neardup,
        "ema_recursive": q_ema_recursive,
        "uniq_state_merge": q_uniq_state_merge,
        "jsonl_scan": q_jsonl_scan,
        "winsorize": q_winsorize,
        "paragraph_dedup": q_paragraph_dedup,
        "zipf_fit": q_zipf_fit,
        "pr_curve": q_pr_curve,
        "tpch_q3": q_tpch_q3,
        "tpch_q8": q_tpch_q8,
        "tpch_q4": q_tpch_q4,
        "tpch_q7": q_tpch_q7,
        "tpch_q10": q_tpch_q10,
        "tpch_q22": q_tpch_q22,
        "max_intersections": q_max_intersections,
        "hard_negatives": q_hard_negatives,
        "variant_props": q_variant_props,
        "bmp_meta": q_bmp_meta,
        "hybrid_rrf": q_hybrid_rrf,
        "ccnet_buckets": q_ccnet_buckets,
        "nb_quality": q_nb_quality,
        "paste_join": q_paste_join,
        "ewma": q_ewma,
        "bpe_fertility": q_bpe_fertility,
        "pipeline_curation": q_pipeline_curation,
        "tumbling_window": q_tumbling_window,
        "pq_topk": q_pq_topk,
        "ivfpq_topk": q_ivfpq_topk,
        "hll_rollup": q_hll_rollup,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_dedup_lsh": q_embedding_dedup_lsh,
        "simhash_verified": q_simhash_verified,
        "pca_project": q_pca_project,
        "sequence_count": q_sequence_count,
        "bpe_merges": q_bpe_merges,
        "embedding_clusters": q_embedding_clusters,
        "stream_enrich": q_stream_enrich,
        "stream_quality_gate": q_stream_quality_gate,
        "clickhouse_aggs": q_clickhouse_aggs,
        "dict_lookup": q_dict_lookup,
        "sql_tpch": q_sql_tpch,
        "sql_recursive": q_sql_recursive,
        "mrl_topk": q_mrl_topk,
        "gram_matrix": q_gram_matrix,
        "cosine_topk": q_cosine_topk,
        "minhash_candidates": q_minhash_candidates,
        "minhash_dedup": q_minhash_dedup,
        "tpch_q1": q_tpch_q1,
        "tpch_q5": q_tpch_q5,
        "tpch_q6": q_tpch_q6,
        "tpch_q14": q_tpch_q14,
        "tpch_q18": q_tpch_q18,
        "tpch_q19": q_tpch_q19,
        "window_funnel": q_window_funnel,
        "stream_mv": q_stream_mv,
        "corpus_stats": q_corpus_stats,
        "gopher_rules": q_gopher_rules,
        "boilerplate": q_boilerplate,
        "decontaminate": q_decontaminate,
        "semantic_dedup": q_semantic_dedup,
        "semdedup_valid": q_semdedup_valid,
        "bigram_surprisal": q_bigram_surprisal,
        "mixture_weights": q_mixture_weights,
        "token_budget": q_token_budget,
        "aggregating_final": q_aggregating_final,
        "drift_psi": q_drift_psi,
        "approx_topk": q_approx_topk,
        "char_entropy": q_char_entropy,
        "png_meta": q_png_meta,
        "pmi_collocations": q_pmi_collocations,
        "retention_cohorts": q_retention_cohorts,
        "length_trim": q_length_trim,
        "doc_fingerprint": q_doc_fingerprint,
        "latest_per_key": q_latest_per_key,
        "equiheight_hist": q_equiheight_hist,
        "debounce_events": q_debounce_events,
        "topk_per_group": q_topk_per_group,
        "skew_report": q_skew_report,
        "corr_stats": q_corr_stats,
        "profile_table": q_profile_table,
        "csv_quoted": q_csv_quoted,
        "normalize_unicode": q_normalize_unicode,
        "cms_estimate": q_cms_estimate,
        "bloom_decontaminate": q_bloom_decontaminate,
        "retention_flags": q_retention_flags,
        "shared_spans": q_shared_spans,
        "dsir_weights": q_dsir_weights,
        "mv_incremental": q_mv_incremental,
        "dedup_policy": q_dedup_policy,
        "canonical_dedup": q_canonical_dedup,
        "cdc_chunks": q_cdc_chunks,
        "fuzzy_pairs": q_fuzzy_pairs,
        "any_join": q_any_join,
        "jpeg_meta": q_jpeg_meta,
        "bm25_rank": q_bm25_rank,
        "stream_tumbling": q_stream_tumbling,
        "stream_dedup": q_stream_dedup,
        "stream_session": q_stream_session,
        "stream_stateful": q_stream_stateful,
        "stream_interval_join": q_stream_interval_join,
        "simhash_candidates": q_simhash_candidates,
        "ann_topk": q_ann_topk,
        "embedding_dedup": q_embedding_dedup,
        "multimodal_join": q_multimodal_join,
        "multimodal_features": q_multimodal_features,
        "multimodal_frames": q_multimodal_frames,
        "connected_components": q_connected_components,
        "dedup_cc": q_dedup_cc,
        "collapsing_final": q_collapsing_final,
        "summing_final": q_summing_final,
        "hier_rollup": q_hier_rollup,
        "pipeline_filter_dedup": q_pipeline_filter_dedup,
        "pipeline_train_prep": q_pipeline_train_prep,
        "tfidf_terms": q_tfidf_terms,
        "repetition_metrics": q_repetition_metrics,
        "unigram_surprisal": q_unigram_surprisal,
        "sequence_funnel": q_sequence_funnel,
        "gap_fill": q_gap_fill,
        "gap_fill_interp": q_gap_fill_interp,
        "forward_fill": q_forward_fill,
        "pack_sequences": q_pack_sequences,
        "dataset_mixture": q_dataset_mixture,
        "wav_meta": q_wav_meta,
        "reservoir_k": q_reservoir_k,
        "quantiles_multi": q_quantiles_multi,
        "topk_freq": q_topk_freq,
        "range_frame": q_range_frame,
        "window_dist": q_window_dist,
        "edit_distance": q_edit_distance,
        "containment": q_containment,
        "null_semantics": q_null_semantics,
        "integrity_check": q_integrity_check,
        "quantize_embeddings": q_quantize_embeddings,
        "array_funcs": q_array_funcs,
        "string_funcs": q_string_funcs,
        "preview_page": q_preview_page,
        "count": q_count,
        "filter_project": q_filter_project,
        "join_chain": q_join_chain,
        "groupby_agg": q_groupby_agg,
        "topk": q_topk,
        "setops": q_setops,
        "window_rank": q_window_rank,
        "window_lag": q_window_lag,
        "rollup": q_rollup,
        "array_explode": q_array_explode,
        "unpivot": q_unpivot,
        "left_join": q_left_join,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "range_join": q_range_join,
        "full_join": q_full_join,
        "event_range_join": q_event_range_join,
        "salted_join": q_salted_join,
        "grouping_sets": q_grouping_sets,
        "agg_stats": q_agg_stats,
        "scalar_funcs": q_scalar_funcs,
        "pivot": q_pivot,
        "json_props": q_json_props,
        "session_window": q_session_window,
        "event_funnel": q_event_funnel,
        "dedup_exact": q_dedup_exact,
        "text_metrics": q_text_metrics,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "redact_pii": q_redact_pii,
        "chunk_text": q_chunk_text,
        "hash_split": q_hash_split,
        "ngram_jaccard": q_ngram_jaccard,
        # stream_tws DEREGISTERED (r6 decision, VERDICT r5 #4): Spark 4's
        # transformWithStateInPandas requires the google.protobuf Python
        # runtime for its state-server wire protocol; the module is absent
        # from this container and cannot be installed, so the entry could
        # never produce driver evidence here.  The operator itself
        # (stream_ops.user_event_stats_tws) stays in the library for real
        # clusters, with a pytest batch-equivalence test that runs wherever
        # protobuf exists (tests/test_events_streaming.py::
        # test_user_event_stats_tws); the same per-user aggregation
        # semantics are driver-proven via stream_stateful
        # (applyInPandasWithState).  q_stream_tws is kept importable so the
        # pytest variant and external users can still call it.
    }
    # hoist the declared window to the front (dict.update on existing keys
    # keeps head's insertion order, so the remainder follows in base order)
    head = {n: base[n] for n in _WINDOW_R10}
    head.update(base)
    return head


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL over the same parquet views)
# ---------------------------------------------------------------------------

_WORDS = "string_split_regex(trim(lower(text)), '\\s+')"
_NTOK = f"len({_WORDS})"
_FP = "md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))"
_BPE = r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]'))"
_PUNCT = r"len(regexp_extract_all(text, '[^\w\s]'))"

# shingle list (3-gram over words), DuckDB: 1-based inclusive list slicing
_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)),"
    " i -> array_to_string(w[i:i+2], ' ')))"
)


def _duck_incr_day(k: str, delta: str, corpus: str) -> str:
    """One day of the incremental funnel as a DuckDB CTE chain with
    suffix ``k`` (shared by the pipeline_incremental_append oracle's two
    days): gopher → c4 → exact-vs-corpus + within-delta min-id →
    (delta×corpus ∪ within-delta) md5-LSH → Jaccard ≥ 0.8 drops the
    delta doc → trigram decontamination vs the shared bench shingles
    (``bsh``).  Emits ``acc{k}`` (accepted doc_id+text) and
    ``funnel{k}``.  Same construction as the inline pipeline_incremental
    oracle — kept textually separate so that entry's proven string stays
    byte-stable."""
    mh = ", ".join(f"min(md5(s || '#{i}')) AS mh_{i}" for i in range(16))

    def band(tbl: str) -> str:
        return " UNION ALL ".join(
            f"SELECT id, {b} AS band, md5("
            + " || '|' || ".join(f"mh_{b * 4 + r}" for r in range(4))
            + f") AS bucket FROM {tbl}"
            for b in range(4)
        )

    sh = _SHINGLES
    return (
        f"gm{k} AS MATERIALIZED (SELECT doc_id, text, "
        f"  string_split_regex(trim(lower(text)), '\\s+') AS w FROM {delta}), "
        f"g{k} AS MATERIALIZED (SELECT doc_id, text FROM gm{k} WHERE "
        "  len(w) BETWEEN 10 AND 100000 "
        "  AND length(regexp_replace(text, '\\s+', '', 'g')) / greatest(len(w), 1) "
        "    BETWEEN 2.0 AND 12.0 "
        "  AND len(regexp_extract_all(text, '[^\\w\\s]')) / greatest(length(text), 1) <= 0.1 "
        "  AND len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) / greatest(len(w), 1) >= 0.8 "
        "  AND len(list_intersect(w, ['the', 'a', 'and', 'of', 'to'])) >= 2), "
        f"c4{k} AS MATERIALIZED (SELECT doc_id, text FROM g{k} WHERE "
        "  len(regexp_extract_all(coalesce(array_to_string(list_filter("
        "    string_split(text, chr(10)), "
        "    l -> regexp_matches(trim(l), '[.!?\"]$') "
        "      AND len(string_split_regex(trim(l), '\\s+')) >= 5 "
        "      AND NOT contains(lower(l), 'javascript')), chr(10)), ''), "
        "    '[.!?]')) >= 3 "
        "  AND NOT contains(text, '{') AND NOT contains(lower(text), 'lorem ipsum')), "
        f"cfp{k} AS MATERIALIZED (SELECT DISTINCT "
        f"  md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp FROM {corpus}), "
        f"fr{k} AS MATERIALIZED (SELECT doc_id, text, fp FROM "
        "  (SELECT doc_id, text, "
        f"    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp FROM c4{k}) "
        f"  WHERE fp NOT IN (SELECT fp FROM cfp{k})), "
        f"ex{k} AS MATERIALIZED (SELECT min(doc_id) AS doc_id FROM fr{k} GROUP BY fp), "
        f"s3{k} AS MATERIALIZED (SELECT fr{k}.doc_id, fr{k}.text FROM fr{k} "
        f"  JOIN ex{k} USING (doc_id)), "
        f"b3{k} AS MATERIALIZED (SELECT doc_id AS id, {sh} AS sh "
        f"  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM s3{k})), "
        f"bc{k} AS MATERIALIZED (SELECT doc_id AS id, {sh} AS sh "
        f"  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM {corpus})), "
        f"sigd{k} AS MATERIALIZED (SELECT id, {mh} "
        f"  FROM (SELECT id, unnest(sh) AS s FROM b3{k}) GROUP BY id), "
        f"sigc{k} AS MATERIALIZED (SELECT id, {mh} "
        f"  FROM (SELECT id, unnest(sh) AS s FROM bc{k}) GROUP BY id), "
        f"bd{k} AS MATERIALIZED ({band(f'sigd{k}')}), "
        f"bcb{k} AS MATERIALIZED ({band(f'sigc{k}')}), "
        f"cand{k} AS MATERIALIZED ("
        f"  SELECT DISTINCT c.id AS id_a, d.id AS id_b FROM bcb{k} c "
        f"    JOIN bd{k} d ON c.band = d.band AND c.bucket = d.bucket "
        "  UNION "
        f"  SELECT DISTINCT a.id, b.id FROM bd{k} a "
        f"    JOIN bd{k} b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id), "
        f"allsh{k} AS MATERIALIZED (SELECT * FROM bc{k} UNION ALL SELECT * FROM b3{k}), "
        f"jac{k} AS MATERIALIZED (SELECT DISTINCT c.id_b FROM cand{k} c "
        f"  JOIN allsh{k} x ON c.id_a = x.id JOIN allsh{k} y ON c.id_b = y.id "
        "  WHERE len(list_intersect(x.sh, y.sh))::DOUBLE "
        "    / len(list_distinct(x.sh || y.sh)) >= 0.8), "
        f"s4{k} AS MATERIALIZED (SELECT doc_id, text FROM s3{k} "
        f"  WHERE doc_id NOT IN (SELECT id_b FROM jac{k})), "
        f"b4{k} AS MATERIALIZED (SELECT doc_id AS id, {sh} AS sh "
        f"  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM s4{k})), "
        f"cont{k} AS MATERIALIZED (SELECT DISTINCT t.id FROM "
        f"  (SELECT id, unnest(sh) AS s FROM b4{k}) t JOIN bsh b ON t.s = b.s), "
        f"s5{k} AS MATERIALIZED (SELECT doc_id FROM s4{k} "
        f"  WHERE doc_id NOT IN (SELECT id FROM cont{k})), "
        f"acc{k} AS MATERIALIZED (SELECT t.doc_id, t.text FROM s4{k} t "
        f"  JOIN s5{k} USING (doc_id)), "
        f"funnel{k} AS ("
        f"  SELECT 0 AS stage_idx, 'input' AS stage, (SELECT count(*) FROM {delta}) AS docs "
        f"  UNION ALL SELECT 1, 'gopher', (SELECT count(*) FROM g{k}) "
        f"  UNION ALL SELECT 2, 'c4', (SELECT count(*) FROM c4{k}) "
        f"  UNION ALL SELECT 3, 'exact', (SELECT count(*) FROM s3{k}) "
        f"  UNION ALL SELECT 4, 'neardup', (SELECT count(*) FROM s4{k}) "
        f"  UNION ALL SELECT 5, 'decontaminate', (SELECT count(*) FROM s5{k}))"
    )


def _pipeline_append_oracle() -> str:
    """Two-day funnel replay for pipeline_incremental_append: day 2's
    corpus is corpus ∪ acc1 — exactly what the appended artifact tables
    represent on the Spark side."""
    return (
        "WITH alldocs AS MATERIALIZED (SELECT doc_id, "
        "  regexp_replace(text, '(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ', "
        "  '\\1.' || chr(10), 'g') AS text FROM documents), "
        "corpus AS MATERIALIZED (SELECT doc_id, text FROM alldocs WHERE doc_id % 4 = 0), "
        "bench AS MATERIALIZED (SELECT doc_id, text FROM alldocs WHERE doc_id % 20 = 1), "
        "bsh AS MATERIALIZED (SELECT DISTINCT s FROM (SELECT unnest("
        "  list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)), "
        "    i -> array_to_string(w[i:i+2], ' ')))) AS s "
        "  FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS w FROM bench))), "
        "nat1 AS MATERIALIZED (SELECT doc_id, text FROM alldocs "
        "  WHERE doc_id % 4 = 1 AND doc_id % 20 <> 1), "
        "delta1 AS MATERIALIZED (SELECT doc_id, text FROM nat1 "
        "  UNION ALL SELECT doc_id + 10000000, text FROM corpus WHERE doc_id % 8 = 0), "
        + _duck_incr_day("1", "delta1", "corpus")
        + ", corpus2 AS MATERIALIZED (SELECT doc_id, text FROM corpus "
        "  UNION ALL SELECT doc_id, text FROM acc1), "
        "delta2 AS MATERIALIZED (SELECT doc_id, text FROM alldocs "
        "  WHERE doc_id % 4 >= 2 AND doc_id % 20 <> 1 "
        "  UNION ALL SELECT doc_id + 30000000, text FROM nat1 "
        "  UNION ALL SELECT doc_id + 40000000, "
        "    text || ' appended near duplicate tail words here' FROM nat1), "
        + _duck_incr_day("2", "delta2", "corpus2")
        + " SELECT stage_idx::INT AS stage_idx, stage, docs::BIGINT AS docs, "
        "coalesce(lag(docs) OVER (ORDER BY stage_idx) - docs, 0)::BIGINT AS dropped, "
        "0::BIGINT AS modified "
        "FROM funnel2 ORDER BY stage_idx"
    )


# sketch_error pinned HLL estimates per scale (a1=sf0.001, a2=sf0.01,
# a3=sf0.1; measured from q_sketch_error itself — the mv_refresh FOLD of
# daily states, which differs from a direct one-shot sketch).  The lgk4
# estimates are identical across types because every fixture user emits
# every event type (the per-type user sets coincide).
_SKETCH_PINS = ", ".join(
    f"('{dim}', {a1}, {a2}, {a3})"
    for dim, a1, a2, a3 in [
        ("day_rollup_sum", 397, 4006, 40083),
        ("lgk4:click", 13, 115, 1204),
        ("lgk4:error", 13, 115, 1204),
        ("lgk4:purchase", 13, 115, 1204),
        ("lgk4:signup", 13, 115, 1204),
        ("lgk4:view", 13, 115, 1204),
        ("type:click", 15, 150, 1500),
        ("type:error", 15, 150, 1500),
        ("type:purchase", 15, 150, 1500),
        ("type:signup", 15, 150, 1500),
        ("type:view", 15, 150, 1500),
    ]
)


def _pagerank_oracle() -> str:
    """pagerank_docs replay: the planted-star pair graph (hub + two
    long-tail variants at threshold 0.7) and 10 power-iteration rounds
    UNROLLED as CTEs — rank = 0.15 + 0.85·Σ(rank_src/deg_src), ranks
    carry degree so each round is one join + one groupBy, exactly
    dedup.pagerank's update."""
    rounds = [
        "r0 AS MATERIALIZED (SELECT src, deg, 1.0::DOUBLE AS rank FROM degs)"
    ]
    for i in range(1, 11):
        rounds.append(
            f"c{i} AS MATERIALIZED (SELECT e.dst AS src, "
            f"sum(r.rank / r.deg) AS recv FROM edges e "
            f"JOIN r{i - 1} r ON e.src = r.src GROUP BY e.dst), "
            f"r{i} AS MATERIALIZED (SELECT d.src, d.deg, "
            f"0.15 + 0.85 * coalesce(c.recv, 0.0) AS rank "
            f"FROM degs d LEFT JOIN c{i} c ON d.src = c.src)"
        )
    return (
        "WITH docs AS MATERIALIZED (SELECT doc_id, text FROM documents "
        f"UNION ALL SELECT doc_id + 50000000, text || ' {_PR_TAIL_A}' "
        "FROM documents WHERE doc_id % 10 = 0 "
        f"UNION ALL SELECT doc_id + 60000000, text || ' {_PR_TAIL_B}' "
        "FROM documents WHERE doc_id % 10 = 0), "
        f"base AS MATERIALIZED (SELECT doc_id AS id, {_SHINGLES} AS sh "
        f"  FROM (SELECT doc_id, {_WORDS} AS w FROM docs)), "
        "sizes AS MATERIALIZED (SELECT id, len(sh) AS sz FROM base), "
        "inv AS MATERIALIZED (SELECT id, unnest(sh) AS s FROM base), "
        "shared AS MATERIALIZED (SELECT a.id AS id_a, b.id AS id_b, "
        "  count(*) AS n_shared FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id "
        "  GROUP BY a.id, b.id), "
        "prs AS MATERIALIZED (SELECT id_a, id_b FROM shared "
        "  JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b "
        "  WHERE n_shared / (sa.sz + sb.sz - n_shared) >= 0.7), "
        "edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM prs "
        "  UNION SELECT id_b, id_a FROM prs), "
        "degs AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS deg "
        "  FROM edges GROUP BY src), "
        + ", ".join(rounds)
        + " SELECT src::BIGINT AS doc_id, round(rank, 6) AS rank FROM r10 "
        "ORDER BY doc_id"
    )


def _bpe_oracle(num_merges: int = 12) -> str:
    """bpe_merges replay (VERDICT r9 #3, the pagerank_docs pattern): the
    fixed merge iterations UNROLLED as CTEs.  Each word's symbol sequence
    rides as a string with EVERY symbol wrapped in its own chr(1)
    delimiter pair (``\\x01sym\\x01`` concatenated — merged symbols could
    contain any text character, and a single shared separator both
    matches across symbol boundaries when a neighbor has the pattern's
    right side as a prefix AND breaks consecutive merges; the r10
    property test test_bpe_merge_replace_equivalence found exactly those
    two failure modes in the naive encoding).  Applying merge (l, r) is
    then ``replace(s, '\\x01l\\x01\\x01r\\x01', '\\x01lr\\x01')`` — SQL
    replace scans left-to-right and resumes AFTER each replacement,
    exactly bpe_train's greedy non-overlapping fold, and the anchored
    wrapping makes every match a full adjacent symbol pair.  Each
    iteration's winner is ORDER BY cnt DESC, l, r LIMIT 1 (bytewise
    tie-break, identical to Spark's string ordering on UTF-8); adjacent
    pairs come from DuckDB's positional parallel unnest of the shifted
    symbol lists.  Pre-checked: the documents fixture is pure printable
    ASCII at all three scales (zero chr(1) or non-\\x20-\\x7e docs), so
    the delimiter cannot collide and the char-split/lower/binary-collation
    equivalences hold trivially."""
    d = "chr(1)"
    ctes = [
        "w AS MATERIALIZED (SELECT unnest(string_split_regex("
        "trim(lower(text)), '\\s+')) AS w FROM documents)",
        "v0 AS MATERIALIZED (SELECT array_to_string(list_transform("
        f"list_filter(string_split(w, ''), x -> x <> ''), "
        f"c -> {d} || c || {d}), '') AS s, "
        "count(*)::BIGINT AS n FROM w WHERE length(w) > 0 GROUP BY w)",
    ]
    sels = []
    for i in range(num_merges):
        ctes.append(
            f"p{i} AS MATERIALIZED (SELECT l, r, sum(n)::BIGINT AS cnt "
            f"FROM (SELECT unnest(list_slice(a, 1, len(a) - 1)) AS l, "
            f"unnest(list_slice(a, 2, len(a))) AS r, n "
            f"FROM (SELECT list_filter(string_split(s, {d}), "
            f"x -> x <> '') AS a, n FROM v{i})) "
            f"WHERE l IS NOT NULL AND r IS NOT NULL GROUP BY l, r)"
        )
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT l, r, cnt FROM p{i} "
            f"ORDER BY cnt DESC, l, r LIMIT 1)"
        )
        ctes.append(
            f"v{i + 1} AS MATERIALIZED (SELECT "
            f"replace(s, (SELECT {d} || l || {d} || {d} || r || {d} "
            f"FROM m{i}), (SELECT {d} || l || r || {d} FROM m{i})) AS s, "
            f"n FROM v{i})"
        )
        sels.append(
            f"SELECT {i}::INT AS rank, l AS \"left\", r AS \"right\", "
            f"cnt AS pair_count FROM m{i}"
        )
    return (
        "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(sels)
        + " ORDER BY rank"
    )


_COSINE_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10
), pairs AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, q.qe, c.embedding AS ce
  FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.query_id
), u AS (
  SELECT query_id, neighbor_id,
         unnest(qe)::DOUBLE AS x, unnest(ce)::DOUBLE AS y
  FROM pairs
), cos AS (
  SELECT query_id, neighbor_id,
         sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS c
  FROM u GROUP BY query_id, neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, c,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk
  FROM cos
)
SELECT query_id, neighbor_id, round(c, 6) AS cos_sim
FROM ranked WHERE rk <= 5
"""

_SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM numbered GROUP BY user_id, sess
"""

_QUALITY_ORACLE = f"""
WITH m AS (
  SELECT doc_id,
         {_NTOK} AS n_tokens,
         length(regexp_replace(text, '\\s+', '', 'g'))
           / greatest({_NTOK}, 1) AS avg_word_len,
         {_PUNCT} / greatest(length(text), 1) AS punct_ratio
  FROM documents
)
SELECT doc_id,
       round(0.5 * least(n_tokens / 100.0, 1.0)
           + 0.4 * (1.0 - least(abs(avg_word_len - 5.0) / 5.0, 1.0))
           + 0.1 * (1.0 - least(punct_ratio * 4.0, 1.0)), 6) AS quality_score
FROM m
"""

_LANGID_ORACLE = f"""
WITH m AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '[一-鿿]')) AS cjk,
         len(list_intersect({_WORDS}, ['the','and','of','to','in'])) AS h_en,
         len(list_intersect({_WORDS}, ['der','die','und','nicht','das'])) AS h_de,
         len(list_intersect({_WORDS}, ['le','la','et','les','des'])) AS h_fr,
         len(list_intersect({_WORDS}, ['el','la','de','que','los'])) AS h_es
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN cjk > 0 THEN 'zh'
            WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
            WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
            WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
            WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
            ELSE 'de' END AS lang_pred
FROM m
"""

_JACCARD_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
), sizes AS (
  SELECT id, len(sh) AS sz FROM base
), inv AS (
  SELECT id, unnest(sh) AS s FROM base
), shared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
  FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       round(n_shared / (sa.sz + sb.sz - n_shared), 6) AS jaccard
FROM shared
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE n_shared / (sa.sz + sb.sz - n_shared) >= 0.5
"""

_GOPHER_ORACLE = f"""
WITH m AS (
  SELECT doc_id,
         {_NTOK} AS n_words,
         length(regexp_replace(text, '\\s+', '', 'g'))
           / greatest({_NTOK}, 1) AS mean_wl,
         {_PUNCT} / greatest(length(text), 1) AS symbol_ratio,
         len(list_filter({_WORDS}, x -> regexp_matches(x, '[a-z]')))
           / greatest({_NTOK}, 1) AS alpha_ratio,
         len(list_intersect({_WORDS},
             ['the', 'a', 'and', 'of', 'to'])) AS stop_hits
  FROM documents
), r AS (
  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         CASE WHEN n_words >= 10 AND n_words <= 100000 THEN 1 ELSE 0 END AS r_word_count,
         CASE WHEN mean_wl >= 2.0 AND mean_wl <= 12.0 THEN 1 ELSE 0 END AS r_mean_word_len,
         CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END AS r_symbol_ratio,
         CASE WHEN alpha_ratio >= 0.8 THEN 1 ELSE 0 END AS r_alpha_ratio,
         CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS r_stopwords
  FROM m
)
SELECT doc_id, n_words, r_word_count, r_mean_word_len, r_symbol_ratio,
       r_alpha_ratio, r_stopwords,
       r_word_count * r_mean_word_len * r_symbol_ratio * r_alpha_ratio
         * r_stopwords AS gopher_pass
FROM r
"""

_BOILERPLATE_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
), inv AS (
  SELECT id, unnest(sh) AS s FROM base
), df AS (
  SELECT s, count(*) AS dfreq FROM inv GROUP BY s
)
SELECT id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN dfreq >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
       round(sum(CASE WHEN dfreq >= 5 THEN 1 ELSE 0 END) / count(*), 6)
         AS boilerplate_ratio
FROM inv JOIN df USING (s)
GROUP BY id
"""

_DECONTAMINATE_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
), binv AS (
  SELECT DISTINCT s FROM (
    SELECT unnest(sh) AS s FROM base WHERE id % 20 = 0
  )
), tinv AS (
  SELECT id, unnest(sh) AS s FROM base WHERE id % 20 <> 0
)
SELECT t.id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       round(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) / count(*), 6)
         AS overlap_ratio,
       CASE WHEN sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) >= 1
            THEN 1 ELSE 0 END AS contaminated
FROM tinv t LEFT JOIN binv b ON t.s = b.s
GROUP BY t.id
"""

_CONTAINMENT_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
), sizes AS (
  SELECT id, len(sh) AS sz FROM base
), inv AS (
  SELECT id, unnest(sh) AS s FROM base
), shared AS (
  SELECT a.id AS id_small, b.id AS id_big, count(*) AS n_shared
  FROM inv a JOIN inv b ON a.s = b.s AND a.id <> b.id
  GROUP BY a.id, b.id
)
SELECT id_small, id_big, round(n_shared / sa.sz, 6) AS containment
FROM shared JOIN sizes sa ON sa.id = id_small
WHERE n_shared / sa.sz >= 0.6
"""

_INCR_DEDUP_ORACLE = f"""
WITH corpus AS (
  SELECT DISTINCT {_FP} AS fp FROM documents WHERE doc_id % 2 = 0
), batch AS (
  SELECT *, {_FP} AS fp FROM documents WHERE doc_id % 2 = 1
), fresh AS (
  SELECT b.* FROM batch b LEFT JOIN corpus c ON b.fp = c.fp WHERE c.fp IS NULL
), survivors AS (
  SELECT fp, min(doc_id) AS doc_id FROM fresh GROUP BY fp
)
SELECT f.doc_id, f.lang, f.source, f.n_chars
FROM fresh f JOIN survivors s ON f.fp = s.fp AND f.doc_id = s.doc_id
"""

# portable MinHash-LSH: md5-hex minimums are engine-independent, so the whole
# banding pipeline is hash-checkable (the xxhash64 fast path is rows-only)
_MH_MINS = ", ".join(f"min(md5(s || '#{i}')) AS mh_{i}" for i in range(16))
_MH_BANDS = " UNION ALL ".join(
    f"SELECT id, {b} AS band, "
    f"md5(mh_{4 * b} || '|' || mh_{4 * b + 1} || '|' || mh_{4 * b + 2} || '|' || mh_{4 * b + 3}) AS bucket "
    "FROM sig"
    for b in range(4)
)
_MINHASH_PORTABLE_ORACLE = f"""
WITH base AS (
  SELECT doc_id AS id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
), inv AS (
  SELECT id, unnest(sh) AS s FROM base
), sig AS (
  SELECT id, {_MH_MINS} FROM inv GROUP BY id
), banded AS (
  {_MH_BANDS}
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
"""

# recursive-CTE reachability = connected components of the Jaccard pair graph
_CC_CTES = f"""
WITH RECURSIVE base AS (
  SELECT doc_id AS id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_WORDS} AS w FROM documents)
), sizes AS (
  SELECT id, len(sh) AS sz FROM base
), inv AS (
  SELECT id, unnest(sh) AS s FROM base
), shared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
  FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
  GROUP BY a.id, b.id
), pairs AS (
  SELECT id_a, id_b
  FROM shared
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE n_shared / (sa.sz + sb.sz - n_shared) >= 0.5
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(n, c) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.d, r.c FROM reach r JOIN edges e ON e.s = r.n
), compmap AS (
  SELECT n, min(c) AS c FROM reach GROUP BY n
)
"""

_CC_ORACLE = _CC_CTES + "SELECT n AS doc_id, c AS comp FROM compmap"

_CC_DEDUP_ORACLE = _CC_CTES + (
    "SELECT doc_id, lang, source FROM documents "
    "WHERE doc_id NOT IN (SELECT n FROM compmap WHERE n != c)"
)

_MULTIMODAL_ORACLE = """
WITH h AS (
  SELECT doc_id,
         sha256(concat_ws('|', doc_id, text, lang, source, n_chars)) AS hx
  FROM documents
)
SELECT doc_id,
       64::INTEGER AS n_bytes,
       (ord(substr(hx, 1, 1))::BIGINT * 16777216
        + ord(substr(hx, 2, 1))::BIGINT * 65536
        + ord(substr(hx, 3, 1))::BIGINT * 256
        + ord(substr(hx, 4, 1))::BIGINT) AS checksum
FROM h
"""


def _erf_duck(x: str) -> str:
    """DuckDB mirror of dialect._erf_sql — IDENTICAL formula and op
    order (A&S 7.1.26), so the driver hash tests the translation while
    pytest tests accuracy against math.erf."""
    v = f"CAST(({x}) AS DOUBLE)"
    t = f"(1.0 / (1.0 + 0.3275911 * abs({v})))"
    poly = (
        f"({t} * (0.254829592 + {t} * (-0.284496736 + {t} * "
        f"(1.421413741 + {t} * (-1.453152027 + {t} * 1.061405429)))))"
    )
    return f"(sign({v}) * (1.0 - {poly} * exp(-({v}) * ({v}))))"


def _lgamma_duck(x: str) -> str:
    """DuckDB mirror of dialect._lgamma_sql (Lanczos g=7)."""
    cs = (
        "0.99999999999980993", "676.5203681218851", "-1259.1392167224028",
        "771.32342877765313", "-176.61502916214059", "12.507343278686905",
        "-0.13857109526572012", "0.0000099843695780195716",
        "0.00000015056327351493116",
    )
    z = f"CAST(({x}) AS DOUBLE)"
    acc = " + ".join(
        [cs[0]] + [f"{c} / ({z} + {i}.0)" for i, c in enumerate(cs[1:])]
    )
    return (
        f"(0.9189385332046727 + (({z}) - 0.5) * ln(({z}) + 6.5) "
        f"- (({z}) + 6.5) + ln({acc}))"
    )


def _morton_duck() -> tuple[str, str, str]:
    """DuckDB closed forms for the batch-26 morton columns."""
    me = " + ".join(
        [f"(((doc_id % 256) >> {i}) & 1) * {1 << (2 * i)}" for i in range(8)]
        + [f"(((doc_id % 77) >> {i}) & 1) * {1 << (2 * i + 1)}" for i in range(7)]
    )
    c = "((doc_id * 37) % 1024)"
    mdx = " + ".join(f"((({c}) >> {2 * i}) & 1) * {1 << i}" for i in range(5))
    mdy = " + ".join(
        f"((({c}) >> {2 * i + 1}) & 1) * {1 << i}" for i in range(5)
    )
    return me, mdx, mdy


def _logistic_duck_cte(n_iters: int = 8) -> str:
    """Unrolled IRLS replay for the ml_aggregates oracle: the SAME fixed
    8-step Newton schedule relational.logistic_regression_fit runs, as
    chained DuckDB CTEs (2x2 solve in closed form)."""
    p = "(1.0 / (1.0 + exp(-(w0 + w1 * x))))"
    parts = ["it0 AS (SELECT 0.0 AS w0, 0.0 AS w1)"]
    for k in range(1, n_iters + 1):
        parts.append(
            f"it{k} AS (SELECT "
            "w0 + (sxx * g0 - sx * g1) / (s1 * sxx - sx * sx) AS w0, "
            "w1 + (s1 * g1 - sx * g0) / (s1 * sxx - sx * sx) AS w1 "
            "FROM (SELECT max(w0) AS w0, max(w1) AS w1, "
            "sum(wt) AS s1, sum(wt * x) AS sx, sum(wt * x * x) AS sxx, "
            "sum(y - p) AS g0, sum((y - p) * x) AS g1 "
            f"FROM (SELECT x, y, w0, w1, {p} AS p, "
            f"{p} * (1.0 - {p}) AS wt "
            f"FROM mld, it{k - 1})))"
        )
    return ", ".join(parts)


def oracle_sql() -> dict[str, str]:
    tumble = "make_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) * 1000000)"
    slide5 = "CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)"
    csv_path = _ensure_csv_quoted_fixture()  # oracle reads the same bytes
    out = {
        "csv_quoted": (
            "SELECT id, name, val, note, length(name)::BIGINT AS name_len "
            f"FROM read_csv('{csv_path}', header=true, delim=',', "
            "quote='\"', escape='\"', nullstr='NULL', auto_detect=false, "
            "columns={'id': 'BIGINT', 'name': 'VARCHAR', "
            "'val': 'DOUBLE', 'note': 'VARCHAR'})"
        ),
        "preview_page": (
            "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem "
            "ORDER BY l_orderkey, l_linenumber LIMIT 100 OFFSET 200"
        ),
        "count": "SELECT count(*) AS total FROM lineitem",
        "filter_project": (
            "SELECT l_orderkey, l_linenumber, l_quantity, "
            "round(l_extendedprice * (1 - l_discount), 4) AS revenue "
            "FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'"
        ),
        "join_chain": (
            "SELECT l_orderkey, l_linenumber, o_orderdate, c_custkey, n_name, r_name, "
            "round(l_extendedprice * (1 - l_discount), 4) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey"
        ),
        "groupby_agg": (
            "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_base_price, "
            "round(avg(l_discount), 4) AS avg_disc, count(l_orderkey) AS count_order "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "topk": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "distinct": "SELECT DISTINCT c_mktsegment FROM customer",
        "setops": (
            "SELECT c_custkey FROM customer WHERE c_acctbal > 5000 "
            "INTERSECT SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
        ),
        "union_names": (
            "SELECT c_name AS name FROM customer UNION SELECT s_name AS name FROM supplier"
        ),
        "window_rank": (
            "SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, "
            "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk "
            "FROM orders) WHERE rk <= 3"
        ),
        "window_lag": (
            "SELECT o_custkey, o_orderkey, "
            "round(lag(o_totalprice) OVER w, 2) AS prev_price, "
            "round(lead(o_totalprice) OVER w, 2) AS next_price "
            "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"
        ),
        "rollup": (
            "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
            "count(l_orderkey) AS n FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
        ),
        "cube": (
            "SELECT o_orderstatus, o_orderpriority, count(o_orderkey) AS n, "
            "round(sum(o_totalprice), 2) AS sum_price "
            "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"
        ),
        "left_join": (
            "SELECT c_custkey, c_name, count(o_orderkey) AS n_orders, "
            "round(coalesce(sum(o_totalprice), 0), 2) AS sum_spend "
            "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            "GROUP BY c_custkey, c_name"
        ),
        "semi_join": (
            "SELECT c_custkey, c_name, c_mktsegment FROM customer "
            "WHERE EXISTS (SELECT 1 FROM orders "
            "WHERE o_custkey = c_custkey AND o_orderstatus = 'F')"
        ),
        "anti_join": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
        ),
        "except": (
            "SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders"
        ),
        "asof_join": (
            "WITH p AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, ts, max(value) AS click_value FROM events "
            "WHERE event_type = 'click' GROUP BY user_id, ts) "
            "SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts, "
            "round(c.click_value, 2) AS click_value "
            "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"
        ),
        "range_join": (
            "SELECT band, count(*) AS n_parts, round(sum(p_retailprice), 2) AS sum_price "
            "FROM part JOIN (VALUES (0.0, 930.0, 'low'), (930.0, 960.0, 'mid'), "
            "(960.0, 1000000000.0, 'high')) b(lo, hi, band) "
            "ON p_retailprice >= lo AND p_retailprice < hi GROUP BY band"
        ),
        "full_join": (
            "SELECT coalesce(c_nationkey, s_nationkey) AS nationkey, n_cust, n_supp "
            "FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer "
            "GROUP BY c_nationkey) "
            "FULL JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier "
            "GROUP BY s_nationkey) ON c_nationkey = s_nationkey"
        ),
        "event_range_join": (
            "SELECT p.event_id, count(*) AS n_recent_clicks "
            "FROM (SELECT event_id, user_id, epoch_us(ts) AS ep FROM events "
            "WHERE event_type = 'purchase') p "
            "JOIN (SELECT user_id, epoch_us(ts) AS ep FROM events "
            "WHERE event_type = 'click') c "
            "ON p.user_id = c.user_id AND c.ep <= p.ep AND p.ep < c.ep + 600000000 "
            "GROUP BY p.event_id"
        ),
        "map_props": (
            "SELECT event_id, 'k' AS prop_key, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS prop_val "
            "FROM events WHERE json_extract(props, '$.k') IS NOT NULL"
        ),
        "latest_per_key": (
            "SELECT user_id, event_id, event_type FROM ("
            "SELECT user_id, event_id, event_type, "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
            "FROM events) WHERE rn = 1"
        ),
        "hier_rollup": (
            "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, event_type, "
            "round(sum(value), 2) AS sum_value, count(*) AS n_events, "
            "round(min(value), 4) AS min_value, round(max(value), 4) AS max_value "
            "FROM events GROUP BY 1, 2"
        ),
        "collapsing_final": (
            "WITH src AS (SELECT user_id, ts, event_id, round(value, 4) AS value, "
            "CASE WHEN event_id % 4 = 0 THEN -1 ELSE 1 END AS sign FROM events), "
            "net AS (SELECT user_id, sum(sign) AS net FROM src GROUP BY user_id), "
            "plus AS (SELECT user_id, ts, event_id, value, "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
            "FROM src WHERE sign > 0) "
            "SELECT p.user_id, p.ts, p.event_id, p.value FROM plus p "
            "JOIN net n ON p.user_id = n.user_id WHERE p.rn = 1 AND n.net > 0"
        ),
        "replacing_final": (
            "SELECT user_id, ts, event_id, event_type FROM ("
            "SELECT user_id, ts, event_id, event_type, "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
            "FROM events) WHERE rn = 1"
        ),
        "repetition_metrics": (
            "SELECT doc_id, "
            "round(1 - len(list_distinct(str_split(text, chr(10)))) / "
            "greatest(len(str_split(text, chr(10))), 1), 6) AS dup_line_frac, "
            "round(1 - len(list_distinct(str_split_regex(trim(lower(text)), '\\s+'))) / "
            "greatest(len(str_split_regex(trim(lower(text)), '\\s+')), 1), 6) AS dup_word_frac, "
            "round(list_max(list_transform("
            "list_distinct(str_split_regex(trim(lower(text)), '\\s+')), "
            "x -> len(list_filter(str_split_regex(trim(lower(text)), '\\s+'), y -> y = x)))) / "
            "greatest(len(str_split_regex(trim(lower(text)), '\\s+')), 1), 6) AS top_word_frac "
            "FROM documents"
        ),
        "tfidf_terms": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(str_split_regex(trim(lower(text)), '\\s+')) AS term FROM documents), "
            "f AS (SELECT term, count(*) AS cf, count(DISTINCT doc_id) AS df_docs "
            "FROM toks WHERE len(term) >= 3 GROUP BY term), "
            "n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents) "
            "SELECT term, cf, df_docs, round(cf * ln(n_docs / df_docs), 6) AS tfidf "
            "FROM f, n ORDER BY tfidf DESC, term LIMIT 50"
        ),
        "clickhouse_dialect": (
            "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, "
            "count(DISTINCT user_id) AS users, CAST(count(*) AS BIGINT) AS n, "
            "CAST(strftime(ts, '%Y%m') AS INT) AS ym "
            "FROM events GROUP BY 1, 2, 5"
        ),
        "equiheight_hist": (
            "SELECT bucket, count(*) AS n_orders, round(min(o_totalprice), 2) AS lo, "
            "round(max(o_totalprice), 2) AS hi FROM ("
            "SELECT o_totalprice, ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket "
            "FROM orders) GROUP BY bucket"
        ),
        "outliers": (
            "WITH s AS (SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd "
            "FROM events GROUP BY event_type) "
            "SELECT event_id, e.event_type, round(value, 4) AS value "
            "FROM events e JOIN s ON e.event_type = s.event_type "
            "WHERE (value - mu) / sd > 2.0"
        ),
        "skew_report": (
            "SELECT count(*) AS n_keys, max(n) AS max_rows, "
            "round(avg(n), 6) AS avg_rows, round(max(n) / avg(n), 6) AS skew_ratio "
            "FROM (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey)"
        ),
        "debounce_events": (
            "SELECT event_id, user_id, event_type, ts FROM ("
            "SELECT event_id, user_id, event_type, ts, "
            "lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev "
            "FROM events) WHERE prev IS NULL OR date_diff('second', prev, ts) > 600"
        ),
        "pipeline_train_prep": (
            f"""WITH m AS (
  SELECT doc_id, text,
         {_NTOK} AS n_tokens,
         length(regexp_replace(text, '\\s+', '', 'g'))
           / greatest({_NTOK}, 1) AS avg_word_len,
         {_PUNCT} / greatest(length(text), 1) AS punct_ratio
  FROM documents
), good AS (
  SELECT doc_id, text FROM m
  WHERE round(0.5 * least(n_tokens / 100.0, 1.0)
      + 0.4 * (1.0 - least(abs(avg_word_len - 5.0) / 5.0, 1.0))
      + 0.1 * (1.0 - least(punct_ratio * 4.0, 1.0)), 6) >= 0.5
), surv AS (
  SELECT min(doc_id) AS doc_id FROM good GROUP BY {_FP}
), st AS (
  SELECT s.doc_id, d.text FROM surv s JOIN documents d ON s.doc_id = d.doc_id
), chunks AS (
  SELECT doc_id, unnest(range(0,
    CAST(floor((length(text)-1)/150)+1 AS BIGINT))) AS chunk_id
  FROM st WHERE length(text) > 0
)
SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
       THEN 'train' ELSE 'test' END AS split,
       count(*) AS n_chunks, count(DISTINCT doc_id) AS n_docs
FROM chunks GROUP BY 1"""
        ),
        "corr_stats": (
            "SELECT l_returnflag, "
            "round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price, "
            "round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "pipeline_curation": f"""
WITH train AS (SELECT * FROM documents WHERE doc_id % 20 <> 0),
gm AS (
  SELECT doc_id,
         {_NTOK} AS n_words,
         length(regexp_replace(text, '\\s+', '', 'g'))
           / greatest({_NTOK}, 1) AS mean_wl,
         {_PUNCT} / greatest(length(text), 1) AS symbol_ratio,
         len(list_filter({_WORDS}, x -> regexp_matches(x, '[a-z]')))
           / greatest({_NTOK}, 1) AS alpha_ratio,
         len(list_intersect({_WORDS}, ['the', 'a', 'and', 'of', 'to'])) AS stop_hits
  FROM train
),
g AS (
  SELECT doc_id FROM gm
  WHERE n_words >= 10 AND n_words <= 100000
    AND mean_wl >= 2.0 AND mean_wl <= 12.0
    AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.8 AND stop_hits >= 2
),
base AS (
  SELECT doc_id AS id, {_SHINGLES} AS sh
  FROM (SELECT doc_id, {_WORDS} AS w FROM train)
),
inv AS (SELECT id, unnest(sh) AS s FROM base),
dfr AS (SELECT s, count(*) AS dfreq FROM inv GROUP BY s),
bp AS (
  SELECT id AS doc_id FROM inv JOIN dfr USING (s)
  GROUP BY id
  HAVING round(sum(CASE WHEN dfreq >= 5 THEN 1 ELSE 0 END) / count(*), 6) < 0.5
),
bsh AS (
  SELECT DISTINCT s FROM (
    SELECT unnest({_SHINGLES}) AS s
    FROM (SELECT {_WORDS} AS w FROM documents WHERE doc_id % 20 = 0)
  )
),
dc AS (
  SELECT t.id AS doc_id FROM inv t LEFT JOIN bsh b ON t.s = b.s
  GROUP BY t.id
  HAVING sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) = 0
),
kept AS (
  SELECT t.doc_id, t.lang, t.text FROM train t
  JOIN g USING (doc_id) JOIN bp USING (doc_id) JOIN dc USING (doc_id)
),
c AS (
  SELECT doc_id, lang,
         sum(len(string_split_regex(trim(text), '\\s+'))) OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM kept
)
SELECT doc_id, lang FROM c WHERE cum <= 6000
""",
        "char_entropy": (
            "WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents), "
            "ch2 AS (SELECT doc_id, c FROM ch WHERE length(c) = 1), "
            "cnt AS (SELECT doc_id, c, count(*) AS n FROM ch2 GROUP BY 1, 2), "
            "tot AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS tot FROM cnt GROUP BY 1) "
            "SELECT cnt.doc_id, tot AS n_chars_counted, "
            "round(sum(-(n / CAST(tot AS DOUBLE)) * ln(n / CAST(tot AS DOUBLE))), 6) "
            "AS char_entropy "
            "FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id GROUP BY cnt.doc_id, tot"
        ),
        "approx_topk": (
            # NULLs excluded on both sides (ClickHouse topK convention)
            "SELECT CAST(o_orderpriority AS VARCHAR) AS item, count(*) AS cnt "
            "FROM orders WHERE o_orderpriority IS NOT NULL "
            "GROUP BY 1 ORDER BY cnt DESC, item LIMIT 3"
        ),
        "drift_psi": (
            "WITH b AS (SELECT doc_id % 2 AS side, "
            "CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 400 THEN 1 "
            "WHEN n_chars < 600 THEN 2 WHEN n_chars < 800 THEN 3 "
            "WHEN n_chars < 1000 THEN 4 ELSE 5 END AS bucket FROM documents), "
            "cnt AS (SELECT bucket, "
            "CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0, "
            "CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1 "
            "FROM b GROUP BY bucket), "
            "tot AS (SELECT CAST(sum(n0) AS BIGINT) AS t0, CAST(sum(n1) AS BIGINT) AS t1 FROM cnt), "
            "g AS (SELECT gs.bucket, "
            "coalesce(n0, 0) / CAST(t0 AS DOUBLE) AS p_ref, "
            "coalesce(n1, 0) / CAST(t1 AS DOUBLE) AS p_cur "
            "FROM (SELECT unnest(generate_series(0, 5)) AS bucket) gs "
            "LEFT JOIN cnt ON cnt.bucket = gs.bucket CROSS JOIN tot) "
            "SELECT bucket, round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur, "
            "round(((p_ref + 0.000001) - (p_cur + 0.000001)) "
            "* ln((p_ref + 0.000001) / (p_cur + 0.000001)), 6) AS psi_term "
            "FROM g"
        ),
        "aggregating_final": (
            "WITH states AS (SELECT user_id, event_type, count(*) AS cnt, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents, "
            "min(CAST(round(value * 100) AS BIGINT)) AS min_cents, "
            "max(CAST(round(value * 100) AS BIGINT)) AS max_cents "
            "FROM events GROUP BY 1, 2) "
            "SELECT event_type, CAST(sum(cnt) AS BIGINT) AS cnt, "
            "CAST(sum(sum_cents) AS BIGINT) AS sum_cents, "
            "min(min_cents) AS min_cents, max(max_cents) AS max_cents, "
            "CAST((CAST(sum(sum_cents) AS BIGINT) * 20000 + CAST(sum(cnt) AS BIGINT)) "
            "// (CAST(sum(cnt) AS BIGINT) * 2) AS DOUBLE) / 1000000.0 AS avg_value "
            "FROM states GROUP BY event_type"
        ),
        "mixture_weights": (
            "WITH per AS (SELECT lang, count(*) AS n_docs, "
            "CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens "
            "FROM documents GROUP BY lang), "
            "w AS (SELECT *, pow(CAST(n_tokens AS DOUBLE), 0.5) AS w FROM per), "
            "t AS (SELECT sum(w) AS tot FROM w) "
            "SELECT lang, n_docs, n_tokens, round(w / tot, 6) AS sample_prob "
            "FROM w CROSS JOIN t"
        ),
        "token_budget": (
            "WITH d AS (SELECT doc_id, lang, "
            "len(string_split_regex(trim(text), '\\s+')) AS nt, "
            "md5(CAST(doc_id AS VARCHAR)) AS h FROM documents), "
            "c AS (SELECT doc_id, lang, sum(nt) OVER (PARTITION BY lang "
            "ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum "
            "FROM d) "
            "SELECT doc_id, lang FROM c WHERE cum <= 8000"
        ),
        "bigram_surprisal": (
            "WITH d AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w "
            "FROM documents), "
            "d2 AS (SELECT doc_id, w FROM d WHERE len(w) >= 2), "
            "bgr AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1])) AS bg FROM d2), "
            "bgc AS (SELECT bg, count(*) AS n_ab FROM bgr GROUP BY bg), "
            "hc AS (SELECT split_part(bg, ' ', 1) AS h, CAST(sum(n_ab) AS BIGINT) AS n_h "
            "FROM bgc GROUP BY 1) "
            "SELECT doc_id, round(avg(-ln(n_ab / n_h)), 6) AS mean_surprisal, "
            "count(*) AS n_bigrams "
            "FROM bgr JOIN bgc USING (bg) JOIN hc ON split_part(bgr.bg, ' ', 1) = hc.h "
            "GROUP BY doc_id"
        ),
        "pmi_collocations": (
            "WITH d AS (SELECT string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents), "
            "d2 AS (SELECT w FROM d WHERE len(w) >= 2), "
            "bg AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1])) AS bg FROM d2), "
            "uni AS (SELECT unnest(w) AS t FROM d2), "
            "bgc AS (SELECT bg, count(*) AS n_ab FROM bg GROUP BY bg HAVING count(*) >= 5), "
            "unic AS (SELECT t, count(*) AS n_t FROM uni GROUP BY t), "
            "tot AS (SELECT (SELECT count(*) FROM bg) AS n_bg_total, "
            "(SELECT count(*) FROM uni) AS n_uni_total) "
            "SELECT bg, n_ab, round(ln((n_ab / n_bg_total) / "
            "((a.n_t / n_uni_total) * (b.n_t / n_uni_total))), 6) AS pmi "
            "FROM bgc CROSS JOIN tot "
            "JOIN unic a ON a.t = split_part(bg, ' ', 1) "
            "JOIN unic b ON b.t = split_part(bg, ' ', 2) "
            "ORDER BY pmi DESC, bg LIMIT 50"
        ),
        "retention_cohorts": (
            "WITH fs AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY user_id), "
            "act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events) "
            "SELECT cohort, datediff('day', cohort, day) AS day_offset, "
            "count(DISTINCT act.user_id) AS n_users "
            "FROM act JOIN fs ON act.user_id = fs.user_id GROUP BY 1, 2"
        ),
        "profile_table": ("SELECT 'o_orderkey' AS col, count(*) AS n_rows, count(o_orderkey) AS n_nonnull, count(DISTINCT o_orderkey) AS n_distinct, count(*) - count(o_orderkey) AS n_null FROM orders UNION ALL SELECT 'o_custkey' AS col, count(*) AS n_rows, count(o_custkey) AS n_nonnull, count(DISTINCT o_custkey) AS n_distinct, count(*) - count(o_custkey) AS n_null FROM orders UNION ALL SELECT 'o_orderstatus' AS col, count(*) AS n_rows, count(o_orderstatus) AS n_nonnull, count(DISTINCT o_orderstatus) AS n_distinct, count(*) - count(o_orderstatus) AS n_null FROM orders UNION ALL SELECT 'o_totalprice' AS col, count(*) AS n_rows, count(o_totalprice) AS n_nonnull, count(DISTINCT o_totalprice) AS n_distinct, count(*) - count(o_totalprice) AS n_null FROM orders UNION ALL SELECT 'o_orderdate' AS col, count(*) AS n_rows, count(o_orderdate) AS n_nonnull, count(DISTINCT o_orderdate) AS n_distinct, count(*) - count(o_orderdate) AS n_null FROM orders UNION ALL SELECT 'o_orderpriority' AS col, count(*) AS n_rows, count(o_orderpriority) AS n_nonnull, count(DISTINCT o_orderpriority) AS n_distinct, count(*) - count(o_orderpriority) AS n_null FROM orders"),
        "tpch_q1": (
            "WITH b AS (SELECT l_returnflag, l_linestatus, "
            "CAST(round(l_quantity * 100) AS BIGINT) AS qty_c, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c, "
            "CAST(round(l_discount * 100) AS BIGINT) AS disc_c, "
            "CAST(round(l_tax * 100) AS BIGINT) AS tax_c "
            "FROM lineitem WHERE l_shipdate <= '1998-09-02') "
            "SELECT l_returnflag, l_linestatus, "
            "round(CAST(sum(qty_c) AS BIGINT) / 100.0, 2) AS sum_qty, "
            "round(CAST(sum(price_c) AS BIGINT) / 100.0, 2) AS sum_base_price, "
            "round(CAST(sum(price_c * (100 - disc_c)) AS BIGINT) / 10000.0, 2) AS sum_disc_price, "
            "round(CAST(sum(price_c * (100 - disc_c) * (100 + tax_c)) AS BIGINT) / 1000000.0, 2) AS sum_charge, "
            "CAST((CAST(sum(qty_c) AS BIGINT) * 200 + count(*)) // (count(*) * 2) AS DOUBLE) / 10000.0 AS avg_qty, "
            "CAST((CAST(sum(price_c) AS BIGINT) * 200 + count(*)) // (count(*) * 2) AS DOUBLE) / 10000.0 AS avg_price, "
            "CAST((CAST(sum(disc_c) AS BIGINT) * 200 + count(*)) // (count(*) * 2) AS DOUBLE) / 10000.0 AS avg_disc, "
            "count(*) AS count_order "
            "FROM b GROUP BY l_returnflag, l_linestatus"
        ),
        "tpch_q19": (
            "SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) "
            "* (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) / 10000.0, 2) "
            "AS revenue, count(*) AS n_items "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) "
            "OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20) "
            "OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)"
        ),
        "tpch_q6": (
            "SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue "
            "FROM lineitem WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01' "
            "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
        ),
        "tpch_q14": (
            "SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month, "
            "round(100 * sum(CASE WHEN p_type = 'PROMO' "
            "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) / "
            "sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01' "
            "GROUP BY 1"
        ),
        "tpch_q18": (
            "WITH big AS (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty "
            "FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 250) "
            "SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty "
            "FROM big JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"
        ),
        "array_explode": (
            "SELECT vec_id, count(*) AS dim, round(max(CAST(v AS DOUBLE)), 6) AS max_v, "
            "round(sum(CAST(v AS DOUBLE)), 4) AS sum_v "
            "FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) "
            "GROUP BY vec_id"
        ),
        "unpivot": (
            "SELECT l_orderkey, l_linenumber, 'qty' AS metric, "
            "CAST(l_quantity AS DOUBLE) AS val FROM lineitem UNION ALL "
            "SELECT l_orderkey, l_linenumber, 'price', "
            "CAST(l_extendedprice AS DOUBLE) FROM lineitem UNION ALL "
            "SELECT l_orderkey, l_linenumber, 'disc', "
            "CAST(l_discount AS DOUBLE) FROM lineitem"
        ),
        "tpch_q3": (
            "SELECT l_orderkey, o_orderdate, o_orderpriority, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00' "
            "AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00' "
            "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
            "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"
        ),
        "tpch_q4": (
            "SELECT o_orderpriority, count(*) AS order_count FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
            "AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00' "
            "AND EXISTS (SELECT 1 FROM lineitem "
            " WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate) "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        "tpch_q7": (
            "SELECT supp_nation, cust_nation, l_year, "
            "round(sum(volume), 4) AS revenue "
            "FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
            "  year(l_shipdate) AS l_year, "
            "  l_extendedprice * (1 - l_discount) AS volume "
            "  FROM lineitem "
            "  JOIN orders ON l_orderkey = o_orderkey "
            "  JOIN customer ON o_custkey = c_custkey "
            "  JOIN supplier ON l_suppkey = s_suppkey "
            "  JOIN nation n1 ON s_nationkey = n1.n_nationkey "
            "  JOIN nation n2 ON c_nationkey = n2.n_nationkey "
            "  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
            "   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
            "  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' "
            "   AND TIMESTAMP '1997-12-31 00:00:00') "
            "GROUP BY supp_nation, cust_nation, l_year "
            "ORDER BY supp_nation, cust_nation, l_year"
        ),
        "tpch_q12": (
            "SELECT l_returnflag AS ship_mode, "
            "sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            " THEN 1 ELSE 0 END)::BIGINT AS high_line_count, "
            "sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            " THEN 0 ELSE 1 END)::BIGINT AS low_line_count "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
            "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
            "GROUP BY l_returnflag ORDER BY ship_mode"
        ),
        "tpch_q13": (
            "SELECT c_count, count(*) AS custdist FROM ("
            "SELECT c_custkey, count(o_orderkey) AS c_count "
            "FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey "
            "AND o_orderpriority <> '1-URGENT' GROUP BY c_custkey) "
            "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
        ),
        "tpch_q15": (
            "WITH revenue AS (SELECT l_suppkey AS supplier_no, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue "
            "FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
            "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' "
            "GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, total_revenue "
            "FROM supplier JOIN revenue ON s_suppkey = supplier_no "
            "WHERE total_revenue = (SELECT max(total_revenue) FROM revenue) "
            "ORDER BY s_suppkey"
        ),
        "tpch_q17": (
            "SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly, "
            "count(*) AS n_lines "
            "FROM lineitem "
            "JOIN part ON l_partkey = p_partkey "
            "JOIN (SELECT l_partkey AS pa_key, avg(l_quantity) AS avg_qty "
            " FROM lineitem GROUP BY l_partkey) ON l_partkey = pa_key "
            "WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * avg_qty"
        ),
        "tpch_q22": (
            "SELECT c_nationkey AS cntrycode, count(*) AS numcust, "
            "round(sum(c_acctbal), 2) AS totacctbal "
            "FROM customer "
            "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer "
            " WHERE c_acctbal > 0) "
            "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            " AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00') "
            "GROUP BY c_nationkey ORDER BY cntrycode"
        ),
        "tpch_q2": (
            "WITH ps AS (SELECT l_partkey, l_suppkey, "
            " min(l_extendedprice / l_quantity) AS supplycost "
            " FROM lineitem GROUP BY l_partkey, l_suppkey), "
            "offers AS (SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, "
            " supplycost FROM ps "
            " JOIN part ON l_partkey = p_partkey "
            " JOIN supplier ON l_suppkey = s_suppkey "
            " JOIN nation ON s_nationkey = n_nationkey "
            " JOIN region ON n_regionkey = r_regionkey "
            " WHERE p_size = 15 AND p_type = 'ECONOMY' AND r_name = 'ASIA') "
            "SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, "
            "round(supplycost, 4) AS supplycost "
            "FROM offers o "
            "WHERE supplycost = (SELECT min(supplycost) FROM offers i "
            " WHERE i.p_partkey = o.p_partkey) "
            "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"
        ),
        "tpch_q9": (
            "SELECT n_name AS nation, year(o_orderdate) AS o_year, "
            "round(sum(l_extendedprice * (1 - l_discount) "
            " - p_retailprice * 0.1 * l_quantity), 4) AS sum_profit "
            "FROM lineitem "
            "JOIN part ON l_partkey = p_partkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE p_name LIKE '%red%' "
            "GROUP BY n_name, year(o_orderdate) "
            "ORDER BY nation, o_year DESC"
        ),
        "tpch_q11": (
            "WITH per_part AS (SELECT l_partkey, "
            " round(sum(l_extendedprice), 2) AS part_value "
            " FROM lineitem "
            " JOIN supplier ON l_suppkey = s_suppkey "
            " JOIN nation ON s_nationkey = n_nationkey "
            " WHERE n_name = 'NATION_3' GROUP BY l_partkey) "
            "SELECT l_partkey, part_value FROM per_part "
            "WHERE part_value > (SELECT avg(part_value) * 2.0 FROM per_part) "
            "ORDER BY part_value DESC, l_partkey"
        ),
        "tpch_q16": (
            "SELECT p_brand, p_type, p_size, "
            "count(DISTINCT l_suppkey) AS supplier_cnt "
            "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) "
            "JOIN part ON l_partkey = p_partkey "
            "WHERE p_brand <> 'Brand#1' "
            "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier "
            " WHERE s_acctbal < 0) "
            "GROUP BY p_brand, p_type, p_size "
            "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
        ),
        "tpch_q20": (
            "SELECT s_name, s_suppkey FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE n_name = 'NATION_2' AND s_suppkey IN ("
            " SELECT l_suppkey FROM lineitem "
            " JOIN part ON l_partkey = p_partkey "
            " WHERE p_name LIKE 'small%' "
            " GROUP BY l_partkey, l_suppkey "
            " HAVING sum(CASE WHEN year(l_shipdate) = 1996 THEN l_quantity "
            "  ELSE 0 END) > 0.5 * sum(l_quantity)) "
            "ORDER BY s_name, s_suppkey"
        ),
        "tpch_q21": (
            "SELECT s_name, count(*) AS numwait FROM ("
            " SELECT l_orderkey, "
            "  max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY "
            "   THEN l_suppkey END) AS late_supp "
            " FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            " WHERE o_orderstatus = 'F' "
            " GROUP BY l_orderkey "
            " HAVING count(DISTINCT l_suppkey) > 1 "
            "  AND count(DISTINCT CASE WHEN l_shipdate > "
            "   o_orderdate + INTERVAL 60 DAY THEN l_suppkey END) = 1) "
            "JOIN supplier ON late_supp = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE n_name = 'NATION_1' "
            "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"
        ),
        "tpch_q8": (
            "SELECT o_year, "
            "round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) "
            "  / sum(volume), 6) AS mkt_share "
            "FROM (SELECT year(o_orderdate) AS o_year, "
            "  l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS nation "
            "  FROM lineitem "
            "  JOIN part ON l_partkey = p_partkey "
            "  JOIN orders ON l_orderkey = o_orderkey "
            "  JOIN customer ON o_custkey = c_custkey "
            "  JOIN supplier ON l_suppkey = s_suppkey "
            "  JOIN nation n1 ON c_nationkey = n1.n_nationkey "
            "  JOIN region ON n1.n_regionkey = r_regionkey "
            "  JOIN nation n2 ON s_nationkey = n2.n_nationkey "
            "  WHERE r_name = 'ASIA' AND p_type = 'PROMO' "
            "  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
            "  AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00') "
            "GROUP BY o_year ORDER BY o_year"
        ),
        "tpch_q5": (
            "SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) "
            "AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY n_name"
        ),
        "salted_join": (
            "SELECT p_brand, count(*) AS n_items, round(sum(l_quantity), 2) "
            "AS sum_qty FROM lineitem JOIN part ON l_partkey = p_partkey "
            "GROUP BY p_brand"
        ),
        "grouping_sets": (
            "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
            "count(l_orderkey) AS n FROM lineitem GROUP BY GROUPING SETS "
            "((l_returnflag, l_linestatus), (l_returnflag), ())"
        ),
        "ntile": (
            "SELECT o_orderkey, o_orderpriority, "
            "ntile(4) OVER w AS quartile, dense_rank() OVER w AS drk "
            "FROM orders WINDOW w AS "
            "(PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)"
        ),
        "running_sum": (
            "SELECT o_custkey, o_orderkey, "
            "round(sum(o_totalprice) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) "
            "AS running_spend FROM orders"
        ),
        "agg_stats": (
            "SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp, "
            "round(stddev_samp(l_quantity), 4) AS sd_qty, "
            "round(quantile_cont(l_quantity, 0.5), 2) AS median_qty, "
            "round(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "scalar_funcs": (
            "SELECT o_orderkey, upper(o_orderstatus) AS status_u, "
            "substr(o_orderpriority, 1, 1) AS prio_code, "
            "length(o_orderpriority)::BIGINT AS prio_len, "
            "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month, "
            "year(o_orderdate)::BIGINT AS order_year, "
            "round(o_totalprice * 0.1, 4) AS tithe, "
            "concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio "
            "FROM orders"
        ),
        "pivot": (
            "SELECT user_id, "
            "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click, "
            "sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view, "
            "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase, "
            "sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup, "
            "sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error "
            "FROM events GROUP BY user_id"
        ),
        "json_props": (
            "SELECT event_id, event_type, "
            "CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events"
        ),
        "tumbling_window": (
            f"SELECT {tumble} AS window_start, "
            f"{tumble} + INTERVAL 10 MINUTE AS window_end, "
            "event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value, "
            "(((sum(round(value * 100))::BIGINT * 200) + count(*)) // (count(*) * 2))::DOUBLE / 10000.0 AS avg_value "
            "FROM events GROUP BY 1, 2, 3"
        ),
        "sliding_window": (
            "WITH b AS ("
            f"  SELECT make_timestamp({slide5} * 1000000) AS ws, value FROM events"
            "  UNION ALL "
            f"  SELECT make_timestamp(({slide5} - 300) * 1000000) AS ws, value FROM events"
            ") SELECT ws AS window_start, ws + INTERVAL 10 MINUTE AS window_end, "
            "count(*) AS n_events, round(sum(value), 2) AS sum_value FROM b GROUP BY ws"
        ),
        "session_window": _SESSION_ORACLE,
        # greedy 2-step subsequence: earliest step-1 event, then ANY strictly
        # later step-2 event (greedy earliest-advance is optimal, so this is
        # exactly sequence_match's semantics for 2 steps)
        "sequence_funnel": (
            "WITH f1 AS ("
            "  SELECT user_id, ts AS t1, event_id AS i1,"
            "         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn"
            "  FROM events WHERE value > 10"
            ") SELECT u.user_id, "
            "CAST(max(CASE WHEN e.event_id IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS matched "
            "FROM (SELECT DISTINCT user_id FROM events) u "
            "LEFT JOIN (SELECT * FROM f1 WHERE rn = 1) s ON u.user_id = s.user_id "
            "LEFT JOIN events e ON e.user_id = s.user_id AND e.value > 50 "
            "  AND (e.ts > s.t1 OR (e.ts = s.t1 AND e.event_id > s.i1)) "
            "GROUP BY u.user_id"
        ),
        "gap_fill": (
            "WITH agg AS ("
            "  SELECT event_type, "
            "         make_timestamp((floor(epoch(ts) / 3600) * 3600 * 1000000)::BIGINT) AS bucket, "
            "         count(*) AS n_events, round(sum(value), 2) AS sum_value "
            "  FROM events GROUP BY 1, 2"
            "), bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM agg), "
            "grid AS ("
            "  SELECT k.event_type, g.bucket "
            "  FROM (SELECT DISTINCT event_type FROM events) k, "
            "       (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM bounds) g"
            ") SELECT grid.event_type, grid.bucket, "
            "coalesce(agg.n_events, 0)::BIGINT AS n_events, "
            "coalesce(agg.sum_value, 0)::DOUBLE AS sum_value "
            "FROM grid LEFT JOIN agg ON grid.event_type = agg.event_type AND grid.bucket = agg.bucket"
        ),
        "forward_fill": (
            "SELECT event_id, user_id, "
            "last_value(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END IGNORE NULLS) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled "
            "FROM events"
        ),
        "containment": _CONTAINMENT_ORACLE,
        "sql_recursive": _RECURSIVE_SQL,
        "unigram_surprisal": (
            "WITH toks AS (SELECT doc_id, unnest({W}) AS w FROM "
            "(SELECT doc_id, {WORDS} AS {W} FROM documents)), "
            "freqs AS (SELECT w, count(*) AS wf FROM toks GROUP BY w), "
            "tot AS (SELECT sum(wf) AS tot FROM freqs) "
            "SELECT doc_id, round(avg(-ln(wf / tot)), 6) AS mean_surprisal, "
            "count(*) AS n_tokens FROM toks JOIN freqs USING (w) CROSS JOIN tot "
            "GROUP BY doc_id"
        ).format(W="w", WORDS=_WORDS),
        "quantize_embeddings": (
            "WITH q AS (SELECT vec_id, "
            "list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale, "
            "list_transform(embedding, x -> round(x::DOUBLE / "
            "  list_max(list_transform(embedding, y -> abs(y::DOUBLE))) * 127.0)::INT) AS codes "
            "FROM embeddings) "
            "SELECT vec_id, round(scale, 6) AS qscale, "
            "list_sum(codes)::INT AS code_sum, "
            "list_max(codes)::INT AS code_max, list_min(codes)::INT AS code_min FROM q"
        ),
        "gram_matrix": (
            # integer-quantized XᵀX: floor(x·1000+0.5) per component, int64
            # products — exact on both engines regardless of sum order
            "SELECT i::INT AS i, j::INT AS j, "
            "sum(CAST(floor(embedding[i]::DOUBLE * 1000 + 0.5) AS BIGINT) * "
            "    CAST(floor(embedding[j]::DOUBLE * 1000 + 0.5) AS BIGINT))::BIGINT AS g "
            "FROM embeddings, generate_series(1, 64) s1(i), generate_series(1, 64) s2(j) "
            "WHERE j >= i GROUP BY i, j"
        ),
        "array_funcs": (
            "SELECT vec_id, "
            "round(list_sum(list_transform(embedding, x -> x::DOUBLE * 2.0)), 6) AS sum_doubled, "
            "len(list_filter(embedding, x -> x > 0))::INT AS n_positive, "
            "CAST(len(list_filter(embedding, x -> x > 0.49)) > 0 AS INT) AS has_large, "
            "CAST(len(list_filter(embedding, x -> abs(x) > 0.5)) = 0 AS INT) AS all_bounded, "
            "round(list_sort(embedding)[-1]::DOUBLE, 6) AS max_elem, "
            "round(list_sum(list_transform(generate_series(1, 8), "
            "  i -> embedding[i]::DOUBLE * embedding[i + 8]::DOUBLE)), 6) AS head_tail_dot "
            "FROM embeddings WHERE vec_id < 200"
        ),
        "string_funcs": (
            "SELECT doc_id, "
            "len(regexp_extract_all(text, '[aeiou]'))::BIGINT AS n_vowels, "
            "length(regexp_replace(text, '[^a-z]', '', 'g'))::INT AS n_lower, "
            "substring(translate(text, 'aeiou', '_____'), 1, 40) AS masked_prefix, "
            "lpad(lang, 5, '.') AS lang_padded, "
            "reverse(substring(text, 1, 12)) AS rev_prefix, "
            "split_part(text, ' ', 2) AS second_word "
            "FROM documents WHERE doc_id < 200"
        ),
        "summing_final": (
            "SELECT user_id, event_type, "
            "sum(round(value * 100)::BIGINT)::BIGINT AS value_cents "
            "FROM events GROUP BY user_id, event_type"
        ),
        "integrity_check": (
            "SELECT 'orders->customer' AS relationship, "
            "(SELECT count(*) FROM orders) AS n_child, "
            "(SELECT count(*) FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c "
            " ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS n_orphans, "
            "(SELECT count(DISTINCT o_custkey) FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c "
            " ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS n_orphan_keys "
            "UNION ALL SELECT 'lineitem->orders', "
            "(SELECT count(*) FROM lineitem), "
            "(SELECT count(*) FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o "
            " ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL), "
            "(SELECT count(DISTINCT l_orderkey) FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o "
            " ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) "
            "UNION ALL SELECT 'customer->nation', "
            "(SELECT count(*) FROM customer), "
            "(SELECT count(*) FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n "
            " ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL), "
            "(SELECT count(DISTINCT c_nationkey) FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n "
            " ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)"
        ),
        "null_semantics": (
            "WITH b AS (SELECT o_orderkey, "
            "CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS v, "
            "CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS w "
            "FROM orders) "
            "SELECT o_orderkey, coalesce(v, w, -1.0) AS first_non_null, "
            "nullif(v, w) AS null_if_equal, "
            "CAST(v IS NOT DISTINCT FROM w AS INT) AS null_safe_eq, "
            "CAST(v = w AS INT) AS plain_eq FROM b"
        ),
        "dedup_incremental": _INCR_DEDUP_ORACLE,
        "edit_distance": (
            "SELECT a.doc_id, levenshtein(substring(a.text, 1, 60), "
            "substring(b.text, 1, 60)) AS edit_dist "
            "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 "
            "WHERE a.doc_id < 100"
        ),
        "tpch_q10": (
            "WITH j AS (SELECT c_custkey, c_name, n_name, "
            "l_extendedprice * (1 - l_discount) AS rev "
            "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01' "
            "AND l_returnflag = 'R') "
            "SELECT c_custkey, c_name, n_name, round(sum(rev), 2) AS revenue "
            "FROM j GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey ASC LIMIT 20"
        ),
        "range_frame": (
            "SELECT event_id, user_id, "
            "count(*) OVER w AS n_trailing_1h, "
            "round(sum(value) OVER w, 2) AS sum_trailing_1h "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ),
        "window_dist": (
            "SELECT o_orderkey, o_orderstatus, "
            "round(percent_rank() OVER w, 6) AS pct_rank, "
            "round(cume_dist() OVER w, 6) AS cume "
            "FROM orders WINDOW w AS (PARTITION BY o_orderstatus "
            "ORDER BY o_totalprice, o_orderkey)"
        ),
        "reservoir_k": (
            "WITH r AS (SELECT doc_id, lang, source, "
            "row_number() OVER (PARTITION BY lang "
            "ORDER BY md5(doc_id::VARCHAR) ASC, doc_id ASC) AS rk "
            "FROM documents) SELECT doc_id, lang, source FROM r WHERE rk <= 20"
        ),
        "png_meta": (
            "SELECT doc_id, "
            "(n_chars % 640 + 1)::INT AS width, "
            "(doc_id % 480 + 1)::INT AS height, "
            "8::INT AS bit_depth, "
            "(CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 6 END)::INT AS color_type, "
            "(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END)::INT AS channels, "
            "((n_chars % 640 + 1) * (doc_id % 480 + 1))::BIGINT AS n_pixels "
            "FROM documents"
        ),
        "jpeg_meta": (
            "SELECT doc_id, "
            "(n_chars % 640 + 1)::INT AS width, "
            "(doc_id % 480 + 1)::INT AS height, "
            "8::INT AS precision, "
            "(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 3 END)::INT AS n_components, "
            "(doc_id % 5 = 0) AS progressive, "
            "((n_chars % 640 + 1) * (doc_id % 480 + 1))::BIGINT AS n_pixels "
            "FROM documents"
        ),
        "wav_meta": (
            "SELECT doc_id, "
            "(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END)::INT AS sample_rate, "
            "(1 + doc_id % 2)::INT AS channels, 16::INT AS bits_per_sample, "
            "n_chars::BIGINT AS n_samples, "
            "((n_chars * 1000) // (CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END))::BIGINT AS duration_ms "
            "FROM documents"
        ),
        "pack_sequences": (
            "SELECT doc_id, substring(md5(doc_id::VARCHAR), 1, 2) AS bucket, "
            f"floor((sum({_NTOK}) OVER w - {_NTOK}) / 2048)::BIGINT AS pack_seq, "
            f"{_NTOK}::BIGINT AS n_tokens "
            "FROM documents "
            "WINDOW w AS (PARTITION BY substring(md5(doc_id::VARCHAR), 1, 2) "
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ),
        "dataset_mixture": (
            "SELECT doc_id, lang, source FROM documents "
            "WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::BIGINT < "
            "  (CASE WHEN lang = 'en' THEN 1.0 WHEN lang = 'de' THEN 0.25 "
            "        ELSE 0.10 END) * 65536"
        ),
        "gap_fill_interp": (
            "WITH agg AS ("
            "  SELECT event_type, "
            "         make_timestamp((floor(epoch(ts) / 3600) * 3600 * 1000000)::BIGINT) AS bucket, "
            "         count(*) AS n_events, round(sum(value), 2) AS sum_value "
            "  FROM events GROUP BY 1, 2"
            "), bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM agg), "
            "grid AS ("
            "  SELECT k.event_type, g.bucket "
            "  FROM (SELECT DISTINCT event_type FROM events) k, "
            "       (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM bounds) g"
            "), filled AS ("
            "  SELECT grid.event_type, grid.bucket, "
            "  coalesce(agg.n_events, 0)::BIGINT AS n_events, "
            "  coalesce(agg.sum_value, 0)::DOUBLE AS sum_value "
            "  FROM grid LEFT JOIN agg ON grid.event_type = agg.event_type AND grid.bucket = agg.bucket"
            "), w AS ("
            "  SELECT *, "
            "  last_value(CASE WHEN n_events > 0 THEN sum_value END IGNORE NULLS) OVER wb AS pv, "
            "  last_value(CASE WHEN n_events > 0 THEN epoch(bucket)::BIGINT END IGNORE NULLS) OVER wb AS pt, "
            "  first_value(CASE WHEN n_events > 0 THEN sum_value END IGNORE NULLS) OVER wf AS nv, "
            "  first_value(CASE WHEN n_events > 0 THEN epoch(bucket)::BIGINT END IGNORE NULLS) OVER wf AS nt "
            "  FROM filled WINDOW "
            "  wb AS (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), "
            "  wf AS (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
            ") SELECT event_type, bucket, n_events, "
            "CASE WHEN n_events > 0 THEN round(sum_value, 4) "
            "WHEN pv IS NOT NULL AND nv IS NOT NULL THEN "
            "  (((round(pv * 100)::BIGINT * (nt - pt) "
            "     + (round(nv * 100)::BIGINT - round(pv * 100)::BIGINT) "
            "       * (epoch(bucket)::BIGINT - pt)) * 200 + (nt - pt)) "
            "   // (2 * (nt - pt)))::DOUBLE / 10000.0 "
            "ELSE round(coalesce(pv, nv), 4) END AS sum_value_interp FROM w"
        ),
        "clickhouse_aggs": (
            "SELECT l_returnflag, "
            "arg_max(l_suppkey, l_extendedprice) AS top_supp, "
            "arg_min(l_suppkey, l_extendedprice) AS bottom_supp, "
            "count(*) FILTER (WHERE l_quantity > 25) AS n_high, "
            "round(sum(l_extendedprice) FILTER (WHERE l_quantity > 25), 2) AS sum_high, "
            "round(avg(l_discount) FILTER (WHERE l_quantity > 25), 6) AS avg_disc_high, "
            "array_to_string(list_sort(list(DISTINCT l_linestatus))[1:3], ',') AS modes_sample "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "quantiles_multi": (
            "SELECT l_linestatus, "
            "round(quantile_cont(l_quantity, 0.25), 4) AS q25, "
            "round(quantile_cont(l_quantity, 0.50), 4) AS q50, "
            "round(quantile_cont(l_quantity, 0.75), 4) AS q75 "
            "FROM lineitem GROUP BY l_linestatus"
        ),
        "topk_freq": (
            "WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n "
            "FROM orders GROUP BY 1, 2), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus "
            "ORDER BY n DESC, o_orderpriority ASC) AS rn FROM c) "
            "SELECT o_orderstatus, o_orderpriority, n FROM r WHERE rn <= 3"
        ),
        "event_funnel": (
            "SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value, "
            "((sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) * 20000 "
            "+ count(json_extract_string(props, '$.k'))) "
            "// (count(json_extract_string(props, '$.k')) * 2))::DOUBLE / 10000.0 AS avg_k, "
            "min(ts) AS first_ts, max(ts) AS last_ts FROM events GROUP BY event_type"
        ),
        "dedup_exact": (
            f"SELECT min(doc_id) AS doc_id, count(*) AS dup_count FROM documents GROUP BY {_FP}"
        ),
        "text_metrics": (
            f"SELECT doc_id, {_NTOK}::BIGINT AS n_tokens, {_BPE}::BIGINT AS n_bpe_tokens, "
            f"round(length(regexp_replace(text, '\\s+', '', 'g')) / greatest({_NTOK}, 1), 6) AS avg_word_len, "
            f"round({_PUNCT} / greatest(length(text), 1), 6) AS punct_ratio "
            "FROM documents"
        ),
        "corpus_stats": (
            f"SELECT lang, count(*) AS n_docs, sum({_NTOK})::BIGINT AS total_tokens, "
            f"CAST((sum({_NTOK})::BIGINT * 20000 + count(*)) // (count(*) * 2) AS DOUBLE) / 10000.0 AS avg_tokens, "
            "sum(length(text))::BIGINT AS total_chars, "
            "CAST((sum(length(text))::BIGINT * 20000 + count(*)) // (count(*) * 2) AS DOUBLE) / 10000.0 AS avg_chars, "
            "min(n_chars)::BIGINT AS min_chars, "
            "max(n_chars)::BIGINT AS max_chars FROM documents GROUP BY lang"
        ),
        "quality_score": _QUALITY_ORACLE,
        "lang_id": _LANGID_ORACLE,
        "redact_pii": (
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) "
            "  + len(regexp_extract_all(t2, '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]')) AS BIGINT) AS n_pii, "
            "substring(regexp_replace(regexp_replace(t2, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'\\+?[0-9][0-9()\\-\\s]{7,}[0-9]', '<PHONE>', 'g'), 1, 60) AS red_prefix "
            "FROM (SELECT doc_id, 'contact ' || CAST(doc_id AS VARCHAR) "
            "|| '@example.com: ' || text AS t2 FROM documents)"
        ),
        "chunk_text": (
            "SELECT doc_id, chunk_id, "
            "substring(text, CAST(chunk_id*150+1 AS INT), 200) AS chunk FROM ("
            "SELECT doc_id, text, unnest(range(0, "
            "CAST(floor((length(text)-1)/150)+1 AS BIGINT))) AS chunk_id "
            "FROM documents WHERE length(text) > 0)"
        ),
        "hash_split": (
            "SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' "
            "THEN 'train' ELSE 'test' END AS split, count(*) AS n_docs "
            "FROM documents GROUP BY 1"
        ),
        "ngram_jaccard": _JACCARD_ORACLE,
        "gopher_rules": _GOPHER_ORACLE,
        "boilerplate": _BOILERPLATE_ORACLE,
        "decontaminate": _DECONTAMINATE_ORACLE,
        # bloom path's output is exactly the exact path's (verify step
        # removes every Bloom false positive) — same oracle by design
        "bloom_decontaminate": _DECONTAMINATE_ORACLE,
        "normalize_unicode": (
            "WITH t AS (SELECT doc_id, "
            "'Café Ångström № ' || text AS tt "
            "FROM documents) "
            "SELECT doc_id, "
            "substring(nfc_normalize(tt), 1, 20) AS nfc_prefix, "
            "substring(strip_accents(tt), 1, 20) AS stripped_prefix, "
            "length(nfc_normalize(tt))::BIGINT AS nfc_len, "
            "length(strip_accents(tt))::BIGINT AS stripped_len "
            "FROM t"
        ),
        "cdc_chunks": (
            # same boundary rule: md5 of the trailing 4-word window starts
            # with hex '0'; chunks = spans between boundaries
            f"WITH w AS (SELECT doc_id, {_WORDS} AS w FROM documents), "
            "b AS (SELECT doc_id, w, list_filter("
            "  CASE WHEN len(w) > 4 THEN generate_series(4, len(w) - 1) "
            "       ELSE [] END, "
            "  i -> substring(md5(array_to_string(w[i-3:i], ' ')), 1, 1) = '0') "
            "  AS bp FROM w), "
            "sp AS (SELECT doc_id, w, "
            "  list_concat([1], list_transform(bp, i -> i + 1)) AS starts, "
            "  list_concat(bp, [len(w)]) AS ends FROM b), "
            "e AS (SELECT doc_id, w, i - 1 AS chunk_idx, starts[i] AS s, "
            "  ends[i] AS en FROM sp, "
            "  unnest(generate_series(1, len(starts))) AS t(i)) "
            "SELECT doc_id, chunk_idx::INT AS chunk_idx, "
            "substring(array_to_string(w[s:en], ' '), 1, 40) AS chunk_prefix, "
            "(en - s + 1)::BIGINT AS n_tokens FROM e"
        ),
        "canonical_dedup": (
            "WITH u AS (SELECT doc_id, CASE doc_id % 4 "
            "  WHEN 0 THEN 'https://site.example.com/page/' || (doc_id // 4) || '?a=1&b=2' "
            "  WHEN 1 THEN 'https://site.example.com/page/' || (doc_id // 4) || '?b=2&utm_source=feed&a=1' "
            "  WHEN 2 THEN 'HTTPS://WWW.Site.example.com/page/' || (doc_id // 4) || '?a=1&b=2' "
            "  ELSE 'https://site.example.com/page/' || (doc_id // 4) || '/?a=1&b=2#section' "
            "  END AS url FROM documents), "
            "c AS (SELECT doc_id, "
            "  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://' || "
            "  regexp_replace(lower(regexp_extract(url, '://([^/?#]+)', 1)), '^www\\.', '') || "
            "  regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1), '/$', '') || "
            "  CASE WHEN qs_kept <> '' THEN '?' || qs_kept ELSE '' END AS cu "
            "  FROM (SELECT doc_id, url, array_to_string(list_sort(list_filter("
            "    string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'), "
            "    p -> p <> '' AND NOT string_split(p, '=')[1] IN "
            "    ('utm_source', 'utm_medium', 'utm_campaign', 'utm_term', "
            "     'utm_content', 'gclid', 'fbclid', 'ref'))), '&') AS qs_kept "
            "  FROM u)) "
            "SELECT cu, min(doc_id) AS doc_id, count(*)::BIGINT AS dup_count "
            "FROM c GROUP BY cu"
        ),
        "mrl_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding[1:16] AS qe "
            "  FROM embeddings WHERE vec_id < 10), "
            "pairs AS (SELECT q.query_id, c.vec_id AS neighbor_id, q.qe, "
            "  c.embedding[1:16] AS ce FROM q CROSS JOIN embeddings c "
            "  WHERE c.vec_id <> q.query_id), "
            "u AS (SELECT query_id, neighbor_id, unnest(qe)::DOUBLE AS x, "
            "  unnest(ce)::DOUBLE AS y FROM pairs), "
            "cos AS (SELECT query_id, neighbor_id, "
            "  sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS c "
            "  FROM u GROUP BY query_id, neighbor_id), "
            "ranked AS (SELECT query_id, neighbor_id, c, "
            "  row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk "
            "  FROM cos) "
            "SELECT query_id, neighbor_id, round(c, 6) AS cos_sim "
            "FROM ranked WHERE rk <= 5"
        ),
        "ewma": (
            "WITH g AS (SELECT user_id, max(epoch_us(ts)) AS tmax "
            "  FROM events GROUP BY user_id) "
            "SELECT e.user_id, count(*)::BIGINT AS n_events, "
            "round(sum(e.value * pow(2, -(tmax - epoch_us(e.ts)) / 3600000000.0)) "
            "  / sum(pow(2, -(tmax - epoch_us(e.ts)) / 3600000000.0)), 6) AS ewma "
            "FROM events e JOIN g USING (user_id) GROUP BY e.user_id, tmax"
        ),
        "bmp_meta": (
            "SELECT doc_id, (n_chars % 640 + 1)::BIGINT AS width, "
            "(doc_id % 480 + 1)::BIGINT AS height, "
            "(CASE doc_id % 5 WHEN 0 THEN 1 WHEN 1 THEN 4 WHEN 2 THEN 8 "
            " WHEN 3 THEN 24 ELSE 32 END)::BIGINT AS bits_per_pixel "
            "FROM documents"
        ),
        "variant_props": (
            "SELECT event_type, count(*)::BIGINT AS n, "
            "count(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS n_with_path, "
            "sum(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS sum_path "
            "FROM events GROUP BY event_type"
        ),
        "hard_negatives": """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe, label AS ql
  FROM embeddings WHERE vec_id < 10
), pairs AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, c.label AS neg_label, q.qe,
         c.embedding AS ce
  FROM q CROSS JOIN embeddings c
  WHERE c.vec_id <> q.query_id AND c.label IS DISTINCT FROM q.ql
), u AS (
  SELECT query_id, neighbor_id, neg_label,
         unnest(qe)::DOUBLE AS x, unnest(ce)::DOUBLE AS y
  FROM pairs
), cos AS (
  SELECT query_id, neighbor_id, neg_label,
         sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS c
  FROM u GROUP BY query_id, neighbor_id, neg_label
), ranked AS (
  SELECT query_id, neighbor_id, neg_label, c,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rk
  FROM cos
)
SELECT query_id, neighbor_id, neg_label, round(c, 6) AS cos_sim
FROM ranked WHERE rk <= 5
""",
        "max_intersections": (
            "WITH iv AS (SELECT user_id, event_id % 1000 AS s, "
            "  event_id % 1000 + event_id % 50 + 1 AS e FROM events), "
            "ev AS (SELECT user_id, s AS t, 1 AS d FROM iv "
            "  UNION ALL SELECT user_id, e AS t, -1 AS d FROM iv), "
            "run AS (SELECT user_id, t, d, sum(d) OVER (PARTITION BY user_id "
            "  ORDER BY t, d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS o "
            "  FROM ev), "
            "sel AS (SELECT user_id, t, o, max(o) OVER (PARTITION BY user_id) AS mo "
            "  FROM run) "
            "SELECT user_id, max(o)::BIGINT AS max_intersections, "
            "min(CASE WHEN o = mo THEN t END) AS peak_at "
            "FROM sel GROUP BY user_id"
        ),
        "sequence_match": (
            "WITH e AS (SELECT user_id, event_id, event_type FROM events) "
            "SELECT u.user_id, "
            "coalesce(m2.f, false) AS vp, coalesce(m3.f, false) AS vcp "
            "FROM (SELECT DISTINCT user_id FROM e) u "
            "LEFT JOIN (SELECT DISTINCT a.user_id, true AS f FROM e a "
            "  JOIN e b ON a.user_id = b.user_id AND a.event_id < b.event_id "
            "  WHERE a.event_type = 'view' AND b.event_type = 'purchase') m2 "
            "  ON u.user_id = m2.user_id "
            "LEFT JOIN (SELECT DISTINCT a.user_id, true AS f FROM e a "
            "  JOIN e b ON a.user_id = b.user_id AND a.event_id < b.event_id "
            "  JOIN e c ON b.user_id = c.user_id AND b.event_id < c.event_id "
            "  WHERE a.event_type = 'view' AND b.event_type = 'click' "
            "    AND c.event_type = 'purchase') m3 "
            "  ON u.user_id = m3.user_id"
        ),
        "paragraph_dedup": (
            "WITH marked AS (SELECT doc_id, "
            "  regexp_replace(text, '(\\S+ \\S+ \\S+ \\S+) ', '\\1' || chr(10), 'g') AS text "
            "  FROM documents), "
            "segs AS (SELECT doc_id, unnest(list_transform(string_split(text, chr(10)), "
            "  (s, i) -> struct_pack(pos := i, seg := s)), recursive := true) FROM marked), "
            "r AS (SELECT doc_id, pos, seg, row_number() OVER ("
            "  PARTITION BY md5(regexp_replace(trim(lower(seg)), '\\s+', ' ', 'g')) "
            "  ORDER BY doc_id, pos) AS rn FROM segs) "
            "SELECT doc_id, count(*)::BIGINT AS n_paragraphs, "
            "sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept, "
            "coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, chr(10) ORDER BY pos), '') AS text "
            "FROM r GROUP BY doc_id"
        ),
        "zipf_fit": (
            "WITH tok AS (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok "
            "  FROM documents), "
            "f AS (SELECT tok, count(*)::DOUBLE AS freq FROM tok WHERE tok != '' GROUP BY tok), "
            "top AS (SELECT tok, freq, row_number() OVER (ORDER BY freq DESC, tok) AS rank "
            "  FROM f ORDER BY freq DESC, tok LIMIT 1000) "
            "SELECT count(*)::BIGINT AS n_tokens, "
            "round(regr_slope(ln(freq), ln(rank)), 6) AS slope, "
            "round(regr_intercept(ln(freq), ln(rank)), 6) AS intercept FROM top"
        ),
        "pr_curve": (
            "WITH s AS (SELECT round(len(list_distinct(w))::DOUBLE / len(w), 3) AS t, "
            "  (n_chars > 250)::BIGINT AS y FROM "
            "  (SELECT string_split_regex(trim(lower(text)), '\\s+') AS w, n_chars "
            "   FROM documents)), "
            "per AS (SELECT t, count(*) AS n, sum(y) AS tp FROM s GROUP BY t), "
            "tot AS (SELECT sum(y)::DOUBLE AS p FROM s) "
            "SELECT t AS threshold, "
            "round(sum(tp) OVER w2 / sum(n) OVER w2, 6) AS precision, "
            "round(sum(tp) OVER w2 / (SELECT p FROM tot), 6) AS recall "
            "FROM per WINDOW w2 AS (ORDER BY t DESC "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "ORDER BY threshold DESC"
        ),
        "clickhouse_funcs3": (
            "SELECT event_id, "
            "array_to_string(list_transform(generate_series(1, 3), "
            "  i -> (list_sum(([1, event_id % 5, 2])[1:i]))::BIGINT), ',') AS cum, "
            "coalesce(array_to_string(generate_series(1, greatest(event_id % 4, 0)), ','), '') AS en, "
            "len(list_filter([event_id % 3, 1, 1], x -> x = 1))::BIGINT AS ce, "
            "bit_count(event_id)::BIGINT AS bc, "
            "coalesce(array_to_string(range(event_id % 4), ','), '') AS rg, "
            "round(pow(2, event_id % 5), 6) AS e2, "
            "array_to_string(list_sort(list_intersect([1, 2, 3, event_id % 5], [2, 3, 9])), ',') AS ai, "
            "array_to_string([1, 2] || [event_id % 7], ',') AS pb, "
            "'2,3' AS pf, "
            "event_id AS ifn, "
            "event_id AS te "
            "FROM events WHERE event_id < 500"
        ),
        "with_fill": (
            "WITH b AS (SELECT day(ts)::INT AS dom, count(*)::BIGINT AS n_events "
            "  FROM events WHERE day(ts) % 3 != 1 GROUP BY dom) "
            "SELECT g.dom, b.n_events "
            "FROM (SELECT unnest(generate_series(1, 31))::INT AS dom) g "
            "LEFT JOIN b USING (dom) ORDER BY g.dom"
        ),
        "jsonl_scan": (
            "SELECT doc_id, lang, text FROM documents WHERE doc_id < 200"
        ),
        "winsorize": (
            "WITH v AS (SELECT o_orderpriority AS p, o_totalprice AS x FROM orders), "
            "k AS (SELECT greatest(count(*) // 100, 1) AS kk FROM v), "
            "r AS (SELECT p, x, row_number() OVER (ORDER BY x) AS ra, "
            "  row_number() OVER (ORDER BY x DESC) AS rd FROM v), "
            "t AS (SELECT max(CASE WHEN ra <= (SELECT kk FROM k) THEN x END) AS lo, "
            "  min(CASE WHEN rd <= (SELECT kk FROM k) THEN x END) AS hi FROM r) "
            "SELECT p AS o_orderpriority, count(*)::BIGINT AS n_orders, "
            "round(sum(least(greatest(x, (SELECT lo FROM t)), (SELECT hi FROM t))), 2) "
            "  AS sum_winsorized "
            "FROM v GROUP BY p"
        ),
        "dialect_asof": (
            "WITH a AS (SELECT event_id, user_id, ts, value FROM events "
            "  WHERE event_type = 'purchase'), "
            "b AS (SELECT user_id, ts AS vts, round(max(value), 2) AS vvalue "
            "  FROM events WHERE event_type = 'view' GROUP BY user_id, ts) "
            "SELECT a.event_id, a.user_id, a.ts, "
            "b.vts AS view_ts, b.vvalue AS view_value "
            "FROM a ASOF JOIN b ON a.user_id = b.user_id AND a.ts >= b.vts"
        ),
        "value_entropy": 'SELECT event_type, round(entropy(user_id), 6) AS entropy FROM events GROUP BY event_type ORDER BY event_type',
        "corr_matrix": "SELECT 'l_quantity' AS col_a, 'l_quantity' AS col_b, round(corr(l_quantity, l_quantity), 6) AS corr FROM lineitem UNION ALL SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, round(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem UNION ALL SELECT 'l_quantity' AS col_a, 'l_discount' AS col_b, round(corr(l_quantity, l_discount), 6) AS corr FROM lineitem UNION ALL SELECT 'l_extendedprice' AS col_a, 'l_quantity' AS col_b, round(corr(l_extendedprice, l_quantity), 6) AS corr FROM lineitem UNION ALL SELECT 'l_extendedprice' AS col_a, 'l_extendedprice' AS col_b, round(corr(l_extendedprice, l_extendedprice), 6) AS corr FROM lineitem UNION ALL SELECT 'l_extendedprice' AS col_a, 'l_discount' AS col_b, round(corr(l_extendedprice, l_discount), 6) AS corr FROM lineitem UNION ALL SELECT 'l_discount' AS col_a, 'l_quantity' AS col_b, round(corr(l_discount, l_quantity), 6) AS corr FROM lineitem UNION ALL SELECT 'l_discount' AS col_a, 'l_extendedprice' AS col_b, round(corr(l_discount, l_extendedprice), 6) AS corr FROM lineitem UNION ALL SELECT 'l_discount' AS col_a, 'l_discount' AS col_b, round(corr(l_discount, l_discount), 6) AS corr FROM lineitem ORDER BY col_a, col_b",
        "mutual_nn": '\nWITH l AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),\nr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1),\npairs AS (SELECT l.vec_id AS left_id, r.vec_id AS right_id,\n          l.embedding AS le, r.embedding AS re FROM l CROSS JOIN r),\nu AS (SELECT left_id, right_id, unnest(le)::DOUBLE AS x,\n      unnest(re)::DOUBLE AS y FROM pairs),\ncos AS (SELECT left_id, right_id,\n        sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS c\n        FROM u GROUP BY left_id, right_id),\nlr AS (SELECT left_id, right_id, c,\n       row_number() OVER (PARTITION BY left_id ORDER BY c DESC, right_id) AS rk\n       FROM cos),\nrl AS (SELECT left_id, right_id,\n       row_number() OVER (PARTITION BY right_id ORDER BY c DESC, left_id) AS rk\n       FROM cos)\nSELECT lr.left_id, lr.right_id, round(lr.c, 6) AS cos_sim\nFROM lr JOIN rl ON lr.left_id = rl.left_id AND lr.right_id = rl.right_id\nWHERE lr.rk = 1 AND rl.rk = 1 ORDER BY lr.left_id\n',
        "winnow": "\nWITH d AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t\n           FROM documents),\ng AS (SELECT doc_id, [md5(substr(t, i, 8)) FOR i IN\n      generate_series(1, greatest(len(t) - 7, 0))] AS h FROM d),\nf AS (SELECT doc_id, list_distinct([list_min(h[j:j+7]) FOR j IN\n      generate_series(1, greatest(len(h) - 7,\n      CASE WHEN len(h) >= 1 THEN 1 ELSE 0 END))]) AS fps FROM g)\nSELECT doc_id, len(fps) AS n_fps, list_min(fps) AS min_fp,\n       list_max(fps) AS max_fp\nFROM f ORDER BY doc_id\n",
        "sparkbar": "\nWITH src AS (SELECT event_type, extract(hour FROM ts)::DOUBLE AS x, value FROM events),\nrng AS (SELECT event_type, min(x) AS xmin, max(x) AS xmax FROM src GROUP BY event_type),\nb AS (SELECT s.event_type,\n      least(greatest(floor((x - xmin) / (CASE WHEN xmax > xmin THEN xmax - xmin ELSE 1 END) * 8), 0), 7)::INT AS bk,\n      value FROM src s JOIN rng USING (event_type)),\nsums AS (SELECT event_type, bk, sum(value) AS s FROM b GROUP BY event_type, bk),\nmx AS (SELECT event_type, max(s) AS smax FROM sums GROUP BY event_type),\ngrid AS (SELECT DISTINCT event_type, gs.b FROM rng, generate_series(0, 7) AS gs(b)),\ncells AS (SELECT g.event_type, g.b,\n          CASE WHEN coalesce(s.s, 0) > 0\n               THEN chr((9600 + least(ceil(round(8 * s.s / m.smax, 9)), 8))::INT)\n               ELSE ' ' END AS ch\n          FROM grid g\n          LEFT JOIN sums s ON s.event_type = g.event_type AND s.bk = g.b\n          JOIN mx m ON m.event_type = g.event_type)\nSELECT event_type, string_agg(ch, '' ORDER BY b) AS bar\nFROM cells GROUP BY event_type ORDER BY event_type\n",
        "margin_pairs": '\nWITH l AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),\nr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1),\npairs AS (SELECT l.vec_id AS left_id, r.vec_id AS right_id,\n          l.embedding AS le, r.embedding AS re FROM l CROSS JOIN r),\nu AS (SELECT left_id, right_id, unnest(le)::DOUBLE AS x,\n      unnest(re)::DOUBLE AS y FROM pairs),\ncos AS (SELECT left_id, right_id,\n        sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS c\n        FROM u GROUP BY left_id, right_id),\nlr AS (SELECT left_id, right_id, c,\n       row_number() OVER (PARTITION BY left_id ORDER BY c DESC, right_id) AS rk\n       FROM cos),\nrl AS (SELECT left_id, right_id, c,\n       row_number() OVER (PARTITION BY right_id ORDER BY c DESC, left_id) AS rk\n       FROM cos),\nlavg AS (SELECT left_id, avg(round(c, 6)) AS la FROM lr WHERE rk <= 4\n         GROUP BY left_id),\nravg AS (SELECT right_id, avg(round(c, 6)) AS ra FROM rl WHERE rk <= 4\n         GROUP BY right_id)\nSELECT lr.left_id, lr.right_id, round(lr.c, 6) AS cos_sim,\n       round(round(lr.c, 6) / ((la + ra) / 2), 6) AS margin\nFROM lr JOIN rl ON lr.left_id = rl.left_id AND lr.right_id = rl.right_id\nJOIN lavg ON lavg.left_id = lr.left_id\nJOIN ravg ON ravg.right_id = lr.right_id\nWHERE lr.rk = 1 AND rl.rk = 1 ORDER BY lr.left_id\n',
        "dialect_ips": (
            "WITH b AS (SELECT doc_id, n_chars, lang, "
            " (doc_id * 9973) % 4294967296 AS ip, "
            " (1::BIGINT << (32 - ((doc_id % 25)::INT + 8))) AS span "
            " FROM documents), "
            "c AS (SELECT doc_id, n_chars, lang, ip, span, "
            " (ip // span) * span AS lo FROM b) "
            "SELECT doc_id, "
            "(doc_id * 7 % 300) <= 255 AS ok4, "
            "(doc_id % 99999) <= 9999 AS ok6, "
            "concat(((ip // 16777216) % 256)::VARCHAR, '.', "
            " ((ip // 65536) % 256)::VARCHAR, '.', "
            " ((ip // 256) % 256)::VARCHAR, '.', (ip % 256)::VARCHAR) AS ip, "
            "concat(((lo // 16777216) % 256)::VARCHAR, '.', "
            " ((lo // 65536) % 256)::VARCHAR, '.', "
            " ((lo // 256) % 256)::VARCHAR, '.', (lo % 256)::VARCHAR) AS cidr_lo, "
            "concat((((lo + span - 1) // 16777216) % 256)::VARCHAR, '.', "
            " (((lo + span - 1) // 65536) % 256)::VARCHAR, '.', "
            " (((lo + span - 1) // 256) % 256)::VARCHAR, '.', "
            " ((lo + span - 1) % 256)::VARCHAR) AS cidr_hi, "
            "bit_count(xor(doc_id, n_chars::BIGINT)) AS hd, "
            "CASE WHEN n_chars < 1 THEN 0 ELSE "
            " 1::BIGINT << (length(bin(n_chars)) - 1) END AS r2, "
            "coalesce(list_max(list_filter([1, 5, 10, 30], "
            " __e -> __e <= (doc_id % 40))), 1) AS rdn, "
            "CASE WHEN (doc_id % 90) < 1 THEN 0 WHEN (doc_id % 90) <= 17 "
            " THEN 17 WHEN (doc_id % 90) <= 24 THEN 18 "
            " WHEN (doc_id % 90) <= 34 THEN 25 WHEN (doc_id % 90) <= 44 "
            " THEN 35 WHEN (doc_id % 90) <= 54 THEN 45 ELSE 55 END AS ra, "
            "CASE WHEN (doc_id * 3 % 40000) < 1 THEN 0 ELSE "
            " list_max(list_filter([1, 10, 30, 60, 120, 180, 240, 300, 600, "
            " 1200, 1800, 3600, 7200, 18000, 36000], "
            " __e -> __e <= (doc_id * 3 % 40000))) END AS rdur, "
            "round(power(10, (doc_id % 8)))::BIGINT AS i10, "
            "CASE WHEN strpos(lang, 'e') > 0 THEN "
            " concat(substr(lang, 1, strpos(lang, 'e') - 1), 'E', "
            " substr(lang, strpos(lang, 'e') + 1)) ELSE lang END AS rpl, "
            "TRUE AS vu "
            "FROM c ORDER BY doc_id"
        ),
        "dialect_aggs2": 'SELECT event_type, round(sum(value), 6) AS sum_v, count(value) AS cnt_v, round((arg_max(value, event_id) - arg_min(value, event_id)) / (max(event_id) - min(event_id))::DOUBLE, 6) AS br, arg_max(user_id, event_id) FILTER (WHERE value > 2) AS amx, arg_min(user_id, event_id) FILTER (WHERE value > 2) AS amn FROM events GROUP BY event_type ORDER BY event_type',
        "dialect_dates2": 'SELECT event_id, (epoch_us(ts) // 1000000 // 300) * 300 AS b5, (epoch_us(ts) // 1000000 // 900) * 900 AS b15, (epoch_us(ts) // 1000000 // 1800) * 1800 AS slot, epoch_us(ts) // 1000000 // 3600 AS rh, epoch_us(ts) // 1000000 // 86400 AS rd, epoch_us(ts) // 1000 AS ms FROM events ORDER BY event_id',
        "distinct_on": (
            "SELECT DISTINCT ON (o_orderstatus, o_orderpriority) "
            "o_orderstatus, o_orderpriority, o_orderkey, o_orderdate "
            "FROM orders "
            "ORDER BY o_orderstatus, o_orderpriority, o_orderdate, o_orderkey"
        ),
        "dialect_clauses": (
            "SELECT o_custkey, count(*) AS n, "
            "row_number() OVER (ORDER BY sum(o_totalprice) DESC, "
            "o_custkey) AS rk "
            "FROM orders GROUP BY o_custkey "
            "QUALIFY rk <= 10 ORDER BY rk"
        ),
        "knn_accuracy": (
            "WITH pairs AS (SELECT q.vec_id AS qid, q.label AS ql, "
            " c.vec_id AS nid, c.label AS nl, q.embedding AS qe, "
            " c.embedding AS ce FROM embeddings q CROSS JOIN embeddings c "
            " WHERE q.vec_id <> c.vec_id), "
            "u AS (SELECT qid, ql, nid, nl, unnest(qe)::DOUBLE AS x, "
            " unnest(ce)::DOUBLE AS y FROM pairs), "
            "cos AS (SELECT qid, ql, nid, nl, "
            " sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS c "
            " FROM u GROUP BY qid, ql, nid, nl), "
            "nn AS (SELECT qid, ql, nl, row_number() OVER ("
            " PARTITION BY qid ORDER BY c DESC, nid) AS rk FROM cos) "
            "SELECT ql AS q_label, count(*) AS n, "
            "round(avg(CASE WHEN ql = nl THEN 1.0 ELSE 0.0 END), 6) AS acc "
            "FROM nn WHERE rk = 1 GROUP BY ql ORDER BY ql"
        ),
        "semantic_decon": (
            "WITH b AS (SELECT vec_id AS bid, embedding AS be "
            " FROM embeddings WHERE vec_id % 10 = 0), "
            "c AS (SELECT vec_id AS cid, embedding AS ce "
            " FROM embeddings WHERE vec_id % 10 <> 0), "
            "u AS (SELECT cid, bid, unnest(ce)::DOUBLE AS x, "
            " unnest(be)::DOUBLE AS y FROM c CROSS JOIN b), "
            "cos AS (SELECT cid, bid, "
            " sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS cs "
            " FROM u GROUP BY cid, bid), "
            "mx AS (SELECT cid, max(cs) AS m FROM cos GROUP BY cid) "
            "SELECT cid AS vec_id, round(m, 6) AS max_cos, "
            "m >= 0.9 AS contaminated FROM mx ORDER BY vec_id"
        ),
        "dialect_batch17": (
            "SELECT doc_id, "
            "lang AS fsd, "
            "lang || '.com.tr' AS ctf, "
            "'news.' || lang || '.com.tr' AS nl, "
            "'p' || doc_id AS bn, "
            "'q=' || doc_id || '#f' AS qsf, "
            "lang || '%20' || lang AS enc, "
            "lang || ' ' || doc_id AS dec, "
            "isoyear(make_date(2017, 1, (doc_id % 7)::INT + 1)) AS iy, "
            "datediff('day', DATE '0001-01-01', "
            "make_date(1970, 1, (doc_id % 28)::INT + 1)) + 366 AS dz, "
            "epoch_ms(1288834974657 + doc_id + 345) AS sdt, "
            "(doc_id + 345) * 4194304 AS sf, "
            "gcd(doc_id % 48, 36) AS g, "
            "lcm((doc_id % 7) + 1, 6) AS l "
            "FROM documents ORDER BY doc_id"
        ),
        "dialect_geo": (
            "WITH c AS (SELECT doc_id, "
            " (doc_id % 360) - 180 + 0.25 AS lon, "
            " (doc_id % 180) - 90 + 0.25 AS lat FROM documents) "
            "SELECT doc_id, "
            "floor((lon + 180) / 360 * 8388608)::BIGINT AS flon, "
            "floor((lat + 90) / 180 * 4194304)::BIGINT AS flat, "
            "CASE WHEN lon > -90 AND lon < 90 AND lat > -45 AND lat < 45 "
            " THEN 1 ELSE 0 END AS inside, "
            "round(degrees(2 * asin(sqrt(pow(sin(radians(lat) / 2), 2) "
            " + cos(radians(0)) * cos(radians(lat)) "
            " * pow(sin(radians(lon) / 2), 2)))), 6) AS ang "
            "FROM c ORDER BY doc_id"
        ),
        "sequence_next_node": (
            "WITH l AS (SELECT user_id, "
            " list(event_type ORDER BY ts, event_type) AS evs "
            " FROM events GROUP BY user_id), "
            "a AS (SELECT user_id, evs, "
            " list_min([i FOR i IN generate_series(1, len(evs)) "
            " IF evs[i] = 'view']) AS ix FROM l) "
            "SELECT user_id, "
            "CASE WHEN ix IS NOT NULL AND ix + 2 <= len(evs) "
            " AND evs[ix + 1] = 'click' THEN evs[ix + 2] END AS nxt "
            "FROM a ORDER BY user_id"
        ),
        "dialect_batch16": (
            "SELECT doc_id, "
            "array_to_string(CASE WHEN doc_id % 3 != 0 AND doc_id % 5 != 0 THEN "
            "[doc_id % 3, doc_id % 3, doc_id % 5, doc_id % 5] "
            "WHEN doc_id % 3 != 0 THEN "
            "[doc_id % 3, doc_id % 3, doc_id % 3, doc_id % 3] "
            "WHEN doc_id % 5 != 0 THEN [0, 0, doc_id % 5, doc_id % 5] "
            "ELSE [0, 0, 0, 0] END, ',') AS af, "
            "array_to_string(CASE WHEN doc_id % 3 != 0 THEN [doc_id % 3, doc_id % 3, 0] "
            "ELSE [0, 0, 0] END, ',') AS arf, "
            "(to_json(CASE WHEN doc_id % 2 = 1 THEN [[1], [1, 3], [1]] "
            "ELSE [[1, 0, 3], [1]] END))::VARCHAR AS asp, "
            "(doc_id % 4 = 2) AS hs, "
            "round(len(list_intersect(list_distinct([substr(lang, i, 1) "
            "FOR i IN generate_series(1, len(lang))]), "
            "['e','n','g','l','i','s','h']))::DOUBLE / "
            "len(list_distinct(list_concat([substr(lang, i, 1) "
            "FOR i IN generate_series(1, len(lang))], "
            "['e','n','g','l','i','s','h']))), 6) AS sj, "
            "array_to_string([strpos(text, 'the'), strpos(text, 'zzzqx')], ',') AS msp, "
            "regexp_replace(substr(text, 1, 8), "
            "'([\\\\|()^$.\\[\\]?*+{:-])', '\\\\\\1', 'g') AS qm, "
            "regexp_replace('SELECT ' || doc_id || ' FROM t WHERE x = 5', "
            "'\\d+', '?', 'g') AS nq, "
            "regexp_replace(md5(text), "
            "'^(.{8})(.{4})(.{4})(.{4})(.{12})$', "
            "'\\1-\\2-\\3-\\4-\\5') AS um, "
            "TRY_CAST(substr(text, 1, 2) AS BIGINT) AS i64n, "
            "coalesce(TRY_CAST(lang AS DOUBLE), 0) AS f0, "
            "TIMESTAMP '2024-01-01 00:00:00' "
            "+ to_days((doc_id % 28)::INT) AS tad, "
            "TIMESTAMP '2024-01-01 00:00:00' "
            "+ to_months((doc_id % 12)::INT) AS tim, "
            "substr(text, 3, 5) AS md, "
            "array_to_string(['/a/', '/a/' || lang || '/', '/a/' || lang || '/b'], ',') AS uph "
            "FROM documents ORDER BY doc_id"
        ),
        "clickhouse_funcs4": "SELECT doc_id, len(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'), x -> x != '')) AS n_toks, array_to_string([substr(substr(text, 1, 10), i, 3) FOR i IN generate_series(1, greatest(len(substr(text, 1, 10)) - 2, 0))], ',') AS grams3, list_contains(string_split_regex(text, '[^a-zA-Z0-9]+'), 'the') AS has_the, greatest(len(lang), 2) - len(list_filter([i FOR i IN generate_series(1, least(len(lang), 2))], i -> substr(lang, i, 1) = substr('en', i, 1))) AS hd, (doc_id >> 3) & 1 AS b3, coalesce(array_to_string([((1::BIGINT) << i)::VARCHAR FOR i IN generate_series(0, 62) IF ((doc_id % 64) >> i) & 1 = 1], ','), '') AS bml, (1::BIGINT) << (doc_id % 10) AS e2, printf('%.2f %s', (n_chars * 1024) / pow(1024, least(floor(log(1024, greatest(abs((n_chars * 1024)::DOUBLE), 1))), 8)), (['B','KiB','MiB','GiB','TiB','PiB','EiB','ZiB','YiB'])[least(floor(log(1024, greatest(abs((n_chars * 1024)::DOUBLE), 1))), 8)::INT + 1]) AS frs, list_product([(doc_id % 5)::DOUBLE + 1, 2]) AS prod, array_to_string(list_concat(([n_chars, doc_id, 7])[2:], ([n_chars, doc_id, 7])[1:1]), ',') AS rot, array_to_string((list_concat([n_chars], [0, 0]))[1:3], ',') AS rsz, (list_filter([1, doc_id % 6, 9], x -> x > 2))[1] AS afirst, len(list_filter([doc_id, n_chars, 3], x -> x % 2 = 0)) AS acnt, round(len(list_intersect([doc_id % 5, 1, 2], [1, 2, 3]))::DOUBLE / len(list_distinct(list_concat([doc_id % 5, 1, 2], [1, 2, 3]))), 6) AS aj, round(list_dot_product([1.5, 2.0], [(doc_id % 7)::DOUBLE, 2.0]), 6) AS dot, round(list_distance([0.0, 0.0], [3.0, (doc_id % 9)::DOUBLE]), 6) AS l2, monthname(make_date(2020, (doc_id % 12)::INT + 1, 5)) AS mn, dayname(make_date(2024, 3, (doc_id % 28)::INT + 1)) AS wd, datediff('day', DATE '1858-11-17', make_date(2024, 1, (doc_id % 28)::INT + 1)) AS mjd FROM documents ORDER BY doc_id",
        "strip_html": 'WITH h AS (SELECT doc_id, \'<div class="doc"><p>\' || text || \'</p><script>var x = 1;</script><!-- c -->&amp;<style>p{}</style>&nbsp;end</div>\' AS html FROM documents) SELECT doc_id, trim(regexp_replace(replace(replace(replace(replace(replace(replace(replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(html, \'(?is)<script[^>]*>.*?</script>\', \' \', \'g\'), \'(?is)<style[^>]*>.*?</style>\', \' \', \'g\'), \'(?s)<!--.*?-->\', \' \', \'g\'), \'<[^>]*>\', \' \', \'g\'), \'&nbsp;\', \' \'), \'&amp;\', \'&\'), \'&lt;\', \'<\'), \'&gt;\', \'>\'), \'&quot;\', \'"\'), \'&#39;\', \'\'\'\'), \'&apos;\', \'\'\'\'), \'\\s+\', \' \', \'g\')) AS clean FROM h ORDER BY doc_id',
        "summap_merge": (
            "SELECT user_id, event_type AS k, round(sum(value), 6) AS v "
            "FROM events GROUP BY user_id, event_type ORDER BY user_id, k"
        ),
        "dialect_final": (
            "WITH f AS (SELECT user_id, event_type, max_by(value, ts) AS value "
            "  FROM events GROUP BY user_id, event_type) "
            "SELECT event_type, count(*)::BIGINT AS n_keys, "
            "round(sum(value), 6) AS sum_latest "
            "FROM f GROUP BY event_type ORDER BY event_type"
        ),
        "image_neardup": (
            "WITH px AS (SELECT doc_id, r, c, "
            " (CASE WHEN r*9 + c = doc_id % 72 "
            "  THEN ((doc_id % 50)*7 + r*13 + c*29 + doc_id % 5) % 256 "
            "  ELSE ((doc_id % 50)*7 + r*13 + c*29) % 256 END) AS p "
            " FROM documents, generate_series(0, 7) AS gr(r), "
            " generate_series(0, 8) AS gc(c)), "
            "bits AS (SELECT a.doc_id, a.r, a.c, "
            " CASE WHEN a.p < b.p THEN 1 ELSE 0 END AS bit "
            " FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.r = b.r "
            " AND b.c = a.c + 1 WHERE a.c < 8), "
            "h AS (SELECT doc_id, "
            " sum(CASE WHEN r*8 + c < 32 "
            "  THEN bit * (2 ** (r*8 + c))::BIGINT ELSE 0 END)::BIGINT AS lo, "
            " sum(CASE WHEN r*8 + c >= 32 "
            "  THEN bit * (2 ** (r*8 + c - 32))::BIGINT ELSE 0 END)::BIGINT AS hi "
            " FROM bits GROUP BY doc_id) "
            "SELECT a.doc_id::BIGINT AS id_a, b.doc_id::BIGINT AS id_b, "
            "(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))::INT "
            " AS hamming "
            "FROM h a JOIN h b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3 "
            "ORDER BY id_a, id_b"
        ),
        "lttb_downsample": _lttb_oracle_sql(10),
        "embedding_drift": (
            "WITH cells AS (SELECT vec_id % 7 AS b, t.pos, "
            " avg(embedding[t.pos]::DOUBLE) AS m, count(*) AS n "
            " FROM embeddings, range(1, 65) t(pos) "
            " GROUP BY vec_id % 7, t.pos), "
            "cent AS (SELECT b, list(m ORDER BY pos) AS c, any_value(n) AS "
            " n_vecs FROM cells GROUP BY b), "
            "lagged AS (SELECT b, n_vecs, c, lag(c) OVER (ORDER BY b) AS p "
            " FROM cent) "
            "SELECT b AS bucket, n_vecs, "
            "round(list_dot_product(c, p) / (sqrt(list_dot_product(c, c)) "
            " * sqrt(list_dot_product(p, p))), 6) AS drift_cosine "
            "FROM lagged ORDER BY bucket"
        ),
        "cramers_v": (
            "WITH pairs AS (SELECT event_type AS a, user_id % 4 AS b, "
            " count(*)::DOUBLE AS c FROM events GROUP BY 1, 2), "
            "cells AS (SELECT a, b, c, sum(c) OVER (PARTITION BY a) AS ra, "
            " sum(c) OVER (PARTITION BY b) AS rb, sum(c) OVER () AS n "
            " FROM pairs), "
            "t AS (SELECT any_value(n) AS n, "
            " count(DISTINCT a)::DOUBLE AS r, count(DISTINCT b)::DOUBLE AS cc, "
            " sum(pow(c - ra * rb / n, 2) / (ra * rb / n)) "
            "  + any_value(n) - sum(ra * rb / n) AS chi2, "
            " sum((c / ra) * -(ra / n) * ln(ra / n)) AS ha, "
            " sum(-(c / n) * ln(c / rb)) AS hab FROM cells) "
            "SELECT round(chi2, 6) AS chi2, "
            "round(sqrt(chi2 / (n * (least(r, cc) - 1))), 6) AS cramers_v, "
            "round(sqrt(greatest(0, chi2 / n - (r - 1) * (cc - 1) / (n - 1)) "
            " / nullif(least(r - pow(r - 1, 2) / (n - 1), "
            "          cc - pow(cc - 1, 2) / (n - 1)) - 1, 0)), 6) "
            "AS cramers_v_bc, "
            "round(sqrt(chi2 / (chi2 + n)), 6) AS contingency_coeff, "
            "round((ha - hab) / ha, 6) AS theils_u FROM t"
        ),
        "dialect_batch21": (
            "WITH d AS (SELECT doc_id, (doc_id * 433) % 200000 AS v "
            "  FROM documents) "
            "SELECT doc_id, "
            "repeat('█', least(greatest(round((doc_id % 11) * 1.0)::INT, "
            "  0), 10)) AS br, "
            "(doc_id % 5)::INT AS sp, "
            "round((doc_id % 4) * 3600.0 + (doc_id % 60) * 60.0, 1)::DOUBLE "
            "AS ptd, "
            "coalesce(nullif(concat_ws(', ', CASE WHEN (v // 86400) > 0 THEN (v // 86400) || ' day' || (CASE WHEN (v // 86400) = 1 THEN '' ELSE 's' END) END, CASE WHEN ((v % 86400) // 3600) > 0 THEN ((v % 86400) // 3600) || ' hour' || (CASE WHEN ((v % 86400) // 3600) = 1 THEN '' ELSE 's' END) END, CASE WHEN ((v % 3600) // 60) > 0 THEN ((v % 3600) // 60) || ' minute' || (CASE WHEN ((v % 3600) // 60) = 1 THEN '' ELSE 's' END) END, CASE WHEN (v % 60) > 0 THEN (v % 60) || ' second' || (CASE WHEN (v % 60) = 1 THEN '' ELSE 's' END) END), ''), '0 seconds') AS frt, "
            "(SELECT n_name FROM nation WHERE n_nationkey = "
            "  d.doc_id % 30) AS jg "
            "FROM d ORDER BY doc_id"
        ),
        "dialect_batch21_aggs": (
            "SELECT event_type, "
            "round(quantile_cont(value, 0.5) FILTER (WHERE value > 10), 6) "
            "AS q50_hi, "
            "round(quantile_cont(value, 0.5) FILTER (WHERE value <= 10), 6) "
            "AS med_lo, "
            "round((quantile_cont(value, 0.25) FILTER (WHERE value > 0)) + "
            " (quantile_cont(value, 0.75) FILTER (WHERE value > 0)), 6) "
            "AS iqr_sum, "
            "coalesce(array_to_string(list_sort(list_distinct("
            "  list(trunc(value)::BIGINT) FILTER (WHERE value < 3))), "
            "  ','), '') AS low_vals "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "dialect_batch22": (
            # closed forms / DuckDB equivalents of every constructed
            # fixture column; floats via the same formula + round 6
            "SELECT doc_id, "
            "(regexp_matches(lang, '^e') OR regexp_matches(lang, 'n$')) AS mma, "
            "(CASE WHEN regexp_matches(lang, '^e') THEN 1 "
            "  WHEN regexp_matches(lang, 'n$') THEN 2 ELSE 0 END)::BIGINT AS mmi, "
            # leftmost-OCCURRENCE semantics (CH): the winning needle is
            # the one found earliest in the haystack, array order only
            # breaks position ties
            "(CASE "
            "  WHEN strpos(text, 'vector') > 0 AND (strpos(text, 'join') "
            "    = 0 OR strpos(text, 'vector') <= strpos(text, 'join')) "
            "    THEN 1 "
            "  WHEN strpos(text, 'join') > 0 THEN 2 "
            "  ELSE 0 END)::BIGINT AS msf, "
            "concat(CAST(doc_id % 7 AS VARCHAR), '|', "
            "  CAST((doc_id * 3) % 5 AS VARCHAR)) AS jar, "
            "(doc_id % 100)::BIGINT AS jeu, "
            "3::BIGINT AS jal, "
            "((doc_id % 2 = 0) != (doc_id % 3 = 0)) AS xr, "
            "(doc_id % 500)::BIGINT AS td, "
            "round(1.0 / (1.0 + exp(-((doc_id % 9) - 4))), 6) AS sg, "
            "lang AS fl, "
            "(CASE WHEN lang LIKE '%n' THEN lang ELSE lang || 'n' END) AS atc, "
            "(doc_id % 1000)::INT AS ms, "
            "date_trunc('week', make_date(isoyear("
            "  DATE '2020-01-01' + (doc_id % 800)::INT), 1, 4))::DATE AS isy, "
            "coalesce(TRY_CAST(substring(text, 1, 2) AS BIGINT), 0)::BIGINT AS u0, "
            "(doc_id % 50)::BIGINT AS u1, "
            "coalesce(TRY_CAST(substring(text, 1, 4) AS DATE), "
            "  DATE '1970-01-01') AS d0, "
            "TRY_CAST(concat(CAST(doc_id % 90 AS VARCHAR), '.25') "
            "  AS DECIMAL(18,2))::DOUBLE AS dec2, "
            "TRY_CAST(concat('2024-01-1', CAST(doc_id % 9 AS VARCHAR)) "
            "  AS TIMESTAMP) AS pdt, "
            "concat(array_to_string(regexp_extract_all("
            "  substring(text, 1, 60), '(th)(e)', 1), ','), '|', "
            "  array_to_string(regexp_extract_all("
            "  substring(text, 1, 60), '(th)(e)', 2), ',')) AS eag, "
            "concat('a', CAST(doc_id % 5 AS VARCHAR), ',b', "
            "  CAST(doc_id % 3 AS VARCHAR)) AS msk, "
            "concat('b', CAST(doc_id % 3 AS VARCHAR), ',a', "
            "  CAST(doc_id % 5 AS VARCHAR)) AS mrk "
            "FROM documents ORDER BY doc_id"
        ),
        "dialect_batch22_aggs": (
            "WITH mat AS (SELECT event_type, "
            "  round(corr(value, (user_id % 7)::DOUBLE), 6) AS cor12, "
            "  round(corr(value, value), 6) AS cor11, "
            "  round(covar_samp((user_id % 7)::DOUBLE, value), 6) AS cov21, "
            "  round(covar_samp((user_id % 7)::DOUBLE, "
            "    (user_id % 7)::DOUBLE), 6) AS cov22 "
            "  FROM events GROUP BY event_type) "
            "SELECT 'mat' AS part, event_type AS k, cor11, cor12, cov21, "
            "  cov22, NULL::VARCHAR AS last3 FROM mat "
            "UNION ALL "
            "SELECT 'last', CAST(doc_id AS VARCHAR), NULL::DOUBLE, "
            "  NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE, "
            "  array_to_string(list_sort([doc_id % 10, doc_id % 7, "
            "    doc_id % 5, doc_id % 3, doc_id % 2]), ',') FROM documents "
            "ORDER BY part, k"
        ),
        "dialect_batch23": (
            "SELECT doc_id, "
            "concat('1,', CAST(doc_id % 7 AS VARCHAR)) AS mu, "
            "(nullif(doc_id % 3, 0) IS NOT DISTINCT FROM "
            "  nullif(doc_id % 5, 0)) AS ind, "
            "concat(CAST(strpos(text, 'the') AS VARCHAR), ',', "
            "  CAST(strpos(text, 'join') AS VARCHAR)) AS msa, "
            "(CASE WHEN strpos(text, 'zebra') > 0 AND (strpos(text, 'join') = 0 "
            "    OR strpos(text, 'zebra') <= strpos(text, 'join')) "
            "  THEN strpos(text, 'zebra') "
            "  WHEN strpos(text, 'join') > 0 THEN strpos(text, 'join') "
            "  ELSE 0 END)::BIGINT AS msf, "
            "round(pow(1.0 + pow((doc_id % 4)::DOUBLE, 3) + 8.0, "
            "  1.0 / 3), 6) AS lp3, "
            "round(((doc_id % 5) + 1)::DOUBLE / sqrt(9.0 + "
            "  pow(((doc_id % 5) + 1)::DOUBLE, 2)), 6) AS nl2, "
            "concat('a=', CAST(doc_id % 9 AS VARCHAR), '|b=2') AS kvr, "
            "(CASE WHEN doc_id % 2 = 0 "
            "  THEN '123e4567-e89b-12d3-a456-426614174000' END) AS uid, "
            "concat('http://ex.com/p', CAST(doc_id AS VARCHAR)) AS cut, "
            "concat('a=', CAST(doc_id % 3 AS VARCHAR), '|b=2') AS ups, "
            "'a|b' AS upn, "
            "concat('v+', CAST(doc_id % 4 AS VARCHAR)) AS efc, "
            "'x y!z' AS dfc "
            "FROM documents ORDER BY doc_id"
        ),
        "dialect_batch23_aggs": (
            # t statistics replayed with FILTER aggregates; the sweep
            # position replayed as the minimal start point attaining the
            # per-type peak interval-overlap count (proof of equivalence
            # in q_dialect_batch23_aggs's fold: ends-before-starts at
            # equal points = half-open [v, v+10) occupancy)
            "WITH s AS (SELECT event_type, "
            "  avg(value) FILTER (user_id % 2 = 0) AS m0, "
            "  avg(value) FILTER (user_id % 2 = 1) AS m1, "
            "  var_samp(value) FILTER (user_id % 2 = 0) AS v0, "
            "  var_samp(value) FILTER (user_id % 2 = 1) AS v1, "
            "  count(value) FILTER (user_id % 2 = 0) AS n0, "
            "  count(value) FILTER (user_id % 2 = 1) AS n1, "
            "  sum(round(value, 2)) AS sv, count(*) AS n "
            "  FROM events GROUP BY event_type), "
            "pos AS (SELECT DISTINCT event_type AS et, value AS p "
            "  FROM events), "
            "occ AS (SELECT pos.et, pos.p, count(*) AS c "
            "  FROM pos JOIN events b ON pos.et = b.event_type "
            "    AND b.value <= pos.p AND pos.p < b.value + 10 "
            "  GROUP BY pos.et, pos.p), "
            "mip AS (SELECT et, p FROM (SELECT et, p, row_number() OVER ("
            "  PARTITION BY et ORDER BY c DESC, p ASC) AS rn FROM occ) "
            "  WHERE rn = 1) "
            "SELECT event_type, "
            "round((m0 - m1) / sqrt((((n0 - 1) * v0 + (n1 - 1) * v1) "
            "  / (n0 + n1 - 2)) * (1.0 / n0 + 1.0 / n1)), 6) AS st, "
            "round((m0 - m1) / sqrt(v0 / n0 + v1 / n1), 6) AS wt, "
            "round(sv, 4) AS sk1, "
            "round(2.0 * n, 4)::DOUBLE AS sk3, "
            "round(mip.p, 2) AS mip "
            "FROM s JOIN mip ON s.event_type = mip.et "
            "ORDER BY event_type"
        ),
        "dialect_batch25": (
            "SELECT doc_id, "
            "(doc_id % 3 = doc_id % 5) AS eq, "
            "(doc_id % 7 >= 3) AS ge, "
            "((doc_id % 128) * 72057594037927936)::BIGINT AS bs, "
            "0::BIGINT AS tzo, "
            "((DATE '2020-01-01' + (doc_id % 400)::INT - "
            "  DATE '1969-12-29') // 7)::INT AS rwn, "
            "(((doc_id % 50) + 0.25) * 2.0)::DOUBLE AS md, "
            "(doc_id * 1000000007)::DECIMAL(38,0)::VARCHAR AS i128, "
            "printf('%.2f %s', ((doc_id % 800) * 1234) / "
            "  (CASE WHEN (doc_id % 800) * 1234 >= 1000 THEN 1000.0 "
            "   ELSE 1.0 END), "
            "  CASE WHEN (doc_id % 800) * 1234 >= 1000 THEN 'KB' "
            "   ELSE 'B' END) AS frd, "
            "list_contains(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), "
            "  'the') AS ht, "
            "NULL::BOOLEAN AS htn, "
            "length((doc_id * 37)::VARCHAR)::INT AS vw "
            "FROM documents ORDER BY doc_id"
        ),
        "dialect_batch26": (
            "SELECT doc_id, "
            f"floor({_erf_duck('(doc_id % 13) / 3.0 - 2.0')} * 10000)"
            "::BIGINT AS erf4, "
            f"floor({_lgamma_duck('(doc_id % 10) + 1.5')} * 10000)"
            "::BIGINT AS lg4, "
            "CASE WHEN doc_id % 3 = 0 THEN '0' ELSE doc_id::VARCHAR END "
            "  AS eas, "
            "(doc_id % 5 + 1)::BIGINT AS arr1, 6::BIGINT AS arr2, "
            "regexp_matches(text, 't.*h.*e', 's') AS hs, "
            "list_extract(['A', 'BC'], (doc_id % 2) + 1) AS ub, "
            "'pa' AS bsl, "
            f"({_morton_duck()[0]})::BIGINT AS me, "
            f"({_morton_duck()[1]})::BIGINT AS mdx, "
            f"({_morton_duck()[2]})::BIGINT AS mdy, "
            "(ascii(substr('abcdefgh', (doc_id % 5)::INT + 1, 1)) "
            " + 256 * ascii(substr('abcdefgh', (doc_id % 5)::INT + 2, 1)) "
            " + 65536 * ascii(substr('abcdefgh', (doc_id % 5)::INT + 3, 1))"
            ")::BIGINT AS ri, "
            "chr(65 + (doc_id % 26)::INT) AS rs, "
            "(((doc_id % 10) - 5.0) * ((doc_id % 10) - 5.0) / 16.0 "
            " + ((doc_id % 7) - 3.0) * ((doc_id % 7) - 3.0) / 9.0 <= 1.0) "
            "  AS pe, "
            "'7zz,ebp,kpb,s00' AS gh, "
            "12::INT AS rlen, TRUE AS rb_ok, TRUE AS rp_ok, TRUE AS rc_ok, "
            "((doc_id % 9) + 0.5)::DOUBLE AS d256, "
            "'http://ex.com/?a=' || doc_id::VARCHAR || '&c=3' AS cu, "
            "'k' || (doc_id % 3)::VARCHAR || '=' || doc_id::VARCHAR AS kv, "
            "'{\"doc_id\":' || doc_id::VARCHAR || '}' AS frj, "
            "doc_id::VARCHAR || chr(9) || 'zz' || chr(10) AS frt, "
            "lpad(doc_id::VARCHAR, 6, '0') AS lp, "
            "32::INT AS shl, TRUE AS hne, TRUE AS xx, "
            "'localhost' AS hn, 0::BIGINT AS up, 0::INT AS sl, "
            "list_extract(['ajdk', 'D7mKGSU', '35', "
            "  'CzdWts68Rbdp7onhMFkdHV'], (doc_id % 4) + 1) AS b58, "
            "hex(substr(text, 1, 8)::BLOB) AS b58rt "
            "FROM documents ORDER BY doc_id"
        ),
        "dialect_batch27": (
            "SELECT doc_id, "
            + "".join(
                "list_extract(["
                + ", ".join(vals)
                + f"], (doc_id % 8) + 1) AS {alias}, "
                for alias, vals in [
                    ("h6", [f"'{v}'" for v in _B27_HEX]),
                    ("s6", [f"'{v}'" for v in _B27_CANON]),
                    ("cut6", [f"'{v}'" for v in _B27_CUT]),
                    ("lo6", [f"'{v}'" for v in _B27_LO]),
                    ("hi6", [f"'{v}'" for v in _B27_HI]),
                    ("inr6", list(_B27_INR)),
                ]
            )
            + "((doc_id % 256) * 16777216 + ((doc_id * 7) % 256) * 65536 "
            "  + (doc_id % 100))::BIGINT AS v4n, "
            "NULL::BIGINT AS v4bad, "
            "((doc_id % 256) * 16777216 + ((doc_id * 7) % 256) * 65536 "
            "  + (doc_id % 100))::BIGINT AS t4, "
            "'00000000000000000000FFFF' || upper(lpad(to_hex("
            "  (doc_id % 256) * 16777216 + ((doc_id * 7) % 256) * 65536 "
            "  + (doc_id % 100)), 8, '0')) AS m6, "
            "((doc_id % 256) = 10) AS inr4 "
            "FROM documents ORDER BY doc_id"
        ),
        "dict_hierarchy": (
            "WITH RECURSIVE "
            "hdict AS (SELECT n_nationkey AS child, n_nationkey // 2 AS "
            "  parent FROM nation), "
            "hkeys AS (SELECT c_custkey, c_custkey % 25 AS k "
            "  FROM customer), "
            "walk(c_custkey, cur, chain, depth) AS ("
            "  SELECT hkeys.c_custkey, d.parent, [hkeys.k], 1 "
            "  FROM hkeys LEFT JOIN hdict d ON d.child = hkeys.k "
            "  UNION ALL "
            "  SELECT w.c_custkey, d.parent, list_append(w.chain, w.cur), "
            "  w.depth + 1 FROM walk w LEFT JOIN hdict d ON d.child = w.cur "
            # depth < 33: the engine chain is 1 key + up to max_depth=32
            # appended ancestors (33 elements), and oracle chain length
            # equals depth — off-by-one alignment matters only for
            # >=32-deep chains/cycles, but keep the caps identical
            "  WHERE w.cur IS NOT NULL AND w.cur > 0 AND w.depth < 33), "
            "sel AS (SELECT c_custkey, chain FROM ("
            "  SELECT c_custkey, chain, row_number() OVER ("
            "  PARTITION BY c_custkey ORDER BY depth DESC) AS rn FROM walk) "
            "  WHERE rn = 1) "
            "SELECT c_custkey, array_to_string(list_transform(chain, "
            "  __x -> __x::VARCHAR), ',') AS hier, "
            "list_contains(chain, 1) AS isin "
            "FROM sel ORDER BY c_custkey"
        ),
        "text_similarity": (
            "SELECT doc_id, "
            "round(jaro_similarity(lower(substr(text, 1, 12)), "
            "  lower(substr(text, 5, 12))), 6) AS jaro, "
            "round(jaro_winkler_similarity(lower(substr(text, 1, 12)), "
            "  lower(substr(text, 5, 12))), 6) AS jw, "
            "damerau_levenshtein(lower(substr(text, 1, 12)), "
            "  lower(substr(text, 5, 12)))::BIGINT AS dl "
            "FROM documents ORDER BY doc_id"
        ),
        "ml_aggregates": (
            "WITH mlb AS (SELECT event_type, value, "
            "  (user_id % 10)::DOUBLE AS x, "
            "  CASE WHEN (user_id * 2654435761) % 1000 < "
            "  300 + 40 * (user_id % 10) THEN 1 ELSE 0 END AS lbl "
            "  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL), "
            "mld AS (SELECT x, lbl::DOUBLE AS y FROM mlb), "
            "cats AS (SELECT event_type, sum(lbl)::DOUBLE AS g, "
            "  sum(1 - lbl)::DOUBLE AS b FROM mlb GROUP BY event_type), "
            "tot AS (SELECT sum(g) AS gg, sum(b) AS bb, "
            "  count(*)::BIGINT AS nc FROM cats), "
            "ivx AS (SELECT round(sum(CASE WHEN g > 0 AND b > 0 THEN "
            "  (g / gg - b / bb) * ln((g / gg) / (b / bb)) ELSE 0 END), 6) "
            "  AS iv, max(nc) AS n_categories, "
            "  sum(CASE WHEN g > 0 AND b > 0 THEN 0 ELSE 1 END)::BIGINT "
            "  AS n_skipped FROM cats, tot), "
            "lin AS (SELECT round(regr_intercept(value, x), 5) AS lin_w0, "
            "  round(regr_slope(value, x), 5) AS lin_w1 FROM mlb), "
            + _logistic_duck_cte(5)
            + " SELECT iv, n_categories, n_skipped, lin_w0, lin_w1, "
            "round(w0, 5) AS log_w0, round(w1, 5) AS log_w1 "
            "FROM ivx, lin, it5"
        ),
        "dialect_batch24": (
            # merging partial states == the direct aggregate (the
            # semantic claim of the State/Merge mapping), so the oracle
            # is the single-phase form; toInt64 truncates (trunc, not
            # DuckDB's round-half-even CAST)
            "WITH mm AS (SELECT event_type, min(user_id % 10) AS mn, "
            "  max(user_id % 10) AS mx FROM events GROUP BY event_type), "
            "base AS (SELECT e.event_type, "
            "  round(sum(round(value, 2)), 4) AS sm, "
            "  count(value)::BIGINT AS cm, "
            "  floor(avg(round(value, 2)) * 1000000)::BIGINT AS am, "
            "  round(quantile_cont(round(value, 2), 0.5), 4) AS qm, "
            "  round(sum(round(value, 2)), 4) AS fe1, "
            "  round(count(*) * 1.0, 4)::DOUBLE AS fe2, "
            "  0.0::DOUBLE AS sod, "
            "  round(sum(round(value, 2)) FILTER (value >= 0 AND value < 100), "
            "    4) AS rs1, "
            "  round(sum(round(value, 2)) FILTER (value >= 400 AND value < 500), "
            "    4) AS rs5, "
            "  round(sum(round(value, 2)) FILTER (user_id % 10 = mm.mn), 4) "
            "    AS sam, "
            "  round(sum(round(value, 2)) FILTER (user_id % 10 = mm.mx), 4) "
            "    AS sax, "
            "  concat_ws(',', "
            + ", ".join(
                f"CASE WHEN count(*) FILTER (trunc(value)::BIGINT % 5 = {p}) "
                f"> 0 THEN '{p * 10}' ELSE '-1' END"
                for p in range(5)
            )
            + ") AS gia, "
            "  3::BIGINT AS ali "
            "  FROM events e JOIN mm ON e.event_type = mm.event_type "
            "  GROUP BY e.event_type, mm.mn, mm.mx) "
            "SELECT * FROM base ORDER BY event_type"
        ),
        "dialect_batch23_window": (
            "SELECT event_id, "
            "floor(CASE WHEN lag(value) OVER w IS NULL THEN NULL "
            "  WHEN floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w = 0 "
            "    THEN 0.0 "
            "  ELSE greatest(0.0, (value - lag(value) OVER w) "
            "    / (floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w)) "
            "  END * 1000000)::BIGINT AS nnd "
            "FROM events "
            "WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id) "
            "ORDER BY event_id"
        ),
        "dialect_modifiers": (
            # hand-expanded form of the modifier chain: COLUMNS regex
            # selects (o_totalprice, o_shippriority), REPLACE swaps the
            # discounted-price expression in place, APPLY(sum) wraps both
            "WITH a AS (SELECT o_orderpriority, "
            "  round(sum(round(o_totalprice * 0.9, 3)), 2) AS sum_totalprice, "
            "  sum(o_custkey)::BIGINT AS sum_custkey "
            "  FROM orders GROUP BY o_orderpriority), "
            "b AS (SELECT r_regionkey, upper(r_name) AS r_name FROM region) "
            "SELECT o_orderpriority, sum_totalprice, sum_custkey, "
            "r_name FROM a LEFT JOIN b ON "
            "(substring(o_orderpriority, 1, 1)::INT - 1) = b.r_regionkey "
            "ORDER BY o_orderpriority"
        ),
        "rank_assoc": (
            "WITH e AS (SELECT event_type AS g, value AS x, "
            "  floor(epoch(ts))::DOUBLE AS y FROM events "
            "  WHERE value IS NOT NULL AND ts IS NOT NULL), "
            "r AS (SELECT g, "
            "  avg(rnx) OVER (PARTITION BY g, x) AS rx, "
            "  avg(rny) OVER (PARTITION BY g, y) AS ry "
            "  FROM (SELECT g, x, y, "
            "    row_number() OVER (PARTITION BY g ORDER BY x) AS rnx, "
            "    row_number() OVER (PARTITION BY g ORDER BY y) AS rny "
            "    FROM e)) "
            "SELECT g AS event_type, round(corr(rx, ry), 6) AS rho, "
            "count(*)::BIGINT AS n FROM r GROUP BY g ORDER BY g"
        ),
        "hypothesis_tests": (
            "WITH s AS (SELECT event_type AS g, count(value)::DOUBLE AS n, "
            " avg(value) AS m, var_samp(value) AS v FROM events "
            " WHERE event_type IN ('click', 'purchase') "
            " AND value IS NOT NULL GROUP BY event_type), "
            "wide AS (SELECT "
            " max(CASE WHEN g = 'click' THEN n END) AS na, "
            " max(CASE WHEN g = 'click' THEN m END) AS ma, "
            " max(CASE WHEN g = 'click' THEN v END) AS va, "
            " max(CASE WHEN g = 'purchase' THEN n END) AS nb, "
            " max(CASE WHEN g = 'purchase' THEN m END) AS mb, "
            " max(CASE WHEN g = 'purchase' THEN v END) AS vb FROM s), "
            "vals AS (SELECT value AS v, "
            " sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::DOUBLE AS ca, "
            " sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::DOUBLE AS cb "
            " FROM events WHERE event_type IN ('click', 'purchase') "
            " AND value IS NOT NULL GROUP BY value), "
            "rk AS (SELECT ca, cb, coalesce(sum(ca + cb) OVER ("
            " ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            " + (ca + cb + 1) / 2.0 AS rank FROM vals), "
            "uu AS (SELECT sum(ca * rank) - sum(ca) * (sum(ca) + 1) / 2 AS u, "
            " sum(ca) AS n_a, sum(cb) AS n_b FROM rk), "
            "cdf AS (SELECT sum(ca) OVER (ORDER BY v) / (SELECT sum(ca) "
            " FROM vals) AS fa, sum(cb) OVER (ORDER BY v) / (SELECT sum(cb) "
            " FROM vals) AS fb FROM vals), "
            "ks AS (SELECT round(max(abs(fa - fb)), 6) AS ks_d FROM cdf) "
            "SELECT round((ma - mb) / sqrt(va / na + vb / nb), 6) AS welch_t, "
            "round(pow(va / na + vb / nb, 2) / (pow(va / na, 2) / (na - 1) "
            " + pow(vb / nb, 2) / (nb - 1)), 4) AS welch_df, "
            "round((ma - mb) / sqrt(((na - 1) * va + (nb - 1) * vb) "
            " / (na + nb - 2) * (1 / na + 1 / nb)), 6) AS student_t, "
            "round(na + nb - 2, 4) AS student_df, "
            "u AS u_stat, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b, ks_d, "
            "round((ma - mb) / sqrt(1.5 / na + 2.5 / nb), 6) AS mean_z "
            "FROM wide, uu, ks"
        ),
        "anova": (
            "WITH cells AS (SELECT event_type, count(value) AS n, "
            " sum(value) AS s, sum(value * value) AS ss FROM events "
            " WHERE value IS NOT NULL GROUP BY event_type), "
            "t AS (SELECT count(*) AS k, sum(n) AS nn, sum(s) AS ts, "
            " sum(ss) AS tss, sum(s * s / n) AS a FROM cells) "
            "SELECT round(((a - ts * ts / nn) / (k - 1)) / "
            " ((tss - a) / (nn - k)), 6) AS f_stat, "
            "(k - 1)::BIGINT AS df_between, (nn - k)::BIGINT AS df_within "
            "FROM t"
        ),
        "domain_block": (
            "SELECT doc_id, "
            "concat('https://', CASE WHEN doc_id % 7 = 0 THEN "
            " concat('s', (doc_id % 5)::VARCHAR, '.spam.net') "
            " WHEN doc_id % 7 = 1 THEN 'ads.tracker.io' "
            " ELSE concat(source, '.example.com') END, '/p/', "
            " doc_id::VARCHAR) AS url, "
            "(doc_id % 7 = 0 OR doc_id % 7 = 1 "
            " OR (doc_id % 7 NOT IN (0, 1) AND source = 'src3')) AS blocked "
            "FROM documents ORDER BY doc_id"
        ),
        "projection_agg": (
            "SELECT event_type, round(sum(value), 4) AS sum_v, "
            "count(value) AS cnt_v, round(min(value), 6) AS min_v, "
            "round(max(value), 6) AS max_v, round(avg(value), 6) AS avg_v "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "ttl_expire": (
            "SELECT event_id, event_type FROM events "
            "WHERE NOT (ts + INTERVAL 10 DAY < TIMESTAMP '2024-01-25 00:00:00' "
            "AND event_type != 'purchase')"
        ),
        "mutation_update": (
            "SELECT event_id, event_type, "
            "round(CASE WHEN event_type = 'purchase' "
            " THEN value * 2 ELSE value END, 2) AS value "
            "FROM events "
            "WHERE NOT coalesce(event_type = 'error', false)"
        ),
        "dialect_funnel": (
            "SELECT user_id, "
            "max(CASE "
            "WHEN EXISTS (SELECT 1 FROM events e1, events e2, events e3 "
            " WHERE e1.user_id = u.user_id AND e2.user_id = u.user_id "
            " AND e3.user_id = u.user_id AND e1.event_type = 'view' "
            " AND e2.event_type = 'click' AND e3.event_type = 'purchase' "
            " AND e2.ts >= e1.ts AND e3.ts >= e2.ts "
            " AND epoch_us(e3.ts) <= epoch_us(e1.ts) + 86400000000::BIGINT "
            " AND epoch_us(e2.ts) <= epoch_us(e1.ts) + 86400000000::BIGINT) "
            "THEN 3 "
            "WHEN EXISTS (SELECT 1 FROM events e1, events e2 "
            " WHERE e1.user_id = u.user_id AND e2.user_id = u.user_id "
            " AND e1.event_type = 'view' AND e2.event_type = 'click' "
            " AND e2.ts >= e1.ts "
            " AND epoch_us(e2.ts) <= epoch_us(e1.ts) + 86400000000::BIGINT) "
            "THEN 2 "
            "WHEN EXISTS (SELECT 1 FROM events e1 "
            " WHERE e1.user_id = u.user_id AND e1.event_type = 'view') "
            "THEN 1 ELSE 0 END) AS lvl "
            "FROM events u GROUP BY user_id ORDER BY user_id"
        ),
        "dialect_retention": (
            "SELECT user_id, "
            "max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS saw_view, "
            "max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
            " * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
            " AS view_click, "
            "max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
            " * max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
            " AS view_purchase "
            "FROM events GROUP BY user_id ORDER BY user_id"
        ),
        "dialect_stats": (
            "SELECT l_returnflag, "
            "round(var_pop(l_quantity), 6) AS var_qty, "
            "round(var_samp(l_quantity), 6) AS vars_qty, "
            "round(stddev_pop(l_quantity), 6) AS sd_qty, "
            "round(covar_pop(l_quantity, l_discount), 6) AS cov_qd, "
            "round(skewness(l_discount) * (count(*) - 2) "
            " / sqrt(count(*) * (count(*) - 1.0)), 6) AS skew_disc, "
            "round(kurtosis(l_discount) * (count(*) - 2.0) * (count(*) - 3.0) "
            " / ((count(*) - 1.0) * (count(*) + 1.0)) "
            " - 6.0 / (count(*) + 1.0) + 3.0, 6) AS kurt_disc, "
            "round(regr_slope(l_extendedprice, l_quantity), 6) AS slope "
            "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
        ),
        "ema_recursive": (
            "WITH s AS (SELECT user_id, "
            "  list(struct_pack(t := epoch_us(ts), x := CAST(value AS DOUBLE)) "
            "       ORDER BY epoch_us(ts), CAST(value AS DOUBLE)) AS evs "
            "  FROM events GROUP BY user_id) "
            "SELECT user_id, len(evs)::BIGINT AS n_events, "
            "round(list_reduce(evs, (a, e) -> struct_pack("
            "  t := e.t, "
            "  x := a.x * pow(2, -(e.t - a.t)/3600000000.0) "
            "     + e.x * (1 - pow(2, -(e.t - a.t)/3600000000.0)))).x, 6) AS ema "
            "FROM s"
        ),
        "mad_outliers": (
            "WITH med AS (SELECT event_type, median(value) AS m "
            "  FROM events GROUP BY event_type), "
            "mad AS (SELECT e.event_type, median(abs(e.value - med.m)) AS md "
            "  FROM events e JOIN med USING (event_type) GROUP BY e.event_type) "
            "SELECT e.event_id, e.event_type, "
            "round(0.6745 * (e.value - med.m) / nullif(mad.md, 0), 6) AS mod_z, "
            "coalesce(abs(0.6745 * (e.value - med.m) / nullif(mad.md, 0)) > 3.5, "
            " false) AS is_outlier "
            "FROM events e JOIN med USING (event_type) "
            "JOIN mad USING (event_type) ORDER BY e.event_id"
        ),
        "exactsubstr_dedup": (
            "WITH src AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN text || "
            "' common footer boilerplate sentence appended here exactly' "
            "ELSE text END AS text FROM documents), "
            "w AS (SELECT doc_id, "
            "string_split_regex(trim(lower(text)), '\\s+') AS lw, "
            "string_split_regex(trim(text), '\\s+') AS ow FROM src), "
            "posts AS (SELECT doc_id, "
            "unnest(generate_series(1, greatest(len(lw) - 2, 0))) AS pos, "
            "unnest([array_to_string(lw[i:i+2], ' ') "
            "FOR i IN generate_series(1, greatest(len(lw) - 2, 0))]) AS g "
            "FROM w), "
            "s1 AS (SELECT g, count(*) AS c, min(doc_id) AS fd "
            "FROM posts GROUP BY g), "
            "s2 AS (SELECT s1.g, s1.c, s1.fd, min(p.pos) AS fp "
            "FROM posts p JOIN s1 ON p.g = s1.g AND p.doc_id = s1.fd "
            "GROUP BY s1.g, s1.c, s1.fd), "
            "dup AS (SELECT p.doc_id, p.pos FROM posts p JOIN s2 ON p.g = s2.g "
            "WHERE s2.c >= 2 AND NOT (p.doc_id = s2.fd AND p.pos = s2.fp)), "
            "cov AS (SELECT DISTINCT doc_id, pos + j AS cpos "
            "FROM dup, generate_series(0, 2) AS t(j)), "
            "isl AS (SELECT doc_id, cpos, cpos - row_number() OVER ("
            "PARTITION BY doc_id ORDER BY cpos) AS grp FROM cov), "
            "runs AS (SELECT doc_id, min(cpos) AS s, max(cpos) AS e, "
            "max(cpos) - min(cpos) + 1 AS st FROM isl GROUP BY doc_id, grp "
            "HAVING max(cpos) - min(cpos) + 1 >= 6), "
            "dr AS (SELECT doc_id, unnest(generate_series(s, e)) AS pos "
            "FROM runs), "
            "toks AS (SELECT doc_id, "
            "unnest(generate_series(1, len(ow))) AS pos, "
            "unnest(ow) AS tok FROM w), "
            "kept AS (SELECT t.doc_id, t.pos, t.tok FROM toks t "
            "LEFT JOIN dr ON t.doc_id = dr.doc_id AND t.pos = dr.pos "
            "WHERE dr.pos IS NULL), "
            "reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) "
            "AS clean_text FROM kept GROUP BY doc_id), "
            "stats AS (SELECT doc_id, sum(st)::BIGINT AS n_tokens_removed, "
            "count(*)::BIGINT AS n_spans_removed FROM runs GROUP BY doc_id) "
            "SELECT s.doc_id, coalesce(r.clean_text, '') AS clean_text, "
            "coalesce(st.n_tokens_removed, 0) AS n_tokens_removed, "
            "coalesce(st.n_spans_removed, 0) AS n_spans_removed "
            "FROM src s LEFT JOIN reb r USING (doc_id) "
            "LEFT JOIN stats st USING (doc_id) ORDER BY s.doc_id"
        ),
        "dict_sql": (
            "SELECT o_orderkey, "
            "coalesce((SELECT c_name FROM customer WHERE c_custkey = "
            " (CASE WHEN o_orderkey % 10 = 0 THEN -1 ELSE o_custkey END)), "
            " 'UNK') AS nm, "
            "((SELECT count(1) FROM customer WHERE c_custkey = "
            " (CASE WHEN o_orderkey % 10 = 0 THEN -1 ELSE o_custkey END)) > 0) AS h "
            "FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey"
        ),
        "c4_rules": (
            "WITH src AS (SELECT doc_id, regexp_replace(text, "
            "'(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ', '\\1' || chr(10), 'g') AS t "
            "  FROM documents), "
            "k AS (SELECT doc_id, t, list_filter(string_split(t, chr(10)), "
            "  l -> regexp_matches(trim(l), '[.!?\"]$') "
            "   AND len(list_filter(string_split_regex(trim(l), '\\s+'), "
            "        w -> w != '')) >= 5 "
            "   AND NOT contains(lower(l), 'javascript')) AS kept FROM src), "
            "c AS (SELECT doc_id, t, kept, "
            "  coalesce(array_to_string(kept, chr(10)), '') AS clean_text FROM k) "
            "SELECT doc_id, clean_text, len(kept)::INT AS n_lines_kept, "
            "len(regexp_extract_all(clean_text, '[.!?]'))::INT AS n_sentences, "
            "len(regexp_extract_all(clean_text, '[.!?]')) >= 3 AS r_min_sentences, "
            "NOT contains(t, '{') AS r_no_brace, "
            "NOT contains(lower(t), 'lorem ipsum') AS r_no_lorem, "
            "(len(regexp_extract_all(clean_text, '[.!?]')) >= 3 "
            " AND NOT contains(t, '{') "
            " AND NOT contains(lower(t), 'lorem ipsum')) AS c4_pass "
            "FROM c ORDER BY doc_id"
        ),
        "dialect_batch18": (
            "WITH b AS (SELECT doc_id, text, "
            "  make_date(2024, (doc_id % 12)::INT + 1, (doc_id % 28)::INT + 1) AS d, "
            "  substr(text, 1, 12) AS sa, substr(text, 3, 12) AS sb, "
            "  substr(text, 1, 60) AS hh FROM documents), "
            "g AS (SELECT doc_id, d, "
            "  CASE WHEN len(sa) >= 4 THEN list_distinct([substr(sa, i, 4) "
            "    FOR i IN generate_series(1, len(sa) - 3)]) "
            "   WHEN len(sa) >= 1 THEN [sa] ELSE [] END AS ga, "
            "  CASE WHEN len(sb) >= 4 THEN list_distinct([substr(sb, i, 4) "
            "    FOR i IN generate_series(1, len(sb) - 3)]) "
            "   WHEN len(sb) >= 1 THEN [sb] ELSE [] END AS gb, "
            "  CASE WHEN len(hh) >= 4 THEN list_distinct([substr(hh, i, 4) "
            "    FOR i IN generate_series(1, len(hh) - 3)]) "
            "   WHEN len(hh) >= 1 THEN [hh] ELSE [] END AS gh "
            "  FROM b) "
            "SELECT doc_id, "
            "date_trunc('month', d)::TIMESTAMP AS mt, "
            "(floor((dayofyear(d) - 1 - ((7 - dayofweek(date_trunc('year', d))) % 7)) "
            " / 7.0) + 1)::INT AS wk, "
            "(CASE WHEN (floor((dayofyear(d) - 1 - ((7 - dayofweek(date_trunc('year', d))) % 7)) "
            " / 7.0) + 1)::INT > 0 "
            "THEN year(d) * 100 + (floor((dayofyear(d) - 1 - "
            " ((7 - dayofweek(date_trunc('year', d))) % 7)) / 7.0) + 1)::INT "
            "ELSE (year(d) - 1) * 100 + (floor(datediff('day', "
            " make_date(year(d) - 1, 1, 1) + to_days(((7 - dayofweek(make_date(year(d) - 1, 1, 1))) % 7)::INT), "
            " d) / 7.0) + 1)::INT END)::INT AS yw, "
            "round(CASE WHEN len(ga) + len(gb) = 0 THEN 0.0 ELSE "
            " 1.0 - 2.0 * len(list_intersect(ga, gb)) / (len(ga) + len(gb)) END, 6) AS nd, "
            "round(len(list_intersect(['ther', 'here'], gh))::DOUBLE / 2, 6) AS ns, "
            "json_array_length('[' || (doc_id % 5) || ',2]')::BIGINT AS jl, "
            "(to_json([(doc_id % 3)::BIGINT, 7::BIGINT]))::VARCHAR AS js, "
            "datediff('day', TIMESTAMP '2024-01-01 00:00:00', "
            " make_date(2024, (doc_id % 12)::INT + 1, 15)::TIMESTAMP)::BIGINT AS td "
            "FROM g ORDER BY doc_id"
        ),
        "dialect_batch19": (
            # age month: calendar month delta minus one when end hasn't
            # reached the start's clamped day-of-month (times are 00:00
            # here so the time tiebreak drops out); age day: truncated
            # epoch-diff division.  regexp_replace WITHOUT 'g' is
            # first-occurrence in DuckDB — the native replaceRegexpOne
            # oracle.  timeSlots count = boundary-index difference + 1.
            "WITH b AS (SELECT doc_id, n_chars, substr(text, 1, 40) AS t40, "
            "  make_date(2024, (doc_id % 12)::INT + 1, (doc_id % 28)::INT + 1) AS d, "
            "  (3600 * (doc_id % 24) + 1710460800)::BIGINT AS slot0, "
            "  ((doc_id % 5) * 900)::BIGINT AS dur "
            "  FROM documents) "
            "SELECT doc_id, "
            "((year(d) * 12 + month(d)) - (2024 * 12 + 1) "
            " - CASE WHEN day(d) < least(15, day(last_day(d))) THEN 1 ELSE 0 END)"
            "::BIGINT AS agm, "
            "trunc((epoch(d::TIMESTAMP) - epoch(TIMESTAMP '2024-03-15 00:00:00')) "
            " / 86400.0)::BIGINT AS agd, "
            "strptime('2024-0' || ((doc_id % 9) + 1) || '-05 06:07:08', "
            " '%Y-%m-%d %H:%M:%S') AS pd, "
            "(doc_id || ',abc') AS eg, "
            "('2|' || (doc_id % 5) || '|9') AS asl, "
            "((doc_id % 3) = 1) AS sj, "
            "regexp_replace(t40, '[aeiou]+', '_') AS rro, "
            "(((slot0 + dur) // 1800) - (slot0 // 1800) + 1)::INT AS tsn, "
            "(2024 * 12 + (doc_id % 12)::INT + 1)::INT AS rmn, "
            "(((doc_id - 50) % 7 + 7) % 7)::BIGINT AS pm, "
            "(floor((n_chars % 100) * 7 / 100.0) + 1)::BIGINT AS wb, "
            "list_aggregate(list_sort(list_distinct([(doc_id % 3)::BIGINT, 1, 2])), "
            " 'string_agg', ',') AS au "
            "FROM b ORDER BY doc_id"
        ),
        "dialect_batch19_aggs": (
            # CH skewSamp = m3/varSamp^1.5, kurtSamp = m4/varSamp² —
            # explicit central-moment arithmetic (DuckDB's own skewness/
            # kurtosis are the bias-corrected g-statistics, a different
            # estimator family)
            "WITH mu AS (SELECT lang, count(*)::BIGINT AS n, "
            "  avg(n_chars) AS m, var_samp(n_chars) AS vs "
            "  FROM documents GROUP BY lang), "
            "mom AS (SELECT d.lang, "
            "  sum(pow(d.n_chars - mu.m, 3)) / count(*) AS m3, "
            "  sum(pow(d.n_chars - mu.m, 4)) / count(*) AS m4 "
            "  FROM documents d JOIN mu USING (lang) GROUP BY d.lang) "
            "SELECT mu.lang, mu.n, "
            "round(mom.m3 / nullif(pow(mu.vs, 1.5), 0), 6) AS sk, "
            "round(mom.m4 / nullif(pow(mu.vs, 2), 0), 6) AS ku "
            "FROM mu JOIN mom USING (lang) ORDER BY mu.lang"
        ),
        "dialect_batch20": (
            "SELECT doc_id, "
            "concat('A=', (doc_id % 5) * 2, ',B=', 14) AS ma, "
            "true AS vj, false AS ivj, "
            "'Object' AS jto, 'Int64' AS jti, 'String' AS jts, "
            "(DATE '2024-01-15' + (3 * (doc_id % 8)) * INTERVAL 1 MONTH)"
            "::DATE AS aq, "
            "(DATE '2024-01-15' - (3 * (doc_id % 8)) * INTERVAL 1 MONTH)"
            "::DATE AS sq, "
            "strptime((20240100 + doc_id % 28 + 1)::VARCHAR, '%Y%m%d')::DATE "
            "AS ymd, "
            "strptime((20240115000000 + doc_id % 59)::VARCHAR, "
            "'%Y%m%d%H%M%S') AS ymdh, "
            "CASE doc_id % 4 WHEN 0 THEN 'zero' WHEN 1 THEN 'one' "
            "WHEN 2 THEN 'two' ELSE 'many' END AS cw, "
            "((epoch_ms(strptime('2024-01-15', '%Y-%m-%d') + "
            "  (doc_id % 60) * INTERVAL 1 SECOND) - 1288834974657) "
            "* 4194304) AS sf "
            "FROM documents ORDER BY doc_id"
        ),
        "dialect_batch20_aggs": (
            # EMA via the order-independent closed form; union length via
            # gaps-and-islands (frontier = running max of prior ends);
            # maxIntersections via a +-1 endpoint sweep with ends sorted
            # before starts at ties (matches the Spark struct sort on
            # (t, d), d=-1 for ends); deltaSumTimestamp via lag over
            # (t, v) ordering (same tie resolution as the fold's
            # array_sort)
            "WITH e AS MATERIALIZED (SELECT user_id, "
            "  floor(epoch(ts))::BIGINT AS t, value AS v FROM events), "
            "ema AS (SELECT user_id, round("
            "  sum(v * pow(0.5, (tmax - t) / 3600.0)) / "
            "  sum(pow(0.5, (tmax - t) / 3600.0)), 6) AS ema "
            "  FROM (SELECT user_id, t, v, "
            "    max(t) OVER (PARTITION BY user_id) AS tmax FROM e) "
            "  GROUP BY user_id), "
            "iv AS (SELECT user_id, t AS s, t + 600 AS e2, "
            "  coalesce(max(t + 600) OVER (PARTITION BY user_id ORDER BY t "
            "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), "
            "    -9223372036854775807) AS fr FROM e), "
            "isl AS (SELECT user_id, s, e2, sum(CASE WHEN s > fr THEN 1 "
            "  ELSE 0 END) OVER (PARTITION BY user_id ORDER BY s, e2 "
            "  ROWS UNBOUNDED PRECEDING) AS grp FROM iv), "
            "ils AS (SELECT user_id, round(sum(ln)::DOUBLE, 1) AS ils FROM "
            "  (SELECT user_id, grp, max(e2) - min(s) AS ln FROM isl "
            "   GROUP BY user_id, grp) GROUP BY user_id), "
            "ev AS (SELECT user_id, t, 1 AS d FROM e "
            "  UNION ALL SELECT user_id, t + 600, -1 FROM e), "
            "mi AS (SELECT user_id, max(c)::INT AS mi FROM "
            "  (SELECT user_id, sum(d) OVER (PARTITION BY user_id "
            "   ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS c FROM ev) "
            "  GROUP BY user_id), "
            "ds AS (SELECT user_id, round(sum(CASE WHEN pv IS NOT NULL "
            "  AND v > pv THEN v - pv ELSE 0 END), 6) AS ds FROM "
            "  (SELECT user_id, v, lag(v) OVER (PARTITION BY user_id "
            "   ORDER BY t, v) AS pv FROM e) GROUP BY user_id) "
            "SELECT user_id, ema.ema, ils.ils, mi.mi, ds.ds "
            "FROM ema JOIN ils USING (user_id) JOIN mi USING (user_id) "
            "JOIN ds USING (user_id) ORDER BY user_id"
        ),
        "pipeline_e2e": (
            # full-funnel replay: every stage mirrors its proven per-stage
            # oracle (gopher_rules / c4 single-line gates / dedup_exact
            # fingerprint / minhash_portable md5 LSH + Jaccard /
            # exactsubstr posting-canonical-island pipeline / trigram
            # decontamination), counts windowed into the funnel
            "WITH train AS MATERIALIZED (SELECT doc_id, "
            "  regexp_replace(text, '(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ', "
            "  '\\1.' || chr(10), 'g') AS text "
            "  FROM documents WHERE doc_id % 20 <> 0), "
            "bench AS MATERIALIZED (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0), "
            "gm AS MATERIALIZED (SELECT doc_id, text, "
            "  string_split_regex(trim(lower(text)), '\\s+') AS w FROM train), "
            "g AS MATERIALIZED (SELECT doc_id, text FROM gm WHERE "
            "  len(w) BETWEEN 10 AND 100000 "
            "  AND length(regexp_replace(text, '\\s+', '', 'g')) / greatest(len(w), 1) "
            "    BETWEEN 2.0 AND 12.0 "
            "  AND len(regexp_extract_all(text, '[^\\w\\s]')) / greatest(length(text), 1) <= 0.1 "
            "  AND len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) / greatest(len(w), 1) >= 0.8 "
            "  AND len(list_intersect(w, ['the', 'a', 'and', 'of', 'to'])) >= 2), "
            "c4 AS MATERIALIZED (SELECT doc_id, text FROM g WHERE "
            "  len(regexp_extract_all(coalesce(array_to_string(list_filter("
            "    string_split(text, chr(10)), "
            "    l -> regexp_matches(trim(l), '[.!?\"]$') "
            "      AND len(string_split_regex(trim(l), '\\s+')) >= 5 "
            "      AND NOT contains(lower(l), 'javascript')), chr(10)), ''), "
            "    '[.!?]')) >= 3 "
            "  AND NOT contains(text, '{') AND NOT contains(lower(text), 'lorem ipsum')), "
            "ex AS MATERIALIZED (SELECT min(doc_id) AS doc_id FROM c4 "
            "  GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))), "
            "s3 AS MATERIALIZED (SELECT c4.doc_id, c4.text FROM c4 JOIN ex USING (doc_id)), "
            "b3 AS MATERIALIZED (SELECT doc_id AS id, "
            "  list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)), "
            "    i -> array_to_string(w[i:i+2], ' '))) AS sh "
            "  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM s3)), "
            "inv AS MATERIALIZED (SELECT id, unnest(sh) AS s FROM b3), "
            "sig AS MATERIALIZED (SELECT id, "
            + ", ".join(
                f"min(md5(s || '#{i}')) AS mh_{i}" for i in range(16)
            )
            + " FROM inv GROUP BY id), "
            "banded AS MATERIALIZED ("
            + " UNION ALL ".join(
                f"SELECT id, {b} AS band, md5("
                + " || '|' || ".join(f"mh_{b * 4 + r}" for r in range(4))
                + ") AS bucket FROM sig"
                for b in range(4)
            )
            + "), "
            "cand AS MATERIALIZED (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM banded a "
            "  JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id), "
            "jac AS MATERIALIZED (SELECT c.id_b FROM cand c JOIN b3 x ON c.id_a = x.id "
            "  JOIN b3 y ON c.id_b = y.id "
            "  WHERE len(list_intersect(x.sh, y.sh))::DOUBLE "
            "    / len(list_distinct(x.sh || y.sh)) >= 0.8), "
            "s4 AS MATERIALIZED (SELECT doc_id, text FROM s3 "
            "  WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM jac)), "
            "w4 AS MATERIALIZED (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS lw, "
            "  string_split_regex(trim(text), '\\s+') AS ow FROM s4), "
            "posts AS MATERIALIZED (SELECT doc_id, "
            "  unnest(generate_series(1, greatest(len(lw) - 2, 0))) AS pos, "
            "  unnest([array_to_string(lw[i:i+2], ' ') "
            "    FOR i IN generate_series(1, greatest(len(lw) - 2, 0))]) AS gr FROM w4), "
            "t1 AS MATERIALIZED (SELECT gr, count(*) AS c, min(doc_id) AS fd FROM posts GROUP BY gr), "
            "t2 AS MATERIALIZED (SELECT t1.gr, t1.c, t1.fd, min(p.pos) AS fp FROM posts p "
            "  JOIN t1 ON p.gr = t1.gr AND p.doc_id = t1.fd GROUP BY t1.gr, t1.c, t1.fd), "
            "dup AS MATERIALIZED (SELECT p.doc_id, p.pos FROM posts p JOIN t2 ON p.gr = t2.gr "
            "  WHERE t2.c >= 2 AND NOT (p.doc_id = t2.fd AND p.pos = t2.fp)), "
            "cov AS MATERIALIZED (SELECT DISTINCT doc_id, pos + j AS cpos FROM dup, "
            "  generate_series(0, 2) AS tj(j)), "
            "isl AS MATERIALIZED (SELECT doc_id, cpos, cpos - row_number() OVER ("
            "  PARTITION BY doc_id ORDER BY cpos) AS grp FROM cov), "
            "runs AS MATERIALIZED (SELECT doc_id, min(cpos) AS s, max(cpos) AS e FROM isl "
            "  GROUP BY doc_id, grp HAVING max(cpos) - min(cpos) + 1 >= 6), "
            "dr AS MATERIALIZED (SELECT doc_id, unnest(generate_series(s, e)) AS pos FROM runs), "
            "toks AS MATERIALIZED (SELECT doc_id, unnest(generate_series(1, len(ow))) AS pos, "
            "  unnest(ow) AS tok FROM w4), "
            "kept AS MATERIALIZED (SELECT t.doc_id, t.pos, t.tok FROM toks t LEFT JOIN dr "
            "  ON t.doc_id = dr.doc_id AND t.pos = dr.pos WHERE dr.pos IS NULL), "
            "reb AS MATERIALIZED (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text "
            "  FROM kept GROUP BY doc_id), "
            "mod5 AS MATERIALIZED (SELECT DISTINCT doc_id FROM runs), "
            "s5 AS MATERIALIZED (SELECT s4.doc_id, coalesce(r.clean_text, '') AS text "
            "  FROM s4 LEFT JOIN reb r USING (doc_id)), "
            "b5 AS MATERIALIZED (SELECT doc_id AS id, "
            "  list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)), "
            "    i -> array_to_string(w[i:i+2], ' '))) AS sh "
            "  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM s5)), "
            "bsh AS MATERIALIZED (SELECT DISTINCT s FROM (SELECT unnest("
            "  list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)), "
            "    i -> array_to_string(w[i:i+2], ' ')))) AS s "
            "  FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS w FROM bench))), "
            "cont AS MATERIALIZED (SELECT DISTINCT t.id FROM "
            "  (SELECT id, unnest(sh) AS s FROM b5) t JOIN bsh b ON t.s = b.s), "
            "s6 AS MATERIALIZED (SELECT doc_id FROM s5 WHERE doc_id NOT IN (SELECT id FROM cont)), "
            "funnel AS ("
            "  SELECT 0 AS stage_idx, 'input' AS stage, (SELECT count(*) FROM train) AS docs "
            "  UNION ALL SELECT 1, 'gopher', (SELECT count(*) FROM g) "
            "  UNION ALL SELECT 2, 'c4', (SELECT count(*) FROM c4) "
            "  UNION ALL SELECT 3, 'exact', (SELECT count(*) FROM s3) "
            "  UNION ALL SELECT 4, 'neardup', (SELECT count(*) FROM s4) "
            "  UNION ALL SELECT 5, 'exactsubstr', (SELECT count(*) FROM s5) "
            "  UNION ALL SELECT 6, 'decontaminate', (SELECT count(*) FROM s6)) "
            "SELECT stage_idx::INT AS stage_idx, stage, docs::BIGINT AS docs, "
            "coalesce(lag(docs) OVER (ORDER BY stage_idx) - docs, 0)::BIGINT AS dropped, "
            "(CASE WHEN stage_idx = 5 THEN (SELECT count(*) FROM mod5) ELSE 0 END)::BIGINT "
            "AS modified "
            "FROM funnel ORDER BY stage_idx"
        ),
        "pipeline_incremental": (
            # incremental-funnel replay: corpus fingerprints/signatures are
            # the immutable history side; the delta (natural + planted
            # clones/near-clones of corpus docs) runs gopher → c4 →
            # exact-vs-corpus+within → md5-LSH delta×corpus UNION
            # within-delta → Jaccard ≥ 0.8 drops the delta doc → trigram
            # decontamination; funnel windowed as in pipeline_e2e
            "WITH alldocs AS MATERIALIZED (SELECT doc_id, "
            "  regexp_replace(text, '(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ', "
            "  '\\1.' || chr(10), 'g') AS text FROM documents), "
            "corpus AS MATERIALIZED (SELECT doc_id, text FROM alldocs WHERE doc_id % 4 = 0), "
            "bench AS MATERIALIZED (SELECT doc_id, text FROM alldocs WHERE doc_id % 20 = 1), "
            "delta AS MATERIALIZED ("
            "  SELECT doc_id, text FROM alldocs WHERE doc_id % 4 <> 0 AND doc_id % 20 <> 1 "
            "  UNION ALL SELECT doc_id + 10000000, text FROM corpus WHERE doc_id % 8 = 0 "
            "  UNION ALL SELECT doc_id + 20000000, "
            "    text || ' appended near duplicate tail words here' "
            "    FROM corpus WHERE doc_id % 8 = 4), "
            "gm AS MATERIALIZED (SELECT doc_id, text, "
            "  string_split_regex(trim(lower(text)), '\\s+') AS w FROM delta), "
            "g AS MATERIALIZED (SELECT doc_id, text FROM gm WHERE "
            "  len(w) BETWEEN 10 AND 100000 "
            "  AND length(regexp_replace(text, '\\s+', '', 'g')) / greatest(len(w), 1) "
            "    BETWEEN 2.0 AND 12.0 "
            "  AND len(regexp_extract_all(text, '[^\\w\\s]')) / greatest(length(text), 1) <= 0.1 "
            "  AND len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) / greatest(len(w), 1) >= 0.8 "
            "  AND len(list_intersect(w, ['the', 'a', 'and', 'of', 'to'])) >= 2), "
            "c4 AS MATERIALIZED (SELECT doc_id, text FROM g WHERE "
            "  len(regexp_extract_all(coalesce(array_to_string(list_filter("
            "    string_split(text, chr(10)), "
            "    l -> regexp_matches(trim(l), '[.!?\"]$') "
            "      AND len(string_split_regex(trim(l), '\\s+')) >= 5 "
            "      AND NOT contains(lower(l), 'javascript')), chr(10)), ''), "
            "    '[.!?]')) >= 3 "
            "  AND NOT contains(text, '{') AND NOT contains(lower(text), 'lorem ipsum')), "
            "cfp AS MATERIALIZED (SELECT DISTINCT "
            "  md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp FROM corpus), "
            "fr AS MATERIALIZED (SELECT doc_id, text, fp FROM "
            "  (SELECT doc_id, text, "
            "    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp FROM c4) "
            "  WHERE fp NOT IN (SELECT fp FROM cfp)), "
            "ex AS MATERIALIZED (SELECT min(doc_id) AS doc_id FROM fr GROUP BY fp), "
            "s3 AS MATERIALIZED (SELECT fr.doc_id, fr.text FROM fr JOIN ex USING (doc_id)), "
            "b3 AS MATERIALIZED (SELECT doc_id AS id, "
            "  list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)), "
            "    i -> array_to_string(w[i:i+2], ' '))) AS sh "
            "  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM s3)), "
            "bc AS MATERIALIZED (SELECT doc_id AS id, "
            "  list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)), "
            "    i -> array_to_string(w[i:i+2], ' '))) AS sh "
            "  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM corpus)), "
            "sigd AS MATERIALIZED (SELECT id, "
            + ", ".join(
                f"min(md5(s || '#{i}')) AS mh_{i}" for i in range(16)
            )
            + " FROM (SELECT id, unnest(sh) AS s FROM b3) GROUP BY id), "
            "sigc AS MATERIALIZED (SELECT id, "
            + ", ".join(
                f"min(md5(s || '#{i}')) AS mh_{i}" for i in range(16)
            )
            + " FROM (SELECT id, unnest(sh) AS s FROM bc) GROUP BY id), "
            "bd AS MATERIALIZED ("
            + " UNION ALL ".join(
                f"SELECT id, {b} AS band, md5("
                + " || '|' || ".join(f"mh_{b * 4 + r}" for r in range(4))
                + ") AS bucket FROM sigd"
                for b in range(4)
            )
            + "), "
            "bcb AS MATERIALIZED ("
            + " UNION ALL ".join(
                f"SELECT id, {b} AS band, md5("
                + " || '|' || ".join(f"mh_{b * 4 + r}" for r in range(4))
                + ") AS bucket FROM sigc"
                for b in range(4)
            )
            + "), "
            "cand AS MATERIALIZED ("
            "  SELECT DISTINCT c.id AS id_a, d.id AS id_b FROM bcb c "
            "    JOIN bd d ON c.band = d.band AND c.bucket = d.bucket "
            "  UNION "
            "  SELECT DISTINCT a.id, b.id FROM bd a "
            "    JOIN bd b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id), "
            "allsh AS MATERIALIZED (SELECT * FROM bc UNION ALL SELECT * FROM b3), "
            "jac AS MATERIALIZED (SELECT DISTINCT c.id_b FROM cand c "
            "  JOIN allsh x ON c.id_a = x.id JOIN allsh y ON c.id_b = y.id "
            "  WHERE len(list_intersect(x.sh, y.sh))::DOUBLE "
            "    / len(list_distinct(x.sh || y.sh)) >= 0.8), "
            "s4 AS MATERIALIZED (SELECT doc_id, text FROM s3 "
            "  WHERE doc_id NOT IN (SELECT id_b FROM jac)), "
            "b4 AS MATERIALIZED (SELECT doc_id AS id, "
            "  list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)), "
            "    i -> array_to_string(w[i:i+2], ' '))) AS sh "
            "  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM s4)), "
            "bsh AS MATERIALIZED (SELECT DISTINCT s FROM (SELECT unnest("
            "  list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)), "
            "    i -> array_to_string(w[i:i+2], ' ')))) AS s "
            "  FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS w FROM bench))), "
            "cont AS MATERIALIZED (SELECT DISTINCT t.id FROM "
            "  (SELECT id, unnest(sh) AS s FROM b4) t JOIN bsh b ON t.s = b.s), "
            "s5 AS MATERIALIZED (SELECT doc_id FROM s4 "
            "  WHERE doc_id NOT IN (SELECT id FROM cont)), "
            "funnel AS ("
            "  SELECT 0 AS stage_idx, 'input' AS stage, (SELECT count(*) FROM delta) AS docs "
            "  UNION ALL SELECT 1, 'gopher', (SELECT count(*) FROM g) "
            "  UNION ALL SELECT 2, 'c4', (SELECT count(*) FROM c4) "
            "  UNION ALL SELECT 3, 'exact', (SELECT count(*) FROM s3) "
            "  UNION ALL SELECT 4, 'neardup', (SELECT count(*) FROM s4) "
            "  UNION ALL SELECT 5, 'decontaminate', (SELECT count(*) FROM s5)) "
            "SELECT stage_idx::INT AS stage_idx, stage, docs::BIGINT AS docs, "
            "coalesce(lag(docs) OVER (ORDER BY stage_idx) - docs, 0)::BIGINT AS dropped, "
            "0::BIGINT AS modified "
            "FROM funnel ORDER BY stage_idx"
        ),
        "with_fill_interp": (
            "WITH b AS (SELECT day(ts)::INT AS dom, count(*)::BIGINT AS n_events, "
            "  round(sum(value), 6) AS sv "
            "  FROM events WHERE day(ts) % 3 != 1 GROUP BY dom), "
            "g AS (SELECT unnest(generate_series(1, 31))::INT AS dom), "
            "j AS (SELECT g.dom, b.n_events, b.sv FROM g LEFT JOIN b USING (dom)) "
            "SELECT dom, n_events, last_value(sv IGNORE NULLS) OVER ("
            "ORDER BY dom ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sv "
            "FROM j ORDER BY dom"
        ),
        "dialect_paste": (
            "WITH a AS (SELECT n_nationkey, n_name, "
            "  row_number() OVER (ORDER BY n_nationkey, n_name) AS rn FROM nation), "
            "b AS (SELECT r_regionkey, r_name, "
            "  row_number() OVER (ORDER BY r_regionkey, r_name) AS rn "
            "  FROM region WHERE r_regionkey < 4) "
            "SELECT n_nationkey, n_name, r_regionkey, r_name "
            "FROM a JOIN b USING (rn) ORDER BY n_nationkey"
        ),
        "with_totals": (
            "SELECT o_orderpriority, count(*)::BIGINT AS n, "
            "round(sum(o_totalprice), 2) AS s FROM orders "
            "GROUP BY GROUPING SETS ((o_orderpriority), ()) "
            "ORDER BY o_orderpriority"
        ),
        "paste_join": (
            "WITH c AS (SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, "
            "  row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn "
            "  FROM (SELECT * FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10)), "
            "s AS (SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal, "
            "  row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rn "
            "  FROM (SELECT * FROM supplier ORDER BY s_acctbal DESC, s_suppkey LIMIT 10)) "
            "SELECT c_custkey, c_name, c_acctbal, s_suppkey, s_name, s_acctbal "
            "FROM c JOIN s USING (rn)"
        ),
        "nb_quality": (
            "WITH toks AS (SELECT doc_id, lang = 'en' AS p, "
            "  substring(md5(w), 1, 2) AS b FROM "
            "  (SELECT doc_id, lang, unnest({WORDS}) AS w FROM documents)), "
            "prior AS (SELECT ln(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) "
            "  / sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)) AS pr FROM documents), "
            "counts AS (SELECT b, sum(CASE WHEN p THEN 1 ELSE 0 END) AS cp, "
            "  sum(CASE WHEN p THEN 0 ELSE 1 END) AS cn FROM toks GROUP BY b), "
            "tot AS (SELECT sum(cp) AS tp, sum(cn) AS tn FROM counts), "
            "model AS (SELECT b, ln((cp + 1.0) / (tp + 256.0)) "
            "  - ln((cn + 1.0) / (tn + 256.0)) AS lo "
            "  FROM counts CROSS JOIN tot) "
            "SELECT doc_id, count(*)::BIGINT AS n_tokens, "
            "round(pr + sum(lo), 6) AS nb_score "
            "FROM toks JOIN model USING (b) CROSS JOIN prior "
            "GROUP BY doc_id, pr"
        ).format(WORDS=_WORDS),
        "ccnet_buckets": (
            "WITH toks AS (SELECT doc_id, unnest({WORDS}) AS w FROM documents), "
            "freqs AS (SELECT w, count(*) AS wf FROM toks GROUP BY w), "
            "tot AS (SELECT sum(wf) AS tot FROM freqs), "
            "s AS (SELECT doc_id, round(avg(-ln(wf / tot)), 6) AS sur "
            "  FROM toks JOIN freqs USING (w) CROSS JOIN tot GROUP BY doc_id), "
            "t AS (SELECT d.doc_id, d.lang, s.sur, "
            "  ntile(3) OVER (PARTITION BY d.lang ORDER BY s.sur, d.doc_id) AS b "
            "  FROM documents d JOIN s ON d.doc_id = s.doc_id) "
            "SELECT doc_id, lang, sur AS surprisal, "
            "CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket "
            "FROM t"
        ).format(WORDS=_WORDS),
        "bm25_rank": (
            "WITH b2 AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w "
            "  FROM documents), "
            "b3 AS (SELECT doc_id, w, len(w) AS dl FROM b2), "
            "stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM b3), "
            "toks AS (SELECT doc_id, dl, unnest(w) AS t FROM b3), "
            "ft AS (SELECT * FROM toks WHERE t IN ('vector', 'hash', 'join')), "
            "dfreq AS (SELECT t, count(DISTINCT doc_id) AS df FROM ft GROUP BY t), "
            "tf AS (SELECT doc_id, t, count(*) AS tf, max(dl) AS dl "
            "  FROM ft GROUP BY doc_id, t), "
            "sc AS (SELECT doc_id, "
            "  ln(1.0 + (n - df + 0.5) / (df + 0.5)) * (tf * 2.2) "
            "  / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS ts "
            "  FROM tf JOIN dfreq USING (t) CROSS JOIN stats) "
            "SELECT doc_id, round(sum(ts), 6) AS bm25, "
            "count(*)::BIGINT AS n_terms_matched FROM sc GROUP BY doc_id"
        ),
        "hybrid_rrf": (
            # replicates the Spark pipeline exactly: top-50 cuts on RAW
            # scores (id tiebreak), ranks on the ROUNDED scores the
            # retrievers emit, fusion on 1/(60+rank)
            "WITH b2 AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w "
            "  FROM documents), "
            "b3 AS (SELECT doc_id, w, len(w) AS dl FROM b2), "
            "stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM b3), "
            "toks AS (SELECT doc_id, dl, unnest(w) AS t FROM b3), "
            "ft AS (SELECT * FROM toks WHERE t IN ('vector', 'hash', 'join')), "
            "dfreq AS (SELECT t, count(DISTINCT doc_id) AS df FROM ft GROUP BY t), "
            "tf AS (SELECT doc_id, t, count(*) AS tf, max(dl) AS dl "
            "  FROM ft GROUP BY doc_id, t), "
            "sc AS (SELECT doc_id, "
            "  ln(1.0 + (n - df + 0.5) / (df + 0.5)) * (tf * 2.2) "
            "  / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS ts "
            "  FROM tf JOIN dfreq USING (t) CROSS JOIN stats), "
            "bm AS (SELECT doc_id, sum(ts) AS raw FROM sc GROUP BY doc_id), "
            "bmtop AS (SELECT doc_id, round(raw, 6) AS bm25 FROM bm "
            "  ORDER BY raw DESC, doc_id LIMIT 50), "
            "bmr AS (SELECT doc_id, row_number() OVER "
            "  (ORDER BY bm25 DESC, doc_id) AS ra FROM bmtop), "
            "q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
            "u AS (SELECT c.vec_id AS doc_id, unnest(q.qe)::DOUBLE AS x, "
            "  unnest(c.embedding)::DOUBLE AS y FROM q CROSS JOIN embeddings c "
            "  WHERE c.vec_id <> 0), "
            "cosall AS (SELECT doc_id, "
            "  sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS raw "
            "  FROM u GROUP BY doc_id), "
            "costop AS (SELECT doc_id, round(raw, 6) AS cs FROM cosall "
            "  ORDER BY raw DESC, doc_id LIMIT 50), "
            "cosr AS (SELECT doc_id, row_number() OVER "
            "  (ORDER BY cs DESC, doc_id) AS rb FROM costop), "
            "fused AS (SELECT doc_id, "
            "  coalesce(1.0 / (60 + ra), 0) + coalesce(1.0 / (60 + rb), 0) AS rrf "
            "  FROM bmr FULL JOIN cosr USING (doc_id)) "
            "SELECT doc_id, round(rrf, 6) AS rrf FROM fused "
            "ORDER BY rrf DESC, doc_id LIMIT 20"
        ),
        "fuzzy_pairs": (
            # brute-force: the oracle intentionally ignores the candidate
            # scheme, so a PassJoin false negative breaks the hash
            "WITH p AS (SELECT doc_id, substring(text, 1, 30) AS pref "
            "  FROM documents WHERE text IS NOT NULL) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "  levenshtein(a.pref, b.pref)::BIGINT AS dist "
            "FROM p a JOIN p b ON a.doc_id < b.doc_id "
            "WHERE levenshtein(a.pref, b.pref) <= 2"
        ),
        "any_join": (
            "SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS c_acctbal, "
            "  o.o_orderkey, o.o_orderdate, round(o.o_totalprice, 2) AS o_totalprice "
            "FROM customer c LEFT JOIN ("
            "  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM ("
            "    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, "
            "      row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rk "
            "    FROM orders) WHERE rk = 1"
            ") o ON c.c_custkey = o.o_custkey"
        ),
        "dedup_policy": (
            "WITH f AS (SELECT doc_id, length(text) AS ln, "
            "  md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp "
            "  FROM documents), "
            "r AS (SELECT doc_id, fp, "
            "  row_number() OVER (PARTITION BY fp ORDER BY ln DESC, doc_id ASC) AS rk "
            "  FROM f), "
            "c AS (SELECT fp, count(*) AS dup_count FROM f GROUP BY fp) "
            "SELECT r.doc_id, c.dup_count::BIGINT AS dup_count "
            "FROM r JOIN c USING (fp) WHERE r.rk = 1"
        ),
        "clickhouse_dates": (
            "SELECT strftime(ts, '%Y-%m-%d') AS day_str, "
            "isodow(ts)::INT AS dow, "
            "date_diff('hour', date_trunc('day', ts), ts)::BIGINT AS hour_of_day, "
            "CAST(date_trunc('week', ts) AS DATE)::VARCHAR AS week_start, "
            "quarter(ts)::INT AS q, "
            "strftime(to_timestamp((epoch_us(ts) // 1000000 // 300) * 300), "
            "  '%Y-%m-%d %H:%M:%S') AS bucket5, "
            "count(*)::BIGINT AS n "
            "FROM events GROUP BY 1, 2, 3, 4, 5, 6"
        ),
        "stream_mv": (
            # streaming fold is deterministic in OUTPUT (integer cents/count
            # state; merge fns associative) — oracled like any batch query
            "SELECT event_type, "
            "sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents, "
            "count(*)::BIGINT AS n FROM events GROUP BY event_type"
        ),
        "mv_incremental": (
            "SELECT o_orderpriority, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents, "
            "count(*)::BIGINT AS n, "
            "max(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS max_cents "
            "FROM orders GROUP BY o_orderpriority"
        ),
        "dsir_weights": (
            f"WITH toks AS (SELECT doc_id, substring(md5(unnest({_WORDS})), 1, 2) "
            "  AS b FROM documents), "
            f"ttoks AS (SELECT substring(md5(unnest({_WORDS})), 1, 2) AS b "
            "  FROM documents WHERE lang = 'en'), "
            "cc AS (SELECT b, count(*) AS cnt FROM toks GROUP BY b), "
            "tc AS (SELECT b, count(*) AS cnt FROM ttoks GROUP BY b), "
            "tot AS (SELECT (SELECT sum(cnt) FROM cc) AS c_tot, "
            "  (SELECT sum(cnt) FROM tc) AS t_tot), "
            "ratio AS (SELECT coalesce(cc.b, tc.b) AS b, "
            "  coalesce(ln((tc.cnt + 1.0) / (tot.t_tot + 256.0)), "
            "           ln(1.0 / (tot.t_tot + 256.0))) "
            "  - coalesce(ln((cc.cnt + 1.0) / (tot.c_tot + 256.0)), "
            "             ln(1.0 / (tot.c_tot + 256.0))) AS lr "
            "  FROM cc FULL JOIN tc USING (b) CROSS JOIN tot) "
            "SELECT doc_id, count(*)::BIGINT AS n_tokens, "
            "round(sum(lr), 6) AS log_ratio "
            "FROM toks JOIN ratio USING (b) GROUP BY doc_id"
        ),
        "bpe_fertility": (
            "WITH m AS (SELECT lang, "
            "  length(regexp_replace(text, '\\s+', '', 'g')) AS nws, "
            f"  {_BPE} AS bpe FROM documents) "
            "SELECT lang, sum(nws)::BIGINT AS total_chars, "
            "sum(bpe)::BIGINT AS total_bpe, "
            "round(sum(nws) / sum(bpe), 6) AS fertility "
            "FROM m GROUP BY lang"
        ),
        "shared_spans": (
            "WITH w AS (SELECT doc_id, "
            f"  {_WORDS} AS w FROM documents), "
            "sh AS (SELECT doc_id, "
            "  unnest(generate_series(1, len(w) - 2)) AS pos, "
            "  unnest(list_transform(generate_series(1, len(w) - 2), "
            "    i -> array_to_string(w[i:i+2], ' '))) AS s "
            "  FROM w WHERE len(w) >= 3), "
            "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b "
            "  FROM documents a JOIN documents b "
            "  ON substring(a.text, 1, 60) = substring(b.text, 1, 60) "
            "  AND a.doc_id < b.doc_id), "
            "m AS (SELECT p.id_a, p.id_b, a.pos AS pa, a.pos - b.pos AS off "
            "  FROM pairs p "
            "  JOIN sh a ON a.doc_id = p.id_a "
            "  JOIN sh b ON b.doc_id = p.id_b AND b.s = a.s), "
            "isl AS (SELECT id_a, id_b, off, pa, "
            "  pa - row_number() OVER (PARTITION BY id_a, id_b, off ORDER BY pa) "
            "  AS grp FROM m), "
            "runs AS (SELECT id_a, id_b, off, grp, count(*) AS len "
            "  FROM isl GROUP BY id_a, id_b, off, grp) "
            "SELECT id_a, id_b, (max(len) + 2)::BIGINT AS longest_run_tokens, "
            "count(*)::BIGINT AS n_spans FROM runs GROUP BY id_a, id_b"
        ),
        "retention_flags": (
            "SELECT user_id, "
            "max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r0, "
            "max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) * "
            "  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r1, "
            "max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) * "
            "  max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS r2 "
            "FROM events GROUP BY user_id"
        ),
        "clickhouse_funcs2": (
            "SELECT user_id, "
            "least(count(DISTINCT event_type), 4) AS up3, "  # uniqUpTo: N+1 beyond cap
            "max(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS max_k, "
            "sum(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL "
            "  THEN 1 ELSE 0 END)::BIGINT AS n_k, "
            "CAST((user_id * 7777 + 16909060) // 16777216 % 256 AS VARCHAR) || '.' || "
            "CAST((user_id * 7777 + 16909060) // 65536 % 256 AS VARCHAR) || '.' || "
            "CAST((user_id * 7777 + 16909060) // 256 % 256 AS VARCHAR) || '.' || "
            "CAST((user_id * 7777 + 16909060) % 256 AS VARCHAR) AS ip, "
            "(user_id * 7777 + 16909060)::BIGINT AS ip_rt "
            "FROM events GROUP BY user_id"
        ),
        "dict_lookup": (
            "WITH o AS (SELECT o_orderkey, CASE WHEN o_orderkey % 50 = 0 "
            "  THEN -1 ELSE o_custkey END AS k FROM orders) "
            "SELECT o.o_orderkey, "
            "coalesce(c.c_name, 'UNKNOWN') AS cust_name, "
            "coalesce(c.c_nationkey, -1)::BIGINT AS cust_nation "
            "FROM o LEFT JOIN customer c ON o.k = c.c_custkey"
        ),
        "window_funnel": (
            # EXISTS-chain equivalent of greedy windowFunnel: level ≥ k iff
            # a strict (ts, event_id)-ordered chain of the first k steps
            # exists with every step inside [t1, t1 + 1 hour]
            "WITH s1 AS (SELECT user_id, ts, event_id FROM events "
            "  WHERE event_type = 'view'), "
            "s2 AS (SELECT user_id, ts, event_id FROM events "
            "  WHERE event_type = 'click'), "
            "s3 AS (SELECT user_id, ts, event_id FROM events "
            "  WHERE event_type = 'purchase'), "
            "c2 AS (SELECT DISTINCT s1.user_id FROM s1 JOIN s2 "
            "  ON s1.user_id = s2.user_id "
            "  AND (s2.ts > s1.ts OR (s2.ts = s1.ts AND s2.event_id > s1.event_id)) "
            "  AND s2.ts <= s1.ts + INTERVAL 1 HOUR), "
            "c3 AS (SELECT DISTINCT s1.user_id FROM s1 "
            "  JOIN s2 ON s1.user_id = s2.user_id "
            "  AND (s2.ts > s1.ts OR (s2.ts = s1.ts AND s2.event_id > s1.event_id)) "
            "  AND s2.ts <= s1.ts + INTERVAL 1 HOUR "
            "  JOIN s3 ON s2.user_id = s3.user_id "
            "  AND (s3.ts > s2.ts OR (s3.ts = s2.ts AND s3.event_id > s2.event_id)) "
            "  AND s3.ts <= s1.ts + INTERVAL 1 HOUR) "
            "SELECT u.user_id, CASE "
            "  WHEN u.user_id IN (SELECT user_id FROM c3) THEN 3 "
            "  WHEN u.user_id IN (SELECT user_id FROM c2) THEN 2 "
            "  WHEN u.user_id IN (SELECT user_id FROM s1) THEN 1 "
            "  ELSE 0 END AS level "
            "FROM (SELECT DISTINCT user_id FROM events) u"
        ),
        "url_funcs": (
            "WITH u AS (SELECT doc_id, 'https://www.' || source || "
            "'.example.com/docs/' || doc_id || '?lang=' || lang || '&v=' || "
            "(n_chars % 10) || '#s' || (doc_id % 5) AS url FROM documents) "
            "SELECT doc_id, "
            "regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host, "
            "regexp_extract(url, '^([a-z]+)://', 1) AS proto, "
            "regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS url_path, "
            "regexp_extract(url, '\\?([^#]*)', 1) AS qs, "
            "regexp_extract(url, '#(.*)$', 1) AS frag, "
            "regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang, "
            "regexp_extract(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1), "
            "  '\\.([^.]+)$', 1) AS tld, "
            "regexp_replace(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1), "
            "  '^www\\.', '') AS host_nw, "
            "regexp_replace(url, '\\?[^#]*', '') AS no_qs "
            "FROM u"
        ),
        "cms_estimate": (
            f"WITH words AS (SELECT unnest({_WORDS}) AS w FROM documents), "
            "cms AS (SELECT d, substring(md5(w || '#' || d), 1, 2) AS bucket, "
            "  count(*) AS cnt FROM words, generate_series(0, 3) g(d) "
            "  GROUP BY d, bucket), "
            f"qs AS (SELECT DISTINCT unnest({_WORDS}) AS item FROM documents "
            "  WHERE doc_id < 5), "
            "probes AS (SELECT item, d, substring(md5(item || '#' || d), 1, 2) "
            "  AS bucket FROM qs, generate_series(0, 3) g(d)) "
            "SELECT item, min(coalesce(cnt, 0))::BIGINT AS est "
            "FROM probes LEFT JOIN cms USING (d, bucket) GROUP BY item"
        ),
        "connected_components": _CC_ORACLE,
        "dedup_cc": _CC_DEDUP_ORACLE,
        "minhash_portable": _MINHASH_PORTABLE_ORACLE,
        "token_histogram": (
            # DuckDB has no width_bucket; PostgreSQL semantics spelled out:
            # v>=max -> n+1, else floor(v/step)+1 (min=0, max=500, n=20)
            "SELECT CASE WHEN t >= 500 THEN 21 "
            "ELSE CAST(floor(t / 25.0) AS BIGINT) + 1 END AS bucket, "
            "count(*) AS n_docs FROM ("
            "SELECT len(str_split_regex(trim(text), '\\s+')) AS t FROM documents"
            ") GROUP BY 1"
        ),
        "length_trim": (
            "WITH b AS (SELECT quantile_cont(n_chars, 0.05) AS lo, "
            "quantile_cont(n_chars, 0.95) AS hi FROM documents) "
            "SELECT doc_id, lang, n_chars FROM documents, b "
            "WHERE n_chars >= lo AND n_chars <= hi"
        ),
        "topk_per_group": (
            "SELECT event_type, user_id, n, sum_value FROM ("
            "SELECT event_type, user_id, count(*) AS n, round(sum(value), 2) AS sum_value, "
            "row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC, user_id) AS rk "
            "FROM events GROUP BY event_type, user_id) WHERE rk <= 5"
        ),
        "window_first_last": (
            "SELECT user_id, event_id, "
            "first_value(event_type) OVER w AS first_type, "
            "last_value(event_type) OVER w AS last_type, "
            "nth_value(event_type, 2) OVER w AS second_type "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        ),
        "cosine_topk": _COSINE_ORACLE,
        "embedding_norm": (
            "SELECT vec_id, round(sqrt(sum(x * x)), 6) AS norm FROM ("
            "  SELECT vec_id, unnest(embedding)::DOUBLE AS x FROM embeddings"
            ") GROUP BY vec_id"
        ),
        "embedding_dedup": (
            "WITH pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "a.embedding AS ea, b.embedding AS eb "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id), "
            "u AS (SELECT id_a, id_b, unnest(ea)::DOUBLE AS x, unnest(eb)::DOUBLE AS y "
            "FROM pairs), "
            "cos AS (SELECT id_a, id_b, sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))) AS c "
            "FROM u GROUP BY id_a, id_b) "
            "SELECT id_a, id_b, round(c, 6) AS cos_sim FROM cos WHERE c >= 0.4"
        ),
        "doc_fingerprint": (
            f"SELECT min(doc_id) AS doc_id, count(*) AS n_dups FROM documents GROUP BY {_FP}"
        ),
        "pipeline_filter_dedup": (
            f"""WITH m AS (
  SELECT doc_id, text,
         {_NTOK} AS n_tokens,
         length(regexp_replace(text, '\\s+', '', 'g'))
           / greatest({_NTOK}, 1) AS avg_word_len,
         {_PUNCT} / greatest(length(text), 1) AS punct_ratio
  FROM documents
), good AS (
  SELECT doc_id, text FROM m
  WHERE round(0.5 * least(n_tokens / 100.0, 1.0)
      + 0.4 * (1.0 - least(abs(avg_word_len - 5.0) / 5.0, 1.0))
      + 0.1 * (1.0 - least(punct_ratio * 4.0, 1.0)), 6) >= 0.5
), surv AS (
  SELECT min(doc_id) AS doc_id FROM good GROUP BY {_FP}
)
SELECT s.doc_id, e.label FROM surv s JOIN embeddings e ON s.doc_id = e.vec_id"""
        ),
        "multimodal_join": (
            "SELECT doc_id, lang, label, len(embedding)::BIGINT AS dim "
            "FROM documents JOIN embeddings ON doc_id = vec_id"
        ),
        "multimodal_features": _MULTIMODAL_ORACLE,
        "multimodal_frames": (
            "WITH f AS (SELECT doc_id, "
            "unnest(generate_series(0, greatest(CAST(floor(n_chars * 40.0 / 1000) "
            "AS BIGINT), 0)))::BIGINT AS frame_idx FROM documents) "
            "SELECT doc_id, frame_idx, frame_idx * 1000 AS frame_ts_ms FROM f"
        ),
        "sql_tpch": _TPCH_Q3,
        # minhash_candidates / minhash_dedup / simhash_candidates / ann_topk /
        # stream_* : not SQL-expressible (LSH banding, streaming state) —
        # rows-only checks per the driver contract.
    }
    # the prebuilt-artifact funnel is DEFINED to equal the recompute
    # funnel — same fixture, same DuckDB full replay proves both paths
    out["pipeline_incremental_prebuilt"] = out["pipeline_incremental"]
    # two-day replay: day 2's corpus = corpus ∪ day-1-accepted — the
    # from-scratch ground truth the APPENDED artifact tables must equal
    out["pipeline_incremental_append"] = _pipeline_append_oracle()
    out["pagerank_docs"] = _pagerank_oracle()
    # greedy non-overlapping chain counting == leftmost non-overlapping
    # regex matches over the per-user (ts, event_id)-ordered step string
    # (see q_sequence_count docstring); events matching neither step are
    # state no-ops and are dropped before stringification.  The step
    # character is the FINAL order key (ADVICE r10): Spark's array_sort
    # over struct(ts, event_id, m) tie-breaks duplicate (ts, event_id)
    # rows on the step mask ascending (view=1 before click=2), and
    # DuckDB's string_agg ORDER BY is unspecified for duplicate keys —
    # 'a' < 'b' ascending replays the same mask order
    out["sequence_count"] = """
WITH s AS (
  SELECT user_id,
         string_agg(CASE WHEN event_type = 'view' THEN 'a' ELSE 'b' END,
                    '' ORDER BY ts, event_id,
                       CASE WHEN event_type = 'view' THEN 'a' ELSE 'b' END) AS seq
  FROM events WHERE event_type IN ('view', 'click') GROUP BY user_id
)
SELECT u.user_id,
       coalesce(len(regexp_extract_all(s.seq, 'a[^b]*b')), 0)::BIGINT
         AS n_matches
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN s USING (user_id)
"""
    out["bpe_merges"] = _bpe_oracle()
    # lg_k=14 HLL is sparse-exact at every fixture cardinality (see the
    # two entries' docstrings): the oracles are the EXACT replays, which
    # hash-fail loudly if the fixture ever leaves the sparse regime
    out["hll_rollup"] = """
SELECT date_trunc('day', ts)::TIMESTAMP AS day,
       count(DISTINCT user_id)::BIGINT AS approx_users,
       count(*)::BIGINT AS n_events
FROM events GROUP BY 1 ORDER BY 1
"""
    out["uniq_state_merge"] = """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS approx_users
FROM events GROUP BY event_type ORDER BY event_type
"""
    # seeded driver k-means report: full 8-row output pinned per scale
    # (stability + rounding tie distance pre-checked — see the
    # q_embedding_clusters docstring)
    out["embedding_clusters"] = """
WITH li AS (SELECT count(*) AS c FROM lineitem)
SELECT v.list_id::INT AS list_id,
       (CASE WHEN li.c = 6000 THEN v.n1 WHEN li.c = 60000 THEN v.n2
             WHEN li.c = 600000 THEN v.n3 ELSE NULL END)::BIGINT AS n_vectors,
       (CASE WHEN li.c = 6000 THEN v.c1 WHEN li.c = 60000 THEN v.c2
             WHEN li.c = 600000 THEN v.c3 ELSE NULL END)::DOUBLE AS cohesion
FROM (VALUES
  (0, 69, 63, 248, 0.270282, 0.262232, 0.22568),
  (1, 59, 55, 265, 0.274675, 0.293884, 0.2217),
  (2, 61, 63, 243, 0.270398, 0.271071, 0.224819),
  (3, 68, 64, 274, 0.269946, 0.270342, 0.229049),
  (4, 58, 63, 237, 0.269489, 0.276546, 0.234125),
  (5, 56, 69, 254, 0.28139, 0.280665, 0.220609),
  (6, 66, 57, 245, 0.267953, 0.283669, 0.232877),
  (7, 63, 66, 234, 0.263785, 0.284693, 0.22915))
     v(list_id, n1, n2, n3, c1, c2, c3), li
ORDER BY v.list_id
"""
    # SemDeDup validity: n_input replays outright, both identities are
    # constants by the min-id greedy guarantee, survivors pinned per scale
    out["semdedup_valid"] = """
WITH li AS (SELECT count(*) AS c FROM lineitem),
n AS (SELECT count(*) + 1 AS n_input FROM embeddings)
SELECT n.n_input::BIGINT AS n_input,
       (CASE WHEN li.c = 6000 THEN 471 WHEN li.c = 60000 THEN 473
             WHEN li.c = 600000 THEN 1713 ELSE NULL END)::BIGINT
         AS n_survivors,
       1::BIGINT AS planted_pair_survivors,
       0::BIGINT AS within_cluster_viol
FROM n, li
"""
    # PCA verification pins (see q_pca_project docstring): eigenvectors
    # are driver-side eigh output, so the sign-canonical quantized
    # per-component integers are MEASURED and pinned per lineitem
    # cardinality (embeddings is 500 rows at both small scales but with
    # different content); NULL sentinel at unpinned scales.  Re-measure +
    # re-pin on any pca_fit/pca_project change — that forced review is
    # the point (the ann_recall_suite stance).
    out["pca_project"] = """
WITH li AS (SELECT count(*) AS c FROM lineitem)
SELECT v.k::INT AS k,
       (CASE WHEN li.c = 6000 THEN v.s1 WHEN li.c = 60000 THEN v.s2
             WHEN li.c = 600000 THEN v.s3 ELSE NULL END)::BIGINT AS ssq_q,
       (CASE WHEN li.c = 6000 THEN v.m1 WHEN li.c = 60000 THEN v.m2
             WHEN li.c = 600000 THEN v.m3 ELSE NULL END)::BIGINT AS sum_q,
       (CASE WHEN li.c IN (6000, 60000, 600000) THEN 0.0
             ELSE NULL END)::DOUBLE AS orth_residual
FROM (VALUES (0, 14442970, 13757110, 41862413, 0, 0, -3),
             (1, 13463131, 13582878, 41142101, -7, 2, 19),
             (2, 12914351, 13309071, 40766643, 3, 1, 17),
             (3, 12635827, 12796279, 39958670, -7, -5, -14))
     v(k, s1, s2, s3, m1, m2, m3), li
ORDER BY v.k
"""
    out["pack_valid"] = """
WITH t AS (SELECT doc_id,
  len(string_split_regex(trim(text), '\\s+'))::BIGINT AS nt FROM documents),
li AS (SELECT count(*) AS c FROM lineitem)
SELECT (SELECT count(*) FROM t)::BIGINT AS n_docs,
       (SELECT count(DISTINCT doc_id) FROM t)::BIGINT AS n_distinct,
       (SELECT sum(nt) FROM t)::BIGINT AS total_tokens,
       (SELECT count(*) FROM t WHERE nt > 1024)::BIGINT AS n_oversize,
       0::BIGINT AS overfull_bins,
       (CASE WHEN li.c = 6000 THEN 35 WHEN li.c = 60000 THEN 35
             WHEN li.c = 600000 THEN 272 ELSE NULL END)::BIGINT AS n_bins,
       1::INT AS lb_ok
FROM li
"""
    # DataSketches HLL estimates are deterministic per input set: pinned
    # per scale (lineitem-count keyed; NULL = unpinned scale).  exact
    # sides replay outright; err_bp recomputed from the pins so the
    # formula stays consistent with the Spark side.
    out["sketch_error"] = """
WITH li AS (SELECT count(*) AS c FROM lineitem),
ext AS (SELECT 'type:' || event_type AS dim,
        count(DISTINCT user_id)::BIGINT AS exact
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'lgk4:' || event_type, count(DISTINCT user_id)::BIGINT
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'day_rollup_sum', sum(cnt)::BIGINT FROM (
          SELECT count(DISTINCT user_id) AS cnt FROM events
          GROUP BY date_trunc('day', ts))),
pins(dim, a1, a2, a3) AS (VALUES {PINS})
SELECT e.dim, e.exact,
       (CASE WHEN li.c = 6000 THEN p.a1 WHEN li.c = 60000 THEN p.a2
             WHEN li.c = 600000 THEN p.a3 ELSE NULL END)::BIGINT AS approx,
       floor(abs((CASE WHEN li.c = 6000 THEN p.a1 WHEN li.c = 60000 THEN p.a2
             WHEN li.c = 600000 THEN p.a3 ELSE NULL END) - e.exact) * 10000
             / e.exact)::BIGINT AS err_bp
FROM ext e JOIN pins p ON e.dim = p.dim, li ORDER BY e.dim
""".replace("{PINS}", _SKETCH_PINS)
    out["api_query_roundtrip"] = (
        "SELECT o_orderstatus, count(*) AS n, "
        "round(avg(o_totalprice), 2) AS avg_price, "
        "max(o_custkey)::BIGINT AS max_ck "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus "
        "LIMIT 100"
    )
    out["training_shards"] = r"""
WITH d AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\s+'),
             x -> x <> ''))::BIGINT AS nt,
         md5(doc_id::VARCHAR) AS h,
         substring(md5(doc_id::VARCHAR), 1, 2) AS b
  FROM documents
), wb AS (
  SELECT doc_id, nt, b,
         sum(nt) OVER (PARTITION BY b ORDER BY h, doc_id
                       ROWS UNBOUNDED PRECEDING) AS wcum
  FROM d
), off AS (
  SELECT b, coalesce(sum(bt) OVER (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS boff
  FROM (SELECT b, sum(nt) AS bt FROM d GROUP BY b)
)
SELECT doc_id, nt AS n_tokens,
       ((boff + wcum - nt) // 2000)::BIGINT AS shard
FROM wb JOIN off USING (b) ORDER BY doc_id
"""
    # full-probe IVF is DEFINED to equal the exact top-k — same oracle
    out["ann_ivf_recall"] = _COSINE_ORACLE
    # seeded-ANN recall pins (see q_ann_recall_suite docstring): DuckDB
    # cannot replay seeded hyperplanes/k-means, so the measured hit
    # counts are pinned per fixture scale, keyed on lineitem cardinality
    # (embeddings is 500 rows at both small scales).  Re-measure + re-pin
    # on any parameter/algorithm change — that forced review is the point.
    # Each branch keys an EXPLICIT cardinality; any other scale yields
    # NULL so "unpinned scale" is distinguishable from a recall
    # regression (ADVICE r8).
    out["ann_recall_suite"] = """
WITH li AS (SELECT count(*) AS c FROM lineitem)
SELECT v.method,
       (CASE WHEN li.c = 6000 THEN v.h1
             WHEN li.c = 60000 THEN v.h2
             WHEN li.c = 600000 THEN v.h3
             ELSE NULL END)::BIGINT AS hits,
       (CASE WHEN li.c = 6000 THEN v.t1
             WHEN li.c = 60000 THEN v.t2
             WHEN li.c = 600000 THEN v.t3
             ELSE NULL END)::BIGINT AS total
FROM (VALUES ('ivfpq', 36, 50, 33, 50, 32, 50),
             ('lsh', 48, 50, 47, 50, 46, 50),
             ('pair_lsh', 59, 66, 57, 59, 813, 920),
             ('pq', 49, 50, 49, 50, 46, 50))
     v(method, h1, t1, h2, t2, h3, t3), li
ORDER BY v.method
"""
    return out
