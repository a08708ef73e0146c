"""Event-window and Structured Streaming tests (EXT E6)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from clickhouse_flatfile_tool_spark.operators import events as E
from clickhouse_flatfile_tool_spark.streaming import stream_ops as SS


@pytest.fixture(scope="module")
def ev(tables):
    return tables["events"]


def test_events_ts_is_timestamp(ev):
    # ns-parquet handling (sources/files.py): ts must arrive as timestamp
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_tumbling_partitions_all_events(ev):
    out = E.tumbling_window_agg(ev, "10 minutes")
    assert out.agg(F.sum("n_events")).first()[0] == ev.count()
    # window bounds are 10-minute aligned
    row = out.first()
    assert (row.window_end - row.window_start).total_seconds() == 600
    assert row.window_start.minute % 10 == 0 and row.window_start.second == 0


def test_sliding_double_counts(ev):
    out = E.sliding_window_agg(ev, "10 minutes", "5 minutes")
    # every event lands in exactly duration/slide = 2 windows
    assert out.agg(F.sum("n_events")).first()[0] == 2 * ev.count()


def test_session_windows_merge(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 1.0),  # same session (10 < 30 min gap)
        (1, "2024-01-01 01:00:00", 1.0),  # new session (50 min gap)
        (2, "2024-01-01 00:00:00", 1.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = E.session_window_agg(df, "30 minutes").orderBy("user_id", "session_start")
    got = [(r.user_id, r.n_events) for r in out.collect()]
    assert got == [(1, 2), (1, 1), (2, 1)]
    first = out.first()
    # session_end = last event + gap
    assert (first.session_end - first.session_start).total_seconds() == 10 * 60 + 30 * 60


def test_props_json_parse(ev):
    out = E.with_props(ev).select("props_s.k").limit(10).collect()
    assert all(isinstance(r.k, int) for r in out)


def test_streaming_matches_batch_closed_windows(spark, sf_dir, ev):
    """AvailableNow streaming tumbling counts == batch counts for all windows
    the watermark considers closed (open windows withheld by append mode)."""
    tmp = tempfile.mkdtemp(prefix="cfts_test_stream_")
    out_dir, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
    try:
        stream = SS.read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
        SS.run_available_now(SS.windowed_counts(stream, "10 minutes", "30 minutes"), out_dir, ckpt)
        got = spark.read.parquet(out_dir)
        batch = E.tumbling_window_agg(ev, "10 minutes", group_extra=["event_type"])
        max_ts = ev.agg(F.max("ts")).first()[0]
        sg = {
            (r.window_start, r.event_type): r.n_events
            for r in got.collect()
        }
        for r in batch.collect():
            key = (r.window_start, r.event_type)
            if r.window_end <= max_ts:  # definitely closed under the watermark
                assert sg.get(key) == r.n_events, f"window {key} mismatch"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_dedup_bounded(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="cfts_test_sdedup_")
    out_dir, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ckpt")
    try:
        stream = SS.read_event_stream(spark, os.path.join(sf_dir, "events.parquet"))
        SS.run_available_now(
            SS.dedup_within_watermark(stream, ["user_id", "event_type"], "10 hours"),
            out_dir,
            ckpt,
        )
        got = spark.read.parquet(out_dir)
        # output never exceeds the number of distinct keys
        distinct_keys = got.select("user_id", "event_type").distinct().count()
        assert got.count() == distinct_keys
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_running_user_totals_stateful(spark, sf_dir, tmp_path):
    """applyInPandasWithState custom stateful op: totals must equal the batch
    groupBy at AvailableNow completion (single-batch source → one emission
    per user)."""
    import os

    from pyspark.sql import functions as F

    from clickhouse_flatfile_tool_spark.sources.files import read_parquet
    from clickhouse_flatfile_tool_spark.streaming import stream_ops

    path = os.path.join(sf_dir, "events.parquet")
    stream = stream_ops.read_event_stream(spark, path)
    result = stream_ops.running_user_totals(stream)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_ops.run_available_now(result, out_dir, ckpt)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r.user_id: (r.n, round(r.tv, 2))
        for r in read_parquet(spark, path)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert got == want


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data policy: the watermark advances between micro-batches and a
    row older than it is dropped, its window never emitted.  Spark applies
    late-event filtering with the PREVIOUS batch's watermark (watermark
    propagation, SPARK-40925), so the late row arrives two batches after the
    rows that established the high-water mark."""
    import datetime as dt
    import os
    import time

    from pyspark.sql import functions as F

    from clickhouse_flatfile_tool_spark.streaming import stream_ops

    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def mk(rows, name):
        df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        part = [f for f in os.listdir(tmp_path / name) if f.endswith(".parquet")][0]
        os.rename(str(tmp_path / name / part), os.path.join(src, f"{name}.parquet"))

    # batch 0: 10:00-11:00 → watermark after batch ≈ 10:30
    mk([(t0 + dt.timedelta(minutes=m), "click", 1.0) for m in (0, 30, 60)], "b1")
    time.sleep(1.1)  # file source orders batches by modification time
    mk([(t0 + dt.timedelta(minutes=55), "click", 1.0)], "b2")  # on time
    time.sleep(1.1)
    mk([(t0 - dt.timedelta(hours=2), "click", 1.0)], "b3")  # 2h late → drop

    stream = stream_ops.read_event_stream(spark, src, max_files_per_trigger=1)
    result = stream_ops.windowed_counts(stream, "10 minutes", "30 minutes")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_ops.run_available_now(result, out_dir, ckpt)

    got = spark.read.parquet(out_dir)
    late = got.filter(F.col("window_start") == t0 - dt.timedelta(hours=2))
    assert late.count() == 0, "late row beyond watermark must be dropped"
    # the finalized 10:00 window was emitted (append mode, watermark passed it)
    assert got.filter(F.col("window_start") == t0).count() == 1


def test_stream_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream watermarked join must produce exactly the pairs the
    batch interval join produces on the same (bounded) input."""
    import os

    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from clickhouse_flatfile_tool_spark.sources.files import read_parquet

    got = (
        em.queries()["stream_interval_join"](spark, sf_dir)
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    p = ev.filter("event_type = 'purchase'").select(
        "event_id", F.col("user_id").alias("u"), F.col("ts").alias("pts")
    )
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("u"), F.col("ts").alias("cts")
    )
    want = (
        p.join(c, "u")
        .filter(
            (F.col("cts") > F.col("pts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("cts") <= F.col("pts"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_hier_rollup_matches_direct(spark, sf_dir):
    """Each resolution of the hierarchical rollup must equal the same
    aggregation computed directly from raw rows."""
    import os

    from pyspark.sql import functions as F

    from clickhouse_flatfile_tool_spark.operators.events import multi_resolution_rollup
    from clickhouse_flatfile_tool_spark.sources.files import read_parquet

    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    ro = multi_resolution_rollup(ev, group_cols=["event_type"])
    for res in ["minute", "hour", "day"]:
        direct = (
            ev.groupBy(F.date_trunc(res, "ts").alias("bucket"), "event_type")
            .agg(
                F.round(F.sum("value"), 6).alias("s"),
                F.count(F.lit(1)).alias("c"),
                F.min("value").alias("mn"),
                F.max("value").alias("mx"),
            )
        )
        got = ro[res].select(
            "bucket",
            "event_type",
            F.round("v_sum", 6).alias("s"),
            F.col("v_cnt").alias("c"),
            F.col("v_min").alias("mn"),
            F.col("v_max").alias("mx"),
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, direct.collect())
        ), res


def test_user_event_stats_tws(spark, sf_dir, tmp_path):
    """transformWithStateInPandas (Spark 4 typed-state API): per-user stats
    must equal the batch groupBy at AvailableNow completion.  Skipped where
    google.protobuf is absent (this container) - see tws_available."""
    import os

    import pytest

    from clickhouse_flatfile_tool_spark.streaming import stream_ops as _so

    if not _so.tws_available():
        pytest.skip("google.protobuf descriptor unavailable (container limitation)")

    from pyspark.sql import functions as F

    from clickhouse_flatfile_tool_spark.sources.files import read_parquet
    from clickhouse_flatfile_tool_spark.streaming import stream_ops

    path = os.path.join(sf_dir, "events.parquet")
    stream = stream_ops.read_event_stream(spark, path)
    result = stream_ops.user_event_stats_tws(stream)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_ops.run_available_now(result, out_dir, ckpt)
    got = {
        r.user_id: (r.n_events, r.total_value, r.max_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r.user_id: (r.n, round(r.tv, 2), round(r.mx, 4))
        for r in read_parquet(spark, path)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("tv"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_stream_quality_gate_matches_batch(spark, sf_dir, tmp_path):
    from clickhouse_flatfile_tool_spark.operators.text import gopher_quality_rules
    from clickhouse_flatfile_tool_spark.sources.files import read_parquet
    from clickhouse_flatfile_tool_spark.streaming import stream_ops

    path = f"{sf_dir}/documents.parquet"
    batch = gopher_quality_rules(read_parquet(spark, path)).where("gopher_pass")
    stream = stream_ops.stream_quality_gate(
        stream_ops.read_event_stream(spark, path)
    )
    out_dir = str(tmp_path / "out")
    stream_ops.run_available_now(
        stream.select("doc_id"), out_dir, str(tmp_path / "ckpt")
    )
    got = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    expect = {r.doc_id for r in batch.select("doc_id").collect()}
    assert got == expect and len(got) > 0


def test_stream_enrich_equals_batch_join(spark, sf_dir, tmp_path):
    import os

    from pyspark.sql import functions as F

    from clickhouse_flatfile_tool_spark.sources.files import read_parquet
    from clickhouse_flatfile_tool_spark.streaming import stream_ops

    stream = stream_ops.read_event_stream(
        spark, os.path.join(sf_dir, "events.parquet")
    )
    dim = read_parquet(spark, os.path.join(sf_dir, "customer.parquet")).select(
        "c_custkey", "c_name"
    )
    enriched = stream_ops.stream_enrich(stream, dim, "user_id", "c_custkey", ["c_name"])
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_ops.run_available_now(enriched, out_dir, ckpt)
    got = {
        (r.event_id, r.c_name)
        for r in spark.read.parquet(out_dir).select("event_id", "c_name").collect()
    }
    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    expect = {
        (r.event_id, r.c_name)
        for r in ev.join(dim, ev.user_id == dim.c_custkey, "left")
        .select("event_id", "c_name")
        .collect()
    }
    assert got == expect and len(got) > 0


def test_stream_mv_equals_batch_aggregate(spark, sf_dir, tmp_path):
    import os

    from pyspark.sql import functions as F

    from clickhouse_flatfile_tool_spark.sources.files import read_parquet
    from clickhouse_flatfile_tool_spark.streaming import stream_ops

    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    # split the fixture into several files so AvailableNow makes multiple
    # micro-batches (one file per trigger) — exercising the incremental fold
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    stream = stream_ops.read_event_stream(spark, src, max_files_per_trigger=1)
    proj = stream.select(
        "event_type",
        F.col("value").alias("s"),
        F.lit(1).cast("long").alias("n"),
    )
    live = stream_ops.stream_mv(
        spark,
        proj,
        ["event_type"],
        {"s": "sum", "n": "count"},
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )
    got = {
        r.event_type: (round(r.s, 4), r.n)
        for r in spark.read.parquet(live).collect()
    }
    expect = {
        r.event_type: (round(r.s, 4), r.n)
        for r in ev.groupBy("event_type")
        .agg(F.sum("value").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    assert got == expect and len(got) == 5
    # multiple versions exist → the fold really ran incrementally
    versions = [d for d in os.listdir(str(tmp_path / "state")) if d.startswith("v")]
    assert len(versions) >= 2


def test_stream_mv_fold_replay_is_noop(spark, tmp_path):
    """Simulate the crash-after-pointer-swap window: re-invoking the fold
    for a batch the pointer already names must not change state."""
    import os

    from pyspark.sql import functions as F

    from clickhouse_flatfile_tool_spark.streaming import stream_ops

    state_dir = str(tmp_path / "st")
    os.makedirs(state_dir)
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, n long")
    # hand-drive the foreachBatch callback via stream_mv internals: run a
    # normal 1-batch stream first
    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    live = stream_ops.stream_mv(
        spark, stream, ["k"], {"n": "sum"}, state_dir, str(tmp_path / "ck")
    )
    before = {(r.k, r.n) for r in spark.read.parquet(live).collect()}
    # replaying the same (last) batch id must no-op — same stream, same
    # checkpoint: AvailableNow finds nothing new, state unchanged
    stream2 = spark.readStream.schema(df.schema).parquet(src)
    live2 = stream_ops.stream_mv(
        spark, stream2, ["k"], {"n": "sum"}, state_dir, str(tmp_path / "ck")
    )
    after = {(r.k, r.n) for r in spark.read.parquet(live2).collect()}
    assert after == before


def test_rowwise_minhash_matches_batch_signatures(spark, tables):
    """with_minhash_signature (streaming-safe, per-row) must produce values
    identical to the explode+groupBy batch path for every doc with >=1
    shingle — the guarantee that stream and backfill suppress the same
    documents."""
    from clickhouse_flatfile_tool_spark.operators import dedup

    docs = tables["documents"].select("doc_id", "text").limit(100)
    rowwise = dedup.with_minhash_signature(docs).select(
        "doc_id", *[f"mh_{i}" for i in range(16)]
    )
    batch = dedup.minhash_signatures(docs)
    a = {tuple(r) for r in rowwise.where("mh_0 IS NOT NULL").collect()}
    b = {tuple(r) for r in batch.collect()}
    assert a == b and len(a) > 0


def test_stream_near_dedup_suppresses_recrawls(spark, tables, tmp_path):
    """Originals at t=0, byte-identical re-crawls at t=60s: one survivor per
    distinct signature, none of the duplicate signatures survive twice."""
    import os

    from pyspark.sql import functions as F

    from clickhouse_flatfile_tool_spark.operators import dedup
    from clickhouse_flatfile_tool_spark.streaming import stream_ops

    # anchor at 2024, NOT epoch 0 — rows at the initial watermark (epoch
    # 0) are dropped as LATE, which would fake the suppression: the
    # originals would vanish via the late filter and the recrawls would
    # survive untouched (r6 finding)
    base_ts = 1_704_067_200
    docs = tables["documents"].select("doc_id", "text").limit(50)
    recrawl = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    staged = docs.withColumn(
        "__ts", F.timestamp_seconds(F.lit(base_ts))
    ).unionByName(
        recrawl.withColumn("__ts", F.timestamp_seconds(F.lit(base_ts + 60)))
    )
    src = str(tmp_path / "src")
    staged.write.mode("overwrite").parquet(src)
    stream = stream_ops.read_event_stream(spark, src)
    result = stream_ops.stream_near_dedup(stream, watermark="10 minutes")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_ops.run_available_now(result.select("doc_id"), out_dir, ckpt)
    survivors = spark.read.parquet(out_dir)
    n_sigs = (
        dedup.with_minhash_signature(staged)
        .select(*[f"mh_{i}" for i in range(16)])
        .distinct()
        .count()
    )
    assert survivors.count() == n_sigs
    # every original text is represented exactly once among survivors
    surv_texts = survivors.join(staged, "doc_id").select("text").distinct()
    assert surv_texts.count() == docs.select("text").distinct().count()
    # first-sighting semantics: the survivors are the ORIGINALS (ids
    # < 1M) — the recrawls were suppressed by STATE, not by the late
    # filter (both batches share one AvailableNow micro-batch here, but
    # an epoch-0 fixture would let the late filter fake this)
    assert survivors.filter("doc_id >= 1000000").count() == 0


def test_kafka_reader_options_mapping():
    from clickhouse_flatfile_tool_spark.streaming.stream_ops import (
        kafka_reader_options,
    )

    opts = kafka_reader_options(
        "b1:9092,b2:9092", "events", "earliest",
        group_id_prefix="cfts", max_offsets_per_trigger=1000,
    )
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "events"
    assert opts["startingOffsets"] == "earliest"
    assert opts["groupIdPrefix"] == "cfts"
    assert opts["maxOffsetsPerTrigger"] == "1000"


def test_parse_kafka_values_jsoneachrow(spark):
    """The JSONEachRow value parse on the kafka wire schema — static
    frame, no broker: good rows parse, malformed rows keep their
    metadata with NULL columns."""
    import datetime

    from clickhouse_flatfile_tool_spark.streaming.stream_ops import (
        parse_kafka_values,
    )

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (b"k1", b'{"user": 7, "v": 1.5}', "events", 0, 10, ts),
        (b"k2", b"not json", "events", 1, 11, ts),
    ]
    df = spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )
    out = {
        r._offset: (r._topic, r._partition, r.user, r.v)
        for r in parse_kafka_values(df, "user long, v double").collect()
    }
    assert out[10] == ("events", 0, 7, 1.5)
    assert out[11] == ("events", 1, None, None)


def test_stream_bloom_decontaminate_stateless(spark):
    """Stateless Bloom decontamination: contaminated docs drop, clean docs
    pass, NULL/empty text passes; pure expressions (no state store)."""
    from clickhouse_flatfile_tool_spark.streaming import stream_ops

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "totally different words with no overlap at all"),
            (3, None),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the eval set contains alpha beta gamma inside it")],
        "doc_id long, text string",
    )
    out = stream_ops.stream_bloom_decontaminate(docs, bench, "text")
    assert sorted(r.doc_id for r in out.collect()) == [2, 3, 4]


def test_stream_curation_pipeline_planted(spark, tmp_path):
    """Composed streaming curation on a planted fixture: a too-short doc
    fails the Gopher gate, a later near-clone is suppressed by watermark
    state (NOT the late filter — 2024-anchored timestamps), and a
    benchmark-overlapping doc is decontaminated."""
    import os

    from pyspark.sql import functions as F

    from clickhouse_flatfile_tool_spark.streaming import stream_ops

    base = ("the quick brown fox jumps over the lazy dog again and "
            "a stitch in time saves nine of the best things here and "
            "all that glitters is not gold said the wise old miner today ")
    base_ts = 1_704_067_200
    rows = [
        (1, base + "unique tail one about rivers and the mountain air", 0),
        (2, base + "unique tail two about oceans and the desert wind", 0),
        # byte-identical re-crawl of 1, one minute later -> suppressed
        (3, base + "unique tail one about rivers and the mountain air", 60),
        (4, "tiny doc", 0),                                # gopher drop
        (5, base + "holdout secret passphrase trigram overlap window here",
         0),                                               # contaminated
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, secs long"
    ).select(
        "doc_id", "text",
        F.timestamp_seconds(F.col("secs") + base_ts).alias("__ts"),
    )
    bench = spark.createDataFrame(
        [(100, "totally separate holdout secret passphrase trigram overlap "
               "window here for eval")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "src")
    docs.write.mode("overwrite").parquet(src)
    stream = stream_ops.read_event_stream(spark, src)
    result = stream_ops.stream_curation_pipeline(
        stream, bench, watermark="10 minutes"
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_ops.run_available_now(result.select("doc_id"), out_dir, ckpt)
    survivors = sorted(
        r.doc_id for r in spark.read.parquet(out_dir).collect()
    )
    assert survivors == [1, 2]


def test_stream_curation_matches_batch_stages(spark, sf_dir, tmp_path):
    """Batch-twin equivalence for the composed streaming curation
    pipeline (VERDICT r6 #7), on the real sf documents fixture: every
    stage's streaming form is checked against the batch operator with
    the same semantics —

    * gate: Gopher rules are pure per-row expressions → identical sets.
    * watermark near-dedup vs batch signature-dedup: the surviving
      SIGNATURE set is identical; survivor IDENTITY within a duplicate-
      signature group is arrival-order in the stream vs min-id in batch
      (the documented divergence), so ids are asserted only outside
      those groups.
    * decon: the batch twin reuses the same Bloom bitset probe (it runs
      on static frames), so outcomes match exactly; the Bloom-vs-exact
      divergence is bounded separately (bloom drops ⊇ exact drops).
    """
    import os

    from pyspark.sql import functions as F

    from clickhouse_flatfile_tool_spark.operators import dedup
    from clickhouse_flatfile_tool_spark.operators.text import gopher_quality_rules
    from clickhouse_flatfile_tool_spark.sources.files import read_parquet
    from clickhouse_flatfile_tool_spark.streaming import stream_ops

    docs = read_parquet(
        spark, os.path.join(sf_dir, "documents.parquet")
    ).select(
        "doc_id",
        "text",
        F.timestamp_seconds(
            F.lit(1_704_067_200) + F.col("doc_id") % 600
        ).alias("__ts"),  # all inside one 1-hour watermark window
    )
    bench = docs.filter(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 20 != 0)

    src = str(tmp_path / "src")
    train.write.mode("overwrite").parquet(src)
    stream = stream_ops.stream_curation_pipeline(
        stream_ops.read_event_stream(spark, src), bench, watermark="1 hour"
    )
    out_dir = str(tmp_path / "out")
    stream_ops.run_available_now(
        stream.select("doc_id"), out_dir, str(tmp_path / "ckpt")
    )
    stream_ids = {r.doc_id for r in spark.read.parquet(out_dir).collect()}

    # batch twin, stage by stage
    keys = [f"mh_{i}" for i in range(16)]
    gated = gopher_quality_rules(train, "text").where("gopher_pass")
    sigs = dedup.with_minhash_signature(gated, "text").persist()
    batch_dedup = sigs.join(
        sigs.groupBy(keys).agg(F.min("doc_id").alias("doc_id")),
        keys + ["doc_id"],
    )
    batch_clean = stream_ops.stream_bloom_decontaminate(
        batch_dedup.select("doc_id", "text"), bench, "text"
    )
    batch_ids = {r.doc_id for r in batch_clean.select("doc_id").collect()}

    # ids in duplicate-signature groups: survivor identity legitimately
    # differs between arrival-order (stream) and min-id (batch)
    dup_ids = {
        r.doc_id
        for r in sigs.join(
            sigs.groupBy(keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .where("n > 1"),
            keys,
        )
        .select("doc_id")
        .collect()
    }
    assert stream_ids - dup_ids == batch_ids - dup_ids
    assert len(stream_ids) == len(batch_ids) > 0

    # signature-level agreement including the duplicate groups
    def sig_set(ids):
        return {
            tuple(r[k] for k in keys)
            for r in sigs.where(
                F.col("doc_id").isin([int(i) for i in ids])
            ).collect()
        }

    assert sig_set(stream_ids) == sig_set(batch_ids)

    # bloom-vs-exact decon bound: every exactly-contaminated doc is also
    # bloom-dropped (fp over-drop is the only permitted direction)
    exact = dedup.decontaminate(
        batch_dedup.select("doc_id", "text"), bench, "doc_id", "text"
    )
    exact_drop = {
        r.doc_id for r in exact.where("contaminated").collect()
    }
    batch_dedup_ids = {
        r.doc_id for r in batch_dedup.select("doc_id").collect()
    }
    assert exact_drop <= (batch_dedup_ids - batch_ids)
    sigs.unpersist()
