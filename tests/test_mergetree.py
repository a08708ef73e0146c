"""MergeTree-family FINAL semantics (operators/mergetree.py) + the new
text-quality and sketch operators: hand-computed golden cases and invariants.

Reference context: the tool only ever emits ``ENGINE = MergeTree()``
(/root/reference/server/server.js:586-589); the Replacing/Summing/Collapsing
FINAL reads implemented here are the ClickHouse engine-family semantics a
user of that tool's target system relies on.
"""

from __future__ import annotations

import pytest

from clickhouse_flatfile_tool_spark.operators import events, mergetree, text


@pytest.fixture(scope="module")
def cdc(spark):
    rows = [
        # key 1: insert v1, cancel v1, insert v2  -> survives with v2 state
        (1, 1, 1, "a", 10.0),
        (1, 2, -1, "a", 10.0),
        (1, 3, 1, "b", 20.0),
        # key 2: insert then cancel -> gone
        (2, 1, 1, "x", 1.0),
        (2, 2, -1, "x", 1.0),
        # key 3: plain insert -> survives
        (3, 7, 1, "z", 5.0),
    ]
    return spark.createDataFrame(rows, "k int, ver int, sign int, state string, amount double")


def test_collapsing_final_golden(cdc):
    out = mergetree.collapsing_final(
        cdc, ["k"], "sign", version_cols=["ver"], value_cols=["state", "amount"]
    )
    got = {r["k"]: (r["ver"], r["state"], r["amount"]) for r in out.collect()}
    assert got == {1: (3, "b", 20.0), 3: (7, "z", 5.0)}


def test_collapsing_final_one_shuffle(cdc):
    plan = mergetree.collapsing_final(
        cdc, ["k"], "sign", version_cols=["ver"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_replacing_final_golden(cdc):
    out = mergetree.replacing_final(cdc, ["k"], ["ver"], value_cols=["state"])
    got = {r["k"]: (r["ver"], r["state"]) for r in out.collect()}
    # replacing keeps the max-version row regardless of sign
    assert got == {1: (3, "b"), 2: (2, "x"), 3: (7, "z")}


def test_summing_final_golden(cdc):
    out = mergetree.summing_final(cdc, ["k"], ["amount"])
    got = {r["k"]: r["amount"] for r in out.collect()}
    assert got == {1: 40.0, 2: 2.0, 3: 5.0}


def test_aggregating_final_golden(spark):
    # two "parts" holding partial states for the same key merge like
    # ClickHouse -Merge combinators: counts/sums add, min/max combine
    rows = [
        ("a", 3, 30, 5, 20),
        ("a", 2, 12, 1, 9),
        ("b", 1, 7, 7, 7),
    ]
    df = spark.createDataFrame(rows, "k string, cnt long, s long, mn long, mx long")
    out = mergetree.aggregating_final(
        df, ["k"], {"cnt": "count", "s": "sum", "mn": "min", "mx": "max"}
    )
    got = {r["k"]: (r["cnt"], r["s"], r["mn"], r["mx"]) for r in out.collect()}
    assert got == {"a": (5, 42, 1, 20), "b": (1, 7, 7, 7)}


def test_aggregating_final_one_shuffle_and_bad_kind(spark):
    df = spark.createDataFrame([("a", 1)], "k string, cnt long")
    plan = (
        mergetree.aggregating_final(df, ["k"], {"cnt": "count"})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    with pytest.raises(ValueError, match="unknown merge kinds"):
        mergetree.aggregating_final(df, ["k"], {"cnt": "median"})


def test_repetition_metrics_golden(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "one two three four")], "doc_id int, text string"
    )
    got = {r["doc_id"]: r for r in text.with_repetition_metrics(df).collect()}
    assert got[1]["dup_word_frac"] == pytest.approx(0.5)  # 2 distinct / 4
    assert got[1]["top_word_frac"] == pytest.approx(0.75)  # 'a' 3 of 4
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["top_word_frac"] == pytest.approx(0.25)


def test_tfidf_ubiquitous_term_scores_zero(spark):
    # a term present in every doc has idf ln(N/N)=0 regardless of frequency
    df = spark.createDataFrame(
        [(1, "common alpha alpha"), (2, "common beta")], "doc_id int, text string"
    )
    out = {r["term"]: r["tfidf"] for r in text.tfidf_top_terms(df, k=10).collect()}
    assert out["common"] == 0.0
    assert out["alpha"] > out["beta"] > 0.0


def test_hll_rollup_close_to_exact(spark, tables):
    ev = tables["events"]
    import pyspark.sql.functions as F

    approx = {
        r["day"]: r["approx_users"] for r in events.hll_rollup(ev).collect()
    }
    exact = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for day, n in exact.items():
        assert approx[day] == pytest.approx(n, rel=0.05)


def test_hll_rollup_merged_matches_direct_daily(spark, tables):
    # union of hourly sketches must estimate ~ the same as a direct daily
    # sketch (mergeability — the property that makes the rollup valid)
    import pyspark.sql.functions as F

    ev = tables["events"]
    merged = {r["day"]: r["approx_users"] for r in events.hll_rollup(ev).collect()}
    direct = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14))).alias("n"))
        .collect()
    }
    for day in direct:
        assert merged[day] == pytest.approx(direct[day], rel=0.02)


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------

def test_connected_components_golden(spark):
    from clickhouse_flatfile_tool_spark.operators import dedup

    # two components: {1,2,3,4} (chain) and {10,11}; 20 isolated (no pairs)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r["node"]: r["comp"] for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_dedup_transitive(spark):
    from clickhouse_flatfile_tool_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in [1, 2, 3, 10, 11, 20]], "doc_id long, text string"
    )
    # A~B, B~C with no A~C pair: greedy pair-drop keeps nothing linking 3->1,
    # CC must drop 2 AND 3, keep 1
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    kept = sorted(r["doc_id"] for r in dedup.cc_dedup(docs, pairs).collect())
    assert kept == [1, 10, 20]


def test_stream_ingest_foreachbatch(spark, tmp_path):
    import pyspark.sql.functions as F
    from clickhouse_flatfile_tool_spark.streaming import stream_ops

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.csv").write_text("id,val\n1,10\n2,20\n")
    (src / "b.csv").write_text("id,val\n3,30\n")
    stream = (
        spark.readStream.schema("id int, val int")
        .option("header", True)
        .csv(str(src))
    )
    spark.sql("DROP TABLE IF EXISTS stream_ingest_t")
    stream_ops.stream_ingest(
        stream,
        "stream_ingest_t",
        str(tmp_path / "ckpt"),
        transform=lambda df: df.where(F.col("val") > 10),
    )
    got = sorted(r["id"] for r in spark.table("stream_ingest_t").collect())
    assert got == [2, 3]
    # re-running with the same checkpoint must be a no-op (exactly-once)
    stream2 = (
        spark.readStream.schema("id int, val int")
        .option("header", True)
        .csv(str(src))
    )
    stream_ops.stream_ingest(stream2, "stream_ingest_t", str(tmp_path / "ckpt"))
    assert spark.table("stream_ingest_t").count() == 2


def test_pagerank_hand_computed_and_invariants(spark):
    from clickhouse_flatfile_tool_spark.operators.dedup import pagerank

    # path graph 1-2-3: center node 2 must outrank the leaves, symmetric ends
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    r = {row.node: row.rank for row in pagerank(pairs, iterations=60).collect()}
    assert r[2] > r[1] and abs(r[1] - r[3]) < 1e-9
    # closed-form fixpoint for the path graph (d=0.85):
    # leaf = 0.15 + 0.85*center/2 ; center = 0.15 + 0.85*(leaf+leaf)
    # => center = 0.15 + 1.7*(0.15 + 0.425*center)
    # power iteration converges ~0.85^k: 60 rounds -> error ~6e-5
    center = (0.15 + 1.7 * 0.15) / (1 - 1.7 * 0.425)
    leaf = 0.15 + 0.425 * center
    assert abs(r[2] - center) < 1e-3 and abs(r[1] - leaf) < 1e-3
    # rank mass ~ node count on a regular graph (triangle: all ranks 1.0)
    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "id_a long, id_b long")
    rt = {row.node: row.rank for row in pagerank(tri, iterations=5).collect()}
    assert all(abs(v - 1.0) < 1e-9 for v in rt.values())


def test_mv_refresh_incremental_equals_full_recompute(tables):
    from pyspark.sql import functions as F

    from clickhouse_flatfile_tool_spark.operators.mergetree import (
        aggregating_final,
        mv_refresh,
    )

    o = tables["orders"].select(
        "o_orderpriority",
        F.col("o_totalprice").alias("s"),
        F.lit(1).alias("n"),
        F.col("o_totalprice").alias("mx"),
    )
    smap = {"s": "sum", "n": "count", "mx": "max"}
    keys = ["o_orderpriority"]
    # three daily batches folded incrementally
    state = None
    for day in range(3):
        delta = o.filter(f"abs(hash(s)) % 3 = {day}")
        state = mv_refresh(state, delta, keys, smap)
    inc = {
        r.o_orderpriority: (round(r.s, 2), r.n, r.mx) for r in state.collect()
    }
    full = {
        r.o_orderpriority: (round(r.s, 2), r.n, r.mx)
        for r in aggregating_final(o, keys, smap).collect()
    }
    assert inc == full and len(full) > 0


def test_mv_refresh_with_hll_uniq_state(spark):
    """uniqState/uniqMerge analog: a distinct-count MV maintained
    incrementally through HLL sketch states must estimate the same value
    as a one-shot sketch over all data, and stay within HLL error of the
    exact distinct count."""
    from pyspark.sql import functions as F

    from clickhouse_flatfile_tool_spark.operators.mergetree import (
        hll_state,
        mv_refresh,
    )

    rows = [(i % 4, f"u{i % 997}", i) for i in range(6000)]
    df = spark.createDataFrame(rows, "g int, user string, v long")
    batches = [df.where(f"v % 3 = {k}") for k in range(3)]

    smap = {"uniq_state": "hll", "n": "count"}

    def to_states(b):
        return hll_state(b, ["g"], "user").join(
            b.groupBy("g").agg(F.count(F.lit(1)).alias("n")), "g"
        )

    state = None
    for b in batches:
        state = mv_refresh(state, to_states(b), ["g"], smap)
    folded = state.select(
        "g", F.hll_sketch_estimate("uniq_state").alias("u"), "n"
    ).collect()
    oneshot = {
        r.g: r.u
        for r in to_states(df)
        .select("g", F.hll_sketch_estimate("uniq_state").alias("u"))
        .collect()
    }
    exact = {
        r.g: r.u
        for r in df.groupBy("g").agg(F.count_distinct("user").alias("u")).collect()
    }
    for r in folded:
        # union-of-sketches need not be register-identical to a one-shot
        # sketch (datasketches sparse-mode promotion differs), but both
        # must sit within HLL error of the exact distinct count
        assert abs(r.u - oneshot[r.g]) / exact[r.g] < 0.02
        assert abs(r.u - exact[r.g]) / exact[r.g] < 0.05
        assert r.n == 1500


def test_uniq_state_merge_estimate_within_bound(spark, sf_dir):
    """The uniq_state_merge driver query (uniqState/uniqMerge via
    hll_state + mv_refresh) must land within 2 % of the exact
    COUNT(DISTINCT) per event_type on the fixture — the ANN-recall-floor
    pattern applied to sketch estimates (VERDICT r3 #5)."""
    import os

    import __spark_entry__ as E
    from pyspark.sql import functions as F

    got = {
        r.event_type: r.approx_users
        for r in E.queries()["uniq_state_merge"](spark, sf_dir).collect()
    }
    from clickhouse_flatfile_tool_spark.sources.files import read_parquet

    ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for t, n in exact.items():
        assert abs(got[t] - n) / n <= 0.02, (t, got[t], n)


def test_final_read_registry_and_sql_endpoint(spark, cdc):
    """SELECT ... FROM t FINAL through api.query: the engine registry +
    final_read + the dialect's FINAL rewrite produce ClickHouse's
    read-time-merge result; unregistered tables get a clear error."""
    from clickhouse_flatfile_tool_spark import api
    from clickhouse_flatfile_tool_spark.dialect import (
        final_tables,
        translate_clickhouse_sql as tr,
    )

    cdc.createOrReplaceTempView("cdc_v")
    mergetree.register_table_engine(
        "cdc_v", "VersionedCollapsingMergeTree", ["k"],
        version_cols=["ver"], sign_col="sign",
    )
    # rewrite shape (alias preserved, literal untouched)
    assert tr("SELECT c.k FROM cdc_v AS c FINAL WHERE state != 'FROM x FINAL'") == (
        "SELECT c.k FROM cdc_v__final AS c FINAL"
        .replace(" FINAL", "") + " WHERE state != 'FROM x FINAL'"
    )
    assert final_tables("SELECT 'FROM f FINAL', k FROM cdc_v FINAL") == ["cdc_v"]

    out = api.query(
        spark, "SELECT k, state, amount FROM cdc_v FINAL ORDER BY k"
    )
    assert out["success"], out
    assert [(r["k"], r["state"], r["amount"]) for r in out["data"]] == [
        (1, "b", 20.0), (3, "z", 5.0)
    ]

    # Replacing engine on the same view: re-registration wins
    mergetree.register_table_engine(
        "cdc_v", "ReplacingMergeTree", ["k"], version_cols=["ver"],
        value_cols=["state"],
    )
    out2 = api.query(spark, "SELECT count() AS n FROM cdc_v FINAL")
    assert out2["success"] and out2["data"][0]["n"] == 3

    bad = api.query(spark, "SELECT * FROM never_registered FINAL")
    assert not bad["success"] and "register_table_engine" in bad["error"]

    with pytest.raises(ValueError, match="unknown engine"):
        mergetree.register_table_engine("x", "GraphiteMergeTree", ["k"])


def test_final_read_summing_default_columns(spark):
    """SummingMergeTree registration without sum_cols sums every numeric
    non-key column (ClickHouse's default) and nothing else."""
    df = spark.createDataFrame(
        [(1, "a", 2, 1.5), (1, "b", 3, 0.5), (2, "c", 7, 1.0)],
        "k int, tag string, hits int, amt double",
    )
    df.createOrReplaceTempView("sums_v")
    mergetree.register_table_engine("sums_v", "SummingMergeTree", ["k"])
    got = {
        r["k"]: (r["hits"], r["amt"])
        for r in mergetree.final_read(spark, "sums_v").collect()
    }
    assert got == {1: (5, 2.0), 2: (7, 1.0)}


def test_replacing_final_is_deleted_tombstones(spark):
    """ReplacingMergeTree(ver, is_deleted): the max-version row wins per
    key, and keys whose winner is a tombstone vanish — while an older
    delete superseded by a newer insert stays alive."""
    from clickhouse_flatfile_tool_spark.operators.mergetree import replacing_final

    df = spark.createDataFrame(
        [
            ("a", 1, 10.0, 0),
            ("a", 2, 20.0, 1),   # deleted at v2 -> key a gone
            ("b", 1, 30.0, 1),
            ("b", 2, 40.0, 0),   # re-inserted after delete -> alive
            ("c", 5, 50.0, 0),   # plain live row
        ],
        "k string, ver int, v double, is_deleted int",
    )
    rows = {
        r.k: (r.ver, r.v)
        for r in replacing_final(
            df, ["k"], ["ver"], is_deleted_col="is_deleted"
        ).collect()
    }
    assert rows == {"b": (2, 40.0), "c": (5, 50.0)}
