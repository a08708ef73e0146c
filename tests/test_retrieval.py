"""Retrieval tests: BM25 hand-computed + RRF fusion invariants."""

import math

import pytest


def test_bm25_hand_computed(spark):
    from clickhouse_flatfile_tool_spark.operators.retrieval import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "cat dog cat"),          # tf(cat)=2, len 3
            (2, "dog fish"),             # no cat
            (3, "cat"),                  # tf(cat)=1, len 1
            (4, "bird bird bird bird"),  # no match
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bm25_scores(docs, ["cat"]).collect()}
    assert set(out) == {1, 3}
    n, df_t, avgdl = 4, 2, (3 + 2 + 1 + 4) / 4
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
    k1, b = 1.2, 0.75

    def score(tf, dl):
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert out[1].bm25 == pytest.approx(score(2, 3), abs=1e-9)
    assert out[3].bm25 == pytest.approx(score(1, 1), abs=1e-9)
    assert out[1].n_terms_matched == 1
    # multi-term: doc 1 matches both, score is the sum
    both = {r.doc_id: r for r in bm25_scores(docs, ["cat", "dog"]).collect()}
    assert both[1].n_terms_matched == 2
    assert both[1].bm25 > out[1].bm25


def test_rrf_fusion_hand_computed(spark):
    from clickhouse_flatfile_tool_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(10, 0.9), (20, 0.8), (30, 0.7)], "doc_id long, s double"
    )
    b = spark.createDataFrame(
        [(20, 5.0), (40, 4.0)], "doc_id long, s double"
    )
    out = {r.doc_id: r.rrf for r in rrf_fuse(a, b, k=10).collect()}
    # doc 20: rank 2 in a, rank 1 in b; doc 10: rank 1 in a only
    assert out[20] == pytest.approx(round(1 / 62 + 1 / 61, 6))
    assert out[10] == pytest.approx(round(1 / 61, 6))
    assert out[30] == pytest.approx(round(1 / 63, 6))
    assert out[40] == pytest.approx(round(1 / 62, 6))
    # fused order puts the doubly-retrieved doc first
    ranked = sorted(out, key=lambda d: -out[d])
    assert ranked[0] == 20
