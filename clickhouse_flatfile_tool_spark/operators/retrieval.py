"""Keyword + hybrid retrieval over the documents corpus (EXT depth).

The reference moves data INTO an analytics store so users can query it;
the training-data twin of that capability is finding documents — by
keyword (BM25), by embedding (similarity.py), and by BOTH (reciprocal
rank fusion, the standard hybrid-search combiner).  Everything here is
exact, deterministic, and oracle-checkable in SQL: BM25 is closed-form
arithmetic over term statistics, RRF is arithmetic over two rank lists.

Scale design: the corpus-wide statistics (document frequency per query
term, average document length) are vocabulary- or constant-sized and
broadcast; the per-document score is one exploded-token aggregation
keyed by doc — the shuffle carries (doc, query-term) partial counts, not
text.  No UDFs anywhere; the score expression stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clickhouse_flatfile_tool_spark.operators.relational import top_k_per_group

_WS = r"\s+"


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 score of every matching document for one keyword query.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    with the standard smoothed idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Tokenization is the corpus convention (lower + whitespace split —
    identical to text.py metrics and the DuckDB oracle).  N and avgdl
    come from one 1-row aggregate (broadcast); per-term document
    frequency is a |terms|-row aggregate (broadcast); the per-doc tf pass
    is the only doc-cardinality shuffle.  Documents matching no term are
    absent (score 0 in BM25 terms).
    """
    if not query_terms:
        raise ValueError("bm25_scores needs at least one query term")
    terms = [t.lower() for t in query_terms]
    words = F.split(F.trim(F.lower(F.col(text_col))), _WS)
    base = df.select(F.col(id_col), words.alias("__w")).select(
        F.col(id_col), "__w", F.size("__w").alias("__len")
    )
    stats = base.select(
        F.count(F.lit(1)).alias("__n"), F.avg("__len").alias("__avgdl")
    )
    toks = base.select(
        F.col(id_col), "__len", F.explode("__w").alias("__t")
    ).where(F.col("__t").isin(terms))
    # per-term document frequency (tiny: ≤ |terms| rows)
    dfreq = toks.groupBy("__t").agg(
        F.count_distinct(F.col(id_col)).alias("__df")
    )
    tf = toks.groupBy(id_col, "__t").agg(
        F.count(F.lit(1)).alias("__tf"), F.first("__len").alias("__len")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "__term_score",
            F.col("__idf")
            * (F.col("__tf") * (1.0 + k1))
            / (
                F.col("__tf")
                + k1 * (1.0 - b + b * F.col("__len") / F.col("__avgdl"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("__term_score").alias("bm25"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 — TakeOrderedAndProject-style: score, then
    one per-corpus top-k with id tiebreak for determinism."""
    scored = bm25_scores(df, query_terms, id_col, text_col, k1, b)
    return (
        scored.orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("bm25", 6).alias("bm25"), "n_terms_matched")
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009) of two
    ranked lists: fused(d) = Σ_lists 1/(rrf_k + rank_list(d)), the
    parameter-free standard for combining keyword and vector retrieval —
    rank-based, so the two scorers' incomparable scales never meet.

    Inputs are (id, score) frames ordered by their own scores; ranks are
    assigned here (dense row_number, id tiebreak) so callers can pass raw
    scored output.  A document missing from one list simply contributes
    nothing from it.  Both lists are candidate-sized (top-N from their
    retrievers), so every join here is broadcast-scale.
    """
    def ranked(df2: DataFrame, alias: str) -> DataFrame:
        score = [c for c in df2.columns if c != id_col][0]
        return df2.select(
            F.col(id_col),
            F.row_number()
            .over(Window.orderBy(F.desc(score), F.asc(id_col)))
            .alias(alias),
        )

    ra = ranked(ranked_a, "__ra")
    rb = ranked(ranked_b, "__rb")
    fused = (
        ra.join(rb, id_col, "full")
        .withColumn(
            "rrf",
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("__ra")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("__rb")), F.lit(0.0)),
        )
    )
    return (
        fused.orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("rrf", 6).alias("rrf"))
    )
