"""Weak-scaling smoke: do the heavy text operators scale ~linearly?

Runs each operator on the sf0.1 documents fixture at 1× and K× (default 4×)
and reports wall-clock ratios.  The K× corpus is K perturbed copies of the
fixture: every word gets a per-copy suffix, so the shingle spaces of the
copies are DISJOINT — duplicate density (and therefore LSH bucket shapes)
stays constant per copy instead of exploding quadratically across copies,
which is what makes this a weak-scaling measurement of the operator rather
than of the planted-duplicate structure.

A healthy distributed operator lands near ratio ≈ K (linear); the LSH
paths' ratios include the per-copy candidate structure repeated K times.
Timing is environment-sensitive (see BASELINE.md §d) — run on an idle box.

Usage: python scripts/scale_smoke.py [K] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from clickhouse_flatfile_tool_spark import get_spark  # noqa: E402
from clickhouse_flatfile_tool_spark.operators import dedup, text  # noqa: E402
from clickhouse_flatfile_tool_spark.sources.files import read_parquet  # noqa: E402


def scaled_docs(docs, k: int):
    if k == 1:
        return docs
    copies = docs.crossJoin(
        F.broadcast(
            docs.sparkSession.range(k).select(F.col("id").alias("__copy"))
        )
    )
    n = docs.count()
    return copies.select(
        (F.col("doc_id") + F.col("__copy") * n).alias("doc_id"),
        # disjoint shingle space per copy: suffix every word with the copy id
        F.expr("regexp_replace(text, '(\\\\S+)', concat('$1_', __copy))").alias(
            "text"
        ),
        "lang",
        "source",
        "n_chars",
    )


OPS = {
    "exact_dedup": lambda df: dedup.exact_dedup_canonical(df),
    "minhash_candidates": lambda df: dedup.minhash_lsh_candidates(df),
    "simhash_candidates": lambda df: dedup.simhash_candidates(df),
    "corpus_stats": lambda df: text.corpus_stats(df),
    "cms_table": lambda df: __import__(
        "clickhouse_flatfile_tool_spark.operators.relational", fromlist=["relational"]
    ).cms_table(
        df.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")), "w"
    ),
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    docsk = scaled_docs(docs1, k).localCheckpoint()  # materialize the K× input
    docs1.count()  # warm page cache + JVM

    out = {}
    for name, op in OPS.items():
        times = []
        for df in (docs1, docsk):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                op(df).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            times.append(round(best, 3))
        out[name] = {
            "t_1x": times[0],
            f"t_{k}x": times[1],
            "ratio": round(times[1] / max(times[0], 1e-9), 2),
        }
    print(json.dumps({"k": k, "ops": out}))


if __name__ == "__main__":
    main()
