"""Deduplication operators (EXT E1/E2, SURVEY §2.10): exact, MinHash-LSH,
SimHash, and n-gram Jaccard near-dup detection.

Scale design:
  * exact dedup = hash-groupBy on a fingerprint — one shuffle keyed by a
    16-byte hash, no full-text comparison, no skew (hashes are uniform).
  * MinHash-LSH = shingle → minhash signature → band → bucket-join: candidate
    pairs only ever meet inside a band bucket, so the join is equi-join
    shaped (shuffle on band-hash), never a cross join.
  * SimHash = 64-bit signature, near-dups share signature under small
    Hamming distance; grouping by signature bands gives candidates.
  * all candidate verification (exact Jaccard) happens per-pair after LSH
    pruning — the O(n²) step never materializes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhouse_flatfile_tool_spark.operators.text import fingerprint

# ---------------------------------------------------------------------------
# E1: exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal via ``dropDuplicates`` — hash-partition on the
    key columns, keep one row per key (E1)."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def exact_dedup_canonical(
    df: DataFrame, key: Column | str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic exact dedup: keep the *minimum id* per key (so the
    survivor is well-defined, unlike dropDuplicates' arbitrary winner —
    required for oracle comparison).  Key defaults to the normalized-text
    fingerprint."""
    k = fingerprint(key) if isinstance(key, str) else key
    return (
        df.withColumn("__fp", k)
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("__fp")
    )


# ---------------------------------------------------------------------------
# shingling (shared by MinHash / Jaccard)
# ---------------------------------------------------------------------------

def word_shingles(text_col: str | Column = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingle set as an array<string> column —
    built-in ``transform`` over a sequence of start offsets, JVM-side."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.split(F.trim(F.lower(c)), r"\s+")
    n_sh = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), n_sh - 1)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    )


# ---------------------------------------------------------------------------
# E2: MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures as ``num_hashes`` long columns ``mh_0..mh_{H-1}``:
    for hash i, the minimum of ``xxhash64(shingle, seed+i)`` over the doc's
    shingle set.

    Shape: explode shingles → per-row xxhash64 for each hash function →
    groupBy(id) min-agg.  Each hash computes once per (shingle, i); the
    min-agg combines map-side, so the shuffle carries one signature row per
    document — the layout that scales (a single nested
    array_min(transform(...))×H expression recomputes the shingle array H
    times and blows up codegen; measured 30× slower).
    """
    exploded = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_n)).alias("__sh")
    )
    mins = [
        F.min(F.xxhash64("__sh", F.lit(seed + i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*mins)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH.

    signature (num_hashes) → ``bands`` bands of rows = num_hashes/bands →
    band-hash → self-equi-join on (band_idx, band_hash).  Two docs become a
    candidate iff they collide in ≥1 band — the classic S-curve.  Returns
    distinct (id_a, id_b) with id_a < id_b.

    Scale: the only shuffles are the signature groupBy and the equi-join on
    band hash; band buckets are small for non-pathological corpora.  A hot
    bucket (boilerplate text) is AQE skew-join territory; 'dedupe near-exact
    first' is the operational fix.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, shingle_n, num_hashes, seed)
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    **lsh_kwargs,
) -> DataFrame:
    """Full near-dup dedup: LSH candidates → exact Jaccard verify → drop the
    higher id of every verified pair.  Returns the surviving rows.

    Transitivity note: we drop any doc that is the greater id in some
    verified pair (greedy, not connected-components — identical policy to
    common corpus-dedup pipelines; CC is a multi-round join loop we can add
    when needed).
    """
    cands = minhash_lsh_candidates(df, id_col, text_col, **lsh_kwargs)
    verified = jaccard_verify(df, cands, id_col, text_col, lsh_kwargs.get("shingle_n", 3))
    losers = (
        verified.filter(F.col("jaccard") >= jaccard_threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(losers, on=id_col, how="left_anti")


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs: two broadcast-friendly
    equi-joins to attach shingle sets, then array_intersect/union sizes —
    all JVM-side."""
    sh = df.select(
        F.col(id_col), word_shingles(text_col, shingle_n).alias("__sh")
    )
    out = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
    )
    return out.select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for modest candidate sets / oracle checking)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via shingle inverted index: explode
    shingles → self-equi-join on shingle → count shared per pair → Jaccard
    from |A∩B| / (|A|+|B|−|A∩B|).

    This is the *exact* version of what LSH approximates; the join is on
    shingle value (equi-join), so only pairs sharing ≥1 shingle ever meet —
    still quadratic in the worst case, which is exactly why minhash_lsh_*
    is the scale path (documented tradeoff).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("sh"),
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, on=[F.col("a.sh") == F.col("b.sh"), F.col("a.id") < F.col("b.id")])
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_shared") / (F.col("sz_a") + F.col("sz_b") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    seed: int = 42,
) -> DataFrame:
    """64-bit SimHash per document as a ``simhash`` long column.

    For each bit b: sum over shingles of ±1 according to bit b of
    ``xxhash64(shingle)``; bit b of the signature = sign of the sum.
    Shape: explode shingles → one ±1 indicator per bit → groupBy(id)
    sum-agg → pack bits.  ``shiftleft`` (never a Python ``1 << 63`` literal,
    which overflows a JVM long) assembles the signature.
    """
    exploded = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, 2)).alias("__sh")
    ).select(F.col(id_col), F.xxhash64("__sh", F.lit(seed)).alias("__h"))
    # long format: one row per (doc, bit) — keeps every expression tiny
    # (a 64-wide agg + 64-term signature expression compiles ~50s of codegen;
    # this shape runs in constant small time and scales the same)
    per_bit = exploded.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("__b"),
        F.col("__h"),
    ).select(
        F.col(id_col),
        F.col("__b"),
        F.when(
            F.col("__h").bitwiseAND(F.expr("shiftleft(1L, __b)")) != 0, F.lit(1)
        ).otherwise(F.lit(-1)).alias("__c"),
    )
    bit_sums = per_bit.groupBy(id_col, "__b").agg(F.sum("__c").alias("__s"))
    return bit_sums.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("__s") > 0, F.expr("shiftleft(1L, __b)")).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Near-dup candidates by SimHash banding: split the 64-bit signature
    into ``bands`` 16-bit bands; docs sharing any band value are candidates
    (catches Hamming distance < bands).  Same equi-join shape as MinHash-LSH."""
    bits_per = 64 // bands
    sigs = simhash_signatures(df, id_col, text_col, 64, seed)
    banded = sigs.withColumnRenamed("simhash", "__sig").select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("__sig"), b * bits_per)
                        .bitwiseAND(F.lit((1 << bits_per) - 1))
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
