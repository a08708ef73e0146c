"""Deterministic splits & stratified sampling (training-data pipeline ops).

The reference has no sampling surface; these are EXT operators
(BASELINE.json north star).  Design rule: splits must be (a) deterministic
across runs/retries/speculative tasks and (b) engine-portable, so the
assignment is a pure function of the row's id — md5 hex, not rand() and not
an engine-specific hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: str | Column, chars: int = 2) -> Column:
    """First ``chars`` hex chars of md5(id-as-string): a uniform bucket in
    [0, 16^chars) that any engine with md5() reproduces exactly."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(c.cast("string")), 1, chars)


def hash_split(
    df: DataFrame,
    id_col: str,
    threshold_hex: str = "cc",
    labels: tuple[str, str] = ("train", "test"),
) -> DataFrame:
    """Deterministic train/test split: rows whose md5 bucket sorts below
    ``threshold_hex`` go to ``labels[0]``.  'cc' ≈ 204/256 ≈ 79.7% train.
    Stable under retries and identical in any md5-capable engine (the oracle
    runs the same expression in DuckDB)."""
    b = hash_bucket(id_col, len(threshold_hex))
    return df.withColumn(
        "split", F.when(b < threshold_hex, labels[0]).otherwise(labels[1])
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): seeded, no shuffle —
    each task filters its own partition.  Approximate counts by design;
    checked by property (per-stratum rate within tolerance), not oracle."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def deterministic_reservoir(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int,
) -> DataFrame:
    """Exactly-k uniform sample per group, deterministically: keep the k
    rows with the smallest md5(id) in each group.  Because md5 is uniform
    on ids, rank-by-hash ≡ a without-replacement reservoir — but unlike a
    true reservoir it is a pure function of the data: identical across
    runs, retries, partitionings, and engines (oracle runs the same
    expression).  One shuffle on the group keys; the window's sort input is
    per-group.  For heavy-hitter groups at 100 TB, pre-filter with an
    approximate per-group threshold before the window to cut the sort.
    """
    from pyspark.sql import Window

    c = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(c.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def hash_stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sampling — the dataset-mixture primitive of a
    training pipeline ('keep 100% of lang X, 20% of lang Y').

    Unlike ``sampleBy`` (seeded RNG per task: approximate and engine-
    specific), membership is a pure function of the row id: keep the row iff
    its md5 bucket (2 bytes → 16-bit uniform) falls below fraction·65536.
    Exactly reproducible across runs, retries, speculative tasks, and any
    md5-capable engine (the oracle runs the same expression in DuckDB).
    Still filter-only — no shuffle, predicate runs map-side.
    """
    bucket16 = F.conv(hash_bucket(id_col, 4), 16, 10).cast("long")
    frac = F.lit(default_fraction)
    for value, p in fractions.items():
        frac = F.when(F.col(strata_col) == value, F.lit(p)).otherwise(frac)
    return df.where(bucket16 < frac * 65536)


def temperature_mixture_weights(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled sampling weights per group — the multilingual
    alpha-sampling rule (p_g proportional to n_g^alpha, Conneau & Lample
    2019; alpha<1 upweights low-resource groups, alpha=1 is proportional).
    Returns per-group token counts, raw weight and the normalized sampling
    probability.  Group table is tiny (|groups| rows); the normalizer joins
    in as a broadcast 1-row aggregate — never a driver collect."""
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).alias("n_tokens"),
    )
    per = per.withColumn("w", F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)))
    tot = per.agg(F.sum("w").alias("tot"))
    return per.join(F.broadcast(tot)).select(
        group_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("w") / F.col("tot"), 6).alias("sample_prob"),
    )


def token_budget_trim(
    df: DataFrame,
    token_budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Trim each group to a per-group token budget: rows are admitted in
    deterministic md5(id) order (engine-portable, uniform — an unbiased
    without-replacement draw, same rule as :func:`deterministic_reservoir`)
    until the group's running token total exceeds the budget.  The document
    that crosses the budget line is excluded.

    One shuffle on the group key; the running sum is a window cumsum over
    the per-group hash order.  At 100 TB pre-aggregate per (group, bucket)
    first if groups are huge — the admitted prefix is hash-ordered, so a
    coarse bucket-level cumsum can bound the scan before the row-level
    window."""
    from pyspark.sql import Window

    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    h = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__nt", n_tokens)
        .withColumn("__cum", F.sum("__nt").over(w))
        .where(F.col("__cum") <= token_budget)
        .drop("__nt", "__cum")
    )


def assign_training_shards(
    df: DataFrame,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every document to a training shard of ~``tokens_per_shard``
    whitespace tokens — the trainer-facing layout step after curation: a
    shard is the unit a data loader streams, so shards must be
    near-equal-token, deterministic across runs/retries, and documents
    must never split.  A document's shard is the shard containing its
    START offset in the global md5(id)-ordered token stream (boundary
    documents straddle into the next shard rather than splitting — the
    standard pack-then-overflow rule).

    Returns ``df`` + ``(n_tokens, shard)``.  Deterministic and
    engine-portable: the order key is md5 of the id, so the DuckDB
    oracle replays the exact assignment.

    100 TB shape — a global running sum WITHOUT a global window: a naive
    ``Window.orderBy(h)`` cumsum puts the whole corpus in ONE partition
    (the classic scale killer).  Instead, a TWO-LEVEL prefix sum:

      1. bucket = first 2 md5 hex chars (256 uniform buckets);
      2. within-bucket cumsum — a window PARTITIONED by bucket (one
         shuffle, 256-way parallel);
      3. bucket offsets — the 256-row per-bucket totals cumsum'd in a
         result-shaped window and broadcast back.

    global_cum = bucket_offset + within_cum; shard = (global_cum −
    n_tokens) DIV tokens_per_shard (integer division — exact in both
    engines)."""
    from pyspark.sql import Window

    if tokens_per_shard <= 0:
        raise ValueError("assign_training_shards: tokens_per_shard must be > 0")
    h = F.md5(F.col(id_col).cast("string"))
    # count non-empty split elements: trailing/leading whitespace (incl.
    # '\n'/'\t', which F.trim's ASCII-space-only strip misses) yields
    # empty elements that a bare size() counts as phantom tokens (ADVICE
    # r8), and a whitespace-ONLY text must count 0, not 1 (r9 review) —
    # this matches Python's text.strip().split() on every input whose
    # whitespace is ASCII (Java regex \s is ASCII-only, while Python
    # str.split() also splits Unicode whitespace like U+00A0 — ADVICE
    # r9; the DuckDB oracle's \s is the same ASCII class, so the two
    # ENGINES agree on all inputs, and the pytest reference model keeps
    # its alphabet ASCII-whitespace-only to match)
    d = df.withColumn(
        "__nt",
        F.size(
            F.filter(
                F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
            )
        ).cast("long"),
    ).withColumn("__b", F.substring(h, 1, 2))
    w_in = (
        Window.partitionBy("__b")
        .orderBy(h.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__wcum", F.sum("__nt").over(w_in))
    w_off = Window.orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )  # 256 rows — result-shaped
    offsets = (
        d.groupBy("__b")
        .agg(F.sum("__nt").alias("__bt"))
        .withColumn("__boff", F.coalesce(F.sum("__bt").over(w_off), F.lit(0)))
        .select("__b", "__boff")
    )
    out = d.join(F.broadcast(offsets), "__b")
    return out.select(
        *df.columns,
        F.col("__nt").alias("n_tokens"),
        # BIGINT, not INT: at 100 TB scale the shard id passes 2^31 around
        # ~4.3T tokens at tokens_per_shard=2000, and a non-ANSI INT cast
        # would wrap silently into negative shards (ADVICE r8)
        F.expr(
            f"CAST((__boff + __wcum - __nt) DIV {int(tokens_per_shard)} "
            "AS BIGINT)"
        ).alias("shard"),
    )
