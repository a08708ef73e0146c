"""Text-analysis operators for LLM-data pipelines (EXT E4, SURVEY §2.10):
token counting, length/quality metrics, language-ID heuristic, document
fingerprinting, per-language/source corpus stats.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs.  Each helper adds columns or
aggregates; nothing collects.

Fixture: ``documents(doc_id, text, lang, source, n_chars)`` (FIXTURES.md §1).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhouse_flatfile_tool_spark.partitioning import ensure_parallelism

# whitespace tokenization + a BPE-ish wordpiece regex for subword-level counts
_WS_SPLIT = r"\s+"
# "word-ish runs or single non-space symbol" — approximates BPE pre-tokenization
_BPE_ISH = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"

_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "from", "this",
]


def token_count(col: str | Column = "text") -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), _WS_SPLIT))


def bpe_ish_token_count(col: str | Column = "text") -> Column:
    """Subword-ish token count: count of regex pre-token matches.

    ``regexp_count`` is JVM-side; ~the pre-tokenization pass of a BPE
    tokenizer (real BPE merge tables are model-specific and out of scope).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(_BPE_ISH))


def with_text_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add per-document metrics: char length, token counts, average word
    length, punctuation ratio, stopword ratio, uppercase ratio."""
    c = F.col(text_col)
    n_tokens = token_count(text_col)
    words = F.split(F.trim(F.lower(c)), _WS_SPLIT)
    stop_hits = F.size(F.array_intersect(words, F.array(*[F.lit(s) for s in _STOPWORDS])))
    n_chars = F.length(c)
    return (
        ensure_parallelism(df).withColumn("n_chars_m", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("n_bpe_tokens", bpe_ish_token_count(text_col))
        .withColumn(
            "avg_word_len",
            (F.length(F.regexp_replace(c, _WS_SPLIT, "")) / F.greatest(n_tokens, F.lit(1))),
        )
        .withColumn(
            "punct_ratio",
            F.regexp_count(c, F.lit(r"[^\w\s]")) / F.greatest(n_chars, F.lit(1)),
        )
        # distinct-stopword hits / distinct words — a cheap lexical-diversity proxy
        .withColumn(
            "stopword_ratio",
            stop_hits / F.greatest(F.size(F.array_distinct(words)), F.lit(1)),
        )
        .withColumn(
            "upper_ratio",
            F.regexp_count(c, F.lit(r"[A-Z]")) / F.greatest(n_chars, F.lit(1)),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]: rewards mid-length docs and typical
    word lengths, penalizes punctuation soup.  Deliberately simple and fully
    codegen-able; a real pipeline would swap in a model scorer via pandas UDF
    (see operators/multimodal.py for that pattern)."""
    m = with_text_metrics(df, text_col)
    length_score = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    word_len_score = 1.0 - F.least(
        F.abs(F.col("avg_word_len") - F.lit(5.0)) / F.lit(5.0), F.lit(1.0)
    )
    punct_penalty = F.least(F.col("punct_ratio") * F.lit(4.0), F.lit(1.0))
    return m.withColumn(
        "quality_score",
        F.round(
            0.5 * length_score + 0.4 * word_len_score + 0.1 * (1.0 - punct_penalty), 6
        ),
    )


# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic.  Real pipelines use fastText/CLD3; those models aren't in this
# container, and the fixture's lang column lets us validate the plumbing.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
}


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: count marker-word hits per language, take the
    argmax ('und' = undetermined, CLD-style, when nothing matches).  CJK gets
    a script check first (no spaces to tokenize)."""
    words = F.split(F.trim(F.lower(F.col(text_col))), _WS_SPLIT)
    scores = [
        F.struct(
            F.size(F.array_intersect(words, F.array(*[F.lit(m) for m in marks]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, marks in _LANG_MARKERS.items()
    ]
    best = F.array_max(F.array(*scores))
    cjk = F.regexp_count(F.col(text_col), F.lit(r"[一-鿿]"))
    return df.withColumn(
        "lang_pred",
        F.when(cjk > 0, F.lit("zh")).otherwise(
            F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("und"))
        ),
    )


def fingerprint(col: str | Column = "text") -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-normalized,
    lowercased text.  Content-defined (rolling-hash-style normalization
    before hashing) so trivial whitespace/case edits collide — the exact-dup
    detector's key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), _WS_SPLIT, " "))


def rolling_fingerprint(col: str | Column = "text", base: int = 1_000_003) -> Column:
    """Polynomial rolling-hash fingerprint over the normalized word sequence —
    order-sensitive (unlike a bag-of-words hash), whitespace/case-insensitive,
    pure codegen via built-in ``aggregate``.  Two independent 31-bit rolling
    hashes (mod 2³¹, different word-hash seeds — ANSI-safe, no long overflow)
    packed into one 62-bit value, so collision odds are ~2⁻⁶².  The rolling
    form is the building block for content-defined chunking."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(F.lower(c)), _WS_SPLIT)
    m = F.lit(2_147_483_647).cast("long")  # 2^31 - 1

    def roll(seed: int) -> Column:
        return F.aggregate(
            words,
            F.lit(0).cast("long"),
            lambda acc, w: F.pmod(
                acc * F.lit(base).cast("long") + F.pmod(F.xxhash64(w, F.lit(seed)), m), m
            ),
        )

    return F.shiftleft(roll(0), 31) + roll(1)


def corpus_stats(df: DataFrame, group_cols: list[str] = ["lang"]) -> DataFrame:
    """Per-language/source corpus statistics (E4): doc counts, token/char
    totals and means.  One shuffle on the group keys; partial agg map-side."""
    m = df.withColumn("n_tokens", token_count("text"))
    return m.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# Gopher-style rule thresholds (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1 — public
# paper).  Tuned down for the fixture's short docs; parameterized anyway.
_GOPHER_STOPWORDS = ["the", "a", "and", "of", "to"]


def gopher_quality_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style rules quality filter: one boolean column per rule plus
    the conjunction ``gopher_pass`` — the standard pretraining-corpus gate
    (word-count bounds, mean word length bounds, symbol-to-char ratio,
    alphabetic-word fraction, stopword presence).

    Differs from :func:`with_quality_score` (a scalar score for ranking):
    rules are hard gates with per-rule attribution, so a pipeline can report
    WHY documents were dropped.  All built-in expressions, fully codegen —
    at 100 TB this is a mapper with zero shuffle.
    """
    c = F.col(text_col)
    words = F.split(F.trim(F.lower(c)), _WS_SPLIT)
    n_words = F.size(words)
    mean_wl = F.length(F.regexp_replace(c, _WS_SPLIT, "")) / F.greatest(
        n_words, F.lit(1)
    )
    symbol_ratio = F.regexp_count(c, F.lit(r"[^\w\s]")) / F.greatest(
        F.length(c), F.lit(1)
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    alpha_ratio = alpha_words / F.greatest(n_words, F.lit(1))
    stop_hits = F.size(
        F.array_intersect(words, F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]))
    )
    out = (
        df.withColumn("n_words", n_words)
        .withColumn("r_word_count", (n_words >= min_words) & (n_words <= max_words))
        .withColumn(
            "r_mean_word_len",
            (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len),
        )
        .withColumn("r_symbol_ratio", symbol_ratio <= max_symbol_ratio)
        .withColumn("r_alpha_ratio", alpha_ratio >= min_alpha_word_ratio)
        .withColumn("r_stopwords", stop_hits >= min_stopword_hits)
    )
    return out.withColumn(
        "gopher_pass",
        F.col("r_word_count")
        & F.col("r_mean_word_len")
        & F.col("r_symbol_ratio")
        & F.col("r_alpha_ratio")
        & F.col("r_stopwords"),
    )


def c4_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
    keep_text: bool = False,
) -> DataFrame:
    """C4-style cleaning (Raffel et al. 2020, "Exploring the Limits of
    Transfer Learning…" §2.2 — public paper): LINE-level retention (keep
    only lines that end in terminal punctuation, have ≥ ``min_line_words``
    words, and don't mention javascript) plus PAGE-level gates (≥
    ``min_sentences`` sentences after cleaning, no ``{``, no
    "lorem ipsum").  Returns (id, clean_text, n_lines_kept, n_sentences,
    per-rule booleans, c4_pass).

    Complements :func:`gopher_quality_rules` (statistical gates) with the
    C4 heuristic bundle; the three-sentence-span dedup half of C4 is the
    :mod:`dedup` paragraph/span machinery.  All built-in higher-order
    array expressions — zero shuffle, a pure mapper at 100 TB.

    ``keep_text=True`` keeps the original ``text_col`` in the output so a
    caller that gates-and-continues can ``filter(c4_pass)`` in place
    instead of semi-joining the flags back to its input — the join form
    references the upstream plan twice, which compounds exponentially in
    composed funnels (the pipeline_incremental 19k-line-plan finding,
    OPTIMIZATION_r11.md)."""
    c = F.col(text_col)
    lines = F.split(c, "\n")
    kept = F.filter(
        lines,
        lambda ln: F.trim(ln).rlike(r'[.!?"]$')
        & (F.size(F.split(F.trim(ln), _WS_SPLIT)) >= min_line_words)
        & ~F.lower(ln).contains("javascript"),
    )
    clean = F.array_join(kept, "\n")
    n_sent = F.regexp_count(clean, F.lit(r"[.!?]"))
    out = (
        df.select(id_col, text_col)
        .withColumn("clean_text", clean)
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn("n_sentences", n_sent)
        .withColumn("r_min_sentences", n_sent >= min_sentences)
        .withColumn("r_no_brace", ~c.contains("{"))
        .withColumn("r_no_lorem", ~F.lower(c).contains("lorem ipsum"))
    )
    out = out.withColumn(
        "c4_pass",
        F.col("r_min_sentences") & F.col("r_no_brace") & F.col("r_no_lorem"),
    )
    return out if keep_text else out.drop(text_col)


# ---------------------------------------------------------------------------
# PII redaction & chunking (training-data pipeline ops)
# ---------------------------------------------------------------------------

# deliberately RE2-compatible (no backrefs/lookaround) so the exact same
# pattern runs on Spark (java.util.regex) and any RE2 engine
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Scrub PII-shaped substrings: adds ``redacted`` (the scrubbed text)
    and ``n_pii`` (matches found).  Pure JVM regex — whole-stage codegen,
    no UDF, linear scan per row."""
    pats = patterns or [(EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>")]
    c = F.col(text_col)
    n = F.lit(0)
    red = c
    for pat, repl in pats:
        n = n + F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        red = F.regexp_replace(red, pat, repl)
    return df.withColumn("redacted", red).withColumn("n_pii", n.cast("long"))


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 200,
    overlap: int = 50,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Split each document into fixed-width character chunks with overlap —
    the standard pre-embedding chunking step.  ``explode(sequence(...))``
    keeps everything JVM-side; output rows ≈ len/stride per doc, computed
    without ever materializing a per-doc array of chunk strings (the
    substring happens after the explode)."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    keep = id_cols or [c for c in df.columns if c != text_col]
    n_chunks_minus1 = F.floor((F.length(text_col) - 1) / stride).cast("int")
    out = (
        df.filter(F.length(text_col) > 0)
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks_minus1)))
        .withColumn(
            "chunk",
            F.expr(f"substring({text_col}, chunk_id * {stride} + 1, {chunk_size})"),
        )
    )
    return out.select(*keep, F.col("chunk_id").cast("long").alias("chunk_id"), "chunk")


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_chars: int = 2,
) -> DataFrame:
    """Concat-and-chunk sequence packing — assign each document to the
    fixed-token-budget training window its starting offset falls in (the
    GPT-style pretraining layout: concatenate the stream, cut every
    ``budget_tokens``; boundary documents span two windows, intra-document
    splitting is :func:`chunk_text`'s job).

    Scale shape: a GLOBAL running sum would serialize on one task, so docs
    first land in one of 16^``bucket_chars`` deterministic md5 buckets
    (portable — same expression runs in the DuckDB oracle) and the running
    sum is a window per bucket ordered by id.  Each bucket packs
    independently — embarrassingly parallel, one shuffle on the bucket key —
    at the cost of one partially-filled tail window per bucket (negligible:
    tail waste ≤ buckets·budget tokens, vs ~10¹¹ tokens at 100 TB).

    Returns (id, bucket, pack_seq, n_tokens): pack_seq is the window index
    within the bucket.
    """
    from pyspark.sql import Window

    from clickhouse_flatfile_tool_spark.operators.sampling import hash_bucket

    d = df.select(
        F.col(id_col),
        hash_bucket(id_col, bucket_chars).alias("bucket"),
        token_count(text_col).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start_offset = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return d.select(
        id_col,
        "bucket",
        F.floor(start_offset / budget_tokens).cast("long").alias("pack_seq"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


def pack_best_fit(
    df: DataFrame,
    budget_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_chars: int = 2,
) -> DataFrame:
    """Best-fit-decreasing document packing: WHOLE documents into
    fixed-token-budget bins, no document ever split across a training
    window — the truncation-free alternative to :func:`pack_sequences`
    (Ding et al. 2024, "Fewer Truncations Improve Language Modeling",
    which reports FFD packing preserving ~99%+ of documents intact vs
    concat-and-chunk's splits).

    Scale shape: packing is inherently sequential, so docs land in
    16^``bucket_chars`` deterministic md5 buckets (same layout as
    :func:`pack_sequences`) and each bucket runs best-fit-decreasing
    independently inside one ``applyInPandas`` group — Arrow-batched,
    embarrassingly parallel, one shuffle on the bucket key.  Per-bucket
    state is a sorted residual list, O(n log n) sort + O(n·bins)
    placement on docs/16^chars rows; raise ``bucket_chars`` until a
    bucket fits comfortably in one task (at 100 TB with chars=4 a bucket
    is ~1/65536 of the corpus).  Waste is bounded per bucket, and FFD is
    within 11/9·OPT + 1 bins of optimal (classic bound).

    A document longer than the budget gets a bin of its own (flagged
    ``oversize``); callers decide whether to chunk those with
    :func:`chunk_text` first.

    Returns (id, bucket, n_tokens, bin_id, oversize): ``bin_id`` is
    dense within each bucket in decreasing-fill order; determinism comes
    from sorting docs by (n_tokens DESC, id) before placement.
    """
    import bisect

    import pandas as pd

    from clickhouse_flatfile_tool_spark.operators.sampling import hash_bucket

    d = df.select(
        F.col(id_col),
        hash_bucket(id_col, bucket_chars).alias("bucket"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )
    id_type = dict(d.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, bucket string, n_tokens long, "
        "bin_id long, oversize boolean"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        residuals: list[int] = []  # sorted ascending
        res_bin: list[int] = []    # bin id aligned with residuals
        bins = 0
        assigned = []
        oversize = []
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > budget_tokens:
                assigned.append(bins)
                oversize.append(True)
                bins += 1  # oversize bin is never reused
                continue
            i = bisect.bisect_left(residuals, n)
            if i < len(residuals):
                # best fit: the tightest residual that still fits
                r = residuals.pop(i)
                b = res_bin.pop(i)
                r -= n
                j = bisect.bisect_left(residuals, r)
                residuals.insert(j, r)
                res_bin.insert(j, b)
                assigned.append(b)
            else:
                r = budget_tokens - n
                j = bisect.bisect_left(residuals, r)
                residuals.insert(j, r)
                res_bin.insert(j, bins)
                assigned.append(bins)
                bins += 1
            oversize.append(False)
        pdf["bin_id"] = pd.Series(assigned, dtype="int64")
        pdf["oversize"] = pd.Series(oversize, dtype="bool")
        return pdf

    return d.groupBy("bucket").applyInPandas(_pack, out_schema)


def unigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean unigram surprisal −mean(ln p(w)) against the
    corpus's own unigram distribution — the cheap stand-in for the LM
    perplexity filter of CCNet-style pipelines (docs far from the corpus
    distribution score high; boilerplate scores low).

    Shape: one exploded token pass builds the frequency table (groupBy word,
    map-side partials); the corpus total joins in as a broadcast 1-row
    aggregate (never a driver count); the per-doc score is a second groupBy
    over the SAME exploded tokens joined to the frequency table — at 100 TB
    the frequency table is the only reused state and it is |vocab|-sized,
    not corpus-sized.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), _WS_SPLIT)).alias("w"),
    )
    freqs = toks.groupBy("w").agg(F.count(F.lit(1)).alias("wf"))
    total = freqs.agg(F.sum("wf").alias("tot"))
    scored = (
        toks.join(freqs, "w")
        .join(F.broadcast(total))
        .select(F.col(id_col), (-F.log(F.col("wf") / F.col("tot"))).alias("s"))
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("s"), 6).alias("mean_surprisal"),
        F.count(F.lit(1)).alias("n_tokens"),
    )


def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Shannon entropy of each document's character distribution (nats) —
    the standard gibberish/encoding-noise detector: natural text sits in a
    narrow entropy band, base64 blobs and mojibake above it, repeated-char
    padding below.

    Shape: explode to (doc, char) — a map-side generate, no shuffle — then
    ONE groupBy (doc, char) with partial aggregation and a per-doc combine;
    p·ln p sums over ≤ |alphabet| terms per document.
    """
    chars = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "")).alias("__c"),
    ).where(F.length("__c") == 1)
    counts = chars.groupBy(id_col, "__c").agg(F.count(F.lit(1)).alias("__n"))
    per_doc = counts.groupBy(id_col).agg(
        F.sum("__n").alias("__tot"),
        F.collect_list(F.struct("__c", "__n")).alias("__cs"),
    )
    p = lambda n: n.cast("double") / F.col("__tot")  # noqa: E731
    h = F.aggregate(
        F.col("__cs"),
        F.lit(0.0),
        lambda acc, s: acc - p(s["__n"]) * F.log(p(s["__n"])),
    )
    return per_doc.select(
        F.col(id_col),
        F.col("__tot").cast("long").alias("n_chars_counted"),
        F.round(h, 6).alias("char_entropy"),
    )


def bigram_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean conditional bigram surprisal
    −mean(ln p(wᵢ | wᵢ₋₁)) against the corpus's own bigram MLE
    p(b|a) = count(a b) / count(a ·) — one modeling level above
    :func:`unigram_surprisal` (context-aware: a token is cheap when its
    predecessor predicts it), the closer stand-in for the KenLM perplexity
    gate of CCNet-style pipelines.

    Shape: one exploded bigram pass builds the bigram table (groupBy,
    map-side partials); head totals derive from the bigram table itself
    (vocab-sized, never re-scans the corpus); the per-doc score joins the
    SAME exploded bigrams to both tables.  Both model tables are
    vocabulary-sized — the only reused state at 100 TB.  Documents with
    fewer than 2 tokens have no bigrams and are excluded.
    """
    words = F.split(F.trim(F.lower(F.col(text_col))), _WS_SPLIT)
    base = df.select(F.col(id_col), words.alias("__w")).where(F.size("__w") >= 2)
    n_bg = F.size(F.col("__w")) - 1
    bigrams = F.transform(
        F.arrays_zip(
            F.slice(F.col("__w"), 1, n_bg), F.slice(F.col("__w"), 2, n_bg)
        ),
        lambda s: F.concat_ws(" ", s["0"], s["1"]),
    )
    bgs = base.select(F.col(id_col), F.explode(bigrams).alias("bg"))
    bgc = bgs.groupBy("bg").agg(F.count(F.lit(1)).alias("n_ab"))
    heads = bgc.groupBy(F.substring_index("bg", " ", 1).alias("__h")).agg(
        F.sum("n_ab").alias("n_h")
    )
    scored = (
        bgs.join(bgc, "bg")
        .withColumn("__h", F.substring_index("bg", " ", 1))
        .join(heads, "__h")
        .select(F.col(id_col), (-F.log(F.col("n_ab") / F.col("n_h"))).alias("s"))
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("s"), 6).alias("mean_surprisal"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )


# ---------------------------------------------------------------------------
# Repetition metrics & corpus TF-IDF (training-data quality signals)
# ---------------------------------------------------------------------------

def with_repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-line fraction,
    duplicate-word fraction, and the share of the most frequent word.

    All higher-order array functions (JVM-side, codegen); per-row cost is
    bounded by document length — the top-word count is the longest run of
    equal adjacent values in the SORTED word array (O(w log w) per doc; the
    naive per-distinct-word rescan is O(distinct·w), measured ~5× slower on
    the fixture expression and quadratic on long low-repetition docs).
    Embarrassingly parallel, shuffle-free.
    """
    c = F.col(text_col)
    lines = F.split(c, r"\n")
    words = F.split(F.trim(F.lower(c)), _WS_SPLIT)
    n_words = F.size(words)
    distinct_words = F.array_distinct(words)
    run_scan = F.aggregate(
        F.array_sort(words),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(w == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top_word_count = run_scan.best
    return (
        df.withColumn(
            "dup_line_frac",
            F.round(
                1 - F.size(F.array_distinct(lines)) / F.greatest(F.size(lines), F.lit(1)), 6
            ),
        )
        .withColumn(
            "dup_word_frac",
            F.round(1 - F.size(distinct_words) / F.greatest(n_words, F.lit(1)), 6),
        )
        .withColumn(
            "top_word_frac",
            F.round(top_word_count / F.greatest(n_words, F.lit(1)), 6),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
    min_len: int = 3,
) -> DataFrame:
    """Corpus-level TF-IDF term ranking: collection frequency × ln(N/df).

    One explode (map-side, no shuffle), then a single aggregation keyed by
    term computing collection frequency and exact document frequency; the
    corpus size N joins in via a broadcast of a 1-row aggregate (never a
    driver-side ``count()`` — the whole plan stays lazy and distributed).
    Top-k is TakeOrderedAndProject, ties broken by term for determinism.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), _WS_SPLIT)).alias("term"),
    ).where(F.length("term") >= min_len)
    stats = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("cf"),
        F.countDistinct(id_col).alias("df_docs"),
    )
    n_docs = df.agg(F.countDistinct(id_col).alias("n_docs"))
    scored = stats.join(F.broadcast(n_docs)).select(
        "term",
        "cf",
        "df_docs",
        F.round(F.col("cf") * F.log(F.col("n_docs") / F.col("df_docs")), 6).alias("tfidf"),
    )
    return scored.orderBy(F.desc("tfidf"), F.asc("term")).limit(k)


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    k: int = 50,
    min_count: int = 5,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information:
    PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ) with bigram/unigram probabilities
    from corpus counts; ``min_count`` suppresses the unstable tail.

    Bigrams come from zipped shifted slices of the materialized words array
    (constant references per row — the transform-over-sequence form
    re-evaluates the split per element, the measured O(tokens²) trap
    documented in dedup._shingles_from_words).  Corpus totals join in as
    broadcast 1-row aggregates; everything else is two hash aggregations
    and two equi-joins on the term.
    """
    words = F.split(F.trim(F.lower(F.col(text_col))), _WS_SPLIT)
    # four downstream consumers (bigram counts, unigram counts, two totals)
    # would each redo the regex split; materialize the token arrays once —
    # one pass over the text, everything after reads the checkpointed rows
    docs = (
        ensure_parallelism(df)
        .select(words.alias("__w"))
        .where(F.size("__w") >= 2)
        .localCheckpoint()
    )
    n_bg = F.size(F.col("__w")) - 1
    bigrams = docs.select(
        F.explode(
            F.transform(
                F.arrays_zip(
                    F.slice(F.col("__w"), 1, n_bg), F.slice(F.col("__w"), 2, n_bg)
                ),
                lambda s: F.concat_ws(" ", s["0"], s["1"]),
            )
        ).alias("bg")
    )
    unigrams = docs.select(F.explode("__w").alias("t"))
    bgc = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("n_ab")).where(
        F.col("n_ab") >= min_count
    )
    unic = unigrams.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
    totals = bigrams.agg(F.count(F.lit(1)).alias("n_bg_total")).join(
        unigrams.agg(F.count(F.lit(1)).alias("n_uni_total"))
    )
    a = unic.select(F.col("t").alias("t1"), F.col("n_t").alias("n_a"))
    b = unic.select(F.col("t").alias("t2"), F.col("n_t").alias("n_b"))
    scored = (
        bgc.join(F.broadcast(totals))
        .withColumn("t1", F.substring_index("bg", " ", 1))
        .withColumn("t2", F.substring_index("bg", " ", -1))
        .join(a, "t1")
        .join(b, "t2")
        .select(
            "bg",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") / F.col("n_bg_total"))
                    / (
                        (F.col("n_a") / F.col("n_uni_total"))
                        * (F.col("n_b") / F.col("n_uni_total"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("bg")).limit(k)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
) -> DataFrame:
    """Learn a BPE merge table over the corpus (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units") —
    the vocabulary-induction step of a training-data pipeline.

    Scale shape (the textbook trick): ONE corpus pass builds the
    word-frequency table, which is VOCAB-sized, and every merge iteration
    runs on that small table only — count weighted adjacent symbol pairs
    (explode + groupBy), take the most frequent (a 1-row driver action,
    the same documented iterative-decision pattern as
    ``dedup.connected_components``), then apply the merge with a greedy
    left-to-right fold (built-in ``aggregate``, no Python UDF).  Ties
    break deterministically by (count desc, left, right).

    Returns the merge table ``(rank, left, right, pair_count)`` — apply it
    in order to tokenize new text.
    """
    words = df.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), _WS_SPLIT)).alias("w")
    ).where(F.length("w") > 0)
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.split(F.col("w"), "").alias("syms"), "n")
        .select(F.filter("syms", lambda s: F.length(s) > 0).alias("syms"), "n")
        .localCheckpoint()
    )
    merges = []
    for rank in range(num_merges):
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.greatest(F.size("syms") - 1, F.lit(0))),
                    F.slice("syms", 2, F.greatest(F.size("syms") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            "n",
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rank, left, right, cnt))
        # greedy left-to-right merge of (left,right) in every word's symbols
        merged = F.aggregate(
            "syms",
            F.struct(
                F.array().cast("array<string>").alias("out"),
                F.lit("").alias("pend"),
            ),
            lambda acc, s: F.when(
                acc["pend"] == "", F.struct(acc["out"].alias("out"), s.alias("pend"))
            )
            .when(
                (acc["pend"] == left) & (s == right),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(left + right))).alias("out"),
                    F.lit("").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    s.alias("pend"),
                )
            ),
            lambda acc: F.when(
                acc["pend"] == "", acc["out"]
            ).otherwise(F.concat(acc["out"], F.array(acc["pend"]))),
        )
        vocab = vocab.select(merged.alias("syms"), "n").localCheckpoint()
    spark = df.sparkSession
    return spark.createDataFrame(
        merges or [], "rank int, left string, right string, pair_count long"
    )


def bpe_tokenize(
    df: DataFrame,
    merges_df: DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned BPE merge table (:func:`bpe_train`) to text: per
    word, start from characters and repeatedly merge the LOWEST-RANK
    adjacent pair present — the exact inference rule of the original
    algorithm.  The merge table is vocab-sized, so it collects to the
    driver and broadcasts like any small model; tokenization itself is an
    Arrow-batched ``mapInPandas`` (the documented model-scoring pattern —
    genuinely per-symbol sequential work no built-in expresses)."""
    from pyspark.sql import types as T

    ranks = {
        (r["left"], r["right"]): int(r["rank"])
        for r in merges_df.select("rank", "left", "right").collect()
    }
    bc = df.sparkSession.sparkContext.broadcast(ranks)
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()), False)]
    )

    def run(batches):
        rk = bc.value

        def word_tokens(word):
            syms = list(word)
            while len(syms) > 1:
                best, best_i = None, -1
                for i in range(len(syms) - 1):
                    r = rk.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best, best_i = r, i
                if best is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            return syms

        for pdf in batches:
            out = pdf.copy()
            out[out_col] = pdf[text_col].map(
                lambda t: [s for w in t.strip().lower().split() for s in word_tokens(w)]
            )
            yield out

    return df.mapInPandas(run, schema)


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 2,
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every corpus
    document by ``log p_target(doc) − log p_corpus(doc)`` under
    HASH-BUCKETED unigram language models of the target and raw corpus —
    the importance-resampling signal that upweights target-domain-looking
    documents without training a classifier.

    Buckets are the first ``hex_chars`` hex digits of ``md5(word)``
    (width = 16^hex_chars) — the same engine-portable bucket function the
    Count-Min sketch uses, so the whole computation is oracle-checkable.
    Both LMs are add-``smoothing`` smoothed over the bucket vocabulary.

    Scale shape: two O(width)-row bucket-count aggregations (map-side
    combined), their ratio table broadcast, then one map-side probe join
    per corpus token and a per-doc sum — no shuffle wider than
    (doc, bucket) pairs.  Returns ``(id, n_tokens, log_ratio)``.
    """
    width = 16 ** hex_chars

    def bucketed_words(df):
        return df.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), _WS_SPLIT)
            ).alias("w"),
        ).select(
            F.col(id_col),
            F.substring(F.md5("w"), 1, hex_chars).alias("b"),
        )

    def bucket_logprobs(df, name):
        counts = bucketed_words(df).groupBy("b").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        total = counts.agg(F.sum("cnt").alias(f"tot_{name}"))
        lp = counts.crossJoin(F.broadcast(total)).select(
            "b",
            F.log(
                (F.col("cnt") + F.lit(smoothing))
                / (F.col(f"tot_{name}") + F.lit(smoothing * width))
            ).alias(f"lp_{name}"),
        )
        # smoothed floor for buckets this LM never observed
        floor = total.select(
            F.log(
                F.lit(smoothing) / (F.col(f"tot_{name}") + F.lit(smoothing * width))
            ).alias(f"floor_{name}")
        )
        return lp, floor

    lp_t, floor_t = bucket_logprobs(target, "t")
    lp_c, floor_c = bucket_logprobs(corpus, "c")
    ratio = (
        lp_t.join(lp_c, "b", "full")
        .crossJoin(F.broadcast(floor_t))
        .crossJoin(F.broadcast(floor_c))
        .select(
            "b",
            (
                F.coalesce(F.col("lp_t"), F.col("floor_t"))
                - F.coalesce(F.col("lp_c"), F.col("floor_c"))
            ).alias("lr"),
        )
    )
    toks = bucketed_words(corpus)
    return (
        toks.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr").alias("log_ratio"),
        )
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
    form: str = "NFC",
    strip_accents: bool = False,
    lowercase: bool = False,
) -> DataFrame:
    """CCNet-style Unicode normalization: canonical form (NFC/NFKC), optional
    accent stripping (NFD → drop combining marks, the strip_accents
    convention DuckDB/ICU use), optional lowercase — the preprocessing pass
    every text-dedup pipeline runs before fingerprinting, since visually
    identical strings ('café' composed vs decomposed) otherwise hash apart.

    Spark has no built-in Unicode normalizer, so this is a scalar
    pandas_udf — Arrow-batched (ArrowEvalPython, the allowed UDF class;
    plan_audit rejects row-at-a-time BatchEvalPython), stateless, and
    embarrassingly parallel.  Differentially tested against DuckDB's ICU
    ``nfc_normalize``/``strip_accents`` in the driver oracle.
    """
    from pyspark.sql.functions import pandas_udf

    # NB: pd must be module-global — postponed annotation evaluation
    # (future-annotations) resolves the 'pd.Series' hint strings against
    # module globals when pandas_udf infers the eval type
    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        def f(x):
            if x is None:
                return None
            y = unicodedata.normalize(form, x)
            if strip_accents:
                y = "".join(
                    c
                    for c in unicodedata.normalize("NFD", y)
                    if unicodedata.category(c) != "Mn"
                )
            if lowercase:
                y = y.lower()
            return y

        return s.map(f)

    return df.withColumn(out_col, _norm(F.col(text_col)))


# tracking parameters stripped during URL canonicalization (the usual
# crawl-dedup list: UTM campaign tags + common click ids)
_TRACKING_PARAMS = [
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "ref",
]


def canonical_url(col: str | Column = "url") -> Column:
    """Canonical form of a URL for crawl deduplication: lowercase scheme +
    host, strip ``www.``, drop the fragment, drop tracking parameters
    (UTM/click ids), SORT the surviving query parameters (param order is
    not identity), and trim a trailing slash from the path.  Two fetches of
    the same resource then compare equal as strings — the key for
    exact_dedup/exact_dedup_by_policy over web corpora.

    Unparseable inputs (relative URLs, junk strings — parse_url returns
    NULL for scheme/host) fall back to the RAW string: NULL canonical keys
    would otherwise merge every malformed URL into one dedup group and
    silently drop all but one of those documents.

    All built-in expressions: parse_url parts + a filter/array_sort/
    array_join pipeline over the split query string — no UDF, codegen-safe.
    """
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.try_parse_url(c, F.lit("PROTOCOL")))
    host = F.regexp_replace(
        F.lower(F.try_parse_url(c, F.lit("HOST"))), r"^www\.", ""
    )
    path = F.regexp_replace(F.try_parse_url(c, F.lit("PATH")), r"/$", "")
    qs = F.try_parse_url(c, F.lit("QUERY"))
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.coalesce(qs, F.lit("")), "&"),
                lambda p: (p != "")
                & ~F.split(p, "=")
                .getItem(0)
                .isin(*_TRACKING_PARAMS),
            )
        ),
        "&",
    )
    built = F.concat(
        scheme,
        F.lit("://"),
        host,
        # PATH is NULL (not '') for bare 'scheme://host' URLs
        F.coalesce(path, F.lit("")),
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
    return F.coalesce(built, c)


def domain_suffix_chain(col: str | Column = "url") -> Column:
    """The host's domain-suffix chain: ``https://a.b.spam.com/x`` →
    ``['a.b.spam.com', 'b.spam.com', 'spam.com', 'com']``.  Lowercased,
    ``www.`` stripped (the canonical_url conventions); NULL host (junk
    input) → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.regexp_replace(
        F.lower(F.try_parse_url(c, F.lit("HOST"))), r"^www\.", ""
    )
    parts = F.split(host, r"\.")
    chain = F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(
            F.slice(parts, i, F.size(parts) - i + 1), "."
        ),
    )
    return F.coalesce(chain, F.array().cast("array<string>"))


def domain_filter(
    df: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Domain-blocklist filtering with parent-domain matching — the UT1 /
    RefinedWeb curation convention: a blocked ``spam.com`` also blocks
    every subdomain (``a.b.spam.com``), because block decisions attach to
    registrable domains while crawls carry arbitrary hosts.

    Adds a ``blocked`` boolean to ``df`` (callers filter or audit); a doc
    is blocked when ANY entry of its host's suffix chain appears in the
    blocklist.  Scale shape: the blocklist (UT1 is ~10⁶ domains — dim-
    sized at any corpus scale) lowercases, dedups, and BROADCASTS; the
    corpus side explodes each host into its ≤⌈host labels⌉ suffixes,
    probes the broadcast set map-only (LEFT SEMI), and the surviving
    blocked ids — a tiny set by curation assumption — broadcast back onto
    the corpus as the flag join, so the 100 TB side is never shuffled.
    Junk URLs (no host) are never blocked.
    """
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(domain_col)).alias("__bl")).distinct()
    )
    hit_ids = (
        df.select(
            F.col(id_col),
            F.explode(domain_suffix_chain(url_col)).alias("__sfx"),
        )
        .join(bl, F.col("__sfx") == F.col("__bl"), "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    out = df.join(F.broadcast(hit_ids), id_col, "left")
    return out.select(
        *[F.col(c) for c in df.columns],
        F.coalesce(F.col("__hit"), F.lit(False)).alias("blocked"),
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 4,
    boundary_hex: int = 1,
) -> DataFrame:
    """Content-defined chunking: split each document where the hash of the
    trailing ``window``-word context starts with ``boundary_hex`` hex zeros
    (expected chunk length ≈ 16^boundary_hex words).  Because boundaries
    depend only on LOCAL content, an insertion near the head re-chunks a
    constant number of chunks and every downstream chunk is byte-identical
    — the property that makes chunk-level dedup robust to edits, where
    fixed-size chunking shifts every boundary (the rsync/LBFS/FastCDC idea
    applied to words).

    One row per ``(id, chunk_idx, chunk_text, n_tokens)``.  All built-in
    array expressions (sequence/filter/zip_with/posexplode) over md5 —
    engine-portable, so the exact chunking oracles against DuckDB.
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), _WS_SPLIT)
    src = df.select(F.col(id_col), words.alias("__w"))
    w, n = F.col("__w"), F.size(F.col("__w"))
    zeros = "0" * boundary_hex
    # candidate boundary AFTER position i (i = window..n-1; a boundary at n
    # would only close the final chunk, which closes anyway)
    seq = F.when(n > window, F.sequence(F.lit(window), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bpos = F.filter(
        seq,
        lambda i: F.substring(
            F.md5(F.concat_ws(" ", F.slice(w, i - window + 1, window))),
            1,
            boundary_hex,
        )
        == zeros,
    )
    starts = F.concat(F.array(F.lit(1)), F.transform(bpos, lambda i: i + 1))
    ends = F.concat(bpos, F.array(n))
    spans = F.zip_with(
        starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))
    )
    return src.select(
        F.col(id_col), F.col("__w"), F.posexplode(spans).alias("chunk_idx", "sp")
    ).select(
        id_col,
        "chunk_idx",
        F.array_join(
            F.slice(w, F.col("sp.s"), F.col("sp.e") - F.col("sp.s") + 1), " "
        ).alias("chunk_text"),
        (F.col("sp.e") - F.col("sp.s") + 1).cast("long").alias("n_tokens"),
    )


def ccnet_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    rank documents PER LANGUAGE by unigram surprisal (the LM-perplexity
    stand-in, :func:`unigram_surprisal`) and split each language into
    equal head / middle / tail thirds — head = closest to the corpus
    distribution = the slice CCNet keeps for training, tail = the noisy
    slice that gets dropped or down-weighted.

    Ranking uses the ROUNDED (6 dp) score with an id tiebreak so bucket
    boundaries are engine-reproducible: the per-doc rounded surprisal is
    already oracle-proven identical, so ntile over (rounded, id) is too.
    Shape: the surprisal passes (vocab-sized model tables) + one ntile
    window per language partition — shuffle keyed by language; at corpus
    scale partition-skew by language is the known cost and the window
    carries only (id, score) pairs.
    """
    from pyspark.sql import Window

    s = unigram_surprisal(df, id_col, text_col)
    joined = df.select(F.col(id_col), F.col(lang_col)).join(s, id_col)
    w = Window.partitionBy(lang_col).orderBy(
        F.round("mean_surprisal", 6).asc(), F.col(id_col).asc()
    )
    tile = F.ntile(3).over(w)
    return joined.select(
        F.col(id_col),
        F.col(lang_col),
        F.round("mean_surprisal", 6).alias("surprisal"),
        F.when(tile == 1, F.lit("head"))
        .when(tile == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def nb_classifier_scores(
    df: DataFrame,
    positive: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 2,
    smoothing: float = 1.0,
) -> DataFrame:
    """fastText-style LINEAR quality classifier, trained closed-form as
    hash-bucketed multinomial naive Bayes — the model-based filter stage
    of DCLM/FineWeb-class pipelines (score docs with a cheap linear text
    classifier, keep the high scorers).  ``positive`` is a SQL boolean
    over the row defining the positive class (e.g. ``"lang = 'en'"``).

    score(doc) = log(N⁺/N⁻) + Σ_w [log p(bucket(w)|+) − log p(bucket(w)|−)]

    exactly the log-odds a multinomial NB classifier computes, and a
    linear model over hashed bag-of-words features — the same hypothesis
    class fastText-supervised fits by SGD, except training here IS two
    bucket-count aggregations (one corpus pass, vocabulary-sized model,
    no gradient loop) and deployment is a broadcast probe join.  Buckets
    are md5-hex prefixes (:func:`dsir_weights` convention) so the whole
    computation — training included — is engine-portable and
    oracle-checkable.  Returns ``(id, n_tokens, nb_score)``; docs with
    zero tokens are absent.

    Scale shape: two O(16^hex_chars)-row class-conditional count tables +
    one 1-row prior aggregate, broadcast; one exploded-token probe join
    with a per-doc sum (map-side combined).  Nothing wider than
    (doc, bucket) ever shuffles.
    """
    width = 16 ** hex_chars
    pos = F.expr(positive)
    toks = df.select(
        F.col(id_col),
        pos.alias("__pos"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), _WS_SPLIT)).alias("w"),
    ).select(
        F.col(id_col), "__pos", F.substring(F.md5("w"), 1, hex_chars).alias("b")
    )
    prior = df.select(
        F.log(
            F.sum(F.when(pos, 1).otherwise(0))
            / F.sum(F.when(pos, 0).otherwise(1))
        ).alias("__prior")
    )
    counts = toks.groupBy("b").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("cp"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("cn"),
    )
    totals = counts.agg(
        F.sum("cp").alias("tp"), F.sum("cn").alias("tn")
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("cp") + F.lit(smoothing)) / (F.col("tp") + F.lit(smoothing * width)))
            - F.log((F.col("cn") + F.lit(smoothing)) / (F.col("tn") + F.lit(smoothing * width)))
        ).alias("lo"),
    )
    return (
        toks.join(F.broadcast(model), "b")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lo").alias("__slo"))
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            "n_tokens",
            (F.col("__prior") + F.col("__slo")).alias("nb_score"),
        )
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """Zipf-law fit of the corpus token distribution: least-squares slope
    and intercept of ln(freq) on ln(rank) over the ``top_n`` most frequent
    tokens.  A healthy natural-language corpus sits near slope −1
    (Zipf 1949); corpora polluted by boilerplate or generated spam bend
    the curve — the one-number corpus-health probe that complements
    per-document quality scores.

    Plan: token explode + count (one shuffle), a bounded orderBy().limit
    (distributed top-k, top_n rows), rank via row_number on the limited
    frame only, then regr_slope/regr_intercept — never a full-vocab sort.
    Returns one row ``(n_tokens, slope, intercept)``.
    """
    from pyspark.sql.window import Window

    freq = (
        df.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = freq.orderBy(F.desc("freq"), F.asc("tok")).limit(top_n)
    # row_number on the already-limited frame: the unpartitioned window
    # touches ≤ top_n rows by construction
    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("tok"))),
    )
    xy = ranked.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    return xy.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.regr_slope("y", "x"), 6).alias("slope"),
        F.round(F.regr_intercept("y", "x"), 6).alias("intercept"),
    )


def pr_curve(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    quantize: int = 3,
) -> DataFrame:
    """Precision/recall curve points for a quality-classifier score against
    binary labels — the calibration readout used to pick a filtering
    threshold before a corpus-wide quality cut.  One point per distinct
    quantized score, scanning thresholds from the highest score down:
    ``precision = TP(≥t)/N(≥t)``, ``recall = TP(≥t)/P``.

    Scores are quantized to ``quantize`` decimals first, so the curve has
    at most 10^quantize + 1 points at ANY corpus size — the per-threshold
    aggregation is one groupBy shuffle and the cumulative pass is a window
    over the bounded threshold frame, not over rows.
    """
    from pyspark.sql.window import Window

    per_t = (
        scored.select(
            F.round(F.col(score_col).cast("double"), quantize).alias("t"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("tp"))
    )
    w = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total_pos = scored.select(
        F.sum(F.col(label_col).cast("long")).alias("p")
    ).collect()[0][0]
    cum = per_t.select(
        F.col("t").alias("threshold"),
        F.sum("tp").over(w).alias("__ctp"),
        F.sum("n").over(w).alias("__cn"),
    )
    return cum.select(
        "threshold",
        F.round(F.col("__ctp") / F.col("__cn"), 6).alias("precision"),
        F.round(F.col("__ctp") / F.lit(float(total_pos)), 6).alias("recall"),
    )


def strip_html(col: str | Column = "text") -> Column:
    """ClickHouse ``extractTextFromHTML`` analog: drop <script>/<style>
    blocks and comments, strip remaining tags, decode the common HTML
    entities, collapse whitespace — the Common-Crawl-style HTML→text
    cleanup stage of an LLM data pipeline (CCNet/C4 pre-filters operate
    on extracted text).

    Pure codegen regexp chain (RE2-compatible patterns — no
    backreferences, so the identical regexes run in the DuckDB oracle);
    CH's C++ parser additionally handles CDATA and malformed-tag
    recovery, so outputs can differ on pathological markup — use for
    corpus cleanup, not byte-parity with CH.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"<[^>]*>", " ")
    for ent, ch in (
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
        ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def string_similarity(
    df: DataFrame,
    col_a: str,
    col_b: str,
    prefix: str = "sim_",
) -> DataFrame:
    """Jaro similarity, Jaro-Winkler similarity, and (full, unrestricted)
    Damerau-Levenshtein distance between two string columns — ClickHouse's
    ``jaroSimilarity`` / ``jaroWinklerSimilarity`` /
    ``damerauLevenshteinDistance`` (reference surface: anything ClickHouse
    itself evaluates behind the tool's SQL endpoint, server/server.js:817).

    Semantics pinned to the textbook definitions DuckDB also implements
    (the driver oracle runs DuckDB's ``jaro_similarity`` /
    ``jaro_winkler_similarity`` / ``damerau_levenshtein`` natives):

    * Jaro: match window ``max(|a|,|b|)//2 - 1``, transpositions counted
      over matched sequences; either string empty -> 0.0 (DuckDB's edge;
      some texts define both-empty as 1.0).
    * Jaro-Winkler: boost ``j + l*0.1*(1-j)`` with the CLASSIC 0.7
      threshold (no boost when jaro <= 0.7 — DuckDB and CH both keep
      it), common-prefix length capped at 4.
    * Damerau-Levenshtein: FULL variant (transposed characters may be
      edited further, so d('CA','ABC') = 2), not the restricted
      optimal-string-alignment one.

    Spark has no built-in for any of the three, so this is one scalar
    Arrow-batched pandas_udf producing a struct (ArrowEvalPython — the
    allowed UDF class); everything else in the plan stays JVM-side.  At
    100 TB the op is stateless and embarrassingly parallel: no shuffle,
    no state, linear in rows x O(|a|*|b|) per pair — callers pair
    CANDIDATES (from LSH/PassJoin buckets), never the cross product.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<jaro: double, jaro_winkler: double, dl: bigint>")
    def _sim(a: pd.Series, b: pd.Series) -> pd.DataFrame:
        def jaro(s, t):
            if not s or not t:
                return 0.0
            if s == t:
                return 1.0
            win = max(len(s), len(t)) // 2 - 1
            used = [False] * len(t)
            ms = []
            for i, c in enumerate(s):
                lo, hi = max(0, i - win), min(len(t), i + win + 1)
                for j in range(lo, hi):
                    if not used[j] and t[j] == c:
                        used[j] = True
                        ms.append((i, j, c))
                        break
            if not ms:
                return 0.0
            m = len(ms)
            mt = [c for _, _, c in sorted(ms, key=lambda x: x[1])]
            # transpositions = mismatched-position count // 2 with INTEGER
            # division (verified against DuckDB over 3000 random pairs;
            # fractional /2 diverges whenever the mismatch count is odd)
            trans = sum(1 for (_, _, c), d in zip(ms, mt) if c != d) // 2
            return (m / len(s) + m / len(t) + (m - trans) / m) / 3

        def jw(s, t):
            # classic Winkler BOOST THRESHOLD: the prefix bonus applies
            # only when jaro > 0.7 (DuckDB and ClickHouse both keep it)
            j = jaro(s, t)
            if j <= 0.7:
                return j
            l = 0
            for x, y in zip(s[:4], t[:4]):
                if x != y:
                    break
                l += 1
            return j + l * 0.1 * (1 - j)

        def dl(s, t):
            # full Damerau-Levenshtein (alphabet DP, Lowrance-Wagner)
            da: dict[str, int] = {}
            maxd = len(s) + len(t)
            d = [[maxd] * (len(t) + 2) for _ in range(len(s) + 2)]
            for i in range(len(s) + 1):
                d[i + 1][1] = i
            for j in range(len(t) + 1):
                d[1][j + 1] = j
            for i in range(1, len(s) + 1):
                db = 0
                for j in range(1, len(t) + 1):
                    k = da.get(t[j - 1], 0)
                    m = db
                    if s[i - 1] == t[j - 1]:
                        cost = 0
                        db = j
                    else:
                        cost = 1
                    d[i + 1][j + 1] = min(
                        d[i][j] + cost,
                        d[i + 1][j] + 1,
                        d[i][j + 1] + 1,
                        d[k][m] + (i - k - 1) + 1 + (j - m - 1),
                    )
                da[s[i - 1]] = i
            return d[len(s) + 1][len(t) + 1]

        rows = []
        for s, t in zip(a, b):
            if s is None or t is None:
                rows.append((None, None, None))
            else:
                rows.append((jaro(s, t), jw(s, t), dl(s, t)))
        return pd.DataFrame(rows, columns=["jaro", "jaro_winkler", "dl"])

    # materialize the struct ONCE (one ArrowEvalPython node), then project
    # fields JVM-side — three bare references would risk three UDF evals
    return (
        df.withColumn("__sim", _sim(F.col(col_a), F.col(col_b)))
        .withColumn(f"{prefix}jaro", F.col("__sim.jaro"))
        .withColumn(f"{prefix}jaro_winkler", F.col("__sim.jaro_winkler"))
        .withColumn(f"{prefix}damerau_levenshtein", F.col("__sim.dl"))
        .drop("__sim")
    )
