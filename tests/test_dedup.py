

def test_paragraph_dedup_first_occurrence_rule(spark):
    """A repeated paragraph survives only at its first (doc_id, pos)
    occurrence; docs reassemble in original order; normalization ignores
    case/whitespace."""
    from clickhouse_flatfile_tool_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "alpha beta\nshared block\ngamma"),
        (2, "SHARED   BLOCK\ndelta"),       # normalized repeat -> dropped
        (3, "shared block"),                 # repeat again -> dropped
        (4, "unique only"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert (out[1].n_paragraphs, out[1].n_kept) == (3, 3)
    assert out[1].text == "alpha beta\nshared block\ngamma"
    assert (out[2].n_paragraphs, out[2].n_kept) == (2, 1)
    assert out[2].text == "delta"
    assert (out[3].n_paragraphs, out[3].n_kept) == (1, 0)
    assert out[3].text == ""
    assert out[4].text == "unique only"


def test_winnow_guarantee_and_density(spark):
    """Winnowing: docs sharing a substring of length >= w + k - 1 share a
    fingerprint (the paper's guarantee); fingerprint density is near the
    2/(w+1) bound; disjoint docs share nothing."""
    from clickhouse_flatfile_tool_spark.operators.dedup import (
        winnow_candidates,
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, "AAAA " + shared + " BBBB"),
        (2, "CCCC " + shared + " DDDD"),
        (3, "zzzz yyyy xxxx wwww vvvv uuuu"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in winnow_candidates(df, k=5, w=4).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs

    fps = winnow_fingerprints(df, k=5, w=4).collect()
    by_id = {r["doc_id"]: r["fps"] for r in fps}
    n_grams = len(rows[0][1].lower()) - 4
    # distinct-set density can undershoot 2/(w+1) on repeated text; it
    # must exceed the 1/w floor and stay well under all-positions
    assert len(by_id[1]) >= n_grams // (4 + 1) // 2
    assert len(by_id[1]) < n_grams

    short = spark.createDataFrame([(9, "ab")], "doc_id long, text string")
    out = winnow_fingerprints(short, k=5, w=4).first()
    assert out["fps"] == []  # shorter than one k-gram -> no fingerprints


def test_winnow_xx_fast_path(spark):
    """The xxhash64 production path keeps the local-match guarantee and
    comparable density (different minima than md5 by design)."""
    from clickhouse_flatfile_tool_spark.operators.dedup import (
        winnow_candidates,
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, "AAAA " + shared), (2, shared + " BBBB"),
         (3, "qqqq rrrr ssss tttt uuuu")],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in winnow_candidates(df, k=5, w=4, hash_fn="xx").collect()
    }
    assert (1, 2) in pairs and (1, 3) not in pairs
    fps = winnow_fingerprints(df, k=5, w=4, hash_fn="xx").first()
    assert len(fps["fps"]) > 0
    import pytest

    with pytest.raises(ValueError, match="hash_fn"):
        winnow_fingerprints(df, hash_fn="sha")


def test_remove_repeated_spans_keeps_canonical_copy(spark):
    """ExactSubstr-style removal: a 6-token span planted in three docs
    survives only in the canonical (lowest doc_id) copy; unique text is
    untouched; sub-threshold repeats survive everywhere."""
    from clickhouse_flatfile_tool_spark.operators.dedup import (
        remove_repeated_spans,
    )

    span = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"unique one text {span} tail one"),
        (2, f"other opening here {span} closing words"),
        (3, f"{span} third document body"),
        (4, "completely unique document with no repeats at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in remove_repeated_spans(df, n=3, min_tokens=6).collect()
    }
    # canonical copy = global min (doc_id, pos) -> doc 1 keeps the span
    assert span in got[1].clean_text and got[1].n_spans_removed == 0
    assert span not in got[2].clean_text
    assert got[2].clean_text == "other opening here closing words"
    assert got[2].n_tokens_removed == 6 and got[2].n_spans_removed == 1
    assert got[3].clean_text == "third document body"
    assert got[4].clean_text == rows[3][1] and got[4].n_tokens_removed == 0
    # hashed and string paths agree
    plain = {
        r.doc_id: r.clean_text
        for r in remove_repeated_spans(
            df, n=3, min_tokens=6, hashed=False
        ).collect()
    }
    assert plain == {k: v.clean_text for k, v in got.items()}
