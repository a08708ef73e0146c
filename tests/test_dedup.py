

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
