

def test_zipf_fit_exact_power_law(spark):
    """A corpus built to have freq(rank r) = 64/r (exact power law) must
    fit slope -1 within float tolerance."""
    from clickhouse_flatfile_tool_spark.operators.text import zipf_fit

    words = []
    for r in range(1, 9):                      # 8 tokens, freq 64/r-ish
        words += [f"w{r:02d}"] * (64 // r)
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    row = zipf_fit(df, top_n=8).collect()[0]
    assert row.n_tokens == 8
    assert abs(row.slope + 1.0) < 0.05, row.slope  # 64//r truncation noise


def test_pr_curve_hand_computed(spark):
    """Four docs, two positive: precision/recall at each threshold match
    the hand-derived curve."""
    from clickhouse_flatfile_tool_spark.operators.text import pr_curve

    rows = [(0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    pts = {r.threshold: (r.precision, r.recall) for r in pr_curve(df).collect()}
    assert pts[0.9] == (1.0, 0.5)
    assert pts[0.8] == (0.5, 0.5)
    assert pts[0.7] == (round(2 / 3, 6), 1.0)
    assert pts[0.6] == (0.5, 1.0)
