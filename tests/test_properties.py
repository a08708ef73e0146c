"""Property-style checks (SURVEY §5.2 item 4): invariants for the operators
whose semantics an SQL oracle can't express, plus randomized differential
checks of custom operators against naive in-memory references.

Few examples per property (each runs Spark jobs); deadline disabled — JVM
warmup makes wall-clock meaningless as a correctness signal.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clickhouse_flatfile_tool_spark.operators import dedup as D
from clickhouse_flatfile_tool_spark.operators import relational as R

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def asof_case(draw):
    n_left = draw(st.integers(1, 12))
    n_right = draw(st.integers(0, 12))
    keys = st.integers(0, 2)
    ts = st.integers(0, 30)
    left = [(draw(keys), draw(ts), i) for i in range(n_left)]
    right_raw = {(draw(keys), draw(ts)): None for _ in range(n_right)}
    right = [(k, t, float(k * 100 + t)) for (k, t) in right_raw]
    return left, right


@given(asof_case())
@settings(**SETTINGS)
def test_asof_join_matches_naive(spark, case):
    left, right = case
    ldf = spark.createDataFrame(left, "k int, t int, rowid int")
    rdf = spark.createDataFrame(right or [(99, 99, 0.0)], "k int, t int, v double")
    if not right:
        rdf = rdf.limit(0)
    got = {
        r.rowid: (r.t_asof, r.v_asof)
        for r in R.asof_join(ldf, rdf, "k", "t", "t", ["v"]).collect()
    }
    for k, t, rowid in left:
        cands = [(rt, rv) for (rk, rt, rv) in right if rk == k and rt <= t]
        want = max(cands, default=(None, None), key=lambda c: c[0])
        assert got[rowid] == want, (rowid, got[rowid], want)


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_pagination_tiles_ordered_prefix(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    page_size = 3
    pages = []
    for p in range(1, (len(texts) + page_size) // page_size + 1):
        pages += [tuple(r) for r in R.page_slice(df, ["id"], p, page_size).collect()]
    assert pages == sorted((i, t) for i, t in enumerate(texts))


@given(
    st.lists(
        st.sampled_from(
            ["w x y z w x", "a b c d e f", "a b c d e g", "q r s t u v"]
        ),
        min_size=2,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_minhash_dedup_invariants(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = D.minhash_dedup(df, jaccard_threshold=0.99)
    kept = {r.doc_id for r in out.collect()}
    # output is a subset of input ids
    assert kept <= set(range(len(texts)))
    # exact duplicates never both survive
    by_text: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t, []).append(i)
    for ids in by_text.values():
        assert len(set(ids) & kept) <= 1 or len(ids) == 1
    # at least one representative of every text value survives
    for ids in by_text.values():
        assert set(ids) & kept


@given(st.lists(st.integers(0, 5), min_size=1, max_size=20), st.integers(1, 4))
@settings(**SETTINGS)
def test_salted_join_equals_plain(spark, keys, salt):
    big = spark.createDataFrame([(k, i) for i, k in enumerate(keys)], "k int, rowid int")
    small = spark.createDataFrame([(k, k * 10) for k in set(keys)], "k int, v int")
    plain = sorted(
        tuple(r) for r in big.join(small, "k").select("rowid", "v").collect()
    )
    salted = sorted(
        tuple(r)
        for r in R.salted_join(big, small, "k", salt=salt).select("rowid", "v").collect()
    )
    assert plain == salted


@given(st.lists(st.floats(900.0, 1000.0, allow_nan=False), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_bucketed_range_join_matches_naive(spark, xs):
    pts = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "id int, x double")
    iv = spark.createDataFrame(
        [(900.0, 933.0, "a"), (933.0, 966.0, "b"), (960.0, 1000.1, "c")],
        "lo double, hi double, tag string",
    )
    naive = {
        (i, tag)
        for i, x in enumerate(xs)
        for lo, hi, tag in [(900.0, 933.0, "a"), (933.0, 966.0, "b"), (960.0, 1000.1, "c")]
        if lo <= x < hi
    }
    got = {
        (r.id, r.tag)
        for r in R.bucketed_range_join(pts, iv, "x", "lo", "hi", 25.0).collect()
    }
    assert got == naive


@given(
    st.lists(st.integers(0, 99), min_size=1, max_size=40),
    st.lists(st.integers(0, 99), min_size=1, max_size=40),
)
@settings(**SETTINGS)
def test_psi_nonnegative_and_zero_iff_identical(spark, xs, ys):
    """Every PSI term is >= 0 (Gibbs' inequality termwise: (p-q)ln(p/q) >= 0),
    and PSI over identical snapshots is exactly 0."""
    from clickhouse_flatfile_tool_spark.operators.relational import (
        population_stability,
    )

    a = spark.createDataFrame([(float(x),) for x in xs], "v double")
    b = spark.createDataFrame([(float(y),) for y in ys], "v double")
    rows = population_stability(a, b, "v", edges=[25.0, 50.0, 75.0]).collect()
    assert all(r.psi_term >= 0.0 for r in rows)
    same = population_stability(a, a, "v", edges=[25.0, 50.0, 75.0]).collect()
    assert all(abs(r.psi_term) < 1e-12 for r in same)


@given(st.integers(1, 40), st.integers(1, 40))
@settings(**SETTINGS)
def test_token_budget_monotone(spark, b_small, b_large):
    """A larger token budget keeps a superset of a smaller budget's rows
    (admission order is fixed by md5(id), so the kept set is a prefix)."""
    from clickhouse_flatfile_tool_spark.operators.sampling import token_budget_trim

    lo, hi = sorted([b_small, b_large])
    rows = [(i, "g", "w " * (i % 5 + 1)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    small = {r.doc_id for r in token_budget_trim(df, lo).select("doc_id").collect()}
    large = {r.doc_id for r in token_budget_trim(df, hi).select("doc_id").collect()}
    assert small <= large


@st.composite
def funnel_case(draw):
    n = draw(st.integers(1, 14))
    # small domains force ties, interleavings, and multi-start chains
    return [
        (
            draw(st.integers(1, 3)),            # user
            draw(st.integers(0, 20)),           # ts seconds
            i,                                   # event_id (unique tiebreak)
            draw(st.sampled_from(["a", "b", "c", "x"])),
        )
        for i in range(n)
    ]


def _funnel_reference(rows, window, steps):
    """Brute-force windowFunnel: greedy from every step-1 start over the
    (ts, event_id)-sorted list."""
    from collections import defaultdict

    per_user = defaultdict(list)
    for u, t, e, ty in rows:
        per_user[u].append((t, e, ty))
    out = {}
    for u, evs in per_user.items():
        evs.sort()
        best = 0
        for i, (t0, _, ty0) in enumerate(evs):
            if ty0 != steps[0]:
                continue
            level, deadline = 1, t0 + window
            for t, _, ty in evs[i + 1 :]:
                if level < len(steps) and t <= deadline and ty == steps[level]:
                    level += 1
            best = max(best, level)
        out[u] = best
    return out


@given(funnel_case(), st.integers(0, 25))
@settings(**SETTINGS)
def test_window_funnel_matches_naive(spark, rows, window):
    import datetime

    from clickhouse_flatfile_tool_spark.operators.events import window_funnel

    steps = ["a", "b", "c"]
    df = spark.createDataFrame(
        [
            (u, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=t), e, ty)
            for u, t, e, ty in rows
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    got = {
        r.user_id: r.level
        for r in window_funnel(
            df, window, [f"event_type = '{s}'" for s in steps]
        ).collect()
    }
    assert got == _funnel_reference(rows, window, steps)


@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=3), min_size=1, max_size=60))
@settings(**SETTINGS)
def test_cms_never_undercounts_random(spark, items):
    from collections import Counter

    exact = Counter(items)
    df = spark.createDataFrame([(w,) for w in items], "w string")
    sketch = R.cms_table(df, "w", depth=3, hex_chars=1)  # width 16: collisions likely
    est = {
        r.item: r.est
        for r in R.cms_estimate(
            sketch, df.select("w").distinct(), "w", depth=3, hex_chars=1
        ).collect()
    }
    n = len(items)
    for w, true in exact.items():
        assert est[w] >= true          # CMS can only overcount
        assert est[w] <= n             # and never beyond the stream length


@st.composite
def span_docs(draw):
    # two docs over a tiny vocabulary so shared trigram runs appear naturally
    vocab = ["w0", "w1", "w2", "w3"]
    a = draw(st.lists(st.sampled_from(vocab), min_size=3, max_size=14))
    b = draw(st.lists(st.sampled_from(vocab), min_size=3, max_size=14))
    return " ".join(a), " ".join(b)


def _spans_reference(ta, tb, n=3):
    """Naive shared-span finder: all (pos_a, pos_b) n-gram matches, islands
    by offset, return (longest_run_tokens, n_spans) or None if no match."""
    wa, wb = ta.split(), tb.split()
    ga = [" ".join(wa[i : i + n]) for i in range(len(wa) - n + 1)]
    gb = [" ".join(wb[i : i + n]) for i in range(len(wb) - n + 1)]
    matches = [
        (i, j) for i, x in enumerate(ga) for j, y in enumerate(gb) if x == y
    ]
    if not matches:
        return None
    from collections import defaultdict

    by_off = defaultdict(list)
    for i, j in matches:
        by_off[i - j].append(i)
    runs = []
    for poss in by_off.values():
        poss.sort()
        run = 1
        for p, q in zip(poss, poss[1:]):
            if q == p + 1:
                run += 1
            else:
                runs.append(run)
                run = 1
        runs.append(run)
    return max(runs) + n - 1, len(runs)


@given(span_docs())
@settings(**SETTINGS)
def test_shared_spans_matches_naive(spark, docs_pair):
    ta, tb = docs_pair
    df = spark.createDataFrame([(1, ta), (2, tb)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    rows = D.shared_spans(df, pairs).collect()
    expect = _spans_reference(ta, tb)
    if expect is None:
        assert rows == []
    else:
        assert len(rows) == 1
        assert (rows[0].longest_run_tokens, rows[0].n_spans) == expect


# ---------------------------------------------------------------------------
# round-4 additions
# ---------------------------------------------------------------------------

@st.composite
def asof_sql_case(draw):
    n_left = draw(st.integers(1, 10))
    n_right = draw(st.integers(0, 10))
    left = [
        (draw(st.integers(0, 2)), draw(st.integers(0, 50)))
        for _ in range(n_left)
    ]
    right = [
        (draw(st.integers(0, 2)), draw(st.integers(0, 50)), i)
        for i in range(n_right)
    ]
    return left, right


@given(asof_sql_case())
@settings(**SETTINGS)
def test_dialect_asof_matches_naive(spark, case):
    """The SQL ASOF LEFT JOIN rewrite (union + running last_value) must
    match a naive per-row 'latest right with rt <= lt, tiebreak by the
    sort's bool ordering' reference on random keyed data with ties."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql as tr

    left, right = case
    spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k int, t int, lid int"
    ).createOrReplaceTempView("pa_l")
    spark.createDataFrame(right, "k int, rt int, rid int").createOrReplaceTempView(
        "pa_r"
    )
    out = spark.sql(
        tr(
            "SELECT l.lid, r.rt, r.rid FROM pa_l l "
            "ASOF LEFT JOIN pa_r r ON l.k = r.k AND l.t >= r.rt"
        )
    ).collect()
    got = {r.lid: (r.rt, r.rid) for r in out}
    assert len(got) == len(left)  # every left row survives exactly once
    for lid, (k, t) in enumerate(left):
        cands = [(rt, rid) for (rk, rt, rid) in right if rk == k and rt <= t]
        if not cands:
            assert got[lid] == (None, None), (lid, got[lid])
        else:
            # the fold takes the LAST candidate in (rt, rid-struct) sort
            # order — max rt; among equal rt the struct sort decides, and
            # since rid is part of the right struct, max (rt, ...) wins
            # deterministically on rt at least
            assert got[lid][0] == max(rt for rt, _ in cands), (lid, got[lid])


@given(st.lists(st.integers(-50, 50), max_size=8))
@settings(**SETTINGS)
def test_array_cumsum_matches_python(spark, xs):
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql as tr

    lit = "[" + ", ".join(map(str, xs)) + "]" if xs else "array()"
    row = spark.sql("SELECT " + tr(f"arrayCumSum({lit})") + " AS c").first()
    expect, s = [], 0.0
    for x in xs:
        s += x
        expect.append(s)
    assert row.c == expect


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["aa bb", "cc dd", "ee ff", "gg"])),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_paragraph_dedup_invariants(spark, docs):
    """Kept-paragraph fingerprints are globally unique; counts are
    consistent; reassembled text only loses paragraphs, never reorders."""
    rows = [
        (i, "\n".join(p for _, p in docs[: k + 1]))
        for i, (k, _) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = D.paragraph_dedup(df).collect()
    seen = set()
    for r in sorted(out, key=lambda r: r.doc_id):
        assert 0 <= r.n_kept <= r.n_paragraphs
        kept = [p for p in r.text.split("\n") if p != ""] if r.text else []
        assert len(kept) == r.n_kept
        orig = rows[r.doc_id][1].split("\n")
        # kept paragraphs appear in original relative order
        it = iter(orig)
        assert all(any(p == o for o in it) for p in kept)
        for p in kept:
            assert p not in seen  # corpus-wide uniqueness of survivors
            seen.add(p)


@given(
    st.lists(
        st.tuples(st.integers(0, 3600), st.floats(-100, 100, allow_nan=False)),
        min_size=1,
        max_size=8,
        unique_by=lambda e: e[0],
    )
)
@settings(**SETTINGS)
def test_ema_recursive_matches_python_fold(spark, events):
    import datetime

    from clickhouse_flatfile_tool_spark.operators.events import ema_recursive

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0 + datetime.timedelta(seconds=s), float(x)) for s, x in events
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    got = ema_recursive(df, halflife_seconds=600.0).collect()[0]
    sorted_ev = sorted(events)
    ema, pt = sorted_ev[0][1], sorted_ev[0][0]
    for s, x in sorted_ev[1:]:
        a = 2.0 ** (-(s - pt) / 600.0)
        ema = ema * a + x * (1 - a)
        pt = s
    assert got.n_events == len(events)
    assert abs(got.ema - ema) < 1e-9 * max(1.0, abs(ema))


@st.composite
def ch_expression(draw, depth=0):
    """Random ClickHouse-flavored scalar expression from a small grammar —
    exercises nesting across every rewriter family."""
    atoms = ["x", "y", "7", "1.5", "NULL"]
    if depth >= 3:
        return draw(st.sampled_from(atoms))
    kind = draw(st.integers(0, 80))
    sub = lambda: draw(ch_expression(depth=depth + 1))  # noqa: E731
    # batch 26/27 (r7) — deterministic scalar members (the random family
    # and the geo constant-folds get direct pytests)
    if kind == 70:
        return f"round(erf(toFloat64({sub()}) / 10), 4)"
    if kind == 71:
        return f"round(lgamma(abs(toFloat64({sub()})) + 1.5), 4)"
    if kind == 72:
        return f"toUInt8(hasSubsequence(toString({sub()}), '1'))"
    if kind == 73:
        return f"length(unbin(bin(toInt64(abs({sub()})) % 256 + 1)))"
    if kind == 74:
        return (
            f"tupleElement(mortonDecode(2, mortonEncode("
            f"toInt64(abs({sub()})) % 64, 9)), 1)"
        )
    if kind == 75:
        return f"reinterpretAsUInt64(reinterpretAsString(toInt64(abs({sub()})) % 200 + 1))"
    if kind == 76:
        return (
            f"length(cutURLParameter(concat('http://x/?a=', "
            f"toString(toInt64({sub()})), '&b=2'), 'b'))"
        )
    if kind == 77:
        return (
            f"length(IPv6NumToString(IPv6StringToNum(concat('2001:db8::', "
            f"toString(toInt64(abs({sub()})) % 9 + 1)))))"
        )
    if kind == 78:
        return (
            f"toUInt8(isIPAddressInRange(concat('10.0.0.', "
            f"toString(toInt64(abs({sub()})) % 200)), '10.0.0.0/8'))"
        )
    if kind == 79:
        return (
            f"toUInt8(pointInEllipses(toFloat64({sub()}), 0.0, "
            f"0.0, 0.0, 100.0, 100.0))"
        )
    if kind == 80:
        return (
            f"length(base58Encode(toString(toInt64({sub()})))) + "
            f"length(base58Decode(base58Encode('k')))"
        )
    # batch 24 (r7) — sumForEach/groupArrayInsertAt are AGGREGATES, so
    # they fuzz as UNCORRELATED scalar subqueries (a bare aggregate mixed
    # with plain columns in one SELECT is MISSING_GROUP_BY — a latent
    # grammar hazard hypothesis found once the kind range grew in r7) and
    # only at DEPTH 0 (Spark rejects subqueries nested inside array
    # constructors / lambda bodies)
    if kind in (67, 69) and depth > 0:
        kind = 68
    if kind == 67:
        return (
            f"(SELECT toInt64(arrayElement(sumForEach("
            f"[toFloat64({draw(st.integers(0, 9))}), 1.0]), 2)))"
        )
    if kind == 68:
        return (
            f"arrayLastIndex(__z -> __z > 1, [1, toInt64({sub()}), 2])"
        )
    if kind == 69:
        return (
            f"(SELECT arrayElement(groupArrayInsertAt(toInt64(-1), 2)("
            f"toInt64({draw(st.integers(0, 9))}), 0), 2))"
        )
    # batch 23 (r7)
    if kind == 61:
        return f"toUInt8(isNotDistinctFrom({sub()}, {sub()}))"
    if kind == 62:
        return (
            f"arrayElement(multiSearchAllPositions("
            f"toString({sub()}), ['1', '7']), 1)"
        )
    if kind == 63:
        return f"round(LpNorm([toFloat64({sub()}), 2.0], 2), 4)"
    if kind == 64:
        return (
            f"arrayElement(mapValues(mapUpdate(map('a', toInt64({sub()})), "
            f"map('a', 2))), 1)"
        )
    if kind == 65:
        return (
            f"length(cutQueryStringAndFragment(concat('http://x/',"
            f"toString({sub()}), '?q=1')))"
        )
    if kind == 66:
        return (
            f"round(arrayElement(normalizeL2([toFloat64({sub()}), 1.0]), 2), 4)"
        )
    # batch 22 (r7)
    if kind == 53:
        # toUInt8 wrap: CH multiMatch* return UInt8 (the multiSearchAny
        # note below)
        return f"toUInt8(multiMatchAny(toString({sub()}), ['1', '7$']))"
    if kind == 54:
        return f"multiMatchAnyIndex(toString({sub()}), ['^1', '5'])"
    if kind == 55:
        return (
            f"arraySum(arrayMap(__x -> toInt64OrZero(__x), "
            f"JSONExtractArrayRaw(concat('[', toString(toInt64({sub()})), "
            f"',2]'))))"
        )
    if kind == 56:
        return (
            f"timeDiff(toDateTime('2024-01-01 00:00:00'), "
            f"addMilliseconds(toDateTime('2024-01-01 00:00:00'), "
            f"positiveModulo(toInt64({sub()}), 1000)))"
        )
    if kind == 57:
        return f"round(sigmoid(toFloat64({sub()})), 4)"
    if kind == 58:
        return f"length(appendTrailingCharIfAbsent(toString({sub()}), '/'))"
    if kind == 59:
        return f"toUInt8(xor({sub()} > 0, {sub()} < 0))"
    if kind == 60:
        # the computed key must be NULL-proof: a NULL sub-expression would
        # make the whole key NULL and map() rejects NULL keys in BOTH
        # engines (CH forbids Nullable map keys at type level; Spark
        # raises NULL_MAP_KEY) — deep-fuzz (r8, 200 examples) caught the
        # unguarded form as a grammar hazard, not a translation bug
        return (
            f"length(arrayElement(mapKeys(mapSort(mapConcat(map('b', 1), "
            f"map(concat('a', ifNull(toString(toInt64({sub()})), '0')), "
            f"2)))), 1))"
        )
    # batch 20 (r6)
    if kind == 47:
        # the nested expression feeds the MAP VALUE, not the lambda body:
        # mapApply's param substitution passes through (by design) when a
        # nested lambda declares k/v, so a sub() that generates one (e.g.
        # arrayFill(v -> ...)) inside the body would stay untranslated
        return (
            f"try_element_at(mapApply((k, v) -> (upper(k), v + 1), "
            f"map('a', toInt64({sub()}))), 'A')"
        )
    if kind == 48:
        # toInt64 wrap: CH isValidJSON returns UInt8 (numeric), so it can
        # sit in numeric array literals; Spark's boolean can't
        return f"toInt64(isValidJSON(toString({sub()})))"
    if kind == 49:
        return f"length(JSONType(toString(toFloat64({sub()}))))"
    if kind == 50:
        return (
            f"toDayOfMonth(addQuarters(makeDate(2024, 1, 15), "
            f"toInt64({draw(st.integers(0, 6))})))"
        )
    if kind == 51:
        return (
            f"toDayOfMonth(YYYYMMDDToDate("
            f"20240100 + {draw(st.integers(1, 28))}))"
        )
    if kind == 52:
        return (
            f"length(caseWithExpression(toInt64({sub()}), 1, 'one', 2, "
            f"'two', 'other'))"
        )
    # batch 19 (r6)
    if kind == 41:
        return (
            f"age('day', toDateTime('2024-01-01 00:00:00'), "
            f"makeDate(2024, 2, {draw(st.integers(1, 28))}))"
        )
    if kind == 42:
        return f"arraySum(arrayShiftLeft([toInt64({sub()}), 2, 3], 1, 0))"
    if kind == 43:
        return f"length(replaceRegexpOne(toString({sub()}), '1', 'X'))"
    if kind == 44:
        # divisor >= 1: CH positiveModulo(x, 0) throws on both engines
        return f"positiveModulo(toInt64({sub()}), {draw(st.integers(1, 5))})"
    if kind == 45:
        return f"widthBucket(toFloat64({sub()}), 0, 10, 4)"
    if kind == 46:
        return f"toRelativeMonthNum(makeDate(2024, {draw(st.integers(1, 12))}, 3))"
    # batch 18 (r5)
    if kind == 36:
        return f"toWeek(makeDate(2024, 1, {draw(st.integers(1, 28))}))"
    if kind == 37:
        return f"round(ngramDistance(toString({sub()}), '1234'), 4)"
    if kind == 38:
        return f"JSONLength(concat('[', toString(toInt64({sub()})), ']'))"
    if kind == 39:
        return (
            f"timestamp_diff('day', toDateTime('2024-01-01 00:00:00'), "
            f"dateTrunc('month', toDateTime('2024-03-0{draw(st.integers(1, 9))}"
            f" 00:00:00')))"
        )
    if kind == 40:
        return f"round(ngramSearch(toString({sub()}), toString({sub()})), 4)"
    if kind == 32:
        return f"gcd(toInt64({sub()}), {draw(st.integers(0, 24))})"
    if kind == 33:
        return f"lcm(toInt64({sub()}), {draw(st.integers(1, 6))})"
    if kind == 34:
        return f"toDaysSinceYearZero(makeDate(2020, 1, {draw(st.integers(1, 28))}))"
    if kind == 35:
        return (
            f"length(regexpQuoteMeta(toString({sub()})))"
        )
    if kind == 28:
        return f"arraySum(arrayFill(v -> v != 0, [toInt64({sub()}), 0, 3]))"
    if kind == 29:
        return (
            f"size(arraySplit(v -> v = 1, [1, toInt64({sub()}), 3]))"
        )
    if kind == 30:
        return f"toUInt8(hasSubstr([toInt64({sub()}), 2, 3], [2, 3]))"
    if kind == 31:
        return f"toInt64OrNull(mid(toString({sub()}), 1, 2))"
    if kind == 24:
        return f"bitHammingDistance(toInt64({sub()}), 9)"
    if kind == 25:
        return f"roundDuration(roundAge(toInt64({sub()})))"
    if kind == 26:
        return f"arrayElement(mapValues(mapAdd(map(1, toInt64({sub()})), map(1, 2))), 1)"
    if kind == 27:
        return f"arraySum(arrayEnumerateUniq([1, {sub()}, 1]))"
    if kind == 20:
        return f"moduloOrZero({sub()}, {draw(st.integers(0, 3))})"
    if kind == 21:
        return f"length(replaceOne(toString({sub()}), '1', '99'))"
    if kind == 22:
        return f"isZeroOrNull({sub()})"
    if kind == 23:
        return f"arraySum(arrayWithConstant(2, toInt64({sub()})))"
    if kind == 16:
        return f"arrayProduct(arrayResize([{sub()}, 2], 3, 1))"
    if kind == 17:
        n = draw(st.integers(0, 4))
        return f"arraySum(arrayRotateLeft([{sub()}, 1, 2], {n}))"
    if kind == 18:
        return f"bitTest(toInt64({sub()}), {draw(st.integers(0, 2))})"
    if kind == 19:
        return f"size(ngrams(toString({sub()}), 2))"
    if kind == 0:
        return f"toInt64({sub()})"
    if kind == 1:
        return f"intDiv({sub()}, 3)"
    if kind == 2:
        return f"arraySum(arrayPushBack([{sub()}, 2], 5))"
    if kind == 3:
        return f"multiIf({sub()} > 0, 1, {sub()} < 0, -1, 0)"
    if kind == 4:
        return f"ifNull({sub()}, {sub()})"
    if kind == 5:
        return f"arrayCumSum([1, 2])[{draw(st.integers(1, 2))}]"
    if kind == 6:
        return f"countEqual([{sub()}, 1], 1)"
    if kind == 7:
        return f"tupleElement(tuple({sub()}, 'a'), 1)"
    if kind == 8:
        # toUInt8 normalizes the boolean: CH's empty() returns UInt8 and
        # composes with ints; Spark's boolean wouldn't coerce in arrays —
        # an accepted type-system divergence, not a rewriter bug
        return f"toUInt8(empty(toString({sub()})))"
    if kind == 9:
        return f"range(2)[1] + {sub()}"
    if kind == 10:
        return f"exp2(bitCount({draw(st.integers(0, 99))}))"
    if kind == 12:
        return f"plus(multiply({sub()}, 2), negate({sub()}))"
    if kind == 13:
        return f"intDivOrZero({sub()}, {draw(st.integers(0, 3))})"
    if kind == 14:
        # toUInt8 for the same reason as kind 8: CH multiSearchAny returns
        # UInt8, Spark's exists() a BOOLEAN that won't coerce in arrays
        return (
            f"toUInt8(multiSearchAny(toString({sub()}), ['1', '7']))"
        )
    # probe and from-array must share a type — ClickHouse itself rejects
    # transform(Float64, Array(UInt8), ...), so the generator type-matches
    # them (the translated element_at map lookup inherits CH's strictness)
    return f"transform(toInt64({sub()}), [toInt64(1), toInt64(2)], [10, 20], 0)"


@given(st.lists(ch_expression(), min_size=1, max_size=3))
@settings(**SETTINGS)
def test_dialect_fuzz_translates_and_parses(spark, exprs):
    """Translation of random nested CH expressions must produce SQL that
    Spark at least ANALYZES (x/y bound as columns) — guards the string
    rewriters against paren/comma/mask corruption under composition."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql as tr

    spark.createDataFrame([(1, 2)], "x int, y int").createOrReplaceTempView("fz")
    sel = ", ".join(f"({e}) AS c{i}" for i, e in enumerate(exprs))
    out = tr(f"SELECT {sel} FROM fz")
    spark.sql(out)  # analysis only — throws on malformed output


@given(
    st.lists(st.integers(0, 3), min_size=0, max_size=8),
    st.integers(1, 3),
)
@settings(**SETTINGS)
def test_array_fill_split_match_python_model(spark, arr, cut):
    """arrayFill/arrayReverseFill/arraySplit/arrayReverseSplit vs a
    direct Python model of the ClickHouse semantics, over random small
    int arrays and thresholds."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql as tr

    lit = "[" + ", ".join(map(str, arr)) + "]"
    row = spark.sql(
        tr(
            f"SELECT arrayFill(x -> x != 0, {lit}) AS ff, "
            f"arrayReverseFill(x -> x != 0, {lit}) AS rf, "
            f"arraySplit(x -> x = {cut}, {lit}) AS sp, "
            f"arrayReverseSplit(x -> x = {cut}, {lit}) AS rsp, "
            f"hasSubstr({lit}, [{cut}, {cut}]) AS hs"
        )
    ).first()

    def fill(a, rev):
        b = list(a)
        rng = range(len(b) - 2, -1, -1) if rev else range(1, len(b))
        for i in rng:
            if b[i] == 0:
                b[i] = b[i + 1] if rev else b[i - 1]
        return b

    def split(a, rev):
        if not a:
            return []
        groups, cur = [], []
        for x in a:
            if not rev and x == cut and cur:
                groups.append(cur)
                cur = []
            cur.append(x)
            if rev and x == cut:
                groups.append(cur)
                cur = []
        if cur:
            groups.append(cur)
        return groups

    assert row.ff == fill(arr, rev=False)
    assert row.rf == fill(arr, rev=True)
    assert row.sp == split(arr, rev=False)
    assert row.rsp == split(arr, rev=True)
    want_hs = any(
        arr[i : i + 2] == [cut, cut] for i in range(len(arr) - 1)
    )
    assert row.hs == want_hs


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(-5, 5)),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_summap_sql_form_matches_python_model(spark, pairs):
    """sumMap over random (key, value) rows packed into per-row arrays:
    matches a dict-accumulating Python model, keys sorted."""
    from collections import defaultdict

    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql as tr

    rows = [([f"k{k}"], [float(v)]) for k, v in pairs]
    spark.createDataFrame(
        rows, "k array<string>, v array<double>"
    ).createOrReplaceTempView("summap_prop_t")
    got = spark.sql(
        tr("SELECT sumMap(k, v) AS s FROM summap_prop_t")
    ).first().s
    model: dict = defaultdict(float)
    for k, v in pairs:
        model[f"k{k}"] += float(v)
    want_keys = sorted(model)
    assert got.col1 == want_keys
    assert got.col2 == [model[k] for k in want_keys]


@given(
    st.floats(-179.99, 179.99, allow_nan=False),
    st.floats(-89.99, 89.99, allow_nan=False),
    st.integers(1, 12),
)
@settings(**SETTINGS)
def test_geohash_encode_matches_reference(spark, lon, lat, p):
    """geohashEncode vs an independent interval-halving reference
    implementation, and the decode round-trip landing in-cell."""
    import math

    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql as tr

    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"

    def ref_encode(lon, lat, p):
        lon_i, lat_i = [-180.0, 180.0], [-90.0, 90.0]
        bits, out, even, ch = 0, "", True, 0
        while len(out) < p:
            iv, v = (lon_i, lon) if even else (lat_i, lat)
            mid = (iv[0] + iv[1]) / 2
            if v >= mid:
                ch = ch * 2 + 1
                iv[0] = mid
            else:
                ch = ch * 2
                iv[1] = mid
            even = not even
            bits += 1
            if bits == 5:
                out += alpha[ch]
                bits = ch = 0
        return out

    row = spark.sql(
        tr(
            f"SELECT geohashEncode({lon!r}, {lat!r}, {p}) AS g, "
            f"geohashDecode(geohashEncode({lon!r}, {lat!r}, {p})) AS c"
        )
    ).first()
    n = 5 * p
    nlon, nlat = (n + 1) // 2, n // 2
    # When a coordinate sits within float error of a cell boundary, the
    # closed form ((x+off)/range·2^n can round the tiny offset away) and
    # interval halving legitimately disagree on that bit — e.g.
    # lat = -1e-38 where lat + 90 rounds to exactly 90.0.  The in-cell
    # round-trip bound below still holds; only the exact-string compare
    # is boundary-sensitive.
    slon = (lon + 180.0) / 360.0 * (1 << nlon)
    slat = (lat + 90.0) / 180.0 * (1 << nlat)
    on_boundary = (
        abs(slon - round(slon)) < 1e-6 or abs(slat - round(slat)) < 1e-6
    )
    if not on_boundary:
        assert row.g == ref_encode(lon, lat, p)
    cell_lon = 360.0 / (1 << nlon)
    cell_lat = 180.0 / (1 << nlat)
    assert abs(row.c.col1 - lon) <= cell_lon + 1e-9
    assert abs(row.c.col2 - lat) <= cell_lat + 1e-9


@given(
    st.floats(-4.9, 4.9, allow_nan=False),
    st.floats(-4.9, 4.9, allow_nan=False),
    st.lists(
        st.tuples(st.integers(-4, 4), st.integers(-4, 4)),
        min_size=3,
        max_size=7,
    ),
)
@settings(**SETTINGS)
def test_point_in_polygon_matches_python_ray_caster(spark, px, py, verts):
    """pointInPolygon vs a direct Python even-odd ray caster over random
    (possibly degenerate/self-intersecting) integer polygons and float
    points — float points never sit on integer edges' lattice."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql as tr

    def ref(px, py, poly):
        inside = False
        n = len(poly)
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
                if px < xint:
                    inside = not inside
        return int(inside)

    lit = ", ".join(f"({x}, {y})" for x, y in verts)
    row = spark.sql(
        tr(f"SELECT pointInPolygon(({px!r}, {py!r}), [{lit}]) AS i")
    ).first()
    assert row.i == ref(px, py, verts)


@given(
    st.lists(
        st.tuples(st.integers(1, 2), st.sampled_from(["A", "B", "C"])),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_sequence_next_node_matches_python_model(spark, evs):
    """sequenceNextNode (all four anchor modes) vs direct Python index
    probes over random per-user event streams (unique timestamps)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql as tr

    rows = [(u, i, v) for i, (u, v) in enumerate(evs)]
    spark.createDataFrame(rows, "uid int, ts int, page string").createOrReplaceTempView(
        "snn_prop_t"
    )

    def model(seq, mode):
        # chain A then B, consecutive; base_cond = first chain cond
        if mode in ("backward_tail", "backward_last"):
            seq = seq[::-1]
        if mode in ("forward_head", "backward_tail"):
            if len(seq) >= 3 and seq[0] == "A" and seq[1] == "B":
                return seq[2]
            return None
        idxs = [i for i, v in enumerate(seq) if v == "A"]
        if not idxs:
            return None
        i = idxs[0]
        if i + 2 < len(seq) and seq[i + 1] == "B":
            return seq[i + 2]
        return None

    per_user: dict[int, list[str]] = {}
    for u, _, v in rows:
        per_user.setdefault(u, []).append(v)
    calls = {
        "forward_head": "sequenceNextNode('forward', 'head')",
        "backward_tail": "sequenceNextNode('backward', 'tail')",
        "forward_first": "sequenceNextNode('forward', 'first_match')",
        "backward_last": "sequenceNextNode('backward', 'last_match')",
    }
    sel = ", ".join(
        f"{call}(ts, page, page = 'A', page = 'A', page = 'B') AS {k}"
        for k, call in calls.items()
    )
    got = {
        r.uid: r.asDict()
        for r in spark.sql(
            tr(f"SELECT uid, {sel} FROM snn_prop_t GROUP BY uid")
        ).collect()
    }
    for u, seq in per_user.items():
        for mode in calls:
            assert got[u][mode] == model(seq, mode), (u, seq, mode)


@given(
    st.text(alphabet="abcxyz /?.", min_size=0, max_size=20),
    st.text(alphabet="abcxyz", min_size=0, max_size=6),
)
@settings(**SETTINGS)
def test_string_rewrites_match_python_models(spark, s, needle):
    """stringJaccardIndex / multiSearchAllPositions / basename vs direct
    Python models over random low-alphabet strings."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql as tr

    esc = s.replace("'", "''")
    nesc = needle.replace("'", "''")
    row = spark.sql(
        tr(
            f"SELECT round(stringJaccardIndex('{esc}', 'abc'), 9) AS j, "
            f"multiSearchAllPositions('{esc}', ['{nesc}', 'zz']) AS p, "
            f"basename('{esc}') AS b"
        )
    ).first()
    sa, sb = set(s), set("abc")
    want_j = 1.0 if not (sa | sb) else len(sa & sb) / len(sa | sb)
    assert abs(row.j - round(want_j, 9)) < 1e-9
    want_pos = [
        (s.find(needle) + 1) if needle else 1,  # instr('', '') convention
        (s.find("zz") + 1),
    ]
    # Spark instr(x, '') returns 1 like ClickHouse position
    got = list(row.p)
    assert got[1] == max(want_pos[1], 0)
    if needle:
        assert got[0] == max(s.find(needle) + 1, 0)
    assert row.b == (s.rsplit("/", 1)[-1] if "/" in s else s)


@given(st.lists(st.integers(0, 5), min_size=1, max_size=10), st.integers(1, 4))
@settings(**SETTINGS)
def test_limit_with_ties_matches_python_model(spark, vals, n):
    """LIMIT n WITH TIES returns exactly the rows whose value ties into
    the first n of the sorted order."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql as tr

    spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    ).createOrReplaceTempView("ties_prop_t")
    got = sorted(
        (r.id, r.v)
        for r in spark.sql(
            tr(f"SELECT id, v FROM ties_prop_t ORDER BY v LIMIT {n} WITH TIES")
        ).collect()
    )
    cut = sorted(vals)[min(n, len(vals)) - 1]
    want = sorted((i, v) for i, v in enumerate(vals) if v <= cut)
    assert got == want


@given(
    st.lists(st.text(alphabet="abz1", min_size=1, max_size=4), min_size=0, max_size=4),
    st.booleans(),
)
@settings(**SETTINGS)
def test_url_hierarchy_matches_python_model(spark, segs, with_query):
    """URLHierarchy vs a direct Python model: progressive prefixes cut
    after every / (and ?) past the host, over random path segments."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql as tr

    url = "https://ex.com/" + "/".join(segs)
    if with_query:
        url += "?q=1"
    row = spark.sql(tr(f"SELECT URLHierarchy('{url}') AS h")).first()

    prefix = "https://ex.com"
    rest = url[len(prefix):]
    # split keeping each / or ? attached to the END of its piece
    pieces, cur = [], ""
    for ch in rest:
        cur += ch
        if ch in "/?":
            pieces.append(cur)
            cur = ""
    if cur:
        pieces.append(cur)
    want = (
        [prefix + "".join(pieces[: i + 1]) for i in range(len(pieces))]
        if pieces
        else [prefix]
    )
    assert list(row.h) == want


@given(
    st.lists(
        st.lists(st.sampled_from("a b c d".split()), min_size=1, max_size=12),
        min_size=1,
        max_size=4,
    )
)
@settings(**SETTINGS)
def test_remove_repeated_spans_matches_python_model(spark, token_lists):
    """Randomized differential check of ExactSubstr span removal against a
    brute-force in-memory model (tiny alphabet forces heavy duplication —
    the canonical-copy, island-merge, and min-length rules all fire)."""
    n, min_tokens = 2, 2
    docs = {i + 1: toks for i, toks in enumerate(token_lists)}

    # model: positional postings -> canonical-first mask -> covered runs
    posts = [
        (tuple(t[p : p + n]), d, p + 1)
        for d, t in docs.items()
        for p in range(len(t) - n + 1)
    ]
    from collections import Counter, defaultdict

    cnt = Counter(g for g, _, _ in posts)
    first = {}
    for g, d, p in sorted(posts, key=lambda x: (x[1], x[2])):
        first.setdefault(g, (d, p))
    covered = defaultdict(set)
    for g, d, p in posts:
        if cnt[g] >= 2 and first[g] != (d, p):
            covered[d].update(range(p, p + n))
    expect = {}
    for d, t in docs.items():
        drop: set[int] = set()
        spans = 0
        removed = 0
        run: list[int] = []
        for pos in sorted(covered.get(d, ())) + [10**9]:
            if run and pos != run[-1] + 1:
                if len(run) >= min_tokens:
                    drop.update(run)
                    spans += 1
                    removed += len(run)
                run = []
            run.append(pos)
        clean = " ".join(
            tok for i, tok in enumerate(t, start=1) if i not in drop
        )
        expect[d] = (clean, removed, spans)

    df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.clean_text, r.n_tokens_removed, r.n_spans_removed)
        for r in D.remove_repeated_spans(
            df, n=n, min_tokens=min_tokens
        ).collect()
    }
    assert got == expect


@given(st.lists(ch_expression(), min_size=1, max_size=2))
@settings(**SETTINGS)
def test_dialect_fuzz_executes_on_hazard_values(spark, exprs):
    """Beyond analysis: random CH expressions must EXECUTE over hazard
    inputs (0, negatives, NULL) — guards the rewriters against runtime
    ANSI errors (the r5 arrayAvg/arrayAUC/subscript DIVIDE_BY_ZERO and
    INVALID_ARRAY_INDEX class), not just paren/mask corruption."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    spark.sql(
        "SELECT * FROM VALUES (0L, 3L), (-2L, 0L), "
        "(7L, CAST(NULL AS BIGINT)) AS t(x, y)"
    ).createOrReplaceTempView("fuzz_exec_t")
    sel = ", ".join(f"({e}) AS c{i}" for i, e in enumerate(exprs))
    spark.sql(
        translate_clickhouse_sql(f"SELECT {sel} FROM fuzz_exec_t")
    ).collect()


@st.composite
def modifier_chain(draw):
    """Random SELECT-modifier chain over the fixed (a, b, cc, dd) view:
    base (* or COLUMNS regex) + shuffled EXCEPT/REPLACE/APPLY subset.
    Returns (sql_fragment, expected_items) where expected_items is the
    hand-computed [(expr, name)] expansion."""
    cols = ["a", "b", "cc", "dd"]
    if draw(st.booleans()):
        base_sql, items = "*", [(c, c) for c in cols]
    else:
        pat = draw(st.sampled_from(["a|b", "^c", "d", "a", "c{2}"]))
        import re as _re

        items = [(c, c) for c in cols if _re.search(pat, c)]
        base_sql = f"COLUMNS('{pat}')"
    mods = []
    if draw(st.booleans()):
        drop = draw(st.sampled_from(["a", "cc", "dd"]))
        mods.append((f"EXCEPT({drop})", ("except", [drop])))
    if draw(st.booleans()):
        tgt = draw(st.sampled_from(["b", "cc"]))
        mods.append(
            (f"REPLACE(({tgt} + 1) * 2 AS {tgt})", ("replace", [tgt]))
        )
    if draw(st.booleans()):
        fn = draw(st.sampled_from(["sum", "max", "min"]))
        mods.append((f"APPLY({fn})", ("apply", [fn])))
    for sql, (kind, args) in mods:
        if kind == "except":
            items = [it for it in items if it[1] != args[0]]
        elif kind == "replace":
            items = [
                (f"({args[0]} + 1) * 2", n) if n == args[0] else (e, n)
                for e, n in items
            ]
        else:
            items = [(f"{args[0]}({e})", f"{args[0]}({n})") for e, n in items]
    frag = " ".join([base_sql] + [s for s, _ in mods])
    return frag, items


@given(modifier_chain())
@settings(**SETTINGS)
def test_select_modifier_chain_matches_model(spark, chain):
    """Property: every random modifier chain expands to exactly the
    hand-computed column list with matching values (APPLY chains force a
    GROUP BY () via the aggregate shape — tested ungrouped on one row to
    keep values deterministic)."""
    from clickhouse_flatfile_tool_spark.dialect import translate_clickhouse_sql

    frag, items = chain
    if not items:
        return  # empty expansion passes through for Spark to error on
    spark.sql(
        "SELECT * FROM VALUES (1L, 2L, 3L, 4L) AS t(a, b, cc, dd)"
    ).createOrReplaceTempView("mod_prop_t")
    df = spark.sql(
        translate_clickhouse_sql(
            f"SELECT {frag} FROM mod_prop_t", spark=spark
        )
    )
    assert df.columns == [n for _, n in items]
    vals = {"a": 1, "b": 2, "cc": 3, "dd": 4}

    def ev(e):
        e = e.strip()
        for f in ("sum", "max", "min"):
            if e.startswith(f + "("):
                return ev(e[len(f) + 1 : -1])
        if e.startswith("(") and e.endswith(") * 2"):
            inner = e[1:-5]
            return (ev(inner.replace(" + 1", "")) + 1) * 2
        return vals[e]

    assert tuple(df.first()) == tuple(ev(e) for e, _ in items)


@given(
    st.lists(
        st.text(
            alphabet=" \t\n\rabc",  # whitespace-heavy on purpose,
            min_size=1,             # whitespace-ONLY texts included
            max_size=40,
        ),
        min_size=1,
        max_size=12,
        unique=True,
    ),
    st.integers(1, 20),
)
@settings(**SETTINGS)
def test_training_shards_whitespace_adversarial(spark, texts, tps):
    """assign_training_shards token counts match text.strip().split()
    under adversarial whitespace — leading/trailing \\t \\n \\r,
    internal runs, and whitespace-ONLY texts (which must count 0 tokens,
    the r9 review's boundary case) — and the md5-ordered global cumsum
    start-offset rule holds."""
    import hashlib

    from clickhouse_flatfile_tool_spark.operators.sampling import (
        assign_training_shards,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.shard)
        for r in assign_training_shards(df, tps).collect()
    }
    order = sorted(
        enumerate(texts),
        key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
    )
    cum = 0
    want = {}
    for doc_id, t in order:
        nt = len(t.strip().split())
        want[doc_id] = (nt, cum // tps)
        cum += nt
    assert got == want


@given(
    st.lists(st.sampled_from("abx"), min_size=0, max_size=60),
)
@settings(max_examples=300, deadline=None)
def test_sequence_count_regex_equivalence(chars):
    """The r10 sequence_count oracle's core claim, property-checked: for
    DISJOINT step conditions, the greedy left-to-right state machine
    (events.py::sequence_count's aggregate fold) counts exactly the
    leftmost non-overlapping matches of 'a[^b]*b' over the step string
    with no-op events dropped.  Pure-model twin — the Spark fold itself
    is covered by the hand-computed pytest; this defends the SQL replay's
    equivalence argument against future edits."""
    import re

    # state machine: prog advances on the NEXT step's char, counts and
    # resets on completing the last step; 'x' (matches no step) is a no-op
    prog = cnt = 0
    for c in chars:
        if prog == 0 and c == "a":
            prog = 1
        elif prog == 1 and c == "b":
            cnt += 1
            prog = 0
    s = "".join(c for c in chars if c != "x")
    assert cnt == len(re.findall("a[^b]*b", s))
    # the lazy-quantifier form the n-step generalization would use
    assert cnt == len(re.findall("a.*?b", s))


@given(
    st.lists(
        st.text(alphabet="pqr", min_size=1, max_size=3),
        min_size=0,
        max_size=20,
    ),
    st.text(alphabet="pqr", min_size=1, max_size=3),
    st.text(alphabet="pqr", min_size=1, max_size=3),
)
@settings(max_examples=300, deadline=None)
def test_bpe_merge_replace_equivalence(syms, left, right):
    """The r10 bpe_merges oracle's core claim, property-checked: applying
    merge (l, r) to a symbol sequence encoded with EACH symbol wrapped in
    its own delimiter pair (``\\x01sym\\x01``, concatenated) via string
    ``replace('\\x01l\\x01\\x01r\\x01', '\\x01lr\\x01')`` equals
    bpe_train's greedy left-to-right non-overlapping fold — replace scans
    left-to-right and resumes AFTER each replacement, exactly the fold's
    release-the-pending-symbol-on-merge rule (text.py::bpe_train).

    The wrapping matters: this test FOUND the naive single-separator
    encoding wrong — with ``' '.join``, merging (p, p) on [p, pp] matches
    'p p' across the symbol boundary ('pp' has the pattern's right side
    as a PREFIX), and a single shared delimiter breaks consecutive merges
    ([a,a,a,a] must give [aa,aa], which needs each boundary owned by one
    symbol).  Per-symbol wrapping anchors both pattern ends at full
    symbols and shares nothing."""
    # fold model mirroring bpe_train's aggregate (out, pend) state
    out, pend = [], ""
    for s in syms:
        if pend == "":
            pend = s
        elif pend == left and s == right:
            out.append(left + right)
            pend = ""
        else:
            out.append(pend)
            pend = s
    if pend != "":
        out.append(pend)

    D = "\x01"
    enc = "".join(D + s + D for s in syms)
    enc = enc.replace(f"{D}{left}{D}{D}{right}{D}", f"{D}{left}{right}{D}")
    assert out == [t for t in enc.split(D) if t != ""]
