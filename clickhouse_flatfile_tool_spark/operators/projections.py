"""ClickHouse PROJECTION analogs: stored pre-aggregations answered at
query time by re-aggregation.

Reference parity: ClickHouse ``ALTER TABLE t ADD PROJECTION p (SELECT
keys…, agg()… GROUP BY keys…)`` materializes a pre-aggregated copy inside
every part and its optimizer (``optimize_use_projections``) transparently
answers matching aggregate queries from the projection instead of the
base data.  The reference app inherits this whole capability from the
ClickHouse server; the Spark-first shape makes the two halves explicit:

* **build**: one partial-aggregate frame per projection — ``sum``/
  ``count``/``min``/``max`` cells keyed by the projection's GROUP BY.
  ``avg`` is NOT stored as an average: it decomposes into (sum, count)
  state columns, the same -State trick AggregatingMergeTree uses
  (``mergetree.py``), because averages don't re-aggregate.
* **answer**: a query grouping by any SUBSET of the projection keys
  re-aggregates the cells — sum of sums, sum of counts, min of mins,
  max of maxes, sum(sum)/sum(count) for avg.  This is the classic
  distributive/algebraic aggregate algebra (Gray et al., "Data Cube",
  1997); MEDIAN-class (holistic) aggregates are rejected.

At 100 TB the win is the same as ClickHouse's: the fact scan collapses to
|projection| rows — a daily (event_type, day) projection over years of
events is ~10⁴ cells answering any coarser rollup in milliseconds, and
re-aggregation shuffles cells, never raw rows.  Projections maintain
incrementally under append workloads (re-aggregation is associative, so
``mv_refresh``-style delta merges apply).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# aggregate algebra: how each supported aggregate decomposes into stored
# cell columns and how cells re-aggregate to answer a coarser grouping
_REAGG = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

_PROJ_PAT = re.compile(
    r"(?is)^\s*ALTER\s+TABLE\s+(\S+)\s+ADD\s+PROJECTION\s+(\w+)\s*\(\s*"
    r"SELECT\s+(.+?)\s+GROUP\s+BY\s+(.+?)\s*\)\s*;?\s*$"
)
_AGG_PAT = re.compile(r"(?is)^\s*(sum|count|min|max|avg)\s*\(\s*(\*|\w*)\s*\)\s*$")


def parse_projection(sql: str) -> tuple[str, str, list[str], list[tuple[str, str]]]:
    """Parse ``ALTER TABLE t ADD PROJECTION p (SELECT k…, agg(x)… GROUP BY
    k…)`` → (table, name, keys, [(agg_kind, column), …]).  Select items
    that aren't aggregates must be (a subset of) the GROUP BY keys, as in
    ClickHouse."""
    m = _PROJ_PAT.match(sql)
    if not m:
        raise ValueError(f"not an ADD PROJECTION statement: {sql!r}")
    table, name, select, group = m.groups()
    keys = [k.strip().strip("`") for k in group.split(",")]
    aggs: list[tuple[str, str]] = []
    for item in select.split(","):
        item = item.strip()
        am = _AGG_PAT.match(item)
        if am:
            kind, col = am.group(1).lower(), am.group(2)
            aggs.append((kind, col if col not in ("", "*") else keys[0]))
        elif item.strip("`") not in keys:
            raise ValueError(
                f"projection select item {item!r} is neither an aggregate "
                f"nor a GROUP BY key"
            )
    if not aggs:
        raise ValueError("projection needs at least one aggregate")
    return table, name, keys, aggs


def _cell_name(kind: str, col: str) -> str:
    return f"__{kind}_{col}"


def build_projection(
    df: DataFrame, keys: list[str], aggs: list[tuple[str, str]]
) -> DataFrame:
    """The stored projection frame: one row per key tuple with partial-
    state cells.  ``avg`` stores (sum, count); ``count`` counts non-NULL
    of its column (CH count(x) semantics; count(*) maps to the first
    key, always present).  One map-side-combinable aggregation — the
    only shuffle is on the projection keys."""
    cells: dict[str, F.Column] = {}
    for kind, col in aggs:
        if kind == "avg":
            cells[_cell_name("sum", col)] = F.sum(col)
            cells[_cell_name("count", col)] = F.count(col)
        elif kind == "count":
            cells[_cell_name("count", col)] = F.count(col)
        elif kind in _REAGG:
            cells[_cell_name(kind, col)] = getattr(F, kind)(col)
        else:
            raise ValueError(
                f"aggregate {kind!r} is not re-aggregable (holistic "
                f"aggregates can't live in a projection)"
            )
    return df.groupBy(*keys).agg(
        *[c.alias(n) for n, c in cells.items()]
    )


def can_answer(
    proj_keys: list[str],
    proj_aggs: list[tuple[str, str]],
    group_keys: list[str],
    want_aggs: list[tuple[str, str]],
) -> bool:
    """A projection answers (group_keys, want_aggs) when the grouping is a
    subset of the projection keys (cells re-aggregate upward, never
    downward) and every wanted aggregate's cells exist."""
    if not set(group_keys) <= set(proj_keys):
        return False
    have = set()
    for kind, col in proj_aggs:
        if kind == "avg":
            have |= {("sum", col), ("count", col), ("avg", col)}
        else:
            have.add((kind, col))
            if kind == "count":
                have.add(("count", col))
    for kind, col in want_aggs:
        if kind == "avg":
            if ("sum", col) not in have or ("count", col) not in have:
                return False
        elif (kind, col) not in have:
            return False
    return True


def answer_from_projection(
    proj: DataFrame,
    group_keys: list[str],
    want_aggs: list[tuple[str, str]],
    aliases: list[str] | None = None,
) -> DataFrame:
    """Re-aggregate projection cells to the coarser grouping: sum of
    sums, sum of counts, min of mins, max of maxes, avg = sum(sum)/
    sum(count) — exact, not approximate (the cells partition the rows)."""
    outs = []
    names = aliases or [f"{k}_{c}" for k, c in want_aggs]
    for (kind, col), alias in zip(want_aggs, names):
        if kind == "avg":
            outs.append(
                (
                    F.sum(_cell_name("sum", col))
                    / F.sum(_cell_name("count", col))
                ).alias(alias)
            )
        elif kind == "count":
            outs.append(F.sum(_cell_name("count", col)).alias(alias))
        else:
            outs.append(_REAGG[kind](_cell_name(kind, col)).alias(alias))
    return proj.groupBy(*group_keys).agg(*outs)


class ProjectionSet:
    """Per-table projection registry + the query-time chooser — the
    ``optimize_use_projections`` analog.  ``add`` parses the DDL and
    materializes the cells; ``query`` answers (group_keys, aggs) from the
    CHEAPEST matching projection (fewest keys ⇒ fewest cells — CH picks
    by estimated granules the same way) or falls back to the base frame
    when nothing matches."""

    def __init__(self, base: DataFrame):
        self.base = base
        self.projections: dict[str, tuple[list[str], list[tuple[str, str]], DataFrame]] = {}

    def add(self, sql: str, cache: bool = True) -> str:
        _table, name, keys, aggs = parse_projection(sql)
        frame = build_projection(self.base, keys, aggs)
        if cache:
            frame = frame.cache()
        self.projections[name] = (keys, aggs, frame)
        return name

    def refresh(self, delta: DataFrame, name: str, cache: bool = True) -> None:
        """Incremental maintenance under appends: the delta's cells merge
        into the stored cells by re-aggregation (cells are associative
        states — sum/count add, min/max combine), so a day's append costs
        |delta| + |cells|, never a rescan of the base — the
        ``mv_refresh`` delta pattern applied to projections.  ClickHouse
        gets this for free because projections live inside each new part;
        the explicit merge is the lakehouse equivalent."""
        keys, aggs, frame = self.projections[name]
        merged_src = frame.unionByName(build_projection(delta, keys, aggs))
        cell_cols = [c for c in frame.columns if c not in keys]
        merged = merged_src.groupBy(*keys).agg(
            *[
                (F.min(c) if c.startswith("__min_") else
                 F.max(c) if c.startswith("__max_") else F.sum(c)).alias(c)
                for c in cell_cols
            ]
        )
        if cache:
            merged = merged.cache()
        if frame.is_cached:
            frame.unpersist()
        self.projections[name] = (keys, aggs, merged)

    def drop(self, name: str) -> None:
        keys_aggs_frame = self.projections.pop(name, None)
        if keys_aggs_frame is not None and keys_aggs_frame[2].is_cached:
            keys_aggs_frame[2].unpersist()

    def choose(
        self, group_keys: list[str], want_aggs: list[tuple[str, str]]
    ) -> str | None:
        best: tuple[int, str] | None = None
        for name, (keys, aggs, _f) in self.projections.items():
            if can_answer(keys, aggs, group_keys, want_aggs):
                cand = (len(keys), name)
                if best is None or cand < best:
                    best = cand
        return best[1] if best else None

    def query(
        self,
        group_keys: list[str],
        want_aggs: list[tuple[str, str]],
        aliases: list[str] | None = None,
    ) -> DataFrame:
        name = self.choose(group_keys, want_aggs)
        if name is not None:
            _keys, _aggs, frame = self.projections[name]
            return answer_from_projection(frame, group_keys, want_aggs, aliases)
        # fallback: aggregate the base frame directly (CH reads the part)
        names = aliases or [f"{k}_{c}" for k, c in want_aggs]
        outs = []
        for (kind, col), alias in zip(want_aggs, names):
            fn = F.avg if kind == "avg" else getattr(F, kind)
            outs.append(fn(col).alias(alias))
        return self.base.groupBy(*group_keys).agg(*outs)
