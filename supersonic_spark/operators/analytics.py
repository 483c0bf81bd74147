"""Analytics operators beyond the reference's surface (supersonic has no
window functions, pivot, or percentiles at all — SURVEY.md §2.7 notes the
stateful expressions are its only window-like capability).  These are the
standard OLAP shapes a user migrating from any engine expects, expressed
as thin operator-layer wrappers so they compose with the rest.

Scale notes:
- ranking windows shuffle once on the partition keys; a global (no-key)
  window funnels through one task — callers get a warning-by-docstring to
  pre-aggregate or add keys at corpus scale;
- pivot with an explicit value list avoids the extra distinct-scan pass
  Spark otherwise runs to discover column values;
- percentiles: ``exact=True`` uses percentile() (sort-based, exact — fine
  per group); ``exact=False`` uses approx_percentile (t-digest sketch,
  single pass, mergeable — the 100 TB default).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _cols(xs) -> list[Column]:
    if xs is None:
        return []
    if not isinstance(xs, (list, tuple)):
        xs = [xs]
    return [_c(x) for x in xs]


#: name -> zero-arg ranking function
_RANKERS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
    "percent_rank": F.percent_rank,
    "cume_dist": F.cume_dist,
}


def window_rank(
    df: DataFrame,
    partition,
    order,
    rankers: dict[str, str],
    ntile: dict[str, int] | None = None,
) -> DataFrame:
    """Append ranking columns over a (partition, order) window.

    ``rankers`` maps output column -> one of row_number | rank | dense_rank
    | percent_rank | cume_dist; ``ntile`` maps output column -> bucket
    count.  One shuffle on the partition keys; rows stay intact.
    """
    w = Window.partitionBy(*_cols(partition)).orderBy(*_cols(order))
    out = df
    for name, kind in rankers.items():
        try:
            fn = _RANKERS[kind]
        except KeyError:
            raise ValueError(f"unknown ranker {kind!r}; one of {sorted(_RANKERS)}")
        out = out.withColumn(name, fn().over(w))
    for name, n in (ntile or {}).items():
        out = out.withColumn(name, F.ntile(n).over(w))
    return out


def top_n_per_group(
    df: DataFrame, partition, order, n: int, rank_col: str = "rn"
) -> DataFrame:
    """Keep the first ``n`` rows of each group under ``order`` — the
    classic top-N-per-key.  Uses row_number (deterministic given a total
    order), filtered before anything downstream so only n×groups rows
    survive the window stage."""
    w = Window.partitionBy(*_cols(partition)).orderBy(*_cols(order))
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


def pivot_table(
    df: DataFrame,
    keys: list[str],
    pivot_col: str,
    values: list,
    agg: Column,
) -> DataFrame:
    """Pivot ``pivot_col``'s values into columns, aggregated by ``agg``.
    ``values`` is REQUIRED (the implicit-discovery form runs an extra
    distinct job over the corpus first — never acceptable at scale)."""
    return df.groupBy(*_cols(keys)).pivot(pivot_col, values).agg(agg)


def percentile_aggregate(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    percentiles: list[float],
    exact: bool = False,
    accuracy: int = 10000,
    prefix: str = "p",
) -> DataFrame:
    """Grouped percentiles: one output column per requested percentile
    (``p50``, ``p95``, …).  ``exact`` trades a per-group sort for exact
    interpolated values; the default approx_percentile is a single-pass
    mergeable sketch (map-side combined) — the scale path."""
    v = _c(value_col)
    aggs = []
    for p in percentiles:
        name = f"{prefix}{int(p * 100) if (p * 100) == int(p * 100) else p}"
        if exact:
            aggs.append(F.percentile(v, F.lit(p)).alias(name))
        else:
            aggs.append(
                F.percentile_approx(v, F.lit(p), F.lit(accuracy)).alias(name)
            )
    return df.groupBy(*_cols(keys)).agg(*aggs)
