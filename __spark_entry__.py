"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape through the
supersonic_spark operator layer) on sf0.001.
``queries()`` / ``oracle_sql()`` — the full catalog from
supersonic_spark.queries (one entry per implemented operator from
SURVEY.md §2 plus the training-data pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from supersonic_spark.queries import REGISTRY  # noqa: E402
import supersonic_spark.queries_expr  # noqa: E402,F401  (registers)
import supersonic_spark.queries_pipeline  # noqa: E402,F401  (registers)
import supersonic_spark.queries_tpch  # noqa: E402,F401  (registers)
import supersonic_spark.queries_analytics  # noqa: E402,F401  (registers)
import supersonic_spark.queries_quality  # noqa: E402,F401  (registers)
import supersonic_spark.queries_scale  # noqa: E402,F401  (registers)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = REGISTRY["tpch_q1"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ pipeline)."""
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query.  EVERY registry query has
    one: hash/approx operators use the error-bound-boolean pattern (exact
    values + invariant booleans recomputed by DuckDB) so nothing falls back
    to the weaker rows-only check."""
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
