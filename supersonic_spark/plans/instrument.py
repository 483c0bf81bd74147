"""Spy / benchmark wiretaps — cursor/core/spy.h:41-77 and
benchmark/proto/benchmark.proto:11-75.

The reference interposes a Spy cursor between operators to observe rows/
timing per Next() call.  Spark's native equivalents:

- ``spy(df, name, *metrics)`` → ``df.observe`` — zero-cost aggregate
  wiretap evaluated during the job (rows_processed ≈ count, plus any
  aggregate expression);
- ``BenchmarkListener`` → QueryExecutionListener capturing per-query wall
  time and observed metrics (the benchmark.proto vocabulary: wall time,
  rows processed, rows/s).

Both are plan-level: no extra pass over the data, unlike a cache+count
probe.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def spy(df: DataFrame, observation: Observation | None = None, *metrics: Column):
    """Spy (spy.h:41-77): attach an observation point.  Returns
    (wired DataFrame, Observation); after an action, ``observation.get``
    yields the metrics (default: rows_processed)."""
    obs = observation or Observation()
    cols = list(metrics) or [F.count(F.lit(1)).alias("rows_processed")]
    return df.observe(obs, *cols), obs


@dataclass
class BenchmarkRun:
    """One measured execution — the benchmark.proto:11-75 vocabulary subset
    that maps to Spark: wall time, rows, throughput."""

    name: str
    wall_sec: float
    rows: int

    @property
    def rows_per_sec(self) -> float:
        return self.rows / self.wall_sec if self.wall_sec > 0 else float("inf")


def benchmark_operation(name: str, df: DataFrame) -> BenchmarkRun:
    """BenchmarkOperation (cursor/core/benchmarks.h:30-57): run to a no-op
    sink and report wall/rows/throughput."""
    wired, obs = spy(df)
    t0 = time.perf_counter()
    wired.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    return BenchmarkRun(name=name, wall_sec=wall, rows=int(obs.get["rows_processed"]))
