"""Scalable contiguous row-id assignment.

The reference's positional operators (Coalesce coalesce.h:17-40,
RowidMergeJoin rowid_merge_join.h:24-49, ScanViewWithSelection
scan_view.h:43-49, SortPermutation sort.h:39-67) rely on physical row order.
Spark guarantees no implicit order, so SURVEY.md §7.4 item 1 mandates an
explicit row-id discipline.

Two implementations:

- ``with_row_id(df, order)`` — **scalable two-pass**: range-repartition on
  the order keys, sort within partitions, count rows per partition (tiny
  driver-side collect of one long per partition), then add
  partition-offset + local index via ``mapInPandas`` (Arrow-batched; no
  single-task global window).  This is the 100 TB path: the only global
  coordination is the per-partition count array.

- ``with_row_id_window(df, order)`` — window ``row_number() - 1``; single
  task for the final stage; fine for small/dimension data and for oracle
  comparison tests.

Both produce identical values for a total (tie-free) ``order``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__ss_pid"


def _order_cols(order) -> list[Column]:
    if not isinstance(order, (list, tuple)):
        order = [order]
    return [F.col(o) if isinstance(o, str) else o for o in order]


def with_row_id_window(df: DataFrame, order, name: str = "row_id") -> DataFrame:
    w = Window.partitionBy().orderBy(*_order_cols(order))
    return df.withColumn(name, F.row_number().over(w) - 1)


def with_row_id(df: DataFrame, order, name: str = "row_id",
                num_partitions: int | None = None) -> DataFrame:
    """Contiguous 0-based row ids in ``order``, without a global window.

    Pass 1: rows land in range partitions of the order keys and are sorted
    within each; a groupBy(partition_id).count() (one row per partition)
    resolves the global offsets.  Pass 2: mapInPandas stamps
    offset + local position.  Requires a deterministic total order for
    reproducible ids (ties get a stable but arbitrary relative order).
    """
    cols = _order_cols(order)
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    arranged = (
        df.repartitionByRange(parts, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(_PID, F.spark_partition_id())
    )
    from supersonic_spark.session import track_persist

    arranged = track_persist(arranged)
    counts = {
        r[_PID]: r["cnt"]
        for r in arranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    from pyspark.sql import types as T

    # note: StructType.add mutates in place — build a fresh schema
    out_schema = T.StructType(df.schema.fields + [T.StructField(name, T.LongType(), False)])
    in_cols = df.columns

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets[int(pdf[_PID].iloc[0])]
            out = pdf[in_cols].copy()
            out[name] = range(base + local, base + local + len(pdf))
            local += len(pdf)
            yield out

    return arranged.mapInPandas(stamp, out_schema)
