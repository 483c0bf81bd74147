"""RepeatingBlock — testing/repeating_block.h: repeat a small block's rows
to synthesize arbitrarily large inputs (the reference's benchmark feeder).

Spark form: cross-join the block with ``spark.range(n_copies)`` — the range
side parallelizes, so a 10-row block fans out to billions of rows across
the cluster without driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repeating_block(block: DataFrame, n_copies: int, copy_col: str | None = None) -> DataFrame:
    rng = block.sparkSession.range(n_copies)
    rng = rng.withColumnRenamed("id", copy_col) if copy_col else rng.select(
        F.col("id").alias("__copy")
    )
    out = rng.crossJoin(F.broadcast(block))
    return out if copy_col else out.drop("__copy")
