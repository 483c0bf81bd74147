"""Custom data source in pure Python (Spark 4 DataSource API).

The reference's FileInput reads a private format through a C++ cursor
(cursor/infrastructure/file_io.h:74-77); its Generate operator emits N
rows with no columns (cursor/core/generate.h:32) and Sequence() numbers
them (expression/infrastructure/terminal_expressions.h:60).  This module
is the Spark-native version of that extensibility story: a first-class
``spark.read.format(...)`` source implemented in Python, with the two
properties that matter at 100 TB —

- **splittable**: ``partitions()`` carves the row range into independent
  slices, one task each (parallelism is the source's job, not a
  repartition's);
- **pushdown-aware**: ``pushFilters`` narrows the generated range for
  ``id`` comparisons BEFORE any row exists, the custom-source equivalent
  of parquet predicate pushdown (SURVEY.md §4.1).

A bounded incremental stream reader (SimpleDataSourceStreamReader) backs
the same source for readStream — each micro-batch emits ``step`` more
rows of the sequence, with offset-based replay.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)


class _SeqPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SeqReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters):
        """Narrow [lo, hi) for simple comparisons on ``id``; anything else
        is returned as unsupported and Spark re-applies it post-scan."""
        for f in filters:
            handled = True
            if isinstance(f, IsNotNull) and tuple(f.attribute) == ("id",):
                pass  # id is never null — trivially satisfied
            elif isinstance(f, (EqualTo, GreaterThan, GreaterThanOrEqual,
                                LessThan, LessThanOrEqual)) and tuple(f.attribute) == ("id",):
                # only exact integer values narrow the range; a str/bool/
                # non-integral-float comparison value is yielded back as
                # unsupported and Spark evaluates it post-scan instead of
                # crashing the whole generator mid-plan
                v = f.value
                if (isinstance(v, bool) or not isinstance(v, (int, float))
                        or (isinstance(v, float)
                            and not (v == v and -1e18 < v < 1e18))
                        or int(v) != v):
                    yield f
                    continue
                v = int(v)
                if isinstance(f, EqualTo):
                    self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                else:  # LessThanOrEqual
                    self.hi = min(self.hi, v + 1)
            else:
                handled = False
            if not handled:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        k = max(1, min(self.num_partitions, hi - lo or 1))
        span = (hi - lo + k - 1) // k if hi > lo else 0
        if span == 0:
            return [_SeqPartition(lo, lo)]
        return [
            _SeqPartition(lo + i * span, min(lo + (i + 1) * span, hi))
            for i in range(k)
            if lo + i * span < hi
        ]

    def read(self, partition: _SeqPartition):
        for i in range(partition.start, partition.end):
            yield (i,)


class _SeqStreamReader(SimpleDataSourceStreamReader):
    """Bounded incremental sequence: batch b emits rows
    [b*step, min((b+1)*step, n)) — deterministic offsets, exact replay."""

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.step = int(options.get("step", 100))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = int(start["pos"])
        end = min(pos + self.step, self.n)
        return (iter([(i,) for i in range(pos, end)]), {"pos": end})

    def readBetweenOffsets(self, start, end):
        return iter([(i,) for i in range(int(start["pos"]), int(end["pos"]))])


class SequenceDataSource(DataSource):
    """``spark.read.format("supersonic_seq").option("n", N).load()`` →
    one BIGINT column ``id`` holding 0..N-1.  Options: ``n`` (row count),
    ``numPartitions`` (batch split width), ``step`` (stream batch size)."""

    @classmethod
    def name(cls) -> str:
        return "supersonic_seq"

    def schema(self) -> str:
        return "id BIGINT"

    def reader(self, schema) -> _SeqReader:
        return _SeqReader(self.options)

    def simpleStreamReader(self, schema) -> _SeqStreamReader:
        return _SeqStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with a session (and enable Python
    filter pushdown, without which Spark refuses a pushFilters reader)."""
    from supersonic_spark.session import apply_runtime_conf

    apply_runtime_conf(spark)
    spark.dataSource.register(SequenceDataSource)
