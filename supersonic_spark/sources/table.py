"""Table / TableRowWriter / TableSink — cursor/infrastructure/table.h.

The reference's Table is an appendable materialized block store that is
also an Operation (table.h:49): you append views/rows (AppendView
table.h:101; TableRowWriter table.h:212), then scan it.  Spark analog: an
accumulating list of DataFrames union-ed lazily — appends are metadata-only
until an action, and the scan is a normal parallel plan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession


class Table:
    """Appendable table (table.h:49).  ``to_df()`` is the ScanView."""

    def __init__(self, spark: SparkSession, schema) -> None:
        from supersonic_spark.schema import TupleSchema

        if isinstance(schema, TupleSchema):
            schema = schema.to_struct_type()
        self._spark = spark
        self._schema = schema if not isinstance(schema, str) else None
        self._schema_ddl = schema if isinstance(schema, str) else None
        self._parts: list[DataFrame] = []
        self._pending_rows: list[tuple] = []

    @property
    def schema(self):
        return self._schema or self._spark.createDataFrame([], self._schema_ddl).schema

    # --- AppendView (table.h:101) ---
    def append_view(self, df: DataFrame) -> "Table":
        self._flush_rows()
        self._parts.append(df)
        return self

    # --- TableRowWriter (table.h:212): AddRow().Int32(..).String(..) style
    #     collapses to plain tuples in Python ---
    def add_row(self, *values) -> "Table":
        self._pending_rows.append(tuple(values))
        return self

    def _flush_rows(self) -> None:
        if self._pending_rows:
            df = self._spark.createDataFrame(
                self._pending_rows, self._schema or self._schema_ddl
            )
            self._parts.append(df)
            self._pending_rows = []

    def row_count(self) -> int:
        return self.to_df().count()

    def clear(self) -> "Table":
        """Table::Clear — drop all data, keep schema."""
        self._parts = []
        self._pending_rows = []
        return self

    # --- the Operation interface: scan the accumulated table ---
    def to_df(self) -> DataFrame:
        self._flush_rows()
        if not self._parts:
            return self._spark.createDataFrame([], self._schema or self._schema_ddl)
        return reduce(lambda a, b: a.unionByName(b), self._parts)


def table_sink(table: Table, df: DataFrame) -> Table:
    """TableSink (table.h:300) — push a stream into a Table."""
    return table.append_view(df)
