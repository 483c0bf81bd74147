"""Sources & sinks (SURVEY.md §2.1).

- ``io``    — FileInput/FileOutput analogs (file_io.h:64-77) over Parquet/
  CSV/JSON/ORC: Parquet is the idiomatic replacement for the reference's
  private binary format (columnar, pushdown-capable, splittable).
- ``table`` — Table / TableRowWriter / TableSink analogs
  (cursor/infrastructure/table.h:49,101,212,300).
- ``repeating`` — RepeatingBlock test generator
  (testing/repeating_block.h).
- ``python_source`` — custom Python DataSource (splittable, pushdown-aware
  sequence source + incremental stream reader).
"""

from supersonic_spark.sources.io import (
    compact_dataset,
    file_input,
    file_output,
    write_bucketed_table,
    write_sorted,
    write_zordered,
)
from supersonic_spark.sources.table import Table

__all__ = [
    "compact_dataset",
    "file_input",
    "file_output",
    "Table",
    "write_bucketed_table",
    "write_sorted",
    "write_zordered",
]
