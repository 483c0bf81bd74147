"""supersonic_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of google/supersonic (reference at
/root/reference, v0.9.4).

The reference is an embeddable single-machine columnar execution library
(supersonic/cursor/base/operation.h:35, cursor.h:131).  This package
re-expresses its capabilities Spark-first:

- ``supersonic_spark.schema``     — TupleSchema/Attribute/ENUM data model
  (reference: base/infrastructure/tuple_schema.h) mapped onto StructType.
- ``supersonic_spark.functions``  — the scalar expression library
  (reference: supersonic/expression/..., OperatorId enum in
  expression/proto/operators.proto:15-195) as pyspark Column factories,
  including the Quiet/Nulling/Signaling error-policy triples.
- ``supersonic_spark.operators``  — the operator inventory
  (reference: cursor/proto/cursors.proto:13-62) as DataFrame→DataFrame
  functions: Project/Compute/Filter, GroupAggregate/ScalarAggregate,
  Sort/Limit, HashJoin/RowidMergeJoin/ForeignFilter, MergeUnionAll/Coalesce,
  Generate.
- ``supersonic_spark.pipeline``   — beyond-reference large-scale training-data
  operators: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  similarity search (brute-force + LSH ANN), text analysis, multimodal
  column plumbing.
- ``supersonic_spark.streaming``  — Structured Streaming variants (extension;
  the reference has no streaming subsystem, SURVEY.md §2.9).

Design stance: declare logical plans with the DataFrame API and let
Catalyst/Tungsten pick physical strategy; Python/pandas UDFs only where
built-ins cannot express the semantics (SURVEY.md §7).
"""

from supersonic_spark.schema import (
    Attribute,
    EnumDefinition,
    Nullability,
    TupleSchema,
)
from supersonic_spark.session import get_spark, load_tables

__version__ = "0.1.0"

__all__ = [
    "Attribute",
    "EnumDefinition",
    "Nullability",
    "TupleSchema",
    "get_spark",
    "load_tables",
    "__version__",
]
