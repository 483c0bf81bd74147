"""Core operators — SURVEY.md §2.1-2.2.

ScanView (cursor/core/scan_view.h:35), ScanViewWithSelection (:43-49),
Generate (cursor/core/generate.h:32), Project (cursor/core/project.h:30),
Compute (cursor/core/compute.h:32), Filter (cursor/core/filter.h:35),
Limit(offset, limit) (cursor/core/limit.h:29).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from supersonic_spark.operators.projector import as_projector


def scan_view(spark: SparkSession, rows, schema) -> DataFrame:
    """ScanView — cursor over an in-memory View (scan_view.h:35).

    ``schema`` may be a TupleSchema or a Spark StructType/DDL string.
    """
    from supersonic_spark.schema import TupleSchema

    if isinstance(schema, TupleSchema):
        schema = schema.to_struct_type()
    return spark.createDataFrame(rows, schema)


def scan_view_with_selection(df: DataFrame, selection: DataFrame | list[int],
                             row_id_order: list) -> DataFrame:
    """ScanViewWithSelection (scan_view.h:43-49) — emit rows addressed by a
    row-id selection vector; ids may repeat or skip rows.

    ``row_id_order`` defines the row-id assignment for ``df`` (the reference
    has physical row order; Spark needs an explicit one — SURVEY.md §4
    'positional operators need row-id discipline').  The selection keeps its
    own order via its position column.
    """
    from supersonic_spark.operators.rowid import with_row_id

    spark = df.sparkSession
    if isinstance(selection, list):
        sel = spark.createDataFrame([(i, rid) for i, rid in enumerate(selection)],
                                    "pos long, rid long")
    else:
        sel = selection
    base = with_row_id(df, row_id_order, "rid")
    out = sel.join(base, "rid", "inner")
    return out.drop("rid")


def generate(spark: SparkSession, count: int) -> DataFrame:
    """Generate(count) — N rows, zero columns (generate.h:32,35).  Spark
    requires ≥1 column; `spark.range` provides the idiomatic synthesizer and
    pairs with Sequence()/Const* exactly like the reference intends."""
    return spark.range(count)


def project(df: DataFrame, projector) -> DataFrame:
    """Project — select/reorder/rename, no computation (project.h:30,36)."""
    return as_projector(projector).apply(df)


def compute(df: DataFrame, exprs: dict[str, Column], keep_input: bool = False) -> DataFrame:
    """Compute — evaluate an expression tree per block (compute.h:32,36).

    ``exprs`` maps output name → Column, or → SQL string parsed by
    ``F.expr`` (the engine's analog of the reference's serialized
    expression trees, BuildExpressionFromProto
    serialization/build_expression_from_proto.h:29-31 / SURVEY.md §2.8:
    SQL text is the serialized form).  With ``keep_input`` the input
    attributes are passed through first (the reference's Compute emits only
    computed columns; pass-through is a Projector concatenation there).
    """
    cols = [F.col(c) for c in df.columns] if keep_input else []
    cols += [
        (F.expr(e) if isinstance(e, str) else e).alias(name)
        for name, e in exprs.items()
    ]
    return df.select(*cols)


def filter_op(df: DataFrame, predicate: Column, projector=None) -> DataFrame:
    """Filter — keep rows where the BOOL predicate is true; NULL ⇒ drop
    (filter.h:35,44 — matches SQL WHERE, hence Spark `.filter`).  Applies
    an optional result projector like the reference's built-in one."""
    out = df.filter(predicate)
    if projector is not None:
        out = as_projector(projector).apply(out)
    return out


def limit(df: DataFrame, count: int, offset: int = 0, order: list | None = None) -> DataFrame:
    """Limit(offset, limit) — skip ``offset`` rows then emit ≤``count``
    (limit.h:29,32).

    The reference's limit is order-defined by the input cursor; Spark needs
    the explicit ``order`` for a deterministic offset.  Without ``order`` and
    with offset=0 this is a plain (cheap, arbitrary-rows) LIMIT, which Spark
    executes without a global sort — prefer that form at scale.
    """
    if offset == 0:
        out = df
        if order is not None:
            out = out.orderBy(*order)
        return out.limit(count)
    if order is None:
        raise ValueError("offset>0 requires an explicit order (SURVEY.md §7.4)")
    return df.orderBy(*order).offset(offset).limit(count)


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Redistribute ``df`` round-robin when its plan yields fewer partitions
    than ``min_partitions`` (default: the cluster's default parallelism).

    For CPU-dense per-row operators (shingling, MinHash, regex scoring,
    embedding sketches) the work should scale with cores, not with however
    many input splits the source happened to produce — a single unsplittable
    file (one parquet row group, a gzip blob) otherwise serializes the whole
    stage on one task.  The repartition moves the data once; the dense
    compute it unblocks costs orders of magnitude more than that move.  When
    the source already has enough splits (the normal 100 TB case) this is a
    no-op with zero plan change.
    """
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - plan not convertible; don't block
        return df
    if current >= min_partitions:
        return df
    return df.repartition(min_partitions)
