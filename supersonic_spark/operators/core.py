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


#: logical-plan node names that change partitioning downstream of the scan —
#: when any is present, getNumPartitions() reflects a real exchange and the
#: scan-split bound below does not apply.
_EXCHANGE_NODES = (
    "Join", "Aggregate", "Repartition", "Sort", "Window", "Deduplicate",
    "Distinct", "Intersect", "Except", "GlobalLimit", "CoGroup", "FlatMapGroups",
)


def _narrow_from_scan(df: DataFrame) -> bool:
    """True when ``df``'s logical plan is scan + narrow ops only (no node
    that re-partitions), so its task parallelism is exactly the scan's."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # pragma: no cover — e.g. Spark Connect
        return False
    return not any(n in plan for n in _EXCHANGE_NODES)


def _parse_bytes(v: str) -> int:
    v = str(v).strip().lower().rstrip("b")
    for suf, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if v.endswith(suf):
            return int(float(v[:-1]) * mult)
    return int(v)


def effective_scan_splits(df: DataFrame, max_files: int = 256) -> int | None:
    """Upper bound on the number of scan tasks that will actually RECEIVE
    rows, from the parquet footers of the files backing ``df``.

    Spark splits a parquet file into byte ranges of ``maxPartitionBytes``,
    but a row group is assigned to the ONE split containing its midpoint —
    a 182 MB single-row-group file reports 2 partitions while only one task
    gets rows.  ``getNumPartitions()`` counts byte ranges; this counts
    min(row groups, byte ranges) per file, which is what bounds effective
    parallelism.  Returns None when the answer is "not a small file scan"
    (no input files, or more than ``max_files`` of them — then splits are
    plentiful and footer-probing from the driver would be the real cost),
    in which case callers should trust getNumPartitions.

    Remote stores (s3/gs/abfs/hdfs/...): footers are NOT probed — a driver
    round-trip per file against an object store is exactly the cost this
    function must never add.  Instead the bound is LISTING-based and
    pessimistic: one effective task per remote file (``inputFiles`` is
    already materialized driver-side by the scan, so this costs nothing).
    A remote file could be single-row-group — the sf30 cliff this bound
    exists for — and assuming it errs in the protective direction: worst
    case, a well-laid-out few-file remote table pays one benign round-robin
    exchange before a CPU-dense fold; the miss it prevents is that fold
    serializing onto a handful of tasks.  Past ``max_files`` remote files
    the answer is None (splits plentiful), same as local.
    """
    import math
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = list(df.inputFiles())
    except Exception:  # pragma: no cover
        return None
    if not files or len(files) > max_files:
        return None
    try:
        mpb = _parse_bytes(
            df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
    except Exception:  # pragma: no cover
        mpb = 128 * 1024 * 1024
    try:
        import pyarrow.parquet as pq
    except Exception:  # pragma: no cover — pyarrow is a hard dep in practice
        return None
    bound = 0
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("", "file"):
            # remote store: never footer-probe from the driver — count the
            # file as ONE effective task (listing-based pessimistic bound;
            # see docstring).  Unsplittable-compression suffixes are exact,
            # parquet/text are the conservative assumption.
            bound += 1
            continue
        path = unquote(p.path) or uri
        try:
            size = os.path.getsize(path)
        except OSError:
            return None
        if size == 0:
            continue
        splits = max(1, math.ceil(size / mpb))
        if path.endswith((".gz", ".zst", ".bz2")):
            bound += 1  # unsplittable compression: one task per file
        elif path.endswith(".parquet"):
            try:
                rgs = pq.ParquetFile(path).metadata.num_row_groups
            except Exception:
                return None
            bound += min(max(rgs, 1), splits)
        else:
            bound += splits  # line-splittable text formats
    return bound if bound > 0 else None


#: analyzed-plan nodes that preserve their single child's partition count
_PARTITION_PRESERVING = frozenset(
    {"Project", "Filter", "Generate", "SubqueryAlias", "MapInPandas",
     "PythonMapInArrow", "MapInArrow"}
)


def _pinned_repartition_count(df: DataFrame) -> int | None:
    """Output partition count provable from the ANALYZED logical plan
    alone: walk partition-preserving single-child nodes down from the
    root and return the explicit count of the first user repartition.

    Exists because the obvious ``df.rdd.getNumPartitions()`` is not a
    read-only probe under AQE: converting to an RDD forces
    ``AdaptiveSparkPlanExec`` to MATERIALIZE every upstream exchange —
    real shuffle jobs at query-CONSTRUCTION time, re-paid on every bench
    run and wholly discarded (the construction-time job the round-9
    profile found on each multimodal query).  Returns None whenever the
    count is not statically certain (keyless repartition without an
    explicit N is AQE-coalescible; joins/aggregates depend on runtime
    coalescing) — callers then fall back to the dynamic probe.
    """
    try:
        node = df._jdf.queryExecution().analyzed()
        for _ in range(200):
            cls = node.getClass().getSimpleName()
            if cls in _PARTITION_PRESERVING:
                if node.children().size() != 1:
                    return None
                node = node.children().head()
                continue
            if cls == "Repartition":
                # df.repartition(n): explicit count, exempt from AQE
                # coalescing.  shuffle=False is coalesce(n) — its output
                # is min(n, child count), not provable here.
                return int(node.numPartitions()) if node.shuffle() else None
            if cls == "RepartitionByExpression":
                opt = node.optNumPartitions()
                return int(opt.get()) if opt.isDefined() else None
            return None
    except Exception:  # pragma: no cover — e.g. Spark Connect
        return None
    return None


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Redistribute ``df`` round-robin when its plan yields fewer EFFECTIVE
    partitions than ``min_partitions`` (default: the cluster's default
    parallelism).

    For CPU-dense per-row operators (shingling, MinHash, regex scoring,
    embedding sketches) the work should scale with cores, not with however
    many input splits the source happened to produce — a single unsplittable
    file (one parquet row group, a gzip blob) otherwise serializes the whole
    stage on one task.  The repartition moves the data once; the dense
    compute it unblocks costs orders of magnitude more than that move.  When
    the source already has enough splits (the normal 100 TB case) this is a
    no-op with zero plan change.

    "Effective" matters: ``getNumPartitions()`` counts byte-range splits,
    and a single-row-group parquet file larger than ``maxPartitionBytes``
    reports ≥2 partitions while only ONE task gets rows (row groups are
    assigned by midpoint).  That exact cliff serialized the dedup/ANN fold
    stage at sf30 (SCALING.md round-6 addendum: 434 s with 30 idle cores)
    WITHOUT this function firing.  For scan-shaped plans over local parquet
    the effective count is therefore bounded by the footer's row-group
    count per byte range (:func:`effective_scan_splits`); plans downstream
    of an exchange keep the plain partition count, which is real there.
    """
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    # Static fast paths first: df.rdd is NOT free under AQE (it
    # materializes every upstream exchange as construction-time jobs —
    # see _pinned_repartition_count), so only pay it when the decision
    # genuinely needs the runtime partition count.
    pinned = _pinned_repartition_count(df)
    if pinned is not None:
        # same decision the dynamic probe would make: an explicit user
        # repartition is exempt from AQE coalescing, so its count IS the
        # plan's output count through the partition-preserving ops above
        return df if pinned >= min_partitions else df.repartition(min_partitions)
    if _narrow_from_scan(df):
        bound = effective_scan_splits(df)
        if bound is not None and bound < min_partitions:
            # the dynamic probe caps current at this bound, so it would
            # repartition no matter what getNumPartitions() reports
            return df.repartition(min_partitions)
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - plan not convertible; don't block
        return df
    if current >= min_partitions and _narrow_from_scan(df):
        bound = effective_scan_splits(df)
        if bound is not None:
            current = min(current, bound)
    if current >= min_partitions:
        return df
    return df.repartition(min_partitions)
