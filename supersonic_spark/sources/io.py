"""File I/O — the reference's FileInput/FileOutput + Sink contract
(cursor/infrastructure/file_io.h:64-77; Sink::Write/Finalize
writer.h:36-56).

The reference's on-disk format is a private block stream (file_io.h:16-19)
— intentionally not reproduced (SURVEY.md §2.1): Parquet is the engine's
canonical format because predicate pushdown, column pruning, partition
pruning and splittable scans come from it for free at 100 TB.

Scale defaults here:
- writes are partitioned (``partition_by``) so downstream scans prune;
- ``max_records_per_file`` bounds file sizes (small-file and giant-file
  problems both kill 1000-executor scans);
- reads never infer schema by default on CSV/JSON (full-scan inference is
  an accidental extra pass over 100 TB).
"""

from __future__ import annotations

import glob as glob_mod
import os

from pyspark.sql import DataFrame, SparkSession


def file_input(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """FileInput (file_io.h:74-77) — read a dataset.

    ``schema`` (TupleSchema | StructType | DDL string) is required for
    csv/json unless ``options['inferSchema']`` is explicitly set — schema
    inference is a full extra pass at scale.
    """
    from supersonic_spark.schema import TupleSchema

    if isinstance(schema, TupleSchema):
        schema = schema.to_struct_type()
    reader = spark.read.format(format)
    if schema is not None:
        reader = reader.schema(schema)
    elif format in ("csv", "json") and "inferSchema" not in options:
        raise ValueError(
            f"{format} read needs an explicit schema (or pass inferSchema=... "
            "knowingly) — inference is a full extra data pass at scale"
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def file_output(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    **options,
) -> None:
    """FileOutput sink (file_io.h:64; Sink contract writer.h:36-56) —
    Write+Finalize collapse into one atomic Spark write job."""
    writer = df.write.format(format).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_enum_encoded(
    df: DataFrame,
    path: str,
    enums: dict,
    mode: str = "error",
    **kwargs,
) -> dict:
    """Write ``df`` with the given string columns dictionary-encoded as
    ENUM ids (int32) plus a ``_supersonic_enums`` JSON sidecar holding each
    column's EnumDefinition — the end-to-end form of the reference's ENUM
    attributes (tuple_schema.h:42-75; NEWS v0.9.4 enum features).

    ``enums`` maps column name -> EnumDefinition | None; None trains the
    dictionary from the column's distinct values (a map-side-combined
    distinct — cheap for the low-cardinality columns enums are for; ids are
    assigned in sorted-name order, deterministic).  Returns the trained
    definitions.  At 100 TB the ids shrink storage and shuffle width, and
    parquet dictionary+RLE encodes them further.
    """
    from pyspark.sql import functions as F

    from supersonic_spark.schema import EnumDefinition

    resolved: dict[str, EnumDefinition] = {}
    for col, ed in enums.items():
        if ed is None:
            vals = [r[0] for r in df.select(col).where(F.col(col).isNotNull())
                    .distinct().collect()]
            ed = EnumDefinition.from_values(vals)
        resolved[col] = ed
    out = df
    for col, ed in resolved.items():
        out = out.withColumn(col, ed.encode_column(col))
    file_output(out, path, mode=mode, **kwargs)
    sidecar = [(c, ed.to_json()) for c, ed in resolved.items()]
    (df.sparkSession.createDataFrame(sidecar, "column string, enum_json string")
       .coalesce(1).write.mode("overwrite").json(path.rstrip("/") + "/_supersonic_enums"))
    return resolved


def read_enum_decoded(
    spark: SparkSession,
    path: str,
    decode: bool = True,
    **kwargs,
) -> DataFrame:
    """Read a dataset written by :func:`write_enum_encoded`.  With
    ``decode=True`` ENUM id columns come back as their names (the reference's
    name-based print path); with ``decode=False`` ids stay ints and the
    definitions are attached to ``df.enum_definitions`` either way."""
    from supersonic_spark.schema import EnumDefinition

    df = file_input(spark, path, **kwargs)
    side = spark.read.schema("column string, enum_json string").json(
        path.rstrip("/") + "/_supersonic_enums"
    )
    enums = {r["column"]: EnumDefinition.from_json(r["enum_json"]) for r in side.collect()}
    if decode:
        for col, ed in enums.items():
            if col in df.columns:
                df = df.withColumn(col, ed.decode_column(col))
    df.enum_definitions = enums
    return df


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    format: str = "parquet",
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Bucketing is the co-located-join primitive at 100 TB: two fact tables
    bucketed the same way on the join key join with NO exchange on either
    side (and no sort, if ``sort_cols`` matches) — the shuffle is paid once
    at write time and amortized over every subsequent join/aggregation on
    that key.  Requires a catalog table (bucket metadata lives there), not
    a bare path; ``path`` makes it an EXTERNAL table at that location
    (useful when the session's warehouse dir shouldn't own the data).
    """
    writer = df.write.format(format).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket-aware — scans preserve bucket info so
    joins/aggregations on the bucket key skip their exchange)."""
    return spark.table(table)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "error",
    row_group_bytes: int | None = None,
    **options,
) -> None:
    """Sort-on-write for data skipping: range-partition on ``sort_cols``
    (files own disjoint key ranges) and sort within each partition, so
    every parquet row group carries tight min/max stats on the sort keys.

    At 100 TB this is the scan-pruning lever AFTER partition pruning:
    a selective filter on the sort key skips whole files (disjoint ranges)
    and, within touched files, whole row groups (footer stats) — the
    reader does both automatically.  ``row_group_bytes`` tunes skipping
    granularity (parquet.block.size; smaller groups = finer skipping,
    more footer overhead).

    The range partitioner samples the sort keys (one extra lightweight
    job) — the write itself stays one shuffle.
    """
    from pyspark.sql import functions as F

    keys = [F.col(c) for c in sort_cols]
    out = (
        df.repartitionByRange(n_files, *keys)
        if n_files is not None
        else df.repartitionByRange(*keys)
    )
    out = out.sortWithinPartitions(*keys)
    if row_group_bytes is not None:
        options = {"parquet.block.size": str(row_group_bytes), **options}
    file_output(out, path, mode=mode, **options)


def zorder_key(cols: list, mins: list, maxs: list, bits: int = 16):
    """Morton (Z-order) interleave of ``cols`` normalized to ``bits``-bit
    ints via the given per-column [min, max] stats — a single LongType sort
    key whose order preserves multi-dimensional locality.

    Pure shift/or/multiply JVM expressions (whole-stage codegen; no UDF):
    column j contributes bit i of its normalized value to output bit
    ``i * n_cols + j``.  ``bits * len(cols)`` must be ≤ 63.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds 63-bit key space")
    scale = (1 << bits) - 1
    parts = []
    for j, (c, lo, hi) in enumerate(zip(cols, mins, maxs)):
        col = F.col(c) if isinstance(c, str) else c
        span = float(hi - lo) if hi != lo else 1.0
        norm = F.least(
            F.lit(scale),
            F.greatest(
                F.lit(0),
                ((col.cast("double") - F.lit(float(lo))) / F.lit(span) * scale).cast(
                    "long"
                ),
            ),
        )
        for i in range(bits):
            parts.append(F.shiftleft(F.shiftright(norm, i).bitwiseAND(F.lit(1)), i * n + j))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int | None = None,
    mode: str = "error",
    bits: int = 16,
    row_group_bytes: int | None = None,
    **options,
) -> None:
    """Z-order-on-write for MULTI-column data skipping: cluster rows by the
    Morton interleave of ``zorder_cols`` so row-group min/max stats stay
    tight on EVERY listed column — selective filters on any of them prune
    files/row groups, where a lexicographic sort (write_sorted) only skips
    well on its leading column.

    Cost: one lightweight stats job (min/max per column, a scan-local
    aggregate) + the same single range-partitioning shuffle as write_sorted.
    The z-key is a transient column, dropped before the write.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"__lo_{i}") for i, c in enumerate(zorder_cols)],
        *[F.max(c).alias(f"__hi_{i}") for i, c in enumerate(zorder_cols)],
    ).collect()[0]
    mins = [stats[f"__lo_{i}"] for i in range(len(zorder_cols))]
    maxs = [stats[f"__hi_{i}"] for i in range(len(zorder_cols))]
    key = zorder_key(zorder_cols, mins, maxs, bits=bits)
    out = df.withColumn("__zkey", key)
    out = (
        out.repartitionByRange(n_files, "__zkey")
        if n_files is not None
        else out.repartitionByRange("__zkey")
    )
    out = out.sortWithinPartitions("__zkey").drop("__zkey")
    if row_group_bytes is not None:
        options = {"parquet.block.size": str(row_group_bytes), **options}
    file_output(out, path, mode=mode, **options)


def compact_dataset(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    out_path: str | None = None,
    format: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a dataset into ⌈size/target⌉ files.

    The maintenance op every long-lived 100 TB table needs — streaming
    sinks and incremental appends accrete small files until listing and
    task-scheduling overhead dominate scans (one task per file).  Sizing
    comes from the filesystem (no data pass); the rewrite is one job with
    no shuffle keys (coalesce, not repartition, when shrinking the file
    count — avoids a full exchange).  Returns the target file count.

    ``out_path=None`` rewrites in place via a staging directory swap —
    atomic only per-rename; at production scale run compaction through a
    table format's transaction log instead (same plan, safe commit).
    Residue from a previously crashed compaction (``__compacting`` /
    ``__old.*`` directories) is cleared up front, the displaced original
    gets a unique suffix (so a stale leftover can never block the rename),
    and it is deleted only after the new data is in place — a crash at any
    point leaves either the old or the new dataset recoverable on disk.
    """
    import shutil
    import uuid

    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, fn))
    n_files = max(1, (total + target_file_bytes - 1) // target_file_bytes)
    base = path.rstrip("/")
    staged = out_path or (base + "__compacting")
    if out_path is None:
        # clear residue from any previously crashed run so rename can't
        # hit a non-empty destination and wedge compaction permanently
        for leftover in glob_mod.glob(base + "__old.*") + [staged]:
            if os.path.isdir(leftover):
                shutil.rmtree(leftover, ignore_errors=True)
    df = spark.read.format(format).load(path)
    (df.coalesce(int(n_files)).write.mode("overwrite").format(format).save(staged))
    if out_path is None:
        old = f"{base}__old.{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        try:
            os.rename(staged, path)
        except OSError:
            os.rename(old, path)  # roll back: restore the original
            raise
        shutil.rmtree(old)
    return int(n_files)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Raw-file ingest for multimodal corpora: one row per file with
    ``path``, ``modificationTime``, ``length``, ``content`` (binary) —
    the opaque-binary-column entry point for the pipeline.multimodal
    kernels (images/audio/video land as bytes + typed metadata).

    Scale shape: Spark's binaryFile source lists and splits by FILES
    (content is never split), so parallelism = file count; pushing
    ``glob`` into pathGlobFilter prunes at listing time, before any read.
    Very large single files should be sharded upstream — one file is one
    task here.
    """
    r = spark.read.format("binaryFile")
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    return r.load(path)


def read_text_files(
    spark: SparkSession,
    path: str,
    whole_text: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """Plain-text ingest: ``value`` string column — one row per line, or
    one row per FILE with ``whole_text=True`` (document-per-file corpora).
    Line mode splits large files across tasks; whole-text mode is
    file-per-task like read_binary_files (shard upstream).
    """
    return spark.read.text(path, wholetext=whole_text, lineSep=line_sep)
