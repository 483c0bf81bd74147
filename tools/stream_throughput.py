#!/usr/bin/env python
"""Streaming-throughput evidence: SCALING.md covers the batch families;
this sweep measures the Structured Streaming surface — rows/sec through
three representative stateful operators at growing scale, drained via
``availableNow`` over a multi-file source so state genuinely carries
across micro-batches:

- ``sliding_agg``   — windowed_aggregate, 1 h windows sliding 30 min
                      (JVM stateful shuffle agg; every event in 2 windows)
- ``stream_dedup``  — dropDuplicatesWithinWatermark on event_id
                      (watermark-bounded key state)
- ``running_sum``   — applyInPandasWithState per-user cumulative sum
                      (the Arrow/Python stateful path — the slow lane,
                      measured so the cost is a number, not a guess)

The batch-vs-stream CORRECTNESS of these operators is pinned by the
oracle queries (`streaming_*`) and the metamorphic tests; this tool is
about throughput only.  Writes STREAMING.md.

Each SF's events table is re-laid-out into 16 files and drained with
maxFilesPerTrigger=2 → 8 micro-batches, so per-batch planning overhead
and state round-trips are IN the measurement (single-batch drains would
flatter every number).  Exponent read like SCALING.md: wall ∝ SF^e
between the two largest points; rows/sec is the operative metric — a
healthy stateful op holds rows/sec roughly flat as SF grows.

Usage: python tools/stream_throughput.py
  SPARK_GRAFT_STREAM_SFS   colon-separated sf dirs (default sf0.1, sf1, sf10)
  SPARK_GRAFT_STREAM_RUNS  steady repetitions (default 2; min-of-k)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SFS = [
    ("/root/testdata/sf0.1", 0.1),
    ("/tmp/supersonic_scale/sf1", 1.0),
    ("/tmp/supersonic_scale/sf10", 10.0),
]

SRC_ROOT = "/tmp/supersonic_scale/stream_src"
N_FILES = 16
FILES_PER_TRIGGER = 2


def _prepare_source(spark, sf_dir: str, label: str) -> tuple[str, int]:
    """Re-lay events into N_FILES part files (a realistic ingest tail the
    file stream can chunk); returns (dir containing events.parquet, rows)."""
    out = os.path.join(SRC_ROOT, label)
    dst = os.path.join(out, "events.parquet")
    src = os.path.join(sf_dir, "events.parquet")
    if not os.path.exists(os.path.join(dst, "_SUCCESS")):
        (spark.read.parquet(src).repartition(N_FILES)
         .write.mode("overwrite").parquet(dst))
    n = spark.read.parquet(dst).count()
    return out, n


def _drain(df, mode: str) -> None:
    sink = (df.writeStream.format("noop").outputMode(mode)
            .trigger(availableNow=True).start())
    if not sink.awaitTermination(1800):
        sink.stop()
        raise TimeoutError("drain exceeded 1800s")


def _ops(spark, src_dir: str):
    from pyspark.sql import functions as F

    from supersonic_spark.operators.aggregate import AggSpec, Aggregation
    from supersonic_spark.streaming.ops import (
        events_stream,
        stream_dedup,
        stream_running_sum,
        windowed_aggregate,
    )

    def sliding(e):
        agged = windowed_aggregate(
            e.withColumn("value_d", F.col("value").cast("decimal(12,2)")),
            "ts", "1 hour",
            [AggSpec(Aggregation.COUNT, None, "n"),
             AggSpec(Aggregation.SUM, "value_d", "total", output_type="double")],
            keys=["event_type"], slide="30 minutes", watermark="1 hour",
        )
        _drain(agged, "update")

    def dedup(e):
        _drain(stream_dedup(e, ["event_id"], ts_col="ts", watermark="1 hour"),
               "append")

    def running_sum(e):
        _drain(stream_running_sum(e, "user_id", "value"), "update")

    def run(fn):
        e = events_stream(spark, src_dir, max_files_per_trigger=FILES_PER_TRIGGER)
        fn(e)

    return {"sliding_agg": lambda: run(sliding),
            "stream_dedup": lambda: run(dedup),
            "running_sum": lambda: run(running_sum)}


def main() -> None:
    from supersonic_spark.session import get_spark

    env = os.environ.get("SPARK_GRAFT_STREAM_SFS")
    if env:
        sfs = []
        for p in env.split(":"):
            base = os.path.basename(p.rstrip("/"))
            sfs.append((p, float(base.replace("sf", ""))))
    else:
        sfs = [(p, s) for p, s in DEFAULT_SFS
               if os.path.exists(os.path.join(p, "events.parquet"))]
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_STREAM_RUNS", "2")))

    spark = get_spark("stream_throughput")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[float, tuple[float, int]]] = {}
    for sf_dir, sf in sfs:
        label = f"sf{sf:g}"
        src, n_rows = _prepare_source(spark, sf_dir, label)
        ops = _ops(spark, src)
        for name, fn in ops.items():
            print(f"{label}  {name}  ({n_rows:,} rows) ...", flush=True)
            fn()  # warm (codegen + Arrow worker spin-up)
            best = float("inf")
            for _ in range(n_runs):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            results.setdefault(name, {})[sf] = (best, n_rows)
            print(f"  {best:7.2f}s  {n_rows / best:,.0f} rows/s", flush=True)

    sf_sorted = sorted({s for c in results.values() for s in c})
    hdr = " | ".join(f"sf{s:g} rows/s (wall s)" for s in sf_sorted)
    lines = [
        "# STREAMING — stateful-operator throughput vs scale",
        "",
        "Structured Streaming drains of the events table via availableNow,",
        f"{N_FILES} source files, maxFilesPerTrigger={FILES_PER_TRIGGER} → "
        f"{N_FILES // FILES_PER_TRIGGER} micro-batches per drain (state",
        "carries across batches; per-batch planning overhead included).",
        f"min of {n_runs} steady runs after one warm drain; generated by",
        "tools/stream_throughput.py on local[%s]."
        % os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count()),
        "",
        f"| operator | {hdr} | wall exponent |",
        "|" + "---|" * (len(sf_sorted) + 2),
    ]
    for name, cells in results.items():
        row = []
        for s in sf_sorted:
            if s in cells:
                w, n = cells[s]
                row.append(f"{n / w:,.0f} ({w:.2f})")
            else:
                row.append("-")
        exp = float("nan")
        if len(sf_sorted) >= 2 and all(s in cells for s in sf_sorted[-2:]):
            lo, hi = sf_sorted[-2], sf_sorted[-1]
            exp = (math.log(cells[hi][0] / cells[lo][0]) / math.log(hi / lo))
        lines.append(f"| {name} | {' | '.join(row)} | {exp:.2f} |")
    lines += [
        "",
        "Reading it: rows/sec holding (or rising — fixed overhead",
        "amortizing) as SF grows ⇒ the operator's state and shuffle scale",
        "with data, exponent ≈ 1.  The Python stateful lane (running_sum)",
        "is expected to trail the JVM lanes by the Arrow round-trip cost —",
        "that gap is the measured price of applyInPandasWithState, which",
        "is why only genuinely non-relational state goes there.",
    ]
    out = "\n".join(lines) + "\n"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "STREAMING.md"), "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
