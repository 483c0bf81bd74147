"""Streaming-throughput GATE: fail loudly when a stateful-operator
throughput collapse lands, instead of waiting for a human to re-read
STREAMING.md.

The batch side already has a loud regression surface (BENCH_r*.json
history, the 2x-vs-baseline grade); the streaming side only had the
periodic tools/stream_throughput.py sweep — a regression between sweeps
was invisible.  bench.py now drains the three representative stateful
operators at the bench SF and compares rows/sec against the floors
below; a violation is printed on stderr AND carried in the bench JSON
line (``streaming_gate``), so the per-round record shows the failure.

Floors encode "collapsed", not "slightly slower": the failure mode
being guarded is a stateful operator falling off the JVM/incremental
path (e.g. a state-store misconfiguration or an accidental per-row
Python lane), which costs 5-100x, never 1.3x.  Healthy-host sf0.1
drains measure ≈18.7k / 23.1k / 14.1k rows/s (STREAMING.md); the
floors sit at roughly a QUARTER of that, not half, after the round-9
recalibration below.  They are calibrated to the sf0.1 drain on a
~32-thread host and are only applied at that config (bench.py skips
the gate at other SFs — at sf0.001 fixed per-batch planning overhead
dominates and rows/sec is meaningless).

Round-9 recalibration (the round-8 verdict's adjudication item).  The
original floors (half of one host's run: 9k/11k/7k) sat INSIDE the
measured noise band of a shared host, and the most exposed cell is
structural, not a regression:

- ``running_sum`` is the only Python-lane streaming op
  (applyInPandasWithState).  Profiled at 32 cores: its 32-task state
  stages show ~800 ms executorRunTime per task against ~12 ms of CPU —
  the tasks WAIT on the per-group Arrow/state protocol (~0.55 ms per
  group per batch, measured by a 1500-key vs 32-key A/B) plus a
  ~1 s/micro-batch fixed Python-state-runner cost (a stateless
  mapInPandas drain of the same stream costs ~0.5 s/batch; a JVM
  stateless drain ~0.3 s).  Worker reuse is fine (34 distinct worker
  PIDs across a whole drain); 8 vs 32 shuffle partitions is within
  noise on an idle host, so partition right-sizing does NOT fix it —
  the cost is per-group, not per-partition.
- That protocol wait is jitter-AMPLIFIED: byte-identical drains
  measured 10.8-50.2 s in one round-9 session (4.7k-9.3k rows/s idle,
  2k under a co-tenant burst), while the JVM ops moved far less.  The
  driver's round-8 reading (2,334 rows/s at 32 cores, PASS at 8) is
  inside that band, not a code collapse — the code was byte-identical
  to what measured 14.1k on a healthy host and 11.3k on the r8-build
  host.
- A genuine collapse of the guarded kind lands 10-100x below healthy
  (hundreds of rows/s), so quarter-of-healthy floors still catch it
  while not flagging protocol jitter.  bench.py additionally takes the
  best of TWO timed drains per operator so one burst cannot fail the
  gate alone.
"""

from __future__ import annotations

import os
import time

#: rows/sec floors at the tracked bench config (sf0.1 events drain,
#: 16 source files, maxFilesPerTrigger=2 -> 8 micro-batches) — about a
#: quarter of the healthy-host drains (see module docstring for the
#: round-9 recalibration rationale).
STREAM_FLOORS: dict[str, float] = {
    "sliding_agg": 4_500.0,
    "stream_dedup": 5_500.0,
    "running_sum": 2_000.0,
}

N_FILES = 16
FILES_PER_TRIGGER = 2


def check_streaming_gate(
    measured: dict[str, float], floors: dict[str, float] | None = None
) -> list[str]:
    """Pure gate predicate: return one violation string per operator whose
    measured rows/sec is below its floor (or missing entirely — an operator
    that stopped producing a number is the loudest collapse of all).
    Empty list = gate passes.  Separated from the measurement so the gate
    itself is unit-testable with injected numbers."""
    floors = STREAM_FLOORS if floors is None else floors
    out = []
    for name, floor in floors.items():
        got = measured.get(name)
        if got is None:
            out.append(f"{name}: no measurement (expected >= {floor:,.0f} rows/s)")
        elif got < floor:
            out.append(
                f"{name}: {got:,.0f} rows/s < floor {floor:,.0f} "
                f"(collapse: {floor / max(got, 1e-9):.1f}x below)"
            )
    return out


def measure_streaming_throughput(
    spark, sf_dir: str, runs: int = 1, src_root: str | None = None
) -> dict[str, float]:
    """Drain the three representative stateful operators over the events
    table via ``availableNow`` (multi-file source -> state carries across
    micro-batches) and return steady rows/sec per operator.  Same drain
    shape as tools/stream_throughput.py, sized for a per-bench-run probe:
    one warm drain + min-of-``runs`` timed drains per operator."""
    from pyspark.sql import functions as F

    from supersonic_spark.operators.aggregate import AggSpec, Aggregation
    from supersonic_spark.streaming.ops import (
        events_stream,
        stream_dedup,
        stream_running_sum,
        windowed_aggregate,
    )

    src_root = src_root or os.path.join("/tmp", "ss_bench_stream_src")
    tag = sf_dir.rstrip("/").replace("/", "_")
    out_dir = os.path.join(src_root, tag)
    dst = os.path.join(out_dir, "events.parquet")
    if not os.path.exists(os.path.join(dst, "_SUCCESS")):
        (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
         .repartition(N_FILES).write.mode("overwrite").parquet(dst))
    n_rows = spark.read.parquet(dst).count()

    def _drain(df, mode: str) -> None:
        sink = (df.writeStream.format("noop").outputMode(mode)
                .trigger(availableNow=True).start())
        if not sink.awaitTermination(1800):
            sink.stop()
            raise TimeoutError("streaming gate drain exceeded 1800s")

    def sliding() -> None:
        e = events_stream(spark, out_dir, max_files_per_trigger=FILES_PER_TRIGGER)
        agged = windowed_aggregate(
            e.withColumn("value_d", F.col("value").cast("decimal(12,2)")),
            "ts", "1 hour",
            [AggSpec(Aggregation.COUNT, None, "n"),
             AggSpec(Aggregation.SUM, "value_d", "total", output_type="double")],
            keys=["event_type"], slide="30 minutes", watermark="1 hour",
        )
        _drain(agged, "update")

    def dedup() -> None:
        e = events_stream(spark, out_dir, max_files_per_trigger=FILES_PER_TRIGGER)
        _drain(stream_dedup(e, ["event_id"], ts_col="ts", watermark="1 hour"),
               "append")

    def running_sum() -> None:
        e = events_stream(spark, out_dir, max_files_per_trigger=FILES_PER_TRIGGER)
        _drain(stream_running_sum(e, "user_id", "value"), "update")

    ops = {"sliding_agg": sliding, "stream_dedup": dedup,
           "running_sum": running_sum}
    measured: dict[str, float] = {}
    for name, fn in ops.items():
        fn()  # warm: codegen + Arrow worker spin-up, state-store init
        best = float("inf")
        for _ in range(max(1, runs)):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        measured[name] = n_rows / best if best > 0 else 0.0
    return measured
