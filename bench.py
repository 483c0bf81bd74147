#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Per-query timing = full plan execution to a count/collect-free sink
(df.write.format("noop")) so the measured cost is scan+compute+shuffle,
not driver materialization — mirroring the reference's per-cursor
throughput stats (benchmark/proto/benchmark.proto:11-75).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: headline queries: coverage across scan/filter/agg/join/sort/window/
#: dedup/similarity — the shapes that dominate at 100 TB.
HEADLINE = [
    "tpch_q1",
    "tpch_q5_shape",
    "filter_predicate",
    "hash_join_inner",
    "hash_join_left",
    "distinct_aggregate",
    "sort_topk",
    "first_last_aggregate",
    "stateful_running_sum",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_cosine_topk",
    "similarity_ivf_ann",
    "text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from supersonic_spark.session import get_spark

    from __spark_entry__ import queries

    spark = get_spark("supersonic_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    # warm the JVM + file listing once (excluded from timing)
    qs["tpch_q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Two runs per query: the first pays one-time costs (plan analysis,
    # whole-stage-codegen JIT, shuffle-file creation) that vary with session
    # age; the second is the steady-state execution the reference's bench
    # infra also isolates (OnCreateFinished vs OnBenchmarkFinished,
    # cursor/core/benchmarks.h:30-57).  Both are reported; `value` sums the
    # steady-state times.
    results: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        results[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(results.values()), 3),
                "unit": "sec",
                "queries": results,
                "cold_queries": cold,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
