#!/usr/bin/env python
"""Dump full .explain("formatted") output per headline query into
plans/r09/<query>_<suffix>.txt — the optimization round's before/after
evidence artifacts.

    python tools/dump_plans_r09.py before [query ...]
    python tools/dump_plans_r09.py after  [query ...]

Captures the SAME callables bench.py times (registry queries plus the
pure-operator overrides for the hash/approx names) so the plan files
match the benchmarked plans.  SPARK_GRAFT_SF_DIR picks the data dir
(default the bench-optimized sf0.1 copy when present, else raw sf0.1 —
plan shape is layout-independent except for scan split counts).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    default_dir = "/tmp/ss_bench_opt_root_testdata_sf0.1"
    if not os.path.isdir(default_dir):
        default_dir = "/root/testdata/sf0.1"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", default_dir)

    from supersonic_spark.session import get_spark

    import bench
    from __spark_entry__ import queries

    spark = get_spark("dump_plans_r09")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(queries(), **bench._operator_overrides())
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r09")
    os.makedirs(outdir, exist_ok=True)

    names = [n for n in bench.HEADLINE if not only or n in only]
    names += [n for n in only if n not in bench.HEADLINE and n in qs]
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"query: {name}\nsf_dir: {sf_dir}\n\n{plan}")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
