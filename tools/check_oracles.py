#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, schema (arrow-level dtypes) and order-insensitive
values; report per-query PASS/FAIL with diagnostics.

Usage: python tools/check_oracles.py [--sf DIR] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize for order-insensitive compare: sort columns by name,
    normalize dtypes, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: repr(v))
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    a, b = canon(sdf), canon(odf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
                an, bn = av.to_numpy(), bv.to_numpy()
                both_nan = np.isnan(an) & np.isnan(bn)
                eq = (an == bn) | both_nan
                if not eq.all():
                    bad = int((~eq).sum())
                    idx = int(np.argmax(~eq))
                    diff = np.nanmax(np.abs(an - bn))
                    problems.append(
                        f"col {c}: {bad} value diffs (max abs {diff:.3e}; "
                        f"e.g. {an[idx]!r} vs {bn[idx]!r})"
                    )
            else:
                eq = (av == bv) | (av.isna() & bv.isna())
                if not eq.all():
                    bad = int((~eq).sum())
                    idx = int(np.argmax((~eq).to_numpy()))
                    problems.append(
                        f"col {c}: {bad} value diffs (e.g. {av.iloc[idx]!r} vs {bv.iloc[idx]!r}; "
                        f"dtypes {av.dtype}/{bv.dtype})"
                    )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from supersonic_spark.session import get_spark

    spark = get_spark("check_oracles")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.queries or list(qs)
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS" if len(sdf) >= 0 else "FAIL"
            print(f"{status}  {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: ORACLE ERROR\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name} ({len(sdf)} vs {len(odf)} rows):")
            for p in problems:
                print(f"      - {p}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
