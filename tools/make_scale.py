#!/usr/bin/env python
"""Synthesize a LARGER scale factor from the driver's read-only sf0.1
tables, so the scaling curve gets a point where data — not scheduler
overhead — dominates.  The driver generates sf0.001/0.01/0.1 only; this
tool replicates sf0.1 K times into a scratch dir (default /tmp) with the
transformations needed to keep every query's semantics honest at the
bigger size:

- **Fact keys stride per replica** (custkey/orderkey/partkey/suppkey/
  event_id/user_id/doc_id/vec_id += r * stride, stride = next power of 10
  above the max key), so referential integrity holds inside each replica
  and keys never collide across replicas — joins scale like real data,
  with the same fan-out per key as sf0.1.
- **Dimension tables (region/nation) stay fixed**, exactly like TPC-H,
  where nation/region are SF-invariant.
- **Document text gets a per-replica word suffix** (``word`` →
  ``word_r3``): every shingle in replica 3 differs from every shingle in
  replica 0, so replication creates ZERO new near-dup pairs — MinHash /
  SimHash / Jaccard pair counts grow linearly (per replica), not
  quadratically (cross-replica).  n_chars is recomputed from the new text.
- **Embeddings get a per-replica seeded dimension permutation** — norms
  and coordinate distributions are preserved exactly, but a vector and
  its permuted copy are far apart in cosine, so ANN/near-dup structure
  also grows linearly.  r=0 is the identity for every table: sfK strictly
  contains sf0.1.

Usage: python tools/make_scale.py [K] [outdir]
  K       replication factor (default 10 → "sf1", ~6M lineitem rows)
  outdir  default /tmp/supersonic_scale/sf{K/10}
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")

#: integer key columns that stride per replica, per table
STRIDE_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

COPY_TABLES = ["region", "nation"]


def _stride_for(con: duckdb.DuckDBPyConnection, table: str, col: str) -> int:
    mx = con.execute(
        f"SELECT MAX({col}) FROM '{SRC}/{table}.parquet'"
    ).fetchone()[0]
    s = 1
    while s <= mx:
        s *= 10
    return s


def _key_strides(con: duckdb.DuckDBPyConnection) -> dict[str, int]:
    """One stride per key FAMILY (o_custkey strides like c_custkey)."""
    fam = {
        "c_custkey": ("customer", "c_custkey"),
        "s_suppkey": ("supplier", "s_suppkey"),
        "p_partkey": ("part", "p_partkey"),
        "o_orderkey": ("orders", "o_orderkey"),
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
        "doc_id": ("documents", "doc_id"),
        "vec_id": ("embeddings", "vec_id"),
    }
    strides = {k: _stride_for(con, t, c) for k, (t, c) in fam.items()}
    strides["o_custkey"] = strides["c_custkey"]
    strides["l_orderkey"] = strides["o_orderkey"]
    strides["l_partkey"] = strides["p_partkey"]
    strides["l_suppkey"] = strides["s_suppkey"]
    return strides


def _replicate_sql(con, table: str, k: int, strides: dict[str, int], out: str):
    """K-way replicate a fact table with strided keys via one DuckDB COPY."""
    cols = [
        c[0]
        for c in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'"
        ).fetchall()
    ]
    sel = []
    for c in cols:
        if c in STRIDE_KEYS.get(table, []):
            sel.append(f"({c} + r.r * {strides[c]}) AS {c}")
        elif table == "documents" and c == "text":
            # r=0 keeps the original text; r>0 suffixes every word so no
            # shingle survives across replicas (see module docstring)
            sel.append(
                "CASE WHEN r.r = 0 THEN text ELSE "
                "regexp_replace(text, '(\\S+)', '\\1_r' || r.r, 'g') END AS text"
            )
        elif table == "documents" and c == "n_chars":
            sel.append(
                "CASE WHEN r.r = 0 THEN n_chars ELSE length("
                "regexp_replace(text, '(\\S+)', '\\1_r' || r.r, 'g')"
                ")::BIGINT END AS n_chars"
            )
        else:
            sel.append(c)
    con.execute(
        f"""
        COPY (
          SELECT {", ".join(sel)}
          FROM '{SRC}/{table}.parquet', (SELECT unnest(range({k})) AS r) r
          ORDER BY r.r
        ) TO '{out}/{table}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)
        """
    )


def _replicate_embeddings(k: int, stride: int, out: str):
    """Replicate embeddings with a per-replica seeded dim permutation."""
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = t.column("vec_id").to_numpy()
    label = t.column("label").to_numpy()
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    ids, vecs, labels = [], [], []
    for r in range(k):
        perm = (
            np.arange(dim)
            if r == 0
            else np.random.default_rng(1234 + r).permutation(dim)
        )
        ids.append(vec_id + r * stride)
        vecs.append(emb[:, perm])
        labels.append(label)
    allv = np.concatenate(vecs)
    out_t = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(allv.reshape(-1), type=pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(np.concatenate(labels), type=pa.int32()),
        }
    )
    pq.write_table(out_t, f"{out}/embeddings.parquet", row_group_size=65536)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf = k / 10.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/tmp/supersonic_scale/sf{sf:g}"
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    strides = _key_strides(con)
    for tbl in COPY_TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{tbl}.parquet') TO "
            f"'{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    for tbl in STRIDE_KEYS:
        if tbl == "embeddings":
            _replicate_embeddings(k, strides["vec_id"], out)
        else:
            _replicate_sql(con, tbl, k, strides, out)
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{tbl}.parquet'").fetchone()[0]
        print(f"{tbl}: {n} rows")
    print(f"wrote sf{sf:g} ({k}x sf0.1) to {out}")


if __name__ == "__main__":
    main()
