"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``  — brute-force exact top-k: broadcast the (small) query
  set against the corpus; the dot product is an ordered JVM-side fold
  (zip_with + aggregate in double precision — deterministic summation
  order), ranking via per-query window.  Exact baseline; scales linearly in
  corpus size and is embarrassingly parallel.
- ``lsh_topk``     — random-hyperplane LSH bucketing: sign-bit sketches put
  near vectors in shared buckets; top-k is computed inside buckets only.
  The scale path: the corpus-wide shuffle key is the bucket id.  Recall is
  tunable via (planes, tables).

Hyperplanes are generated deterministically from xxhash64 of (table, plane,
dim) — reproducible across runs/clusters with no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a, b) -> Column:
    """Ordered-fold double dot product of two array columns (JVM-side)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "corpus_vec",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    Output: (query_id, corpus_id, similarity, rank), rank 1..k, ties broken
    by corpus id for determinism.  The query side is broadcast (it is the
    small side by construction); per-query ranking uses a window partitioned
    by query — no global sort.
    """
    q = queries.select(_c(query_id).alias("__qid"), _c(query_vec).alias("__qv"))
    c = corpus.select(_c(corpus_id).alias("__cid"), _c(corpus_vec).alias("__cv"))
    scored = c.join(F.broadcast(q)).select(
        F.col("__qid").alias(query_id),
        F.col("__cid").alias(corpus_id),
        cosine("__qv", "__cv").alias("similarity"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("similarity").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(table: int, plane: int, dim: int) -> Column:
    """Deterministic pseudo-random weight in [-1, 1): derived from
    xxhash64(table, plane, dim) — no RNG state, reproducible anywhere."""
    h = F.xxhash64(F.lit(table), F.lit(plane), F.lit(dim))
    return (F.pmod(h, F.lit(2_000_003)).cast("double") - F.lit(1_000_001.0)) / F.lit(1_000_001.0)


def _bucket_sketch(vec, table: int, planes: int, dim: int) -> Column:
    """LSH bucket id: sign bits of `planes` random projections packed into a
    long.  Projections are ordered folds (deterministic)."""
    bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                _c(vec),
                F.array(*[_hyperplane(table, p, d) for d in range(dim)]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long")))
    out = F.lit(0).cast("long")
    for b in bits:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    query_vec: str = "query_vec",
    corpus_vec: str = "corpus_vec",
    planes: int = 8,
    tables: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 table; exact
    cosine re-scores candidates.  Corpus-side shuffle key = (table, bucket)."""
    q = queries.select(_c(query_id).alias("__qid"), _c(query_vec).alias("__qv"))
    c = corpus.select(_c(corpus_id).alias("__cid"), _c(corpus_vec).alias("__cv"))
    qb = q.select(
        "__qid",
        "__qv",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("tbl"), _bucket_sketch("__qv", t, planes, dim).alias("bkt"))
                for t in range(tables)
            ])
        ).alias("__b"),
    ).select("__qid", "__qv", "__b.tbl", "__b.bkt")
    cb = c.select(
        "__cid",
        "__cv",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("tbl"), _bucket_sketch("__cv", t, planes, dim).alias("bkt"))
                for t in range(tables)
            ])
        ).alias("__b"),
    ).select("__cid", "__cv", "__b.tbl", "__b.bkt")
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .select("__qid", "__qv", "__cid", "__cv")
        .dropDuplicates(["__qid", "__cid"])
    )
    scored = cand.select(
        F.col("__qid").alias(query_id),
        F.col("__cid").alias(corpus_id),
        cosine("__qv", "__cv").alias("similarity"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("similarity").desc(), F.col(corpus_id).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
