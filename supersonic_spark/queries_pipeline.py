"""Training-data pipeline queries (beyond-reference mandate): dedup,
similarity search, text analysis, multimodal plumbing — over the documents
and embeddings tables.  Registered into supersonic_spark.queries.REGISTRY.

Hash-dependent operators (MinHash, SimHash, fingerprint, LSH ANN) cannot
replay xxhash64 in DuckDB, so their queries follow the error-bound-boolean
oracle pattern (like approx_distinct_users): the Spark side computes the
approximate operator NEXT TO its exact ground truth in one plan and emits
DuckDB-pinnable exact values (pair counts, corpus counts, token totals)
plus deterministic booleans (subset/recall/error-bound/planted-collision
invariants); the oracle recomputes the exact values and emits literal
TRUEs.  Every query here is therefore hash-checked end to end; unit tests
(tests/test_pipeline.py) additionally pin the operator semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from supersonic_spark.operators import core
from supersonic_spark.pipeline import dedup, multimodal, similarity, textstats
from supersonic_spark.queries import _t, q

# =====================================================================
# dedup
# =====================================================================

@q(
    "dedup_exact",
    """SELECT MIN(doc_id) AS rep_id, COUNT(*) AS dup_count
       FROM documents GROUP BY text""",
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: one hash aggregation keyed on content."""
    t = _t(spark, sf_dir)
    out = dedup.duplicate_groups(t["documents"], ["text"], "doc_id")
    return out.select("rep_id", "dup_count")


_JACCARD_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(words[i:i+2], ' ')
                        for i in range(1, len(words) - 1)]) AS grams
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
        FROM documents WHERE doc_id < 200)
  WHERE len(words) >= 3
), ex AS (
  SELECT doc_id, unnest(grams) AS g FROM sh
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
FROM inter
JOIN (SELECT doc_id, len(grams) AS n FROM sh) na ON na.doc_id = id_a
JOIN (SELECT doc_id, len(grams) AS n FROM sh) nb ON nb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.1
"""


@q("dedup_ngram_jaccard", _JACCARD_ORACLE)
def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard near-dup pairs (the oracle-able ground
    truth for MinHash)."""
    t = _t(spark, sf_dir)
    docs = core.filter_op(t["documents"], F.col("doc_id") < 200)
    return dedup.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_words=3, threshold=0.1)


def _exact_pair_stats_sql(select: str) -> str:
    """Full-corpus exact word-3-gram Jaccard pair CTEs (DuckDB) with a
    caller-supplied final SELECT over ``j(id_a, id_b, jac)``."""
    return f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(words[i:i+2], ' ')
                        for i in range(1, len(words) - 1)]) AS grams
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
        FROM documents)
  WHERE len(words) >= 3
), ex AS (
  SELECT doc_id, unnest(grams) AS g FROM sh
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), j AS (
  SELECT id_a, id_b,
         CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jac
  FROM inter
  JOIN (SELECT doc_id, len(grams) AS n FROM sh) na ON na.doc_id = id_a
  JOIN (SELECT doc_id, len(grams) AS n FROM sh) nb ON nb.doc_id = id_b
)
{select}
"""


_MINHASH_LSH_ORACLE = _exact_pair_stats_sql("""
SELECT COUNT(*)::BIGINT AS n_exact,
       COALESCE(SUM((jac >= 0.8)::INT), 0)::BIGINT AS n_exact_hi,
       TRUE AS lsh_subset_ok, TRUE AS recall_hi_ok
FROM j WHERE jac >= 0.1""")


@q("dedup_minhash_lsh", _MINHASH_LSH_ORACLE)
def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidates (shingle→minhash→band→bucket-join),
    verified by exact Jaccard — checked against the exact-pair ground truth
    in one plan.  The oracle pins the exact pair counts (DuckDB computes
    the same 3-gram Jaccard) plus two LSH invariants as booleans:
    every emitted pair really has J ≥ threshold (verification is exact, so
    the LSH output is a SUBSET of the exact pairs), and banding recall at
    J ≥ 0.8 is ≥ 95% (16 bands × 4 rows ⇒ per-pair miss ≈ 2·10⁻⁴)."""
    t = _t(spark, sf_dir)
    docs = t["documents"]
    exact = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_words=3, threshold=0.1
    )
    lsh = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, shingle_words=3, threshold=0.1
    ).select("id_a", "id_b")
    ex_agg = exact.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.coalesce(F.sum((F.col("jaccard") >= 0.8).cast("int")), F.lit(0)).alias(
            "n_exact_hi"
        ),
    )
    hi_found = lsh.join(
        exact.filter(F.col("jaccard") >= 0.8).select("id_a", "id_b"), ["id_a", "id_b"]
    ).agg(F.count(F.lit(1)).alias("n_hi_found"))
    outside = lsh.join(exact.select("id_a", "id_b", "jaccard"), ["id_a", "id_b"], "left").agg(
        F.coalesce(F.sum(F.col("jaccard").isNull().cast("int")), F.lit(0)).alias(
            "n_outside"
        )
    )
    return (
        ex_agg.crossJoin(hi_found)
        .crossJoin(outside)
        .select(
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("n_exact_hi").cast("long").alias("n_exact_hi"),
            (F.col("n_outside") == 0).alias("lsh_subset_ok"),
            (F.col("n_hi_found") >= 0.95 * F.col("n_exact_hi")).alias("recall_hi_ok"),
        )
    )


_MINHASH_EST_ORACLE = _exact_pair_stats_sql("""
SELECT COALESCE(SUM((jac >= 0.8)::INT), 0)::BIGINT AS n_exact_hi,
       TRUE AS est_err_ok, TRUE AS recall_hi_ok, TRUE AS spurious_hi_ok
FROM j WHERE jac >= 0.1""")


@q("dedup_minhash_estimate", _MINHASH_EST_ORACLE)
def q_dedup_minhash_estimate(spark, sf_dir):
    """MinHash+LSH near-dups scored by the signature-match Jaccard
    *estimator* (verify="estimate") — the 1-shuffle scale path — bound
    against the exact ground truth: estimator error ≤ 0.25 (4σ at 64
    hashes) on every pair both sides agree on, ≥95% banding recall at
    J ≥ 0.8, and no high-estimate pair (est ≥ 0.5) outside the exact
    J ≥ 0.1 set."""
    t = _t(spark, sf_dir)
    docs = t["documents"]
    exact = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_words=3, threshold=0.1
    )
    est = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, shingle_words=3,
        threshold=0.1, verify="estimate",
    ).select("id_a", "id_b", F.col("jaccard").alias("est"))
    joined = est.join(
        exact.select("id_a", "id_b", F.col("jaccard").alias("ex")),
        ["id_a", "id_b"],
        "left",
    )
    stats = joined.agg(
        F.coalesce(F.max(F.when(F.col("ex").isNotNull(),
                                F.abs(F.col("est") - F.col("ex")))), F.lit(0.0)).alias(
            "max_err"
        ),
        F.coalesce(
            F.sum(((F.col("est") >= 0.5) & F.col("ex").isNull()).cast("int")), F.lit(0)
        ).alias("n_spurious_hi"),
    )
    ex_agg = exact.agg(
        F.coalesce(F.sum((F.col("jaccard") >= 0.8).cast("int")), F.lit(0)).alias(
            "n_exact_hi"
        )
    )
    hi_found = est.join(
        exact.filter(F.col("jaccard") >= 0.8).select("id_a", "id_b"), ["id_a", "id_b"]
    ).agg(F.count(F.lit(1)).alias("n_hi_found"))
    return (
        ex_agg.crossJoin(stats)
        .crossJoin(hi_found)
        .select(
            F.col("n_exact_hi").cast("long").alias("n_exact_hi"),
            (F.col("max_err") <= 0.25).alias("est_err_ok"),
            (F.col("n_hi_found") >= 0.95 * F.col("n_exact_hi")).alias("recall_hi_ok"),
            (F.col("n_spurious_hi") == 0).alias("spurious_hi_ok"),
        )
    )


_INCREMENTAL_ORACLE = _exact_pair_stats_sql("""
SELECT (SELECT COUNT(*) FROM documents WHERE doc_id % 2 = 1)::BIGINT AS n_batch,
       (SELECT COUNT(*) FROM documents WHERE doc_id % 2 = 0)::BIGINT AS n_corpus,
       COALESCE(SUM((jac >= 0.8)::INT), 0)::BIGINT AS n_exact_hi,
       TRUE AS est_err_ok, TRUE AS recall_hi_ok, TRUE AS spurious_hi_ok
FROM j WHERE jac >= 0.1 AND (id_a % 2) <> (id_b % 2)""")


@q("dedup_incremental_minhash", _INCREMENTAL_ORACLE)
def q_dedup_incremental_minhash(spark, sf_dir):
    """Incremental dedup against a PERSISTED MinHash index: even-id docs
    are the already-ingested corpus (their minhash_band_index is written
    to parquet and read back — the cross-session artifact), odd-id docs
    are the new batch probed against it via dedup_against_index.  The
    corpus text is never re-shingled.  Bound against exact cross-parity
    3-gram Jaccard ground truth with the estimator-oracle pattern:
    estimator error ≤ 0.25 (4σ at 64 hashes) on agreed pairs, ≥95%
    banding recall at exact J ≥ 0.8, and no high-estimate pair outside
    the exact J ≥ 0.1 set."""
    import os
    import tempfile

    t = _t(spark, sf_dir)
    docs = t["documents"]
    corpus = core.filter_op(docs, F.col("doc_id") % 2 == 0)
    batch = core.filter_op(docs, F.col("doc_id") % 2 == 1)

    tag = sf_dir.rstrip("/").replace("/", "_")
    idx_path = os.path.join(tempfile.gettempdir(), f"ss_minhash_index{tag}")
    dedup.minhash_band_index(corpus, "doc_id", "text").write.mode(
        "overwrite"
    ).partitionBy("band").parquet(idx_path)
    index = spark.read.parquet(idx_path)

    found = dedup.dedup_against_index(
        batch, index, "doc_id", "text", threshold=0.1
    ).select(
        F.least(F.col("new_id"), F.col("index_id")).alias("id_a"),
        F.greatest(F.col("new_id"), F.col("index_id")).alias("id_b"),
        F.col("jaccard").alias("est"),
    )
    exact = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_words=3, threshold=0.1
    ).filter((F.col("id_a") % 2) != (F.col("id_b") % 2))
    joined = found.join(
        exact.select("id_a", "id_b", F.col("jaccard").alias("ex")),
        ["id_a", "id_b"],
        "left",
    )
    stats = joined.agg(
        F.coalesce(
            F.max(F.when(F.col("ex").isNotNull(), F.abs(F.col("est") - F.col("ex")))),
            F.lit(0.0),
        ).alias("max_err"),
        F.coalesce(
            F.sum(((F.col("est") >= 0.5) & F.col("ex").isNull()).cast("int")), F.lit(0)
        ).alias("n_spurious_hi"),
    )
    ex_agg = exact.agg(
        F.coalesce(F.sum((F.col("jaccard") >= 0.8).cast("int")), F.lit(0)).alias(
            "n_exact_hi"
        )
    )
    hi_found = found.join(
        exact.filter(F.col("jaccard") >= 0.8).select("id_a", "id_b"), ["id_a", "id_b"]
    ).agg(F.count(F.lit(1)).alias("n_hi_found"))
    n_batch = batch.agg(F.count(F.lit(1)).alias("n_batch"))
    n_corpus = corpus.agg(F.count(F.lit(1)).alias("n_corpus"))
    return (
        n_batch.crossJoin(n_corpus)
        .crossJoin(ex_agg)
        .crossJoin(stats)
        .crossJoin(hi_found)
        .select(
            F.col("n_batch").cast("long").alias("n_batch"),
            F.col("n_corpus").cast("long").alias("n_corpus"),
            F.col("n_exact_hi").cast("long").alias("n_exact_hi"),
            (F.col("max_err") <= 0.25).alias("est_err_ok"),
            (F.col("n_hi_found") >= 0.95 * F.col("n_exact_hi")).alias("recall_hi_ok"),
            (F.col("n_spurious_hi") == 0).alias("spurious_hi_ok"),
        )
    )


@q(
    "dedup_exact_incremental",
    """SELECT b.doc_id,
              (EXISTS (SELECT 1 FROM documents c
                       WHERE c.doc_id % 2 = 0 AND c.text = b.text))
                AS seen_before
       FROM documents b WHERE b.doc_id % 2 = 1""",
)
def q_dedup_exact_incremental(spark, sf_dir):
    """Incremental EXACT dedup against a persisted digest index: even-id
    docs' content digests are written once (8 bytes per unique doc) and
    the odd-id batch is flagged by a digest-keyed join — raw text never
    shuffles and the corpus is never rescanned.  Full hash check: the
    oracle recomputes seen_before by literal text membership."""
    import os
    import tempfile

    t = _t(spark, sf_dir)
    docs = t["documents"]
    corpus = core.filter_op(docs, F.col("doc_id") % 2 == 0)
    batch = core.filter_op(docs, F.col("doc_id") % 2 == 1)
    tag = sf_dir.rstrip("/").replace("/", "_")
    idx_path = os.path.join(tempfile.gettempdir(), f"ss_digest_index{tag}")
    dedup.digest_index(corpus, ["text"]).write.mode("overwrite").parquet(idx_path)
    index = spark.read.parquet(idx_path)
    out = dedup.dedup_exact_against_index(batch, index, ["text"])
    return out.select("doc_id", "seen_before")


_STREAM_INCREMENTAL_ORACLE = _exact_pair_stats_sql("""
SELECT (SELECT COUNT(*) FROM documents WHERE doc_id % 2 = 1)::BIGINT AS n_batch,
       (SELECT COUNT(*) FROM documents WHERE doc_id % 2 = 0)::BIGINT AS n_corpus,
       COALESCE(SUM((jac >= 0.8)::INT), 0)::BIGINT AS n_exact_hi,
       TRUE AS recall_hi_ok, TRUE AS stream_matches_batch_ok
FROM j WHERE jac >= 0.1 AND (id_a % 2) <> (id_b % 2)""")


@q("streaming_incremental_dedup", _STREAM_INCREMENTAL_ORACLE)
def q_streaming_incremental_dedup(spark, sf_dir):
    """STREAMING incremental dedup: odd-id docs arrive as a multi-batch
    file stream (maxFilesPerTrigger=1 over a 2-file source — real
    cross-trigger execution) and are probed per micro-batch against the
    even-id corpus' persisted MinHash index via foreachBatch, landing
    pairs under idempotent batch=<id> paths.  The sunk result must equal
    the batch operator on the same inputs EXACTLY (pair-set and scores —
    possible because the static index side is complete in every batch),
    plus ≥95% banding recall against exact cross-parity Jaccard ground
    truth."""
    import os
    import shutil
    import tempfile

    from supersonic_spark.streaming.ops import stream_dedup_against_index

    t = _t(spark, sf_dir)
    docs = t["documents"]
    corpus = core.filter_op(docs, F.col("doc_id") % 2 == 0)
    batch = core.filter_op(docs, F.col("doc_id") % 2 == 1).select("doc_id", "text")

    tag = sf_dir.rstrip("/").replace("/", "_")
    idx_path = os.path.join(tempfile.gettempdir(), f"ss_stream_idx{tag}")
    dedup.minhash_band_index(corpus, "doc_id", "text").write.mode(
        "overwrite"
    ).partitionBy("band").parquet(idx_path)
    index = spark.read.parquet(idx_path)

    src = os.path.join(tempfile.gettempdir(), f"ss_stream_newdocs{tag}")
    shutil.rmtree(src, ignore_errors=True)
    batch.coalesce(2).write.mode("overwrite").parquet(src)
    sink = os.path.join(tempfile.gettempdir(), f"ss_stream_incdedup{tag}")
    shutil.rmtree(sink, ignore_errors=True)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    pairs = stream_dedup_against_index(
        stream, index, "doc_id", "text", sink, threshold=0.1
    )

    ref = dedup.dedup_against_index(batch, index, "doc_id", "text", threshold=0.1)
    diff = pairs.withColumnRenamed("jaccard", "j_s").join(
        ref.withColumnRenamed("jaccard", "j_b"), ["new_id", "index_id"], "full"
    )
    n_mismatch = diff.agg(
        F.coalesce(
            F.sum(
                (
                    F.col("j_s").isNull()
                    | F.col("j_b").isNull()
                    | (F.abs(F.col("j_s") - F.col("j_b")) > 1e-12)
                ).cast("int")
            ),
            F.lit(0),
        ).alias("n_mismatch")
    )
    exact = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_words=3, threshold=0.1
    ).filter((F.col("id_a") % 2) != (F.col("id_b") % 2))
    ex_agg = exact.agg(
        F.coalesce(F.sum((F.col("jaccard") >= 0.8).cast("int")), F.lit(0)).alias(
            "n_exact_hi"
        )
    )
    canon = pairs.select(
        F.least(F.col("new_id"), F.col("index_id")).alias("id_a"),
        F.greatest(F.col("new_id"), F.col("index_id")).alias("id_b"),
    )
    hi_found = canon.join(
        exact.filter(F.col("jaccard") >= 0.8).select("id_a", "id_b"), ["id_a", "id_b"]
    ).agg(F.count(F.lit(1)).alias("n_hi_found"))
    n_batch = batch.agg(F.count(F.lit(1)).alias("n_batch"))
    n_corpus = corpus.agg(F.count(F.lit(1)).alias("n_corpus"))
    return (
        n_batch.crossJoin(n_corpus)
        .crossJoin(ex_agg)
        .crossJoin(hi_found)
        .crossJoin(n_mismatch)
        .select(
            F.col("n_batch").cast("long").alias("n_batch"),
            F.col("n_corpus").cast("long").alias("n_corpus"),
            F.col("n_exact_hi").cast("long").alias("n_exact_hi"),
            (F.col("n_hi_found") >= 0.95 * F.col("n_exact_hi")).alias("recall_hi_ok"),
            (F.col("n_mismatch") == 0).alias("stream_matches_batch_ok"),
        )
    )


_SIMHASH_ORACLE = """
WITH dup AS (
  SELECT COALESCE(SUM(c * (c - 1) / 2), 0)::BIGINT AS n_dup_pairs
  FROM (SELECT COUNT(*) AS c FROM documents GROUP BY text HAVING COUNT(*) > 1)
)
SELECT (SELECT COUNT(*) FROM documents)::BIGINT AS n_docs,
       n_dup_pairs, TRUE AS dups_found_ok, TRUE AS precision_ok
FROM dup
"""


@q("dedup_simhash", _SIMHASH_ORACLE)
def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs within Hamming distance 3 (4×16-bit band
    blocking), checked against DuckDB-computable ground truth: every
    EXACT duplicate text pair must be found (identical text ⇒ identical
    SimHash ⇒ Hamming 0 ⇒ same bands — deterministic), and every found
    pair must be a genuine near-dup (word-3-gram Jaccard ≥ 0.3; unrelated
    docs sit at Hamming ≈ 32 of 64, astronomically above the cutoff)."""
    t = _t(spark, sf_dir)
    docs = t["documents"]
    found = dedup.simhash_dedup(
        docs, "doc_id", "text", shingle_words=3, max_hamming=3
    ).select("id_a", "id_b")
    # exact-dup pairs from text equality (dups are rare: self-join on text
    # stays output-sized)
    d = docs.select("doc_id", "text")
    dup_pairs = (
        d.alias("a")
        .join(d.alias("b"), (F.col("a.text") == F.col("b.text"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    dup_agg = dup_pairs.agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    dup_found = dup_pairs.join(found, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).alias("n_dup_found")
    )
    # precision: join found pairs to the exact Jaccard table (floor 0.05 so
    # a hypothetical low-J false positive surfaces as a NULL)
    exact = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_words=3, threshold=0.05
    )
    prec = found.join(
        exact.select("id_a", "id_b", "jaccard"), ["id_a", "id_b"], "left"
    ).agg(
        F.coalesce(F.sum(F.col("jaccard").isNull().cast("int")), F.lit(0)).alias(
            "n_unmatched"
        ),
        F.coalesce(F.min("jaccard"), F.lit(1.0)).alias("min_jac"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        n_docs.crossJoin(dup_agg)
        .crossJoin(dup_found)
        .crossJoin(prec)
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_dup_pairs").cast("long").alias("n_dup_pairs"),
            (F.col("n_dup_found") == F.col("n_dup_pairs")).alias("dups_found_ok"),
            ((F.col("n_unmatched") == 0) & (F.col("min_jac") >= 0.3)).alias(
                "precision_ok"
            ),
        )
    )


# =====================================================================
# similarity search
# =====================================================================

_MMR_ORACLE = """
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id >= 10),
s AS (SELECT qid, cid, cv,
             list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
               AS sim
      FROM q CROSS JOIN c),
sl AS (SELECT qid, cid, cv, sim FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY sim DESC, cid) AS rnk FROM s)
       WHERE rnk <= 10),
p AS (SELECT a.qid, a.cid AS ca, b.cid AS cb,
             list_dot_product(a.cv, b.cv)
               / (sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(b.cv, b.cv)))
               AS cc
      FROM sl a JOIN sl b ON a.qid = b.qid),
r1 AS (SELECT qid, cid, sim, 0.7 * sim AS score FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY 0.7 * sim DESC, cid) AS rn FROM sl)
       WHERE rn = 1),
pool2 AS (SELECT sl.qid, sl.cid, sl.sim, 0.7 * sl.sim - 0.3 * p.cc AS score
          FROM sl JOIN r1 ON sl.qid = r1.qid AND sl.cid <> r1.cid
          JOIN p ON p.qid = sl.qid AND p.ca = sl.cid AND p.cb = r1.cid),
r2 AS (SELECT qid, cid, sim, score FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY score DESC, cid) AS rn FROM pool2)
       WHERE rn = 1),
pool3 AS (SELECT sl.qid, sl.cid, sl.sim,
                 0.7 * sl.sim - 0.3 * GREATEST(p1.cc, p2.cc) AS score
          FROM sl JOIN r1 ON sl.qid = r1.qid JOIN r2 ON sl.qid = r2.qid
          JOIN p p1 ON p1.qid = sl.qid AND p1.ca = sl.cid AND p1.cb = r1.cid
          JOIN p p2 ON p2.qid = sl.qid AND p2.ca = sl.cid AND p2.cb = r2.cid
          WHERE sl.cid <> r1.cid AND sl.cid <> r2.cid),
r3 AS (SELECT qid, cid, sim, score FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY score DESC, cid) AS rn FROM pool3)
       WHERE rn = 1)
SELECT qid AS query_id, cid AS corpus_id, round(sim, 6) AS similarity,
       round(score, 6) AS mmr_score, CAST(1 AS INT) AS rank FROM r1
UNION ALL
SELECT qid, cid, round(sim, 6), round(score, 6), CAST(2 AS INT) FROM r2
UNION ALL
SELECT qid, cid, round(sim, 6), round(score, 6), CAST(3 AS INT) FROM r3
"""


@q("similarity_mmr_rerank", _MMR_ORACLE)
def q_similarity_mmr_rerank(spark, sf_dir):
    """MMR-diversified rerank: greedy maximal-marginal-relevance selection
    (λ=0.7, k=3) over each query's exact top-10 cosine shortlist — rank 1
    is the pure-relevance top-1, later ranks trade relevance against
    redundancy with already-selected results.  FULL-VALUE oracle: the
    greedy loop at fixed k unrolls into three chained argmax CTEs, so
    DuckDB replays every (query, corpus, similarity, mmr_score, rank) row
    exactly (scores rounded 6dp for cross-engine float portability)."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    cs = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    short = similarity.cosine_topk(
        qs, cs, 10, query_id="qid", corpus_id="cid", query_vec="qv", corpus_vec="cv"
    )
    out = similarity.mmr_topk(short, qs, cs, "qid", "qv", "cid", "cv", k=3, lam=0.7)
    return out.select(
        "query_id",
        "corpus_id",
        F.round(F.col("similarity"), 6).alias("similarity"),
        F.round(F.col("mmr_score"), 6).alias("mmr_score"),
        "rank",
    )


_MMR_DIVERSE_ORACLE = """
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS cid, vec_id % 4 AS fld, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id >= 10),
s AS (SELECT qid, cid, fld, cv,
             list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
               AS sim
      FROM q CROSS JOIN c),
sl AS (SELECT qid, cid, fld, cv, sim FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY sim DESC, cid) AS rnk FROM s)
       WHERE rnk <= 10),
p AS (SELECT a.qid, a.cid AS ca, b.cid AS cb,
             list_dot_product(a.cv, b.cv)
               / (sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(b.cv, b.cv)))
               AS cc
      FROM sl a JOIN sl b ON a.qid = b.qid),
r1 AS (SELECT qid, cid, fld, sim, 0.7 * sim AS score FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY 0.7 * sim DESC, cid) AS rn FROM sl)
       WHERE rn = 1),
pool2 AS (SELECT sl.qid, sl.cid, sl.fld, sl.sim,
                 0.7 * sl.sim - 0.3 * p.cc AS score
          FROM sl JOIN r1 ON sl.qid = r1.qid AND sl.cid <> r1.cid
                          AND sl.fld <> r1.fld
          JOIN p ON p.qid = sl.qid AND p.ca = sl.cid AND p.cb = r1.cid),
r2 AS (SELECT qid, cid, fld, sim, score FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY score DESC, cid) AS rn FROM pool2)
       WHERE rn = 1),
pool3 AS (SELECT sl.qid, sl.cid, sl.sim,
                 0.7 * sl.sim - 0.3 * GREATEST(p1.cc, p2.cc) AS score
          FROM sl JOIN r1 ON sl.qid = r1.qid JOIN r2 ON sl.qid = r2.qid
          JOIN p p1 ON p1.qid = sl.qid AND p1.ca = sl.cid AND p1.cb = r1.cid
          JOIN p p2 ON p2.qid = sl.qid AND p2.ca = sl.cid AND p2.cb = r2.cid
          WHERE sl.cid <> r1.cid AND sl.cid <> r2.cid
            AND sl.fld <> r1.fld AND sl.fld <> r2.fld),
r3 AS (SELECT qid, cid, sim, score FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY score DESC, cid) AS rn FROM pool3)
       WHERE rn = 1)
SELECT qid AS query_id, cid AS corpus_id, round(sim, 6) AS similarity,
       round(score, 6) AS mmr_score, CAST(1 AS INT) AS rank FROM r1
UNION ALL
SELECT qid, cid, round(sim, 6), round(score, 6), CAST(2 AS INT) FROM r2
UNION ALL
SELECT qid, cid, round(sim, 6), round(score, 6), CAST(3 AS INT) FROM r3
"""


@q("similarity_mmr_rerank_diverse", _MMR_DIVERSE_ORACLE)
def q_similarity_mmr_rerank_diverse(spark, sf_dir):
    """MMR rerank with a HARD per-field quota (max 1 result per field,
    field = vec_id % 4 as a synthetic source/domain id): once a field is
    represented, its other candidates are skipped even when they out-score
    everything else.  FULL-VALUE oracle: the constrained greedy at k=3
    unrolls into chained argmax CTEs whose candidate pools exclude the
    already-used fields, so DuckDB replays every selected row exactly."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    cs = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"),
        (F.col("vec_id") % 4).alias("source"),
        F.col("embedding").alias("cv"),
    )
    short = similarity.cosine_topk(
        qs, cs, 10, query_id="qid", corpus_id="cid", query_vec="qv", corpus_vec="cv"
    )
    out = similarity.mmr_topk(
        short, qs, cs, "qid", "qv", "cid", "cv", k=3, lam=0.7,
        field_col="source", max_per_field=1,
    )
    return out.select(
        "query_id",
        "corpus_id",
        F.round(F.col("similarity"), 6).alias("similarity"),
        F.round(F.col("mmr_score"), 6).alias("mmr_score"),
        "rank",
    )


@q(
    "similarity_ivf_index_probe",
    # the same exact-top-k SQL as similarity_cosine_topk: with
    # nprobe = n_cells every inverted list is scanned, so the persisted
    # index must return EXACT top-5 — a full hash check of the
    # build→write→sidecar→prune→probe cycle
    """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings WHERE vec_id >= 10),
     s AS (SELECT query_id, corpus_id,
                  list_dot_product(qv, cv)
                    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                    AS similarity
           FROM q CROSS JOIN c),
     r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY similarity DESC, corpus_id) AS rnk
           FROM s)
SELECT query_id, corpus_id, round(similarity, 6) AS similarity, CAST(rnk AS INT) AS rank
FROM r WHERE rnk <= 5
""",
)
def q_similarity_ivf_index_probe(spark, sf_dir):
    """PERSISTED IVF index, built once and probed from disk: the corpus
    is written as cell-partitioned parquet inverted lists with a
    centroid sidecar, and the probe prunes the scan to the probed cells'
    partitions.  With nprobe = n_cells (8) every list is scanned, so the
    result must be EXACT top-5 cosine — the oracle hash-checks the whole
    cycle while similarity_ivf_ann covers the approximate (nprobe <
    n_cells) recall bound."""
    import os
    import tempfile

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    cs = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"ss_ivf_index{tag}")
    similarity.ivf_index_build(cs, "cid", "cv", path, n_cells=8, train=True)
    out = similarity.ivf_index_probe(spark, path, qs, "qid", "qv", k=5, nprobe=8)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return out.withColumn("rank", F.row_number().over(w)).select(
        "query_id",
        "corpus_id",
        F.round(F.col("cos"), 6).alias("similarity"),
        "rank",
    )


@q(
    "streaming_ann_index_probe",
    """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings WHERE vec_id >= 10),
     s AS (SELECT query_id, corpus_id,
                  list_dot_product(qv, cv)
                    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                    AS similarity
           FROM q CROSS JOIN c),
     r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY similarity DESC, corpus_id) AS rnk
           FROM s)
SELECT query_id, corpus_id, round(similarity, 6) AS similarity, CAST(rnk AS INT) AS rank
FROM r WHERE rnk <= 5
""",
)
def q_streaming_ann_index_probe(spark, sf_dir):
    """STREAMING ANN over the persisted IVF index: query vectors arrive
    as a multi-batch file stream (maxFilesPerTrigger=1 over 2 source
    files) and probe the disk index per micro-batch via foreachBatch —
    the online-retrieval front door over the same artifact batch jobs
    build.  With nprobe = n_cells every inverted list is scanned, so the
    DRAINED STREAM must hash-match exact top-5 cosine — a full-value
    check of the stream → probe → sink cycle."""
    import os
    import shutil
    import tempfile

    from supersonic_spark.streaming.ops import stream_ann_index_probe

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    cs = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    tag = sf_dir.rstrip("/").replace("/", "_")
    idx_path = os.path.join(tempfile.gettempdir(), f"ss_stream_ivf{tag}")
    similarity.ivf_index_build(cs, "cid", "cv", idx_path, n_cells=8, train=True)

    src = os.path.join(tempfile.gettempdir(), f"ss_stream_queries{tag}")
    shutil.rmtree(src, ignore_errors=True)
    emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    ).coalesce(2).write.mode("overwrite").parquet(src)
    sink = os.path.join(tempfile.gettempdir(), f"ss_stream_ann{tag}")
    shutil.rmtree(sink, ignore_errors=True)

    stream = (
        spark.readStream.schema("qid long, qv array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stream_ann_index_probe(
        stream, idx_path, sink, "qid", "qv", k=5, nprobe=8
    )
    return out.select(
        "query_id",
        "corpus_id",
        F.round(F.col("cos"), 6).alias("similarity"),
        "rank",
    )


_TOPK_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings WHERE vec_id >= 10),
     s AS (SELECT query_id, corpus_id,
                  list_dot_product(qv, cv)
                    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                    AS similarity
           FROM q CROSS JOIN c),
     r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY similarity DESC, corpus_id) AS rnk
           FROM s)
SELECT query_id, corpus_id, round(similarity, 6) AS similarity, CAST(rnk AS INT) AS rank
FROM r WHERE rnk <= 5
"""


@q("similarity_cosine_topk", _TOPK_ORACLE)
def q_similarity_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k (exact ANN baseline): broadcast queries,
    ordered-fold double dot products, per-query window ranking."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("corpus_vec")
    )
    out = similarity.cosine_topk(queries, corpus, k=5)
    return out.select(
        "query_id", "corpus_id", F.round("similarity", 6).alias("similarity"), "rank"
    )


_LSH_ANN_ORACLE = """
SELECT vec_id AS query_id,
       (SELECT COUNT(*) FROM embeddings)::BIGINT AS n_corpus,
       TRUE AS top1_exact_ok, TRUE AS self_in_topk_ok
FROM embeddings WHERE vec_id < 10 ORDER BY query_id
"""


@q("similarity_lsh_ann", _LSH_ANN_ORACLE)
def q_similarity_lsh_ann(spark, sf_dir):
    """LSH-bucketed approximate top-k (the 100 TB scale path), checked via
    the sign-random-projection collision GUARANTEE: each query vector is
    itself in the corpus, an identical (or positively-scaled) vector gets
    the same sign pattern ⇒ the same bucket in EVERY table ⇒ is always a
    candidate, and exact rescoring puts it at rank 1 with cosine 1.0.  So
    per query: top-1 cosine rounds to 1.0 and the query id appears in its
    own top-k — deterministic booleans next to DuckDB-pinned ids/counts."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("corpus_vec")
    )
    out = similarity.lsh_topk(queries, corpus, k=5, dim=64, planes=8, tables=4)
    n_corpus = corpus.agg(F.count(F.lit(1)).alias("n_corpus"))
    per_q = out.groupBy("query_id").agg(
        F.max(F.when(F.col("rank") == 1, F.round("similarity", 6))).alias("top1_cos"),
        F.max((F.col("query_id") == F.col("corpus_id")).cast("int")).alias("self_hit"),
    )
    return (
        per_q.crossJoin(n_corpus)
        .select(
            "query_id",
            F.col("n_corpus").cast("long").alias("n_corpus"),
            (F.col("top1_cos") == 1.0).alias("top1_exact_ok"),
            (F.col("self_hit") == 1).alias("self_in_topk_ok"),
        )
        .orderBy("query_id")
    )


@q(
    "similarity_pq_ann",
    """SELECT q.vec_id AS query_id,
              (SELECT c.vec_id FROM embeddings c WHERE c.vec_id <> q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id LIMIT 1)::BIGINT AS best_other,
              (SELECT COUNT(*) FROM embeddings)::BIGINT AS n_corpus,
              TRUE AS pq_signal_ok
       FROM embeddings q WHERE q.vec_id < 10 ORDER BY 1""",
)
def q_similarity_pq_ann(spark, sf_dir):
    """Product-quantization ANN (asymmetric distance computation): the
    corpus compresses to m=8 uint8 codes per vector and scoring is m JVM
    array lookups per pair — the memory-compression scale path (32× at
    dim 64).  Checked three ways in one plan: the exact scorer's best
    non-self neighbor hash-matches DuckDB's list_cosine_similarity; the
    corpus count pins coverage; and the PQ shortlist must either overlap
    the exact top-5 or retrieve the query itself (measured recall@5 ≈ 0.34
    on this corpus vs 0.01 random — the boolean floor is far below
    measurement, far above chance)."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("corpus_vec")
    )
    pq = similarity.pq_topk(
        queries, corpus, "query_id", "query_vec", "corpus_id", "corpus_vec",
        k=5, m=8, ksub=16,
    )
    exact = similarity.cosine_topk(queries, corpus, k=6)
    best_other = (
        exact.filter(F.col("query_id") != F.col("corpus_id"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("similarity").desc(), F.col("corpus_id")
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("query_id", F.col("corpus_id").cast("long").alias("best_other"))
    )
    exact5 = exact.filter(F.col("rank") <= 5).select(
        "query_id", F.col("corpus_id").alias("__eid")
    )
    overlap = (
        pq.join(
            exact5,
            (pq["query_id"] == exact5["query_id"]) & (pq["corpus_id"] == exact5["__eid"]),
        )
        .groupBy(pq["query_id"].alias("qid"))
        .agg(F.count(F.lit(1)).alias("__n_overlap"))
    )
    self_hit = pq.groupBy("query_id").agg(
        F.max((F.col("query_id") == F.col("corpus_id")).cast("int")).alias("__self")
    )
    n_corpus = corpus.agg(F.count(F.lit(1)).alias("n_corpus"))
    return (
        best_other.join(overlap, best_other["query_id"] == overlap["qid"], "left")
        .join(self_hit, "query_id", "left")
        .crossJoin(n_corpus)
        .select(
            "query_id",
            "best_other",
            F.col("n_corpus").cast("long").alias("n_corpus"),
            (
                (F.coalesce(F.col("__n_overlap"), F.lit(0)) >= 1)
                | (F.coalesce(F.col("__self"), F.lit(0)) == 1)
            ).alias("pq_signal_ok"),
        )
        .orderBy("query_id")
    )


@q(
    "similarity_ivfpq_ann",
    """SELECT q.vec_id AS query_id,
              (SELECT c.vec_id FROM embeddings c WHERE c.vec_id <> q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id LIMIT 1)::BIGINT AS best_other,
              (SELECT COUNT(*) FROM embeddings)::BIGINT AS n_corpus,
              TRUE AS ann_signal_ok
       FROM embeddings q WHERE q.vec_id < 10 ORDER BY 1""",
)
def q_similarity_ivfpq_ann(spark, sf_dir):
    """IVF-PQ ANN (coarse inverted lists + residual product quantization —
    the canonical billion-scale index): corpus rows cost one cell id + m
    codes after a single Arrow-batched encode pass, probing scores only
    nprobe cells' rows at m-lookup cost.  Oracle pattern as
    similarity_pq_ann: exact best-other pinned via DuckDB cosine, corpus
    count pinned, ANN shortlist bounded by an overlap-or-self floor."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("corpus_vec")
    )
    ann = similarity.ivfpq_topk(
        queries, corpus, "query_id", "query_vec", "corpus_id", "corpus_vec",
        k=5, n_cells=16, nprobe=4, m=8, ksub=16,
    )
    exact = similarity.cosine_topk(queries, corpus, k=6)
    best_other = (
        exact.filter(F.col("query_id") != F.col("corpus_id"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("similarity").desc(), F.col("corpus_id")
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("query_id", F.col("corpus_id").cast("long").alias("best_other"))
    )
    exact5 = exact.filter(F.col("rank") <= 5).select(
        "query_id", F.col("corpus_id").alias("__eid")
    )
    overlap = (
        ann.join(
            exact5,
            (ann["query_id"] == exact5["query_id"]) & (ann["corpus_id"] == exact5["__eid"]),
        )
        .groupBy(ann["query_id"].alias("qid"))
        .agg(F.count(F.lit(1)).alias("__n_overlap"))
    )
    self_hit = ann.groupBy("query_id").agg(
        F.max((F.col("query_id") == F.col("corpus_id")).cast("int")).alias("__self")
    )
    n_corpus = corpus.agg(F.count(F.lit(1)).alias("n_corpus"))
    return (
        best_other.join(overlap, best_other["query_id"] == overlap["qid"], "left")
        .join(self_hit, "query_id", "left")
        .crossJoin(n_corpus)
        .select(
            "query_id",
            "best_other",
            F.col("n_corpus").cast("long").alias("n_corpus"),
            (
                (F.coalesce(F.col("__n_overlap"), F.lit(0)) >= 1)
                | (F.coalesce(F.col("__self"), F.lit(0)) == 1)
            ).alias("ann_signal_ok"),
        )
        .orderBy("query_id")
    )


@q(
    "similarity_ivfpq_index_probe",
    """SELECT q.vec_id AS query_id,
              (SELECT c.vec_id FROM embeddings c WHERE c.vec_id <> q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id LIMIT 1)::BIGINT AS best_other,
              (SELECT COUNT(*) FROM embeddings)::BIGINT AS n_corpus,
              TRUE AS ann_signal_ok, TRUE AS persisted_matches_memory_ok
       FROM embeddings q WHERE q.vec_id < 10 ORDER BY 1""",
)
def q_similarity_ivfpq_index_probe(spark, sf_dir):
    """PERSISTED IVF-PQ index probed from disk: (id, m codes) rows in
    cell-partitioned parquet + centroid/codebook sidecar.  Same
    best-other/signal-floor oracle as similarity_ivfpq_ann, PLUS an
    in-plan boolean that the persisted probe's (query, corpus, score)
    set EXACTLY equals the in-memory ivfpq_topk run with the same
    trained index — the parquet roundtrip must change layout, not
    math."""
    import os
    import tempfile

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("corpus_vec")
    )
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"ss_ivfpq_index{tag}")
    index = similarity.ivfpq_index_build(
        corpus, "corpus_id", "corpus_vec", path, n_cells=16, m=8, ksub=16
    )
    ann = similarity.ivfpq_index_probe(
        spark, path, queries, "query_id", "query_vec", k=5, nprobe=4
    )
    mem = similarity.ivfpq_topk(
        queries, corpus, "query_id", "query_vec", "corpus_id", "corpus_vec",
        k=5, n_cells=16, nprobe=4, m=8, ksub=16, index=index,
    )
    diff = ann.select("query_id", "corpus_id", "score").withColumnRenamed(
        "score", "s_p"
    ).join(
        mem.select("query_id", "corpus_id", F.col("score").alias("s_m")),
        ["query_id", "corpus_id"],
        "full",
    )
    n_mismatch = diff.agg(
        F.coalesce(
            F.sum(
                (
                    F.col("s_p").isNull()
                    | F.col("s_m").isNull()
                    | (F.abs(F.col("s_p") - F.col("s_m")) > 1e-9)
                ).cast("int")
            ),
            F.lit(0),
        ).alias("n_mismatch")
    )
    exact = similarity.cosine_topk(queries, corpus, k=6)
    best_other = (
        exact.filter(F.col("query_id") != F.col("corpus_id"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("similarity").desc(), F.col("corpus_id")
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("query_id", F.col("corpus_id").cast("long").alias("best_other"))
    )
    exact5 = exact.filter(F.col("rank") <= 5).select(
        "query_id", F.col("corpus_id").alias("__eid")
    )
    overlap = (
        ann.join(
            exact5,
            (ann["query_id"] == exact5["query_id"])
            & (ann["corpus_id"] == exact5["__eid"]),
        )
        .groupBy(ann["query_id"].alias("qid"))
        .agg(F.count(F.lit(1)).alias("__n_overlap"))
    )
    self_hit = ann.groupBy("query_id").agg(
        F.max((F.col("query_id") == F.col("corpus_id")).cast("int")).alias("__self")
    )
    n_corpus = corpus.agg(F.count(F.lit(1)).alias("n_corpus"))
    return (
        best_other.join(overlap, best_other["query_id"] == overlap["qid"], "left")
        .join(self_hit, "query_id", "left")
        .crossJoin(n_corpus)
        .crossJoin(n_mismatch)
        .select(
            "query_id",
            "best_other",
            F.col("n_corpus").cast("long").alias("n_corpus"),
            (
                (F.coalesce(F.col("__n_overlap"), F.lit(0)) >= 1)
                | (F.coalesce(F.col("__self"), F.lit(0)) == 1)
            ).alias("ann_signal_ok"),
            (F.col("n_mismatch") == 0).alias("persisted_matches_memory_ok"),
        )
        .orderBy("query_id")
    )


# =====================================================================
# text analysis
# =====================================================================

@q(
    "text_token_stats",
    """SELECT doc_id,
              len(string_split_regex(trim(text), '\\s+'))::INT AS n_tokens,
              length(text)::INT AS n_chars_actual
       FROM documents""",
)
def q_text_token_stats(spark, sf_dir):
    """Token counting (whitespace tokenizer)."""
    t = _t(spark, sf_dir)
    return core.ensure_parallelism(t["documents"]).select(
        "doc_id",
        textstats.token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


_QUALITY_ORACLE = """
SELECT doc_id,
       length(text)::INT AS n_chars,
       len(string_split_regex(trim(text), '\\s+'))::INT AS n_words,
       CAST(length(text) AS DOUBLE) / len(string_split_regex(trim(text), '\\s+')) AS mean_word_len,
       CAST(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS DOUBLE)
         / length(text) AS punct_ratio,
       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
         / length(text) AS digit_ratio,
       CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                 w -> list_contains(['the','a','of','and','to','in','is','that','it','for'], lower(w)))) AS DOUBLE)
         / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio_en
FROM documents
"""


@q("text_quality", _QUALITY_ORACLE)
def q_text_quality(spark, sf_dir):
    """Quality features: length/punct/digit/stopword ratios."""
    t = _t(spark, sf_dir)
    return textstats.quality_features(t["documents"], "text", "doc_id")


_QUALITY_CLASSIFIER_ORACLE = """
WITH f AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) / len(string_split_regex(trim(text), '\\s+')) AS mean_word_len,
         CAST(length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS DOUBLE)
           / length(text) AS punct_ratio,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
           / length(text) AS digit_ratio,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                   w -> list_contains(['the','a','of','and','to','in','is','that','it','for'], lower(w)))) AS DOUBLE)
           / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio_en
  FROM documents
), z AS (
  -- term order matches the Spark fold (sorted feature names) so the
  -- float sum is bit-identical before the 6dp round
  SELECT doc_id,
         -4.5 + (-10.0) * digit_ratio + 0.6 * mean_word_len
             + (-8.0) * punct_ratio + 6.0 * stopword_ratio_en AS zv
  FROM f
)
SELECT doc_id,
       ROUND(1.0 / (1.0 + EXP(-zv)), 6) AS quality_score,
       ROUND(1.0 / (1.0 + EXP(-zv)), 6) >= 0.5 AS keep
FROM z ORDER BY doc_id
"""


@q("text_quality_classifier", _QUALITY_CLASSIFIER_ORACLE)
def q_text_quality_classifier(spark, sf_dir):
    """Model-based quality filter: logistic score over the quality-feature
    projection with the repo's reference weights, plus the keep decision.
    The oracle replays the identical linear model in SQL (weights are
    literals; score rounded to 6dp per the repo-wide exp/ln discipline)."""
    t = _t(spark, sf_dir)
    out = textstats.quality_classifier(t["documents"], "text", "doc_id")
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(out, [SortKey("doc_id")])


_LANGID_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents
), s AS (
  SELECT doc_id,
    len(list_filter(words, x -> list_contains(['der','die','das','und','ist','von','mit','den','im','zu'], lower(x)))) AS s_de,
    len(list_filter(words, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], lower(x)))) AS s_en,
    len(list_filter(words, x -> list_contains(['el','la','de','que','y','en','un','es','se','no'], lower(x)))) AS s_es,
    len(list_filter(words, x -> list_contains(['le','la','de','et','un','est','que','pour','dans','ce'], lower(x)))) AS s_fr
  FROM w
)
SELECT doc_id,
  CASE WHEN GREATEST(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
       WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr) THEN 'de'
       WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr) THEN 'en'
       WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr) THEN 'es'
       ELSE 'fr' END AS lang_guess
FROM s
"""


@q("text_lang_id", _LANGID_ORACLE)
def q_text_lang_id(spark, sf_dir):
    """Stopword-profile language ID (argmax, alphabetical tie-break)."""
    t = _t(spark, sf_dir)
    return core.ensure_parallelism(t["documents"]).select(
        "doc_id", textstats.lang_id("text").alias("lang_guess")
    )


_FINGERPRINT_ORACLE = """
SELECT COUNT(*)::BIGINT AS n_docs,
       COUNT(DISTINCT lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))::BIGINT
         AS n_distinct_norm,
       TRUE AS fp_consistent_ok
FROM documents
"""


@q("doc_fingerprint", _FINGERPRINT_ORACLE)
def q_doc_fingerprint(spark, sf_dir):
    """64-bit normalized-content fingerprints for exact-dup detection,
    checked by the fingerprint CONTRACT: equal normalized text ⇔ equal
    fingerprint, so the distinct-fingerprint count must equal the
    distinct-normalized-text count (DuckDB computes the same
    normalization; a 64-bit collision at corpus scale is ~n²/2⁶⁵)."""
    t = _t(spark, sf_dir)
    fp = t["documents"].select(
        textstats.doc_fingerprint("text").alias("fp"),
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")).alias("norm"),
    )
    return fp.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("norm").cast("long").alias("n_distinct_norm"),
        (F.count_distinct("fp") == F.count_distinct("norm")).alias("fp_consistent_ok"),
    )


# =====================================================================
# multimodal plumbing
# =====================================================================

@q(
    "multimodal_bytes",
    """SELECT doc_id, octet_length(encode(text)) AS blob_bytes
       FROM documents""",
)
def q_multimodal_bytes(spark, sf_dir):
    """Binary-column plumbing: text → binary blob → byte length (the
    opaque-blob data path used for media)."""
    t = _t(spark, sf_dir)
    blob = F.encode(F.col("text"), "UTF-8")
    return t["documents"].select("doc_id", F.octet_length(blob).cast("long").alias("blob_bytes"))


@q(
    "multimodal_decode_stub",
    """SELECT doc_id,
              (64 + octet_length(encode(text)) % 1920)::BIGINT AS width,
              ((64 + octet_length(encode(text)) % 1920) * 3 // 4)::BIGINT AS height,
              octet_length(encode(text))::BIGINT AS n_bytes
       FROM documents""",
)
def q_multimodal_decode_stub(spark, sf_dir):
    """Arrow-batched media decode plumbing with the deterministic fake
    codec (length-derived dimensions, SQL-replayable — see
    pipeline.multimodal; the REAL codec path is oracle-checked by
    multimodal_decode_png)."""
    t = _t(spark, sf_dir)
    blobs = t["documents"].select("doc_id", F.encode(F.col("text"), "UTF-8").alias("blob"))
    media = multimodal.attach_media(blobs, "blob", media_type="image", fmt="fake")
    decoded = multimodal.decode_image_meta(media, "blob", fake=True)
    return decoded.select(
        "doc_id",
        F.col("image_features.width").cast("long").alias("width"),
        F.col("image_features.height").cast("long").alias("height"),
        F.col("image_features.n_bytes").cast("long").alias("n_bytes"),
    )


@q(
    "multimodal_decode_png",
    """SELECT doc_id,
              (1 + doc_id % 16)::BIGINT AS width,
              (1 + doc_id % 8)::BIGINT AS height,
              3::BIGINT AS channels,
              ((1 + doc_id % 16) * (1 + doc_id % 8) * 3 * (doc_id % 256))::BIGINT AS pix_sum,
              TRUE AS ok
       FROM documents""",
)
def q_multimodal_decode_png(spark, sf_dir):
    """REAL PNG decode end to end: synthesize an actual PNG blob per document
    (dimensions/fill derived from doc_id), then recover width/height/channel
    count and the pixel checksum by parsing the PNG byte stream (zlib inflate
    + scanline unfilter) inside the Arrow-batched kernel — no fake codec
    anywhere in the plan.  The oracle recomputes the closed-form expectations
    from doc_id, so a header-only 'decode' would still pass width/height but
    fail pix_sum."""
    t = _t(spark, sf_dir)
    dims = t["documents"].select(
        "doc_id",
        (1 + F.col("doc_id") % 16).cast("int").alias("w"),
        (1 + F.col("doc_id") % 8).cast("int").alias("h"),
        (F.col("doc_id") % 256).cast("int").alias("v"),
    )
    blobs = multimodal.synthesize_png(dims, "w", "h", "v")
    decoded = multimodal.decode_image_meta(blobs, "blob", fake=False)
    return decoded.select(
        "doc_id",
        F.col("image_features.width").cast("long").alias("width"),
        F.col("image_features.height").cast("long").alias("height"),
        F.col("image_features.channels").cast("long").alias("channels"),
        F.col("image_features.pix_sum").cast("long").alias("pix_sum"),
        F.col("image_features.ok").alias("ok"),
    )


@q(
    "multimodal_audio_wav",
    """SELECT doc_id,
              (50 + doc_id % 100)::BIGINT AS n_frames,
              1::BIGINT AS channels,
              16000::BIGINT AS sample_rate,
              (50 + doc_id % 100 - 1)::BIGINT AS zero_crossings,
              TRUE AS rms_ok
       FROM documents""",
)
def q_multimodal_audio_wav(spark, sf_dir):
    """REAL WAV decode end to end: synthesize 16-bit PCM RIFF blobs (an
    alternating ±level square wave per document), parse the RIFF chunks and
    recover frame count / channels / sample rate / zero crossings, and check
    the recovered RMS against its closed-form value (level/32768 for a ±level
    square wave) as an error-bound boolean — the float itself never enters
    the hash."""
    t = _t(spark, sf_dir)
    dims = t["documents"].select(
        "doc_id",
        (50 + F.col("doc_id") % 100).cast("int").alias("n"),
        (1 + F.col("doc_id") % 32000).cast("int").alias("lvl"),
    )
    blobs = multimodal.synthesize_wav(dims, "n", "lvl", rate=16000)
    decoded = multimodal.audio_features(blobs, "blob", fake=False)
    expected_rms = (1 + F.col("doc_id") % 32000).cast("double") / F.lit(32768.0)
    return decoded.select(
        "doc_id",
        F.col("audio_features.n_frames").cast("long").alias("n_frames"),
        F.col("audio_features.channels").cast("long").alias("channels"),
        F.col("audio_features.sample_rate").cast("long").alias("sample_rate"),
        F.col("audio_features.zero_crossings").cast("long").alias("zero_crossings"),
        (F.abs(F.col("audio_features.rms") - expected_rms) < 1e-9).alias("rms_ok"),
    )


@q(
    "multimodal_decode_jpeg",
    """SELECT doc_id,
              (8 + doc_id % 24)::BIGINT AS width,
              (8 + doc_id % 16)::BIGINT AS height,
              3::BIGINT AS channels,
              TRUE AS dc_ok
       FROM documents WHERE doc_id % 3 = 0""",
)
def q_multimodal_decode_jpeg(spark, sf_dir):
    """REAL baseline-JPEG decode end to end: synthesize an actual
    entropy-coded JFIF blob per document (solid fill — pure DC), parse it
    back through the Huffman/DCT decoder, and check exact dimensions plus
    the DC-accuracy bound (decoded mean pixel within half a quantization
    step of the fill; a header-only 'decode' could fake width/height but
    not the reconstructed pixels)."""
    t = _t(spark, sf_dir)
    docs = core.filter_op(t["documents"], F.col("doc_id") % 3 == 0)
    dims = docs.select(
        "doc_id",
        (8 + F.col("doc_id") % 24).cast("int").alias("w"),
        (8 + F.col("doc_id") % 16).cast("int").alias("h"),
        (F.col("doc_id") % 256).cast("int").alias("v"),
    )
    blobs = multimodal.synthesize_jpeg(dims, "w", "h", "v", quality=85)
    decoded = multimodal.decode_image_meta(blobs, "blob", fake=False)
    mean_px = (
        F.col("image_features.pix_sum").cast("double")
        / (F.col("image_features.width") * F.col("image_features.height") * 3)
    )
    return decoded.select(
        "doc_id",
        F.col("image_features.width").cast("long").alias("width"),
        F.col("image_features.height").cast("long").alias("height"),
        F.col("image_features.channels").cast("long").alias("channels"),
        (F.abs(mean_px - F.col("v")) <= 2.5).alias("dc_ok"),
    )


@q(
    "multimodal_gif_frames",
    """SELECT doc_id,
              unnest(range(0, 2 + doc_id % 4, 2))::BIGINT AS frame_index,
              (2 + doc_id % 4)::BIGINT AS n_frames,
              (3 + doc_id % 6)::BIGINT AS width,
              (2 + doc_id % 5)::BIGINT AS height,
              ((3 + doc_id % 6) * (2 + doc_id % 5) * 3
                * ((doc_id % 256 + 7 * unnest(range(0, 2 + doc_id % 4, 2))) % 256))::BIGINT AS pix_sum
       FROM documents WHERE doc_id % 6 = 0""",
)
def q_multimodal_gif_frames(spark, sf_dir):
    """REAL multi-frame (video-shaped) decode: synthesize animated GIFs
    (2–5 solid frames, per-frame fill in closed form), LZW-decode them, and
    sample every 2nd frame — GIF is lossless, so frame count, dimensions,
    and every sampled frame's exact pixel sum hash-match the oracle."""
    t = _t(spark, sf_dir)
    docs = core.filter_op(t["documents"], F.col("doc_id") % 6 == 0)
    dims = docs.select(
        "doc_id",
        (2 + F.col("doc_id") % 4).cast("int").alias("n"),
        (3 + F.col("doc_id") % 6).cast("int").alias("w"),
        (2 + F.col("doc_id") % 5).cast("int").alias("h"),
        (F.col("doc_id") % 256).cast("int").alias("v"),
    )
    blobs = multimodal.synthesize_gif(dims, "n", "w", "h", "v")
    frames = multimodal.gif_frame_features(blobs, "blob", every_n=2)
    return frames.select(
        "doc_id",
        F.col("frame.frame_index").cast("long").alias("frame_index"),
        F.col("frame.n_frames").cast("long").alias("n_frames"),
        F.col("frame.width").cast("long").alias("width"),
        F.col("frame.height").cast("long").alias("height"),
        F.col("frame.pix_sum").cast("long").alias("pix_sum"),
    )


@q(
    "multimodal_mixed_corpus",
    """SELECT doc_id,
              (doc_id % 4 < 2) AS ok,
              CASE WHEN doc_id % 4 = 0 THEN (2 + doc_id % 30)::BIGINT
                   WHEN doc_id % 4 = 1 THEN (8 + doc_id % 24)::BIGINT
                   ELSE NULL END AS width
       FROM documents""",
)
def q_multimodal_mixed_corpus(spark, sf_dir):
    """Mixed-format media corpus — the realistic 100 TB shape: one binary
    column holding PNGs, entropy-coded JPEGs, and plain undecodable bytes
    side by side.  One decode pass sniffs each blob's container, recovers
    real dimensions for the decodable ones, and flags the rest ok=False —
    no stage failure, no per-format branching in the plan."""
    t = _t(spark, sf_dir)
    docs = t["documents"]
    png = multimodal.synthesize_png(
        core.filter_op(docs, F.col("doc_id") % 4 == 0).select(
            "doc_id",
            (2 + F.col("doc_id") % 30).cast("int").alias("w"),
            (1 + F.col("doc_id") % 9).cast("int").alias("h"),
            (F.col("doc_id") % 256).cast("int").alias("v"),
        ),
        "w", "h", "v",
    ).select("doc_id", "blob")
    jpg = multimodal.synthesize_jpeg(
        core.filter_op(docs, F.col("doc_id") % 4 == 1).select(
            "doc_id",
            (8 + F.col("doc_id") % 24).cast("int").alias("w"),
            (8 + F.col("doc_id") % 16).cast("int").alias("h"),
            (F.col("doc_id") % 256).cast("int").alias("v"),
        ),
        "w", "h", "v",
    ).select("doc_id", "blob")
    garbage = core.filter_op(docs, F.col("doc_id") % 4 >= 2).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("blob")
    )
    corpus = png.unionByName(jpg).unionByName(garbage)
    decoded = multimodal.decode_image_meta(corpus, "blob", fake=False)
    return decoded.select(
        "doc_id",
        F.col("image_features.ok").alias("ok"),
        F.col("image_features.width").cast("long").alias("width"),
    )


@q(
    "multimodal_resize_roundtrip",
    """SELECT doc_id,
              4::BIGINT AS width, 3::BIGINT AS height,
              (4 * 3 * 3 * (doc_id % 256))::BIGINT AS pix_sum
       FROM documents WHERE doc_id % 5 = 0""",
)
def q_multimodal_resize_roundtrip(spark, sf_dir):
    """REAL resize path end to end: synthesize a solid-fill PNG per doc,
    decode → nearest-neighbor resample to 4×3 → re-encode as PNG inside the
    kernel, then decode the RESIZED bytes with the real decoder and check
    dimensions + pixel checksum (solid fill survives nearest-neighbor
    exactly, so pix_sum = 4·3·3·fill in closed form)."""
    t = _t(spark, sf_dir)
    docs = core.filter_op(t["documents"], F.col("doc_id") % 5 == 0)
    dims = docs.select(
        "doc_id",
        (2 + F.col("doc_id") % 14).cast("int").alias("w"),
        (2 + F.col("doc_id") % 7).cast("int").alias("h"),
        (F.col("doc_id") % 256).cast("int").alias("v"),
    )
    blobs = multimodal.synthesize_png(dims, "w", "h", "v")
    resized = multimodal.resize_image(blobs, "blob", 4, 3, fake=False)
    redecoded = multimodal.decode_image_meta(
        resized.select("doc_id", F.col("resized.data").alias("blob")), "blob", fake=False
    )
    return redecoded.select(
        "doc_id",
        F.col("image_features.width").cast("long").alias("width"),
        F.col("image_features.height").cast("long").alias("height"),
        F.col("image_features.pix_sum").cast("long").alias("pix_sum"),
    )


@q(
    "multimodal_frame_plan",
    """SELECT doc_id, unnest(range(0, GREATEST((octet_length(encode(text)) // 1024) - 1, 0) + 1, 3))::BIGINT AS frame_index
       FROM documents""",
)
def q_multimodal_frame_plan(spark, sf_dir):
    """Video frame-sampling plan: JVM-side explode of the frame-index
    sequence (stub rate 1 frame/KiB) so a downstream decode kernel only
    ever touches sampled frames — the explode IS the plan, no Python in
    the path."""
    t = _t(spark, sf_dir)
    blobs = t["documents"].select("doc_id", F.encode(F.col("text"), "UTF-8").alias("blob"))
    out = multimodal.frame_sample_plan(blobs, "blob", every_n=3)
    return out.select("doc_id", F.col("frame_index").cast("long").alias("frame_index"))


_CURATION_ORACLE = """
WITH w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS words
  FROM documents
), base AS (
  SELECT doc_id, text, words, len(words) AS n_words FROM w WHERE len(words) >= 5
), uniq AS (
  SELECT MIN(doc_id) AS doc_id, text, MIN(n_words) AS n_words,
         string_split_regex(trim(text), '\\s+') AS words
  FROM base GROUP BY text
), s AS (
  SELECT n_words,
    len(list_filter(words, x -> list_contains(['der','die','das','und','ist','von','mit','den','im','zu'], lower(x)))) AS s_de,
    len(list_filter(words, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], lower(x)))) AS s_en,
    len(list_filter(words, x -> list_contains(['el','la','de','que','y','en','un','es','se','no'], lower(x)))) AS s_es,
    len(list_filter(words, x -> list_contains(['le','la','de','et','un','est','que','pour','dans','ce'], lower(x)))) AS s_fr
  FROM uniq
), lang AS (
  SELECT n_words,
    CASE WHEN GREATEST(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
         WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr) THEN 'de'
         WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr) THEN 'en'
         WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr) THEN 'es'
         ELSE 'fr' END AS lang_guess
  FROM s
)
SELECT lang_guess, COUNT(*) AS n_docs, SUM(n_words)::BIGINT AS total_tokens
FROM lang GROUP BY lang_guess
"""


@q("corpus_curation_pipeline", _CURATION_ORACLE)
def q_corpus_curation_pipeline(spark, sf_dir):
    """Flagship corpus-curation composition — the canonical training-data
    flow run as ONE plan: length filter → exact dedup → language ID →
    per-language corpus stats.  Every stage is an engine operator;
    Catalyst fuses the filter into the scan and partial-aggregates both
    groupBys map-side.

    Shuffle discipline: all per-document expressions (token count, lang
    id) evaluate BEFORE the dedup, so the dedup shuffle carries only
    (8-byte text digest, doc_id, n_words, lang_guess) — the raw text
    never shuffles.  Duplicate texts agree on every derived column, so
    MIN-aggregating them under the digest is exact (same xxhash64
    collision stance as exact_dedup).  Measured at sf0.1: 1.65 s → 0.72 s
    steady-state vs grouping on the full text.  The trade — lang_id runs
    per row instead of per unique text — buys it: the expression is a
    handful of JVM regexp counts, while shipping full text through an
    exchange is what dies at 100 TB."""
    from supersonic_spark.operators import aggregate as agg_ops
    from supersonic_spark.operators.aggregate import AggSpec, Aggregation

    t = _t(spark, sf_dir)
    base = core.ensure_parallelism(t["documents"]).select(
        "doc_id", "text", textstats.token_count("text").alias("n_words")
    )
    base = core.filter_op(base, F.col("n_words") >= 5)
    enriched = base.select(
        F.xxhash64("text").alias("__digest"),
        "doc_id",
        "n_words",
        textstats.lang_id("text").alias("lang_guess"),
    )
    uniq = agg_ops.group_aggregate(
        enriched,
        ["__digest"],
        [
            AggSpec(Aggregation.MIN, "doc_id", "doc_id"),
            AggSpec(Aggregation.MIN, "n_words", "n_words"),
            AggSpec(Aggregation.MIN, "lang_guess", "lang_guess"),
        ],
    )
    return agg_ops.group_aggregate(
        uniq,
        ["lang_guess"],
        [
            AggSpec(Aggregation.COUNT, None, "n_docs"),
            AggSpec(Aggregation.SUM, "n_words", "total_tokens"),
        ],
    )


# =====================================================================
# sampling / splitting / packing
# =====================================================================

_SPLIT_ORACLE = """
SELECT COUNT(*)::BIGINT AS n_docs, TRUE AS complete_ok,
       TRUE AS train_frac_ok, TRUE AS val_frac_ok, TRUE AS test_frac_ok
FROM documents
"""


@q(
    "sample_fixed_k",
    """SELECT doc_id, n_words FROM (
         SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_words,
                md5(CAST(doc_id AS VARCHAR)) AS h
         FROM documents ORDER BY h, doc_id LIMIT 50)
       ORDER BY doc_id""",
)
def q_sample_fixed_k(spark, sf_dir):
    """Deterministic fixed-size uniform sample (distributed reservoir):
    rank by a PORTABLE hash (md5 — identical in every engine) and keep the
    k smallest, so the selected set itself hash-matches the oracle — no
    error-bound booleans needed.  Plan: per-partition top-k + k-row merge
    (TakeOrderedAndProject), never a global sort."""
    from supersonic_spark.pipeline import sampling

    t = _t(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id", textstats.token_count("text").alias("n_words")
    )
    out = sampling.fixed_size_sample(docs, 50, "doc_id", portable=True)
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(out, [SortKey("doc_id")])


@q("sample_split_hash", _SPLIT_ORACLE)
def q_sample_split_hash(spark, sf_dir):
    """Deterministic train/val/test assignment by identity hash — checked
    on its invariants: exhaustive+disjoint (every doc lands in exactly one
    of the three splits, so the split counts sum to the corpus), and each
    split's realized fraction sits within a generous hash-uniformity bound
    of its target (±0.06 train, ±0.045 val/test ≈ 4.5σ at n=500)."""
    from supersonic_spark.pipeline import sampling

    t = _t(spark, sf_dir)
    out = sampling.split_by_hash(
        t["documents"], "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum((F.col("split") == "train").cast("int")), F.lit(0)).alias("tr"),
        F.coalesce(F.sum((F.col("split") == "val").cast("int")), F.lit(0)).alias("va"),
        F.coalesce(F.sum((F.col("split") == "test").cast("int")), F.lit(0)).alias("te"),
    )
    n = F.col("n").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_docs"),
        (F.col("tr") + F.col("va") + F.col("te") == F.col("n")).alias("complete_ok"),
        (F.abs(F.col("tr") / n - 0.9) <= 0.06).alias("train_frac_ok"),
        (F.abs(F.col("va") / n - 0.05) <= 0.045).alias("val_frac_ok"),
        (F.abs(F.col("te") / n - 0.05) <= 0.045).alias("test_frac_ok"),
    )


_PACK_ORACLE = """
SELECT COUNT(*)::BIGINT AS n_docs,
       COALESCE(SUM(len(string_split_regex(trim(text), '\\s+'))), 0)::BIGINT
         AS total_tokens,
       TRUE AS budget_ok, TRUE AS docs_once_ok
FROM documents
"""


@q("sample_pack_sequences", _PACK_ORACLE)
def q_sample_pack_sequences(spark, sf_dir):
    """Greedy sequence packing for training batches (per-partition bin
    fill, globally-unique batch ids), checked on the packing contract:
    token mass is conserved (sum over packs equals the corpus token count
    DuckDB computes), every batch holding >1 document stays ≤ the budget
    (oversized docs are singletons), and every document appears in exactly
    one batch."""
    from supersonic_spark.pipeline import sampling, textstats
    from supersonic_spark.session import track_persist

    t = _t(spark, sf_dir)
    docs = core.ensure_parallelism(t["documents"]).select(
        "doc_id", textstats.token_count("text").alias("n_tok")
    )
    # Persisted because THREE verification branches consume it: without
    # the persist each branch re-runs the whole tokenize+pack Python pass
    # (the r8 before-plan shows the MapInPandas subtree duplicated).  The
    # packed projection is 24 B/row — persisting it is the guide's
    # reuse-vs-recompute call, and the two-pass cache registry releases
    # it between bench runs like the other two-pass operators.
    packed = track_persist(
        sampling.pack_sequences(docs, "doc_id", "n_tok", budget=2048)
    )
    per_batch = packed.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("b_docs"), F.sum("n_tokens").alias("b_tok")
    )
    bad_batches = per_batch.agg(
        F.coalesce(
            F.sum(((F.col("b_docs") > 1) & (F.col("b_tok") > 2048)).cast("int")),
            F.lit(0),
        ).alias("n_over")
    )
    totals = packed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("id").alias("n_ids"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("total_tokens"),
    )
    n_docs = t["documents"].agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        n_docs.crossJoin(totals)
        .crossJoin(bad_batches)
        .select(
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            (F.col("n_over") == 0).alias("budget_ok"),
            ((F.col("n_rows") == F.col("n_docs"))
             & (F.col("n_ids") == F.col("n_docs"))).alias("docs_once_ok"),
        )
    )


# =====================================================================
# embedding near-dup + IVF ANN
# =====================================================================

_EMB_NEARDUP_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 200)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
             6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.3
"""


@q("dedup_embedding_cosine", _EMB_NEARDUP_ORACLE)
def q_dedup_embedding_cosine(spark, sf_dir):
    """Exact embedding-cosine near-dup pairs (ground truth for the LSH
    variant); double-precision JVM-side fold, no UDFs."""
    t = _t(spark, sf_dir)
    emb = core.filter_op(t["embeddings"], F.col("vec_id") < 200)
    out = dedup.embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.3)
    return out.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


_EMB_LSH_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 200),
p AS (
  SELECT COUNT(*)::BIGINT AS n_exact
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        >= 0.3
)
SELECT n_exact, TRUE AS subset_ok, TRUE AS planted_found_ok, TRUE AS recall_floor_ok
FROM p
"""


@q("dedup_embedding_lsh", _EMB_LSH_ORACLE)
def q_dedup_embedding_lsh(spark, sf_dir):
    """Sign-random-projection-bucketed embedding near-dup (the scale path
    for dedup_embedding_cosine), checked three ways: (1) exact rescoring ⇒
    the LSH pair set is a SUBSET of the exact cos ≥ 0.3 pairs (count
    DuckDB-pinned); (2) three PLANTED scaled copies (sign pattern
    identical ⇒ same bucket in every table) must always be recovered —
    the SRP collision guarantee; (3) corpus recall stays above a floor
    when enough exact pairs exist (per-pair collision ≥ ~0.3 at cos 0.35
    with 8 planes × 16 tables)."""
    t = _t(spark, sf_dir)
    emb = core.filter_op(t["embeddings"], F.col("vec_id") < 200).select(
        "vec_id", "embedding"
    )
    elem_t = t["embeddings"].schema["embedding"].dataType.elementType.simpleString()
    planted = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(2.0)).cast(elem_t)).alias(
            "embedding"
        ),
    )
    aug = emb.unionByName(planted)
    lsh = dedup.embedding_lsh_pairs(
        aug, "vec_id", "embedding", dim=64, threshold=0.3, planes=8, tables=16
    ).select("id_a", "id_b")
    exact = dedup.embedding_cosine_pairs(aug, "vec_id", "embedding", threshold=0.3)
    orig_exact = exact.filter((F.col("id_a") < 1000000) & (F.col("id_b") < 1000000))
    ex_agg = orig_exact.agg(F.count(F.lit(1)).alias("n_exact"))
    found_orig = lsh.join(orig_exact.select("id_a", "id_b"), ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).alias("n_found")
    )
    outside = lsh.join(
        exact.select("id_a", "id_b", F.lit(1).alias("m")), ["id_a", "id_b"], "left"
    ).agg(F.coalesce(F.sum(F.col("m").isNull().cast("int")), F.lit(0)).alias("n_out"))
    planted_found = lsh.filter(
        (F.col("id_b") == F.col("id_a") + 1000000) & (F.col("id_a") < 3)
    ).agg(F.count(F.lit(1)).alias("n_planted"))
    return (
        ex_agg.crossJoin(found_orig)
        .crossJoin(outside)
        .crossJoin(planted_found)
        .select(
            F.col("n_exact").cast("long").alias("n_exact"),
            (F.col("n_out") == 0).alias("subset_ok"),
            (F.col("n_planted") == 3).alias("planted_found_ok"),
            ((F.col("n_exact") < 30)
             | (F.col("n_found") >= 0.08 * F.col("n_exact"))).alias("recall_floor_ok"),
        )
    )


_IVF_ORACLE = """
SELECT vec_id AS query_id, TRUE AS self_found_ok, TRUE AS top1_exact_ok,
       TRUE AS recall_floor_ok
FROM embeddings WHERE vec_id < 10 ORDER BY query_id
"""


@q("similarity_ivf_ann", _IVF_ORACLE)
def q_similarity_ivf_ann(spark, sf_dir):
    """IVF approximate top-k (trained coarse quantizer, cell-partitioned
    corpus, nprobe-cell probe + exact rescoring), checked via the IVF
    guarantee: each query vector is itself in the corpus and lives in the
    cell of its own nearest centroid — the FIRST cell the query probes —
    so it is always a candidate and exact rescoring ranks it top with
    cosine 1.0.  A global recall@5 floor vs the exact top-k (measured
    ≈0.8 at nprobe=8/16 cells; bound 0.4) rides along as a boolean."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("corpus_vec")
    )
    out = similarity.ivf_topk(
        queries, corpus, "query_id", "query_vec", "corpus_id", "corpus_vec",
        k=5, n_cells=16, nprobe=8, train=True,
    )
    exact = similarity.cosine_topk(queries, corpus, k=5)
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_ex"))
    n_hit = out.join(
        exact.select("query_id", "corpus_id"), ["query_id", "corpus_id"]
    ).agg(F.count(F.lit(1)).alias("n_hit"))
    recall = n_exact.crossJoin(n_hit).select(
        (F.col("n_hit") >= 0.4 * F.col("n_ex")).alias("recall_floor_ok")
    )
    per_q = out.groupBy("query_id").agg(
        F.max((F.col("query_id") == F.col("corpus_id")).cast("int")).alias("self_hit"),
        F.max(F.round("cos", 6)).alias("top1_cos"),
    )
    return (
        per_q.crossJoin(recall)
        .select(
            "query_id",
            (F.col("self_hit") == 1).alias("self_found_ok"),
            (F.col("top1_cos") == 1.0).alias("top1_exact_ok"),
            "recall_floor_ok",
        )
        .orderBy("query_id")
    )


_CLUSTER_ORACLE = """
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(words[i:i+2], ' ')
                        for i in range(1, len(words) - 1)]) AS grams
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
        FROM documents WHERE doc_id < 200)
  WHERE len(words) >= 3
), ex AS (
  SELECT doc_id, unnest(grams) AS g FROM sh
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN (SELECT doc_id, len(grams) AS n FROM sh) na ON na.doc_id = id_a
  JOIN (SELECT doc_id, len(grams) AS n FROM sh) nb ON nb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.1
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
), comp AS (
  SELECT a AS id, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a
)
SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d
LEFT JOIN comp c ON c.id = d.doc_id
ORDER BY d.doc_id
"""


@q("dedup_jaccard_clusters", _CLUSTER_ORACLE)
def q_dedup_jaccard_clusters(spark, sf_dir):
    """Near-dup CLUSTERS (transitive closure of the exact Jaccard pairs):
    every doc labeled with the min doc_id of its duplicate component —
    the form removal actually needs (A~B, B~C ⇒ one cluster).  Oracle is a
    recursive CTE; the engine side is iterative min-label propagation
    (pipeline.dedup.connected_components — O(diameter) join+agg rounds).
    """
    t = _t(spark, sf_dir)
    docs = core.filter_op(t["documents"], F.col("doc_id") < 200)
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text",
                                      shingle_words=3, threshold=0.1)
    out = dedup.cluster_dedup(docs, pairs, "doc_id")
    from supersonic_spark.operators.sort import SortKey
    from supersonic_spark.operators import sort as sort_ops

    return sort_ops.sort(out, [SortKey("doc_id")]).select("doc_id", "component")


_REPETITION_ORACLE = r"""
WITH w AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents
), wc AS (
  SELECT doc_id, tok, count(*) AS c FROM w GROUP BY 1, 2
), ws AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, max(c) AS top_c,
         count(*) AS n_distinct
  FROM wc GROUP BY 1
), base AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents
), g AS (
  SELECT doc_id,
         unnest([words[i] || ' ' || words[i+1]
                 for i in range(1, len(words))]) AS gm
  FROM base WHERE len(words) >= 2
), gc AS (
  SELECT doc_id, gm, count(*) AS c FROM g GROUP BY 1, 2
), gs AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS g_total, count(*) AS g_distinct
  FROM gc GROUP BY 1
)
SELECT ws.doc_id, n_words,
       round(CAST(top_c AS DOUBLE) / n_words, 6) AS top_word_frac,
       round(CAST(n_distinct AS DOUBLE) / n_words, 6) AS distinct_word_ratio,
       round(coalesce(1.0 - CAST(g_distinct AS DOUBLE) / g_total, 0.0), 6)
         AS dup_2gram_frac
FROM ws LEFT JOIN gs ON ws.doc_id = gs.doc_id
ORDER BY ws.doc_id
"""


@q("text_repetition_signals", _REPETITION_ORACLE)
def q_text_repetition_signals(spark, sf_dir):
    """Gopher-style repetition quality signals per document: top-word
    share, distinct-word ratio, duplicate-2-gram fraction.  No final
    sort: the driver compare is order-insensitive, and a range sort on
    top of the (now zero-shuffle, map-only) signal projection both
    re-evaluates it for range sampling and collapses its parallelism
    through the post-sort coalesce — measured 3.9 s vs 0.4 s at sf0.1."""
    t = _t(spark, sf_dir)
    return textstats.repetition_signals(t["documents"], "doc_id", "text")


_PII_INJECT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or 555-123-4567 at 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)"
)

_PII_ORACLE = rf"""
WITH inj AS (
  SELECT doc_id, {_PII_INJECT_SQL} AS text FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}'))
    AS n_email,
  len(regexp_extract_all(text, '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b'))
    AS n_ipv4,
  len(regexp_extract_all(text, '\+?\d{{3}}[- ]\d{{3}}[- ]\d{{4}}')) AS n_phone,
  regexp_replace(
    regexp_replace(
      regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '[PII]', 'g'),
      '\+?\d{{3}}[- ]\d{{3}}[- ]\d{{4}}', '[PII]', 'g'),
    '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b', '[PII]', 'g') AS redacted
FROM inj ORDER BY doc_id
"""


@q("text_pii_redact", _PII_ORACLE)
def q_text_pii_redact(spark, sf_dir):
    """PII detection + redaction (emails, IPv4, phone numbers) over text
    with deterministically injected PII — counts per kind plus the redacted
    text, all JVM regex (zero-shuffle map stage)."""
    t = _t(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-4567 at 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
        ).alias("text"),
    )
    out = docs.select(
        "doc_id",
        *textstats.pii_counts("text"),
        textstats.pii_redact("text").alias("redacted"),
    )
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(out, [SortKey("doc_id")])


@q(
    "dedup_fuzzy_part_names",
    """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
              levenshtein(a.p_name, b.p_name) AS dist
       FROM part a
       JOIN part b
         ON substring(a.p_name, 1, 1) = substring(b.p_name, 1, 1)
        AND a.p_partkey < b.p_partkey
        AND ABS(length(a.p_name) - length(b.p_name)) <= 2
       WHERE levenshtein(a.p_name, b.p_name) <= 2
       ORDER BY id_a, id_b""",
)
def q_dedup_fuzzy_part_names(spark, sf_dir):
    """Edit-distance fuzzy matching over part names (entity resolution):
    prefix-blocked, length-banded self-join, 3-arg early-exit levenshtein.
    """
    t = _t(spark, sf_dir)
    out = dedup.fuzzy_pairs(t["part"], "p_partkey", "p_name", max_dist=2)
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(out, [SortKey("id_a"), SortKey("id_b")]).select(
        "id_a", "id_b", "dist"
    )


_DECONTAM_ORACLE = r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(words[i:i+3], ' ')
                        for i in range(1, len(words) - 2)]) AS grams
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
        FROM documents)
  WHERE len(words) >= 4
), corpus AS (
  SELECT doc_id, unnest(grams) AS g FROM sh WHERE doc_id % 37 <> 0
), bench AS (
  SELECT doc_id AS bid, unnest(grams) AS g FROM sh WHERE doc_id % 37 = 0
)
SELECT corpus.doc_id,
       COUNT(DISTINCT corpus.g) AS n_shared_grams,
       COUNT(DISTINCT bid) AS n_bench_docs
FROM corpus JOIN bench ON corpus.g = bench.g
GROUP BY 1 ORDER BY 1
"""


@q("dedup_decontaminate", _DECONTAM_ORACLE)
def q_dedup_decontaminate(spark, sf_dir):
    """Benchmark decontamination: corpus docs sharing any word 4-gram with
    a held-out eval split (here doc_id % 37 == 0; production default is
    8-grams — 4 keeps the gate non-trivial on the short synthetic docs).
    Hash-keyed gram join — distinct counts are hash-invariant, so the
    oracle joins raw grams."""
    t = _t(spark, sf_dir)
    docs = t["documents"]
    corpus = core.filter_op(docs, F.col("doc_id") % 37 != 0)
    bench = core.filter_op(docs, F.col("doc_id") % 37 == 0)
    out = dedup.ngram_overlap(corpus, bench, "doc_id", "text", "doc_id", "text", n=4)
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(out, [SortKey("doc_id")])


_SUBSTRING_SPANS_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents WHERE text IS NOT NULL
), grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+3], ' ') AS gram
  FROM toks, UNNEST(generate_series(1, len(t) - 3)) AS u(i)
  WHERE len(t) >= 4
), dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
), spans AS (
  SELECT g.doc_id, g.pos AS s, g.pos + 3 AS e
  FROM grams g JOIN dup USING (gram)
), flagged AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id
                    ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS new_isl
  FROM spans
), islands AS (
  SELECT doc_id, s, e,
         SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM flagged
)
SELECT doc_id, CAST(MIN(s) AS BIGINT) AS start_tok,
       CAST(MAX(e) AS BIGINT) AS end_tok,
       CAST(MAX(e) - MIN(s) + 1 AS BIGINT) AS n_tokens
FROM islands GROUP BY doc_id, isl
ORDER BY doc_id, start_tok
"""


_SUBSTRING_INCR_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents WHERE text IS NOT NULL
), grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+3], ' ') AS gram
  FROM toks, UNNEST(generate_series(1, len(t) - 3)) AS u(i)
  WHERE len(t) >= 4
), corpus AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 2 = 0
), spans AS (
  SELECT g.doc_id, g.pos AS s, g.pos + 3 AS e
  FROM grams g JOIN corpus USING (gram)
  WHERE g.doc_id % 2 = 1
), flagged AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY doc_id
                    ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS new_isl
  FROM spans
), islands AS (
  SELECT doc_id, s, e,
         SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM flagged
)
SELECT doc_id, CAST(MIN(s) AS BIGINT) AS start_tok,
       CAST(MAX(e) AS BIGINT) AS end_tok,
       CAST(MAX(e) - MIN(s) + 1 AS BIGINT) AS n_tokens
FROM islands GROUP BY doc_id, isl
ORDER BY doc_id, start_tok
"""


@q("dedup_substring_incremental", _SUBSTRING_INCR_ORACLE)
def q_dedup_substring_incremental(spark, sf_dir):
    """Incremental substring decontamination against a PERSISTED gram
    index: even-id docs are the standing corpus (their substring_gram_index
    is written to parquet and read back — the cross-session artifact),
    odd-id docs are the new batch; output is each new doc's merged token
    spans covered by corpus-known 4-grams.  The corpus text is never
    re-tokenized at probe time.  Span equality is hash-invariant, so the
    oracle joins raw grams."""
    import os
    import tempfile

    t = _t(spark, sf_dir)
    docs = t["documents"]
    corpus = core.filter_op(docs, F.col("doc_id") % 2 == 0)
    batch = core.filter_op(docs, F.col("doc_id") % 2 == 1)

    tag = sf_dir.rstrip("/").replace("/", "_")
    idx_path = os.path.join(tempfile.gettempdir(), f"ss_substr_index{tag}")
    dedup.substring_gram_index(corpus, "doc_id", "text", k=4).write.mode(
        "overwrite"
    ).parquet(idx_path)
    index = spark.read.parquet(idx_path)

    out = dedup.substring_spans_against_index(
        batch, index, "doc_id", "text", k=4
    )
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(out, [SortKey("doc_id"), SortKey("start_tok")]).select(
        "doc_id",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.col("end_tok").cast("long").alias("end_tok"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


@q("dedup_substring_spans", _SUBSTRING_SPANS_ORACLE)
def q_dedup_substring_spans(spark, sf_dir):
    """Exact duplicated-substring spans (Lee et al. 2022 substring-level
    dedup): per document, the merged 1-based token spans covered by any
    4-token gram occurring in >= 2 distinct documents (production default
    is ~50 BPE tokens; 4 keeps the gate non-trivial on the short synthetic
    docs).  Document-level MinHash misses shared boilerplate paragraphs
    inside otherwise-distinct documents; this emits exactly those spans.
    Hash-keyed gram aggregation — span equality is hash-invariant, so the
    oracle joins raw grams.  Scale shape: linear end to end (rolling-gram
    explode, one df aggregation, shuffled-hash join back, window island
    merge per doc) — no pair join anywhere."""
    t = _t(spark, sf_dir)
    out = dedup.substring_dup_spans(t["documents"], "doc_id", "text", k=4, min_df=2)
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(out, [SortKey("doc_id"), SortKey("start_tok")]).select(
        "doc_id",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.col("end_tok").cast("long").alias("end_tok"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


_CLUSTERS_ORACLE = _exact_pair_stats_sql("""
SELECT id, component FROM (
  WITH RECURSIVE
  p AS (SELECT id_a, id_b FROM j WHERE jac >= 0.5),
  e AS (SELECT id_a AS a, id_b AS b FROM p
        UNION SELECT id_b, id_a FROM p),
  reach(a, b) AS (
    SELECT a, b FROM e
    UNION
    SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a WHERE e.b <> r.a
  )
  SELECT a AS id, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a
) ORDER BY id""")


_KEEP_BEST_ORACLE = _exact_pair_stats_sql("""
SELECT doc_id, component, is_canonical FROM (
  WITH RECURSIVE
  p AS (SELECT id_a, id_b FROM j WHERE jac >= 0.5),
  e AS (SELECT id_a AS a, id_b AS b FROM p
        UNION SELECT id_b, id_a FROM p),
  reach(a, b) AS (
    SELECT a, b FROM e
    UNION
    SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a WHERE e.b <> r.a
  ),
  comp AS (SELECT a AS id, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a)
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
         (ROW_NUMBER() OVER (PARTITION BY COALESCE(c.component, d.doc_id)
                             ORDER BY d.n_chars DESC, d.doc_id) = 1)
           AS is_canonical
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
) ORDER BY doc_id""")


@q("dedup_cluster_keep_best", _KEEP_BEST_ORACLE)
def q_dedup_cluster_keep_best(spark, sf_dir):
    """Quality-aware cluster dedup: near-dup clusters (exact-Jaccard pairs
    → connected components) keep their HIGHEST-QUALITY member (max
    n_chars, ties to the smaller id) instead of the lowest id — the
    keep-the-longest-capture curation policy.  Full hash check: the
    oracle recomputes pairs, closes them recursively, and replays the
    same quality window over every document including singletons."""
    t = _t(spark, sf_dir)
    docs = t["documents"]
    pairs = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_words=3, threshold=0.5
    )
    out = dedup.cluster_dedup(docs, pairs, "doc_id", quality_col="n_chars")
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(out, [SortKey("doc_id")]).select(
        "doc_id", "component", "is_canonical"
    )


@q("dedup_duplicate_clusters", _CLUSTERS_ORACLE)
def q_dedup_duplicate_clusters(spark, sf_dir):
    """Transitive near-dup clusters: exact-Jaccard pairs → connected
    components by min-label propagation (id, component = min reachable id).
    The oracle recomputes the same pairs in DuckDB and closes them with a
    recursive-CTE transitive closure — a full hash check of the clustering,
    not just the pair list."""
    t = _t(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(
        t["documents"], "doc_id", "text", shingle_words=3, threshold=0.5
    )
    cc = dedup.connected_components(pairs)
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(cc, [SortKey("id")]).select("id", "component")


@q("dedup_clusters_two_phase", _CLUSTERS_ORACLE)
def q_dedup_clusters_two_phase(spark, sf_dir):
    """Same clustering, computed by the large-star/small-star algorithm
    (O(log n) rounds — the deep-graph scale path) and hash-checked against
    the identical recursive-closure oracle."""
    t = _t(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(
        t["documents"], "doc_id", "text", shingle_words=3, threshold=0.5
    )
    cc = dedup.connected_components_two_phase(pairs)
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(cc, [SortKey("id")]).select("id", "component")


_UNIGRAM_LM_ORACLE = r"""
WITH p AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
  FROM documents
), pairs AS (
  SELECT doc_id, token FROM p WHERE token <> ''
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM pairs GROUP BY 1, 2
), lm AS (
  SELECT token, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1
), consts AS (
  SELECT CAST(sum(c) AS BIGINT) AS total, count(*) AS v FROM lm
)
SELECT doc_id,
       round(sum(tf * ln((c + 1.0) / (total + v))) / CAST(sum(tf) AS DOUBLE), 6)
         AS avg_logprob,
       CAST(sum(tf) AS BIGINT) AS n_tokens
FROM tf JOIN lm USING (token) CROSS JOIN consts
GROUP BY doc_id ORDER BY doc_id
"""


@q("text_unigram_logprob", _UNIGRAM_LM_ORACLE)
def q_text_unigram_logprob(spark, sf_dir):
    """Corpus-trained unigram LM fluency score: per-doc mean token
    log-probability (add-one smoothed), a KenLM-style quality proxy."""
    t = _t(spark, sf_dir)
    out = textstats.unigram_logprob(t["documents"], "doc_id", "text")
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(out, [SortKey("doc_id")])


_CHUNK_ORACLE = r"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents
), c AS (
  SELECT doc_id,
         unnest([array_to_string(words[s:s+19], ' ')
                 for s in range(1, greatest(len(words) - 5, 1) + 1, 15)]) AS chunk_text,
         generate_subscripts([x for x in range(1, greatest(len(words) - 5, 1) + 1, 15)], 1) - 1
           AS chunk_id
  FROM base
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id, chunk_text,
       len(string_split_regex(chunk_text, '\s+'))::INT AS n_chunk_tokens
FROM c ORDER BY doc_id, chunk_id
"""


@q("text_chunk_documents", _CHUNK_ORACLE)
def q_text_chunk_documents(spark, sf_dir):
    """Token-budgeted overlapping document chunking (20-token chunks,
    5-token overlap): zero-shuffle slice/posexplode map stage."""
    t = _t(spark, sf_dir)
    out = textstats.chunk_documents(
        t["documents"], "doc_id", "text", chunk_tokens=20, overlap=5
    )
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(out, [SortKey("doc_id"), SortKey("chunk_id")])


_MIXTURE_ORACLE = """
WITH tiers AS (
  SELECT CASE WHEN doc_id % 10 < 7 THEN 'head'
              WHEN doc_id % 10 < 9 THEN 'mid'
              ELSE 'tail' END AS tier
  FROM documents
), c AS (
  SELECT tier, COUNT(*)::BIGINT AS n FROM tiers GROUP BY tier
), w AS (
  SELECT tier, n, pow(CAST(n AS DOUBLE), -0.5) AS ww FROM c
)
SELECT tier, n AS n_total,
       round(ww / (SELECT max(ww) FROM w), 6) AS weight,
       TRUE AS frac_ok
FROM w ORDER BY tier
"""


@q("sample_weighted_mixture", _MIXTURE_ORACLE)
def q_sample_weighted_mixture(spark, sf_dir):
    """Temperature-flattened corpus mixture (t=0.5: weight ∝ n^-0.5,
    normalized to the smallest tier) fed to deterministic weighted
    sampling.  The oracle pins the per-tier counts AND the weight formula
    exactly (DuckDB computes the same pow/max), plus a boolean that the
    realized sampling fraction sits within a 6σ+0.005 binomial band of
    the target weight — the whole-tier (weight 1.0) case is exact."""
    from supersonic_spark.pipeline import sampling

    t = _t(spark, sf_dir)
    docs = t["documents"].withColumn(
        "tier",
        F.when(F.col("doc_id") % 10 < 7, F.lit("head"))
        .when(F.col("doc_id") % 10 < 9, F.lit("mid"))
        .otherwise(F.lit("tail")),
    )
    weights = sampling.mixture_weights(docs, "tier", temperature=0.5)
    weighted = docs.join(F.broadcast(weights.select("tier", "weight")), "tier")
    out = sampling.weighted_sample_by_hash(weighted, "doc_id", "weight")
    kept = out.groupBy("tier").agg(F.count(F.lit(1)).alias("n_kept"))
    joined = weights.join(kept, "tier", "left").na.fill({"n_kept": 0})
    w, n, k = F.col("weight"), F.col("n").cast("double"), F.col("n_kept").cast("double")
    tol = 6 * F.sqrt(w * (1 - w) / n) + 0.005
    return joined.select(
        "tier",
        F.col("n").cast("long").alias("n_total"),
        F.round(w, 6).alias("weight"),
        (F.abs(k / n - w) <= tol).alias("frac_ok"),
    ).orderBy("tier")


_MEAN_EMB_ORACLE = """
WITH e AS (
  SELECT vec_id % 8 AS grp, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), x AS (
  SELECT grp, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM e
), m AS (
  SELECT grp, pos, round(avg(val), 6) AS mv, count(*) AS n FROM x GROUP BY 1, 2
)
SELECT grp, list(mv ORDER BY pos) AS centroid, CAST(max(n) AS BIGINT) AS n
FROM m GROUP BY grp ORDER BY grp
"""


@q("similarity_mean_embedding", _MEAN_EMB_ORACLE)
def q_similarity_mean_embedding(spark, sf_dir):
    """Grouped mean-pooled embedding centroids (8 hash-derived clusters):
    posexplode + partial-agg — the shuffle is clusters × dim, not corpus."""
    t = _t(spark, sf_dir)
    emb = t["embeddings"].withColumn("grp", F.col("vec_id") % 8)
    out = similarity.mean_embedding(emb, "grp", "embedding")
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(out, [SortKey("grp")])


_QUANT_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS amax
  FROM e
), q AS (
  SELECT vec_id,
         CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END AS qscale, v
  FROM s
)
SELECT vec_id, qscale,
       list_transform(v, x -> CAST(round(x / qscale) AS INT)) AS qvec
FROM q ORDER BY vec_id
"""


@q("similarity_quantize_int8", _QUANT_ORACLE)
def q_similarity_quantize_int8(spark, sf_dir):
    """Symmetric int8 scalar quantization of the embedding table (4× shuffle
    and storage compression): per-vector scale + code array, zero-shuffle."""
    t = _t(spark, sf_dir)
    out = similarity.quantize_embedding_int8(t["embeddings"], "embedding")
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    out = out.select(
        "vec_id", "qscale", F.col("qvec").cast("array<int>").alias("qvec")
    )
    return sort_ops.sort(out, [SortKey("vec_id")])


_CLEAN_ORACLE = r"""
WITH inj AS (
  SELECT doc_id,
         text || '  MIXED Case' || chr(9) || 'With' || chr(1) || 'ctrl' AS raw
  FROM documents
)
SELECT doc_id,
       lower(trim(regexp_replace(
         regexp_replace(raw, '[\x00-\x08\x0B-\x1F\x7F-\x9F]', '', 'g'),
         '\s+', ' ', 'g'))) AS cleaned
FROM inj ORDER BY doc_id
"""


@q("text_clean_normalize", _CLEAN_ORACLE)
def q_text_clean_normalize(spark, sf_dir):
    """Corpus-ingest text cleaning (control-char strip, whitespace collapse,
    casefold) over text with injected tabs/control bytes — zero-shuffle."""
    t = _t(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("  MIXED Case\tWith" + chr(1) + "ctrl"),
        ).alias("raw"),
    )
    out = docs.select("doc_id", textstats.clean_text("raw").alias("cleaned"))
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(out, [SortKey("doc_id")])


_BIGRAM_LM_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i + 1])) AS bg
  FROM toks WHERE len(t) >= 2
), doc_tf AS (
  SELECT doc_id, bg, count(*) AS tf FROM bg GROUP BY 1, 2
), corpus_bg AS (
  SELECT bg, CAST(sum(tf) AS BIGINT) AS cb FROM doc_tf GROUP BY 1
), uni AS (
  SELECT unnest(t) AS w FROM toks
), c1 AS (
  SELECT w AS w1, count(*) AS c1 FROM uni GROUP BY 1
), consts AS (
  SELECT count(*) AS v FROM c1
)
SELECT doc_id,
       round(sum(tf * ln((cb + 1.0) / CAST(c1 + v AS DOUBLE)))
               / CAST(sum(tf) AS DOUBLE), 6) AS avg_bigram_logprob,
       CAST(sum(tf) AS BIGINT) AS n_bigrams
FROM doc_tf
JOIN corpus_bg USING (bg)
JOIN c1 ON split_part(bg, ' ', 1) = c1.w1
CROSS JOIN consts
GROUP BY doc_id ORDER BY doc_id
"""


@q("text_bigram_logprob", _BIGRAM_LM_ORACLE)
def q_text_bigram_logprob(spark, sf_dir):
    """Corpus-trained bigram LM fluency score: per-doc mean conditional
    log-probability p(w2|w1), add-one smoothed — catches word salad a
    unigram screen passes.  Scale shape: bigrams built array-side (no
    positional self-join); one shuffle on (doc, bigram); LM tables are
    rollups of the same stream joined back by key."""
    t = _t(spark, sf_dir)
    out = textstats.bigram_logprob(t["documents"], "doc_id", "text")
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(out, [SortKey("doc_id")])


_CAP_ORACLE = """
SELECT doc_id, source, cap_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('ss-cap' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS cap_rank
  FROM documents
) WHERE cap_rank <= 10
ORDER BY source, doc_id
"""


@q("sample_cap_per_key", _CAP_ORACLE)
def q_sample_cap_per_key(spark, sf_dir):
    """Per-key quota / domain balancing: keep at most 10 docs per source,
    chosen uniformly by a portable identity hash (md5) so the survivor
    set is reproducible across engines and cluster sizes.  Scale shape:
    one exchange on the key + per-key top-n; no global sort."""
    from supersonic_spark.pipeline import sampling

    t = _t(spark, sf_dir)
    out = sampling.cap_per_key(
        t["documents"], "source", "doc_id", 10, keep_rank=True
    )
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey

    return sort_ops.sort(
        out.select("doc_id", "source", "cap_rank"),
        [SortKey("source"), SortKey("doc_id")],
    )


_WRES_ORACLE = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         -ln((('0x' || substr(md5('ss-wres' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
              + 0.5) / 4294967296.0) / CAST(n_chars AS DOUBLE) AS key
  FROM documents WHERE n_chars > 0
  ORDER BY key, doc_id LIMIT 40)
ORDER BY doc_id
"""


@q("sample_weighted_reservoir", _WRES_ORACLE)
def q_sample_weighted_reservoir(spark, sf_dir):
    """Weighted fixed-size sample (Efraimidis–Spirakis A-Res, weight =
    n_chars): u drawn from a PORTABLE hash (first 8 hex digits of md5 —
    identical in every engine), key = -ln(u)/weight, keep the 40 smallest.
    The selected SET itself replays in the oracle — no error-bound
    booleans.  Plan: TakeOrderedAndProject (per-partition top-k + k-row
    merge), zero shuffle of the corpus, nothing driver-side."""
    from supersonic_spark.operators import sort as sort_ops
    from supersonic_spark.operators.sort import SortKey
    from supersonic_spark.pipeline import sampling

    t = _t(spark, sf_dir)
    out = sampling.weighted_reservoir_sample(
        t["documents"], 40, "doc_id", "n_chars"
    )
    return sort_ops.sort(
        out.select("doc_id", "source", "n_chars"), [SortKey("doc_id")]
    )


_TOKBUDGET_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens,
         n_chars
  FROM documents
), o AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (
           ORDER BY CAST(n_chars AS DOUBLE) / n_tokens DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM t
)
SELECT doc_id, n_tokens, cum_tokens::BIGINT AS cum_tokens FROM o
WHERE cum_tokens <= 20000 ORDER BY doc_id
"""


@q("sample_token_budget", _TOKBUDGET_ORACLE)
def q_sample_token_budget(spark, sf_dir):
    """Cut a training mix to a token budget: order documents by a quality
    proxy (mean word length, descending — a pure-IEEE division, so the
    order is engine-portable) and keep the maximal prefix whose running
    token total stays ≤ 20000.  The cumulative sum is integer-exact, so
    the selection and the emitted cum_tokens replay bit-for-bit in the
    oracle.  Scale shape: distributed prefix sum (range partition +
    per-partition subtotals + offset stamp), never a single-task global
    window; partitions past the budget are dropped wholesale."""
    from supersonic_spark.pipeline import sampling

    t = _t(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
        "n_chars",
    ).withColumn("__q", F.col("n_chars").cast("double") / F.col("n_tokens"))
    out = sampling.token_budget_sample(
        docs, "n_tokens", 20000, [F.col("__q").desc(), F.col("doc_id")]
    )
    # Single-partition sort, NOT a global orderBy: the kept prefix is
    # budget-bounded (≤ 20000 rows even if every document were one
    # token), and orderBy's range sampler would EXECUTE the Arrow stamp
    # pass a second time just to pick boundaries (profiled round 9: two
    # identical 32-task Python stages per run, ~350 ms).  One explicit
    # exchange pins the stamp to a single evaluation; a sorted single
    # partition is the same total order the orderBy produced.
    return (
        out.select("doc_id", "n_tokens", "cum_tokens")
        .repartition(1)
        .sortWithinPartitions("doc_id")
    )


_LINE_DEDUP_ORACLE = """
WITH m AS (
  SELECT doc_id,
         text || chr(10) || 'subscribe to our newsletter for updates'
              || chr(10) || 'footer of document ' || CAST(doc_id AS VARCHAR)
         AS text
  FROM documents
), l AS (
  SELECT doc_id, u.pos AS pos, u.line AS line FROM (
    SELECT doc_id,
           unnest([{'pos': i + 1, 'line': ls[i + 1]}
                   for i in range(0, len(ls))]) AS u
    FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM m)
  )
), d AS (
  SELECT trim(line) AS k, COUNT(DISTINCT doc_id) AS df FROM l GROUP BY 1
), b AS (
  SELECT k FROM d WHERE df > 0.5 * (SELECT COUNT(*) FROM m)
), f AS (
  SELECT l.doc_id, l.pos, l.line, (b.k IS NOT NULL) AS boiler
  FROM l LEFT JOIN b ON trim(l.line) = b.k
)
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN NOT boiler THEN line END,
                           chr(10) ORDER BY pos), '') AS text,
       COUNT(*)::BIGINT AS n_lines,
       COUNT(*) FILTER (WHERE boiler)::BIGINT AS n_dropped
FROM f GROUP BY doc_id
"""


@q("line_dedup_boilerplate", _LINE_DEDUP_ORACLE)
def q_line_dedup_boilerplate(spark, sf_dir):
    """Cross-document line-level boilerplate removal (CCNet/RefinedWeb
    style): lines whose document frequency exceeds 50% of the corpus are
    dropped from every document, texts reassembled in order.  The corpus
    is built deterministically from `documents` — each doc gains a shared
    banner line (df = 100% ⇒ dropped) and a per-doc unique footer (kept)
    — so the full (doc_id, text, n_lines, n_dropped) output hash-matches
    a pure-SQL replay.  Scale shape: doc frequency aggregates on the
    8-byte line hash; the boilerplate set broadcasts back (it is tiny by
    construction); one groupBy reassembles."""
    t = _t(spark, sf_dir)
    m = t["documents"].select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("subscribe to our newsletter for updates"),
            F.concat(F.lit("footer of document "), F.col("doc_id").cast("string")),
        ).alias("text"),
    )
    return dedup.line_dedup(m, "doc_id", "text", max_doc_frac=0.5)


_SEMDEDUP_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 500),
aug AS (
  SELECT * FROM e
  UNION ALL
  SELECT vec_id + 1000000, v FROM e WHERE vec_id < 20
), p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM aug a JOIN aug b ON a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        >= 0.95
)
SELECT (SELECT COUNT(*) FROM aug)::BIGINT AS n_vecs,
       (SELECT COUNT(*) FROM p)::BIGINT AS n_dup_pairs,
       (SELECT COUNT(DISTINCT id_b) FROM p)::BIGINT AS n_dropped,
       TRUE AS partition_ok, TRUE AS dropped_justified_ok,
       TRUE AS planted_dropped_ok
"""


_PARAGRAPH_DEDUP_ORACLE = """
WITH m AS (
  SELECT doc_id,
         text || chr(10) || chr(10)
              || 'legal disclaimer line one' || chr(10) || 'all rights reserved'
              || chr(10) || chr(10)
              || 'about the author of document ' || CAST(doc_id AS VARCHAR)
         AS text
  FROM documents
), l AS (
  SELECT doc_id, u.pos AS pos, u.para AS para FROM (
    SELECT doc_id,
           unnest([{'pos': i + 1, 'para': ps[i + 1]}
                   for i in range(0, len(ps))]) AS u
    FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps FROM m)
  )
), d AS (
  SELECT trim(para) AS k, COUNT(DISTINCT doc_id) AS df FROM l GROUP BY 1
), b AS (
  SELECT k FROM d WHERE df > 0.5 * (SELECT COUNT(*) FROM m)
), f AS (
  SELECT l.doc_id, l.pos, l.para, (b.k IS NOT NULL) AS boiler
  FROM l LEFT JOIN b ON trim(l.para) = b.k
)
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN NOT boiler THEN para END,
                           chr(10) || chr(10) ORDER BY pos), '') AS text,
       COUNT(*)::BIGINT AS n_lines,
       COUNT(*) FILTER (WHERE boiler)::BIGINT AS n_dropped
FROM f GROUP BY doc_id
"""


@q("paragraph_dedup_boilerplate", _PARAGRAPH_DEDUP_ORACLE)
def q_paragraph_dedup_boilerplate(spark, sf_dir):
    """Paragraph-level boilerplate removal: the dedup unit is a
    blank-line-separated paragraph, so a MULTI-LINE disclaimer block
    (which line-level dedup would only remove line by line) drops as one
    unit when its document frequency exceeds 50%.  Each doc gains the
    shared two-line disclaimer paragraph (dropped) and a unique
    about-the-author paragraph (kept); full output hash-matches the SQL
    replay."""
    t = _t(spark, sf_dir)
    m = t["documents"].select(
        "doc_id",
        F.concat_ws(
            "\n\n",
            F.col("text"),
            F.lit("legal disclaimer line one\nall rights reserved"),
            F.concat(
                F.lit("about the author of document "), F.col("doc_id").cast("string")
            ),
        ).alias("text"),
    )
    return dedup.paragraph_dedup(m, "doc_id", "text", max_doc_frac=0.5)


@q("dedup_semantic_semdedup", _SEMDEDUP_ORACLE)
def q_dedup_semantic_semdedup(spark, sf_dir):
    """SemDeDup: spherical-k-means cluster, then drop every vector with a
    lower-id same-cell neighbor at cosine >= 0.95.  20 planted exact
    copies (id + 1e6) are the only pairs above 0.95 in this corpus (the
    natural max pairwise cosine is ~0.51), and an exact copy always lands
    in its original's cell (identical vector => identical argmax), so
    n_dropped equals the DuckDB-computed count of ids having a lower-id
    exact-cosine duplicate — the k-means dependence cancels out.
    Booleans re-verify independently: kept+dropped partitions the corpus,
    every dropped id has a justifying lower-id same-cell neighbor, and
    every planted copy was dropped."""
    t = _t(spark, sf_dir)
    emb = core.filter_op(t["embeddings"], F.col("vec_id") < 500).select(
        "vec_id", "embedding"
    )
    planted = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), F.col("embedding")
    )
    aug = emb.unionByName(planted)
    res = dedup.semdedup(aug, "vec_id", "embedding", n_cells=8, threshold=0.95)
    # independent exact ground truth in the same plan
    exact = dedup.embedding_cosine_pairs(aug, "vec_id", "embedding", threshold=0.95)
    n_vecs = aug.agg(F.count(F.lit(1)).alias("n_vecs"))
    n_pairs = exact.agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    n_dropped = res.agg(
        F.coalesce(F.sum(F.col("dropped").cast("int")), F.lit(0))
        .cast("long").alias("n_dropped"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    # every dropped id must have a lower-id SAME-CELL neighbor >= 0.95
    cells = res.select(F.col("vec_id").alias("id_b"), F.col("cell").alias("cell_b"))
    cells_a = res.select(F.col("vec_id").alias("id_a"), F.col("cell").alias("cell_a"))
    justified = (
        exact.join(cells, "id_b").join(cells_a, "id_a")
        .filter(F.col("cell_a") == F.col("cell_b"))
        .select("id_b").distinct()
    )
    unjust = (
        res.filter(F.col("dropped"))
        .join(justified.withColumn("__j", F.lit(1)),
              res["vec_id"] == justified["id_b"], "left")
        .agg(F.coalesce(F.sum(F.col("__j").isNull().cast("int")), F.lit(0))
             .alias("n_unjustified"))
    )
    planted_missed = res.filter(
        (F.col("vec_id") >= 1000000) & (~F.col("dropped"))
    ).agg(F.count(F.lit(1)).alias("n_planted_missed"))
    return (
        n_vecs.crossJoin(n_pairs).crossJoin(n_dropped)
        .crossJoin(unjust).crossJoin(planted_missed)
        .select(
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.col("n_dup_pairs").cast("long").alias("n_dup_pairs"),
            F.col("n_dropped"),
            (F.col("n_rows") == F.col("n_vecs")).alias("partition_ok"),
            (F.col("n_unjustified") == 0).alias("dropped_justified_ok"),
            (F.col("n_planted_missed") == 0).alias("planted_dropped_ok"),
        )
    )


@q(
    "streaming_ann_ivfpq_probe",
    """SELECT q.vec_id AS query_id,
              (SELECT c.vec_id FROM embeddings c WHERE c.vec_id <> q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id LIMIT 1)::BIGINT AS best_other,
              (SELECT COUNT(*) FROM embeddings)::BIGINT AS n_corpus,
              TRUE AS ann_signal_ok, TRUE AS stream_matches_batch_ok
       FROM embeddings q WHERE q.vec_id < 10 ORDER BY 1""",
)
def q_streaming_ann_ivfpq_probe(spark, sf_dir):
    """STREAMING IVF-PQ: query vectors arrive as a multi-batch file
    stream (maxFilesPerTrigger=1 over 2 files) and probe the PERSISTED
    cell-partitioned code index per micro-batch — the billion-scale
    online-retrieval front door (float corpus vectors never touched;
    per-trigger cost is LUT build + m-lookup fold over probed cells).
    Oracle: exact best-other pinned via DuckDB cosine, corpus count
    pinned, ANN shortlist bounded by the overlap-or-self floor, PLUS an
    in-plan boolean that the DRAINED STREAM's (query, corpus, score,
    rank) set EXACTLY equals the batch ivfpq_index_probe of the same
    index — streaming changes arrival, not math."""
    import os
    import shutil
    import tempfile

    from supersonic_spark.streaming.ops import stream_ann_ivfpq_probe

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("corpus_vec")
    )
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"ss_stream_ivfpq{tag}")
    similarity.ivfpq_index_build(
        corpus, "corpus_id", "corpus_vec", path, n_cells=16, m=8, ksub=16
    )

    src = os.path.join(tempfile.gettempdir(), f"ss_stream_pq_queries{tag}")
    shutil.rmtree(src, ignore_errors=True)
    queries.selectExpr("query_id as qid", "query_vec as qv").coalesce(
        2
    ).write.mode("overwrite").parquet(src)
    sink = os.path.join(tempfile.gettempdir(), f"ss_stream_pq_ann{tag}")
    shutil.rmtree(sink, ignore_errors=True)

    stream = (
        spark.readStream.schema("qid long, qv array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    ann = stream_ann_ivfpq_probe(stream, path, sink, "qid", "qv", k=5, nprobe=4)

    batch = similarity.ivfpq_index_probe(
        spark, path, queries, "query_id", "query_vec", k=5, nprobe=4
    )
    diff = (
        ann.select("query_id", "corpus_id", "rank", F.col("score").alias("s_s"))
        .join(
            batch.select(
                "query_id", "corpus_id", F.col("rank").alias("r_b"),
                F.col("score").alias("s_b"),
            ),
            ["query_id", "corpus_id"],
            "full",
        )
    )
    n_mismatch = diff.agg(
        F.coalesce(
            F.sum(
                (
                    F.col("s_s").isNull()
                    | F.col("s_b").isNull()
                    | (F.abs(F.col("s_s") - F.col("s_b")) > 1e-9)
                    | (F.col("rank") != F.col("r_b"))
                ).cast("int")
            ),
            F.lit(0),
        ).alias("n_mismatch")
    )
    exact = similarity.cosine_topk(queries, corpus, k=6)
    best_other = (
        exact.filter(F.col("query_id") != F.col("corpus_id"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("similarity").desc(), F.col("corpus_id")
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("query_id", F.col("corpus_id").cast("long").alias("best_other"))
    )
    exact5 = exact.filter(F.col("rank") <= 5).select(
        "query_id", F.col("corpus_id").alias("__eid")
    )
    overlap = (
        ann.join(
            exact5,
            (ann["query_id"] == exact5["query_id"])
            & (ann["corpus_id"] == exact5["__eid"]),
        )
        .groupBy(ann["query_id"].alias("qid"))
        .agg(F.count(F.lit(1)).alias("__n_overlap"))
    )
    self_hit = ann.groupBy("query_id").agg(
        F.max((F.col("query_id") == F.col("corpus_id")).cast("int")).alias("__self")
    )
    n_corpus = corpus.agg(F.count(F.lit(1)).alias("n_corpus"))
    return (
        best_other.join(overlap, best_other["query_id"] == overlap["qid"], "left")
        .join(self_hit, "query_id", "left")
        .crossJoin(n_corpus)
        .crossJoin(n_mismatch)
        .select(
            "query_id",
            "best_other",
            F.col("n_corpus").cast("long").alias("n_corpus"),
            (
                (F.coalesce(F.col("__n_overlap"), F.lit(0)) >= 1)
                | (F.coalesce(F.col("__self"), F.lit(0)) == 1)
            ).alias("ann_signal_ok"),
            (F.col("n_mismatch") == 0).alias("stream_matches_batch_ok"),
        )
        .orderBy("query_id")
    )


@q(
    "similarity_ivf_index_append_probe",
    # exact top-5 over the FULL corpus: the appended half must be fully
    # probe-visible, so with nprobe = n_cells the post-append index must
    # return the identical rows a from-scratch exact rank would
    """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings WHERE vec_id >= 10),
     s AS (SELECT query_id, corpus_id,
                  list_dot_product(qv, cv)
                    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                    AS similarity
           FROM q CROSS JOIN c),
     r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY similarity DESC, corpus_id) AS rnk
           FROM s)
SELECT query_id, corpus_id, round(similarity, 6) AS similarity, CAST(rnk AS INT) AS rank
FROM r WHERE rnk <= 5
""",
)
def q_similarity_ivf_index_append_probe(spark, sf_dir):
    """INCREMENTAL ANN ingest: build the persisted IVF index from HALF
    the corpus (even vec_id), ivf_index_append the other half (odd) —
    assignments from the sidecar centroids, new parquet files inside the
    existing cell= partitions, existing lists untouched and the old
    corpus never rescanned — then probe with nprobe = n_cells.  The
    appended rows must be fully probe-visible: the oracle hash-checks
    EXACT top-5 cosine over the COMPLETE corpus."""
    import os
    import shutil
    import tempfile

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    base = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") % 2 == 0)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    extra = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") % 2 == 1)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"ss_ivf_append{tag}")
    shutil.rmtree(path, ignore_errors=True)
    similarity.ivf_index_build(base, "cid", "cv", path, n_cells=8, train=True)
    similarity.ivf_index_append(extra, "cid", "cv", path)
    out = similarity.ivf_index_probe(spark, path, qs, "qid", "qv", k=5, nprobe=8)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return out.withColumn("rank", F.row_number().over(w)).select(
        "query_id",
        "corpus_id",
        F.round(F.col("cos"), 6).alias("similarity"),
        "rank",
    )


@q(
    "streaming_ivf_index_append",
    # exact top-5 over the FULL corpus, as in the batch append query: the
    # streamed-in half must be fully probe-visible after the drain
    """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings WHERE vec_id >= 10),
     s AS (SELECT query_id, corpus_id,
                  list_dot_product(qv, cv)
                    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                    AS similarity
           FROM q CROSS JOIN c),
     r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY similarity DESC, corpus_id) AS rnk
           FROM s)
SELECT query_id, corpus_id, round(similarity, 6) AS similarity, CAST(rnk AS INT) AS rank
FROM r WHERE rnk <= 5
""",
)
def q_streaming_ivf_index_append(spark, sf_dir):
    """CONTINUOUS index maintenance: half the corpus (odd vec_id)
    arrives as a multi-batch vector STREAM (maxFilesPerTrigger=1 over 2
    files) and appends to the persisted IVF index per micro-batch —
    existing inverted lists never read or rewritten, per-trigger cost
    O(arrivals).  After the drain, a probe with nprobe = n_cells must
    hash-match EXACT top-5 cosine over the COMPLETE corpus — the
    stream-ingested vectors are indistinguishable from built-in ones."""
    import os
    import shutil
    import tempfile

    from supersonic_spark.streaming.ops import stream_ivf_index_append

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    base = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") % 2 == 0)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"ss_stream_ivf_append{tag}")
    shutil.rmtree(path, ignore_errors=True)
    similarity.ivf_index_build(base, "cid", "cv", path, n_cells=8, train=True)

    src = os.path.join(tempfile.gettempdir(), f"ss_stream_append_src{tag}")
    shutil.rmtree(src, ignore_errors=True)
    emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") % 2 == 1)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    ).coalesce(2).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("cid long, cv array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    stream_ivf_index_append(stream, path, "cid", "cv")

    out = similarity.ivf_index_probe(spark, path, qs, "qid", "qv", k=5, nprobe=8)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return out.withColumn("rank", F.row_number().over(w)).select(
        "query_id",
        "corpus_id",
        F.round(F.col("cos"), 6).alias("similarity"),
        "rank",
    )


@q(
    "similarity_ivfpq_index_append_probe",
    """SELECT q.vec_id AS query_id,
              (SELECT c.vec_id FROM embeddings c WHERE c.vec_id <> q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id LIMIT 1)::BIGINT AS best_other,
              (SELECT COUNT(*) FROM embeddings)::BIGINT AS n_corpus,
              TRUE AS ann_signal_ok, TRUE AS append_matches_memory_ok
       FROM embeddings q WHERE q.vec_id < 10 ORDER BY 1""",
)
def q_similarity_ivfpq_index_append_probe(spark, sf_dir):
    """INCREMENTAL IVF-PQ ingest: build the persisted code index from
    half the corpus (even vec_id, codebooks trained on that half),
    ivfpq_index_append the odd half — encoded with the SIDECAR
    centroids/codebooks, new files in existing cell= partitions, nothing
    rewritten — then probe.  In-plan boolean: the post-append probe's
    (query, corpus, score) set EXACTLY equals in-memory ivfpq_topk over
    the FULL corpus with the same trained index; plus the
    best-other/signal-floor oracle as the other IVF-PQ queries."""
    import os
    import shutil
    import tempfile

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("corpus_vec")
    )
    base = corpus.filter(F.col("corpus_id") % 2 == 0)
    extra = corpus.filter(F.col("corpus_id") % 2 == 1)
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"ss_ivfpq_append{tag}")
    shutil.rmtree(path, ignore_errors=True)
    index = similarity.ivfpq_index_build(
        base, "corpus_id", "corpus_vec", path, n_cells=16, m=8, ksub=16
    )
    similarity.ivfpq_index_append(extra, "corpus_id", "corpus_vec", path)
    return _ivfpq_append_verdict(spark, path, queries, corpus, index)


def _ivfpq_append_verdict(spark, path, queries, corpus, index):
    """Shared verdict for the IVF-PQ append queries (batch + streaming):
    probe the appended index, assert score-set equality with in-memory
    ivfpq_topk over the FULL corpus under the same trained model, and
    attach the best-other/signal-floor oracle columns."""
    ann = similarity.ivfpq_index_probe(
        spark, path, queries, "query_id", "query_vec", k=5, nprobe=4
    )
    mem = similarity.ivfpq_topk(
        queries, corpus, "query_id", "query_vec", "corpus_id", "corpus_vec",
        k=5, n_cells=16, nprobe=4, m=8, ksub=16, index=index,
    )
    diff = ann.select("query_id", "corpus_id", "score").withColumnRenamed(
        "score", "s_p"
    ).join(
        mem.select("query_id", "corpus_id", F.col("score").alias("s_m")),
        ["query_id", "corpus_id"],
        "full",
    )
    n_mismatch = diff.agg(
        F.coalesce(
            F.sum(
                (
                    F.col("s_p").isNull()
                    | F.col("s_m").isNull()
                    | (F.abs(F.col("s_p") - F.col("s_m")) > 1e-9)
                ).cast("int")
            ),
            F.lit(0),
        ).alias("n_mismatch")
    )
    exact = similarity.cosine_topk(queries, corpus, k=6)
    best_other = (
        exact.filter(F.col("query_id") != F.col("corpus_id"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("similarity").desc(), F.col("corpus_id")
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("query_id", F.col("corpus_id").cast("long").alias("best_other"))
    )
    exact5 = exact.filter(F.col("rank") <= 5).select(
        "query_id", F.col("corpus_id").alias("__eid")
    )
    overlap = (
        ann.join(
            exact5,
            (ann["query_id"] == exact5["query_id"])
            & (ann["corpus_id"] == exact5["__eid"]),
        )
        .groupBy(ann["query_id"].alias("qid"))
        .agg(F.count(F.lit(1)).alias("__n_overlap"))
    )
    self_hit = ann.groupBy("query_id").agg(
        F.max((F.col("query_id") == F.col("corpus_id")).cast("int")).alias("__self")
    )
    n_corpus = corpus.agg(F.count(F.lit(1)).alias("n_corpus"))
    return (
        best_other.join(overlap, best_other["query_id"] == overlap["qid"], "left")
        .join(self_hit, "query_id", "left")
        .crossJoin(n_corpus)
        .crossJoin(n_mismatch)
        .select(
            "query_id",
            "best_other",
            F.col("n_corpus").cast("long").alias("n_corpus"),
            (
                (F.coalesce(F.col("__n_overlap"), F.lit(0)) >= 1)
                | (F.coalesce(F.col("__self"), F.lit(0)) == 1)
            ).alias("ann_signal_ok"),
            (F.col("n_mismatch") == 0).alias("append_matches_memory_ok"),
        )
        .orderBy("query_id")
    )


@q(
    "streaming_ivfpq_index_append",
    # same oracle shape as similarity_ivfpq_index_append_probe: the
    # stream-appended code index must be indistinguishable from the
    # in-memory model over the full corpus
    """SELECT q.vec_id AS query_id,
              (SELECT c.vec_id FROM embeddings c WHERE c.vec_id <> q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id LIMIT 1)::BIGINT AS best_other,
              (SELECT COUNT(*) FROM embeddings)::BIGINT AS n_corpus,
              TRUE AS ann_signal_ok, TRUE AS append_matches_memory_ok
       FROM embeddings q WHERE q.vec_id < 10 ORDER BY 1""",
)
def q_streaming_ivfpq_index_append(spark, sf_dir):
    """CONTINUOUS PQ-index maintenance: the odd half of the corpus
    arrives as a multi-batch vector STREAM (maxFilesPerTrigger=1 over 2
    files) and appends (id, cell, codes) rows to the persisted IVF-PQ
    index per micro-batch through the exactly-once
    sweep/stage/publish-by-rename path — existing code rows never read
    or rewritten, per-trigger cost O(arrivals).  After the drain the
    probe's score set must EXACTLY equal in-memory ivfpq_topk over the
    full corpus under the same trained model (stream-ingested codes are
    indistinguishable from built-in ones), plus the best-other/
    signal-floor oracle."""
    import os
    import shutil
    import tempfile

    from supersonic_spark.streaming.ops import stream_ivfpq_index_append

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("corpus_vec")
    )
    base = corpus.filter(F.col("corpus_id") % 2 == 0)
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"ss_stream_ivfpq_append{tag}")
    shutil.rmtree(path, ignore_errors=True)
    index = similarity.ivfpq_index_build(
        base, "corpus_id", "corpus_vec", path, n_cells=16, m=8, ksub=16
    )

    src = os.path.join(tempfile.gettempdir(), f"ss_stream_ivfpq_append_src{tag}")
    shutil.rmtree(src, ignore_errors=True)
    corpus.filter(F.col("corpus_id") % 2 == 1).coalesce(2).write.mode(
        "overwrite"
    ).parquet(src)

    stream = (
        spark.readStream.schema("corpus_id long, corpus_vec array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    stream_ivfpq_index_append(stream, path, "corpus_id", "corpus_vec")
    return _ivfpq_append_verdict(spark, path, queries, corpus, index)


@q(
    "similarity_ivf_index_rebalance_probe",
    # after drifting ingest + rebalance-from-index, probing every cell of
    # the REBUILT index must still be exact top-5 over the full corpus
    """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings WHERE vec_id >= 10),
     s AS (SELECT query_id, corpus_id,
                  list_dot_product(qv, cv)
                    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                    AS similarity
           FROM q CROSS JOIN c),
     r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY similarity DESC, corpus_id) AS rnk
           FROM s)
SELECT query_id, corpus_id, round(similarity, 6) AS similarity, CAST(rnk AS INT) AS rank
FROM r WHERE rnk <= 5
""",
)
def q_similarity_ivf_index_rebalance_probe(spark, sf_dir):
    """OFFLINE REBALANCE after drifting ingest: build the IVF index from
    half the corpus, append the other half (assignments against the
    stale centroids — the drift scenario), then ivf_index_rebalance —
    retrain + reassign from the index's OWN stored vectors, original
    corpus untouched, fresh index written build-then-swap to a new path.
    Probing the rebuilt index with nprobe = n_cells must hash-match
    EXACT top-5 cosine over the complete corpus: rebalance changes
    layout quality, never membership or math."""
    import os
    import shutil
    import tempfile

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    base = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") % 2 == 0)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    extra = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") % 2 == 1)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"ss_ivf_drift{tag}")
    out_path = os.path.join(tempfile.gettempdir(), f"ss_ivf_rebal{tag}")
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(out_path, ignore_errors=True)
    similarity.ivf_index_build(base, "cid", "cv", path, n_cells=8, train=True)
    similarity.ivf_index_append(extra, "cid", "cv", path)
    similarity.ivf_index_rebalance(spark, path, out_path)
    out = similarity.ivf_index_probe(spark, out_path, qs, "qid", "qv", k=5, nprobe=8)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return out.withColumn("rank", F.row_number().over(w)).select(
        "query_id",
        "corpus_id",
        F.round(F.col("cos"), 6).alias("similarity"),
        "rank",
    )


@q(
    "similarity_ivf_cell_profile",
    """SELECT (SELECT COUNT(*) FROM embeddings WHERE vec_id >= 10)::BIGINT
                AS total_rows,
              TRUE AS conservation_ok, TRUE AS shares_ok""",
)
def q_similarity_ivf_cell_profile(spark, sf_dir):
    """Index-health profile of a persisted IVF index (cell sizes/shares —
    the append-drift monitor that triggers ivf_index_rebalance).  Oracle
    invariants recomputed by DuckDB: the per-cell counts must CONSERVE
    the corpus (sum == corpus row count — nothing dropped or duplicated
    by build/partitioning), and the share algebra must hold (shares sum
    to 1, max_share is the max share, every share ≤ max)."""
    import os
    import shutil
    import tempfile

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    cs = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"ss_ivf_profile{tag}")
    shutil.rmtree(path, ignore_errors=True)
    similarity.ivf_index_build(cs, "cid", "cv", path, n_cells=8, train=True)
    prof = similarity.ivf_cell_profile(spark, path)
    n_corpus = cs.agg(F.count(F.lit(1)).alias("__n"))
    agg = prof.agg(
        F.sum("n").alias("__sum_n"),
        F.sum("share").alias("__sum_share"),
        F.max("share").alias("__max_share_obs"),
        F.first("max_share").alias("__max_share_col"),
        F.first("total_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("__n_cells_rows"),
        F.first("n_cells").alias("__n_cells_col"),
    )
    return agg.crossJoin(n_corpus).select(
        F.col("total_rows").cast("long").alias("total_rows"),
        (
            (F.col("__sum_n") == F.col("__n"))
            & (F.col("total_rows") == F.col("__n"))
        ).alias("conservation_ok"),
        (
            (F.abs(F.col("__sum_share") - 1.0) < 1e-4)
            & (F.abs(F.col("__max_share_obs") - F.col("__max_share_col")) < 1e-9)
            & (F.col("__n_cells_rows") == F.col("__n_cells_col"))
        ).alias("shares_ok"),
    )


@q(
    "similarity_ivf_index_compact_probe",
    # compaction changes LAYOUT only: probing every cell of the
    # compacted index is still exact top-5 over the full corpus, and the
    # lifecycle booleans (files shrank, rows conserved) must hold
    """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id AS corpus_id, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings WHERE vec_id >= 10),
     s AS (SELECT query_id, corpus_id,
                  list_dot_product(qv, cv)
                    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                    AS similarity
           FROM q CROSS JOIN c),
     r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY similarity DESC, corpus_id) AS rnk
           FROM s)
SELECT query_id, corpus_id, round(similarity, 6) AS similarity, CAST(rnk AS INT) AS rank,
       TRUE AS files_reduced_ok, TRUE AS rows_preserved_ok
FROM r WHERE rnk <= 5
""",
)
def q_similarity_ivf_index_compact_probe(spark, sf_dir):
    """INDEX LIFECYCLE: small-files compaction after continuous ingest.
    Build the IVF index from part of the corpus, land the rest through
    three exactly-once appends (one file per touched cell per append —
    the streaming accumulation pattern), then ann_index_compact each
    cell down to one file.  Probing the compacted index with nprobe =
    n_cells must hash-match EXACT top-5 cosine over the complete corpus
    (compaction changes layout, never membership or math), and the
    in-plan lifecycle booleans pin files_after < files_before plus row
    conservation across the rewrite."""
    import json
    import os
    import shutil
    import tempfile

    t = _t(spark, sf_dir)
    emb = t["embeddings"]
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    tag = sf_dir.rstrip("/").replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"ss_ivf_compact{tag}")
    shutil.rmtree(path, ignore_errors=True)
    similarity.ivf_index_build(
        corpus.filter(F.col("cid") % 4 == 0), "cid", "cv", path, n_cells=8, train=True
    )
    for r in (1, 2, 3):
        similarity.ivf_index_append_atomic(
            corpus.filter(F.col("cid") % 4 == r), "cid", "cv", path, tag=f"batch{r}"
        )
    similarity._fs_write_text(
        spark, os.path.join(path, "_ivf_appended_batches.json"), json.dumps([1, 2, 3])
    )
    rows_before = spark.read.parquet(path).count()
    stats = similarity.ann_index_compact(spark, path, target_files_per_cell=1)
    rows_after = spark.read.parquet(path).count()

    out = similarity.ivf_index_probe(spark, path, qs, "qid", "qv", k=5, nprobe=8)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("corpus_id")
    )
    return out.withColumn("rank", F.row_number().over(w)).select(
        "query_id",
        "corpus_id",
        F.round(F.col("cos"), 6).alias("similarity"),
        "rank",
        F.lit(
            stats["cells_compacted"] >= 1
            and stats["files_after"] < stats["files_before"]
        ).alias("files_reduced_ok"),
        F.lit(rows_after == rows_before).alias("rows_preserved_ok"),
    )
