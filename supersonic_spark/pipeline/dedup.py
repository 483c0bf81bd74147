"""Deduplication operators for web-scale corpora.

Scale design notes (the 100 TB story):
- exact dedup is one hash-shuffle on a 64-bit digest (never on raw text);
- MinHash/LSH candidate generation explodes to (doc, band) pairs — the
  shuffle key is the band bucket, so skew is bounded by band width, and the
  pair join happens only inside buckets;
- verification (exact Jaccard) runs only on candidate pairs, which is the
  whole point of LSH — the quadratic step never touches the full corpus;
- everything below is pure Spark SQL higher-order functions (JVM codegen,
  Arrow-free): transform/filter/aggregate over arrays + xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _band_rows(num_hashes: int, bands: int) -> int:
    """Rows-per-band for LSH banding, validated: bands > num_hashes would
    hash EMPTY signature slices (every document collides in every bucket —
    the probe join degenerates quadratically), and a non-divisible split
    would silently ignore the trailing hashes."""
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"bands must satisfy 1 <= bands <= num_hashes and "
            f"num_hashes % bands == 0; got num_hashes={num_hashes}, "
            f"bands={bands}"
        )
    return num_hashes // bands


# ---------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, cols: list[str], keep_order: str | None = None) -> DataFrame:
    """Keep one representative row per distinct (cols) combination.

    Uses min_by on a representative key (default: first column of the
    DataFrame) — a single hash aggregation, no window, no sort.
    """
    rep = keep_order or df.columns[0]
    others = [c for c in df.columns if c != rep and c not in cols]
    agg = [F.min(_c(rep)).alias(rep)]
    if others:
        agg.insert(0, F.min_by(F.struct(*others), _c(rep)).alias("__rest"))
    out = df.groupBy(*[_c(c) for c in cols]).agg(*agg)
    return out.select(*cols, rep, *[F.col(f"__rest.{c}").alias(c) for c in others])


def duplicate_groups(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Per distinct value of ``cols``: representative id (min) and group size.
    The digest-first variant groups on xxhash64(cols) to keep shuffle rows
    narrow when `cols` are wide text."""
    return df.groupBy(*[_c(c) for c in cols]).agg(
        F.min(_c(id_col)).alias("rep_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )


# ---------------------------------------------------------------- shingles

def shingles_from_words(words, n: int = 3) -> Column:
    """Distinct word n-grams from an ALREADY-MATERIALIZED array<string>
    column.  Pass a real column (see :func:`with_word_shingles`), not a
    split(...) expression: a HOF lambda capturing an expression re-evaluates
    it per element — O(words²) re-splitting per document, ~8× slower."""
    w = _c(words)
    k = F.size(w)
    # guard: sequence(0, k-n) would DESCEND for k<n ([0,-1,...]) — emit empty
    grams = F.when(
        k >= n,
        F.transform(
            F.sequence(F.lit(0), k - n),
            lambda i: F.array_join(F.slice(w, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def with_word_shingles(
    df: DataFrame, id_col: str, text_col, n: int = 3, out_col: str = "__sh"
) -> DataFrame:
    """(id, shingles) projection with the word array materialized in its own
    projection step before the gram HOF — the fast path used by every
    shingling operator here.

    The non-empty filter tests ``size(words) >= n`` (equivalent to
    ``size(shingles) > 0``) *below* the gram projection: a filter on the
    shingle column would be pushed under the projection by Catalyst and
    duplicate the whole gram HOF into the interpreted predicate path
    (measured ~9× slower)."""
    wdf = df.select(
        _c(id_col).alias("__id"), F.split(F.trim(_c(text_col)), r"\s+").alias("__words")
    )
    return wdf.filter(F.size("__words") >= n).select(
        "__id", shingles_from_words(F.col("__words"), n).alias(out_col)
    )


def word_shingles(text, n: int = 3) -> Column:
    """Distinct word n-grams of ``text`` as an array<string> (JVM-side:
    split + transform over an index sequence).  Column-expression form; for
    DataFrame pipelines prefer :func:`with_word_shingles`, which avoids the
    captured-expression re-evaluation pitfall."""
    words = F.split(F.trim(_c(text)), r"\s+")
    k = F.size(words)
    grams = F.when(
        k >= n,
        F.transform(
            F.sequence(F.lit(0), k - n),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def char_shingles(text, n: int = 5) -> Column:
    """Distinct character n-grams (classic MinHash shingling)."""
    t = _c(text)
    k = F.length(t)
    grams = F.when(
        k >= n,
        F.transform(F.sequence(F.lit(1), k - n + 1), lambda i: t.substr(i, F.lit(n))),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def with_char_shingles(
    df: DataFrame, id_col: str, text_col, n: int = 5, out_col: str = "__sh"
) -> DataFrame:
    """(id, char-shingles) projection; the text column is materialized in
    its own projection step before the substring HOF (same captured-
    expression pitfall as word shingles)."""
    tdf = df.select(_c(id_col).alias("__id"), _c(text_col).alias("__text"))
    # filter below the gram projection (see with_word_shingles): non-empty
    # char shingles ⟺ length(text) >= n
    return tdf.filter(F.length("__text") >= n).select(
        "__id", char_shingles(F.col("__text"), n).alias(out_col)
    )


# ---------------------------------------------------------------- minhash

_LONG_MAX = 9223372036854775807


def _band_structs(sig_col: Column, num_hashes: int, bands: int) -> Column:
    """array<struct<band:int, bucket:bigint>> banding expression: one
    struct per band, bucket = xxhash64 over that band's signature slice.

    Built as a single ``transform`` over ``sequence(0, bands-1)`` instead
    of a Python listcomp of ``bands`` struct columns: the values are
    identical (same slice bounds, same xxhash64), but the listcomp shape
    cost ~100 py4j round trips to construct and re-analyzed a
    ``bands``-wide projection on every DataFrame op — ~250 ms of DRIVER
    time per query build at bands=16 (profiled round 9), all inside the
    bench's timed region.  The HOF shape is ~10 calls and one small
    expression node (§5 of the optimization guide: the driver should do
    almost no work).  Runtime is the same or better (interleaved A/B at
    sf0.1: banding pipeline 496 → 416 ms min-of-4, identical output)."""
    rows = _band_rows(num_hashes, bands)
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.slice(sig_col, b * rows + 1, F.lit(rows))).alias("bucket"),
        ),
    )


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """array<long> MinHash signature: h_i = min over shingles of
    xxhash64(seed_i, xxhash64(shingle)).  Each shingle STRING is hashed
    exactly once; the ``num_hashes`` independent families are cheap
    long-input rehashes of that digest (the standard
    one-hash-then-k-mixes construction — min-wise independence comes from
    the outer family, and family quality is xxhash64's).

    Single-pass, shuffle-free: one ``transform`` hashes the strings, one
    ``aggregate`` folds a ``num_hashes``-wide elementwise min via
    zip_with against a literal seed array — a SMALL expression tree, so
    it compiles immediately.  A/B min-of-4 steady vs the previous shape
    (64 string-hashes per element inside a wide transform): sf0.1
    0.41 vs 0.40 s but max 0.69 vs 2.15 s; sf1 1.68 vs 2.03 s min and
    max 2.11 vs 15.36 s — the wide shape ran interpreted until C2
    warmed (same JIT cliff as the banding fan-out, fixed in the same
    round)."""
    seeds = F.array(*[F.lit(i) for i in range(num_hashes)])
    hashed = F.transform(shingles, lambda s: F.xxhash64(s))
    init = F.array_repeat(F.lit(_LONG_MAX).cast("long"), num_hashes)
    return F.aggregate(
        hashed,
        init,
        lambda acc, h: F.zip_with(
            acc, seeds, lambda a, sd: F.least(a, F.xxhash64(sd, h))
        ),
    )


#: auto-salt pre-flight thresholds: buckets at or below ``hot`` docs run
#: unsalted (k² ≤ ~16M comparisons fits one task comfortably); above, the
#: salt targets ``target`` docs per block side.
_AUTO_SALT_HOT = 4096
# Block side target: g = ceil(hot/512) gives a hot key g(g+1)/2 ≈
# (k/512)²/2 blocks, so block keys outnumber reducers and hash placement
# evens out (the r7 placement straggler: g=4 → only 160 block keys into
# 256 partitions → 3-4 stacked on one reducer).  Per-key salting (the
# "auto" path) replicates ONLY hot rows, so the finer target is
# affordable; _AUTO_SALT_MAX_G bounds replication of a mega-hot key at
# (64+1)/2 ≈ 32× of that key's rows.
_AUTO_SALT_TARGET = 512
_AUTO_SALT_MAX_G = 64


def auto_skew_salt(
    banded: DataFrame,
    keys: list[str],
    hot_bucket: int | None = None,
    target_block: int | None = None,
    max_g: int | None = None,
) -> int | None:
    """Skew DECISION PROBE for a bucketed self-join: the heavy-hitter probe
    of :func:`~supersonic_spark.operators.analytics.key_profile` specialized
    to "does any bucket exceed ``hot_bucket`` docs".  One partial-aggregated
    count on the bucket keys and a 1-row max — bounded driver traffic at
    any corpus size.  Returns the salt g (per-block side ≈ ``target_block``
    docs, capped at ``max_g``) the HOTTEST bucket would get, else None.

    Note: ``_bucket_self_pairs(skew_salt="auto")`` no longer routes through
    this global answer — it runs its own one-job pre-flight and salts
    PER KEY (only hot buckets replicate, each at its own g).  This function
    remains the explainability probe ("would the salt trigger, and at what
    g for the worst key?") used by tools/skew_sweep.py and callers sizing
    an explicit salt by hand."""
    import math

    hot_bucket = _AUTO_SALT_HOT if hot_bucket is None else hot_bucket
    target_block = _AUTO_SALT_TARGET if target_block is None else target_block
    max_g = _AUTO_SALT_MAX_G if max_g is None else max_g
    hot = (
        banded.groupBy(*[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .first()["mx"]
    ) or 0
    if hot <= hot_bucket:
        return None
    return min(max_g, math.ceil(hot / target_block))


def _bucket_self_pairs(
    banded: DataFrame,
    keys: list[str],
    carry: list[str],
    skew_salt: int | str | None = None,
    raw: bool = False,
) -> DataFrame:
    """Unordered candidate pairs (id_a < id_b) from a bucketed table via
    self-join on ``keys`` — the shared tail of every LSH banding scheme.

    ``carry`` columns ride along as ``<c>_a`` / ``<c>_b`` (aligned with the
    id ordering).

    ``skew_salt=g``: pair-block decomposition for hot buckets (the salting
    discipline of operators.aggregate.salted_join applied to a SELF-join).
    A bucket of k docs is one join key ⇒ one task does k² work.  With
    salting, each doc gets salt s = hash(id) mod g and block pair (p,q),
    p ≤ q, joins the salt-p docs against the salt-q docs: every unordered
    pair lands in exactly one of the g(g+1)/2 blocks, per-block work drops
    to (k/g)², and the hot key fans out across g² tasks.  Each side is
    replicated (g+1)/2× on average — the same replication-for-balance trade
    as salted_join's right-side explode.

    ``raw=True`` — for SYMMETRIC downstream scoring only (MinHash match
    count, Hamming, cosine): skips BOTH the cross-band ``dropDuplicates``
    and the id-order alignment of the carried columns (``<c>_a``/``<c>_b``
    then follow JOIN orientation, not id order; ``id_a < id_b`` still
    holds).  Callers de-duplicate cross-band copies with a CLAIM filter —
    each pair survives only on the row whose band is the FIRST band where
    the two sides collide, recomputable from the carried payloads (see
    :func:`_claim_filter`) — so the score runs once per pair and no
    ``dropDuplicates`` shuffle exists at all.  Why not dedup first: that
    would shuffle the payload columns (a 64-long MinHash signature is
    ~0.5 KB PER SIDE) through the dedup exchange — measured at the sf10
    Zipf corpus as ~60 GB of scratch and the #1 cost of the whole
    operator (round 7); claim-then-score eliminates both that exchange
    and the round-7 residual cost of re-scoring each cross-band copy.

    ``skew_salt="auto"``: run the :func:`auto_skew_salt` pre-flight and
    salt only when a bucket is actually hot.  The probe is one extra
    partial-aggregated scan of the banded plan (tiny shuffle: one count
    per bucket key), deliberately NOT a persist: caching the exploded
    rows×bands table for the probe would either be released before the
    pairs join materializes (pure overhead) or leak into executor
    memory/disk for the session lifetime — and at 100 TB a
    MEMORY_AND_DISK materialization of corpus×bands rows costs more
    than the recomputing scan it saves.
    """
    from functools import reduce as _reduce

    def keycond(l, r):
        return _reduce(
            lambda x, y: x & y, [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys]
        )

    gexpr = None
    P = None
    if skew_salt == "auto":
        # PER-KEY pre-flight (one job): per-bucket counts give (a) the
        # salt decision, (b) the hot-key list, (c) the banded row count
        # for sizing the explicit partitioning.  Only HOT buckets
        # replicate — the round-7 global-g salt replicated the ENTIRE
        # banded table (g+1)/2× into both join sorts (at sf10 Zipf that
        # was the difference between a 20M-row shuffle and an 8M-row one,
        # and with signature payloads it twice exhausted this host's
        # scratch disk), while cold buckets never needed blocks at all.
        keyc = [F.col(k) for k in keys]
        stat = (
            banded.groupBy(*keyc)
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.sum("__n").alias("total"),
                F.collect_list(
                    F.when(
                        F.col("__n") > _AUTO_SALT_HOT,
                        F.struct(*keyc, F.col("__n")),
                    )
                ).alias("hot"),
            )
            .first()
        )
        total = stat["total"] or 0
        hot_rows = stat["hot"] or []
        if not hot_rows:
            skew_salt = None
        else:
            spark = banded.sparkSession
            hot_df = spark.createDataFrame(
                [tuple(r) for r in hot_rows], list(keys) + ["__n"]
            )
            banded = banded.join(F.broadcast(hot_df), list(keys), "left")
            # per-key salt: block side ≈ _AUTO_SALT_TARGET docs.  The
            # smaller target (vs round 7's global 2048) is the PLACEMENT
            # fix: a hot key now fans into g(g+1)/2 blocks with
            # g = ceil(k/512), so block keys outnumber reducers by an
            # order of magnitude and the birthday-collision straggler
            # (r7: 160 keys into 256 bins → 3-4 hot blocks on one
            # reducer, 116.9 s max task vs 1.7 s median) averages out —
            # max load ≈ mean when blocks ≫ partitions.  Replication
            # cost (g+1)/2 applies only to the hot rows, so a larger g
            # is affordable where it matters.
            banded = banded.withColumn(
                "__g",
                F.when(F.col("__n").isNull(), F.lit(1))
                .otherwise(
                    F.least(
                        F.ceil(F.col("__n") / F.lit(_AUTO_SALT_TARGET)),
                        F.lit(_AUTO_SALT_MAX_G),
                    )
                )
                .cast("int"),
            ).drop("__n")
            gexpr = F.col("__g")
            dp = spark.sparkContext.defaultParallelism
            P = max(dp, min(dp * 8, int(total // 10_000) + 1))

    if skew_salt is None:
        # Pinned shuffle_hash (round-8): the two sides are the SAME banded
        # plan, so a shuffled join's two exchanges canonicalize equal and
        # ReuseExchange computes the banding (and any carried signature
        # fold) ONCE.  Left to the planner, small inputs flip to a
        # broadcast join whose broadcast side is a SEPARATE subtree — the
        # whole shingle+signature pipeline then evaluates twice (the r8
        # sf0.1 plan pin shows 4 documents scans for minhash_lsh).  At
        # cluster scale the sides exceed the broadcast threshold anyway,
        # and shuffled-HASH (vs sort-merge) keeps carried payloads out of
        # sort spills (the a7956e0 ENOSPC lesson).
        l, r = banded.alias("l"), banded.hint("shuffle_hash").alias("r")
        cond = keycond(l, r) & (F.col("l.__id") < F.col("r.__id"))
        sel = [F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b")]
        sel += [F.col(f"l.{c}").alias(f"{c}_a") for c in carry]
        sel += [F.col(f"r.{c}").alias(f"{c}_b") for c in carry]
        out = l.join(r, cond).select(*sel)
        return out if raw else out.dropDuplicates(["id_a", "id_b"])

    if gexpr is None:
        # explicit integer salt: the expert/compat mode — GLOBAL g, every
        # row replicated, no pre-flight job (unit tests pin this exact
        # decomposition).  Production callers should pass "auto".
        gexpr = F.lit(int(skew_salt))
    sb = banded.withColumn("__g", gexpr).withColumn(
        "__s", F.pmod(F.xxhash64(F.col("__id")), F.col("__g")).cast("int")
    )
    left = (
        sb.withColumn(
            "__q", F.explode(F.sequence(F.col("__s"), F.col("__g") - F.lit(1)))
        )
        .withColumnRenamed("__s", "__p")
        .drop("__g")
    )
    right = (
        sb.withColumn("__p", F.explode(F.sequence(F.lit(0), F.col("__s"))))
        .withColumnRenamed("__s", "__q")
        .drop("__g")
    )
    # The block decomposition only bounds per-TASK time if blocks actually
    # land on distinct reducers: hashing block keys into the session's
    # default shuffle-partition count piles hot blocks onto one reducer —
    # measured at the sf10 Zipf corpus as a 348 s straggler, WORSE than
    # unsalted.  AQE cannot help: the hot partitions are byte-tiny (narrow
    # banded rows) but CPU-heavy (the per-pair score runs in this stage),
    # and both skew-split and coalescing key on BYTES.  Explicit hash
    # partitioning on the full block key into many partitions replaces the
    # join's own exchange (same keys, so the SMJ reuses it — no extra
    # shuffle) and is exempt from AQE coalescing (user-specified partition
    # count).  The auto path sizes P from the measured banded row count
    # (tiny inputs don't pay a fixed floor); the explicit path has no row
    # count to consult and keeps a parallelism-derived width.
    if P is None:
        dp = banded.sparkSession.sparkContext.defaultParallelism
        P = max(dp, min(dp * 8, 128))
    keyc = [F.col(k) for k in keys]
    left = left.repartition(P, *keyc, F.col("__p"), F.col("__q"))
    right = right.repartition(P, *keyc, F.col("__p"), F.col("__q"))
    l, r = left.alias("l"), right.alias("r")
    # same-salt block (p == q) needs the id< tie-break; cross-salt blocks
    # hold each unordered pair exactly once, in whichever orientation
    same = F.col("l.__p") == F.col("l.__q")
    cond = (
        keycond(l, r)
        & (F.col("l.__p") == F.col("r.__p"))
        & (F.col("l.__q") == F.col("r.__q"))
        & F.when(same, F.col("l.__id") < F.col("r.__id"))
         .otherwise(F.col("l.__id") != F.col("r.__id"))
    )
    sel = [
        F.least(F.col("l.__id"), F.col("r.__id")).alias("id_a"),
        F.greatest(F.col("l.__id"), F.col("r.__id")).alias("id_b"),
    ]
    if raw:  # join orientation — no per-row conditional payload copy
        sel += [F.col(f"l.{c}").alias(f"{c}_a") for c in carry]
        sel += [F.col(f"r.{c}").alias(f"{c}_b") for c in carry]
        return l.join(r, cond).select(*sel)
    a_first = F.col("l.__id") < F.col("r.__id")
    sel += [
        F.when(a_first, F.col(f"l.{c}")).otherwise(F.col(f"r.{c}")).alias(f"{c}_a")
        for c in carry
    ]
    sel += [
        F.when(a_first, F.col(f"r.{c}")).otherwise(F.col(f"l.{c}")).alias(f"{c}_b")
        for c in carry
    ]
    return l.join(r, cond).select(*sel).dropDuplicates(["id_a", "id_b"])


def _claim_filter(band_col: Column, band_eqs: list[Column]) -> Column:
    """One-band-claim predicate for ``_bucket_self_pairs(raw=True)`` output:
    TRUE only on the candidate row whose band is the FIRST band where the
    two sides collide (``band_eqs[b]`` = "sides equal in band b",
    recomputed from the carried payloads).  Every cross-band duplicate of a
    pair evaluates the same claim, so exactly one row survives — the
    scorer then runs ONCE per pair and no dedup shuffle is needed.

    Collision stance: the claim recomputes band equality from the payload
    (signature slices / hash bits / bucket arrays), so a pair whose only
    collisions are xxhash64 BUCKET collisions with unequal payload bands
    claims no row and is dropped — it was a false-positive candidate that
    only the ~2⁻⁶⁴ bucket collision produced (same stance as exact_dedup's
    digest join).

    The predicate is wrapped ``coalesce(..., FALSE)`` on purpose: a
    null-INTOLERANT pre-join filter lets Catalyst infer
    ``isnotnull(payload)`` on each join side, and that constraint —
    rewritten through the projections — carries the whole signature fold
    below the ensure_parallelism exchange into the (often single-task)
    scan stage, double-evaluating it (the round-7 simhash 0.79→4.11 s
    regression).  Coalesce is null-tolerant, so no constraint is derived;
    the filter itself references both sides and therefore stays at the
    join, where the banded rows already are.
    """
    first_eq = F.array_position(F.array(*band_eqs), F.lit(True))
    return F.coalesce(first_eq == band_col.cast("long") + 1, F.lit(False))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    threshold: float | None = 0.5,
    shingle: str = "word",
    verify: str = "exact",
    skew_salt: int | str | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash + LSH banding, verified by
    Jaccard when ``threshold`` is given.

    Returns (id_a, id_b, jaccard) with id_a < id_b.  The banding join is the
    only corpus-wide shuffle; its key is (band_index, band_hash).
    ``shingle``: "word" (n = ``shingle_words`` words) or "char" (n =
    ``shingle_words`` characters — for short texts where word grams are too
    coarse).

    ``verify``:
    - ``"exact"``   — fetch both sides' shingle sets per candidate pair and
      compute true Jaccard (two joins against the wide shingle arrays).
    - ``"estimate"`` — score pairs by the MinHash estimator (fraction of
      matching signature components, the standard unbiased Jaccard
      estimate).  The signature array rides along the banding self-join, so
      there are NO verification joins: one shuffle end to end.  Trade: the
      banding shuffle widens by ``num_hashes`` longs per (doc, band) row vs
      two extra join stages in exact mode; at corpus scale the two-stage
      latency and the wide shingle fetches dominate, so this is the cheap
      path when estimator error (sd ≈ sqrt(J(1-J)/num_hashes), ~0.06 at
      J=0.5 with 64 hashes) is acceptable.
    """
    from supersonic_spark.operators.core import ensure_parallelism

    make = with_word_shingles if shingle == "word" else with_char_shingles
    base = make(ensure_parallelism(df), id_col, text_col, shingle_words)

    # Signature via the single-pass HOF fold (minhash_signature): one
    # transform emits all num_hashes hashes per shingle, one aggregate
    # folds the elementwise min — SHUFFLE-FREE.  A/B at sf0.1 corpus-wide
    # (5k docs, min-of-3 steady): fold 0.36 s vs explode→64-min-agg 3.5 s.
    # The explode→groupBy alternative loses because a 64-buffer
    # HashAggregate falls out of whole-stage codegen (observed uncompiled
    # in the physical plan), so all 64 mins evaluate interpreted per
    # exploded row AND it pays a corpus shuffle the fold avoids.  (An
    # earlier small-slice measurement had suggested the opposite; the
    # corpus-wide A/B is the one that matches the 100 TB shape.)
    arr = base.select("__id", minhash_signature(F.col("__sh"), num_hashes).alias("__sigarr"))

    # Banding over the narrow signature only: the (band, bucket) self-join
    # shuffles 20 bytes × bands per document, never the shingle arrays.
    # Each bucket hashes a SLICE of the signature array directly —
    # xxhash64 accepts array columns — instead of fanning the signature
    # out into num_hashes scalar columns and concat_ws-ing their string
    # casts.  The fan-out shape generated an enormous projection method
    # (64 casts + a 64-arg concat per band) that sat beyond the JIT's
    # compile appetite: at sf1 (50k docs) the first ~3 runs of the query
    # each burned 1900-7300 JVM-CPU-s in interpreted bytecode before C2
    # warmed, then dropped to ~75 CPU-s.  The banding expression is ONE
    # transform-over-sequence node (see _band_structs), compiles
    # immediately, and costs ~10 py4j calls to build instead of ~100.
    band_expr = _band_structs(F.col("__sigarr"), num_hashes, bands)
    if verify == "estimate":
        return _estimate_pairs_from_sig(arr, band_expr, num_hashes, threshold, skew_salt)
    if verify != "exact":
        raise ValueError(f"verify must be 'exact' or 'estimate', got {verify!r}")

    banded = arr.select("__id", F.explode(band_expr).alias("__b")).select(
        "__id", F.col("__b.band").alias("band"), F.col("__b.bucket").alias("bucket")
    )

    # Candidate pairs via the (band, bucket) self-join: both sides share the
    # signature shuffle (ReuseExchange), so signatures compute once.  A
    # groupBy+collect_list+pair-expansion alternative was measured ~40%
    # slower (extra shuffle + interpreted nested-HOF expansion).
    # ``skew_salt`` splits hot buckets across salt-block tasks (see
    # _bucket_self_pairs) for corpora where one bucket holds a large doc
    # fraction (boilerplate-heavy crawls).
    cand = _bucket_self_pairs(banded, ["band", "bucket"], [], skew_salt)

    # Exact-Jaccard verification: fetch each side's shingles once per
    # surviving candidate pair.  Both fetch joins are pinned shuffle_hash
    # (round-8): the two shingle projections canonicalize to the same
    # id-keyed exchange, so the corpus is shingled ONCE for both fetches
    # (broadcast builds are separate subtrees — the planner's sf0.1
    # choice re-ran the shingle pipeline per side), and hash (vs
    # sort-merge) keeps the wide shingle arrays out of any sort spill at
    # corpus scale — the same reasoning as the estimate path's narrow
    # signature fetches.
    sh_a = base.select(F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"))
    sh_b = base.select(F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"))
    pairs = cand.join(sh_a.hint("shuffle_hash"), "id_a").join(
        sh_b.hint("shuffle_hash"), "id_b"
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    out = pairs.select(
        "id_a",
        "id_b",
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    )
    if threshold is not None:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def _estimate_pairs_from_sig(
    arr: DataFrame,
    band_expr: Column,
    num_hashes: int,
    threshold: float | None,
    skew_salt: int | str | None = None,
) -> DataFrame:
    """Estimate-mode tail of :func:`minhash_lsh_pairs`: NARROW banding
    join, then fetch both signatures per deduped pair and score once.

    The banded self-join carries only (id, band, bucket) — 24 B rows —
    and the cross-band dedup runs on 16-byte (id_a, id_b) pairs BEFORE
    any signature exists in the plan; the two ~0.5 KB signatures are
    then fetched by id (two shuffled-hash joins against the one
    (id → signature) projection, which share a single id-keyed exchange
    via ReuseExchange) and the 64-element match fold runs exactly once
    per surviving pair.

    Why not let the signatures ride the band explode (the round-7/8
    'zero verification joins' shape, with cross-band copies resolved by
    a one-band claim)?  MEASURED at sf100 (5M docs): the banded
    self-join's two SMJ sorts then each spill ~80M rows x ~550 B ≈
    80+ GB and the stage dies ENOSPC
    (SPILL_OUT_OF_MEMORY/UnsafeExternalSorter) — the signature payload
    turns a 4 GB narrow sort into a disk-bound one.  Fetch-after-dedup
    costs two extra id-keyed shuffles of the signature projection
    (corpus-sized but narrow, ~0.5 KB/doc — 2.5 GB at 5M docs) and one
    extra evaluation of the MinHash fold (the two fetch joins reuse one
    exchange; banding is the other consumer), and in exchange every
    wide row is gone from every sort: the operator completes at sf100
    in the same per-doc budget as sf30.  The claim-filter shape remains
    right for SimHash (8 B payload) and stays in :func:`_claim_filter`.
    """
    # ONE id-keyed exchange of (id, signature) feeds all three consumers
    # (round-8): the banding branch explodes (band, bucket) ABOVE it, and
    # the two fetch joins read it directly.  Every consumer uses the same
    # two columns, so the exchange subtrees canonicalize equal and stage
    # reuse computes the MinHash fold ONCE — the previous shape evaluated
    # the fold separately under the banding exchange and under the fetch
    # exchange (the "one extra evaluation" cost of the a7956e0 narrow-join
    # restructure, now bought back for one extra narrow exchange read).
    # The fetch joins are already keyed on this exchange's partitioning
    # (id renamed), so the signature side of each fetch is exchange-free.
    arr_p = arr.select("__id", "__sigarr").repartition("__id")
    banded = arr_p.select(
        "__id",
        F.explode(band_expr).alias("__b"),
    ).select("__id", F.col("__b.band").alias("band"), F.col("__b.bucket").alias("bucket"))
    pairs = _bucket_self_pairs(banded, ["band", "bucket"], [], skew_salt)
    sigs = arr_p
    cand = (
        pairs.join(
            sigs.select(
                F.col("__id").alias("id_a"), F.col("__sigarr").alias("__sa")
            ).hint("shuffle_hash"),
            "id_a",
        ).join(
            sigs.select(
                F.col("__id").alias("id_b"), F.col("__sigarr").alias("__sb")
            ).hint("shuffle_hash"),
            "id_b",
        )
    )
    matches = F.aggregate(
        F.zip_with(
            F.col("__sa"), F.col("__sb"),
            lambda a, b: F.when(a == b, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    out = cand.select(
        "id_a",
        "id_b",
        (matches.cast("double") / F.lit(float(num_hashes))).alias("jaccard"),
    )
    if threshold is not None:
        # coalesce-wrapped so Catalyst derives no isnotnull(__sa/__sb)
        # constraint: a null-intolerant score filter would push the
        # null-check through the fetch joins onto the signature scan and
        # drag the whole MinHash fold into the serial scan stage (the
        # round-7 simhash trap; see _claim_filter).
        out = out.filter(F.coalesce(F.col("jaccard") >= threshold, F.lit(False)))
    return out


# ------------------------------------------------- incremental (indexed)

def digest_index(df: DataFrame, cols: list[str]) -> DataFrame:
    """The exact-dedup corpus index: one row per distinct 64-bit content
    digest (xxhash64 over ``cols``), column ``digest``.  Write it once per
    corpus; grow it per ingest batch by unioning the new batch's digests
    (append-only — no rewrite).  8 bytes per unique document."""
    return df.select(
        F.xxhash64(*[_c(c) for c in cols]).alias("digest")
    ).distinct()


def dedup_exact_against_index(
    new_df: DataFrame, index: DataFrame, cols: list[str]
) -> DataFrame:
    """Incremental EXACT dedup: flag each new-batch row whose content
    digest already exists in a :func:`digest_index` — the front-door
    exactly-once content filter for continuous ingest.  Returns the new
    batch with a ``seen_before`` boolean appended.

    Scale shape: one join keyed on the 8-byte digest; the raw content
    never shuffles (digest computed map-side) and the corpus is
    represented only by its digest set.  Same xxhash64 collision stance
    as :func:`exact_dedup`.  Batch-side duplicates are NOT flagged
    against each other (use :func:`exact_dedup` within the batch first);
    this operator answers only "has the corpus seen this content".
    """
    probe = new_df.withColumn(
        "__digest", F.xxhash64(*[_c(c) for c in cols])
    )
    hit = index.select(
        F.col("digest").alias("__digest"), F.lit(True).alias("__seen")
    ).dropDuplicates(["__digest"])
    out = probe.join(hit, "__digest", "left")
    return out.select(
        *new_df.columns, F.coalesce("__seen", F.lit(False)).alias("seen_before")
    )

def minhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    shingle: str = "word",
) -> DataFrame:
    """The persistable LSH index of a corpus: one row per (document, band)
    with columns (``id_col``, band, bucket, signature).

    This is the artifact an incremental-ingest pipeline writes ONCE per
    corpus (e.g. ``index.write.partitionBy("band").parquet(path)``) and
    every later batch probes via :func:`dedup_against_index` — the corpus
    text is never re-shingled and its signatures never recomputed.  All
    hashing is xxhash64 (deterministic across sessions and clusters), so
    an index written by one job matches probes computed by any other as
    long as (num_hashes, bands, shingle_words, shingle) agree.

    Scale shape (100 TB): the index is ``bands`` rows of
    (8B id + 8B bucket + num_hashes*8B signature) per document — the
    signature rides along so index probes need zero joins back to the
    corpus.  Writing it bucketed/partitioned by band keeps later probe
    joins pruned and co-located.
    """
    from supersonic_spark.operators.core import ensure_parallelism

    make = with_word_shingles if shingle == "word" else with_char_shingles
    base = make(ensure_parallelism(df), id_col, text_col, shingle_words)
    arr = base.select(
        "__id", minhash_signature(F.col("__sh"), num_hashes).alias("__sigarr")
    )
    return arr.select(
        "__id", "__sigarr",
        F.explode(_band_structs(F.col("__sigarr"), num_hashes, bands)).alias("__b"),
    ).select(
        F.col("__id").alias(id_col),
        F.col("__b.band").alias("band"),
        F.col("__b.bucket").alias("bucket"),
        F.col("__sigarr").alias("signature"),
    )


def dedup_against_index(
    new_df: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    shingle: str = "word",
    threshold: float | None = 0.5,
) -> DataFrame:
    """Incremental near-dup detection: match a NEW batch of documents
    against an existing corpus' :func:`minhash_band_index` without touching
    the corpus text.

    Returns (new_id, index_id, jaccard) — one row per (new document,
    indexed document) pair that collides in ≥1 LSH band, scored by the
    signature-match Jaccard estimator.  Signatures come from the probe
    and the INDEX itself (id-keyed fetch joins after the narrow band
    join) — the corpus text is never touched.  ``threshold=None`` returns
    all banding candidates unscore-filtered.

    The hash parameters MUST match the ones the index was built with —
    xxhash64 determinism is what makes a stored index probe-able by a
    different session.  Self-matches (same id on both sides, e.g. when
    re-probing a batch already ingested) are dropped.

    Scale shape (100 TB ingest): the daily batch is small next to the
    corpus; the only shuffle of index data is the (band, bucket) join,
    which prunes to the buckets the batch actually touches (partition the
    index by band at write time, and with AQE the probe side broadcasts
    when small).  Per-batch cost is O(batch) signature work + one join —
    the corpus is never rescanned, which is the entire point vs re-running
    :func:`minhash_lsh_pairs` over corpus+batch.
    """
    # Probe side: ONE id-keyed exchange of (id, signature) shared by the
    # band branch and the signature fetch (round-8, same shape as
    # _estimate_pairs_from_sig) — building the full band-index projection
    # separately for each consumer re-ran the shingle+fold pipeline per
    # consumer.  The index side stays as handed in: in the persisted
    # contract it is a parquet scan, and a column-pruned re-scan is
    # cheaper than forcing a corpus-wide repartition of the index rows.
    from supersonic_spark.operators.core import ensure_parallelism

    make = with_word_shingles if shingle == "word" else with_char_shingles
    base_n = make(ensure_parallelism(new_df), id_col, text_col, shingle_words)
    arr_n = base_n.select(
        "__id", minhash_signature(F.col("__sh"), num_hashes).alias("__sigarr")
    ).repartition("__id")
    probe = arr_n.select(
        F.col("__id").alias(id_col),
        F.explode(_band_structs(F.col("__sigarr"), num_hashes, bands)).alias("__b"),
    ).select(
        id_col, F.col("__b.band").alias("band"), F.col("__b.bucket").alias("bucket")
    )
    n, x = probe.alias("n"), index.alias("x")
    # NARROW band join: only (id, band, bucket) enters the (band, bucket)
    # join sorts; the pair dedup runs on 16-byte (new_id, index_id) rows;
    # both ~0.5 KB signatures are fetched BY ID afterwards and the match
    # fold runs once per pair.  The signature-riding variant's index-side
    # sort spills ~(bands x corpus) wide rows — the same SMJ-sort ENOSPC
    # measured for the self-join shape at sf100 (see
    # _estimate_pairs_from_sig); at ingest scale the corpus index is the
    # big side, so narrowing matters even more here.  The signatures are
    # fetched from the INDEX itself (one dropDuplicates over its id — the
    # signature repeats per band row), so the corpus text is still never
    # touched, which is the operator's contract.
    pairs = (
        n.join(
            x,
            (F.col("n.band") == F.col("x.band"))
            & (F.col("n.bucket") == F.col("x.bucket")),
        )
        .filter(F.col(f"n.{id_col}") != F.col(f"x.{id_col}"))
        .select(
            F.col(f"n.{id_col}").alias("new_id"),
            F.col(f"x.{id_col}").alias("index_id"),
        )
        .dropDuplicates(["new_id", "index_id"])
    )
    sig_n = arr_n.select(
        F.col("__id").alias("new_id"), F.col("__sigarr").alias("__sa")
    )
    # band == 0 first: every document has exactly one band-0 row by
    # :func:`minhash_band_index` construction (bands are 0..bands-1 per
    # doc), so this is the same distinct (id → signature) map while the
    # dedup exchange carries 1/bands of the signature-wide rows — and a
    # band-partitioned parquet index prunes the scan to one partition.
    # The dropDuplicates stays as the id-keyed exchange the fetch join
    # needs anyway (and as a guard for hand-built indexes).
    sig_x = index.filter(F.col("band") == 0).select(
        F.col(id_col).alias("index_id"), F.col("signature").alias("__sb")
    ).dropDuplicates(["index_id"])
    cand = pairs.join(sig_n.hint("shuffle_hash"), "new_id").join(
        sig_x.hint("shuffle_hash"), "index_id"
    )
    matches = F.aggregate(
        F.zip_with(
            F.col("__sa"), F.col("__sb"), lambda a, b: F.when(a == b, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    out = cand.select(
        "new_id",
        "index_id",
        (matches.cast("double") / F.lit(float(num_hashes))).alias("jaccard"),
    )
    if threshold is not None:
        out = out.filter(F.coalesce(F.col("jaccard") >= threshold, F.lit(False)))
    return out


# ---------------------------------------------------------------- jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_words: int = 3,
    threshold: float = 0.5,
    df_cap: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs (the oracle-able baseline).

    Blocking = the shingle self-join itself: only pairs sharing ≥1 shingle
    are materialized.  At 100 TB you run minhash_lsh_pairs instead; this is
    the ground-truth/verification operator.

    ``df_cap``: hub-shingle guard — drop shingles whose document frequency
    exceeds the cap before the self-join (a boilerplate header shared by k
    documents otherwise materializes k² candidate rows).  The over-cap gram
    list is tiny (only the hubs) and broadcast-anti-joined, so the guard
    adds one cheap aggregation, not a corpus shuffle.  Jaccard is then
    computed over the CAPPED shingle universe (hub grams leave both the
    intersection and the sizes), so real near-dups — which share many
    non-ubiquitous grams — keep their scores; None (default) preserves the
    exact textbook definition.
    """
    from supersonic_spark.operators.core import ensure_parallelism

    sh = with_word_shingles(ensure_parallelism(df), id_col, text_col, shingle_words)
    exploded = sh.select("__id", F.explode("__sh").alias("__s"))
    if df_cap is not None:
        # per-doc shingles are distinct ⇒ count(*) per gram IS document freq
        hot = (
            exploded.groupBy("__s").agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > df_cap).select("__s")
        )
        exploded = exploded.join(F.broadcast(hot), "__s", "left_anti")
        sizes = exploded.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    else:
        sizes = sh.select("__id", F.size("__sh").alias("__n"))
    a, b = exploded.alias("a"), exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.__s") == F.col("b.__s")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    na = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    out = (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("__i").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("__i")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


# ---------------------------------------------------------------- simhash

#: literal 2^j masks as signed longs (bit 63 wraps negative — bitwiseAND
#: on longs is sign-agnostic)
_POW2 = [(1 << j) if j < 63 else -(1 << 63) for j in range(64)]


def simhash64(shingles: Column) -> Column:
    """64-bit SimHash of a shingle set: bit j of the result is the sign of
    sum over shingles of ±1 according to bit j of xxhash64(shingle).

    ONE per-row array fold with a 64-wide accumulator (zip_with against a
    literal 2^j mask array) — shuffle-free AND a small expression tree.
    The previous shape built 64 SEPARATE aggregate folds (one per bit):
    same arithmetic, but 64× the HOF dispatch and a projection too large
    for the JIT — A/B min-of-4 steady: 64-folds 0.55/2.91 s (sf0.1/sf1)
    with max spikes to 12.9 s pre-JIT, single fold 0.29/1.85 s, max
    1.98 s.  Bit-identical outputs (also pinned vs the explode→64-agg
    twin, which remains slower still: a 64-buffer HashAggregate falls out
    of whole-stage codegen AND pays a shuffle — see
    :func:`simhash64_agg`)."""
    hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    pow2 = F.array(*[F.lit(p).cast("long") for p in _POW2])
    folded = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc, pow2,
            lambda a, p: a + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            folded, pow2,
            lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, b: a.bitwiseOR(b),
    )


def simhash64_agg(
    df: DataFrame, id_col: str = "__id", shingle_col: str = "__sh", out_col: str = "__h"
) -> DataFrame:
    """DataFrame-level SimHash: (id, 64-bit simhash) via explode → 64
    conditional-sum aggregates → bit reassembly.  Bit-identical to
    :func:`simhash64` (pinned by test_simhash64_agg_matches_fold).

    MEASURED SLOWER than the per-row fold — kept as the documented
    alternative, not the default.  A/B at sf0.1 (5k docs, local[32],
    min-of-3 steady runs): fold 0.71 s vs this 3.26 s.  The explode→groupBy
    shape that wins for the MinHash signature does NOT transfer here: a
    HashAggregate with 64 aggregate buffers falls out of whole-stage
    codegen (the physical plan shows an uncompiled HashAggregate), so all
    64 CASE-sums evaluate interpreted per exploded row — strictly more
    interpreted work than the fold, PLUS a shuffle the fold doesn't have.
    MinHash's fold was different: 64 xxhash64 calls per element inside the
    lambda dominated, so moving them into a groupBy paid off.  SimHash's
    fold hashes each element once and does cheap bit ops, and it is
    shuffle-free — the better plan at every scale measured.

    Documents whose shingle array is empty are dropped (callers shingle
    via :func:`with_word_shingles`, which already filters those)."""
    ex = df.select(F.col(id_col).alias("__id"), F.explode(F.col(shingle_col)).alias("__s"))
    ex = ex.select("__id", F.xxhash64("__s").alias("__hh"))
    sums = ex.groupBy("__id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("__hh"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"__b{j}")
            for j in range(64)
        ]
    )
    out = F.lit(0).cast("long")
    for j in range(64):
        out = out.bitwiseOR(
            F.when(
                F.col(f"__b{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
            ).otherwise(F.lit(0).cast("long"))
        )
    return sums.select("__id", out.alias(out_col))


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_words: int = 3,
    max_hamming: int = 3,
    skew_salt: int | str | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: candidates via 4×16-bit band blocking
    (a pair within Hamming distance ≤3 of 64 bits must agree exactly on at
    least one of 4 disjoint 16-bit bands — pigeonhole), verified by popcount.

    ``skew_salt``: hot-band guard (boilerplate corpora put many docs in one
    16-bit band bucket) — same pair-block decomposition as the MinHash
    banding join (:func:`_bucket_self_pairs`).
    """
    from supersonic_spark.operators.core import ensure_parallelism

    base = with_word_shingles(ensure_parallelism(df), id_col, text_col, shingle_words)
    # per-row HOF fold: shuffle-free and measured 4.6× faster than the
    # explode→64-agg variant (see simhash64_agg docstring for the A/B)
    base = base.select("__id", simhash64(F.col("__sh")).alias("__h"))
    bands = base.select(
        "__id",
        "__h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftright(F.col("__h"), 16 * k)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("__b"),
    ).select("__id", "__h", "__b.band", "__b.key")
    # raw=True + one-band claim: Hamming distance is symmetric, and the
    # first band where the two 16-bit slices agree is recomputable from
    # the carried hashes — each pair survives on exactly one candidate
    # row (_claim_filter), so popcount runs once per pair and there is no
    # dedup shuffle.  Filters are coalesce-wrapped so no isnotnull(__h)
    # constraint is inferred (the round-7 serial-scan trap; see
    # _claim_filter).
    cand = _bucket_self_pairs(bands, ["band", "key"], ["__h", "band"],
                              skew_salt, raw=True).select(
        "id_a", "id_b", F.col("band_a").alias("__band"),
        F.col("__h_a").alias("h_a"), F.col("__h_b").alias("h_b"),
    )

    def _band16_eq(k: int) -> Column:
        mask = F.lit(0xFFFF)
        return (
            F.shiftright(F.col("h_a"), 16 * k).bitwiseAND(mask)
            == F.shiftright(F.col("h_b"), 16 * k).bitwiseAND(mask)
        )

    claimed = cand.filter(
        _claim_filter(F.col("__band"), [_band16_eq(k) for k in range(4)])
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return claimed.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.coalesce(F.col("hamming") <= max_hamming, F.lit(False))
    )


# ------------------------------------------------------- embedding near-dup

def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
) -> DataFrame:
    """EXACT embedding near-dup pairs: (id_a, id_b, cos) with id_a < id_b
    and cosine similarity ≥ ``threshold``.

    This is the oracle-able ground truth (O(n²) pairs); at 100 TB run
    :func:`embedding_lsh_pairs`, which prefilters candidates through
    sign-random-projection buckets so the shuffle key is (table, bucket)
    instead of a full cross join.  The dot/norm fold is JVM-side
    (``F.aggregate``/``F.zip_with`` — no Python in the row path).
    """
    from supersonic_spark.operators.core import ensure_parallelism
    from supersonic_spark.pipeline.similarity import cosine

    df = ensure_parallelism(df)
    a = df.select(_c(id_col).alias("id_a"), _c(vec_col).alias("__va"))
    b = df.select(_c(id_col).alias("id_b"), _c(vec_col).alias("__vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine(F.col("__va"), F.col("__vb"))
    return pairs.select("id_a", "id_b", cos.alias("cos")).filter(
        F.col("cos") >= F.lit(threshold)
    )


def embedding_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.9,
    planes: int = 12,
    tables: int = 6,
    skew_salt: int | str | None = None,
) -> DataFrame:
    """Approximate embedding near-dup: candidates share a sign-random-
    projection bucket in ≥1 of ``tables`` hash tables; exact cosine then
    filters to ≥ ``threshold``.

    Scale shape: bucketing is one Arrow-batched matmul per batch
    (similarity._bucket_sketch_udf); the only corpus-wide shuffle is the
    (table, bucket) self-join, and buckets shrink as planes grow.  Recall
    rises with ``tables``, precision cost falls with ``planes``.
    ``skew_salt``: hot-bucket pair-block decomposition, as in the MinHash
    banding join (:func:`_bucket_self_pairs`).
    """
    from supersonic_spark.operators.core import ensure_parallelism
    from supersonic_spark.pipeline.similarity import _bucket_sketch_udf, cosine

    sketch = _bucket_sketch_udf(dim, planes, tables)
    # coalesce-wrapped sketch (values unchanged — the UDF never returns
    # NULL): the (tbl, bkt) self-join constraint otherwise rewrites onto
    # the sketch UDF and duplicates it below the ensure_parallelism
    # exchange (round-8 plan sweep found 6 duplicate ArrowEvalPython
    # evaluations here — the join-key variant of the round-7 filter trap).
    base = (
        ensure_parallelism(df).select(_c(id_col).alias("__id"), _c(vec_col).alias("__v"))
        .withColumn(
            "__bkts", F.coalesce(sketch("__v"), F.array().cast("array<bigint>"))
        )
        .select(
            "__id", "__v", "__bkts", F.posexplode("__bkts").alias("tbl", "bkt")
        )
    )
    # raw=True + one-table claim: cosine is symmetric, and carrying each
    # side's full bucket array (``tables`` ints — bytes, vs the dim-float
    # vector already riding along) lets each pair claim the FIRST table
    # where the buckets agree (_claim_filter), so the cosine fold runs
    # once per pair and no dedup shuffle exists.  Filters are
    # coalesce-wrapped so no isnotnull constraint drags the sketch UDF
    # into the serial scan stage (round-7 trap; see _claim_filter).
    cand = _bucket_self_pairs(base, ["tbl", "bkt"], ["__v", "__bkts", "tbl"],
                              skew_salt, raw=True).select(
        "id_a", "id_b", F.col("tbl_a").alias("__tbl"),
        F.col("__v_a").alias("__va"), F.col("__v_b").alias("__vb"),
        F.col("__bkts_a").alias("__ba"), F.col("__bkts_b").alias("__bb"),
    )
    claimed = cand.filter(
        _claim_filter(
            F.col("__tbl"),
            [
                F.col("__ba").getItem(t) == F.col("__bb").getItem(t)
                for t in range(tables)
            ],
        )
    )
    cos = cosine(F.col("__va"), F.col("__vb"))
    return claimed.select("id_a", "id_b", cos.alias("cos")).filter(
        F.coalesce(F.col("cos") >= F.lit(threshold), F.lit(False))
    )


# ------------------------------------------------------- duplicate clusters

def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over an undirected pair list: (id, component)
    where component = the MIN node id reachable from ``id``.  The transitive
    closure near-dup pipelines need: LSH/Jaccard emit PAIRS, but removal
    wants CLUSTERS (A~B, B~C ⇒ {A,B,C} together even if A~C was never
    emitted).

    Algorithm: iterative min-label propagation — each round every node
    takes the min of its own label and its neighbors' labels.  Converges in
    O(component diameter) rounds (near-dup clusters are shallow; ``max_iter``
    is a runaway bound).  Each round is one join + one aggregation, both
    shuffling on node id; labels are localCheckpoint'ed per round to cut
    lineage (non-fault-tolerant — an explicit checkpoint dir is the
    HA-cluster variant).  Convergence detection: labels only ever decrease,
    so an unchanged SUM(label) is a fixpoint — one tiny action per round.
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    edges = edges.persist()
    labels = edges.select(F.col("a").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    prev_sum = None
    for _ in range(max_iter):
        nbr = (
            edges.join(labels.withColumnRenamed("id", "a"), "a")
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("component").alias("__nbr_min"))
        )
        labels = labels.join(nbr, "id", "left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce("__nbr_min", "component")
            ).alias("component"),
        )
        labels = labels.localCheckpoint(eager=True)
        cur = labels.agg(F.sum("component")).first()[0]
        if cur == prev_sum:
            break
        prev_sum = cur
    edges.unpersist()
    return labels


def connected_components_two_phase(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the deep-graph twin of :func:`connected_components`.

    Min-label propagation converges in O(component diameter) rounds; for
    near-dup clusters (shallow) that's fine, but a chain of length n takes
    n rounds.  The two-phase star algorithm contracts the graph toward
    stars and converges in O(log n) rounds regardless of diameter:

    - large-star(u): attach every neighbor v > u to m = min(Γ(u) ∪ {u});
    - small-star(u): orient edges toward the larger endpoint, then attach
      every smaller neighbor (and u itself) to m.

    Each phase is one groupBy-min + one join keyed on node id; rounds end
    when the edge multiset fingerprint (count + sum of pair hashes — one
    tiny action) stops changing.  Per-round lineage is cut by reliable
    ``checkpoint`` when ``checkpoint_dir`` is given (the HA option for long
    jobs: recomputation after executor loss replays one round, not the
    whole history) else ``localCheckpoint`` (faster, non-fault-tolerant).

    Returns (id, component) with component = min node id of the component,
    exactly like :func:`connected_components`.
    """
    spark = pairs.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def cut(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if checkpoint_dir else df.localCheckpoint(eager=True)

    nodes = (
        pairs.select(F.col(src).alias("id"))
        .union(pairs.select(F.col(dst).alias("id")))
        .distinct()
    )
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )

    def fingerprint(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(F.col("a"), F.col("b"))).alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev = None
    for _ in range(max_iter):
        # large-star: symmetric adjacency; m = min over Γ(u) ∪ {u}
        sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
        large = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star: orient toward the larger endpoint; attach u and all
        # its (smaller) neighbors to the minimum
        oriented = large.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        mins2 = oriented.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            oriented.join(mins2, "a")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("a").alias("x"), F.col("m").alias("y")),
                        F.struct(F.col("b").alias("x"), F.col("m").alias("y")),
                    )
                ).alias("e")
            )
            .select(F.col("e.x").alias("a"), F.col("e.y").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        edges = cut(small)
        fp = fingerprint(edges)
        if fp == prev:
            break
        prev = fp

    # at the star fixpoint every edge is (member, root); roots and isolated
    # input nodes label themselves
    labels = edges.select(F.col("a").alias("id"), F.col("b").alias("component"))
    return (
        nodes.join(labels, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("component"))
    )


def cluster_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    quality_col: str | None = None,
) -> DataFrame:
    """Attach near-dup cluster membership to every row: ``component`` (min
    id of the row's cluster; rows in no pair are their own singleton) and
    ``is_canonical`` (the keep-one-per-cluster flag).  Downstream removal
    is ``.filter("is_canonical")``.

    ``quality_col``: keep the BEST cluster member instead of the lowest
    id — canonical is the row with the maximum quality value (ties break
    on the smaller id).  This is the curation-grade policy: when a page
    was crawled five times at different completeness, keep the longest /
    highest-scoring capture, not whichever got the smallest id.  Costs
    one row_number window keyed on component (groups are near-dup
    clusters — tiny — so the per-key sort is bounded); the default path
    stays a pure column comparison with no extra shuffle.
    """
    cc = connected_components(pairs, src, dst, max_iter).withColumnRenamed(
        "id", id_col
    )
    out = df.join(cc, id_col, "left")
    out = out.withColumn("component", F.coalesce("component", F.col(id_col)))
    if quality_col is None:
        return out.withColumn("is_canonical", F.col(id_col) == F.col("component"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("component").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return out.withColumn("is_canonical", F.row_number().over(w) == 1)


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    block_prefix: int = 1,
) -> DataFrame:
    """Edit-distance near-dup pairs (entity resolution / fuzzy matching):
    (id_a, id_b, dist) with levenshtein(text_a, text_b) <= ``max_dist``.

    Blocking keeps the self-join off the full cross product: candidates
    must share a ``block_prefix``-char prefix AND have lengths within
    ``max_dist`` (a true edit-distance bound; the prefix block is the
    recall/cost knob — pairs whose first chars differ are not compared,
    standard blocking tradeoff, documented not hidden).

    Scale shape: one shuffle on the prefix block key; within each block
    the length band prunes before the quadratic levenshtein, and Spark's
    3-arg levenshtein early-exits above the threshold.
    """
    t = _c(text_col)
    base = df.select(
        _c(id_col).alias("__id"),
        t.alias("__t"),
        F.substring(t, 1, block_prefix).alias("__blk"),
        F.length(t).alias("__len"),
    )
    a, b = base.alias("a"), base.alias("b")
    cand = a.join(
        b,
        (F.col("a.__blk") == F.col("b.__blk"))
        & (F.col("a.__id") < F.col("b.__id"))
        & (F.abs(F.col("a.__len") - F.col("b.__len")) <= max_dist),
    )
    dist = F.levenshtein(F.col("a.__t"), F.col("b.__t"), max_dist)
    out = cand.select(
        F.col("a.__id").alias("id_a"),
        F.col("b.__id").alias("id_b"),
        dist.alias("dist"),
    )
    # 3-arg levenshtein returns -1 when the threshold is exceeded
    return out.filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))


def ngram_overlap(
    df: DataFrame,
    bench_df: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    n: int = 8,
    hash_grams: bool = True,
    df_cap: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing at least one word
    ``n``-gram with any benchmark/eval document.  Returns
    (id, n_shared_grams, n_bench_docs) — distinct contaminated grams and how
    many distinct benchmark docs they hit; downstream drops or flags them.

    Scale shape: both sides shingle to DISTINCT grams (with_word_shingles
    fast path), explode, and the contaminated set is found by one equi-join
    keyed on the gram.  With ``hash_grams`` (default) the join key is a
    64-bit xxhash64 digest, so the shuffle carries 8-byte keys instead of
    ~50-byte strings; distinct-counts are hash-collision-tolerant (2^-64 per
    pair).  The benchmark side is typically tiny vs the corpus — mark it
    broadcastable and the corpus side never shuffles at all.

    ``df_cap``: hub-gram guard — a gram appearing in more than ``df_cap``
    corpus documents (boilerplate, license headers) is dropped from BOTH
    sides before the join; such grams are per-definition not benchmark-
    specific, and each one would otherwise fan the join out by its corpus
    frequency.  The over-cap list is tiny and broadcast-anti-joined.
    """
    key = (lambda g: F.xxhash64(g)) if hash_grams else (lambda g: g)
    a = with_word_shingles(df, id_col, text_col, n)
    b = with_word_shingles(bench_df, bench_id_col, bench_text_col, n)
    ae = a.select("__id", F.explode("__sh").alias("__g")).select(
        "__id", key(F.col("__g")).alias("__k")
    )
    be = b.select(F.col("__id").alias("__bid"), F.explode("__sh").alias("__g")).select(
        "__bid", key(F.col("__g")).alias("__k")
    )
    if df_cap is not None:
        hot = (
            ae.groupBy("__k").agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > df_cap).select("__k")
        )
        ae = ae.join(F.broadcast(hot), "__k", "left_anti")
        be = be.join(F.broadcast(hot), "__k", "left_anti")
    hits = ae.join(be, "__k")
    return hits.groupBy("__id").agg(
        F.count_distinct("__k").alias("n_shared_grams"),
        F.count_distinct("__bid").alias("n_bench_docs"),
    ).withColumnRenamed("__id", id_col)


# ------------------------------------------ exact duplicated substrings

def _doc_grams(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(__id, pos, g): rolling ``k``-token word grams per document, hashed
    to 8-byte xxhash64 keys (the explode shuffle never carries gram text).
    Positions are 1-based token indices; docs with < k tokens (and NULL
    text — size(NULL) = -1) emit nothing."""
    from supersonic_spark.operators.core import ensure_parallelism

    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    base = ensure_parallelism(df).select(
        _c(id_col).alias("__id"),
        F.split(F.lower(F.trim(_c(text_col))), r"\s+").alias("__t"),
    )
    n = F.size("__t")
    return base.select(
        "__id",
        F.explode(
            F.when(
                n >= k,
                F.transform(
                    F.sequence(F.lit(1), n - F.lit(k) + 1),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.xxhash64(
                            F.array_join(F.slice(F.col("__t"), i, k), " ")
                        ).alias("g"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,g:bigint>>"))
        ).alias("__gr"),
    ).select("__id", F.col("__gr.pos").alias("pos"), F.col("__gr.g").alias("g"))


def _merge_token_spans(spans: DataFrame, id_col: str, out_id: str) -> DataFrame:
    """Merge overlapping AND adjacent per-document token spans (island
    trick, all JVM window functions): a new island starts where this
    span's start exceeds 1 + the max end seen so far; islands aggregate to
    (min start, max end).  ``spans`` must have (__id, s, e)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("__id").orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = spans.withColumn(
        "__new", (prev_max_e.isNull() | (F.col("s") > prev_max_e + 1)).cast("int")
    )
    islands = flagged.withColumn(
        "__isl",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("__id", "__isl")
        .agg(F.min("s").alias("start_tok"), F.max("e").alias("end_tok"))
        .select(
            F.col("__id").alias(out_id),
            "start_tok",
            "end_tok",
            (F.col("end_tok") - F.col("start_tok") + 1).alias("n_tokens"),
        )
    )


def substring_dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Exact duplicated-substring detection (the "dedup training data at
    the SUBSTRING level" discipline of Lee et al. 2022, arXiv:2107.06499):
    find, per document, the merged token spans covered by any ``k``-token
    word gram that occurs in at least ``min_df`` DISTINCT documents.
    Returns (id, start_tok, end_tok, n_tokens) with 1-based inclusive
    token indices — downstream either cuts the spans out of the text or
    drops documents whose duplicated fraction is high.  Document-level
    near-dup (MinHash) misses this entirely: two long documents sharing
    one boilerplate paragraph have low global Jaccard but exactly the
    duplicated span this operator emits.

    Scale shape (100 TB): LINEAR everywhere — per-doc rolling grams
    (a JVM ``transform`` over token positions, hashed to 8-byte keys so
    the explode shuffle never carries gram text), ONE hash partition of
    the gram stream on the 8-byte key, document frequency computed as a
    window over that same stream (no join back, so the post-aggregate
    broadcast-flip trap of the sf3 tfidf lesson cannot arise), and a
    per-document window merge of overlapping/adjacent spans.  No pair
    join exists at any point, so a hub gram (license boilerplate in 10M
    docs) degrades linearly, not quadratically: its frame buffers df(g)
    24-byte rows through the spillable window buffer.

    Collision stance: grams are compared by xxhash64 (2^-64 per pair,
    the exact_dedup stance); span EQUALITY therefore does not depend on
    hash values, so an ANSI-SQL oracle that joins raw gram strings
    reproduces the output exactly.
    """
    from pyspark.sql.window import Window

    # The gram stream explodes ONCE and shuffles ONCE (round-8
    # optimization, second pass): the earlier agg + shuffled-hash-join
    # shape shared one repartition("g") between the df aggregation and
    # the probe side, but per-branch column pruning ((g, id) vs
    # (id, pos, g)) kept the two exchange subtrees from canonicalizing,
    # so the explode still evaluated twice and the stream shuffled twice.
    # Computing document frequency as a window over the single
    # partitioned stream removes the second evaluation, the second
    # exchange and the join: the first-row-per-(g, doc) flag summed over
    # the g frame IS count_distinct(__id) per gram (the flag skips NULL
    # ids, matching count_distinct's NULL stance; within-doc repeats of
    # a gram flag once).  Both window specs and the flag's lag share one
    # within-partition sort on (g, __id); repartition(col) with no
    # explicit count stays AQE-coalescible, so tiny inputs do not pay a
    # fixed partition floor and cluster runs inherit shuffle.partitions.
    grams = _doc_grams(df, id_col, text_col, k).repartition("g")
    w_run = Window.partitionBy("g").orderBy("__id")
    prev = F.lag("__id").over(w_run)
    first_of_doc = F.when(
        F.col("__id").isNotNull() & (prev.isNull() | (prev != F.col("__id"))),
        F.lit(1),
    ).otherwise(F.lit(0))
    counted = grams.withColumn("__new", first_of_doc).withColumn(
        "__df", F.sum("__new").over(Window.partitionBy("g"))
    )
    spans = counted.filter(F.col("__df") >= min_df).select(
        "__id", F.col("pos").alias("s"), (F.col("pos") + F.lit(k - 1)).alias("e")
    )
    return _merge_token_spans(spans, "__id", id_col)


def substring_gram_index(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Build the corpus-side substring index: one row per DISTINCT k-token
    gram hash with its document frequency — (g, doc_freq).  Persist it
    with a plain parquet write (8+8 bytes per distinct gram) and feed new
    batches to :func:`substring_spans_against_index`; append-merge of two
    indexes is ``union.groupBy(g).sum(doc_freq)`` (the counts are
    mergeable), same discipline as the exact-dedup digest index.

    Shuffle shape (round-8 optimization): gram hashes are DEDUPLICATED
    PER DOCUMENT map-side (array_distinct before the explode), so the
    aggregation is a plain count — partial counts combine before the
    exchange and ONE narrow (g, count) shuffle replaces the previous
    two-phase count_distinct (a (g, id)-keyed exchange of the whole gram
    stream followed by a second exchange on g).  A document contributes
    exactly once per distinct gram either way, so doc_freq is identical.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    from supersonic_spark.operators.core import ensure_parallelism

    base = ensure_parallelism(df).select(
        F.split(F.lower(F.trim(_c(text_col))), r"\s+").alias("__t")
    )
    n = F.size("__t")
    grams = F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k) + 1),
                lambda i: F.xxhash64(F.array_join(F.slice(F.col("__t"), i, k), " ")),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        base.select(F.explode(grams).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )


def substring_spans_against_index(
    new_df: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_df: int = 1,
) -> DataFrame:
    """Incremental substring decontamination: merged token spans of NEW
    documents covered by any k-token gram already present in the corpus
    index (``doc_freq >= min_df``).  The ingest-time twin of
    :func:`substring_dup_spans` — a new batch is checked against the
    standing corpus WITHOUT rescanning it, the same build-once/probe-many
    contract as the MinHash band index and the exact-dedup digest index.

    Scale shape: the new batch's grams explode and join the index on the
    8-byte gram hash (shuffled-hash; the index side is aggregate-derived —
    never let it broadcast-flip, see substring_dup_spans), then the window
    island merge runs per NEW doc only.  ``k`` must match the index's.
    """
    grams = _doc_grams(new_df, id_col, text_col, k)
    hits = index.filter(F.col("doc_freq") >= min_df).select("g")
    spans = grams.join(hits.hint("shuffle_hash"), "g").select(
        "__id", F.col("pos").alias("s"), (F.col("pos") + F.lit(k - 1)).alias("e")
    )
    return _merge_token_spans(spans, "__id", id_col)


# ------------------------------------------------- line-level boilerplate

def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_doc_frac: float | None = None,
    max_doc_count: int | None = None,
    sep: str = "\n",
) -> DataFrame:
    """Cross-document line-level boilerplate removal (the CCNet/RefinedWeb
    discipline): a line whose document frequency exceeds the cap is
    boilerplate (cookie banners, nav bars, license footers) and is dropped
    from every document; remaining lines are reassembled in order.

    Returns (id, text, n_lines, n_dropped) with ``id``/``text`` named after
    the input columns.  Exactly one of ``max_doc_frac`` (fraction of the
    corpus) / ``max_doc_count`` (absolute) must be given.  Rows with NULL
    text are dropped (posexplode of a NULL array emits nothing — same
    stance as the shingling operators).

    Scale shape (100 TB): lines explode once; document frequency is one
    hash aggregation keyed on the 8-byte line hash (per-doc repeats
    collapsed map-side by the distinct); the boilerplate set is tiny by
    construction (only lines in >cap of all documents) so it broadcasts
    back as a left join; reassembly is one groupBy per document.  No
    corpus-wide join on raw line text ever happens — the shuffle key is
    always the 64-bit hash.  Raw-line equality after hash equality is not
    re-verified (xxhash64 collisions ~2^-64 — same stance as exact_dedup).
    """
    import re as _re

    if (max_doc_frac is None) == (max_doc_count is None):
        raise ValueError("give exactly one of max_doc_frac / max_doc_count")
    # F.split takes a REGEX but reassembly uses ``sep`` literally — escape
    # so a separator like "." or "|" splits on the literal character
    lines = df.select(
        _c(id_col).alias("__id"),
        F.posexplode(F.split(_c(text_col), _re.escape(sep))).alias("__pos", "__line"),
    ).withColumn("__lh", F.xxhash64(F.trim(F.col("__line"))))
    docfreq = (
        lines.select("__id", "__lh").distinct()
        .groupBy("__lh").agg(F.count(F.lit(1)).alias("__df"))
    )
    if max_doc_count is not None:
        boiler = docfreq.filter(F.col("__df") > int(max_doc_count))
    else:
        # in-plan broadcast scalar (no driver action) for the corpus size
        n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
        boiler = docfreq.crossJoin(F.broadcast(n_docs)).filter(
            F.col("__df").cast("double")
            > F.lit(float(max_doc_frac)) * F.col("__n").cast("double")
        )
    flagged = lines.join(
        F.broadcast(boiler.select("__lh", F.lit(True).alias("__boiler"))),
        "__lh",
        "left",
    )
    kept_struct = F.when(
        F.col("__boiler").isNull(), F.struct(F.col("__pos"), F.col("__line"))
    )  # NULL for boilerplate rows -> collect_list skips them
    out = flagged.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.coalesce(
            F.sum(F.col("__boiler").cast("int")), F.lit(0)
        ).cast("long").alias("n_dropped"),
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["__line"]
            ),
        ).alias("__text"),
    )
    return out.select(
        F.col("__id").alias(id_col),
        F.col("__text").alias(text_col),
        "n_lines",
        "n_dropped",
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_doc_frac: float | None = None,
    max_doc_count: int | None = None,
) -> DataFrame:
    """Paragraph-granularity twin of :func:`line_dedup`: the unit of
    cross-document boilerplate removal is a blank-line-separated paragraph
    (multi-line disclaimers, repeated bios, licence blocks) instead of a
    single line.  Identical machinery — explode once, document-frequency
    on the 64-bit paragraph hash, broadcast the boilerplate set back,
    reassemble in order — at separator "\\n\\n"."""
    return line_dedup(
        df, id_col, text_col, max_doc_frac, max_doc_count, sep="\n\n"
    )


# ------------------------------------------------- semantic dedup (SemDeDup)

def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 16,
    threshold: float = 0.95,
    sample_size: int = 4096,
    iters: int = 10,
    staging_path: str | None = None,
) -> DataFrame:
    """Semantic deduplication over an embedding column: cluster the corpus
    with spherical k-means, then inside each cluster drop every vector that
    has a LOWER-ID neighbor with cosine ≥ ``threshold`` (keep-lowest-id
    rule).  This is the SemDeDup recipe (cluster first so the quadratic
    neighbor scan runs only within a cell, never corpus-wide).

    Returns (id, cell, dropped) for every input row: ``dropped`` marks the
    semantic duplicates to remove; keeping ``NOT dropped`` rows yields the
    deduplicated corpus.

    Scale shape (100 TB): centroids train driver-side on a bounded
    deterministic sample (similarity.ivf_train_centroids); assignment is
    one Arrow-batched matmul pass; the only corpus-wide shuffle keys on the
    cell id; pair work is quadratic ONLY within a cell, so n_cells is the
    knob that bounds per-task cost (SemDeDup's own argument).  Cross-cell
    near-dup pairs are missed by construction — that is the documented
    approximation, same trade as every clustered-ANN operator here.

    The keep-lowest-id rule is evaluated against ALL lower-id same-cell
    neighbors (not only kept ones), so a chain a~b~c with cos(a,c) below
    threshold still drops both b and c.  That matches the per-pair greedy
    of the paper's released implementation.

    The within-cell scan is a BLOCKED numpy Gram pass per cell
    (applyInPandas): sort the cell by id, normalize once, and compute
    row-block × lower-triangle cosine products as BLAS matmuls — exactly
    the paper implementation's per-cluster matmul shape.  The earlier
    within-cell SELF-JOIN version pushed ``cosine(a,b) >= t`` into the
    sort-merge-join predicate, where the dot-product fold evaluated
    INTERPRETED per candidate pair: at a synthesized sf10 (200k vectors,
    16 cells) that is ~1.25B interpreted 64-wide folds — observed as a
    single multi-hour join stage (jstack: ZipWith.eval inside
    SortMergeJoinEvaluator).  The Gram pass does the same pair work as
    float64 BLAS, ~100× the throughput, with NO pair shuffle at all —
    the only corpus-wide exchange is the groupBy on cell id.

    ``n_cells`` must scale with the corpus (SemDeDup's own argument): the
    per-cell cost is quadratic in cell size, so hold cell size roughly
    constant (corpus/n_cells ≈ 10³-10⁴) as data grows.  At ``n_cells ≥
    512`` assignment switches to the two-level quantizer
    (similarity.ivf_train_centroids_hier): flat assignment is
    ``N·n_cells·dim`` flops — quadratic in N once n_cells ∝ N — while the
    hierarchical pass is ``N·2√n_cells·dim``; same approximation class,
    and identical vectors still always share a cell.

    The cell assignment feeds the single groupBy; ``staging_path`` still
    materializes it as a parquet artifact first (survives the job,
    re-probe-able) when given.
    """
    import numpy as np
    import pandas as pd

    from supersonic_spark.operators.core import ensure_parallelism
    from supersonic_spark.pipeline.similarity import (
        _assign_cells_hier_udf,
        _assign_cells_udf,
        ivf_train_centroids,
        ivf_train_centroids_hier,
    )

    if n_cells >= 512:
        # n_cells scales with the corpus here, so FLAT assignment
        # (N·n_cells·dim flops) is asymptotically quadratic — measured as
        # exponent 1.6 at sf30 while every other family member held ~1.
        # Two-level assignment is N·2√n_cells·dim; the per-cell scan and
        # the keep-lowest-id rule are unchanged (identical vectors still
        # share a cell, so the oracle's planted-copy argument holds).
        c1, c2 = ivf_train_centroids_hier(
            df, id_col, vec_col, n_cells, sample_size=sample_size, iters=iters
        )
        assign = _assign_cells_hier_udf(c1, c2)
    else:
        cents = ivf_train_centroids(
            df, id_col, vec_col, n_cells, sample_size=sample_size, iters=iters
        )
        assign = _assign_cells_udf(cents, nprobe=1)
    base = ensure_parallelism(df).select(
        _c(id_col).alias("__id"), _c(vec_col).alias("__v")
    ).withColumn("__cell", assign("__v")[0])
    if staging_path is not None:
        base.write.mode("overwrite").parquet(staging_path)
        base = df.sparkSession.read.parquet(staging_path)

    thr = float(threshold)

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        m = len(pdf)
        V = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        dropped = np.zeros(m, dtype=bool)
        B = 1024  # bounds the Gram block at B × m doubles
        for s in range(0, m, B):
            e = min(s + B, m)
            G = Vn[s:e] @ Vn[:e].T
            for i in range(s, e):
                if i > 0:
                    dropped[i] = bool((G[i - s, :i] >= thr).any())
        return pd.DataFrame(
            {
                "__id": pdf["__id"],
                "cell": pdf["__cell"],
                "dropped": dropped,
            }
        )

    id_type = base.schema["__id"].dataType.simpleString()
    # Explicit partition count on the cell exchange (round-8): the cell
    # rows are byte-tiny but the per-cell Gram scan is CPU-quadratic, and
    # AQE's coalescing keys on BYTES — at sf0.1 it folded all cells into
    # ONE post-shuffle task and serialized the whole quadratic phase
    # (profiler: a 1-task 350 ms save stage).  A user partition count is
    # exempt from coalescing; defaultParallelism is cluster-derived (not
    # a local constant) and right for a CPU-bound stage, and the groupBy
    # reuses the same hashpartitioning so no second exchange appears.
    P = df.sparkSession.sparkContext.defaultParallelism
    out = base.repartition(P, "__cell").groupBy("__cell").applyInPandas(
        per_cell, f"__id {id_type}, cell int, dropped boolean"
    )
    return out.withColumnRenamed("__id", id_col)
