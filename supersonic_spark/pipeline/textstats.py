"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All pure JVM expressions (split/filter/aggregate/
regexp/xxhash64) — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny high-frequency stopword profiles for the n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "im", "zu"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"],
}


def tokens(text) -> Column:
    """Whitespace tokenization (array<string>)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(t), r"\s+")


def token_count(text) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text) -> Column:
    """BPE-approximating token count: words + punctuation marks counted
    separately (a whitespace+regex proxy for tokenizer-length budgeting)."""
    t = F.col(text) if isinstance(text, str) else text
    words = F.size(F.split(F.trim(t), r"\s+"))
    punct = F.length(F.regexp_replace(t, r"[^\.,;:!\?\(\)]", ""))
    return words + punct


def _stopword_hits(text_or_col, lang: str) -> Column:
    """Count tokens equal to a stopword.  One compiled-regex pass instead of
    a per-element higher-order-function filter (HOF lambdas are interpreted
    element-at-a-time — ~100× slower than codegen'd regexp_count here).
    A token is a maximal non-whitespace run, so ``(?:^|\\s)w(?=\\s|$)``
    matches exactly the tokens whose lowercase form equals ``w``; the
    lookahead keeps consecutive stopwords countable."""
    t = F.col(text_or_col) if isinstance(text_or_col, str) else text_or_col
    pat = r"(?:^|\s)(?:" + "|".join(STOPWORDS[lang]) + r")(?=\s|$)"
    return F.regexp_count(F.lower(F.trim(t)), F.lit(pat))


def stopword_ratio(text, lang: str = "en") -> Column:
    return _stopword_hits(text, lang).cast("double") / F.size(tokens(text)).cast("double")


def lang_id(text) -> Column:
    """Stopword-profile language guess: argmax of per-language hit ratios,
    'und' (undetermined) when no profile scores >0."""
    scores = {lang: _stopword_hits(text, lang) for lang in STOPWORDS}
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(STOPWORDS):  # deterministic tie-break: alphabetical
        s = scores[lang]
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def quality_features(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document quality features: char/word counts, mean word length,
    punctuation & digit & uppercase ratios, stopword ratio.  One projection;
    input is redistributed first when the source gives fewer splits than
    cores (regex work dominates the move)."""
    from supersonic_spark.operators.core import ensure_parallelism

    df = ensure_parallelism(df)
    t = F.col(text_col)
    words = tokens(text_col)
    n_chars = F.length(t)
    n_words = F.size(words)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        (n_chars.cast("double") / n_words.cast("double")).alias("mean_word_len"),
        (
            F.length(F.regexp_replace(t, r"[^\.,;:!\?]", "")).cast("double")
            / n_chars.cast("double")
        ).alias("punct_ratio"),
        (
            F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double")
            / n_chars.cast("double")
        ).alias("digit_ratio"),
        stopword_ratio(text_col, "en").alias("stopword_ratio_en"),
    )


#: reference weights for :func:`quality_classifier` — the shape a trained
#: linear quality model (fasttext-style, distilled to interpretable
#: features) would ship; deterministic so the oracle can replay them.
DEFAULT_QUALITY_WEIGHTS: dict[str, float] = {
    "mean_word_len": 0.6,
    "stopword_ratio_en": 6.0,
    "punct_ratio": -8.0,
    "digit_ratio": -10.0,
}


def quality_classifier(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: dict[str, float] | None = None,
    bias: float = -4.5,
    threshold: float = 0.5,
) -> DataFrame:
    """Model-based quality filtering (the pretraining-corpus 'classifier
    filter' stage): logistic score over :func:`quality_features` columns
    with supplied linear weights, plus the keep/drop decision.  Returns
    (id, quality_score, keep).

    This is the PLUMBING a learned quality model rides at 100 TB: features
    are one narrow JVM projection per document (no shuffle anywhere), the
    model is a handful of literals folded into codegen (a bigger learned
    model's weight vector would ride a broadcast instead — same plan
    shape), and the score is computed where the data lives.  The score is
    rounded to 6dp (exp differs across engines in the last ulp — the ln
    discipline used repo-wide), so the decision replays bit-for-bit in
    the oracle."""
    w = DEFAULT_QUALITY_WEIGHTS if weights is None else weights
    feats = quality_features(df, text_col, id_col)
    unknown = [k for k in w if k not in feats.columns]
    if unknown:
        raise ValueError(f"weights reference unknown features: {unknown}")
    z = F.lit(float(bias))
    for name, wt in sorted(w.items()):
        z = z + F.lit(float(wt)) * F.col(name)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return feats.select(
        F.col(id_col),
        score.alias("quality_score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


def quality_score(text) -> Column:
    """Scalar quality score in [0,1]: blend of length sanity, stopword
    presence and low punctuation noise (heuristic, deterministic)."""
    t = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(t).cast("double")
    len_ok = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    sw = stopword_ratio(t, "en")
    sw_ok = F.least(sw * 5.0, F.lit(1.0))
    punct = F.length(F.regexp_replace(t, r"[^\.,;:!\?]", "")).cast("double") / n_chars
    punct_ok = F.greatest(F.lit(1.0) - punct * 5.0, F.lit(0.0))
    return (len_ok * 0.4 + sw_ok * 0.4 + punct_ok * 0.2)


def doc_fingerprint(text, normalize: bool = True) -> Column:
    """64-bit content fingerprint for exact-dup detection at scale: hash of
    whitespace/case-normalized text (xxhash64; see
    supersonic_spark.functions.hashing_fn for the contract)."""
    t = F.col(text) if isinstance(text, str) else text
    if normalize:
        t = F.lower(F.regexp_replace(F.trim(t), r"\s+", " "))
    return F.xxhash64(t)


def vocab_counts(df: DataFrame, text_col: str, pattern: str = "[^a-z0-9]+") -> DataFrame:
    """Corpus vocabulary: token -> occurrence count ``n``.

    Tokenizes lowercase text on ``pattern`` (JVM split — no Python in the
    row path), explodes, drops empties, hash-aggregates.  Scale shape: the
    explode multiplies rows ~token_count×, but partial aggregation combines
    map-side before the single shuffle on token, so the exchange carries
    one (token, count) pair per distinct token per task — vocabulary-sized,
    not corpus-sized.
    """
    t = F.lower(F.col(text_col))
    tok = F.explode(F.split(t, pattern)).alias("token")
    out = df.select(tok).filter(F.col("token") != "")
    return out.groupBy("token").agg(F.count(F.lit(1)).alias("n"))


def vocab_topk(
    df: DataFrame, text_col: str, k: int, pattern: str = "[^a-z0-9]+"
) -> DataFrame:
    """Top-k vocabulary by count (ties broken by token, so the result is a
    deterministic set).  TakeOrderedAndProject keeps the sort at k rows per
    partition — no global sort of the vocabulary."""
    from supersonic_spark.operators.sort import SortKey, extended_sort

    return extended_sort(
        vocab_counts(df, text_col, pattern),
        [SortKey("n", ascending=False), SortKey("token")],
        limit=k,
    )


def tfidf(
    df: DataFrame, id_col: str, text_col: str, pattern: str = "[^a-z0-9]+"
) -> DataFrame:
    """Per-document TF-IDF: (id, token, tf, doc_freq, tfidf).

    tf = term count in the document; idf = ln((N+1)/(doc_freq+1)) + 1
    (smoothed, sklearn-style); tfidf rounded to 6dp (ln differs from other
    engines in the last ulp — the round makes scores portable/comparable).

    Scale shape: (doc, token) counts shuffle once on the pair; doc
    frequency is a vocabulary-sized rollup of that result (map-side
    combined); N is a 1-row broadcast; the idf join SHUFFLES on token with
    the vocabulary side shuffle-hash-hinted as the build.  The hint is a
    measured scale guard, not pessimism: Catalyst's post-aggregate size
    estimate for ``tf`` can undershoot the broadcast threshold and flip
    the CORPUS-sized side into the broadcast build — observed at the sf3
    synth corpus, where the 3.6M-row tf table was broadcast, the join +
    top-k window partial then executed inside the doc_freq stage that AQE
    had coalesced to ONE task for its 1,920 input rows (6.8 s serial;
    sf3 read SLOWER than sf10).  At 100 TB that plan is a driver OOM.
    SHJ keeps both sides shuffled on token (vocab per partition is small)
    and neither side ever collects to the driver.  No Python in the row
    path.
    """
    t = F.lower(F.col(text_col))
    tok = F.explode(F.split(t, pattern)).alias("token")
    pairs = df.select(F.col(id_col), tok).filter(F.col("token") != "")
    tf = pairs.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__n"))
    doc_freq = doc_freq.crossJoin(F.broadcast(n_docs))
    scored = tf.join(doc_freq.hint("shuffle_hash"), on="token")
    idf = F.log((F.col("__n") + F.lit(1.0)) / (F.col("doc_freq") + F.lit(1.0))) + F.lit(1.0)
    return scored.select(
        F.col(id_col), F.col("token"), F.col("tf"), F.col("doc_freq"),
        F.round(F.col("tf") * idf, 6).alias("tfidf"),
    )


def repetition_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition quality signals (Gopher-style filters for
    pretraining corpora): ``n_words``, ``top_word_frac`` (frequency share of
    the most common word), ``distinct_word_ratio``, and ``dup_2gram_frac``
    (fraction of word 2-grams that are repeats).  Highly repetitive docs —
    boilerplate, keyword stuffing, generation loops — score high on
    ``top_word_frac``/``dup_2gram_frac`` and low on ``distinct_word_ratio``.

    Scale shape: ZERO-SHUFFLE — every signal is a per-document statistic,
    so it evaluates as row-local array expressions (sort the word array,
    count adjacent changes for the distinct count, fold the longest equal
    run for the top-word count; same sorted-shift trick on the 2-gram
    array).  The previous explode→(doc,token) groupBy shape paid two
    corpus-wide exchanges for what is map-only work; this one is pure
    narrow projection (measured at sf0.1: 0.89 s → 0.35 s median, and the
    two shuffles are gone — the difference only grows with corpus size).
    The three folds are each a small expression tree (no wide-accumulator
    JIT risk; stable from run 1 in the A/B).
    """
    from supersonic_spark.operators.core import ensure_parallelism

    base = ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__w"),
    )
    ws = F.array_sort("__w")
    n = F.size("__w")
    # distinct count = 1 + adjacent inequalities in the sorted array
    neq = F.zip_with(
        F.slice(ws, 1, n - 1), F.slice(ws, 2, n - 1), lambda a, b: (a != b).cast("int")
    )
    n_distinct = F.when(
        n > 0, F.aggregate(neq, F.lit(1), lambda acc, x: acc + x)
    ).otherwise(F.lit(0))
    # top word count = longest equal run in the sorted array: fold carrying
    # (prev value, current run, best run)
    top = F.aggregate(
        ws,
        F.struct(
            F.lit(None).cast("string").alias("p"),
            F.lit(0).alias("r"),
            F.lit(0).alias("b"),
        ),
        lambda acc, x: F.struct(
            x.alias("p"),
            F.when(acc["p"].isNotNull() & (acc["p"] == x), acc["r"] + 1)
            .otherwise(F.lit(1))
            .alias("r"),
            F.greatest(
                acc["b"],
                F.when(acc["p"].isNotNull() & (acc["p"] == x), acc["r"] + 1).otherwise(
                    F.lit(1)
                ),
            ).alias("b"),
        ),
        lambda acc: acc["b"],
    )
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.col("__w")[i], F.col("__w")[i + 1]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    gs = F.array_sort(grams)
    gn = F.size(gs)
    gneq = F.zip_with(
        F.slice(gs, 1, gn - 1), F.slice(gs, 2, gn - 1), lambda a, b: (a != b).cast("int")
    )
    g_distinct = F.when(
        gn > 0, F.aggregate(gneq, F.lit(1), lambda acc, x: acc + x)
    ).otherwise(F.lit(0))
    nw = n.cast("double")
    return base.select(
        F.col("__id").alias(id_col),
        n.alias("n_words"),
        F.round(top.cast("double") / nw, 6).alias("top_word_frac"),
        F.round(n_distinct.cast("double") / nw, 6).alias("distinct_word_ratio"),
        F.round(
            F.when(
                gn > 0, F.lit(1.0) - g_distinct.cast("double") / gn.cast("double")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_2gram_frac"),
    )


#: PII patterns in the RE2 ∩ Java-regex common dialect (no lookarounds, no
#: backrefs) so Spark and any RE2-based oracle agree byte-for-byte.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d{3}[- ]\d{3}[- ]\d{4}",
}


def pii_counts(text) -> list[Column]:
    """Per-kind PII match counts (one compiled-regex pass each), aliased
    ``n_<kind>`` — the detection side of a redaction audit."""
    t = F.col(text) if isinstance(text, str) else text
    return [
        F.regexp_count(t, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat in sorted(PII_PATTERNS.items())
    ]


def pii_redact(text, replacement: str = "[PII]") -> Column:
    """Redact emails, IPv4 addresses, and phone numbers with
    ``replacement``.  Chained JVM regexp_replace — order matters: emails
    first (an email contains digit runs a later pattern could clip), then
    phones, then IPs.  No Python in the row path; at 100 TB this is a pure
    map stage with zero shuffle."""
    t = F.col(text) if isinstance(text, str) else text
    for kind in ("email", "phone", "ipv4"):
        t = F.regexp_replace(t, PII_PATTERNS[kind], replacement)
    return t


def tfidf_topk(
    df: DataFrame, id_col: str, text_col: str, k: int,
    pattern: str = "[^a-z0-9]+",
) -> DataFrame:
    """Top-k terms per document by TF-IDF (ties broken by token — a
    deterministic set).  One extra shuffle on the doc id for the ranking
    window; only k×docs rows survive it."""
    from supersonic_spark.operators.analytics import top_n_per_group

    scored = tfidf(df, id_col, text_col, pattern)
    return top_n_per_group(
        scored, id_col, [F.col("tfidf").desc(), F.col("token")], k
    ).drop("rn")


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str, pattern: str = "[^a-z0-9]+"
) -> DataFrame:
    """Per-document mean unigram log-probability under a corpus-trained
    unigram LM (a cheap KenLM-style fluency/quality proxy: gibberish and
    rare-token spam score low, typical text scores high).

    p(w) = (count(w) + 1) / (total + V) — add-one smoothed over the corpus
    itself; output ``avg_logprob`` = mean ln p(w) over the doc's tokens,
    rounded to 6dp (ln differs across engines in the last ulp).

    Scale shape: (doc, token) pairs shuffle once for per-doc counts; the
    corpus LM is a vocabulary-sized aggregate of that same result (map-side
    combined), joined back on token (AQE broadcasts it when small); the
    constants (total, V) ride a 1-row broadcast.  The per-doc average
    weights each token occurrence, so it aggregates tf * ln p(w) — no
    re-explode of the text.
    """
    t = F.lower(F.col(text_col))
    tok = F.explode(F.split(t, pattern)).alias("token")
    pairs = df.select(F.col(id_col), tok).filter(F.col("token") != "")
    tf = pairs.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    lm = tf.groupBy("token").agg(F.sum("tf").alias("c"))
    consts = lm.select(
        F.sum("c").alias("__total"), F.count(F.lit(1)).alias("__v")
    )
    lm = lm.crossJoin(F.broadcast(consts))
    logp = F.log(
        (F.col("c") + F.lit(1.0))
        / (F.col("__total").cast("double") + F.col("__v").cast("double"))
    )
    # vocab side shuffle-hash-hinted: never let a bad post-agg estimate
    # broadcast the corpus-sized tf side (see tfidf docstring)
    scored = tf.join(lm.hint("shuffle_hash"), on="token").groupBy(id_col).agg(
        F.round(
            F.sum(F.col("tf") * logp) / F.sum(F.col("tf")).cast("double"), 6
        ).alias("avg_logprob"),
        F.sum("tf").alias("n_tokens"),
    )
    return scored


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into token-budgeted overlapping chunks — the prep
    step before embedding or training-window assembly.  Output: (id,
    chunk_id, chunk_text, n_chunk_tokens); chunk ``i`` starts at token
    ``i * (chunk_tokens - overlap)`` and carries up to ``chunk_tokens``
    tokens, so consecutive chunks share ``overlap`` tokens.  Chunks are
    emitted while they contribute new tokens; a doc shorter than the budget
    yields exactly one chunk.

    Scale shape: a zero-shuffle map stage — split once into a materialized
    word array, build chunk texts with slice/array_join over a start-index
    sequence (JVM expressions), posexplode.  Row count multiplies by
    ~n_tokens/(chunk-overlap); no Python, no shuffle, parallel by input
    split.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    base = df.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__words"),
    )
    n = F.size("__words")
    starts = F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(step))
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(F.col("__words"), s, chunk_tokens), " ")
    )
    out = base.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text")
    )
    return out.withColumn(
        "n_chunk_tokens", F.size(F.split(F.col("chunk_text"), r"\s+"))
    )


def clean_text(
    text,
    lower: bool = True,
    collapse_ws: bool = True,
    strip_ctrl: bool = True,
) -> Column:
    """Canonical text cleaning for corpus ingest: strip C0/C1 control
    characters (keeping \\t \\n), collapse whitespace runs to single spaces,
    trim, optionally lowercase.  Pure JVM regexp chain — zero-shuffle map
    stage; the regex classes are in the RE2 ∩ Java dialect so oracles can
    replicate exactly.
    """
    t = F.col(text) if isinstance(text, str) else text
    if strip_ctrl:
        t = F.regexp_replace(t, r"[\x00-\x08\x0B-\x1F\x7F-\x9F]", "")
    if collapse_ws:
        t = F.trim(F.regexp_replace(t, r"\s+", " "))
    if lower:
        t = F.lower(t)
    return t


def bigram_logprob(
    df: DataFrame, id_col: str, text_col: str, pattern: str = "[^a-z0-9]+"
) -> DataFrame:
    """Per-document mean bigram conditional log-probability under a
    corpus-trained bigram LM — the next fluency rung above
    ``unigram_logprob`` (word-salad that passes a unigram screen fails
    here: p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V), add-one smoothed).

    Output: ``avg_bigram_logprob`` = mean ln p over the doc's bigrams
    (6dp — ln differs across engines in the last ulp) and ``n_bigrams``.
    Documents with fewer than two tokens have no bigrams and drop out.

    Scale shape: bigrams are built ARRAY-SIDE (one pass over the token
    array, no positional self-join); per-doc bigram tfs shuffle once; the
    corpus bigram LM and the w1 unigram counts are aggregates of that
    same pair stream, joined back by key (AQE broadcasts the vocabulary
    sides when small); (V) rides a 1-row broadcast.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), pattern), lambda x: x != F.lit("")
    )
    base = df.select(F.col(id_col), toks.alias("__t"))
    bgs = F.when(
        F.size("__t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__t") - 1),
            lambda i: F.concat(
                F.element_at("__t", i), F.lit(" "), F.element_at("__t", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = base.select(F.col(id_col), F.explode(bgs).alias("bg"))
    doc_tf = pairs.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("tf"))
    corpus_bg = doc_tf.groupBy("bg").agg(F.sum("tf").alias("cb"))
    unigrams = base.select(F.explode("__t").alias("w"))
    c1 = unigrams.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    consts = c1.agg(F.count(F.lit(1)).alias("__v"))
    # vocab sides shuffle-hash-hinted: never let a bad post-agg estimate
    # broadcast the corpus-sized doc_tf side (see tfidf docstring)
    scored = (
        doc_tf.join(corpus_bg.hint("shuffle_hash"), on="bg")
        .withColumn("w1", F.substring_index(F.col("bg"), " ", 1))
        .join(c1.withColumnRenamed("w", "w1").hint("shuffle_hash"), on="w1")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "__logp",
            F.log(
                (F.col("cb") + F.lit(1.0))
                / (F.col("c1") + F.col("__v")).cast("double")
            ),
        )
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("tf") * F.col("__logp")) / F.sum("tf").cast("double"), 6
            ).alias("avg_bigram_logprob"),
            F.sum("tf").alias("n_bigrams"),
        )
    )
    return scored
