"""Text-analysis operators for training-data pipelines: tokenization,
quality scoring, language-ID heuristic, fingerprinting, TF-IDF.

Everything is built from JVM-side `pyspark.sql.functions` (split/
transform/filter/aggregate) — no Python in the hot path — so the operators
whole-stage-codegen and scale linearly with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Tiny curated stopword lists for the language-ID heuristic. Real pipelines
# would ship per-language lists; the mechanism (token-overlap voting,
# all JVM-side) is what matters.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"],
    "es": ["el", "la", "de", "y", "en", "que", "los", "una", "por", "con"],
    "fr": ["le", "la", "de", "et", "en", "que", "les", "une", "pour", "avec"],
    "de": ["der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"],
}


def tokens(text_col) -> "F.Column":
    return F.split(text_col, " ")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens, n_uniq_tokens, uniq_ratio, avg_token_len columns."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    chars = F.length(F.col(text_col))
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "n_uniq_tokens": n_uniq,
            "uniq_ratio": F.round(n_uniq / n_tok * 1000, 0) / 1000,
            "avg_token_len": F.round((chars - n_tok + 1) / n_tok * 100, 0) / 100,
        }
    )


def stopword_hits(text_col, lang: str = "en") -> "F.Column":
    """Count of tokens that are stopwords of `lang` (JVM-side filter)."""
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(text_col), lambda t: t.isin(*words)))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]:
    length band, stopword density, vocabulary diversity."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    sw_ratio = stopword_hits(F.col(text_col)) / n_tok
    uniq_ratio = F.size(F.array_distinct(toks)) / n_tok
    len_ok = (F.length(F.col(text_col)) >= 50) & (F.length(F.col(text_col)) <= 10000)
    score = (
        F.when(len_ok, 0.4).otherwise(0.0)
        + F.least(sw_ratio * 2, F.lit(0.3))
        + F.least(uniq_ratio, F.lit(1.0)) * 0.3
    )
    return df.withColumn("quality", F.round(score * 1000, 0) / 1000)


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: per-language stopword-hit counts + argmax.
    Ties broken by language code order for determinism."""
    out = df
    for lang in sorted(STOPWORDS):
        out = out.withColumn(f"hits_{lang}", stopword_hits(F.col(text_col), lang))
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in sorted(STOPWORDS)])
    pred = F.coalesce(
        *[
            F.when(F.col(f"hits_{lang}") == best, F.lit(lang))
            for lang in sorted(STOPWORDS)
        ]
    )
    return out.withColumn("pred_lang", pred)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: full md5 + 16-hex-char normalized prefix
    (content-addressed key for storage/dedup)."""
    return df.withColumns(
        {
            "fp_md5": F.md5(F.col(text_col)),
            "fp_short": F.substring(F.md5(F.lower(F.col(text_col))), 1, 16),
        }
    )


def _term_stats(
    df: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared term-statistics construction for the lexical operators:
    postings ``tf(doc, term, tf)``, document frequency ``docfreq(term,
    df)``, and the 1-row ``n_docs`` scalar. One map-side-combined shuffle
    for tf; docfreq folds off it."""
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    return tf, docfreq, n_docs


def _smoothed_idf(docfreq: DataFrame, n_docs: DataFrame) -> DataFrame:
    """The ONE smoothed-idf spelling — ln((N+1)/(df+1)) + 1 — shared by
    tfidf() and bm25_topk()'s query-term selection (and mirrored verbatim
    in their DuckDB oracles)."""
    return docfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1).alias("idf"),
    )


def tfidf(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", top_per_doc: int = 3
) -> DataFrame:
    """DataFrame-native TF-IDF: tf = in-doc term count, idf =
    ln((N+1)/(df+1)) + 1 (smoothed); returns top terms per doc.

    Two shuffles total (term stats, per-doc window) regardless of corpus
    size; the doc-count scalar is broadcast via crossJoin of a 1-row agg.
    """
    tf, docfreq, n_docs = _term_stats(df, text_col, id_col)
    idf = _smoothed_idf(docfreq, n_docs)
    scored = tf.join(idf, "term").withColumn("tfidf", F.col("tf") * F.col("idf"))
    w = Window.partitionBy("doc").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_per_doc)
        .select(
            "doc",
            "term",
            "rnk",
            (F.round(F.col("tfidf") * 10000, 0) / 10000).alias("tfidf"),
        )
    )


def bm25_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_query_docs: int = 3,
    terms_per_query: int = 3,
    k: int = 5,
) -> DataFrame:
    """Okapi BM25 sparse retrieval (k1=1.2, b=0.75), query-by-example:
    the ``n_query_docs`` smallest doc ids become queries (their top
    ``terms_per_query`` TF-IDF terms), every corpus document is scored,
    and the top ``k`` per query return as (qdoc, doc, rnk, bm25).

    The sparse half of hybrid retrieval (dense ANN lives in
    ``operators/similarity.py``; fuse with ``l3_rrf_fusion``'s RRF).

    Scale shape — the inverted-index plan, not a per-query scan:
      * postings ``tf(doc, term)`` are built once (one map-side-combined
        shuffle) and the per-doc lengths ``dl`` fold off them;
      * the query-term table (n_query_docs × terms_per_query rows, with
        BM25 idf pre-joined) is BROADCAST, so matching postings is a
        map-only semi-join reduction — only postings of queried terms
        flow into scoring, the corpus never reshuffles per query;
      * per-(query, doc) scores sum INTEGER-quantized per-term
        contributions (round(score·1e4) as long) — exact, order-free,
        so the result hash-matches a sequential engine despite float
        addition being non-associative;
      * top-k per query is a window over the matched set only.
    At 100 TB, ``tf``/``dl``/``df`` are the persistent index tables a
    real system materializes once and reuses across query batches.

    Returns UNSORTED (like cosine_topk) — callers apply their own total
    ORDER BY; a terminal sort here would cost a dead range-exchange when
    the pool feeds a downstream join (the hybrid fusion).
    """
    tf, docfreq, n_docs = _term_stats(df, text_col, id_col)
    dl = tf.groupBy("doc").agg(F.sum("tf").alias("dl"))
    qd = df.select(F.col(id_col).alias("qdoc")).orderBy("qdoc").limit(n_query_docs)
    return _bm25_rank(tf, docfreq, n_docs, dl, qd, terms_per_query, k)


def _bm25_rank(
    tf: DataFrame,
    docfreq: DataFrame,
    n_docs: DataFrame,
    dl: DataFrame,
    qd: DataFrame,
    terms_per_query: int,
    k: int,
) -> DataFrame:
    """BM25 ranking core over term-statistics RELATIONS — the same code
    path whether the stats were just computed (`bm25_topk`) or loaded
    from persisted index artifacts (`operators/index.py` serve path), so
    build-then-serve cannot drift from build-and-score."""
    stats = dl.agg(
        (F.sum("dl") / F.count("*")).alias("avgdl")
    ).crossJoin(F.broadcast(n_docs))

    # Query-term selection = tfidf()'s scoring (shared idf helper).
    tfidf_idf = _smoothed_idf(docfreq, n_docs)
    q_scored = (
        tf.join(F.broadcast(qd), tf.doc == qd.qdoc)
        .join(tfidf_idf, "term")
        .withColumn("s", F.col("tf") * F.col("idf"))
    )
    wq = Window.partitionBy("qdoc").orderBy(F.col("s").desc(), F.col("term"))
    qterms = (
        q_scored.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= terms_per_query)
        .select("qdoc", "term")
    )

    # BM25 idf, pre-joined onto the (tiny) query-term table.
    bidf = docfreq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("bidf"),
    )
    qt = qterms.join(bidf, "term")

    matched = tf.join(F.broadcast(qt), "term").join(dl, "doc").crossJoin(
        F.broadcast(stats)
    )
    # Per-term contribution, micro-quantized to int64 (1e-4): the SUM over
    # a query's terms is then exact integer math in any order/engine.
    contrib = matched.select(
        "qdoc",
        "doc",
        F.round(
            F.col("bidf")
            * F.col("tf")
            * 2.2
            / (
                F.col("tf")
                + 1.2 * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
            )
            * 10000
        )
        .cast("long")
        .alias("c"),
    )
    scores = contrib.groupBy("qdoc", "doc").agg(F.sum("c").alias("ci"))
    wr = Window.partitionBy("qdoc").orderBy(F.col("ci").desc(), F.col("doc"))
    return (
        scores.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= k)
        .select(
            "qdoc",
            "doc",
            "rnk",
            (F.col("ci") / F.lit(10000.0)).alias("bm25"),
        )
    )


# PII patterns kept inside the RE2 ∩ Java-regex common subset (no
# backrefs/lookaround) so the DuckDB oracle runs the IDENTICAL patterns.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace email/phone/IPv4 literals with typed placeholders — the
    standard pre-training scrub pass, entirely JVM-side regexp_replace
    (one codegen'd projection, no Python). Adds `<col>_redacted` plus a
    per-kind hit count so the scrub is auditable."""
    out = F.col(text_col)
    counts = {}
    for kind, pat in PII_PATTERNS.items():
        # counts are measured on the ORIGINAL text (the audit contract);
        # replacements chain, but the placeholders contain no pattern-able
        # characters so order cannot create or destroy matches
        counts[f"n_{kind}"] = F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
        ).cast("bigint")
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return df.withColumns({f"{text_col}_redacted": out, **counts})


def rebalance_by(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified downsampling: cap each group at ≈``cap``
    rows by keeping ids whose md5 prefix falls under the group's keep
    fraction — the language-rebalancing pass of a training-data pipeline
    (shrink over-represented strata, keep small ones whole).

    Mechanics: per-group keep fraction f = min(1, cap/count) maps to an
    8-hex-char threshold (floor(f·2³²), floored at 1 so no stratum is
    ever silently emptied — 2 hex chars would zero out any stratum past
    256·cap rows, exactly the over-represented stratum this operator
    targets); a row survives iff substr(md5(id),1,8) < threshold.
    Engine-agnostic (no RNG), stable under corpus growth for fixed
    counts, and the group-count relation is tiny (one row per stratum)
    so it broadcasts — the corpus itself never shuffles, it's scan +
    broadcast-join + filter. The cap is approximate (hash-binomial
    around f·count), which is the standard contract for hash sampling."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("__cnt"))
    frac = F.least(F.lit(1.0), F.lit(float(cap)) / F.col("__cnt"))
    thresholds = counts.select(
        group_col,
        "__cnt",
        F.lpad(
            F.lower(F.hex(
                F.greatest(F.lit(1), F.floor(frac * 4294967296).cast("long"))
            )),
            8, "0",
        ).alias("__thr"),
    )
    joined = df.join(F.broadcast(thresholds), group_col)
    return joined.filter(
        (F.col("__cnt") <= cap)
        | (F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
           < F.col("__thr"))
    ).drop("__cnt", "__thr")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    thresholds: tuple[str, str] = ("cc", "e6"),
) -> DataFrame:
    """Deterministic train/val/test assignment by md5(id) prefix: hex
    digests are uniform, so string-comparing the first two hex chars
    against thresholds splits ≈ 80/10/10 ('cc' = 204/256, 'e6' = 230/256)
    identically in ANY engine — no engine-specific hash function, no RNG,
    stable under corpus growth (a doc's split never changes when other
    docs arrive, unlike row_number()-based splits)."""
    h = F.md5(F.col(id_col).cast("string"))
    lo, hi = thresholds
    return df.withColumn(
        "split",
        F.when(F.substring(h, 1, 2) < lo, "train")
        .when(F.substring(h, 1, 2) < hi, "val")
        .otherwise("test"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style intra-document repetition signals: duplicate-word
    fraction, duplicate-bigram fraction, and top-bigram fraction (the
    share of the document taken by its single most frequent bigram).

    Shape (third attempt, each measured at sf0.1 — see BASELINE.md):
    positions explode FIRST and the bigram is built by row-level
    `slice`/`concat_ws` inside whole-stage codegen (the proven
    `dedup.shingle_hashes` shape), then two partial-agg'd groupBys:
    (doc, gram) -> multiplicity, then doc -> (distinct grams, max
    multiplicity). The word-level stats ride along as per-row columns
    (`array_distinct` is a native collection expression, not a lambda).

    Rejected shapes: per-row `transform`/`aggregate` HOFs evaluate
    INTERPRETED (~3 µs/element) — a 4-reference output schema re-ran the
    gram lambda per reference via CollapseProject inlining (6.2 s warm),
    and even the single-fold form paid ~1.5 s per HOF pass (3.9 s). The
    codegen explode runs ~1.3 s fresh-plan warm; its first shuffle
    carries one row per distinct (doc, gram) per partition after
    map-side combine, the second one row per doc — both far below
    corpus token count.

    Docs shorter than 2 words get one truncated "bigram" (the
    `greatest(..., 1)` guard, same shape as `dedup.word_shingles`).
    """
    words = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col).alias("doc"),
        words.alias("__w"),
        F.size(words).alias("wtotal"),
        F.size(F.array_distinct(words)).alias("wuniq"),
    )
    grams = base.select(
        "doc",
        "__w",
        "wtotal",
        "wuniq",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.col("wtotal") - 1, F.lit(1))
            )
        ).alias("__i"),
    ).select(
        "doc",
        "wtotal",
        "wuniq",
        F.concat_ws(" ", F.slice(F.col("__w"), F.col("__i"), 2)).alias("g"),
    )
    per_gram = grams.groupBy("doc", "g").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("wtotal").alias("wtotal"),
        F.first("wuniq").alias("wuniq"),
    )
    per_doc = per_gram.groupBy("doc").agg(
        F.count(F.lit(1)).alias("guniq"),
        F.max("n").alias("topn"),
        F.first("wtotal").alias("wtotal"),
        F.first("wuniq").alias("wuniq"),
    )

    def _r4(c):
        return F.floor(c * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)

    gtotal = F.greatest(F.col("wtotal") - 1, F.lit(1))
    return per_doc.select(
        F.col("doc").alias(id_col),
        _r4(F.lit(1.0) - F.col("wuniq") / F.col("wtotal")).alias("dup_word_frac"),
        _r4(F.lit(1.0) - F.col("guniq") / gtotal).alias("dup_2gram_frac"),
        _r4(F.col("topn") / gtotal).alias("top_2gram_frac"),
    )


def oov_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 20,
) -> DataFrame:
    """Vocabulary-coverage quality signal (CCNet-style): per-document
    token count and out-of-vocabulary fraction against the corpus's own
    top-`vocab_size` words.

    Two passes, both scale-shaped: (1) corpus word counts — explode +
    groupBy(word) runs map-side partial aggregation, so the shuffle
    carries one row per distinct word per partition (vocabularies are
    tiny next to corpora); the top-K cut is a total order (count DESC,
    word) so ties break deterministically. (2) the corpus tokens
    broadcast-left-join the K-row vocab and aggregate per doc — again
    partial-agg'd, so the doc_id shuffle is ~one row per doc. Nothing is
    collected; all counts are exact integers.
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("t"),
    )
    vocab = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "t")
        .limit(vocab_size)
        .select("t", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("oov"),
        )
        .select(
            "doc",
            "total",
            "oov",
            (
                F.floor(F.col("oov") / F.col("total") * F.lit(10000.0) + F.lit(0.5))
                / F.lit(10000.0)
            ).alias("oov_frac"),
        )
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into fixed-size token chunks with overlap
    (`stride` < `chunk_size`) — the context-window splitter that feeds
    sequence packing in a pre-training pipeline. The partial tail chunk
    is kept; a doc shorter than `chunk_size` yields one chunk.

    Scale shape: chunk-start positions explode codegen'd (the
    `shingle_hashes` pattern — no interpreted lambdas) and the chunk is
    a row-level `slice`/`concat_ws`; output volume is input tokens ×
    (chunk_size/stride) overlap factor, produced map-only with no
    shuffle before the caller's ordering/sink.
    """
    words = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col), words.alias("__w"), F.size(words).alias("__sz")
    )
    # greatest(..., 0): a doc shorter than chunk_size - stride makes the
    # ceil negative, and Spark's sequence(0, -1) is DESCENDING [0, -1] —
    # the clamp gives every doc exactly one (possibly partial) chunk
    n_chunks_minus_1 = F.greatest(
        F.ceil((F.col("__sz") - F.lit(chunk_size)) / F.lit(float(stride))),
        F.lit(0),
    )
    exploded = base.select(
        F.col(id_col),
        F.col("__w"),
        F.explode(F.sequence(F.lit(0), n_chunks_minus_1)).alias("chunk_id"),
    )
    chunk = F.concat_ws(
        " ",
        F.slice(
            F.col("__w"),
            F.col("chunk_id") * F.lit(stride) + F.lit(1),
            chunk_size,
        ),
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        chunk.alias("chunk"),
        F.size(F.split(chunk, " ")).alias("n_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Deterministic sequence packing: assign token chunks to fixed-budget
    bins (training context windows) by contiguous fill.

    Chunks are hash-sharded on the doc key, totally ordered within a
    shard by (doc, chunk), and assigned to `bin_id = floor(start /
    budget)` where start is the running token offset — the
    concat-then-split packing convention (a chunk that straddles a
    boundary belongs to the bin where it starts, so a bin's fill lands in
    [budget - chunk + 1, budget + chunk - 1]).

    Scale shape: packing is inherently sequential, so the shard IS the
    parallelism unit — `n_shards` independent running-sum windows, one
    shuffle total, results independent of cluster layout (the order is
    data-defined, not partition-defined). Pick n_shards ≈ cluster cores;
    at 100 TB each shard's window is a streaming pass, no materialized
    state beyond the running sum.

    Sharding is `doc mod n_shards` — engine-portable integer math
    (dense ids spread uniformly; for skewed/sparse keys hash the id
    into a surrogate first).
    """
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col, chunk_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    start = cum - F.col(tokens_col)
    return (
        chunks.withColumn("shard", shard)
        .withColumn("__start", start)
        .select(
            id_col,
            chunk_col,
            "shard",
            F.floor(F.col("__start") / F.lit(float(budget))).alias("bin_id"),
            (F.col("__start") % F.lit(budget)).alias("bin_offset"),
            F.col(tokens_col),
        )
    )


def curate_top_quality(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-based curation: keep the top-`k` documents per stratum by
    the composite quality score — the pruning pass between scoring and
    training-set assembly.

    Ranking uses the ROUNDED (3-dp) score with the id as tie-break, so
    the cut is deterministic and engine-agnostic (raw float ordering
    would make the boundary doc depend on summation ulps). One shuffle
    on the stratum key; the window is a per-partition top-k heap.
    """
    scored = quality_score(df, text_col)
    w = Window.partitionBy(strata_col).orderBy(
        F.col("quality").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(strata_col, id_col, "rnk", "quality")
    )
