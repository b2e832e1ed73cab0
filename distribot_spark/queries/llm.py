"""LLM-data-pipeline declared queries (SURVEY.md §2B L1–L6 + text analysis).

Each entry runs a real operator from ``distribot_spark.operators`` and,
where the semantics are SQL-expressible, carries a DuckDB oracle. The
approximate operators (MinHash LSH, sign-LSH ANN) are *exact-verified*
(candidates re-checked with true Jaccard/cosine), so at the planted-
duplicate similarity regime (j ≥ 0.89 → LSH recall ≈ 1) they are
oracle-checkable against the exact baselines; the pure-approx variants
stay rows-only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distribot_spark.catalog import load_table
from distribot_spark.session import local_rows_df
from distribot_spark.operators import (
    components,
    dedup,
    multimodal,
    similarity,
    text,
)
from distribot_spark.operators.bloom import position_sql as _bloom_position_sql
from distribot_spark.queries.registry import QUERIES, register

# Shared oracle fragments -----------------------------------------------------

_JACCARD_ORACLE = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id AS doc,
                  unnest([array_to_string(w[i:i+2], ' ')
                          FOR i IN range(1, len(w) - 1)]) AS s
           FROM t),
    dd AS (SELECT DISTINCT doc, s FROM sh),
    sz AS (SELECT doc, COUNT(*) AS n FROM dd GROUP BY doc),
    pairs AS (SELECT a.doc AS da, b.doc AS db, COUNT(*) AS inter
              FROM dd a JOIN dd b ON a.s = b.s AND a.doc < b.doc
              GROUP BY 1, 2)
    SELECT da, db,
           ROUND(inter / (sa.n + sb.n - inter) * 1000) / 1000 AS jaccard
    FROM pairs JOIN sz sa ON da = sa.doc JOIN sz sb ON db = sb.doc
    WHERE inter / (sa.n + sb.n - inter) >= 0.5
    ORDER BY da, db
"""

_COSINE_EXPR = """
      list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * v[i]))
      / (sqrt(list_sum(list_transform(qv, x -> x * x)))
         * sqrt(list_sum(list_transform(v, x -> x * x))))
"""


def _rrf_oracle_tail(pool_a: str, pool_b: str, ra: str, rb: str, alias: str) -> str:
    """Oracle twin of ``similarity.rrf_fuse``: the ONE reciprocal-rank
    fusion SQL spelling (c=60, 1e-6 terminal rounding, top-5, a-then-b
    addition order, nid tie-break) over two rank CTEs."""
    return f"""fused AS (
      SELECT COALESCE(a.qid, b.qid) AS qid,
             COALESCE(a.nid, b.nid) AS nid,
             COALESCE(1.0 / (60 + a.{ra}), 0)
           + COALESCE(1.0 / (60 + b.{rb}), 0) AS score
      FROM {pool_a} a FULL JOIN {pool_b} b
        ON a.qid = b.qid AND a.nid = b.nid),
    top AS (SELECT qid, nid,
                   ROUND(score * 1000000) / 1000000 AS {alias},
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY score DESC, nid) AS rnk
            FROM fused QUALIFY rnk <= 5)
    SELECT qid, nid, rnk, {alias} FROM top ORDER BY qid, rnk"""


# ---------------------------------------------------------------------------
# L1: exact dedup
# ---------------------------------------------------------------------------


@register(
    "l1_exact_dedup",
    oracle="""
    SELECT MIN(doc_id) AS doc_id FROM documents
    GROUP BY md5(text) ORDER BY doc_id
    """,
    tags=("llm", "dedup"),
)
def l1_exact_dedup(spark, sf_dir):
    """Exact dedup: keep the min doc_id per md5(text) group."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup.exact_dedup(docs, "text", "doc_id").select("doc_id").orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# L2: near-dup — MinHash LSH (exact-verified) + exact Jaccard baseline
# ---------------------------------------------------------------------------


@register("l2_minhash_pairs", oracle=_JACCARD_ORACLE, tags=("llm", "dedup", "lsh"))
def l2_minhash_pairs(spark, sf_dir):
    """MinHash(128) + 32-band LSH candidates, exact-verified at j ≥ 0.5.
    Oracle = the exact 3-gram Jaccard pair query (planted dups are
    j ≥ 0.89 where the LSH s-curve passes with P ≈ 1)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup.minhash_candidate_pairs(docs, "text", "doc_id", threshold=0.5)
        .orderBy("da", "db")
    )


@register("l2_jaccard_exact", oracle=_JACCARD_ORACLE, tags=("llm", "dedup"))
def l2_jaccard_exact(spark, sf_dir):
    """Exact 3-gram Jaccard pairs ≥ 0.5 (the O(n²)-bounded baseline)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(docs, "text", "doc_id", threshold=0.5).orderBy(
        "da", "db"
    )


@register(
    "dedup_clusters",
    oracle="""
    WITH RECURSIVE
    t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id AS doc,
                  unnest([array_to_string(w[i:i+2], ' ')
                          FOR i IN range(1, len(w) - 1)]) AS s
           FROM t),
    dd AS (SELECT DISTINCT doc, s FROM sh),
    sz AS (SELECT doc, COUNT(*) AS n FROM dd GROUP BY doc),
    pr AS (SELECT a.doc AS da, b.doc AS db, COUNT(*) AS inter
           FROM dd a JOIN dd b ON a.s = b.s AND a.doc < b.doc
           GROUP BY 1, 2),
    p AS (SELECT da, db FROM pr JOIN sz sa ON da = sa.doc
          JOIN sz sb ON db = sb.doc
          WHERE inter / (sa.n + sb.n - inter) >= 0.5),
    e AS (SELECT da AS src, db AS dst FROM p
          UNION SELECT db, da FROM p),
    reach(src, dst) AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
    comp AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
             FROM reach GROUP BY src)
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           doc_id = cluster_id AS is_canonical
    FROM comp ORDER BY doc_id
    """,
    tags=("llm", "dedup", "components"),
)
def dedup_clusters(spark, sf_dir):
    """Duplicate CLUSTERS, not just pairs: near-dup pairs grouped by
    connected components (min-label propagation, operators/components.py)
    with the canonical doc = min id per cluster. Pairs come from the
    minhash-LSH + exact-verify path — the production composition. The
    exact verification removes every false positive; RECALL is the LSH
    s-curve's: ≈1 for the testdata's planted dups (j ≥ 0.89 ⇒ miss prob
    ~1e-13 at b=32/r=4) but only ~0.87 for a hypothetical j = 0.5 pair,
    the same regime contract as l2_minhash_pairs' oracle. The oracle
    reproduces the closure with a recursive CTE over the exact Jaccard
    pairs — a full hash check of an iterative distributed algorithm."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_candidate_pairs(docs, "text", "doc_id", threshold=0.5)
    return components.duplicate_clusters(pairs).orderBy("doc_id")


@register("dedup_simhash", oracle=None, tags=("llm", "dedup", "simhash"))
def dedup_simhash(spark, sf_dir):
    """SimHash-64 near-dup pairs (hamming ≤ 3) via pigeonhole band join.
    Rows-only: signature bit votes aren't SQL-expressible in the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, "text", "doc_id", max_hamming=3).orderBy(
        "da", "db"
    )


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    a AS (SELECT vec_id AS da, v AS qv FROM e),
    b AS (SELECT vec_id AS db, v FROM e),
    pairs AS (SELECT da, db, {_COSINE_EXPR} AS cos
              FROM a, b WHERE da < db)
    SELECT da, db, ROUND(cos * 10000) / 10000 AS cos
    FROM pairs WHERE cos >= 0.45 ORDER BY da, db
    """,
    tags=("llm", "dedup", "embedding"),
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup pairs at cos ≥ 0.45 — the exact O(n²) ORACLE
    BASELINE for `dedup_embedding_lsh`; never run this variant at corpus
    scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs(emb, 0.45).orderBy("da", "db")


@register(
    "dedup_embedding_blocked",
    oracle=f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    a AS (SELECT vec_id AS da, v AS qv FROM e),
    b AS (SELECT vec_id AS db, v FROM e),
    pairs AS (SELECT da, db, {_COSINE_EXPR} AS cos
              FROM a, b WHERE da < db)
    SELECT da, db, ROUND(cos * 10000) / 10000 AS cos
    FROM pairs WHERE cos >= 0.45 ORDER BY da, db
    """,
    tags=("llm", "dedup", "embedding", "blocked"),
)
def dedup_embedding_blocked(spark, sf_dir):
    """EXACT embedding near-dup pairs at cos ≥ 0.45 via block-nested-loop
    matmul (`similarity.blocked_cosine_pairs`) — the scale path for the
    mid-threshold regime where sign-LSH cannot prune: B(B+1)/2 block-pair
    tasks, one BLAS matmul each, shuffle O(n·B) not O(n²). Exact, so it
    shares the brute-force oracle and is fully hash-certified."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.blocked_cosine_pairs(emb, 0.45).orderBy("da", "db")


@register(
    "dedup_embedding_lsh", oracle=None, tags=("llm", "dedup", "embedding", "lsh")
)
def dedup_embedding_lsh(spark, sf_dir):
    """Embedding near-dup pairs at cos ≥ 0.45 via sign-LSH bucketing +
    exact re-rank — the production path (equi-joins only, no cross join;
    candidate volume ~ n_tables·n²/2^n_planes). Recall vs the exact
    baseline is asserted in tests/test_operators.py; rows-only checked by
    the driver (LSH recall < 1 by construction, so no hash oracle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_cosine_pairs(emb, 0.45).orderBy("da", "db")


# ---------------------------------------------------------------------------
# L3: similarity search
# ---------------------------------------------------------------------------


@register(
    "l3_topk_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
    c AS (SELECT vec_id AS nid, v FROM e WHERE vec_id >= 10),
    pairs AS (SELECT qid, nid, {_COSINE_EXPR} AS cos FROM q, c),
    r AS (SELECT qid, nid, cos,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
          FROM pairs)
    SELECT qid, nid, rnk, ROUND(cos * 10000) / 10000 AS cos
    FROM r WHERE rnk <= 5 ORDER BY qid, rnk
    """,
    tags=("llm", "similarity"),
)
def l3_topk_cosine(spark, sf_dir):
    """Exact brute-force cosine top-5 for the first 10 query vectors
    (broadcast queries × corpus scan, window top-k)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    return similarity.cosine_topk(corpus, queries, k=5).orderBy("qid", "rnk")


@register("l3_lsh_topk", oracle=None, tags=("llm", "similarity", "lsh"))
def l3_lsh_topk(spark, sf_dir):
    """Sign-LSH bucketed ANN top-5 (the 100 TB path); recall vs the exact
    baseline is asserted in tests, not hash-checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    return similarity.lsh_topk(corpus, queries, k=5).orderBy("qid", "rnk")


@register("l3_ivf_topk", oracle=None, tags=("llm", "similarity", "ivf"))
def l3_ivf_topk(spark, sf_dir):
    """IVF (cluster-pruned) ANN top-5: sample-trained spherical k-means
    centroids, corpus assigned once to its nearest centroid, queries probe
    their n_probe nearest clusters and re-rank exactly within them. Probed
    fraction ≈ n_probe/n_clusters of the corpus per query. Approximate by
    construction (no hash oracle); tests assert recall vs the exact
    baseline AND exact equality at n_probe == n_clusters."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    return similarity.ivf_topk(
        corpus, queries, k=5, n_clusters=16, n_probe=4
    ).orderBy("qid", "rnk")


# ---------------------------------------------------------------------------
# Intra-document repetition (Gopher-style quality signals)
# ---------------------------------------------------------------------------


@register(
    "doc_repetition",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (SELECT doc_id, unnest([array_to_string(w[i:i+1], ' ')
                FOR i IN range(1, len(w))]) AS g FROM w),
    c AS (SELECT doc_id, g, COUNT(*) AS n FROM g GROUP BY doc_id, g),
    s AS (SELECT doc_id, SUM(n) AS gtotal, COUNT(*) AS guniq, MAX(n) AS topn
          FROM c GROUP BY doc_id),
    u AS (SELECT doc_id, len(w) AS wtotal, len(list_distinct(w)) AS wuniq
          FROM w)
    SELECT doc_id,
           FLOOR((1.0 - wuniq * 1.0 / wtotal) * 10000 + 0.5) / 10000
             AS dup_word_frac,
           FLOOR((1.0 - guniq * 1.0 / gtotal) * 10000 + 0.5) / 10000
             AS dup_2gram_frac,
           FLOOR(topn * 1.0 / gtotal * 10000 + 0.5) / 10000
             AS top_2gram_frac
    FROM s JOIN u USING (doc_id) ORDER BY doc_id
    """,
    tags=("llm", "quality"),
)
def doc_repetition(spark, sf_dir):
    """Intra-document repetition quality signals (duplicate-word /
    duplicate-bigram / top-bigram fractions) — codegen'd position-explode
    + partial-agg'd groupBys in Spark, like the oracle's shape. Counts
    are exact ints; ratios are double divisions in the same order with
    HALF_UP rounding spelled identically in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    return text.repetition_stats(docs).orderBy("doc_id")


@register(
    "doc_chunks",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    c AS (SELECT doc_id,
                 unnest(range(0,
                     GREATEST(CAST(ceil((len(w) - 32) / 24.0) AS BIGINT),
                              0) + 1)) AS ck
          FROM w),
    j AS (SELECT c.doc_id, ck,
                 array_to_string(w[ck*24 + 1 : ck*24 + 32], ' ') AS chunk
          FROM c JOIN w ON c.doc_id = w.doc_id)
    SELECT doc_id, ck AS chunk_id, chunk,
           len(string_split(chunk, ' ')) AS n_tokens
    FROM j ORDER BY doc_id, chunk_id
    """,
    tags=("llm", "chunking"),
)
def doc_chunks(spark, sf_dir):
    """Context-window chunking: 32-token chunks at stride 24 (8-token
    overlap), partial tail kept — the splitter feeding sequence packing.
    Codegen'd position explode, map-only; hash-oracled (pure string/int
    ops, no floats)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        text.chunk_tokens(docs, chunk_size=32, stride=24)
        .orderBy("doc_id", "chunk_id")
    )


@register(
    "doc_pack",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    c AS (SELECT doc_id,
                 unnest(range(0,
                     GREATEST(CAST(ceil((len(w) - 32) / 24.0) AS BIGINT),
                              0) + 1)) AS ck
          FROM w),
    j AS (SELECT c.doc_id, ck AS chunk_id,
                 len(string_split(
                     array_to_string(w[ck*24 + 1 : ck*24 + 32], ' '), ' '))
                   AS n_tokens
          FROM c JOIN w ON c.doc_id = w.doc_id),
    s AS (SELECT doc_id, chunk_id, n_tokens,
                 CAST(doc_id % 8 AS INT) AS shard,
                 SUM(n_tokens) OVER (PARTITION BY doc_id % 8
                                     ORDER BY doc_id, chunk_id
                                     ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS start
          FROM j)
    SELECT doc_id, chunk_id, shard,
           CAST(FLOOR(start / 64.0) AS BIGINT) AS bin_id,
           CAST(start % 64 AS BIGINT) AS bin_offset, n_tokens
    FROM s ORDER BY doc_id, chunk_id
    """,
    tags=("llm", "packing"),
)
def doc_pack(spark, sf_dir):
    """Sequence packing of the doc_chunks output into 64-token training
    bins: 8 hash shards, contiguous fill, deterministic independent of
    cluster layout. One shuffle (the shard window); all integer math."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = text.chunk_tokens(docs, chunk_size=32, stride=24)
    return (
        text.pack_chunks(chunks, budget=64, n_shards=8)
        .orderBy("doc_id", "chunk_id")
    )


@register(
    "dedup_tf_cosine",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                 FROM documents),
    tf AS (SELECT doc_id, t, COUNT(*) AS f FROM tok GROUP BY doc_id, t),
    nrm AS (SELECT doc_id, SUM(f * f) AS n2 FROM tf GROUP BY doc_id),
    dots AS (SELECT a.doc_id AS da, b.doc_id AS db, SUM(a.f * b.f) AS dot
             FROM tf a JOIN tf b ON a.t = b.t AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
    cosd AS (SELECT da, db, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cos
             FROM dots JOIN nrm na ON da = na.doc_id
                       JOIN nrm nb ON db = nb.doc_id)
    SELECT da, db, FLOOR(cos * 10000 + 0.5) / 10000 AS cos
    FROM cosd WHERE cos >= 0.99 ORDER BY da, db
    """,
    tags=("llm", "dedup", "sparse"),
)
def dedup_tf_cosine(spark, sf_dir):
    """Lexical near-dup pairs at TF-vector cosine ≥ 0.99 via the
    inverted-index self-join (similarity.tf_cosine_pairs). Exact and
    hash-oracled: dots/norms are integer sums (order-free); only the
    final cos is floating, composed deterministically from them."""
    docs = load_table(spark, sf_dir, "documents")
    return similarity.tf_cosine_pairs(docs, 0.99).orderBy("da", "db")


@register(
    "doc_oov_rate",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    tok AS (SELECT doc_id, unnest(w) AS t FROM w),
    vc AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
    vocab AS (SELECT t FROM vc ORDER BY n DESC, t LIMIT 20),
    s AS (SELECT doc_id, COUNT(*) AS total,
                 CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS oov
          FROM tok LEFT JOIN vocab v USING (t) GROUP BY doc_id)
    SELECT doc_id, total, oov,
           FLOOR(oov * 1.0 / total * 10000 + 0.5) / 10000 AS oov_frac
    FROM s ORDER BY doc_id
    """,
    tags=("llm", "quality"),
)
def doc_oov_rate(spark, sf_dir):
    """Vocabulary-coverage filter: per-doc out-of-vocabulary fraction
    against the corpus's own top-20 words (deterministic tie-break
    count DESC, word). Both passes partial-aggregate map-side; the K-row
    vocab broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        text.oov_stats(docs, vocab_size=20)
        .select(F.col("doc").alias("doc_id"), "total", "oov", "oov_frac")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


@register(
    "doc_decontaminate",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (SELECT doc_id, unnest([array_to_string(w[i:i+4], ' ')
                FOR i IN range(1, len(w) - 3)]) AS g FROM w),
    probe AS (SELECT DISTINCT g FROM g WHERE doc_id < 20),
    corp AS (SELECT DISTINCT doc_id, g FROM g WHERE doc_id >= 20)
    SELECT c.doc_id, COUNT(*) AS n_hits
    FROM corp c JOIN probe p USING (g)
    GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm", "decontamination"),
)
def doc_decontaminate(spark, sf_dir):
    """Decontamination: corpus documents sharing any distinct word 5-gram
    with the probe set (doc_id < 20 stands in for a benchmark suite),
    with the shared-gram count. Probe grams broadcast; the corpus is
    map-only until the probe join, so only contamination hits shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") < 20)
    corpus = docs.filter(F.col("doc_id") >= 20)
    return (
        dedup.contamination_hits(corpus, probes, "text", "doc_id", n=5)
        .select(F.col("doc").alias("doc_id"), "n_hits")
        .orderBy("doc_id")
    )


@register(
    "emb_norm_audit",
    oracle="""
    WITH e AS (SELECT vec_id,
                      sqrt(list_sum(list_transform(embedding,
                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        AS nrm
               FROM embeddings)
    SELECT CAST(FLOOR(nrm * 10) AS BIGINT) AS bucket, COUNT(*) AS n_vecs,
           FLOOR(MIN(nrm) * 10000 + 0.5) / 10000 AS min_norm,
           FLOOR(MAX(nrm) * 10000 + 0.5) / 10000 AS max_norm
    FROM e GROUP BY bucket ORDER BY bucket
    """,
    tags=("llm", "embedding", "audit"),
)
def emb_norm_audit(spark, sf_dir):
    """Pre-flight norm audit for similarity work: histogram of L2 norms
    (0.1-wide buckets) with per-bucket min/max — proves the corpus is
    (or is not) unit-normalized before cosine math assumes it. Norms use
    the index-ordered fold, bit-identical to DuckDB's sequential
    list_sum, and the per-bucket reductions are order-free (min/max/
    count), so the query hash-matches despite being pure float math."""
    emb = load_table(spark, sf_dir, "embeddings")
    from distribot_spark.operators.similarity import _norm, _to_double

    nrm = emb.select(
        _norm(_to_double(F.col("embedding"))).alias("nrm")
    )
    return (
        nrm.groupBy(F.floor(F.col("nrm") * 10).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (F.floor(F.min("nrm") * 10000 + F.lit(0.5)) / 10000)
            .alias("min_norm"),
            (F.floor(F.max("nrm") * 10000 + F.lit(0.5)) / 10000)
            .alias("max_norm"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Embedding storage: int8 quantization audit
# ---------------------------------------------------------------------------


@register(
    "emb_quantize_int8",
    oracle="""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    m AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS mx
          FROM e)
    SELECT vec_id,
           FLOOR(mx / 127.0 * 1000000 + 0.5) / 1000000 AS scale_q,
           CASE WHEN mx = 0 THEN 0.0 ELSE
             FLOOR(list_max(list_transform(v, x ->
                 abs(floor(x / (mx / 127.0) + 0.5) * (mx / 127.0) - x)))
               * 1000000 + 0.5) / 1000000
           END AS max_abs_err
    FROM m ORDER BY vec_id
    """,
    tags=("llm", "embedding", "storage"),
)
def emb_quantize_int8(spark, sf_dir):
    """Symmetric int8 quantization audit per vector: max-abs scale and
    max reconstruction error after round-trip (the 4x-storage-compression
    pre-pass of a training pipeline). Map-only scan, JVM array exprs, no
    shuffle; hash-oracled because every reduction is order-insensitive
    (max) and the rounding is spelled identically in both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.quantize_int8(emb).orderBy("vec_id")


# ---------------------------------------------------------------------------
# L4: text analysis — TF-IDF, token stats
# ---------------------------------------------------------------------------


@register(
    "l4_tfidf",
    oracle="""
    WITH toks AS (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
                  FROM documents),
    tf AS (SELECT doc, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    idf AS (SELECT term, LN((n_docs + 1) / (df + 1)) + 1 AS idf FROM dfreq, n),
    scored AS (SELECT doc, tf.term AS term, tf * idf AS tfidf
               FROM tf JOIN idf ON tf.term = idf.term),
    r AS (SELECT doc, term, tfidf,
                 ROW_NUMBER() OVER (PARTITION BY doc ORDER BY tfidf DESC, term) AS rnk
          FROM scored)
    SELECT doc, term, rnk, ROUND(tfidf * 10000) / 10000 AS tfidf
    FROM r WHERE rnk <= 3 ORDER BY doc, rnk
    """,
    tags=("llm", "text"),
)
def l4_tfidf(spark, sf_dir):
    """DataFrame-native smoothed TF-IDF, top-3 terms per document."""
    docs = load_table(spark, sf_dir, "documents")
    return text.tfidf(docs, "text", "doc_id", top_per_doc=3).orderBy("doc", "rnk")


@register(
    "l4_tfidf_top_terms",
    oracle="""
    WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents)
    SELECT term, COUNT(*) AS df FROM toks
    GROUP BY term ORDER BY df DESC, term LIMIT 20
    """,
    tags=("llm", "text"),
)
def l4_tfidf_top_terms(spark, sf_dir):
    """Corpus-level document frequency: top-20 terms."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("term")
    ).dropDuplicates()
    return (
        toks.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), "term")
        .limit(20)
    )


@register(
    "doc_tokens",
    oracle="""
    SELECT doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
      ROUND(len(list_distinct(string_split(text, ' ')))
            / len(string_split(text, ' ')) * 1000) / 1000 AS uniq_ratio,
      ROUND((LENGTH(text) - len(string_split(text, ' ')) + 1)
            / len(string_split(text, ' ')) * 100) / 100 AS avg_token_len
    FROM documents ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def doc_tokens(spark, sf_dir):
    """Token counting + vocabulary-diversity stats."""
    docs = load_table(spark, sf_dir, "documents")
    stats = text.token_stats(docs, "text")
    return stats.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_uniq_tokens").cast("bigint").alias("n_uniq_tokens"),
        "uniq_ratio",
        "avg_token_len",
    ).orderBy("doc_id")


@register(
    "doc_quality",
    oracle="""
    WITH s AS (
      SELECT doc_id, text,
        len(string_split(text, ' ')) AS n_tok,
        len(list_filter(string_split(text, ' '),
            x -> list_contains(['the','a','of','and','to','in','is','on','for','with'], x)))
          AS sw_hits,
        len(list_distinct(string_split(text, ' '))) AS n_uniq
      FROM documents)
    SELECT doc_id,
      ROUND((CASE WHEN LENGTH(text) >= 50 AND LENGTH(text) <= 10000
                  THEN 0.4 ELSE 0.0 END
             + LEAST(sw_hits / n_tok * 2, 0.3)
             + LEAST(n_uniq / n_tok, 1.0) * 0.3) * 1000) / 1000 AS quality
    FROM s ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def doc_quality(spark, sf_dir):
    """Composite quality score: length band + stopword density + diversity."""
    docs = load_table(spark, sf_dir, "documents")
    return text.quality_score(docs, "text").select("doc_id", "quality").orderBy(
        "doc_id"
    )


@register(
    "doc_langid",
    oracle="""
    WITH h AS (
      SELECT doc_id,
        len(list_filter(string_split(text,' '), x -> list_contains(['der','die','das','und','in','den','von','zu','mit','ist'], x))) AS hits_de,
        len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to','in','is','on','for','with'], x))) AS hits_en,
        len(list_filter(string_split(text,' '), x -> list_contains(['el','la','de','y','en','que','los','una','por','con'], x))) AS hits_es,
        len(list_filter(string_split(text,' '), x -> list_contains(['le','la','de','et','en','que','les','une','pour','avec'], x))) AS hits_fr
      FROM documents)
    SELECT doc_id,
      CAST(hits_de AS INT) AS hits_de, CAST(hits_en AS INT) AS hits_en,
      CAST(hits_es AS INT) AS hits_es, CAST(hits_fr AS INT) AS hits_fr,
      CASE WHEN hits_de = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'de'
           WHEN hits_en = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
           WHEN hits_es = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
           ELSE 'fr' END AS pred_lang
    FROM h ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def doc_langid(spark, sf_dir):
    """Language-ID heuristic: stopword-overlap voting, argmax with
    deterministic tie order (de < en < es < fr)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = text.lang_scores(docs, "text")
    return scored.select(
        "doc_id", "hits_de", "hits_en", "hits_es", "hits_fr", "pred_lang"
    ).orderBy("doc_id")


@register(
    "doc_redact_pii",
    oracle=r"""
    WITH injected AS (
      SELECT doc_id,
             text || ' reach user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com ph 555-123-4567 ip 10.1.2.'
                  || CAST(doc_id % 256 AS VARCHAR) AS t
      FROM documents),
    redacted AS (
      SELECT doc_id, t,
        regexp_replace(
          regexp_replace(
            regexp_replace(t,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
          '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IPV4>', 'g')
          AS clean
      FROM injected)
    SELECT doc_id,
      CAST(len(regexp_extract_all(t,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
      CAST(len(regexp_extract_all(t,
        '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS BIGINT) AS n_phone,
      CAST(len(regexp_extract_all(t,
        '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
      md5(clean) AS redacted_md5
    FROM redacted ORDER BY doc_id
    """,
    tags=("llm", "text", "pii"),
)
def doc_redact_pii(spark, sf_dir):
    """PII scrub (pre-training standard): inject deterministic
    email/phone/IP literals, redact with typed placeholders, count hits.
    Patterns live in the RE2 ∩ Java-regex common subset, so the DuckDB
    oracle runs the IDENTICAL regexes; the redacted text is compared by
    md5. Entirely JVM-side regexp_replace — one codegen'd projection."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com ph 555-123-4567 ip 10.1.2."),
            (F.col("doc_id") % 256).cast("string"),
        ).alias("t"),
    )
    return (
        text.redact_pii(injected, "t")
        .select(
            "doc_id", "n_email", "n_phone", "n_ipv4",
            F.md5("t_redacted").alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_split",
    oracle="""
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
    FROM documents GROUP BY 1 ORDER BY 1
    """,
    tags=("llm", "split"),
)
def doc_split(spark, sf_dir):
    """Deterministic train/val/test split by md5(doc_id) prefix —
    engine-agnostic (no RNG, no engine hash), and stable under corpus
    growth: a doc's split never changes when other docs arrive, unlike
    row_number-based splits. ≈80/10/10 at the ('cc','e6') thresholds."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        text.hash_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .orderBy("split")
    )


@register(
    "doc_rebalance",
    oracle="""
    WITH counts AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
    thr AS (SELECT lang, cnt,
                   lpad(lower(to_hex(GREATEST(1, CAST(
                       FLOOR(LEAST(1.0, 80.0 / cnt) * 4294967296)
                       AS BIGINT)))), 8, '0') AS t
            FROM counts),
    kept AS (
      SELECT d.lang, d.doc_id
      FROM documents d JOIN thr USING (lang)
      WHERE cnt <= 80
         OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < t)
    SELECT c.lang, c.cnt AS n_before,
           COUNT(k.doc_id) AS n_after, MIN(k.doc_id) AS first_doc
    FROM counts c LEFT JOIN kept k ON c.lang = k.lang
    GROUP BY c.lang, c.cnt ORDER BY c.lang
    """,
    tags=("llm", "sampling"),
)
def doc_rebalance(spark, sf_dir):
    """Language rebalancing: cap every language at ≈80 docs by
    deterministic md5-prefix sampling (operators/text.rebalance_by) —
    shrink over-represented strata, keep small ones whole, no RNG. The
    corpus never shuffles: scan + broadcast of the per-lang thresholds +
    filter."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_before"))
    kept = text.rebalance_by(docs, "lang", cap=80)
    after = kept.groupBy("lang").agg(
        F.count("*").alias("n_after"), F.min("doc_id").alias("first_doc")
    )
    return (
        counts.join(after, "lang", "left")
        .select(
            "lang", "n_before",
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
            "first_doc",
        )
        .orderBy("lang")
    )


@register(
    "doc_length_histogram",
    oracle="""
    SELECT CAST(FLOOR(n_chars / 50) * 50 AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars) * 100) / 100 AS avg_chars
    FROM documents GROUP BY 1 ORDER BY 1
    """,
    tags=("llm", "stats"),
)
def doc_length_histogram(spark, sf_dir):
    """Corpus length distribution in 50-char buckets — the standard
    what's-in-this-corpus profile; map-side partial agg, one tiny
    shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            (F.floor(F.col("n_chars") / 50) * 50).cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_docs"),
            (F.round(F.avg("n_chars") * 100, 0) / 100).alias("avg_chars"),
        )
        .orderBy("bucket")
    )


@register(
    "l_pipeline_end_to_end",
    oracle="""
    WITH RECURSIVE
    kept AS (
      SELECT doc_id, text, n_chars FROM documents
      WHERE lang = 'en' AND n_chars BETWEEN 50 AND 10000),
    exact_canon AS (
      SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
    exact_kept AS (
      SELECT k.doc_id, k.text, k.n_chars
      FROM kept k JOIN exact_canon USING (doc_id)),
    t AS (SELECT doc_id, string_split(text, ' ') AS w FROM exact_kept),
    sh AS (SELECT doc_id AS doc,
                  unnest([array_to_string(w[i:i+2], ' ')
                          FOR i IN range(1, len(w) - 1)]) AS s
           FROM t),
    dd AS (SELECT DISTINCT doc, s FROM sh),
    sz AS (SELECT doc, COUNT(*) AS n FROM dd GROUP BY doc),
    pr AS (SELECT a.doc AS da, b.doc AS db, COUNT(*) AS inter
           FROM dd a JOIN dd b ON a.s = b.s AND a.doc < b.doc
           GROUP BY 1, 2),
    p AS (SELECT da, db FROM pr JOIN sz sa ON da = sa.doc
          JOIN sz sb ON db = sb.doc
          WHERE inter / (sa.n + sb.n - inter) >= 0.5),
    e AS (SELECT da AS src, db AS dst FROM p UNION SELECT db, da FROM p),
    reach(src, dst) AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
    comp AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
             FROM reach GROUP BY src),
    survivors AS (
      SELECT k.doc_id, k.n_chars
      FROM exact_kept k LEFT JOIN comp c USING (doc_id)
      WHERE c.doc_id IS NULL OR c.cluster_id = k.doc_id)
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS first_doc
    FROM survivors GROUP BY 1 ORDER BY 1
    """,
    tags=("llm", "pipeline"),
)
def l_pipeline_end_to_end(spark, sf_dir):
    """The COMPOSED training-data pipeline, one lazy DataFrame job:
    quality gate → exact dedup (md5 canonical) → near-dup clustering
    (minhash LSH pairs → connected components) → keep one canonical doc
    per cluster → deterministic train/val/test split → per-split corpus
    stats. Every stage is the operator tested individually elsewhere;
    this query certifies the COMPOSITION end to end against a single
    relational+recursive oracle — the 'switch your pipeline to this
    engine' artifact. Catalyst sees one plan for the filter/dedup/split
    chain (pushdown + shared scans); only the component loop iterates.
    Same LSH-recall regime contract as dedup_clusters: the oracle match
    relies on near-dup pairs being high-similarity planted dups (the
    s-curve misses a hypothetical j ≈ 0.5 pair ~13% of the time)."""
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(
        (F.col("lang") == "en") & F.col("n_chars").between(50, 10000)
    ).select("doc_id", "text", "n_chars")
    exact_kept = kept.join(
        dedup.exact_dedup(kept, "text", "doc_id").select("doc_id"), "doc_id"
    )
    pairs = dedup.minhash_candidate_pairs(exact_kept, "text", "doc_id",
                                          threshold=0.5)
    clusters = components.duplicate_clusters(pairs)
    survivors = exact_kept.join(
        clusters.filter(~F.col("is_canonical")).select(
            F.col("doc_id")
        ),
        "doc_id",
        "left_anti",
    )
    return (
        text.hash_split(survivors, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("split")
    )


@register(
    "l4_collocations",
    oracle="""
    WITH dd AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t
                FROM documents),
    p AS (SELECT a.t AS ta, b.t AS tb, COUNT(*) AS n_docs
          FROM dd a JOIN dd b ON a.doc_id = b.doc_id AND a.t < b.t
          GROUP BY ta, tb)
    SELECT ta, tb, n_docs FROM p
    ORDER BY n_docs DESC, ta, tb LIMIT 20
    """,
    tags=("llm", "text", "collocation"),
)
def l4_collocations(spark, sf_dir):
    """Collocation extraction: top-20 term pairs by document
    co-occurrence (the counting core of PMI/phrase mining — the log-ratio
    scoring stays engine-local, counts are the exchangeable artifact).
    Per-doc distinct terms self-join within the doc key, so candidate
    volume is sum over docs of (distinct terms)^2 — at corpus scale the
    same document-frequency cap as tf_cosine_pairs prunes the
    stop-word-dominated pairs. Integer math end to end; total order with
    pair tie-break makes the top-20 cut deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    dd = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    ).dropDuplicates(["doc_id", "t"])
    a = dd.select("doc_id", F.col("t").alias("ta"))
    b = dd.select("doc_id", F.col("t").alias("tb"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), "ta", "tb")
        .limit(20)
    )


@register(
    "doc_null_hygiene",
    oracle="""
    WITH n AS (SELECT doc_id,
                      CASE WHEN doc_id % 97 = 0 THEN NULL ELSE text END
                        AS text
               FROM documents)
    SELECT doc_id, text IS NULL AS is_null,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           COALESCE(CAST(LENGTH(text) AS BIGINT), -1) AS n_chars_or_sentinel
    FROM n ORDER BY doc_id
    """,
    tags=("llm", "nulls"),
)
def doc_null_hygiene(spark, sf_dir):
    """Cross-engine NULL discipline certificate: the testdata carries no
    NULLs, so this query plants them deterministically (doc_id % 97) and
    pins that split/size/length propagate NULL identically in Spark
    (ANSI mode) and DuckDB, with an explicit COALESCE sentinel for the
    guarded path. Real corpora have missing text; operators must not
    turn that into -1s or crashes silently differing between engines."""
    docs = load_table(spark, sf_dir, "documents")
    nulled = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 97 == 0, F.lit(None)).otherwise(F.col("text")),
    )
    return nulled.select(
        "doc_id",
        F.col("text").isNull().alias("is_null"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        F.coalesce(F.length("text").cast("bigint"), F.lit(-1))
        .alias("n_chars_or_sentinel"),
    ).orderBy("doc_id")


@register(
    "doc_curate_topk",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang, text,
        len(string_split(text, ' ')) AS n_tok,
        len(list_filter(string_split(text, ' '),
            x -> list_contains(['the','a','of','and','to','in','is','on','for','with'], x)))
          AS sw_hits,
        len(list_distinct(string_split(text, ' '))) AS n_uniq
      FROM documents),
    q AS (
      SELECT doc_id, lang,
        ROUND((CASE WHEN LENGTH(text) >= 50 AND LENGTH(text) <= 10000
                    THEN 0.4 ELSE 0.0 END
               + LEAST(sw_hits / n_tok * 2, 0.3)
               + LEAST(n_uniq / n_tok, 1.0) * 0.3) * 1000) / 1000 AS quality
      FROM s),
    r AS (
      SELECT lang, doc_id, quality,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY quality DESC, doc_id) AS rnk
      FROM q)
    SELECT lang, doc_id, CAST(rnk AS BIGINT) AS rnk, quality
    FROM r WHERE rnk <= 10 ORDER BY lang, rnk
    """,
    tags=("llm", "curation"),
)
def doc_curate_topk(spark, sf_dir):
    """Quality-based curation: top-10 documents per language by the
    composite quality score (rounded 3-dp — certified identical via
    doc_quality — so the cut boundary is engine-agnostic), doc_id
    tie-break. One shuffle on lang; per-partition top-k window."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        text.curate_top_quality(docs, k=10, strata_col="lang")
        .withColumn("rnk", F.col("rnk").cast("bigint"))
        .orderBy("lang", "rnk")
    )


@register(
    "l_pipeline_to_bins",
    oracle="""
    WITH kept AS (
      SELECT doc_id, text FROM documents
      WHERE lang = 'en' AND n_chars BETWEEN 50 AND 10000),
    exact_canon AS (
      SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
    exact_kept AS (
      SELECT k.doc_id, k.text FROM kept k JOIN exact_canon USING (doc_id)),
    w AS (SELECT doc_id, string_split(text, ' ') AS w FROM exact_kept),
    c AS (SELECT doc_id,
                 unnest(range(0,
                     GREATEST(CAST(ceil((len(w) - 32) / 24.0) AS BIGINT),
                              0) + 1)) AS ck
          FROM w),
    j AS (SELECT c.doc_id, ck AS chunk_id,
                 len(string_split(
                     array_to_string(w[ck*24 + 1 : ck*24 + 32], ' '), ' '))
                   AS n_tokens
          FROM c JOIN w ON c.doc_id = w.doc_id),
    s AS (SELECT doc_id, chunk_id, n_tokens,
                 CAST(doc_id % 8 AS INT) AS shard,
                 SUM(n_tokens) OVER (PARTITION BY doc_id % 8
                                     ORDER BY doc_id, chunk_id
                                     ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS start
          FROM j)
    SELECT shard, CAST(FLOOR(start / 64.0) AS BIGINT) AS bin_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM s GROUP BY shard, bin_id ORDER BY shard, bin_id
    """,
    tags=("llm", "pipeline"),
)
def l_pipeline_to_bins(spark, sf_dir):
    """The ingestion half of a pre-training pipeline COMPOSED as one lazy
    job: quality gate → exact dedup (md5 canonical) → context-window
    chunking → sequence packing → per-bin fill stats. Each stage is the
    operator certified individually (l5, l1, doc_chunks, doc_pack); this
    query certifies their composition — Catalyst sees a single plan, so
    the quality filter pushes into the scan feeding every downstream
    stage and the chunk explode runs on the deduped survivors only."""
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(
        (F.col("lang") == "en") & F.col("n_chars").between(50, 10000)
    ).select("doc_id", "text")
    exact_kept = kept.join(
        dedup.exact_dedup(kept, "text", "doc_id").select("doc_id"), "doc_id"
    )
    chunks = text.chunk_tokens(exact_kept, chunk_size=32, stride=24)
    packed = text.pack_chunks(chunks, budget=64, n_shards=8)
    return (
        packed.groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .orderBy("shard", "bin_id")
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id, md5(text) AS fp_md5,
           substr(md5(lower(text)), 1, 16) AS fp_short
    FROM documents ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def doc_fingerprint(spark, sf_dir):
    """Content fingerprints (full + normalized-prefix)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.fingerprint(docs, "text").select(
        "doc_id", "fp_md5", "fp_short"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# L5: quality filters
# ---------------------------------------------------------------------------


@register(
    "l5_quality_filter",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE lang = 'en' AND n_chars BETWEEN 150 AND 350
    ORDER BY doc_id
    """,
    tags=("llm", "filter"),
)
def l5_quality_filter(spark, sf_dir):
    """Language + length quality gate (predicates push to the scan)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter((F.col("lang") == "en") & F.col("n_chars").between(150, 350))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# L6: multimodal columns
# ---------------------------------------------------------------------------


@register(
    "l6_multimodal",
    oracle="""
    SELECT doc_id, 'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           md5(text) AS content_key
    FROM documents ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def l6_multimodal(spark, sf_dir):
    """Binary payload column + metadata + content-addressed key."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.attach_payload(docs, "text").select(
        "doc_id", "media_type", "payload_bytes", "content_key"
    ).orderBy("doc_id")


@register(
    "multimodal_decode",
    oracle="""
    WITH px AS (
      SELECT d.doc_id, x.x, y.y FROM documents d,
             generate_series(0, 23) x(x), generate_series(0, 15) y(y))
    SELECT doc_id, 'ppm' AS format, CAST(24 AS INT) AS width,
           CAST(16 AS INT) AS height, CAST(384 AS BIGINT) AS n_pixels,
      FLOOR(AVG((7*x + 13*y + doc_id) % 256) * 10000 + 0.5)/10000 AS mean_r,
      FLOOR(AVG((3*x + 5*y + 2*doc_id) % 256) * 10000 + 0.5)/10000 AS mean_g,
      FLOOR(AVG((11*x + 2*y + 3*doc_id) % 256) * 10000 + 0.5)/10000 AS mean_b
    FROM px GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def multimodal_decode(spark, sf_dir):
    """REAL image decode path: render a valid P6 PPM per doc (deterministic
    integer pixel function), parse it back with the stdlib codec
    (operators/codecs.py), emit true dimensions + channel means. The
    oracle reproduces the pixel arithmetic directly, so the whole
    encode → magic-sniff → decode → aggregate chain is hash-checked."""
    docs = load_table(spark, sf_dir, "documents")
    imgs = multimodal.synthesize_image(docs, width=24, height=16, fmt="ppm")
    return multimodal.decode_image(imgs).orderBy("doc_id")


@register(
    "multimodal_resize",
    oracle="""
    WITH px AS (
      SELECT d.doc_id, x.x, y.y FROM documents d,
             generate_series(0, 7) x(x), generate_series(0, 7) y(y))
    SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
      FLOOR(AVG((7*(3*x) + 13*(2*y) + doc_id) % 256) * 10000 + 0.5)/10000
        AS mean_r,
      FLOOR(AVG((3*(3*x) + 5*(2*y) + 2*doc_id) % 256) * 10000 + 0.5)/10000
        AS mean_g,
      FLOOR(AVG((11*(3*x) + 2*(2*y) + 3*doc_id) % 256) * 10000 + 0.5)/10000
        AS mean_b
    FROM px GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def multimodal_resize(spark, sf_dir):
    """REAL resize path: decode the 24×16 synthesized PPM (BMP variant
    this time to exercise the second codec), nearest-neighbor downsample
    to 8×8, re-encode. dst(x,y) = src(3x, 2y), so the oracle computes the
    resampled channel means by substituting the index map into the pixel
    function."""
    docs = load_table(spark, sf_dir, "documents")
    imgs = multimodal.synthesize_image(docs, width=24, height=16, fmt="bmp")
    return (
        multimodal.resize_image(imgs, width=8, height=8)
        .select("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")
        .orderBy("doc_id")
    )


@register(
    "multimodal_audio",
    oracle="""
    WITH s AS (
      SELECT d.doc_id, CAST((37*i.i + 11*d.doc_id) % 65536 - 32768 AS DOUBLE)
               AS v
      FROM documents d, generate_series(0, 479) i(i))
    SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
           CAST(480 AS BIGINT) AS n_samples,
           CAST(0.06 AS DOUBLE) AS duration_sec,
           FLOOR(AVG(v) * 10000 + 0.5)/10000 AS mean_amp,
           FLOOR(SQRT(AVG(v*v)) * 10000 + 0.5)/10000 AS rms
    FROM s GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm", "multimodal", "audio"),
)
def multimodal_audio(spark, sf_dir):
    """REAL audio decode path: render a valid PCM WAV per doc (stdlib
    wave container, deterministic int16 sample function), parse it back
    and extract mean amplitude + RMS. int16 sums are exact in float64,
    so the oracle reproduces the sample arithmetic bit-for-bit with
    generate_series — the full encode → RIFF-parse → feature chain is
    hash-checked."""
    docs = load_table(spark, sf_dir, "documents")
    wavs = multimodal.synthesize_audio(docs, n_samples=480, sample_rate=8000)
    return multimodal.audio_features(wavs).orderBy("doc_id")


@register(
    "multimodal_frames",
    oracle="""
    WITH p AS (SELECT doc_id, text AS b, LENGTH(text) AS n FROM documents),
    f AS (SELECT doc_id, unnest([0, 1, 2, 3]) AS k, b, n FROM p)
    SELECT doc_id, CAST(k AS INT) AS frame_idx,
      CAST((k * GREATEST(n - 16, 0)) // 3 AS BIGINT) AS frame_offset,
      CAST(LENGTH(substr(b, (k * GREATEST(n - 16, 0)) // 3 + 1, 16)) AS INT)
        AS frame_bytes,
      md5(substr(b, (k * GREATEST(n - 16, 0)) // 3 + 1, 16)) AS frame_md5
    FROM f ORDER BY doc_id, frame_idx
    """,
    tags=("llm", "multimodal"),
)
def multimodal_frames(spark, sf_dir):
    """Frame sampling over binary payloads (4 windows of 16 bytes at even
    offsets) — one row fans out to 4 frame rows via mapInPandas. The
    payloads are ASCII text bytes, so the oracle reproduces the windows
    with VARCHAR substr + md5."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = multimodal.attach_payload(docs, "text")
    return multimodal.frame_sample(payloads, n_frames=4, frame_size=16).orderBy(
        "doc_id", "frame_idx"
    )


@register("l2_minhash_ml", oracle=None, tags=("llm", "dedup", "lsh", "ml"))
def l2_minhash_ml(spark, sf_dir):
    """spark.ml MinHashLSH variant of L2 (Tokenizer → NGram(3) →
    binary CountVectorizer → MinHashLSH.approxSimilarityJoin): the
    library-pipeline cross-check of the native implementation. Rows-only
    (the ML hash family isn't oracle-reproducible); pair-set agreement
    with l2_minhash_pairs is asserted in tests/test_operators.py."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, NGram, Tokenizer

    docs = load_table(spark, sf_dir, "documents")
    words = Tokenizer(inputCol="text", outputCol="words").transform(docs)
    grams = NGram(n=3, inputCol="words", outputCol="grams").transform(words)
    cv = CountVectorizer(inputCol="grams", outputCol="features", binary=True).fit(
        grams
    )
    feat = cv.transform(grams).select("doc_id", "features")
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=16, seed=42
    ).fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("da"),
            F.col("datasetB.doc_id").alias("db"),
            (F.round((1 - F.col("jaccard_dist")) * 1000, 0) / 1000).alias("jaccard"),
        )
        .orderBy("da", "db")
    )


@register(
    "dedup_semantic", oracle=None, tags=("llm", "dedup", "embedding", "semdedup")
)
def dedup_semantic(spark, sf_dir):
    """SemDeDup semantic deduplication at cos ≥ 0.45: k-means clusters
    prune the pair search to within-cluster all-pairs, connected
    components group the survivors, canonical = min id
    (operators/similarity.semantic_dedup). Rows-only by design (cluster-
    boundary recall < 1, like the paper); recall vs the exact pair
    baseline and planted-duplicate behavior are asserted in
    tests/test_operators.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(emb, threshold=0.45).orderBy("doc_id")


@register("l3_pq_topk", oracle=None, tags=("llm", "similarity", "pq"))
def l3_pq_topk(spark, sf_dir):
    """Product-quantization ANN top-5 (PQ-ADC + exact re-rank) — the
    memory-bound 100 TB tier: 16 one-byte codes replace 256 bytes of
    float32 per vector, so the scan side of the index shrinks 16x and
    per-row scoring is 16 table gathers (m=16 subspaces of 4 dims —
    measured recall@5 0.98 at rerank=64 on this corpus, vs 0.68 for
    m=8's coarser 32x compression). Scores of returned rows are
    EXACT (re-ranked); only candidate selection approximates. Rows-only;
    recall vs l3_topk_cosine is asserted in tests/test_operators.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    return similarity.pq_topk(corpus, queries, k=5).orderBy("qid", "rnk")


@register("doc_bpe_train", oracle=None, tags=("llm", "tokenizer", "iterative"))
def doc_bpe_train(spark, sf_dir):
    """BPE tokenizer TRAINING over the documents corpus (10 merges) —
    learning the merge table that doc_tokens_bpe-style pre-tokenization
    would feed (operators/bpe.py; arXiv:1508.07909). Corpus touched in
    ONE counting pass; the merge loop runs on the bounded (word, count)
    lexicon with only the 1-row arg-max collected per round. Rows-only
    by design (an iterative argmax loop has no SQL twin);
    tests/test_operators.py::test_bpe_train_matches_reference pins the
    exact merge table against a pure-Python reference implementation."""
    from distribot_spark.operators.bpe import bpe_train

    return bpe_train(
        load_table(spark, sf_dir, "documents"), "text", n_merges=10
    )


@register(
    "doc_feature_hash",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
               AS tok
      FROM documents),
    b AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 4)) AS BIGINT) % 64 AS bucket
      FROM toks WHERE tok <> '')
    SELECT doc_id, bucket, COUNT(*) AS cnt
    FROM b GROUP BY doc_id, bucket ORDER BY doc_id, bucket
    """,
    tags=("llm", "features"),
)
def doc_feature_hash(spark, sf_dir):
    """Feature hashing (the hashing trick, Weinberger et al. 2009): each
    token maps to one of 64 buckets via its md5 16-bit prefix — the
    fixed-width sparse featurization that needs NO vocabulary build,
    broadcast, or second pass, which is why it is the 100 TB default
    for bag-of-words models. Engine-portable hash (same md5 arithmetic
    as doc_split/q_weighted_sample) makes the sparse vectors themselves
    hash-oracled, not just their shape. Map-side: explode + project;
    the only shuffle is the (doc, bucket) count, bounded by docs × 64."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("tok"),
    ).filter(F.col("tok") != "")
    return (
        toks.select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long")
                % 64
            ).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
        .orderBy("doc_id", "bucket")
    )


_CENTROID_CTE = """
ex AS (
  SELECT label, vec_id,
         generate_subscripts(embedding, 1) AS pos,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS BIGINT) AS q
  FROM embeddings),
cent AS (
  SELECT label AS c_label, pos,
         CAST(ROUND(SUM(q) * 1.0 / COUNT(*)) AS BIGINT) AS cm
  FROM ex GROUP BY 1, 2)
"""


@register(
    "emb_centroids",
    oracle=f"""
    WITH {_CENTROID_CTE}
    SELECT c_label AS label, pos, cm AS centroid_micro
    FROM cent ORDER BY label, pos
    """,
    tags=("llm", "embedding", "ml"),
)
def emb_centroids(spark, sf_dir):
    """Per-label mean embedding (class prototypes — the k-means E-step /
    nearest-class-mean building block). Exactness recipe: every float32
    component quantizes to int64 MICRO-units first (float→double is
    exact, both engines round the identical double), so the per-(label,
    dim) sums are order-free integer arithmetic — no cross-engine float
    summation hazard, unlike a naive avg(embedding[i]). One explode +
    one map-side-combined shuffle bounded by labels × dim."""
    ex = (
        load_table(spark, sf_dir, "embeddings")
        .select("label", F.posexplode("embedding").alias("pos0", "x"))
        .select(
            "label",
            (F.col("pos0") + 1).alias("pos"),
            F.round(F.col("x").cast("double") * F.lit(1000000.0), 0)
            .cast("long")
            .alias("q"),
        )
    )
    return (
        ex.groupBy(F.col("label"), "pos")
        .agg(
            F.round(F.sum("q") * F.lit(1.0) / F.count("*"), 0)
            .cast("long")
            .alias("centroid_micro")
        )
        .orderBy("label", "pos")
    )


@register(
    "emb_nearest_centroid",
    oracle=f"""
    WITH {_CENTROID_CTE},
    d AS (
      SELECT ex.vec_id, ex.label, cent.c_label,
             SUM((ex.q - cent.cm) * (ex.q - cent.cm)) AS dist
      FROM ex JOIN cent ON ex.pos = cent.pos
      GROUP BY 1, 2, 3),
    a AS (
      SELECT vec_id, label, c_label AS assigned
      FROM d
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist, c_label) = 1)
    SELECT label, assigned, COUNT(*) AS n
    FROM a GROUP BY 1, 2 ORDER BY label, assigned
    """,
    tags=("llm", "embedding", "ml"),
)
def emb_nearest_centroid(spark, sf_dir):
    """Nearest-class-mean classification + confusion matrix — the
    evaluation loop for embedding quality (are labels linearly
    separated by their prototypes?). Distances are exact integer
    arithmetic on the micro-quantized components (ties break toward
    the smallest label), so the confusion matrix hash-oracles. Scale
    shape: the labels×dim centroid relation broadcasts; the corpus is
    touched map-only into a (vec, label)-grain partial-agg — the same
    probe shape the IVF index uses for cluster assignment."""
    ex = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", F.posexplode("embedding").alias("pos0", "x"))
        .select(
            "vec_id",
            "label",
            (F.col("pos0") + 1).alias("pos"),
            F.round(F.col("x").cast("double") * F.lit(1000000.0), 0)
            .cast("long")
            .alias("q"),
        )
    )
    cent = (
        ex.groupBy(F.col("label").alias("c_label"), "pos")
        .agg(
            F.round(F.sum("q") * F.lit(1.0) / F.count("*"), 0)
            .cast("long")
            .alias("cm")
        )
    )
    d = (
        ex.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "c_label")
        .agg(
            F.sum((F.col("q") - F.col("cm")) * (F.col("q") - F.col("cm"))).alias(
                "dist"
            )
        )
    )
    from pyspark.sql import Window as W

    wmin = W.partitionBy("vec_id").orderBy("dist", "c_label")
    return (
        d.withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .groupBy("label", F.col("c_label").alias("assigned"))
        .agg(F.count("*").alias("n"))
        .orderBy("label", "assigned")
    )


_PHASH_ORACLE = """
WITH cells AS (
  SELECT d.doc_id, xs.x, ys.y,
         (((7 * (3 * xs.x) + 13 * (2 * ys.y) + d.doc_id) % 256)
        + ((3 * (3 * xs.x) + 5 * (2 * ys.y) + 2 * d.doc_id) % 256)
        + ((11 * (3 * xs.x) + 2 * (2 * ys.y) + 3 * d.doc_id) % 256)) // 3
           AS g
  FROM documents d,
       (SELECT unnest(range(8)) AS x) xs,
       (SELECT unnest(range(8)) AS y) ys),
t AS (SELECT doc_id, CAST(SUM(g) AS BIGINT) AS total
      FROM cells GROUP BY 1),
b AS (SELECT c.doc_id, c.y * 8 + c.x AS j,
             CASE WHEN 64 * c.g > t.total THEN 1 ELSE 0 END AS bit
      FROM cells c JOIN t USING (doc_id))
SELECT doc_id,
  CAST(SUM(CASE WHEN j >= 32 THEN bit * (1::BIGINT << CAST(j - 32 AS INT))
           ELSE 0 END) AS BIGINT) AS phash_hi,
  CAST(SUM(CASE WHEN j < 32 THEN bit * (1::BIGINT << CAST(j AS INT))
           ELSE 0 END) AS BIGINT) AS phash_lo
FROM b GROUP BY doc_id ORDER BY doc_id
"""


@register("multimodal_phash", oracle=_PHASH_ORACLE, tags=("llm", "multimodal"))
def multimodal_phash(spark, sf_dir):
    """Perceptual image hashing over REAL encoded payloads: every doc's
    P6 PPM is rendered (synthesize_image), decoded from its actual
    bytes, grayscaled, 8×8-downsampled and thresholded into a 64-bit
    aHash (operators/multimodal.phash_image). The oracle replays the
    ENTIRE pixel pipeline symbolically from the synth_pixel_channels
    formula — decode, NN-resample coordinates (3x, 2y), integer
    grayscale, 64·g > Σg threshold, bit packing — so a single wrong
    pixel anywhere in the codec path breaks the hash. Near-dup IMAGE
    search = this signature + the SimHash banded-join machinery."""
    docs = load_table(spark, sf_dir, "documents")
    imgs = multimodal.synthesize_image(docs, width=24, height=16, fmt="ppm")
    return multimodal.phash_image(imgs).orderBy("doc_id")


_BPE_MERGES_CACHE: dict[str, list[tuple[str, str]]] = {}


@register("doc_bpe_encode", oracle=None, tags=("llm", "tokenizer"))
def doc_bpe_encode(spark, sf_dir):
    """Train-then-APPLY: the 10 merges learned by doc_bpe_train re-
    tokenize the corpus, yielding per-doc post-merge token counts
    (operators/bpe.bpe_encode — merges rewrite the bounded lexicon,
    corpus pays one explode + one count shuffle). The learned merge
    table is memoized per sf_dir — training is deterministic, and
    without the memo every plan BUILD of this query would re-run the
    trainer's 10 driver-synchronous rounds on top of doc_bpe_train's.
    Rows-only like the trainer;
    tests/test_operators.py::test_bpe_encode_matches_reference pins
    exact counts against the sequential reference."""
    from distribot_spark.operators.bpe import bpe_encode, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    if sf_dir not in _BPE_MERGES_CACHE:
        _BPE_MERGES_CACHE[sf_dir] = [
            (r.left, r.right)
            for r in bpe_train(docs, "text", n_merges=10).collect()
        ]
    return bpe_encode(
        docs, "text", "doc_id", _BPE_MERGES_CACHE[sf_dir]
    ).orderBy("doc_id")


_QNORM_ORACLE = """
WITH g AS (
  SELECT n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS gidx
  FROM documents),
tot AS (SELECT COUNT(*) AS n FROM documents),
ranked AS (
  SELECT doc_id, lang, n_chars,
         PERCENT_RANK() OVER (PARTITION BY lang
                              ORDER BY n_chars, doc_id) AS q
  FROM documents),
m AS (SELECT r.doc_id, r.lang, r.n_chars,
             CAST(ROUND(r.q * (tot.n - 1)) AS BIGINT) AS gidx
      FROM ranked r, tot)
SELECT m.doc_id, m.lang, m.n_chars, g.n_chars AS normalized_chars
FROM m JOIN g ON g.gidx = m.gidx
ORDER BY m.doc_id
"""


@register("doc_quantile_normalize", oracle=_QNORM_ORACLE, tags=("llm", "ml"))
def doc_quantile_normalize(spark, sf_dir):
    """Quantile normalization (the ML-preprocessing shape: map each
    group's distribution onto the global one by RANK MATCHING): a doc's
    within-language percent_rank picks the global value at that
    quantile via an integer index join — no interpolation, always an
    actual corpus value, deterministic through the (n_chars, doc_id)
    tie-break. After this, every language's length distribution is the
    same. The per-lang window is parallel; the global index relation is
    the only total order, built once — replace it with the
    q_global_rownum range-partition form at corpus scale."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        F.col("n_chars").alias("g_chars"),
        (F.row_number().over(W.orderBy("n_chars", "doc_id")) - 1).alias("gidx"),
    )
    tot = docs.agg(F.count("*").alias("n"))
    ranked = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.percent_rank()
        .over(W.partitionBy("lang").orderBy("n_chars", "doc_id"))
        .alias("q"),
    )
    m = ranked.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(F.col("q") * (F.col("n") - 1), 0).cast("long").alias("gidx"),
    )
    return (
        m.join(g, "gidx")
        .select(
            "doc_id", "lang", "n_chars",
            F.col("g_chars").alias("normalized_chars"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_langid_eval",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang,
        len(list_filter(string_split(text,' '), x -> list_contains(['der','die','das','und','in','den','von','zu','mit','ist'], x))) AS hits_de,
        len(list_filter(string_split(text,' '), x -> list_contains(['the','a','of','and','to','in','is','on','for','with'], x))) AS hits_en,
        len(list_filter(string_split(text,' '), x -> list_contains(['el','la','de','y','en','que','los','una','por','con'], x))) AS hits_es,
        len(list_filter(string_split(text,' '), x -> list_contains(['le','la','de','et','en','que','les','une','pour','avec'], x))) AS hits_fr
      FROM documents),
    p AS (
      SELECT lang,
        CASE WHEN hits_de = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'de'
             WHEN hits_en = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'en'
             WHEN hits_es = GREATEST(hits_de, hits_en, hits_es, hits_fr) THEN 'es'
             ELSE 'fr' END AS pred_lang
      FROM h)
    SELECT lang, pred_lang, COUNT(*) AS n,
           ROUND(COUNT(*) * 1.0
                 / SUM(COUNT(*)) OVER (PARTITION BY lang) * 1000000)
             / 1000000 AS frac_of_true
    FROM p GROUP BY lang, pred_lang ORDER BY lang, pred_lang
    """,
    tags=("llm", "text", "eval"),
)
def doc_langid_eval(spark, sf_dir):
    """Classifier evaluation of the lang-ID heuristic against the
    corpus's ground-truth labels: the confusion matrix with per-true-
    language recall fractions — the quality gate you run BEFORE trusting
    a heuristic to route a 100 TB corpus (doc_langid produces the
    predictions; this scores them). Counts are exact; fractions divide
    exact integers. The percent window runs over the |langs|² grid."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    scored = text.lang_scores(docs, "text")  # passes `lang` through
    conf = scored.groupBy("lang", "pred_lang").agg(F.count("*").alias("n"))
    return conf.select(
        "lang",
        "pred_lang",
        "n",
        (
            F.round(
                F.col("n") * F.lit(1.0)
                / F.sum("n").over(W.partitionBy("lang"))
                * F.lit(1000000.0),
                0,
            )
            / F.lit(1000000.0)
        ).alias("frac_of_true"),
    ).orderBy("lang", "pred_lang")


@register(
    "emb_dim_profile",
    oracle="""
    WITH ex AS (
      SELECT generate_subscripts(embedding, 1) AS pos,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
                  AS BIGINT) AS q
      FROM embeddings)
    SELECT pos, COUNT(*) AS n,
           CAST(MIN(q) AS BIGINT) AS min_micro,
           CAST(MAX(q) AS BIGINT) AS max_micro,
           CAST(ROUND(SUM(q) * 1.0 / COUNT(*)) AS BIGINT) AS mean_micro,
           CAST(ROUND(sqrt((COUNT(*) * SUM(q * q) - SUM(q) * SUM(q)) * 1.0
                / (COUNT(*) * (COUNT(*) - 1)))) AS BIGINT) AS std_micro
    FROM ex GROUP BY pos ORDER BY pos
    """,
    tags=("llm", "embedding", "audit"),
)
def emb_dim_profile(spark, sf_dir):
    """Per-dimension embedding profile (mean/std/min/max in int64 micro
    units) — the pre-flight that finds DEAD or degenerate dimensions
    before similarity search or quantization trusts them (a zero-std
    dim carries no signal; a huge-range dim dominates unnormalized
    distances — cf. emb_quantize_int8's max-abs scale). Same integer
    discipline as emb_centroids: quantize first, every aggregate is an
    order-free integer sum, std from Σq/Σq²/n exactly like
    q_anomaly_zscore. One explode + one shuffle bounded by dim."""
    ex = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("pos0", "x"))
        .select(
            (F.col("pos0") + 1).alias("pos"),
            F.round(F.col("x").cast("double") * F.lit(1000000.0), 0)
            .cast("long")
            .alias("q"),
        )
    )
    return (
        ex.groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            F.min("q").alias("min_micro"),
            F.max("q").alias("max_micro"),
            F.round(F.sum("q") * F.lit(1.0) / F.count("*"), 0)
            .cast("long")
            .alias("mean_micro"),
            F.round(
                F.sqrt(
                    (F.count("*") * F.sum(F.col("q") * F.col("q"))
                     - F.sum("q") * F.sum("q"))
                    * F.lit(1.0)
                    / (F.count("*") * (F.count("*") - 1))
                ),
                0,
            )
            .cast("long")
            .alias("std_micro"),
        )
        .orderBy("pos")
    )


@register(
    "q_emb_covariance",
    oracle="""
    WITH ex AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
                  AS BIGINT) AS q
      FROM embeddings),
    p AS (
      SELECT a.i AS i, b.i AS j, a.q AS qa, b.q AS qb
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.i >= a.i),
    s AS (
      SELECT i, j, COUNT(*) AS n,
             CAST(SUM(qa * qb) AS BIGINT) AS spp,
             CAST(SUM(qa) AS BIGINT) AS sa,
             CAST(SUM(qb) AS BIGINT) AS sb
      FROM p GROUP BY i, j)
    SELECT i, j,
           CAST(ROUND((n * spp - sa * sb) * 1.0 / (n * (n - 1))) AS BIGINT)
             AS cov_micro2
    FROM s ORDER BY i, j
    """,
    tags=("llm", "embedding", "ml"),
)
def q_emb_covariance(spark, sf_dir):
    """Distributed covariance matrix of the embedding space — the ONE
    corpus pass that PCA/whitening needs (the 64×64 eigensolve after it
    is driver-trivial; that split is how PCA actually runs at 100 TB).
    Upper-triangle (i ≤ j) sample covariances from integer sufficient
    statistics (Σqᵢqⱼ, Σqᵢ, Σqⱼ, n in micro units — order-free, exact
    in int64 through sf0.1's 2e16 products), so the matrix hash-oracles
    exactly. The dim-pair fan-out is O(d²) per row; for d in the
    thousands, swap the self-join for per-partition BLAS outer-product
    accumulation in mapInPandas (the blocked_cosine_pairs pattern) —
    identical sufficient statistics, same exactness.
    tests/test_operators.py::test_emb_covariance_matches_numpy pins the
    full matrix against numpy."""
    ex = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("i0", "x"))
        .select(
            "vec_id",
            (F.col("i0") + 1).alias("i"),
            F.round(F.col("x").cast("double") * F.lit(1000000.0), 0)
            .cast("long")
            .alias("q"),
        )
    )
    a = ex.select("vec_id", F.col("i"), F.col("q").alias("qa"))
    b = ex.select("vec_id", F.col("i").alias("j"), F.col("q").alias("qb"))
    p = a.join(b, "vec_id").filter(F.col("j") >= F.col("i"))
    s = p.groupBy("i", "j").agg(
        F.count("*").alias("n"),
        F.sum(F.col("qa") * F.col("qb")).alias("spp"),
        F.sum("qa").alias("sa"),
        F.sum("qb").alias("sb"),
    )
    return s.select(
        "i",
        "j",
        F.round(
            (F.col("n") * F.col("spp") - F.col("sa") * F.col("sb"))
            * F.lit(1.0)
            / (F.col("n") * (F.col("n") - 1)),
            0,
        )
        .cast("long")
        .alias("cov_micro2"),
    ).orderBy("i", "j")


@register("q_emb_covariance_blas", oracle=None, tags=("llm", "embedding", "ml"))
def q_emb_covariance_blas(spark, sf_dir):
    """The LARGE-d covariance path q_emb_covariance's docstring
    prescribes, as code: per-partition Gram accumulation in mapInPandas
    — each partition quantizes its vectors to int64 micros and emits ONE
    (n, Σq, QᵀQ) partial of d + d² longs; a d²-row final aggregate sums
    the partials and applies the same single terminal rounding. Shuffle
    volume is partitions × d² longs instead of rows × d² pair tuples —
    the blocked-matmul discipline (operators/similarity.py) applied to
    sufficient statistics, which is how a 100 TB corpus computes a
    d=4096 covariance. The matmul runs on int64 (vectorized C; the
    float64-BLAS drop-in trades the exact-integer guarantee above ~9e15
    per-partition sums), so the sufficient statistics are bit-identical
    to the dim-pair join's and the output equals q_emb_covariance
    EXACTLY — pinned by test_emb_covariance_blas_equals_joined.
    Rows-only: the oracle twin IS the oracle-green q_emb_covariance."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    d = emb.select(F.size("embedding").alias("d")).first()["d"]

    def gram(batches):
        import numpy as np
        import pandas as pd

        G = np.zeros((d, d), np.int64)
        s = np.zeros(d, np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64) * 1e6
            # Spark ROUND = half-away-from-zero (BigDecimal HALF_UP):
            # floor(|v|+0.5)·sign(v), NOT np.rint's banker's rounding
            Q = (np.sign(M) * np.floor(np.abs(M) + 0.5)).astype(np.int64)
            G += Q.T @ Q
            s += Q.sum(axis=0)
            n += Q.shape[0]
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [G.reshape(-1).tolist()]}
            )

    parts = emb.mapInPandas(gram, "n bigint, s array<bigint>, g array<bigint>")
    n_df = parts.agg(F.sum("n").alias("n"))
    ssum = (
        parts.select(F.posexplode("s").alias("k", "sv"))
        .groupBy("k")
        .agg(F.sum("sv").alias("sval"))
    )
    gsum = (
        parts.select(F.posexplode("g").alias("k", "gv"))
        .groupBy("k")
        .agg(F.sum("gv").alias("spp"))
        .select(
            F.floor(F.col("k") / d).cast("int").alias("i0"),
            F.pmod(F.col("k"), F.lit(d)).cast("int").alias("j0"),
            "spp",
        )
        .filter(F.col("j0") >= F.col("i0"))
    )
    out = (
        gsum.join(ssum.select(F.col("k").cast("int").alias("i0"),
                              F.col("sval").alias("sa")), "i0")
        .join(ssum.select(F.col("k").cast("int").alias("j0"),
                          F.col("sval").alias("sb")), "j0")
        .crossJoin(F.broadcast(n_df))
    )
    return out.select(
        (F.col("i0") + 1).alias("i"),
        (F.col("j0") + 1).alias("j"),
        F.round(
            (F.col("n") * F.col("spp") - F.col("sa") * F.col("sb"))
            * F.lit(1.0)
            / (F.col("n") * (F.col("n") - 1)),
            0,
        )
        .cast("long")
        .alias("cov_micro2"),
    ).orderBy("i", "j")


_PCA_SPECTRUM_CACHE: dict[str, list] = {}


@register("q_emb_pca_variance", oracle=None, tags=("llm", "embedding", "ml"))
def q_emb_pca_variance(spark, sf_dir):
    """PCA explained-variance spectrum — the driver-side half of the
    split q_emb_covariance documents: the 64×64 covariance (ONE
    distributed pass, exact integer statistics) collects to ~16 KB, the
    symmetric eigensolve runs in numpy on the driver, and only the
    spectrum ships back. This is the honest 100 TB shape for PCA /
    whitening / effective-rank checks: corpus work scales with data,
    the eigensolve is O(d³) on 64 numbers. Rows-only (eigenvalues of a
    float solve have no SQL twin);
    tests/test_operators.py::test_pca_variance_matches_numpy pins the
    spectrum against numpy.eigh of numpy.cov end-to-end."""
    import numpy as np

    from distribot_spark.queries import QUERIES

    # memoized per sf_dir (the BPE-merges pattern): building this
    # DataFrame necessarily RUNS the covariance job + eigensolve, and
    # plan-enumeration consumers (test_plans' builder loop, repeated
    # parity runs) must not pay it more than once per corpus
    if sf_dir not in _PCA_SPECTRUM_CACHE:
        cov_rows = QUERIES["q_emb_covariance"].builder(spark, sf_dir).collect()
        d = max(r.j for r in cov_rows)
        C = np.zeros((d, d))
        for r in cov_rows:
            C[r.i - 1, r.j - 1] = C[r.j - 1, r.i - 1] = r.cov_micro2
        w = np.linalg.eigvalsh(C)[::-1]  # descending
        total = float(w.sum())
        _PCA_SPECTRUM_CACHE[sf_dir] = [
            (
                k + 1,
                float(np.floor(w[k] + 0.5)),
                float(np.floor(w[k] / total * 1e6 + 0.5) / 1e6),
                float(np.floor(w[: k + 1].sum() / total * 1e6 + 0.5) / 1e6),
            )
            for k in range(d)
        ]
    rows = _PCA_SPECTRUM_CACHE[sf_dir]
    return local_rows_df(spark, 
        rows,
        "component int, eigenvalue_micro2 double, explained double,"
        " cumulative double",
    )


@register(
    "doc_zipf_fit",
    oracle="""
    WITH tf AS (
      SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
      FROM documents),
    c AS (SELECT tok, COUNT(*) AS n FROM tf WHERE tok <> '' GROUP BY 1),
    r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rnk FROM c),
    q AS (SELECT CAST(ROUND(log10(rnk) * 1000000) AS BIGINT) AS lx,
                 CAST(ROUND(log10(n) * 1000000) AS BIGINT) AS ly
          FROM r),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(lx) AS BIGINT) AS sx, CAST(SUM(ly) AS BIGINT) AS sy,
                 CAST(SUM(lx * ly) AS BIGINT) AS sxy,
                 CAST(SUM(lx * lx) AS BIGINT) AS sxx
          FROM q)
    SELECT m AS n_terms,
           ROUND((m * sxy - sx * sy) * 1.0 / (m * sxx - sx * sx) * 10000)
             / 10000 + 0.0 AS zipf_slope
    FROM s
    """,
    tags=("llm", "text", "audit"),
)
def doc_zipf_fit(spark, sf_dir):
    """Zipf rank-frequency fit: OLS slope of log-frequency on log-rank
    over the term distribution — natural text sits near −1, and a
    corpus that drifts far from it (template spam, synthetic filler)
    fails the linguistic smell test. Log coordinates quantize to int64
    MICRO units before any summation (the emb_centroids discipline), so
    the regression's sufficient statistics are exact integers and the
    slope hash-oracles; the rank window rides on the distinct-term
    relation. Slope is negative → the spelled-out `+ 0.0` guard."""
    from pyspark.sql import Window as W

    tf = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    c = tf.groupBy("tok").agg(F.count("*").alias("n"))
    r = c.withColumn(
        "rnk", F.row_number().over(W.orderBy(F.desc("n"), "tok"))
    )
    q = r.select(
        F.round(F.log10("rnk") * F.lit(1000000.0), 0).cast("long").alias("lx"),
        F.round(F.log10("n") * F.lit(1000000.0), 0).cast("long").alias("ly"),
    )
    s = q.agg(
        F.count("*").alias("m"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    slope = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) * F.lit(
        1.0
    ) / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return s.select(
        F.col("m").alias("n_terms"),
        (F.round(slope * F.lit(10000.0), 0) / F.lit(10000.0) + F.lit(0.0))
        .alias("zipf_slope"),
    )


_CONTAIN_ORACLE = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id AS doc,
                  unnest([array_to_string(w[i:i+2], ' ')
                          FOR i IN range(1, len(w) - 1)]) AS s
           FROM t),
    dd AS (SELECT DISTINCT doc, s FROM sh),
    sz AS (SELECT doc, COUNT(*) AS n FROM dd GROUP BY doc),
    pairs AS (SELECT a.doc AS da, b.doc AS db, COUNT(*) AS inter
              FROM dd a JOIN dd b ON a.s = b.s AND a.doc <> b.doc
              GROUP BY 1, 2)
    SELECT da, db, CAST(inter AS BIGINT) AS inter,
           CAST(sa.n AS BIGINT) AS size_a,
           ROUND(inter * 1.0 / sa.n * 1000) / 1000 AS containment
    FROM pairs JOIN sz sa ON da = sa.doc
    WHERE inter * 1.0 / sa.n >= 0.8
    ORDER BY da, db
"""


@register("dedup_containment", oracle=_CONTAIN_ORACLE, tags=("llm", "dedup"))
def dedup_containment(spark, sf_dir):
    """ASYMMETRIC containment near-dup: C(a→b) = |A∩B| / |A| ≥ 0.8 —
    doc a's shingles mostly inside doc b. This catches quote inclusion
    and wholesale excerpting (small doc ⊂ big doc), which symmetric
    Jaccard structurally MISSES: |A∩B|/|A∪B| is tiny when |B| ≫ |A|
    even at full containment — and so does MinHash LSH, whose collision
    odds track Jaccard. Directional pairs over the hashed-shingle join
    (the l2 machinery); SCALE NOTE: the production candidate generator
    for containment is the contained side's shingles probed against a
    container-side shingle index with a document-frequency prefix
    filter (the dedup_tf_cosine max_df move), not symmetric banding."""
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingle_hashes(docs, "text", "doc_id", 3)
    sz = sh.groupBy("doc").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc").alias("da"), "h")
    b = sh.select(F.col("doc").alias("db"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("da") != F.col("db"))
        .groupBy("da", "db")
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(sz.select(F.col("doc").alias("da"), F.col("n").alias("size_a")), "da")
        .filter(F.col("inter") * F.lit(1.0) / F.col("size_a") >= 0.8)
        .select(
            "da",
            "db",
            "inter",
            "size_a",
            (
                F.round(
                    F.col("inter") * F.lit(1.0) / F.col("size_a")
                    * F.lit(1000.0),
                    0,
                )
                / F.lit(1000.0)
            ).alias("containment"),
        )
        .orderBy("da", "db")
    )


@register(
    "doc_boilerplate_prefixes",
    oracle="""
    WITH p AS (
      SELECT source, doc_id,
             array_to_string((string_split(lower(text), ' '))[1:6], ' ')
               AS prefix
      FROM documents),
    c AS (SELECT source, prefix, COUNT(*) AS n_docs
          FROM p GROUP BY 1, 2 HAVING COUNT(*) >= 3)
    SELECT source, prefix, n_docs FROM c
    ORDER BY n_docs DESC, source, prefix LIMIT 20
    """,
    tags=("llm", "text", "boilerplate"),
)
def doc_boilerplate_prefixes(spark, sf_dir):
    """Boilerplate detection (the C4-style template screen): leading
    6-token prefixes shared by ≥ 3 documents of the same source —
    repeated openings mark scraper templates, cookie banners, and
    licence headers that a cleaning pass should strip before training.
    Pure codegen projection + one map-side-combined count on (source,
    prefix); the HAVING prune keeps only template candidates. At
    corpus scale the same query runs per-shard and merges by summing
    counts (plain additive aggregate)."""
    docs = load_table(spark, sf_dir, "documents")
    p = docs.select(
        "source",
        F.array_join(
            F.slice(F.split(F.lower("text"), " "), 1, 6), " "
        ).alias("prefix"),
    )
    return (
        p.groupBy("source", "prefix")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 3)
        .orderBy(F.desc("n_docs"), "source", "prefix")
        .limit(20)
    )


_L2_EXPR = """
      list_sum(list_transform(qv, x -> x * x))
      + list_sum(list_transform(v, x -> x * x))
      - 2 * list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * v[i]))
"""


@register(
    "l3_rrf_fusion",
    oracle=f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
    c AS (SELECT vec_id AS nid, v FROM e WHERE vec_id >= 10),
    pairs AS (SELECT qid, nid, {_COSINE_EXPR} AS cos, {_L2_EXPR} AS d2
              FROM q, c),
    r1 AS (SELECT qid, nid,
                  ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY cos DESC, nid) AS rnk
           FROM pairs QUALIFY rnk <= 20),
    r2 AS (SELECT qid, nid,
                  ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY d2, nid) AS rnk
           FROM pairs QUALIFY rnk <= 20),
    {_rrf_oracle_tail("r1", "r2", "rnk", "rnk", "rrf_score")}
    """,
    tags=("llm", "similarity", "fusion"),
)
def l3_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion (Cormack et al. 2009) — THE hybrid-
    retrieval combiner: two top-20 candidate pools ranked by DIFFERENT
    metrics (cosine and L2 — proxies for the dense/lexical pair in a
    RAG stack) merge by Σ 1/(60 + rank), which needs no score
    calibration between the systems. Scores derive from INTEGER ranks,
    so the fusion hash-oracles exactly; pools full-outer-join on
    (qid, nid) and absent ranks contribute nothing — the standard RRF
    pool convention. Per-query windows over 20-row pools; at 100 TB
    the pools come from the IVF/PQ tiers, fusion cost is unchanged."""
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    r1 = similarity.cosine_topk(corpus, queries, k=20).select(
        "qid", "nid", F.col("rnk").alias("r1")
    )
    # L2 pool with the same staged-norm discipline as cosine_topk
    q = queries.selectExpr(
        "vec_id AS qid", "transform(embedding, x -> CAST(x AS DOUBLE)) AS qv"
    ).selectExpr(
        "qid", "qv",
        "aggregate(transform(qv, x -> x * x), 0D, (a, b) -> a + b) AS qs",
    )
    c = corpus.selectExpr(
        "vec_id AS nid", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
    ).selectExpr(
        "nid", "v",
        "aggregate(transform(v, x -> x * x), 0D, (a, b) -> a + b) AS vs",
    )
    scored = F.broadcast(q).crossJoin(c).selectExpr(
        "qid", "nid",
        "qs + vs - 2 * aggregate(zip_with(qv, v, (a, b) -> a * b),"
        " 0D, (a, b) -> a + b) AS d2",
    )
    w2 = W.partitionBy("qid").orderBy("d2", "nid")
    r2 = (
        scored.withColumn("r2", F.row_number().over(w2))
        .filter(F.col("r2") <= 20)
        .select("qid", "nid", "r2")
    )
    return similarity.rrf_fuse(
        r1.withColumnRenamed("r1", "ra"),
        r2.withColumnRenamed("r2", "rb"),
        score_col="rrf_score",
    ).orderBy("qid", "rnk")


# Okapi BM25 per-(query, doc) integer-quantized scores over the documents
# table (shared by l3_bm25_topk and the hybrid fusion): ends at CTE
# `scores(qdoc, doc, ci)` where ci = Σ round(per-term BM25 · 1e4).
_BM25_SCORES_CTE = """toks AS (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
                  FROM documents),
    tf AS (SELECT doc, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc, SUM(tf) AS dl FROM tf GROUP BY 1),
    n AS (SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                 (SELECT SUM(dl) / CAST(COUNT(*) AS DOUBLE) FROM dl) AS avgdl),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    qd AS (SELECT doc_id AS qdoc FROM documents ORDER BY doc_id LIMIT 3),
    ti AS (SELECT term, LN((n_docs + 1) / (df + 1)) + 1 AS idf FROM dfreq, n),
    qs AS (SELECT tf.doc AS qdoc, tf.term, tf.tf * idf AS s
           FROM tf JOIN qd ON tf.doc = qd.qdoc JOIN ti ON tf.term = ti.term),
    qt AS (SELECT qdoc, term FROM (
             SELECT qdoc, term,
                    ROW_NUMBER() OVER (PARTITION BY qdoc
                                       ORDER BY s DESC, term) AS r
             FROM qs) WHERE r <= 3),
    bi AS (SELECT term,
                  LN(1.0e0 + (n_docs - df + 0.5e0) / (df + 0.5e0)) AS bidf
           FROM dfreq, n),
    contrib AS (SELECT qt.qdoc, tf.doc,
                  CAST(ROUND(bidf * tf.tf * 2.2e0
                    / (tf.tf + 1.2e0 * (0.25e0 + 0.75e0 * dl.dl / avgdl))
                    * 10000) AS BIGINT) AS c
                FROM qt JOIN tf ON tf.term = qt.term
                JOIN bi ON bi.term = qt.term
                JOIN dl ON dl.doc = tf.doc, n),
    scores AS (SELECT qdoc, doc, SUM(c) AS ci FROM contrib GROUP BY 1, 2)"""


@register(
    "l3_bm25_topk",
    oracle=f"""
    WITH {_BM25_SCORES_CTE},
    ranked AS (SELECT qdoc, doc, ci,
                      ROW_NUMBER() OVER (PARTITION BY qdoc
                                         ORDER BY ci DESC, doc) AS rnk
               FROM scores)
    SELECT qdoc, doc, rnk, ci / CAST(10000 AS DOUBLE) AS bm25
    FROM ranked WHERE rnk <= 5 ORDER BY qdoc, rnk
    """,
    tags=("llm", "retrieval", "text"),
)
def l3_bm25_topk(spark, sf_dir):
    """Okapi BM25 sparse retrieval (Robertson & Zaragoza 2009), the
    lexical half of hybrid search next to the dense l3 tiers (exact /
    LSH / IVF / PQ) — fuse the two pools with l3_rrf_fusion's RRF.
    Query-by-example: the 3 smallest doc_ids query the corpus with
    their top-3 TF-IDF terms; top-5 per query by BM25 (k1=1.2, b=0.75).
    Determinism: per-term contributions are quantized to int64 (1e-4)
    BEFORE the per-(query, doc) sum, so float addition order can't
    shift the hash; idf/length math is one identical IEEE expression
    tree in both engines (e-notation literals keep DuckDB in DOUBLE,
    not DECIMAL). Scale shape in operators/text.py:bm25_topk — postings
    built once, query-term table broadcast (map-only semi-join
    reduction), corpus never reshuffles per query."""
    docs = load_table(spark, sf_dir, "documents")
    return text.bm25_topk(
        docs, "text", "doc_id", n_query_docs=3, terms_per_query=3, k=5
    ).orderBy("qdoc", "rnk")


@register(
    "l3_bm25_serve",
    oracle=f"""
    WITH {_BM25_SCORES_CTE},
    ranked AS (SELECT qdoc, doc, ci,
                      ROW_NUMBER() OVER (PARTITION BY qdoc
                                         ORDER BY ci DESC, doc) AS rnk
               FROM scores)
    SELECT qdoc, doc, rnk, ci / CAST(10000 AS DOUBLE) AS bm25
    FROM ranked WHERE rnk <= 5 ORDER BY qdoc, rnk
    """,
    tags=("llm", "retrieval", "index"),
)
def l3_bm25_serve(spark, sf_dir):
    """BM25 served from PERSISTED index artifacts (operators/index.py —
    train once, serve many): postings/docfreq/doclen/docs/stats are
    materialized parquet, built on first call per corpus and REUSED on
    every later call, and serving routes the loaded relations through
    the same `_bm25_rank` core as l3_bm25_topk — whose oracle this
    query shares, certifying artifacts ≡ corpus. The serve plan never
    scans the corpus: it reads the queried terms' postings plus the
    bounded stats scalars (incremental shard maintenance and its
    merge-equals-rebuild contract: tests/test_retrieval_index.py)."""
    import os as _os

    from distribot_spark.operators import index as rindex
    from distribot_spark.streaming.replay import TMP_ROOT

    tag = _os.path.basename(sf_dir.rstrip("/"))
    ix_dir = _os.path.join(TMP_ROOT, f"bm25_ix_{tag}")
    if not _os.path.isdir(_os.path.join(ix_dir, "stats")):
        rindex.build_bm25_index(load_table(spark, sf_dir, "documents"), ix_dir)
    return rindex.serve_bm25_topk(
        spark, ix_dir, n_query_docs=3, terms_per_query=3, k=5
    ).orderBy("qdoc", "rnk")


@register("l3_ivf_serve", oracle=None, tags=("llm", "similarity", "index"))
def l3_ivf_serve(spark, sf_dir):
    """IVF ANN served from a PERSISTED index (operators/index.py): the
    codebook and the cluster-partitioned corpus layout are parquet
    artifacts built once per corpus; probing reads ONLY the probed
    cid=… partitions (partition pruning is the artifact's point).
    Approximate like l3_ivf_topk (no hash oracle); tests pin exact row
    equality to the direct ivf_topk with the same codebook parameters,
    plus the pruned-scan property."""
    import os as _os

    from distribot_spark.operators import index as rindex
    from distribot_spark.streaming.replay import TMP_ROOT

    tag = _os.path.basename(sf_dir.rstrip("/"))
    ix_dir = _os.path.join(TMP_ROOT, f"ivf_ix_{tag}")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    if not _os.path.isdir(_os.path.join(ix_dir, "centroids")):
        corpus = emb.filter(F.col("vec_id") >= 10)
        rindex.build_ivf_index(corpus, ix_dir, n_clusters=16)
    return rindex.serve_ivf_topk(
        spark, ix_dir, queries, k=5, n_probe=4
    ).orderBy("qid", "rnk")


@register("l3_ivf_append_serve", oracle=None,
          tags=("llm", "similarity", "index", "incremental"))
def l3_ivf_append_serve(spark, sf_dir):
    """IVF incremental maintenance (operators/index.py
    `append_ivf_shard` — the IVF twin of merge_bm25_shard): the index
    is built on HALF the corpus (training the codebook), the other half
    is appended as a shard assigned to the EXISTING codebook in a
    shard-local job writing straight into the cid-partitioned layout —
    the base vectors are never re-read — and serving probes the merged
    index. Drift sufficient statistics (additive int64 micro partials)
    ride along as the honest retrain signal; the builder asserts the
    appended rows landed and drift stayed finite. merge ≡
    rebuild-with-same-codebook and the drift-rises-on-shift contract
    are pinned by tests/test_retrieval_index.py (rows-only here: the
    scores need the trained codebook, which DuckDB cannot reproduce —
    same ≈ status as l3_ivf_serve)."""
    import os as _os
    import shutil as _shutil

    from distribot_spark.operators import index as rindex
    from distribot_spark.streaming.replay import TMP_ROOT

    tag = _os.path.basename(sf_dir.rstrip("/"))
    ix_dir = _os.path.join(TMP_ROOT, f"ivf_app_{tag}")
    _shutil.rmtree(ix_dir, ignore_errors=True)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    half = emb.filter(F.col("vec_id") >= 10).agg(
        F.expr("percentile(vec_id, 0.5e0)")
    ).first()[0]
    base = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") <= half))
    shard = emb.filter(F.col("vec_id") > half)
    rindex.build_ivf_index(base, ix_dir, n_clusters=16)
    st = rindex.append_ivf_shard(spark, ix_dir, shard)
    assert st["n_appended"] > 0, st
    assert 0 < st["mean_dist_e6_after"] < 2_000_000, st
    return rindex.serve_ivf_topk(
        spark, ix_dir, queries, k=5, n_probe=4
    ).orderBy("qid", "rnk")


@register("l3_ivf_retrain_serve", oracle=None,
          tags=("llm", "similarity", "index", "incremental", "retrain"))
def l3_ivf_retrain_serve(spark, sf_dir):
    """IVF RETRAIN-AND-SWAP (operators/index.py `retrain_ivf_index` —
    VERDICT r7 task 4, closing the drift loop): the index is built on
    half the corpus, the other half appended SHIFTED (×0.3 + 0.8 per
    component) so the frozen codebook visibly no longer describes the
    data — the additive drift partials rise — then the retrain
    consumes the signal: warm-started distributed Lloyd over the
    index's own vectors (per-iteration cost: one broadcast-codebook
    matmul + a k×dim partial agg), one re-assignment pass, and an
    ATOMIC two-phase directory swap (marker-committed, any crash point
    heals on the next entry). The builder asserts drift FELL and
    serving still probes partition-pruned. Rows-only (trained
    codebooks are not DuckDB-reproducible — the l3_ivf_serve status);
    serve-after-retrain ≡ rebuild-from-scratch under the retrained
    codebook and the crash-heal protocol are pinned by
    tests/test_retrieval_index.py."""
    import os as _os
    import shutil as _shutil

    from distribot_spark.operators import index as rindex
    from distribot_spark.streaming.replay import TMP_ROOT

    tag = _os.path.basename(sf_dir.rstrip("/"))
    ix_dir = _os.path.join(TMP_ROOT, f"ivf_rt_{tag}")
    _shutil.rmtree(ix_dir, ignore_errors=True)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    base = emb.filter((F.col("vec_id") >= 10)
                      & (F.col("vec_id") % 2 == 0))
    shard = emb.filter((F.col("vec_id") >= 10)
                       & (F.col("vec_id") % 2 == 1)).withColumn(
        "embedding", F.expr("transform(embedding, x -> x * 0.3 + 0.8)"))
    rindex.build_ivf_index(base, ix_dir, n_clusters=16)
    st = rindex.append_ivf_shard(spark, ix_dir, shard)
    assert st["mean_dist_e6_after"] > st["mean_dist_e6_before"], st
    rt = rindex.retrain_ivf_index(spark, ix_dir, iters=3)
    assert rt["drift_after_e6"] < rt["drift_before_e6"], rt
    return rindex.serve_ivf_topk(
        spark, ix_dir, queries, k=5, n_probe=4
    ).orderBy("qid", "rnk")


@register(
    "l3_hybrid_bm25_dense",
    oracle=f"""
    WITH {_BM25_SCORES_CTE},
    lexr AS (SELECT qdoc AS qid, doc AS nid,
                    ROW_NUMBER() OVER (PARTITION BY qdoc
                                       ORDER BY ci DESC, doc) AS rl
             FROM scores QUALIFY rl <= 20),
    e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM e
          JOIN qd ON e.vec_id = qd.qdoc),
    c AS (SELECT vec_id AS nid, v FROM e),
    pairs AS (SELECT qid, nid, {_COSINE_EXPR} AS cos FROM q, c),
    denser AS (SELECT qid, nid,
                      ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY cos DESC, nid) AS rd
               FROM pairs QUALIFY rd <= 20),
    {_rrf_oracle_tail("lexr", "denser", "rl", "rd", "hybrid_score")}
    """,
    tags=("llm", "retrieval", "fusion"),
)
def l3_hybrid_bm25_dense(spark, sf_dir):
    """TRUE hybrid retrieval — the RAG-stack shape l3_rrf_fusion proxies:
    a LEXICAL pool (Okapi BM25 top-20 over documents.text) and a DENSE
    pool (exact cosine top-20 over the row-aligned embeddings table,
    doc_id ≡ vec_id) fused per query by reciprocal-rank Σ 1/(60+rank).
    The two rankers run on DIFFERENT MODALITIES of the same corpus; RRF
    needs no score calibration between them, and integer ranks make the
    fusion hash-exact. Scale: each pool is the already-plan-gated
    operator (BM25 = broadcast query terms over postings; dense =
    broadcast queries, window top-k), and the fusion joins two ≤(q×20)
    pools — cost independent of corpus size. Swap the dense pool for
    the IVF/PQ tier at 100 TB; the fusion is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    # ONE query-id set for both modalities: the 3 smallest doc_ids
    # (doc_id ≡ vec_id row alignment; the dense queries semi-join this
    # set rather than re-deriving it with a literal predicate).
    qd = docs.select(F.col("doc_id").alias("qdoc")).orderBy("qdoc").limit(3)
    lex = text.bm25_topk(
        docs, "text", "doc_id", n_query_docs=3, terms_per_query=3, k=20
    ).select(
        F.col("qdoc").alias("qid"),
        F.col("doc").alias("nid"),
        F.col("rnk").alias("ra"),
    )
    dense_queries = emb.join(
        F.broadcast(qd), emb.vec_id == qd.qdoc
    ).select(emb.vec_id, emb.embedding, emb.label)
    dense = similarity.cosine_topk(emb, dense_queries, k=20).select(
        "qid", "nid", F.col("rnk").alias("rb")
    )
    return similarity.rrf_fuse(lex, dense, score_col="hybrid_score").orderBy(
        "qid", "rnk"
    )


_DUP_SPANS_ORACLE = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (SELECT doc_id, i AS p, array_to_string(w[i:i+4], ' ') AS g
          FROM w, LATERAL unnest(range(1, len(w) - 3)) AS t(i)),
    dup AS (SELECT g FROM g GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
    seeds AS (SELECT doc_id, p FROM g JOIN dup USING (g)),
    lagged AS (SELECT doc_id, p,
                      LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
               FROM seeds),
    isl AS (SELECT doc_id, p,
                   SUM(CASE WHEN prev IS NULL OR p - prev > 5 THEN 1 ELSE 0
                       END) OVER (PARTITION BY doc_id ORDER BY p) AS isl
            FROM lagged),
    spans AS (SELECT doc_id, isl, MIN(p) AS fp, MAX(p) AS lp
              FROM isl GROUP BY 1, 2),
    per_doc AS (SELECT doc_id, COUNT(*) AS n_spans,
                       SUM(lp - fp + 5) AS dup_tokens
                FROM spans GROUP BY 1)
    SELECT d.doc_id, CAST(n_spans AS BIGINT) AS n_spans,
           CAST(dup_tokens AS BIGINT) AS dup_tokens,
           CAST(len(w.w) AS BIGINT) AS n_tokens,
           ROUND(dup_tokens * 1.0 / len(w.w) * 1000000) / 1000000 AS dup_frac
    FROM per_doc d JOIN w USING (doc_id)
    ORDER BY doc_id
    """


@register(
    "doc_dup_spans",
    oracle=_DUP_SPANS_ORACLE,
    tags=("llm", "dedup", "text"),
)
def doc_dup_spans(spark, sf_dir):
    """Exact duplicated-SPAN detection — the substring tier of the dedup
    ladder (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better": suffix-array ExactSubstr dedup), distributed: a
    5-token gram shared by ≥2 documents is a duplication seed, and a
    doc's overlapping/adjacent seeds merge into MAXIMAL duplicated spans
    via per-doc gaps-and-islands (new island when the next seed starts
    past the previous seed's coverage). Reports per contaminated doc the
    span census (n_spans, dup_tokens, dup_frac) a span-level scrubber
    would cut — document-level near-dup (MinHash) can't see a copied
    paragraph inside an otherwise-unique page; this can. All shuffles
    are bounded: grams partial-aggregate map-side, only multi-doc grams
    come back (semi-join), islands are per-doc windows. At 100 TB the
    gram string is replaced by xxhash64(gram) before the shuffle (8
    bytes vs ~30) — that path is `doc_dup_spans_hashed` (same oracle);
    this one keeps the text so both spellings stay certified."""
    return _dup_span_census(spark, sf_dir, hashed=False)


@register(
    "doc_dup_spans_hashed",
    oracle=_DUP_SPANS_ORACLE,
    tags=("llm", "dedup", "text", "hashed"),
)
def doc_dup_spans_hashed(spark, sf_dir):
    """doc_dup_spans' 100 TB spelling: `dup_spans(..., hashed=True)`
    shuffles xxhash64(gram) longs instead of gram TEXT — the widest
    shuffle of the job drops from ~30 bytes/row to 8 — with the span
    logic untouched. Shares doc_dup_spans' full oracle: identical span
    census modulo 64-bit collisions, which the oracle run certifies are
    absent on this corpus (and are ~n_grams²/2⁶⁵ expected at scale).
    The scrubber composes unchanged
    (`test_scrub_composes_with_hashed_spans`)."""
    return _dup_span_census(spark, sf_dir, hashed=True)


def _dup_span_census(spark, sf_dir, hashed):
    from distribot_spark.operators.dedup import dup_spans

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split("text", " ").alias("w"))
    spans = dup_spans(docs, "text", "doc_id", n=5, hashed=hashed)
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("lp") - F.col("fp") + 5).alias("dup_tokens"),
    )
    return (
        per_doc.join(w.select("doc_id", F.size("w").alias("nt")), "doc_id")
        .select(
            "doc_id",
            F.col("n_spans").cast("long").alias("n_spans"),
            F.col("dup_tokens").cast("long").alias("dup_tokens"),
            F.col("nt").cast("long").alias("n_tokens"),
            (
                F.round(
                    F.col("dup_tokens") * F.lit(1.0) / F.col("nt") * 1000000.0, 0
                )
                / F.lit(1000000.0)
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_scrub_spans",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (SELECT doc_id, i AS p, array_to_string(w[i:i+4], ' ') AS g
          FROM w, LATERAL unnest(range(1, len(w) - 3)) AS t(i)),
    dup AS (SELECT g FROM g GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
    seeds AS (SELECT doc_id, p FROM g JOIN dup USING (g)),
    lagged AS (SELECT doc_id, p,
                      LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
               FROM seeds),
    isl AS (SELECT doc_id, p,
                   SUM(CASE WHEN prev IS NULL OR p - prev > 5 THEN 1 ELSE 0
                       END) OVER (PARTITION BY doc_id ORDER BY p) AS isl
            FROM lagged),
    spans AS (SELECT doc_id, isl, MIN(p) AS fp, MAX(p) + 4 AS cov
              FROM isl GROUP BY 1, 2),
    toks AS (SELECT doc_id, i AS p, w[i] AS tok
             FROM w, LATERAL unnest(range(1, len(w) + 1)) AS t(i)),
    kept AS (SELECT t.doc_id, t.p, t.tok
             FROM toks t
             WHERE NOT EXISTS (SELECT 1 FROM spans s
                               WHERE s.doc_id = t.doc_id
                                 AND t.p BETWEEN s.fp AND s.cov)),
    scrubbed AS (SELECT doc_id,
                        COALESCE(string_agg(tok, ' ' ORDER BY p), '') AS txt,
                        COUNT(*) AS n_after
                 FROM kept GROUP BY doc_id)
    SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_tokens_before,
           CAST(COALESCE(s.n_after, 0) AS BIGINT) AS n_tokens_after,
           md5(COALESCE(s.txt,
                        CASE WHEN len(w.w) >= 5 THEN ''
                             ELSE array_to_string(w.w, ' ') END))
             AS scrubbed_md5
    FROM w LEFT JOIN scrubbed s USING (doc_id)
    ORDER BY w.doc_id
    """,
    tags=("llm", "dedup", "text"),
)
def doc_scrub_spans(spark, sf_dir):
    """The REMOVAL half of span-level dedup (doc_dup_spans detects; this
    scrubs): every token covered by a cross-document duplicated span is
    cut, the survivors rejoin in order, and the census reports
    before/after token counts plus the md5 of the scrubbed text — the
    content hash a downstream exact-dedup pass would key on, and what
    makes the full rewrite hash-verifiable against the oracle. Fully
    scrubbed documents (the planted near-dups) come out empty — the rows
    a quality gate drops. Shapes: the span set rejoins the token stream
    per document (equi-join on doc_id + bounded range predicate; spans
    per doc are few), ordered reassembly is an array_sort over (p, tok)
    structs — no window, no driver. Documents shorter than the gram
    width pass through untouched by construction. Composes unchanged
    with the hashed-gram span path (`_scrub_span_census(hashed=True)`,
    pinned by `test_scrub_composes_with_hashed_spans`)."""
    return _scrub_span_census(spark, sf_dir, hashed=False)


def _scrub_span_census(spark, sf_dir, hashed):
    from distribot_spark.operators.dedup import dup_spans

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.split("text", " ").alias("w"))
    spans = dup_spans(docs, "text", "doc_id", n=5, hashed=hashed).select(
        "doc_id", "fp", (F.col("lp") + 4).alias("cov")
    )
    toks = w.select(
        "doc_id", F.posexplode("w").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    # one range ANTI-join: a token survives iff no span of its doc covers
    # its position (bracket access: DataFrame.cov is the covariance METHOD)
    kept = toks.join(
        spans,
        (toks.doc_id == spans.doc_id)
        & (toks.p >= spans.fp)
        & (toks.p <= spans["cov"]),
        "left_anti",
    )
    scrubbed = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda s: s.tok,
            ),
        ).alias("txt"),
        F.count("*").alias("n_after"),
    )
    return (
        w.join(scrubbed, "doc_id", "left")
        .select(
            "doc_id",
            F.size("w").cast("long").alias("n_tokens_before"),
            F.coalesce("n_after", F.lit(0)).cast("long").alias("n_tokens_after"),
            F.md5(
                F.coalesce(
                    F.col("txt"),
                    F.when(F.size("w") >= 5, F.lit("")).otherwise(
                        F.concat_ws(" ", F.col("w"))
                    ),
                )
            ).alias("scrubbed_md5"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_mixture_plan",
    oracle=f"""
    WITH d AS (SELECT doc_id, source,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
               FROM documents),
    per AS (SELECT source, COUNT(*) AS n_docs, SUM(tok) AS tok_s
            FROM d GROUP BY 1),
    perq AS (SELECT source, n_docs, tok_s,
                    CAST(FLOOR(SQRT(CAST(tok_s AS DOUBLE)) * 1000000)
                         AS BIGINT) AS qs
             FROM per),
    tot AS (SELECT SUM(tok_s) AS tk_total, SUM(qs) AS q_total FROM perq),
    plan AS (SELECT source, n_docs, tok_s,
                    (qs * 1000000) // q_total AS share_micro,
                    LEAST(1000000,
                          (((tk_total // 2) * ((qs * 1000000) // q_total))
                           // 1000000) * 1000000 // tok_s) AS rate_micro
             FROM perq, tot),
    kept AS (SELECT d.source, d.tok
             FROM d JOIN plan USING (source)
             WHERE {{hash}} < rate_micro)
    SELECT p.source, CAST(p.n_docs AS BIGINT) AS n_docs,
           CAST(p.tok_s AS BIGINT) AS n_tokens,
           CAST(p.share_micro AS BIGINT) AS share_micro,
           CAST(p.rate_micro AS BIGINT) AS rate_micro,
           CAST(COALESCE(k.sd, 0) AS BIGINT) AS sampled_docs,
           CAST(COALESCE(k.st, 0) AS BIGINT) AS sampled_tokens
    FROM plan p
    LEFT JOIN (SELECT source, COUNT(*) AS sd, SUM(tok) AS st
               FROM kept GROUP BY 1) k USING (source)
    ORDER BY p.source
    """.replace("{hash}", _bloom_position_sql("doc_id", 1000000, 0)),
    tags=("llm", "sampling"),
)
def doc_mixture_plan(spark, sf_dir):
    """Training-data MIXTURE planning + execution in one pass:
    temperature sampling over sources (the multilingual-LM standard,
    τ = 0.5 — target share ∝ √tokens, which up-weights small sources
    without letting any one dominate), then a DETERMINISTIC hash sample
    at the per-source rate that hits the half-corpus token budget.
    Everything after one IEEE sqrt per source is integer arithmetic
    (micro-quantized shares, integer DIV), and the sample predicate is
    the spelled-out portable hash family (operators/bloom.py), so the
    PLAN and the ACTUAL SAMPLED COUNTS both hash-oracle. At 100 TB the
    plan side is a per-source aggregate (map-side combined) and the
    sample is a map-only filter with the broadcast 5-row rate table —
    re-runnable idempotently because membership is a pure function of
    doc_id, the property that lets a mixture refresh resample without
    reshuffling previous epochs."""
    from distribot_spark.operators.bloom import _position

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("tok")
    )
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("tok").alias("tok_s")
    )
    perq = per.withColumn(
        "qs",
        F.floor(F.sqrt(F.col("tok_s").cast("double")) * 1000000.0).cast("long"),
    )
    tot = perq.agg(
        F.sum("tok_s").alias("tk_total"), F.sum("qs").alias("q_total")
    )
    plan = perq.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tok_s",
        F.expr("(qs * 1000000) DIV q_total").alias("share_micro"),
        F.least(
            F.lit(1000000),
            F.expr(
                "(((tk_total DIV 2) * ((qs * 1000000) DIV q_total))"
                " DIV 1000000) * 1000000 DIV tok_s"
            ),
        ).alias("rate_micro"),
    )
    kept = docs.join(
        F.broadcast(plan.select("source", "rate_micro")), "source"
    ).filter(_position(F.col("doc_id"), 1000000, 0) < F.col("rate_micro"))
    sampled = kept.groupBy("source").agg(
        F.count("*").alias("sd"), F.sum("tok").alias("st")
    )
    return (
        plan.join(sampled, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("tok_s").cast("long").alias("n_tokens"),
            F.col("share_micro").cast("long").alias("share_micro"),
            F.col("rate_micro").cast("long").alias("rate_micro"),
            F.coalesce("sd", F.lit(0)).cast("long").alias("sampled_docs"),
            F.coalesce("st", F.lit(0)).cast("long").alias("sampled_tokens"),
        )
        .orderBy("source")
    )


@register(
    "dedup_clusters_star",
    oracle=QUERIES["dedup_clusters"].oracle,
    tags=("llm", "dedup", "components"),
)
def dedup_clusters_star(spark, sf_dir):
    """dedup_clusters computed by the PUBLISHED two-phase star algorithm
    (Kiveris et al. 2014; operators/components.connected_components_star)
    instead of min-label propagation: alternate large-star / small-star
    until the pair graph is a forest of depth-1 stars rooted at each
    component's minimum. Same clusters, same oracle (the recursive-CTE
    closure) — the algorithm whose intermediate neighborhoods are
    BOUNDED by the input's, the property that matters when a 100 TB dup
    graph contains hub documents (boilerplate duplicated everywhere)
    that would make propagation's neighbor-min fan-in a hot key."""
    from pyspark.sql import Window as _W

    from distribot_spark.operators.components import connected_components_star

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_candidate_pairs(docs, "text", "doc_id", threshold=0.5)
    cc = connected_components_star(pairs)
    w = _W.partitionBy("comp")
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        F.count("*").over(w).alias("cluster_size"),
        (F.col("id") == F.col("comp")).alias("is_canonical"),
    ).orderBy("doc_id")


@register("l2_minhash_serve", oracle=_JACCARD_ORACLE,
          tags=("llm", "dedup", "lsh", "index", "incremental"))
def l2_minhash_serve(spark, sf_dir):
    """INCREMENTAL corpus dedup off a persisted MinHash/LSH index
    (operators/index.py `build_minhash_index` / `append_minhash_shard`
    / `probe_minhash_index` — the L2 analog of merge_bm25_shard /
    append_ivf_shard): the real 100 TB crawl loop is "dedup the NEW
    shard against the standing corpus", never re-shingle everything.
    The standing index is built on two-thirds of the documents
    (band-bucket entries partitioned by pmod(bucket, parts) +
    distinct hashed shingles as parquet artifacts); the remaining
    third arrives as a crawl shard, is APPENDED shard-locally (base
    artifacts never re-read), and the probe finds its near-duplicates
    touching only COLLIDING buckets — partition-pruned index scan,
    probe side broadcast (both plan-gated), exact Jaccard
    verification on a candidate-pruned shingle subset. Standing-
    corpus pairs were computed once at build; union with the probe's
    shard-involving pairs reconstructs the FULL pair set, so this
    query shares l2_minhash_pairs' exact-Jaccard oracle VERBATIM —
    the serve path provably loses no pair the batch path finds.
    append-then-probe ≡ rebuild-then-probe is pinned table-for-table
    by tests/test_retrieval_index.py."""
    import os as _os
    import shutil as _shutil

    from distribot_spark.operators import index as rindex
    from distribot_spark.streaming.replay import TMP_ROOT

    tag = _os.path.basename(sf_dir.rstrip("/"))
    ix_dir = _os.path.join(TMP_ROOT, f"mh_ix_{tag}")
    _shutil.rmtree(ix_dir, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 3 > 0)
    shard = docs.filter(F.col("doc_id") % 3 == 0)
    rindex.build_minhash_index(base, ix_dir)
    # standing-corpus pairs from the artifacts the build just wrote —
    # NOT recomputed from text (r9 optimization: the old
    # minhash_candidate_pairs(base) call re-paid the full shingle +
    # signature pass over the standing corpus that build_minhash_index
    # had already materialized as buckets/ + shingles/; row-identical
    # by construction, certified by the shared exact-Jaccard oracle)
    base_pairs = rindex.minhash_index_pairs(spark, ix_dir, threshold=0.5)
    # one shingle+signature pass for the shard, shared by append & probe
    rel = rindex.shard_minhash_relations(spark, ix_dir, shard)
    rindex.append_minhash_shard(spark, ix_dir, shard, relations=rel)
    shard_pairs = rindex.probe_minhash_index(
        spark, ix_dir, shard, threshold=0.5, relations=rel)
    return (
        base_pairs.unionByName(shard_pairs)
        .dropDuplicates(["da", "db"])
        .orderBy("da", "db")
    )


@register("l2_minhash_optimize_serve", oracle=_JACCARD_ORACLE,
          tags=("llm", "dedup", "lsh", "index", "incremental",
                "optimize"))
def l2_minhash_optimize_serve(spark, sf_dir):
    """INDEX SHARD COMPACTION (operators/index.py
    `optimize_minhash_index` — VERDICT r8 task 6): the incremental
    crawl loop of l2_minhash_serve accretes per-shard files in every
    pb partition of the standing LSH index, so a long-lived index
    makes every probe open O(appends) files per pruned partition. This
    query runs the SAME workload as l2_minhash_serve — build on
    two-thirds, append the crawl shard — then OPTIMIZES the index
    (rewrites buckets/ to one file per pb partition and shingles/ to a
    bounded count, swapped atomically under the crash-healing OPTIMIZE
    marker) and probes the COMPACTED artifacts. It shares
    l2_minhash_pairs' exact-Jaccard oracle VERBATIM, certifying
    probe-after-compact ≡ probe-before table-for-table (the OPTIMIZE
    contract tables already have, applied to index artifacts); the
    compacted probe's PartitionFilters prune is plan-gated in
    tests/test_retrieval_index.py alongside the file-count and
    crash-heal pins."""
    import os as _os
    import shutil as _shutil

    from distribot_spark.operators import index as rindex
    from distribot_spark.streaming.replay import TMP_ROOT

    tag = _os.path.basename(sf_dir.rstrip("/"))
    ix_dir = _os.path.join(TMP_ROOT, f"mh_ixo_{tag}")
    _shutil.rmtree(ix_dir, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 3 > 0)
    shard = docs.filter(F.col("doc_id") % 3 == 0)
    rindex.build_minhash_index(base, ix_dir)
    # artifacts, not re-shingling (see l2_minhash_serve); base_pairs
    # reads the PRE-optimize artifact names, which stay live until the
    # swap GC — so it is computed before optimize below runs
    base_pairs = rindex.minhash_index_pairs(spark, ix_dir, threshold=0.5)
    base_pairs = base_pairs.localCheckpoint(eager=True)
    rel = rindex.shard_minhash_relations(spark, ix_dir, shard)
    rindex.append_minhash_shard(spark, ix_dir, shard, relations=rel)
    st = rindex.optimize_minhash_index(spark, ix_dir)
    assert st["files_after"] < st["files_before"], st
    shard_pairs = rindex.probe_minhash_index(
        spark, ix_dir, shard, threshold=0.5, relations=rel)
    return (
        base_pairs.unionByName(shard_pairs)
        .dropDuplicates(["da", "db"])
        .orderBy("da", "db")
    )


_CLUSTERS_CTE = """
    WITH RECURSIVE
    t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id AS doc,
                  unnest([array_to_string(w[i:i+2], ' ')
                          FOR i IN range(1, len(w) - 1)]) AS s
           FROM t),
    dd AS (SELECT DISTINCT doc, s FROM sh),
    sz AS (SELECT doc, COUNT(*) AS n FROM dd GROUP BY doc),
    pr AS (SELECT a.doc AS da, b.doc AS db, COUNT(*) AS inter
           FROM dd a JOIN dd b ON a.s = b.s AND a.doc < b.doc
           GROUP BY 1, 2),
    p AS (SELECT da, db FROM pr JOIN sz sa ON da = sa.doc
          JOIN sz sb ON db = sb.doc
          WHERE inter / (sa.n + sb.n - inter) >= 0.5),
    e AS (SELECT da AS src, db AS dst FROM p
          UNION SELECT db, da FROM p),
    reach(src, dst) AS (
        SELECT src, dst FROM e
        UNION
        SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
    comp AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
             FROM reach GROUP BY src)
"""


def _split_case_sql(hmod: str) -> str:
    return (f"CASE WHEN {hmod} = 0 THEN 'test' "
            f"WHEN {hmod} = 1 THEN 'val' ELSE 'train' END")


def _l_split_oracle():
    from distribot_spark.operators import hll as _hll

    h = _hll.hash_sql("cluster_id")
    return _CLUSTERS_CTE + f""",
    base AS (SELECT d.doc_id,
                    COALESCE(c.cluster_id, d.doc_id) AS cluster_id
             FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
    SELECT doc_id, cluster_id,
           {_split_case_sql(f"({h}) % 10")} AS split
    FROM base ORDER BY doc_id
    """


@register("l_split_leakage_safe", oracle=_l_split_oracle(),
          tags=("llm", "dedup", "split", "pipeline"))
def l_split_leakage_safe(spark, sf_dir):
    """LEAKAGE-SAFE TRAIN/VAL/TEST SPLIT — the assignment a training
    pipeline actually needs: near-duplicate documents must land in the
    SAME split (a test doc whose near-copy sits in train is silent
    contamination), so the unit of assignment is the DEDUP CLUSTER,
    never the document. Composition: minhash-LSH + exact-verify pairs
    → min-label connected components (the dedup_clusters path) →
    every unpaired doc its own singleton cluster → the cluster id
    hashed through the PORTABLE two-round quadratic mixer
    (operators/hll.py — identical SQL text in both engines) into
    80/10/10 buckets. Deterministic (re-runs assign identically, new
    shards can be split without touching old assignments — the hash
    is the state), and leakage-free BY CONSTRUCTION: split is a
    function of cluster_id alone, so a cluster cannot span splits —
    which the full per-doc hash oracle certifies, recursive closure
    included. Scale shape: the pairs/components cost is dedup_clusters'
    (bucketed LSH, never all-pairs; hub-safe star variants exist for
    skew); the split itself is one projection."""
    docs = load_table(spark, sf_dir, "documents")
    from distribot_spark.operators import hll as _hll

    pairs = dedup.minhash_candidate_pairs(docs, "text", "doc_id",
                                          threshold=0.5)
    clus = components.duplicate_clusters(pairs).select(
        "doc_id", "cluster_id")
    assign = (docs.select("doc_id")
              .join(clus, "doc_id", "left")
              .withColumn("cluster_id",
                          F.coalesce(F.col("cluster_id"),
                                     F.col("doc_id"))))
    hmod = f"({_hll.hash_sql('cluster_id')}) % 10"
    return assign.select(
        "doc_id", "cluster_id",
        F.expr(_split_case_sql(hmod)).alias("split"),
    ).orderBy("doc_id")


def _mixture_oracle():
    from distribot_spark.operators import hll as _hll

    h = _hll.hash_sql("doc_id")
    return f"""
    WITH tok AS (SELECT doc_id, lang,
                        CAST(len(string_split(text, ' ')) AS BIGINT)
                          AS tok,
                        ({h}) AS pri
                 FROM documents),
    tot AS (SELECT SUM(tok) AS total FROM tok),
    budget AS (SELECT lang,
                      (tot.total * CASE lang WHEN 'en' THEN 120
                                             ELSE 45 END) // 1000
                        AS budget_tok
               FROM (SELECT DISTINCT lang FROM tok), tot),
    ranked AS (SELECT doc_id, lang, tok,
                      SUM(tok) OVER (PARTITION BY lang
                                     ORDER BY pri, doc_id
                                     ROWS UNBOUNDED PRECEDING)
                        AS running
               FROM tok)
    SELECT r.lang, r.doc_id, r.tok
    FROM ranked r JOIN budget b ON r.lang = b.lang
    WHERE r.running <= b.budget_tok
    ORDER BY r.lang, r.doc_id
    """


@register("l_mixture_sample", oracle=_mixture_oracle(),
          tags=("llm", "sampling", "mixture", "pipeline"))
def l_mixture_sample(spark, sf_dir):
    """DETERMINISTIC DATA-MIXTURE SAMPLING — pick a 30 %-of-corpus
    token budget split 40 % English / 15 % each other language (the
    up-weight-quality-sources move every pretraining recipe makes),
    WITHOUT randomness: each doc's priority is the portable two-round
    quadratic mixer of its id, and each language keeps its
    priority-ordered prefix whose RUNNING token total fits its integer
    budget (total × per-mille DIV 1000 — exact in both engines). The
    hash-priority prefix IS reservoir-free weighted sampling that (a)
    re-runs identically, (b) extends to new shards without reshuffling
    old picks (a doc's priority never changes — the same property the
    leakage-safe split leans on), and (c) hash-oracles exactly,
    running-sum boundary included. Scale shape: one corpus scan, one
    per-lang window (shuffle on lang), a broadcast budget join; token
    counts are whitespace splits (the repo's tokenizer-free count —
    swap in BPE counts per doc_bpe_encode when real budgets matter)."""
    from pyspark.sql import Window as W

    from distribot_spark.operators import hll as _hll

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang",
        F.size(F.split("text", " ")).cast("long").alias("tok"),
        F.expr(_hll.hash_sql("doc_id")).alias("pri"),
    )
    total = tok.agg(F.sum("tok").alias("total"))
    budget = (
        tok.select("lang").distinct()
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            F.expr("(total * CASE lang WHEN 'en' THEN 120 ELSE 45 END) "
                   "DIV 1000").alias("budget_tok"),
        )
    )
    w = (W.partitionBy("lang").orderBy("pri", "doc_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    ranked = tok.withColumn("running", F.sum("tok").over(w))
    return (
        ranked.join(F.broadcast(budget), "lang")
        .filter(F.col("running") <= F.col("budget_tok"))
        .select("lang", "doc_id", "tok")
        .orderBy("lang", "doc_id")
    )
