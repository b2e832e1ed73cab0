"""Deduplication operators over a text corpus.

Five families (SURVEY.md §2B L1/L2 + mandate):

- exact:      hash-groupBy on md5(text)                       → `exact_dedup`
- MinHash:    shingle → minhash sig → LSH bands → bucket join → `minhash_candidate_pairs`
- exact Jaccard: shingle-set join (oracle baseline, O(pairs)) → `jaccard_pairs`
- SimHash:    64-bit signature + banded hamming join          → `simhash_pairs`
- embedding:  cosine near-dup pairs                           → see similarity.py

Scale notes (100 TB): every operator shuffles on a content-derived key
(hash, band bucket, shingle) — no broadcast of the corpus, no driver
collection. The LSH paths bound candidate-pair cardinality; the exact
variants are oracle baselines to be run on samples at scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row (min id) per exact text duplicate group.

    hash-groupBy shape: shuffle on md5(text) — uniform keys, no skew;
    map-side partial aggregation applies.
    """
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def word_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles: (id, shingle). JVM-side only:
    split → sequence → transform(slice ∘ concat_ws) → explode → distinct."""
    tokens = F.split(F.col(text_col), " ")
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    return (
        df.select(F.col(id_col).alias("doc"), F.explode(shingles).alias("shingle"))
        .dropDuplicates(["doc", "shingle"])
    )


def _shingle_hashes_raw(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """(doc, h) WITHOUT the distinct — for duplicate-insensitive consumers
    (minhash mins), where skipping the dedup shuffle is pure win."""
    tokens = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col).alias("doc"),
        tokens.alias("__toks"),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(1)))
        ).alias("__i"),
    ).select(
        "doc",
        F.xxhash64(
            F.concat_ws(" ", F.slice(F.col("__toks"), F.col("__i"), n))
        ).alias("h"),
    )


def shingle_hashes(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct (doc, h): 64-bit xxhash of each word n-gram shingle.

    Everything downstream (signatures, banding, set intersection) only
    needs equality on shingles, so hashing *before* the distinct makes the
    shuffle rows fixed-width longs instead of strings — measurably faster
    at every scale, with 2^-64 collision odds per pair.

    Shape note: positions are exploded FIRST and the slice/concat/hash run
    as ordinary row-level expressions inside whole-stage codegen. The
    earlier form (a `transform` higher-order function building the hash
    array in-place) evaluated the lambda interpreted per element —
    measurably slower (1.62 s vs 1.35 s at sf0.1) for identical output."""
    return _shingle_hashes_raw(df, text_col, id_col, n).dropDuplicates(["doc", "h"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(shingles: DataFrame, num_hashes: int = 128) -> DataFrame:
    """(doc, sig ARRAY<BIGINT>) from (doc, h) hashed shingles: sig[j] =
    min over shingles of xxhash64(h, j) — the family is derived from the
    64-bit base hash, never re-hashing strings. One shuffle (groupBy doc);
    the per-hash mins partial-aggregate map-side, so signature width never
    multiplies shuffled rows."""
    mins = [
        F.min(F.xxhash64(F.col("h"), F.lit(j))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    agg = shingles.groupBy("doc").agg(*mins)
    return agg.select(
        "doc", F.array(*[f"h{j}" for j in range(num_hashes)]).alias("sig")
    )


def lsh_band_buckets(signatures: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """Explode signatures into (band, bucket, doc): bucket = hash of the
    band's signature slice. Bucket-join key cardinality ≈ docs × bands."""
    band_entries = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                ),
                b,
            ).alias("bucket"),
        ),
    )
    return signatures.select(
        "doc", F.explode(band_entries).alias("e")
    ).select("doc", F.col("e.band").alias("band"), F.col("e.bucket").alias("bucket"))


def minhash_band_buckets(
    shingles: DataFrame, num_hashes: int = 128, bands: int = 32
) -> DataFrame:
    """(doc, bucket) straight from hashed shingles — the fused production
    path behind `minhash_candidate_pairs`.

    One shuffle (groupBy doc, per-hash mins partial-aggregate map-side);
    band buckets are computed IN the aggregate's output projection as
    ``bucket = xxhash64(min_{b·r} … min_{b·r+r-1}, b)`` — no signature
    array, no higher-order slice, no string concat. Baking the band index
    into the hash salts buckets per band, so the candidate join needs only
    the single long ``bucket`` key (a cross-band collision needs a 2⁻⁶⁴
    accident, and any such accident only adds a candidate that exact
    verification removes). The whole band array is built as ONE parsed
    SQL expression (a single `F.expr`/py4j round-trip): the earlier
    128-named-min-columns + 32-wide array form cost ~0.55 s of DRIVER
    time per plan construction/analysis (measured r9 on the serve
    path, where the plan is built 3×per crawl iteration) for identical
    execution — the analyzer resolves 32 projections instead of 160."""
    r = num_hashes // bands
    bands_sql = ",".join(
        "xxhash64({mins},{b})".format(
            mins=",".join(
                f"min(xxhash64(h,{b * r + j}))" for j in range(r)),
            b=b)
        for b in range(bands)
    )
    agg = shingles.groupBy("doc").agg(
        F.expr(f"array({bands_sql})").alias("__bks"))
    return agg.select("doc", F.explode("__bks").alias("bucket"))


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (da < db) with exact-verified Jaccard ≥ threshold.

    Pipeline: shingle → fused minhash band buckets (`minhash_band_buckets`)
    → self-equi-join on the band-salted bucket key (candidates) → exact
    verification on the candidates' shingle sets. With b=32, r=4 the LSH
    s-curve passes ≥0.8-similar pairs with P > 0.9998, so recall at the
    planted-duplicate regime is ~1 while the bucket join keeps the
    candidate set ~linear (vs the O(n²) exact join).
    """
    sh = shingle_hashes(df, text_col, id_col, shingle_n)
    # min() is duplicate-insensitive, so the signature branch skips the
    # distinct: partial min-agg runs map-side straight off the explode and
    # shuffles only docs × num_hashes mins, not the full shingle relation.
    # (The exact-verify branch still uses the distinct `sh`.)
    sh_raw = _shingle_hashes_raw(df, text_col, id_col, shingle_n)
    buckets = minhash_band_buckets(sh_raw, num_hashes, bands)

    b1 = buckets.alias("b1")
    b2 = buckets.alias("b2")
    candidates = (
        b1.join(
            b2,
            (F.col("b1.bucket") == F.col("b2.bucket"))
            & (F.col("b1.doc") < F.col("b2.doc")),
        )
        .select(F.col("b1.doc").alias("da"), F.col("b2.doc").alias("db"))
        .dropDuplicates()
    )
    return _verify_jaccard(candidates, sh, threshold)


def _verify_jaccard(pairs: DataFrame, shingles: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard for given (da, db) pairs via hashed-shingle-set joins."""
    sizes = shingles.groupBy("doc").agg(F.count("*").alias("n"))
    sa = shingles.select(F.col("doc").alias("da"), "h")
    sb = shingles.select(F.col("doc").alias("db"), "h")
    inter = (
        pairs.join(sa, "da")
        .join(sb, ["db", "h"])
        .groupBy("da", "db")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("doc").alias("da"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc").alias("db"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(na, "da")
        .join(nb, "db")
        .withColumn("jaccard", F.round(jac * 1000, 0) / 1000)
        .filter(jac >= threshold)
        .select("da", "db", "jaccard")
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ threshold via the full shingle join —
    the oracle baseline. O(sum of shingle-bucket²); fine at test scale,
    use `minhash_candidate_pairs` at 100 TB."""
    sh = shingle_hashes(df, text_col, id_col, shingle_n)
    a = sh.select(F.col("doc").alias("da"), "h")
    b = sh.select(F.col("doc").alias("db"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .groupBy("da", "db")
        .agg(F.count("*").alias("inter"))
        .select("da", "db")
    )
    return _verify_jaccard(pairs, sh, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per document, computed in one Arrow-batched pandas UDF
    (numpy bit-twiddling; deterministic via md5 token hashes)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash_udf(texts: pd.Series) -> pd.Series:
        import hashlib

        out = np.empty(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            tokens = (text or "").split(" ")
            if not tokens:
                out[i] = 0
                continue
            hashes = np.array(
                [
                    int.from_bytes(
                        hashlib.md5(t.encode("utf-8")).digest()[:8], "little"
                    )
                    for t in tokens
                ],
                dtype=np.uint64,
            )
            bits = (hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1
            votes = bits.astype(np.int64).sum(axis=0) * 2 - len(tokens)
            sig = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(b)
            out[i] = sig.astype(np.int64)
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("doc"), simhash_udf(F.col(text_col)).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split 64 bits into max_hamming+1 chunks; any pair
    within the radius collides on ≥1 exact chunk → equi-join per chunk,
    then exact hamming via bit_count(xor). Join is on (chunk_idx, chunk
    value) — shuffle-friendly, no cross product.
    """
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks
    sigs = simhash64(df, text_col, id_col)
    mask = (1 << chunk_bits) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(ci).alias("chunk_idx"),
                F.shiftrightunsigned(F.col("simhash"), ci * chunk_bits)
                .bitwiseAND(F.lit(mask))
                .alias("chunk"),
            )
            for ci in range(n_chunks)
        ]
    )
    banded = sigs.select(
        "doc", "simhash", F.explode(chunks).alias("e")
    ).select("doc", "simhash", "e.chunk_idx", "e.chunk")

    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("da"),
            F.col("b.doc").alias("db"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["da", "db"])
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: n-gram overlap vs a probe set
# ---------------------------------------------------------------------------


def contamination_hits(
    df: DataFrame,
    probes: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Per-document count of distinct word n-grams shared with a probe set
    (benchmark/eval suites) — the decontamination pass every training
    pipeline runs before shipping a corpus.

    Scale shape: the probe side is small by construction (benchmarks are
    KBs–MBs, the corpus is TBs), so its distinct n-gram hashes broadcast
    and the corpus stays MAP-ONLY through shingle → hash → broadcast-join;
    the per-doc distinct + count shuffles only the matching rows (≈ the
    contamination volume, not the corpus). No corpus-wide distinct.
    """
    corpus = _shingle_hashes_raw(df, text_col, id_col, n)
    probe = (
        _shingle_hashes_raw(probes, text_col, id_col, n)
        .select("h")
        .dropDuplicates(["h"])
    )
    return (
        corpus.join(F.broadcast(probe), "h")
        # distinct AFTER the probe join: duplicates only survive for
        # matching grams, so the dedup shuffle carries hits, not corpus
        .dropDuplicates(["doc", "h"])
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


# ---------------------------------------------------------------------------
# duplicated spans (ExactSubstr tier — Lee et al. 2022, arXiv:2107.06499)
# ---------------------------------------------------------------------------


def dup_spans(
    df: DataFrame, text_col: str, id_col: str, n: int = 5,
    hashed: bool = False,
) -> DataFrame:
    """Maximal cross-document duplicated token spans per document.

    An n-token gram appearing in ≥2 distinct documents is a duplication
    seed; a document's overlapping/adjacent seeds merge into maximal
    spans by per-doc gaps-and-islands (new island when the next seed
    starts past the previous seed's coverage). Returns one row per span:
    (id_col, fp, lp) — token positions are 1-based, the span covers
    [fp, lp + n - 1], and spans of one document are DISJOINT by
    construction.

    Scale shape: gram counts partial-aggregate map-side and only
    multi-doc grams return (semi-join, broadcast when small); islands
    are per-document windows. ``hashed=True`` is the 100 TB path: the
    gram COLUMN becomes xxhash64(gram) before any shuffle, so the
    count-distinct and seed semi-join carry 8-byte longs instead of
    n-token strings (an n=5 gram averages ~30 bytes and the gram table
    is the widest shuffle in the job). Identical span sets modulo
    64-bit hash collisions (~n_grams²/2⁶⁵ expected false seeds —
    at 10¹² grams that's <0.03 spurious seed pairs corpus-wide);
    equality on the test corpus is pinned by
    `test_dup_spans_hashed_matches_text_path`."""
    w = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("w")
    ).filter(F.size("w") >= n)  # Spark sequence(1, k<1) steps DOWNWARD
    g = w.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w) - {n - 1}),"
                f" i -> struct(i AS p, concat_ws(' ', slice(w, i, {n})) AS g))"
            )
        ).alias("s"),
    ).select(id_col, "s.p", "s.g")
    if hashed:
        g = g.select(id_col, "p", F.xxhash64("g").alias("g"))
    dup = (
        g.groupBy("g")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    seeds = g.join(dup, "g", "left_semi").select(id_col, "p")
    byp = Window.partitionBy(id_col).orderBy("p")
    isl = seeds.withColumn("prev", F.lag("p").over(byp)).withColumn(
        "isl",
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("p") - F.col("prev") > n), 1
            ).otherwise(0)
        ).over(byp.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return isl.groupBy(id_col, "isl").agg(
        F.min("p").alias("fp"), F.max("p").alias("lp")
    ).drop("isl")
