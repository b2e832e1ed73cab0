"""Similarity search over an embedding column (ARRAY<FLOAT>).

- `cosine_topk`: exact brute-force top-k — the oracle-checkable baseline.
  Queries are broadcast (they're small by construction); the corpus is
  never collected, so the plan is one scan + per-partition heap (window
  top-k) at any corpus size.
- `random_hyperplane_buckets` / `lsh_topk`: the 100 TB path — sign-of-dot
  LSH signatures bucket the corpus; only same-bucket candidates are
  re-ranked exactly. Probing multiple signature permutations trades
  recall for candidate count.

All dot products run JVM-side (`zip_with` + `aggregate` in index order —
which also makes float summation order deterministic for the oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _to_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    """Index-ordered float64 dot product (deterministic summation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                              lambda acc, x: acc + x))


def cosine_similarity(a, b):
    """cos(a, b) as a Column; a/b are ARRAY<DOUBLE> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (qid, nid, rnk, cos). The query side is broadcast; ranking is a
    window top-k (per-partition heap, no global sort of the cross product).
    """
    # Norms are staged per ROW before the cross join (the projection
    # survives CollapseProject because _norm is non-cheap): inlining
    # cosine_similarity into the scored projection would re-run BOTH
    # interpreted norm folds per PAIR — 3·dim lambda evals per pair
    # instead of dim, on the operator's dominant relation.
    q = queries.select(
        F.col(id_col).alias("qid"), _to_double(F.col(vec_col)).alias("qv")
    ).select("qid", "qv", _norm(F.col("qv")).alias("qn"))
    c = corpus.select(
        F.col(id_col).alias("nid"), _to_double(F.col(vec_col)).alias("v")
    ).select("nid", "v", _norm(F.col("v")).alias("vn"))
    scored = F.broadcast(q).crossJoin(c).select(
        "qid",
        "nid",
        (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("vn"))).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "nid", "rnk", (F.round(F.col("cos") * 10000, 0) / 10000).alias("cos"))
    )


def rrf_fuse(
    pool_a: DataFrame,
    pool_b: DataFrame,
    k: int = 5,
    c: int = 60,
    score_col: str = "rrf_score",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two candidate
    pools — THE calibration-free hybrid-retrieval combiner. Expects
    ``pool_a`` with columns (qid, nid, ra) and ``pool_b`` with
    (qid, nid, rb), integer ranks; pools full-outer-join on (qid, nid),
    absent ranks contribute nothing, score = Σ 1/(c + rank) with the
    fixed a-then-b addition order so the hash is engine-stable. Returns
    (qid, nid, rnk, score_col) UNSORTED — callers apply the total ORDER
    BY. The ONE fusion spelling shared by l3_rrf_fusion and
    l3_hybrid_bm25_dense (oracle twin: ``_rrf_oracle_tail``)."""
    fused = pool_a.join(pool_b, ["qid", "nid"], "full").select(
        "qid",
        "nid",
        (
            F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("ra")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("rb")), F.lit(0.0))
        ).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), "nid")
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "qid",
            "nid",
            "rnk",
            (F.round(F.col("score") * F.lit(1000000.0), 0) / F.lit(1000000.0))
            .alias(score_col),
        )
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: cos ≥ threshold, da < db.
    Exact O(n²) baseline — use `lsh_topk`-style bucketing at scale.
    Norms are staged per row before the cross join (see cosine_topk)."""
    a = df.select(
        F.col(id_col).alias("da"), _to_double(F.col(vec_col)).alias("va")
    ).select("da", "va", _norm(F.col("va")).alias("na"))
    b = df.select(
        F.col(id_col).alias("db"), _to_double(F.col(vec_col)).alias("vb")
    ).select("db", "vb", _norm(F.col("vb")).alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("da") < F.col("db"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("da", "db", (F.round(F.col("cos") * 10000, 0) / 10000).alias("cos"))
    )


def derive_n_blocks(
    n_rows: int, dim: int, block_bytes_budget: int = 64 << 20
) -> int:
    """Smallest block count keeping one packed block row (~n/B · dim · 8 B
    of float64 plus ids) under `block_bytes_budget`. Spark's hard 2 GiB
    single-row/page limits make an unlucky manual B a job-killer; 64 MB
    keeps a block comfortably inside one Arrow batch."""
    bytes_per_row = dim * 8 + 8
    total = n_rows * bytes_per_row
    return max(1, -(-total // block_bytes_budget))


def blocked_cosine_pairs(
    df: DataFrame,
    threshold: float,
    n_blocks: int | None = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold via block-nested-loop matmul —
    the scale path for MID-threshold regimes (cos 0.4–0.8) where sign-LSH
    mathematically cannot prune (candidate volume b·n²/2^r ≥ n²/2 at any
    recall-preserving r — see `lsh_cosine_pairs` docstring).

    Shape: hash vectors into B blocks, pack each block into ONE row
    (ids + vectors), cross-join the B(B+1)/2 unordered block pairs (a
    tiny relation — the vectors travel once per block, not once per
    candidate pair), then one numpy matmul per block pair inside
    mapInPandas. Total compute is still O(n²·dim) — all-pairs is exact —
    but it is BLAS-vectorized, embarrassingly parallel across block
    pairs, and shuffle traffic is O(n·B) vector copies instead of the
    O(n²) row explosion of the crossJoin baseline. At 100 TB choose
    B ≈ n·dim·8 / 64 MB so one block fits an Arrow batch comfortably
    (pass n_blocks=None to derive exactly that from a corpus count);
    task count B(B+1)/2 then scales quadratically with the corpus, each
    task constant-size. Same output contract as `cosine_pairs`
    (da < db, cos ≥ threshold, 4-decimal round) and exact, so it shares
    the brute-force DuckDB hash oracle.

    Determinism note: the BLAS matmul sums products in an unspecified
    order, unlike the baseline's index-ordered `F.aggregate` fold, so the
    raw float64 cos can differ from the oracle's in the last ulps. The
    4-decimal HALF_UP round below (floor(x·1e4 + 0.5), valid since
    cos ≥ threshold > 0) matches Spark's F.round / DuckDB's ROUND exactly;
    a value would have to sit within ~1e-12 of a 4th-decimal boundary for
    summation order to flip the rounded result."""
    if n_blocks is None:
        dim = len(df.select(vec_col).first()[0])
        n_blocks = derive_n_blocks(df.count(), dim)
    base = df.select(
        F.col(id_col).alias("id"),
        _to_double(F.col(vec_col)).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    packed = base.groupBy("blk").agg(
        F.sort_array(F.collect_list(F.struct("id", "v"))).alias("rows")
    )
    a = packed.select(F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a"))
    b = packed.select(F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b"))
    block_pairs = (
        a.join(b, F.col("blk_a") <= F.col("blk_b"))
        .repartition(n_blocks * (n_blocks + 1) // 2)
    )

    def _matmul_pairs(batches):
        for pdf in batches:
            out_da, out_db, out_cos = [], [], []
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray([r["id"] for r in row.rows_a], dtype=np.int64)
                A = np.stack([np.asarray(r["v"], dtype=np.float64)
                              for r in row.rows_a])
                A = A / np.linalg.norm(A, axis=1, keepdims=True)
                if row.blk_a == row.blk_b:
                    ids_b, B = ids_a, A
                else:
                    ids_b = np.asarray([r["id"] for r in row.rows_b],
                                       dtype=np.int64)
                    B = np.stack([np.asarray(r["v"], dtype=np.float64)
                                  for r in row.rows_b])
                    B = B / np.linalg.norm(B, axis=1, keepdims=True)
                C = A @ B.T
                ii, jj = np.nonzero(C >= threshold)
                da, db = ids_a[ii], ids_b[jj]
                keep = da != db  # intra-block self-pairs
                da, db, cos = da[keep], db[keep], C[ii, jj][keep]
                if row.blk_a == row.blk_b:
                    # every unordered pair appears twice in the full matrix
                    keep = da < db
                    da, db, cos = da[keep], db[keep], cos[keep]
                else:
                    lo = np.minimum(da, db)
                    db = np.maximum(da, db)
                    da = lo
                out_da.append(da)
                out_db.append(db)
                # HALF_UP to match F.round / DuckDB ROUND (np.round is
                # banker's half-to-even); cos ≥ threshold > 0 here.
                out_cos.append(np.floor(cos * 10000.0 + 0.5) / 10000.0)
            if out_da:
                yield pd.DataFrame({
                    "da": np.concatenate(out_da),
                    "db": np.concatenate(out_db),
                    "cos": np.concatenate(out_cos),
                })

    return block_pairs.mapInPandas(
        _matmul_pairs, schema="da long, db long, cos double"
    )


def lsh_cosine_pairs(
    df: DataFrame,
    threshold: float,
    n_planes: int = 4,
    n_tables: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Embedding near-dup pairs via sign-LSH bucketing + exact re-rank —
    the scale-safe twin of `cosine_pairs` (same output contract: da < db,
    cos ≥ threshold, cos rounded to 4 places).

    Shape: per table, vectors sharing a signature bucket become candidate
    id-pairs (equi-join on (table, sig) — ids only, vectors are NOT
    carried through the bucket join); candidates are deduped and re-ranked
    exactly. Candidate volume ~ n_tables · n²/2^n_planes vs the exact
    n²/2, and — unlike the cross join — every step is a shuffle-based
    equi-join Spark can execute out-of-core at any corpus size.

    Parameter guidance (p = 1 - θ/π is the per-plane agreement prob):
    recall ≈ 1-(1-p^r)^b for r=n_planes, b=n_tables. The defaults
    (r=4, b=32) give ≈ 0.998 recall at cos 0.45 — the *weak-pair* regime
    the planted testdata exercises, where any LSH necessarily prunes
    little. A production near-dup pass at cos ≥ 0.9 (p ≈ 0.857) should
    run r=16, b=8: recall ≈ 0.89 at 1/65536 the per-table candidate
    density, and multiple passes compound recall cheaply.
    """
    tables = [
        random_hyperplanes(dim, n_planes, seed + t * 1000) for t in range(n_tables)
    ]
    sig_fn = _signatures_udf(tables)
    base = df.select(
        F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v")
    )
    sigs = base.select(
        "id", F.posexplode(sig_fn(F.col("v"))).alias("tbl", "sig")
    )
    a = sigs.select(F.col("id").alias("da"), "tbl", "sig")
    b = sigs.select(F.col("id").alias("db"), "tbl", "sig")
    cand = (
        a.join(b, ["tbl", "sig"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .dropDuplicates(["da", "db"])
    )
    va = base.select(F.col("id").alias("da"), F.col("v").alias("va"))
    vb = base.select(F.col("id").alias("db"), F.col("v").alias("vb"))
    cos = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        cand.join(va, "da")
        .join(vb, "db")
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("da", "db", (F.round(F.col("cos") * 10000, 0) / 10000).alias("cos"))
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic hyperplane matrix for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def _signature(vec_col, planes: np.ndarray):
    """Sign-of-dot LSH signature as a BIGINT bucket key (≤63 planes),
    expressed as Catalyst column arithmetic. Kept as the pure-JVM
    reference; production paths use `_signatures_udf` — per-plane literal
    arrays make the expression tree O(tables·planes·dim) nodes, and
    Catalyst analysis + codegen on that tree dwarfs the actual math."""
    bits = []
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(_dot(vec_col, lit_plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("long")


def _signatures_udf(tables: list[np.ndarray]):
    """All tables' sign-LSH signatures in ONE Arrow-vectorized pandas UDF:
    a single (batch × dim) @ (dim × tables·planes) matmul, signs packed
    into one BIGINT per table. Constant-size plan regardless of
    tables/planes/dim, BLAS-speed math — the sanctioned Python path."""
    from pyspark.sql.functions import pandas_udf

    planes = np.concatenate(tables, axis=0)  # (T*r, dim)
    n_tables, r = len(tables), tables[0].shape[0]
    weights = (1 << np.arange(r, dtype=np.int64))

    @pandas_udf("array<long>")
    def sigs(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # empty Arrow batch: np.stack would raise
            return pd.Series([], dtype=object)
        mat = np.stack(v.to_numpy())  # (n, dim) float64
        bits = (mat @ planes.T) >= 0  # (n, T*r)
        packed = (bits.reshape(len(mat), n_tables, r) * weights).sum(axis=2)
        return pd.Series(list(packed))

    return sigs


def train_ivf_centroids(
    df: DataFrame,
    n_clusters: int,
    sample_n: int = 4096,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> np.ndarray:
    """Spherical-k-means centroids trained on a deterministic corpus
    sample — the FAISS-style IVF recipe: train on a sample (centroids are
    tiny, k×dim), assign the full corpus distributed. The sample is the
    `sample_n` rows with the smallest xxhash64(id, seed) — deterministic,
    order-independent, and at 100 TB a cheap TABLESAMPLE-shaped scan
    (top-k by hash, no full sort materialization). Lloyd iterations run
    driver-side in float64 numpy with a fixed init (first k sample rows
    in hash order), so the centroid matrix is bit-reproducible.
    Returns (n_clusters, dim), L2-normalized rows."""
    sample = (
        df.select(
            _to_double(F.col(vec_col)).alias("v"),
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("h"),
        )
        .orderBy("h")
        .limit(sample_n)
        .toPandas()
    )
    X = np.stack(sample["v"].to_numpy()).astype(np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = X[:n_clusters].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_clusters):
            members = X[assign == c]
            if len(members):  # empty cluster keeps its old centroid
                C[c] = members.mean(axis=0)
        C = C / np.linalg.norm(C, axis=1, keepdims=True)
    return C


def _nearest_centroids_udf(centroids: np.ndarray, n_probe: int):
    """Arrow-vectorized: indices of the `n_probe` nearest centroids
    (by cosine) per vector, nearest first. One BLAS matmul per batch."""
    from pyspark.sql.functions import pandas_udf

    C = centroids  # (k, dim), rows unit-norm

    @pandas_udf("array<int>")
    def probes(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # empty Arrow batch: np.stack would raise
            return pd.Series([], dtype=object)
        mat = np.stack(v.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ C.T  # (n, k)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(np.int32) for row in order])

    return probes


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 4096,
    seed: int = 11,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the cluster-pruned ANN
    path, complementing `lsh_topk`'s hash-pruned one.

    Shape: centroids train on a deterministic sample (driver-side numpy,
    broadcast by closure); the corpus is assigned to its ONE nearest
    centroid (a single vectorized matmul pass — at 100 TB this is a
    write-once column, ideally `partitionBy(cluster)` so probes become
    partition pruning); each query probes its `n_probe` nearest
    centroids and re-ranks exactly only within those probe lists. Every
    join is an equi-join on the cluster id; per-query compute drops from
    O(n·dim) to O(n·dim·n_probe/n_clusters).

    Completeness property (tested): with n_probe == n_clusters the probe
    set is the whole corpus, so the result equals exact `cosine_topk`
    bit-for-bit — the approximation comes only from pruning, never from
    scoring. Same output contract as `cosine_topk`."""
    centroids = train_ivf_centroids(
        corpus, n_clusters, sample_n=sample_n,
        id_col=id_col, vec_col=vec_col, seed=seed,
    )
    assign1 = _nearest_centroids_udf(centroids, 1)
    proben = _nearest_centroids_udf(centroids, n_probe)

    c = corpus.select(
        F.col(id_col).alias("nid"), _to_double(F.col(vec_col)).alias("v")
    ).withColumn("cluster", F.element_at(assign1(F.col("v")), 1))
    q = queries.select(
        F.col(id_col).alias("qid"), _to_double(F.col(vec_col)).alias("qv")
    ).withColumn("probes", proben(F.col("qv")))
    qx = q.select("qid", "qv", F.explode("probes").alias("cluster"))

    # corpus rows live in exactly one cluster and a query's probes are
    # distinct, so no candidate dedup is needed
    cands = F.broadcast(qx).join(c, "cluster")
    scored = cands.select(
        "qid", "nid", cosine_similarity(F.col("qv"), F.col("v")).alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "nid", "rnk",
                (F.round(F.col("cos") * 10000, 0) / 10000).alias("cos"))
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing an LSH bucket
    with the query in ANY of `n_tables` independent hyperplane tables, then
    exact cosine re-rank of candidates only.

    At 100 TB: the corpus is bucketed once (a column write), queries probe
    buckets — each query touches ~corpus/2^n_planes × n_tables rows instead
    of the full corpus.
    """
    tables = [
        random_hyperplanes(dim, n_planes, seed + t * 1000) for t in range(n_tables)
    ]
    sig_fn = _signatures_udf(tables)
    q = queries.select(
        F.col(id_col).alias("qid"), _to_double(F.col(vec_col)).alias("qv")
    ).withColumn("sigs", sig_fn(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("nid"), _to_double(F.col(vec_col)).alias("v")
    ).withColumn("sigs", sig_fn(F.col("v")))

    # candidate union over tables: explode (table, sig) pairs and
    # bucket-equi-join on both, then dedupe
    qx = q.select("qid", "qv", F.posexplode("sigs").alias("tbl", "sig"))
    cx = c.select("nid", "v", F.posexplode("sigs").alias("tbl", "sig"))
    cands = (
        F.broadcast(qx)
        .join(cx, ["tbl", "sig"])
        .select("qid", "qv", "nid", "v")
        .dropDuplicates(["qid", "nid"])
    )

    scored = cands.select(
        "qid", "nid", cosine_similarity(F.col("qv"), F.col("v")).alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "nid", "rnk", (F.round(F.col("cos") * 10000, 0) / 10000).alias("cos"))
    )


def quantize_int8(df: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Per-vector symmetric int8 quantization audit: max-abs scale
    (``scale = max|x| / 127``), round-half-up quantize/dequantize, and
    the max absolute reconstruction error.

    This is the storage-compression pre-pass of a training-data pipeline
    (embeddings shipped to trainers at 4x smaller); the audit proves the
    error bound (``max_abs_err <= scale/2``) holds corpus-wide. All math
    is per-row JVM-side array expressions — no shuffle, no Python: at
    100 TB this is a map-only scan that pushes only (id, embedding)
    through the reader.

    Determinism (oracle-matchable): elements cast to double before any
    arithmetic; rounding is spelled ``floor(x + 0.5)`` /
    ``floor(x*1e6 + 0.5)/1e6`` identically in both engines (HALF_UP —
    scale and error are non-negative); per-vector reductions are max
    (order-insensitive), so there is no float-summation-order hazard.
    Spark's ``floor`` yields LONG where DuckDB's yields DOUBLE; the
    quantized magnitudes are <= 127 so the widening back is exact.

    The scale is STAGED through its own projection before the error
    lambda references it: interpreted-HOF expressions that Catalyst
    inlines into a `transform` lambda re-evaluate PER ELEMENT (the
    array_max inside `scale` would turn the error pass O(dim²) per row —
    measured 1.9 s → ~0.5 s fresh-plan warm at sf0.1). Non-cheap
    expressions block CollapseProject, so the staging survives
    optimization.
    """
    staged = df.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("__v")
    ).select(
        F.col(id_col),
        F.col("__v"),
        (F.array_max(F.transform(F.col("__v"), F.abs)) / F.lit(127.0))
        .alias("__scale"),
    )
    scale = F.col("__scale")
    errs = F.transform(
        F.col("__v"),
        lambda x: F.abs(F.floor(x / scale + F.lit(0.5)) * scale - x),
    )
    max_err = F.when(scale == F.lit(0.0), F.lit(0.0)).otherwise(F.array_max(errs))

    def _r6(c):
        return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)

    return staged.select(
        F.col(id_col),
        _r6(scale).alias("scale_q"),
        _r6(max_err).alias("max_abs_err"),
    )


def tf_cosine_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Sparse cosine similarity over term-frequency vectors via an
    inverted-index self-join — the term-partitioned sparse-similarity
    pattern (documents never materialize dense vectors; partial dot
    products accumulate per shared term).

    Exact and fully oracle-checkable: dot products and squared norms are
    INTEGER sums of tf products (order-insensitive, no float-summation
    hazard); only the final cos = dot / (sqrt(na)*sqrt(nb)) is floating,
    a deterministic composition of exact integers.

    Scale: the term join's candidate volume is sum over terms of
    df(t)^2 — ultra-frequent terms dominate it quadratically, so at
    corpus scale pass `max_df` to stop-list terms above a document
    frequency cap (the standard prefix-filtering move; near-dup pairs
    are decided by their RARE shared terms). The tf/df aggregations are
    map-side partial; the pair aggregation shuffles one row per
    co-occurring pair per partition. This test-scale query runs uncapped
    (31-word synthetic vocab = every term frequent), which is the honest
    exact baseline there.
    """
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("t"),
    )
    tf = tok.groupBy("doc", "t").agg(F.count(F.lit(1)).alias("f"))
    if max_df is not None:
        keep = (
            tf.groupBy("t")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("t")
        )
        tf = tf.join(F.broadcast(keep), "t")
    nrm = tf.groupBy("doc").agg(F.sum(F.col("f") * F.col("f")).alias("n2"))
    a = tf.select(F.col("doc").alias("da"), "t", F.col("f").alias("fa"))
    b = tf.select(F.col("doc").alias("db"), "t", F.col("f").alias("fb"))
    dots = (
        a.join(b, ["t"])
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.sum(F.col("fa") * F.col("fb")).alias("dot"))
    )
    na = nrm.select(F.col("doc").alias("da"), F.col("n2").alias("na2"))
    nb = nrm.select(F.col("doc").alias("db"), F.col("n2").alias("nb2"))
    cos = F.col("dot") / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2")))
    return (
        dots.join(na, "da")
        .join(nb, "db")
        .filter(cos >= F.lit(threshold))
        .select(
            "da",
            "db",
            (F.floor(cos * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0))
            .alias("cos"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.45,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 4096,
    seed: int = 11,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then search
    for near-duplicate pairs ONLY within each cluster — the pruning that
    turns O(n²) all-pairs into Σ O(|cluster|²), with candidate loss only
    at cluster boundaries (a pair split across clusters is missed; the
    paper accepts this, and so do we — recall vs the exact baseline is
    asserted in tests).

    Returns (doc_id, cluster_id, cluster_size, is_canonical) for every
    vector that belongs to a semantic-duplicate group (canonical = min
    id via connected components, same contract as duplicate_clusters).

    Scale shape: centroids train on a deterministic sample
    (train_ivf_centroids); assignment is one Arrow matmul pass; the
    within-cluster all-pairs runs as ONE applyInPandas batch per
    cluster, so n_clusters must scale with the corpus (target ~1e4 rows
    per cluster at 100 TB — then each batch is a ~60 MB matmul). For
    clusters too large for one batch, compose blocked_cosine_pairs per
    cluster instead."""
    from distribot_spark.operators.components import duplicate_clusters

    centroids = train_ivf_centroids(
        df, n_clusters, sample_n=sample_n, id_col=id_col, vec_col=vec_col,
        seed=seed,
    )
    assign1 = _nearest_centroids_udf(centroids, 1)
    c = df.select(
        F.col(id_col).alias("id"), _to_double(F.col(vec_col)).alias("v")
    ).withColumn("cluster", F.element_at(assign1(F.col("v")), 1))

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"da": [], "db": []}).astype("int64")
        ids = pdf["id"].to_numpy()
        X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = X @ X.T
        ia, ib = np.where(np.triu(S >= threshold, k=1))
        return pd.DataFrame(
            {
                "da": np.minimum(ids[ia], ids[ib]),
                "db": np.maximum(ids[ia], ids[ib]),
            }
        )

    pairs = c.groupBy("cluster").applyInPandas(_pairs, "da long, db long")
    return duplicate_clusters(pairs, "da", "db")


def train_pq_codebooks(
    df: DataFrame,
    m: int = 16,
    k_codes: int = 16,
    sample_n: int = 4096,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    (L2-normalized) vector into `m` contiguous subspaces and k-means
    each on the same deterministic hash-ordered sample the IVF trainer
    uses. Fixed init (first k_codes sample rows per subspace) keeps the
    codebook matrix bit-reproducible. Returns (m, k_codes, dim/m)
    float64."""
    sample = (
        df.select(
            _to_double(F.col(vec_col)).alias("v"),
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("h"),
        )
        .orderBy("h")
        .limit(sample_n)
        .toPandas()
    )
    X = np.stack(sample["v"].to_numpy()).astype(np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, k_codes, dsub))
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        C = Xs[:k_codes].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k_codes):
                members = Xs[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[s] = C
    return books


def _pq_encode_udf(books: np.ndarray):
    """Arrow-vectorized PQ encoder: nearest codebook entry per subspace
    of the normalized vector → array<int> of length m (the 100 TB point:
    m bytes of code replace dim*4 bytes of float — a 32x memory cut at
    dim=64/m=8, which is what lets a corpus-scale ANN index stay in
    executor memory)."""
    from pyspark.sql.functions import pandas_udf

    B = books
    m, _, dsub = B.shape

    @pandas_udf("array<int>")
    def enc(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(v.to_numpy()).astype(np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        codes = np.empty((len(X), m), dtype=np.int32)
        for s in range(m):
            Xs = X[:, s * dsub : (s + 1) * dsub]
            d2 = ((Xs[:, None, :] - B[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.Series([row for row in codes])

    return enc


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 16,
    k_codes: int = 16,
    rerank: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 4096,
    seed: int = 11,
) -> DataFrame:
    """PQ-ADC approximate top-k: corpus compressed to m-byte codes, each
    query scored against codes via an asymmetric-distance lookup table
    (one dot product per (subspace, code) — m*k_codes mults per query,
    then a pure table-gather per corpus row), per-partition top-`rerank`
    candidates, exact cosine re-rank of the survivors. Same output
    contract as cosine_topk: (qid, nid, rnk, cos), cos exact.

    Scale shape: the scan side touches only the code column (m ints),
    queries are collected driver-side (the small side by contract, same
    as cosine_topk's broadcast) and shipped in the UDF closure; compute
    per corpus row is O(m) gathers instead of O(dim) mults. Approximation
    error comes only from candidate selection — the final scores are
    exact; recall is asserted in tests."""
    books = train_pq_codebooks(
        corpus, m=m, k_codes=k_codes, sample_n=sample_n,
        id_col=id_col, vec_col=vec_col, seed=seed,
    )
    enc = _pq_encode_udf(books)
    coded = corpus.select(
        F.col(id_col).alias("nid"), _to_double(F.col(vec_col)).alias("v")
    ).withColumn("code", enc(F.col("v")))

    qrows = (
        queries.select(
            F.col(id_col).alias("qid"), _to_double(F.col(vec_col)).alias("qv")
        )
        .orderBy("qid")
        .collect()
    )
    qids = np.array([r.qid for r in qrows])
    Q = np.stack([np.asarray(r.qv, dtype=np.float64) for r in qrows])
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    dsub = Q.shape[1] // m
    # LUT[qi, s, c] = <q_sub, codebook[s, c]> ; approx dot = sum_s LUT[...]
    lut = np.einsum("qsd,scd->qsc", Q.reshape(len(Q), m, dsub), books)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["code"].to_numpy())  # (n, m)
            out = []
            for qi in range(len(qids)):
                approx = lut[qi][np.arange(m)[None, :], codes].sum(axis=1)
                top = np.argsort(-approx, kind="stable")[:rerank]
                out.append(
                    pd.DataFrame(
                        {
                            "qid": qids[qi],
                            "nid": pdf["nid"].to_numpy()[top],
                            "approx": approx[top],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    cands = coded.select("nid", "code").mapInPandas(
        score, "qid long, nid long, approx double"
    )
    wq = Window.partitionBy("qid").orderBy(F.col("approx").desc(), F.col("nid"))
    pruned = cands.withColumn("arnk", F.row_number().over(wq)).filter(
        F.col("arnk") <= rerank
    )
    qdf = queries.select(
        F.col(id_col).alias("qid"), _to_double(F.col(vec_col)).alias("qv")
    ).select("qid", "qv", _norm(F.col("qv")).alias("qn"))
    cvec = coded.select("nid", "v", _norm(F.col("v")).alias("vn"))
    exact = (
        pruned.join(F.broadcast(qdf), "qid")
        .join(cvec, "nid")
        .select(
            "qid",
            "nid",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("vn"))).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "qid",
            "nid",
            "rnk",
            (F.round(F.col("cos") * 10000, 0) / 10000).alias("cos"),
        )
    )
