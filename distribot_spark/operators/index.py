"""Persisted retrieval indexes: train once, serve many.

The per-query builders (`text.bm25_topk`, `similarity.ivf_topk`)
recompute their index structures — postings / document frequencies /
IVF centroids — on every call. A real pipeline materializes those ONCE
and serves query batches against the artifacts; at 100 TB the build is
a full-corpus job you cannot afford per query, while the artifacts are
a pruned read (query-term postings only; probed IVF partitions only).

This module persists both index families as plain parquet:

BM25 (`build_bm25_index` / `load_bm25_index` / `serve_bm25_topk`):
  postings/  (doc, term, tf)   — the inverted index
  docfreq/   (term, df)
  doclen/    (doc, dl)         — docs with ≥1 token (mirrors the builder)
  docs/      (doc)             — ALL corpus ids (query-by-example pool)
  stats/     (n_docs, sum_dl, n_dl) — additive scalars
Serving routes the loaded relations through the SAME `text._bm25_rank`
core the direct builder uses, so build-then-serve cannot drift — pinned
exactly by tests and by the `l3_bm25_serve` oracle.

Incremental maintenance (`merge_bm25_shard`): a NEW corpus shard
(doc ids disjoint from the base — the append-only ingest contract)
merges in shard-local work only: postings/doclen/docs union (disjoint
docs), docfreq adds per-term, stats add. Every statistic BM25 reads is
a sum over docs, so merge(build(A), B) ≡ build(A ∪ B) EXACTLY — the
staleness contract tests/test_retrieval_index.py pins table-for-table.

IVF (`build_ivf_index` / `serve_ivf_topk`):
  centroids/ (cid, centroid array<double>) — the trained codebook
  vectors/   partitioned by cluster (cid=…/) — corpus with assignment
Serving loads the codebook (k×dim, driver-bounded), probes each query's
`n_probe` nearest centroids, and scores exactly within the probed
clusters; the cluster-partitioned layout makes the probe a PARTITION-
PRUNED scan (only cid=… directories of probed clusters are read) —
the artifact IS the pruning structure.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distribot_spark.operators import similarity, text
from distribot_spark.session import local_rows_df

# -- BM25 ------------------------------------------------------------------


def build_bm25_index(
    df: DataFrame, out_dir: str, text_col: str = "text", id_col: str = "doc_id"
) -> None:
    """Materialize the BM25 index artifacts for `df` under `out_dir`."""
    tf, docfreq, _ = text._term_stats(df, text_col, id_col)
    dl = tf.groupBy("doc").agg(F.sum("tf").alias("dl"))
    docs = df.select(F.col(id_col).alias("doc"))
    stats = dl.agg(
        F.sum("dl").alias("sum_dl"), F.count("*").alias("n_dl")
    ).crossJoin(F.broadcast(docs.agg(F.count("*").alias("n_docs"))))
    tf.write.mode("overwrite").parquet(os.path.join(out_dir, "postings"))
    docfreq.write.mode("overwrite").parquet(os.path.join(out_dir, "docfreq"))
    dl.write.mode("overwrite").parquet(os.path.join(out_dir, "doclen"))
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "docs"))
    stats.select("n_docs", "sum_dl", "n_dl").write.mode("overwrite").parquet(
        os.path.join(out_dir, "stats")
    )


def load_bm25_index(spark: SparkSession, index_dir: str) -> dict[str, DataFrame]:
    return {
        name: spark.read.parquet(_part_path(index_dir, name))
        for name in ("postings", "docfreq", "doclen", "docs", "stats")
    }


def serve_bm25_topk(
    spark: SparkSession,
    index_dir: str,
    n_query_docs: int = 3,
    terms_per_query: int = 3,
    k: int = 5,
) -> DataFrame:
    """Score query-by-example BM25 from PERSISTED artifacts — no corpus
    scan, no stats recompute; identical output contract (and identical
    ranking code path) to `text.bm25_topk` on the same corpus."""
    ix = load_bm25_index(spark, index_dir)
    n_docs = ix["stats"].select("n_docs")
    qd = (
        ix["docs"].select(F.col("doc").alias("qdoc"))
        .orderBy("qdoc").limit(n_query_docs)
    )
    return text._bm25_rank(
        ix["postings"], ix["docfreq"], n_docs, ix["doclen"], qd,
        terms_per_query, k,
    )


def merge_bm25_shard(
    spark: SparkSession,
    base_dir: str,
    shard_df: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Incrementally fold a NEW corpus shard into a persisted BM25 index.

    Contract: shard doc ids are DISJOINT from the base corpus (append-
    only ingest). Work is shard-local — the base corpus is never re-read,
    only its (much smaller) artifact tables: postings/doclen/docs union,
    docfreq adds per term, stats add. Result ≡ `build_bm25_index` on the
    unioned corpus, table for table (pinned by the contract test)."""
    base = load_bm25_index(spark, base_dir)
    tf_s, docfreq_s, _ = text._term_stats(shard_df, text_col, id_col)
    dl_s = tf_s.groupBy("doc").agg(F.sum("tf").alias("dl"))
    docs_s = shard_df.select(F.col(id_col).alias("doc"))

    postings = base["postings"].unionByName(tf_s)
    docfreq = (
        base["docfreq"].unionByName(docfreq_s)
        .groupBy("term").agg(F.sum("df").alias("df"))
    )
    doclen = base["doclen"].unionByName(dl_s)
    docs = base["docs"].unionByName(docs_s)
    stats_s = dl_s.agg(
        F.sum("dl").alias("sum_dl"), F.count("*").alias("n_dl")
    ).crossJoin(F.broadcast(docs_s.agg(F.count("*").alias("n_docs"))))
    stats = (
        base["stats"].unionByName(stats_s.select("n_docs", "sum_dl", "n_dl"))
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_dl").alias("sum_dl"),
            F.sum("n_dl").alias("n_dl"),
        )
    )
    postings.write.mode("overwrite").parquet(os.path.join(out_dir, "postings"))
    docfreq.write.mode("overwrite").parquet(os.path.join(out_dir, "docfreq"))
    doclen.write.mode("overwrite").parquet(os.path.join(out_dir, "doclen"))
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "docs"))
    stats.write.mode("overwrite").parquet(os.path.join(out_dir, "stats"))


def merge_bm25_shard_inplace(
    spark: SparkSession,
    index_dir: str,
    shard_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """`merge_bm25_shard` folded back into the SAME index dir with the
    pointer-swap commit: the merged artifact tables stage under
    ``{part}-{token}`` names and ONE atomic ``_live.json`` PUT flips
    all five at once — no caller-side directory renames (which object
    stores lack), readers see the old index or the new one, never a
    mix, and a crash before the PUT publishes nothing (orphans GC on
    the next swap). Same shard-local work + merge ≡ rebuild contract
    as the out-of-place form."""
    import uuid as _uuid

    token = _uuid.uuid4().hex[:12]
    staged = os.path.join(index_dir, f"_bm25_stage-{token}")
    merge_bm25_shard(spark, index_dir, shard_df, staged,
                     text_col=text_col, id_col=id_col)
    # relocate the staged tables to token part names (a LOCAL move of
    # freshly written staging output, before anything is published —
    # on a real store the merge would write token names directly)
    for name in ("postings", "docfreq", "doclen", "docs", "stats"):
        os.rename(os.path.join(staged, name),
                  os.path.join(index_dir, f"{name}-{token}"))
    import shutil as _sh

    _sh.rmtree(staged, ignore_errors=True)
    _swap_parts(index_dir, token,
                ("postings", "docfreq", "doclen", "docs", "stats"))


# -- IVF -------------------------------------------------------------------


def _assign_dist_udf(centroids: np.ndarray):
    """Arrow-vectorized: nearest centroid id (same first-max tie rule
    as `_nearest_centroids_udf`) PLUS the cosine distance to it in
    integer micro units — the additive drift statistic. One BLAS matmul
    per batch; int64 quantization keeps the later sums exact in any
    accumulation order (the repo's float-SUM rule)."""
    from pyspark.sql.functions import pandas_udf

    C = centroids

    @pandas_udf("struct<cid:int, dist_e6:long>")
    def f(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"cid": pd.Series([], dtype="int32"),
                                 "dist_e6": pd.Series([], dtype="int64")})
        mat = np.stack(v.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ C.T
        cid = np.argmax(sims, axis=1)
        best = sims[np.arange(len(cid)), cid]
        return pd.DataFrame({
            "cid": cid.astype(np.int32),
            "dist_e6": np.rint((1.0 - best) * 1e6).astype(np.int64),
        })

    return f


def _write_ivf_layout(corpus, vec_path, drift_path, centroids,
                      n_clusters, id_col, vec_col, mode: str) -> dict:
    """Assign `corpus` to `centroids` and write the cid-partitioned
    vectors plus the additive drift partials — into EXPLICIT paths
    (live dirs for build/append, token-staged dirs for the
    retrain/optimize pointer swap). The assignment (broadcast-codebook
    matmul through the Python boundary) runs ONCE: the vectors land
    with their dist_e6 micro-distance, and the drift partials are
    derived from a columnar (cid, dist_e6)-only re-read of the
    just-written parquet (overwrite) or from the lazily-checkpointed
    shard (append — the dir may hold older files the partials must not
    re-count). Returns the shard totals {"n", "sum_dist_e6"} in append
    mode so callers never re-scan for count/drift."""
    spark = corpus.sparkSession
    assigned = corpus.select(
        F.col(id_col).alias("nid"),
        similarity._to_double(F.col(vec_col)).alias("v"),
    ).withColumn("_a", _assign_dist_udf(centroids)(F.col("v"))).select(
        "nid", "v", F.col("_a.cid").alias("cid"),
        F.col("_a.dist_e6").alias("dist_e6"),
    )
    if mode == "append":
        assigned = assigned.localCheckpoint(eager=False)
    (
        assigned.select("nid", "v", "dist_e6", "cid")
        .repartition(n_clusters, "cid")
        .write.mode(mode).partitionBy("cid")
        .parquet(vec_path)
    )
    # drift sufficient statistics are PARTIAL rows (cid, n, sum_dist):
    # appends add partials, readers sum — no base re-read, ever
    if mode == "append":
        rows = assigned.groupBy("cid").agg(
            F.count("*").alias("n"),
            F.sum("dist_e6").alias("sum_dist_e6"),
        ).collect()  # ≤ n_clusters rows
        local_rows_df(
            spark,
            [(int(r["cid"]), int(r["n"]), int(r["sum_dist_e6"]))
             for r in rows],
            "cid int, n bigint, sum_dist_e6 bigint",
        ).write.mode("append").parquet(drift_path)
        return {"n": sum(int(r["n"]) for r in rows),
                "sum_dist_e6": sum(int(r["sum_dist_e6"]) for r in rows)}
    (
        spark.read.parquet(vec_path)  # prunes to (cid, dist_e6)
        .groupBy("cid")
        .agg(F.count("*").alias("n"), F.sum("dist_e6").alias("sum_dist_e6"))
        .write.mode(mode).parquet(drift_path)
    )
    return {}


def build_ivf_index(
    corpus: DataFrame,
    out_dir: str,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 4096,
    seed: int = 11,
    codebook: np.ndarray | None = None,
) -> None:
    """Train the IVF codebook once and lay the corpus out by cluster:
    centroids/ holds the (k × dim) codebook; vectors/ is the corpus
    with its assignment, PARTITIONED BY cid so a probe reads only the
    probed clusters' directories (partition pruning is the recall/cost
    dial, not a full scan); drift/ holds additive (cid, n, Σdist)
    partials — the staleness statistic `append_ivf_shard` maintains.
    Pass ``codebook`` to SKIP training and lay out under an existing
    codebook (the rebuild half of the merge≡rebuild staleness
    contract)."""
    spark = corpus.sparkSession
    centroids = codebook if codebook is not None else (
        similarity.train_ivf_centroids(
            corpus, n_clusters, sample_n=sample_n,
            id_col=id_col, vec_col=vec_col, seed=seed,
        )
    )
    cdf = local_rows_df(
        spark,
        [(i, [float(x) for x in row]) for i, row in enumerate(centroids)],
        "cid int, centroid array<double>",
    )
    cdf.write.mode("overwrite").parquet(_part_path(out_dir, "centroids"))
    _write_ivf_layout(corpus, _part_path(out_dir, "vectors"),
                      _part_path(out_dir, "drift"), centroids,
                      len(centroids), id_col, vec_col, mode="overwrite")


def append_ivf_shard(
    spark: SparkSession,
    index_dir: str,
    shard_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incrementally fold a NEW vector shard into a persisted IVF index
    — the IVF twin of `merge_bm25_shard`. The EXISTING codebook is NOT
    retrained: the shard is assigned to it in one shard-local job and
    its files land inside the cid-partitioned layout (plus additive
    drift partials), so serve-after-append ≡ serve-after-rebuild with
    the SAME codebook, row for row (pinned by test). The honest
    staleness contract is the drift metric: as appended data wanders
    from the training distribution, mean distance-to-assigned-centroid
    rises — `ivf_drift` is the retrain signal, and the returned dict
    carries it before/after this shard.

    Contract: shard ids are disjoint from the corpus (append-only
    ingest). Scale shape: cost is O(shard) — assignment is a broadcast
    codebook matmul, the write touches only the shard's rows; the base
    vectors/ directories are never read or rewritten. The before/after
    drift pair folds the shard's own partials into ONE base drift scan
    (same integer arithmetic as re-folding the dir — exact), and the
    shard count rides the partials instead of a separate pass."""
    s0, n0 = _ivf_drift_sums(spark, index_dir)
    before = int(s0 // n0) if n0 else 0
    centroids = load_ivf_codebook(spark, index_dir)
    st = _write_ivf_layout(shard_df, _part_path(index_dir, "vectors"),
                           _part_path(index_dir, "drift"), centroids,
                           len(centroids), id_col, vec_col, mode="append")
    s1, n1 = s0 + st["sum_dist_e6"], n0 + st["n"]
    after = int(s1 // n1) if n1 else 0
    return {"n_appended": st["n"],
            "mean_dist_e6_before": before, "mean_dist_e6_after": after}


LIVE_POINTER = "_live.json"

#: artifact-dir basenames the pointer may remap / the GC may reclaim
_PART_NAMES = ("centroids", "vectors", "drift", "buckets", "shingles",
               "postings", "docfreq", "doclen", "docs", "stats")


def _live_map(index_dir: str) -> dict:
    """The pointer file mapping part name -> physical dir name. Absent
    (a freshly built index) means every part lives under its plain
    name. The pointer is the index's ONE mutable object: retrain and
    optimize stage token-named dirs and commit them with a single
    atomic whole-object PUT of this map — the object-store-portable
    replacement for the old directory-rename swap (object stores have
    no atomic rename; a conditional/replace PUT they do have). Readers
    resolve through it per query, so they see the old layout or the
    new one, never a mix."""
    import json

    try:
        with open(os.path.join(index_dir, LIVE_POINTER)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {}


def _part_path(index_dir: str, part: str) -> str:
    return os.path.join(index_dir, _live_map(index_dir).get(part, part))


def _gc_unreferenced_parts(index_dir: str) -> None:
    """Reclaim physical part dirs the pointer no longer references:
    superseded live dirs after a swap, and token-staged orphans of
    crashed swaps (a crash BEFORE the pointer PUT publishes nothing —
    the old layout stays live and the orphans are garbage). Runs after
    every successful swap; safe because nothing can reference an
    unmapped dir except an in-flight reader that resolved before the
    PUT — the same momentary window the old rename swap had
    (maintainers are single-writer per index; re-resolve per query)."""
    import shutil

    m = _live_map(index_dir)
    live = {m.get(part, part) for part in _PART_NAMES}
    for d in os.listdir(index_dir):
        full = os.path.join(index_dir, d)
        if not os.path.isdir(full) or d in live:
            continue
        base = d.split("-", 1)[0]
        if base in _PART_NAMES:
            shutil.rmtree(full, ignore_errors=True)


def _swap_parts(index_dir: str, token: str, parts) -> None:
    """COMMIT a staged retrain/optimize: one atomic pointer PUT flips
    every ``part`` to its ``{part}-{token}`` staged dir at once, then
    unreferenced dirs are reclaimed. No marker, no healing protocol —
    the PUT either happened (new layout live everywhere) or it didn't
    (old layout untouched, staged dirs are orphans for the next GC)."""
    import json

    from distribot_spark.sources.storage import get_backend

    new = dict(_live_map(index_dir))
    for part in parts:
        new[part] = f"{part}-{token}"
    get_backend().put(os.path.join(index_dir, LIVE_POINTER),
                      json.dumps(new).encode())
    _gc_unreferenced_parts(index_dir)


def _parquet_file_count(d: str) -> int:
    return sum(1 for root, _dirs, files in os.walk(d)
               for f in files if f.endswith(".parquet"))


def optimize_ivf_index(spark: SparkSession, index_dir: str) -> dict:
    """OPTIMIZE the IVF layout: every `append_ivf_shard` adds one file
    per touched cid partition plus a drift-partial file, so probes of a
    long-appended index open O(appends) files per probed cluster. The
    compaction rewrites vectors/ to ONE file per cid and folds drift/
    partials to one row per cid (integer sums — `ivf_drift` is exact
    in any order, so fold ≡ accumulate), then commits with ONE atomic
    pointer PUT (`_swap_parts` — no directory renames, so the swap
    holds on an object store; a crash before the PUT publishes
    nothing). probe-after ≡ probe-before
    table-for-table and the probe stays partition-pruned — both
    pinned by tests, mirroring OPTIMIZE's contract on tables."""
    import uuid as _uuid

    token = _uuid.uuid4().hex[:12]
    vdir = _part_path(index_dir, "vectors")
    before = _parquet_file_count(vdir)
    vectors = spark.read.parquet(vdir)
    n_clusters = load_ivf_codebook(spark, index_dir).shape[0]
    (
        vectors.repartition(n_clusters, "cid")
        .write.mode("overwrite").partitionBy("cid")
        .parquet(os.path.join(index_dir, f"vectors-{token}"))
    )
    (
        spark.read.parquet(_part_path(index_dir, "drift"))
        .groupBy("cid")
        .agg(F.sum("n").alias("n"),
             F.sum("sum_dist_e6").alias("sum_dist_e6"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, f"drift-{token}"))
    )
    _swap_parts(index_dir, token, ("vectors", "drift"))
    return {"files_before": before,
            "files_after": _parquet_file_count(
                _part_path(index_dir, "vectors"))}


def optimize_minhash_index(spark: SparkSession, index_dir: str) -> dict:
    """OPTIMIZE the MinHash/LSH index: every `append_minhash_shard`
    lands up to 8 files per touched pb partition plus shingle files,
    so a long-appended index makes every probe open O(appends) files
    in each pruned partition. The compaction rewrites buckets/ to one
    file per pb partition and shingles/ to a bounded file count, with
    the same atomic pointer-PUT commit as the IVF OPTIMIZE. probe-after ≡
    probe-before table-for-table (the serve query shares the exact-
    Jaccard oracle) and the probe's PartitionFilters survive —
    plan-gated."""
    import uuid as _uuid

    m = _minhash_meta(index_dir)
    token = _uuid.uuid4().hex[:12]
    bdir = _part_path(index_dir, "buckets")
    before = _parquet_file_count(bdir)
    (
        spark.read.parquet(bdir)
        .repartition(m["parts"], "pb")
        .write.mode("overwrite").partitionBy("pb")
        .parquet(os.path.join(index_dir, f"buckets-{token}"))
    )
    (
        spark.read.parquet(_part_path(index_dir, "shingles"))
        .repartition(8, "doc")
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, f"shingles-{token}"))
    )
    _swap_parts(index_dir, token, ("buckets", "shingles"))
    return {"files_before": before,
            "files_after": _parquet_file_count(
                _part_path(index_dir, "buckets"))}


def retrain_ivf_index(
    spark: SparkSession,
    index_dir: str,
    iters: int = 3,
) -> dict:
    """RETRAIN-AND-SWAP (VERDICT r7 task 4): consume the accumulated
    drift by re-training the codebook — warm-started from the CURRENT
    centroids, whose assignments already carry the drift signal — with
    distributed Lloyd iterations over the index's own vectors, then
    re-assign the corpus in ONE Spark job and swap the cid-partitioned
    layout ATOMICALLY (stage ``{part}-<token>`` dirs, then ONE pointer
    PUT — `_swap_parts` — publishes all three at once; a crash before
    it publishes nothing and the orphans GC on the next swap; no
    directory rename anywhere, so the protocol holds on an object
    store). Drift partials are
    rewritten from the new assignment, so `ivf_drift` falls to the
    retrained baseline.

    Scale shape per iteration: one broadcast-codebook matmul
    assignment pass + one (cid, component) partial-agg — k×dim rows to
    the driver, never vectors. The final layout write is the same
    one-pass job `build_ivf_index` runs. Serve-after-retrain equals a
    from-scratch rebuild under the retrained codebook row-for-row
    (pinned by test); probes stay partition-pruned (plan-gated)."""
    import uuid as _uuid

    drift_before = ivf_drift(spark, index_dir)
    C = load_ivf_codebook(spark, index_dir)
    k, d = C.shape
    vecs = spark.read.parquet(
        _part_path(index_dir, "vectors")).select("nid", "v")
    # spherical k-means over UNIT vectors (the trainer's convention);
    # checkpointed ONCE — the Lloyd loop and the final re-assignment
    # pass read the materialized rows instead of re-scanning the
    # parquet (iters+1 source scans → 1; guide §1.2)
    vecs_n = vecs.withColumn(
        "vn",
        F.expr("transform(v, x -> x / "
               "sqrt(aggregate(v, 0D, (a, x) -> a + x * x)))"),
    ).localCheckpoint(eager=False)
    for _ in range(max(int(iters), 1)):
        assigned = vecs_n.withColumn(
            "_a", _assign_dist_udf(C)(F.col("v")))
        rows = (
            assigned.select(F.col("_a.cid").alias("cid"),
                            F.posexplode("vn").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()  # ≤ k × dim rows: driver-bounded by design
        )
        sums = np.zeros((k, d))
        counts = np.zeros(k)
        for r in rows:
            sums[r["cid"], r["pos"]] = float(r["s"])
            counts[r["cid"]] = float(r["n"])
        newC = C.copy()
        nz = counts > 0  # empty cluster keeps its old centroid
        newC[nz] = sums[nz] / counts[nz, None]
        C = newC / np.linalg.norm(newC, axis=1, keepdims=True)

    token = _uuid.uuid4().hex[:12]
    cdf = local_rows_df(
        spark,
        [(i, [float(x) for x in row]) for i, row in enumerate(C)],
        "cid int, centroid array<double>")
    cdf.write.mode("overwrite").parquet(
        os.path.join(index_dir, f"centroids-{token}"))
    _write_ivf_layout(vecs_n.select("nid", "v"),
                      os.path.join(index_dir, f"vectors-{token}"),
                      os.path.join(index_dir, f"drift-{token}"),
                      C, k, "nid", "v", mode="overwrite")
    # COMMIT POINT: one atomic pointer PUT flips all three parts; a
    # crash anywhere before it publishes nothing (the staged token
    # dirs are orphans for the next swap's GC)
    _swap_parts(index_dir, token, ("centroids", "vectors", "drift"))
    drift_after = ivf_drift(spark, index_dir)
    return {"token": token, "iters": int(iters),
            "drift_before_e6": drift_before,
            "drift_after_e6": drift_after,
            "codebook": C}


def ivf_drift(spark: SparkSession, index_dir: str) -> int:
    """Mean cosine distance to the assigned centroid over the WHOLE
    index, in integer micro units — folded from the additive drift/
    partials (never a vectors/ rescan). Rising drift means the frozen
    codebook no longer describes the data: retrain when it crosses the
    operator's budget (the honest answer to 'when do I rebuild?')."""
    s, n = _ivf_drift_sums(spark, index_dir)
    return int(s // n) if n else 0


def _ivf_drift_sums(spark: SparkSession, index_dir: str) -> tuple:
    """(Σ dist_e6, Σ n) folded from the drift/ partials — the raw
    sufficient statistics, so callers that add their own partials
    (append) derive the updated drift without a second dir scan."""
    r = (
        spark.read.parquet(_part_path(index_dir, "drift"))
        .agg(F.sum("sum_dist_e6").alias("s"), F.sum("n").alias("n"))
        .first()
    )
    return (int(r["s"]) if r["n"] else 0, int(r["n"]) if r["n"] else 0)


def load_ivf_codebook(spark: SparkSession, index_dir: str) -> np.ndarray:
    rows = (
        spark.read.parquet(_part_path(index_dir, "centroids"))
        .orderBy("cid").collect()
    )
    return np.array([r["centroid"] for r in rows], dtype=np.float64)


def serve_ivf_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted IVF index: codebook loads driver-side (k × dim,
    bounded), each query explodes to its `n_probe` nearest clusters, and
    the cluster equi-join against the cid-partitioned vectors scans ONLY
    the probed partitions. Output contract = `similarity.ivf_topk`; with
    the same codebook parameters the results are identical rows (pinned
    by test)."""
    from pyspark.sql import Window

    centroids = load_ivf_codebook(spark, index_dir)
    vectors = spark.read.parquet(_part_path(index_dir, "vectors"))
    proben = similarity._nearest_centroids_udf(centroids, n_probe)
    q = queries.select(
        F.col(id_col).alias("qid"),
        similarity._to_double(F.col(vec_col)).alias("qv"),
    ).withColumn("probes", proben(F.col("qv")))
    qx = q.select("qid", "qv", F.explode("probes").alias("cid"))
    cands = F.broadcast(qx).join(vectors, "cid")
    scored = cands.select(
        "qid", "nid",
        similarity.cosine_similarity(F.col("qv"), F.col("v")).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "nid", "rnk",
                (F.round(F.col("cos") * 10000, 0) / 10000).alias("cos"))
    )


# -- MinHash/LSH dedup index -------------------------------------------------
#
# The real 100 TB crawl workflow is INCREMENTAL: "dedup the NEW shard
# against the standing corpus", not re-shingle and re-band everything
# per crawl. The band-bucket structure `dedup.minhash_band_buckets`
# computes per query persists here as parquet artifacts (the
# BM25/IVF discipline applied to L2):
#
#   buckets/  (doc, bucket) partitioned by pb = pmod(bucket, parts) —
#             the LSH candidate structure; the partition column is what
#             makes a probe a PARTITION-PRUNED scan (≤ parts dirs, only
#             those the probe's buckets hash into)
#   shingles/ (doc, h) distinct hashed shingles — exact verification
#   meta.json  shingle_n / num_hashes / bands / parts — append MUST
#             reuse the build parameters or buckets are incomparable
#
# Append is shard-local (the base corpus is never re-read); probe
# broadcasts the new docs' bucket entries against the pruned index
# scan. append-then-probe ≡ rebuild-then-probe table-for-table is the
# staleness contract (pinned by tests/test_retrieval_index.py), and
# the candidate→exact-verify semantics are IDENTICAL to
# `dedup.minhash_candidate_pairs` — which is what lets the serve query
# share l2_minhash_pairs' exact Jaccard oracle verbatim.

MINHASH_PARTS = 64


def _buckets_of_shingles(shingles, num_hashes, bands, parts):
    """(doc, bucket, pb) from a (doc, h) shingle relation. min() is
    duplicate-insensitive, so feeding the DISTINCT shingle relation (or
    its parquet artifact) yields buckets identical to the raw-explode
    path — which is what lets build/append/probe pay the expensive
    text→shingle pass ONCE and derive the signature branch from the
    materialized shingles instead of re-shingling (guide §1.2)."""
    from distribot_spark.operators import dedup

    return dedup.minhash_band_buckets(
        shingles, num_hashes, bands
    ).withColumn("pb", F.pmod(F.col("bucket"), F.lit(parts)).cast("int"))


def _minhash_relations(df, text_col, id_col, shingle_n, num_hashes,
                       bands, parts):
    from distribot_spark.operators import dedup

    shingles = dedup.shingle_hashes(df, text_col, id_col, shingle_n)
    buckets = _buckets_of_shingles(shingles, num_hashes, bands, parts)
    return buckets, shingles


def build_minhash_index(
    df: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    parts: int = MINHASH_PARTS,
) -> None:
    """Materialize the standing corpus's LSH band-bucket index.

    One text pass: the distinct shingle relation is written first, and
    the bucket branch (128 per-doc mins → band hashes) aggregates the
    WRITTEN shingles/ parquet — a fixed-width long scan — instead of
    re-shingling the corpus text (min() is duplicate-insensitive, so
    distinct-then-min ≡ raw-then-min; guide §1.2)."""
    import json

    from distribot_spark.operators import dedup

    shingles = dedup.shingle_hashes(df, text_col, id_col, shingle_n)
    shingles.write.mode("overwrite").parquet(
        os.path.join(out_dir, "shingles"))
    sh_written = df.sparkSession.read.parquet(
        os.path.join(out_dir, "shingles"))
    buckets = _buckets_of_shingles(sh_written, num_hashes, bands, parts)
    (
        buckets.repartition(parts, "pb")
        .write.mode("overwrite").partitionBy("pb")
        .parquet(os.path.join(out_dir, "buckets"))
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as fh:
        json.dump({"shingle_n": shingle_n, "num_hashes": num_hashes,
                   "bands": bands, "parts": parts}, fh)


def _minhash_meta(index_dir: str) -> dict:
    import json

    with open(os.path.join(index_dir, "meta.json")) as fh:
        return json.load(fh)


def minhash_index_pairs(
    spark: SparkSession,
    index_dir: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Standing-corpus near-duplicate pairs straight from the PERSISTED
    artifacts: buckets/ self-joined on the band-salted bucket key for
    candidates, exact Jaccard verified from shingles/. Row-identical to
    `dedup.minhash_candidate_pairs` over the indexed corpus, because
    buckets/ and shingles/ ARE that pipeline's two intermediate
    relations, materialized once at build time — recomputing them from
    text (the serve queries' original shape) re-pays the full shingle +
    128-hash signature pass over the whole standing corpus that the
    build already paid (guide §1.2: don't compute things you throw
    away). The candidate self-join reads the partitioned parquet, so
    the corpus text is never touched."""
    from distribot_spark.operators import dedup

    b = spark.read.parquet(_part_path(index_dir, "buckets"))
    b1, b2 = b.alias("b1"), b.alias("b2")
    candidates = (
        b1.join(
            b2,
            (F.col("b1.bucket") == F.col("b2.bucket"))
            & (F.col("b1.doc") < F.col("b2.doc")),
        )
        .select(F.col("b1.doc").alias("da"), F.col("b2.doc").alias("db"))
        .dropDuplicates()
    )
    sh = spark.read.parquet(_part_path(index_dir, "shingles"))
    return dedup._verify_jaccard(candidates, sh, threshold)


def shard_minhash_relations(
    spark: SparkSession,
    index_dir: str,
    shard_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """The (buckets, shingles) relations of a NEW shard under the
    index's pinned meta parameters, lineage-cut with a lazy
    localCheckpoint so ONE shingle + signature pass serves both the
    append (which writes them) and the probe (which joins them).
    Without the pin, `append_minhash_shard` and `probe_minhash_index`
    each recompute the relations from text — two full passes over the
    shard for one crawl-loop iteration. The checkpoint is shard-sized
    (docs × bands bucket rows + hashed shingles), the same bounded
    intermediate the append stages anyway. The buckets relation is
    DERIVED from the pinned shingles (min over distinct ≡ min over
    raw), so the text → shingle pass runs once even across the two
    relations."""
    from distribot_spark.operators import dedup

    m = _minhash_meta(index_dir)
    shingles = dedup.shingle_hashes(
        shard_df, text_col, id_col, m["shingle_n"]
    ).localCheckpoint(eager=False)
    buckets = _buckets_of_shingles(
        shingles, m["num_hashes"], m["bands"], m["parts"]
    ).localCheckpoint(eager=False)
    return buckets, shingles


def append_minhash_shard(
    spark: SparkSession,
    index_dir: str,
    shard_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    relations: tuple[DataFrame, DataFrame] | None = None,
) -> int:
    """Fold a NEW corpus shard into the persisted LSH index — shard-
    local work only (shingle + band the shard, append its rows into
    the partitioned layout); the standing corpus artifacts are never
    read or rewritten. Contract: shard doc ids are DISJOINT from the
    indexed corpus (append-only ingest, the merge_bm25_shard rule).
    Buckets are comparable across build and append because the meta
    parameters (shingle width, hash family size, band count, partition
    modulus) are read back, never re-chosen. Returns the shard row
    count. ``relations`` short-circuits the shard's (buckets, shingles)
    computation with the pinned pair from `shard_minhash_relations` —
    the one-pass crawl-loop shape."""
    m = _minhash_meta(index_dir)
    buckets, shingles = relations if relations is not None else (
        _minhash_relations(
            shard_df, text_col, id_col,
            m["shingle_n"], m["num_hashes"], m["bands"], m["parts"]))
    (
        buckets.repartition(min(m["parts"], 8), "pb")
        .write.mode("append").partitionBy("pb")
        .parquet(_part_path(index_dir, "buckets"))
    )
    shingles.write.mode("append").parquet(
        _part_path(index_dir, "shingles"))
    return shard_df.count()


def probe_minhash_index(
    spark: SparkSession,
    index_dir: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    relations: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Exact-verified near-duplicate pairs between ``new_docs`` and
    EVERY indexed document (da < db; if the new docs were already
    appended, shard-internal pairs surface too and self-pairs never
    do). The probe touches only COLLIDING buckets: the new docs'
    bucket entries are computed locally, their partition keys prune
    the buckets/ scan (PartitionFilters — plan-gated), and the probe
    side is broadcast into the candidate join, so the standing corpus
    is never shuffled. Verification prunes the shingle table to
    candidate docs with a broadcast semi-join, then runs the SAME
    exact-Jaccard check as `dedup.minhash_candidate_pairs`
    (`_verify_jaccard`), so serve ≡ direct, which the shared oracle
    certifies."""
    from distribot_spark.operators import dedup

    m = _minhash_meta(index_dir)
    nb, nsh = relations if relations is not None else (
        _minhash_relations(
            new_docs, text_col, id_col,
            m["shingle_n"], m["num_hashes"], m["bands"], m["parts"]))
    pbs = [int(r["pb"]) for r in nb.select("pb").distinct().collect()]
    idx = (
        spark.read.parquet(_part_path(index_dir, "buckets"))
        .filter(F.col("pb").isin(pbs))  # partition-pruned
    )
    probe = nb.select(F.col("doc").alias("_ndoc"),
                      F.col("bucket").alias("_nbucket"))
    cand = (
        idx.join(
            F.broadcast(probe),
            (F.col("bucket") == F.col("_nbucket"))
            & (F.col("doc") != F.col("_ndoc")),
        )
        .select(
            F.least("doc", "_ndoc").alias("da"),
            F.greatest("doc", "_ndoc").alias("db"),
        )
        .dropDuplicates()
    )
    cand_docs = (
        cand.select(F.col("da").alias("doc"))
        .unionByName(cand.select(F.col("db").alias("doc")))
        .dropDuplicates()
    )
    sh = (
        spark.read.parquet(_part_path(index_dir, "shingles"))
        .unionByName(nsh)
        .dropDuplicates(["doc", "h"])  # probe docs may be indexed too
        .join(F.broadcast(cand_docs), "doc", "left_semi")
    )
    return dedup._verify_jaccard(cand, sh, threshold)
