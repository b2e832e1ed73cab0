"""Persisted retrieval indexes (operators/index.py): train once, serve
many. Pins (1) serve-equals-direct for BM25 and IVF — the artifacts
change WHERE the statistics live, never the scores; (2) the incremental
maintenance contract — merging a new corpus shard into a persisted BM25
index equals rebuilding from the unioned corpus, table for table (the
staleness answer: artifacts never drift from the corpus they claim to
index); (3) the IVF layout's partition pruning.
"""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from distribot_spark.catalog import load_table
from distribot_spark.operators import index as rindex
from distribot_spark.operators import similarity, text
from tests.conftest import SF_ORACLE


def _tmp():
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    return tempfile.mkdtemp(prefix="rix_", dir="/root/repo/.tmp")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_bm25_serve_equals_direct(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    ix = _tmp()
    try:
        rindex.build_bm25_index(docs, ix)
        served = rindex.serve_bm25_topk(spark, ix, 3, 3, 5)
        direct = text.bm25_topk(docs, "text", "doc_id", 3, 3, 5)
        assert _rows(served) == _rows(direct)
    finally:
        shutil.rmtree(ix, ignore_errors=True)


def test_bm25_merge_shard_equals_rebuild(spark):
    """Append-only ingest: build on the even-doc half, merge the odd-doc
    shard, compare EVERY artifact table to a from-scratch build on the
    full corpus — exact equality, so served scores can never drift."""
    docs = load_table(spark, SF_ORACLE, "documents")
    base_corpus = docs.filter(F.col("doc_id") % 2 == 0)
    shard = docs.filter(F.col("doc_id") % 2 == 1)
    base, merged, full = _tmp(), _tmp(), _tmp()
    try:
        rindex.build_bm25_index(base_corpus, base)
        rindex.merge_bm25_shard(spark, base, shard, merged)
        rindex.build_bm25_index(docs, full)
        m, f = (rindex.load_bm25_index(spark, d) for d in (merged, full))
        for name in ("postings", "docfreq", "doclen", "docs", "stats"):
            assert _rows(m[name]) == _rows(f[name]), name
        # and the serve path over the merged index equals direct BM25
        # over the full corpus
        assert _rows(rindex.serve_bm25_topk(spark, merged, 3, 3, 5)) == _rows(
            text.bm25_topk(docs, "text", "doc_id", 3, 3, 5)
        )
    finally:
        for d in (base, merged, full):
            shutil.rmtree(d, ignore_errors=True)


def test_ivf_serve_equals_direct(spark):
    emb = load_table(spark, SF_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    ix = _tmp()
    try:
        rindex.build_ivf_index(corpus, ix, n_clusters=16)
        served = rindex.serve_ivf_topk(spark, ix, queries, k=5, n_probe=4)
        direct = similarity.ivf_topk(
            corpus, queries, k=5, n_clusters=16, n_probe=4
        )
        assert _rows(served) == _rows(direct)
    finally:
        shutil.rmtree(ix, ignore_errors=True)


def test_ivf_layout_partitioned_by_cluster(spark):
    """The artifact IS the pruning structure: vectors/ is laid out one
    directory per cluster, and probing a single known cluster via a
    literal filter reads only that partition (PartitionFilters in the
    scan, not a full-corpus scan)."""
    emb = load_table(spark, SF_ORACLE, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 10)
    ix = _tmp()
    try:
        rindex.build_ivf_index(corpus, ix, n_clusters=16)
        vdir = os.path.join(ix, "vectors")
        parts = [d for d in os.listdir(vdir) if d.startswith("cid=")]
        assert len(parts) >= 8  # clusters materialized as directories
        vectors = spark.read.parquet(vdir)
        plan = vectors.filter(F.col("cid") == 3)._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cid" in plan
    finally:
        shutil.rmtree(ix, ignore_errors=True)


def test_ivf_append_shard_equals_rebuild_same_codebook(spark):
    """IVF incremental maintenance: appending a new shard assigns it to
    the EXISTING codebook in a shard-local job; serving the appended
    index equals serving a from-scratch layout of the full corpus under
    the SAME codebook, row for row — and the drift partials fold to the
    same statistic either way (merge ≡ rebuild, the BM25 contract
    extended to IVF)."""
    emb = load_table(spark, SF_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    half = emb.filter(F.col("vec_id") >= 10).agg(
        F.expr("percentile(vec_id, 0.5e0)")
    ).first()[0]
    base_corpus = emb.filter(
        (F.col("vec_id") >= 10) & (F.col("vec_id") <= half)
    )
    shard = emb.filter(F.col("vec_id") > half)
    appended, rebuilt = _tmp(), _tmp()
    try:
        rindex.build_ivf_index(base_corpus, appended, n_clusters=16)
        codebook = rindex.load_ivf_codebook(spark, appended)
        st = rindex.append_ivf_shard(spark, appended, shard)
        assert st["n_appended"] == shard.count()

        rindex.build_ivf_index(
            emb.filter(F.col("vec_id") >= 10), rebuilt,
            n_clusters=16, codebook=codebook,
        )
        sa = rindex.serve_ivf_topk(spark, appended, queries, k=5, n_probe=4)
        sr = rindex.serve_ivf_topk(spark, rebuilt, queries, k=5, n_probe=4)
        assert _rows(sa) == _rows(sr)
        assert rindex.ivf_drift(spark, appended) == rindex.ivf_drift(
            spark, rebuilt
        )
    finally:
        shutil.rmtree(appended, ignore_errors=True)
        shutil.rmtree(rebuilt, ignore_errors=True)


def test_ivf_drift_signals_distribution_shift(spark):
    """The staleness contract, pinned deterministically: a corpus of
    tight clusters around orthogonal axes trains a codebook whose
    centroids sit on those axes; appending MORE on-axis vectors barely
    moves mean distance-to-centroid, appending vectors pointing at the
    equal-angle diagonal (cos 1/sqrt(8) to every axis) drives it up by
    an order of magnitude. That rise is the retrain signal."""
    import math

    dim, axes = 16, 8

    def on_axis(i):
        a = i % axes
        v = [0.0] * dim
        v[a] = 1.0
        v[(a + axes) % dim] = 0.05 * math.sin(i)  # deterministic jitter
        return (i, v)

    diag = [1.0 / math.sqrt(axes)] * axes + [0.0] * (dim - axes)
    corpus = spark.createDataFrame(
        [on_axis(i) for i in range(400)],
        "vec_id long, embedding array<double>",
    )
    in_dist = spark.createDataFrame(
        [on_axis(i) for i in range(400, 480)],
        "vec_id long, embedding array<double>",
    )
    shifted = spark.createDataFrame(
        [(i, diag) for i in range(1000, 1080)],
        "vec_id long, embedding array<double>",
    )
    ix = _tmp()
    try:
        rindex.build_ivf_index(corpus, ix, n_clusters=axes)
        st1 = rindex.append_ivf_shard(spark, ix, in_dist)
        st2 = rindex.append_ivf_shard(spark, ix, shifted)
        assert st2["mean_dist_e6_after"] > st2["mean_dist_e6_before"]
        rise = st2["mean_dist_e6_after"] - st2["mean_dist_e6_before"]
        wobble = abs(st1["mean_dist_e6_after"] - st1["mean_dist_e6_before"])
        assert rise > 10 * max(wobble, 100), (rise, wobble)
    finally:
        shutil.rmtree(ix, ignore_errors=True)
