"""Connected components — duplicate-pair graphs → duplicate clusters.

The missing last step of a dedup pipeline: pair generators (minhash LSH,
SimHash, embedding cosine) emit EDGES, but retention decisions need
GROUPS — "these 5 docs are one duplicate cluster; keep the canonical
one". Component id = min doc id in the component, so the labeling is
deterministic and the canonical pick (id == component) is free.

Algorithm: iterative min-label propagation over the symmetrized edge
list — `label(n) ← min(label(n), min over neighbors label(m))` composed
with pointer jumping (`label(n) ← label(label(n))`) each round, until a
fixpoint. Entirely DataFrame joins/aggregations (shuffle-based, no
driver materialization; `localCheckpoint` cuts the lineage every
iteration so plan size stays constant). The jumping step makes label
distances shrink multiplicatively, so convergence is O(log diameter)
rounds even on chain-shaped graphs — near-dup graphs (dense little
cliques) converge in 2-3. The max_iter guard fails loudly rather than
returning a half-propagated labeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class _pinned_shuffle_partitions:
    """Pin shuffle partitions to the LABEL relation's scale for the
    propagation loop: dup-pair graphs are orders of magnitude smaller
    than the corpus that produced them, and iterating tiny joins at the
    session's corpus-sized shuffle width is pure scheduling overhead
    (measured 14 s → ~2 s at sf0.1 for a 477-node graph). Restored on
    exit; at 100 TB `rows_per_partition` keeps partitions ~1M edges."""

    def __init__(self, spark, n_rows: int, rows_per_partition: int = 1_000_000):
        self.spark = spark
        self.n = str(max(1, n_rows // rows_per_partition))

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.n)

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


def connected_components(
    edges: DataFrame,
    src: str = "da",
    dst: str = "db",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node in `edges`, where component is the
    smallest node id reachable (undirected). Raises RuntimeError if the
    fixpoint isn't reached in `max_iter` propagation rounds."""
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    # materialize the (possibly expensive) upstream pair plan exactly once
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    n_edges = sym.count()  # cheap: counts the checkpointed RDD

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    with _pinned_shuffle_partitions(sym.sparkSession, n_edges):
        for _ in range(max_iter):
            nbr = (
                sym.join(labels, sym.dst == labels.id)
                .groupBy("src")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            stepped = labels.join(nbr, labels.id == nbr.src, "left").select(
                "id",
                F.col("comp").alias("_old"),
                # least() ignores nulls (isolated node keeps its label)
                F.least("comp", "nbr_comp").alias("comp"),
            )
            # pointer jumping: comp ← label(comp). Labels are node ids, so
            # label-of-label is defined; composing it with the one-hop
            # propagation above makes label distances shrink
            # multiplicatively — O(log diameter) rounds on chains instead
            # of O(diameter), at the cost of one extra tiny self-join
            jump = stepped.select(
                F.col("id").alias("_jid"), F.col("comp").alias("_jcomp")
            )
            merged = (
                stepped.join(jump, stepped.comp == jump._jid, "left")
                .select(
                    "id", "_old", F.least("comp", "_jcomp").alias("comp")
                )
                .localCheckpoint(eager=True)
            )
            changed = merged.filter(F.col("comp") != F.col("_old")).count()
            labels = merged.select("id", "comp")
            if changed == 0:
                return labels
    raise RuntimeError(
        f"connected_components: no fixpoint in {max_iter} rounds — "
        "pathological graph shape; raise max_iter"
    )


def duplicate_clusters(
    pairs: DataFrame, src: str = "da", dst: str = "db"
) -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id, cluster_size, is_canonical).
    Canonical = the smallest doc id of its cluster (the reproducible
    keep-one-of-each policy). Only docs appearing in a pair are returned;
    unpaired docs are trivially their own cluster and need no row."""
    cc = connected_components(pairs, src=src, dst=dst)
    w = Window.partitionBy("comp")
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        F.count("*").over(w).alias("cluster_size"),
        (F.col("id") == F.col("comp")).alias("is_canonical"),
    )


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge form: (a, b) with a < b, deduped."""
    return (
        e.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """large-star (Kiveris et al. 2014, alg. 2): every node connects its
    LARGER neighbors to its minimum — strictly decreases large-neighbor
    potential, never grows a neighborhood beyond its current size."""
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    m = sym.groupBy("a").agg(F.min("b").alias("mn")).select(
        "a", F.least("mn", F.col("a")).alias("m")
    )
    out = (
        sym.filter(F.col("b") > F.col("a"))
        .join(m, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    return _canon(out)


def _small_star(e: DataFrame) -> DataFrame:
    """small-star: every node hangs its SMALLER neighbors (and itself)
    off its minimum — flattens chains of small neighbors into stars."""
    o = e.select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
    m = o.groupBy("u").agg(F.min("v").alias("m"))
    hang = (
        o.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
    )
    self_edge = m.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return _canon(hang.union(self_edge))


def connected_components_star(
    edges: DataFrame,
    src: str = "da",
    dst: str = "db",
    max_iter: int = 25,
) -> DataFrame:
    """(id, comp) via the published TWO-PHASE star algorithm (Kiveris,
    Lattanzi, Mirrokni, Rastogi, Vassilvitskii 2014, "Connected
    Components in MapReduce and Beyond"): alternate large-star /
    small-star until the edge set is a fixpoint, at which point the
    graph is a forest of depth-1 stars rooted at each component's
    minimum. O(log² n) rounds with high probability, and — the property
    min-label propagation lacks — every intermediate neighborhood is
    BOUNDED by the input's (large-star never grows a node's degree), so
    no round can blow up on a hub. This is the alternating scale twin
    of `connected_components`; `test_star_components_equal_propagation`
    pins the labelings equal on planted shapes and the live dup graph."""
    e = _canon(
        edges.select(
            F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
        )
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("a").alias("id"))
        .union(e.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    with _pinned_shuffle_partitions(e.sparkSession, n_edges):
        for _ in range(max_iter):
            stepped = _small_star(_large_star(e)).localCheckpoint(eager=True)
            unchanged = (
                stepped.exceptAll(e).isEmpty() and e.exceptAll(stepped).isEmpty()
            )
            e = stepped
            if unchanged:
                # fixpoint: canonical (a, b) edges are (root, child) —
                # the root is the component MINIMUM, i.e. the smaller end
                child = e.select(
                    F.col("b").alias("id"), F.col("a").alias("comp")
                )
                roots = nodes.join(
                    e.select(F.col("b").alias("id")), "id", "left_anti"
                ).select("id", F.col("id").alias("comp"))
                return child.select("id", "comp").union(roots)
    raise RuntimeError(
        f"connected_components_star: no fixpoint in {max_iter} rounds"
    )
