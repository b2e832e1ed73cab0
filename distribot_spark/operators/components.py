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
