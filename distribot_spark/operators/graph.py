"""Iterative graph analytics on DataFrames: PageRank.

Power iteration as pure joins/aggregations — the classic
"rank flows along edges" shape (Brin/Page 1998; the Spark-native
formulation mirrors GraphX's contribution-propagation):

    rank'(v) = (1-d)/N + d * Σ_{u→v} rank(u) / out_deg(u)

Every iteration is one equi-join (edges ⋈ ranks on src) + one
aggregation (sum contributions by dst) + one left join back onto the
node set (so sink-only nodes keep receiving the teleport term). Scale
shape: edges shuffle-partition on src ONCE per iteration, ranks are
orders of magnitude smaller than edges and co-shuffle; at 100 TB the
edge relation is the unit of scale and nothing touches the driver.
`localCheckpoint` cuts the lineage each iteration so the plan doesn't
grow; `_pinned_shuffle_partitions` (components.py) sizes the loop's
shuffles to the graph, not the corpus.

Convergence to a fixed tolerance would need a driver-side delta check
per iteration (an extra action); for the declared query we run a FIXED
iteration count — deterministic cost, deterministic output, and the
semantics the rows-only check + numpy-reference test can pin down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distribot_spark.operators.components import _pinned_shuffle_partitions


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 5,
    checkpoint_every: int = 2,
) -> DataFrame:
    """(id, rank) after `iterations` rounds of power iteration over the
    DIRECTED edge list (duplicate edges should be pre-distinct'd; a node
    with no out-edges contributes nothing — standard dangling handling
    is up to the caller, e.g. symmetrize the edge list).

    Returns rank as an unnormalized double (sums to ~1 over nodes when
    there are no dangling nodes)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ew = e.join(
        e.groupBy("src").agg(F.count("*").alias("out_deg")), "src"
    ).localCheckpoint(eager=True)
    n_edges = ew.count()

    # node set from the CHECKPOINTED weighted edges, not from `e`:
    # ew = e ⋈ deg(e) on src is exactly e with out_deg attached (deg is
    # unique per src and covers every src), so ew's src/dst multisets
    # equal e's and the distinct is row-identical — while reading the
    # in-memory checkpoint instead of re-running the upstream edge plan
    # (scan + distinct) a second time (r9 optimization, guide §1.2)
    nodes = (
        ew.select(F.col("src").alias("id"))
        .union(ew.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    teleport = (1.0 - damping) / n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    with _pinned_shuffle_partitions(e.sparkSession, n_edges):
        for i in range(iterations):
            contribs = (
                ew.join(ranks, ew.src == ranks.id)
                .select(
                    F.col("dst").alias("id"),
                    (F.col("rank") / F.col("out_deg")).alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("s"))
            )
            ranks = nodes.join(contribs, "id", "left").select(
                "id",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("s", F.lit(0.0))
                ).alias("rank"),
            )
            # lineage cut every k-th round (and on exit): an EAGER
            # checkpoint is a full materialization job, and a plan two
            # iterations deep is still trivially analyzable — halving the
            # job count is pure scheduling win on short iteration loops
            if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
                ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_quantized(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 5,
    checkpoint_every: int = 2,
    scale: int = 10**12,
) -> DataFrame:
    """PageRank with INTEGER sufficient statistics — the repo's
    exactness pattern extended to an iterative algorithm, making power
    iteration hash-oracle-able across engines. Ranks live as int64
    micro-units (``scale`` = total mass). Per iteration, each edge's
    contribution is ONE identical IEEE expression —
    ``round(damping * r / out_deg)`` on a fraction-exact double (r and
    out_deg are integers < 2^53) — immediately re-quantized to int64, so
    the per-node SUM is exact integer math in ANY accumulation order;
    the float non-associativity that forces the classic float
    ``pagerank`` to stay rows-only never arises. Quantization drift is
    ≤ n_edges/2 micro-units per iteration out of 10^12 — ~1e-6 relative
    on real graphs, far below ranking resolution. Returns
    (id, rank_micro: long, rank: double) where rank = rank_micro/scale
    (one exact double division). Same join+agg+checkpoint scale shape
    as ``pagerank``."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ew = e.join(
        e.groupBy("src").agg(F.count("*").alias("out_deg")), "src"
    ).localCheckpoint(eager=True)
    n_edges = ew.count()

    # node set from the CHECKPOINTED weighted edges (see `pagerank`):
    # row-identical to deriving from `e`, one upstream pass cheaper
    nodes = (
        ew.select(F.col("src").alias("id"))
        .union(ew.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # ONE action for n AND the teleport term. teleport rounds IN-ENGINE
    # (Spark round == DuckDB round on the same positive double; Python
    # round() is banker's — never use it here); count(*) is a LongType
    # operand exactly like the F.lit(n) it replaces, so the double
    # expression tree is unchanged
    row = nodes.agg(
        F.count("*").alias("n"),
        F.round(
            F.lit(1.0 - damping) * F.lit(float(scale)) / F.count("*")
        ).cast("long").alias("t"),
    ).collect()[0]
    n, teleport_int = row["n"], row["t"]
    # floor-div of positives: unambiguous across engines
    r0 = scale // n

    ranks = nodes.withColumn("r", F.lit(r0).cast("long"))
    with _pinned_shuffle_partitions(e.sparkSession, n_edges):
        for i in range(iterations):
            contribs = (
                ew.join(ranks, ew.src == ranks.id)
                .select(
                    F.col("dst").alias("id"),
                    F.round(
                        F.lit(damping) * F.col("r") / F.col("out_deg")
                    )
                    .cast("long")
                    .alias("c"),
                )
                .groupBy("id")
                .agg(F.sum("c").alias("s"))
            )
            ranks = nodes.join(contribs, "id", "left").select(
                "id",
                (
                    F.lit(teleport_int) + F.coalesce("s", F.lit(0))
                ).cast("long").alias("r"),
            )
            if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
                ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "id",
        F.col("r").alias("rank_micro"),
        (F.col("r") / F.lit(float(scale))).alias("rank"),
    )


def tree_closure(nodes: DataFrame, max_rounds: int = 40) -> DataFrame:
    """Transitive closure of a parent FOREST by pointer doubling:
    (id, root, depth) for every node, in O(log max_depth) rounds.

    `nodes` needs columns (id, parent) with parent NULL for roots. Each
    round self-joins the state on its current ancestor pointer and
    contracts two hops into one (ptr' = ptr.ptr, depth' = depth +
    ptr.depth), so a depth-D chain resolves in ceil(log2 D) shuffles —
    the reason a driver-side recursive walk (or a per-level loop, O(D)
    shuffles) is the wrong shape at 100 TB. One `count()` action per
    round checks convergence; state is localCheckpoint'ed so the plan
    stays flat. The hierarchy relation is tiny next to the facts it
    organizes, so the loop pins its shuffle width to the node count
    (components._pinned_shuffle_partitions)."""
    state = nodes.select(
        "id",
        F.coalesce("parent", F.col("id")).alias("ptr"),
        F.when(F.col("parent").isNull(), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("depth"),
    ).localCheckpoint(eager=True)
    n_nodes = state.count()
    with _pinned_shuffle_partitions(nodes.sparkSession, n_nodes):
        for _ in range(max_rounds):
            t = state.select(
                F.col("id").alias("t_id"),
                F.col("ptr").alias("t_ptr"),
                F.col("depth").alias("t_d"),
            )
            joined = state.join(t, state.ptr == t.t_id)
            # a row is settled once its pointer IS a root (that root's own
            # pointer walk has length 0)
            if joined.filter(F.col("t_d") > 0).count() == 0:
                break
            state = joined.select(
                "id",
                F.col("t_ptr").alias("ptr"),
                (F.col("depth") + F.col("t_d")).alias("depth"),
            ).localCheckpoint(eager=True)
        else:
            raise RuntimeError(
                f"tree_closure: no fixpoint in {max_rounds} rounds "
                "(cycle in the 'forest', or depth > 2^rounds)"
            )
    return state.select("id", F.col("ptr").alias("root"), "depth")


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle census over an UNDIRECTED simple edge list
    (columns u, v with u < v, pre-distinct'd).

    The compact-forward / degree-ordered algorithm (Latapy 2008; the
    same orientation trick MapReduce triangle counting uses): orient
    every edge from its lower-(degree, id) endpoint to the higher one,
    then count directed paths a→b→c that close with a→c. Orientation
    bounds every out-neighborhood by O(sqrt(m)), so the wedge join's
    fan-out — the term that explodes on skewed graphs — is capped
    regardless of hub degree. Three equi-joins + integer aggregates;
    nothing touches the driver.

    Returns ONE row: n_nodes, n_edges, n_triangles, n_wedges,
    clustering (= 3·triangles / wedges, 6 dp — exact-integer inputs so
    the double is engine-stable).
    """
    # e feeds three consumers (degrees, orientation, census) and o three
    # self-joins — cut lineage once so the (possibly expensive) edge
    # derivation runs ONCE, not per consumer (the pagerank pattern).
    e = edges.select("u", "v").localCheckpoint(eager=True)
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    ew = (
        e.join(deg.withColumnsRenamed({"x": "u", "d": "du"}), "u")
        .join(deg.withColumnsRenamed({"x": "v", "d": "dv"}), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ew.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    ).localCheckpoint(eager=True)
    wedge = o.join(
        o.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    )  # a→b→c with both edges oriented upward
    tri = wedge.join(
        o.select("a", F.col("b").alias("c")), ["a", "c"], "left_semi"
    ).agg(F.count("*").alias("n_triangles"))
    stats = e.agg(F.count("*").alias("n_edges")).crossJoin(
        deg.agg(
            F.count("*").alias("n_nodes"),
            F.floor(F.sum(F.col("d") * (F.col("d") - 1)) / 2)
            .cast("long")
            .alias("n_wedges"),
        )
    )
    return stats.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        "n_wedges",
        # Zero-wedge guard: Spark's x/0 double division yields NULL while
        # DuckDB may yield inf depending on ieee_floating_point_ops — make
        # the no-wedge case an explicit NULL in BOTH engines (oracle has
        # the matching CASE WHEN n_wedges > 0).
        F.when(
            F.col("n_wedges") > 0,
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges")
                * F.lit(1000000.0),
                0,
            )
            / F.lit(1000000.0),
        ).alias("clustering"),
    )
