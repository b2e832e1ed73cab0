"""Count-Min sketch as DATA (Cormode & Muthukrishnan 2005): point
frequency estimation from a tiny mergeable counter table — completing
the sketch family next to the HLL rollup (distinct counts), the Bloom
bitmap (membership), and freqItems (heavy-hitter candidates).

The sketch is a (i, pos, cnt) relation of d·w rows: row i counts the
stream at position h_i(key); estimate(key) = min_i cnt[i, h_i(key)].
Guarantees: NEVER an underestimate; overestimate ≤ εN with probability
1-δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. Mergeable by construction —
sketches from shards/days union by ``groupBy(i, pos).sum(cnt)``, so a
100 TB stream keeps one d·w-row summary per partition-of-time and
serves ad-hoc frequency probes without re-scanning.

Hash family shared with operators/bloom.py: spelled-out integer
arithmetic, identical in Spark and DuckDB, int64-safe — which is what
makes the sketch (not just the query on top of it) oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distribot_spark.operators.bloom import A as _HASH_A
from distribot_spark.operators.bloom import _position, position_sql


def _pos(key, i: int, w: int):
    """Row i's counter position — the bloom hash family, verbatim
    (single expression node; no redundant siblings)."""
    return _position(key, w, i)


def pos_sql(col: str, i: int, w: int) -> str:
    """The same position as ANSI SQL (oracle side), from bloom's table."""
    return position_sql(col, w, i)


def _check_depth(d: int) -> None:
    """d is a public parameter but the portable hash family has only
    len(A) rows — fail loudly instead of IndexError mid-plan-build."""
    if not 1 <= d <= len(_HASH_A):
        raise ValueError(f"cms depth d={d} not in [1, {len(_HASH_A)}]")


def build_cms(stream: DataFrame, key: str, d: int = 4, w: int = 2048) -> DataFrame:
    """(i, pos, cnt) sketch from a key column — one map-side-combined
    shuffle over ≤ d·w distinct (i, pos) cells; the d-way explode costs
    d rows per input row BEFORE the partial aggregate collapses them,
    so shuffle volume is bounded by the cell count, not the stream."""
    _check_depth(d)
    kc = F.col(key)
    return (
        stream.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            _pos(kc, i, w).cast("long").alias("pos"),
                        )
                        for i in range(d)
                    ]
                )
            ).alias("c")
        )
        .groupBy("c.i", "c.pos")
        .agg(F.count("*").alias("cnt"))
    )


def probe_cms(
    keys: DataFrame, key: str, cms: DataFrame, d: int = 4, w: int = 2048
) -> DataFrame:
    """Append ``cms_estimate`` (= min over the d rows) to `keys` via one
    explode + one broadcast equi-join on (i, pos) + one min-agg."""
    _check_depth(d)
    kc = F.col(key)
    probes = keys.select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _pos(kc, i, w).cast("long").alias("pos"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("c"),
    ).select(key, "c.i", "c.pos")
    return (
        probes.join(F.broadcast(cms), ["i", "pos"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )
