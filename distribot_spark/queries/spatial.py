"""Spatial operators: radius (neighbor) join on a planar point set.

The testdata has no native coordinates, so both engines derive identical
synthetic integer micro-degree positions from md5 of the entity key —
deterministic, engine-agnostic, and exact (integer arithmetic end-to-end;
see operators/geo.py for the grid-join mechanics and scale notes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from distribot_spark.catalog import load_table
from distribot_spark.operators.geo import grid_neighbor_join
from distribot_spark.queries.registry import register

# 20-degree world in micro-degrees; 1-degree search radius
_SPAN = 20_000_001
_RADIUS = 1_000_000


def _coords_spark(df, id_col: str, seed: str):
    h = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    word = lambda pos: F.conv(F.substring(h, pos, 8), 16, 10).cast(  # noqa: E731
        "long"
    )
    return df.select(
        F.col(id_col).alias("id"),
        (word(1) % _SPAN).alias("x"),
        (word(9) % _SPAN).alias("y"),
    )


def _coords_sql(table: str, id_col: str, seed: str) -> str:
    h = f"md5('{seed}' || CAST({id_col} AS VARCHAR))"
    return f"""
      SELECT {id_col} AS id,
             CAST(('0x' || substr({h}, 1, 8)) AS BIGINT) % {_SPAN} AS x,
             CAST(('0x' || substr({h}, 9, 8)) AS BIGINT) % {_SPAN} AS y
      FROM {table}"""


@register(
    "q_geo_neighbor_join",
    oracle=f"""
    WITH s AS ({_coords_sql("supplier", "s_suppkey", "s")}),
         c AS ({_coords_sql("customer", "c_custkey", "c")})
    SELECT s.id AS s_suppkey, c.id AS c_custkey,
           (s.x - c.x) * (s.x - c.x) + (s.y - c.y) * (s.y - c.y) AS dist_sq
    FROM s JOIN c
      ON (s.x - c.x) * (s.x - c.x) + (s.y - c.y) * (s.y - c.y)
         <= {_RADIUS}::BIGINT * {_RADIUS}::BIGINT
    ORDER BY s_suppkey, c_custkey
    """,
    tags=("spatial", "join"),
)
def q_geo_neighbor_join(spark, sf_dir):
    """Radius join: every (supplier, customer) pair within 1 degree on a
    20x20-degree synthetic plane — grid-cell bucketing (operators/
    geo.py) instead of the oracle's naive theta join. The supplier side
    (smaller at every sf: |supplier| = |customer|/15) is replicated into
    its 9 neighbor cells and broadcast; the customer scan equi-joins on
    the cell id, so candidate pairs are co-cell only and each pair meets
    exactly once (no dedup pass). Exact int64 distance test; plan-gated
    against cartesian fallback."""
    sup = _coords_spark(load_table(spark, sf_dir, "supplier"), "s_suppkey", "s")
    cust = _coords_spark(load_table(spark, sf_dir, "customer"), "c_custkey", "c")
    pairs = grid_neighbor_join(cust, sup, _RADIUS)
    return pairs.select(
        F.col("build_id").alias("s_suppkey"),
        F.col("probe_id").alias("c_custkey"),
        "dist_sq",
    ).orderBy("s_suppkey", "c_custkey")
