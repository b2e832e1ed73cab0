"""Portable HyperLogLog as DATA (Flajolet et al. 2007) — completing the
oracle-checkable sketch family: Bloom (membership, bloom.py), Count-Min
(frequency, cms.py), KLL-style histogram (quantiles), and now HLL
(distinct counts). Spark's native ``approx_count_distinct`` IS HLL, but
its registers are engine-private; this one's registers come from the
same spelled-out integer hash family as bloom/CMS, so the sketch
CONTENT — and even the ESTIMATE — hash-match across engines:

- register table: (group, b, m_rho) with b = h(key) % m and
  m_rho = MAX(rho), rho = 1 + index of the lowest set bit of
  h(key) div m (22 usable bits under P ≈ 2^30; rho = 23 when zero).
  SPARSE: absent buckets mean m_rho = 0.
- MERGEABLE by construction: registers from shards/days/nations union
  by ``groupBy(group', b).max(m_rho)`` — MAX is associative, so a
  region's sketch merged from nation sketches is BIT-IDENTICAL to one
  built directly from the region's keys (pinned by test).
- the estimate stays exact-comparable because the harmonic sum uses
  INTEGER sufficient statistics: Σ 2^{-M_j} is computed as
  S = Σ 2^(23 - M_j) + V · 2^23 over int64 (V = empty buckets; rho
  reaches 23, so 2^-23 units keep every exponent in [0, 22]), exact
  in any accumulation order; alpha·m²·2^23 / S is then ONE terminal
  double expression, and the small-range branch (linear counting
  m·ln(m/V)) is likewise a single identical IEEE expression tree. The
  same trick that made PageRank hash-oracle-able (graph.py).

Accuracy: standard error ≈ 1.04/√m (m = 256 → ~6.5%); the two-round
quadratic mixer (see hash_sql — the bloom/CMS AFFINE family is
measurably unusable here) lands inside that envelope on sequential key
ranges; the guard test asserts a loose 15% bound per level.

100 TB shape: registers are ≤ m rows per group, built by one map-side
partial MAX aggregate; rollups touch register tables only — the corpus
is scanned once, ever, per sketch build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distribot_spark.operators.bloom import P as _P

# Mixer round constants — NOT bloom's hash-family rows (bloom's B[0]=1 as
# the second-round addend measurably biased the estimate -14% at n=15k;
# these two were validated by simulation on sequential key ranges).
_C1 = 314159257
_C2 = 271828171

M_BUCKETS = 256
RHO_BITS = 22  # usable bits above the 8 bucket bits under P ~ 2^30
# Derived — every literal in the estimate comes from M_BUCKETS/RHO_BITS
# so retuning the sketch cannot leave a stale constant in one engine.
_UNIT = 1 << (RHO_BITS + 1)  # harmonic-sum unit 2^-(RHO_BITS+1) → int64
_LINEAR_CUTOFF = (5 * M_BUCKETS) // 2  # classic 2.5·m small-range switch
_ALPHA_SQL = f"0.7213e0 / (1.0e0 + 1.079e0 / {M_BUCKETS})"


def hash_sql(col: str) -> str:
    """TWO-ROUND QUADRATIC mixer mod P — not the bloom/CMS affine family:
    an affine hash maps sequential keys to an arithmetic progression mod
    P, whose constant gap structure wrecks max-rho statistics (measured:
    ±40-60% HLL error on sequential custkeys). Squaring breaks the
    progression (middle-square-style mixing); two rounds measured within
    the 1.04/√m envelope on 60..100k sequential keys. x < P ≈ 2^30 so
    x·x < 2^60 — int64-safe in both engines, identical text."""
    x0 = f"(ABS({col}) % {_P})"
    x1 = f"(({x0} * {x0} + {_C1}) % {_P})"
    return f"(({x1} * {x1} + {_C2}) % {_P})"


def bucket_sql(hcol: str) -> str:
    """Bucket from an ALREADY-HASHED column (compute hash_sql once per
    row in a projection — the rho CASE references it ~23 times)."""
    return f"({hcol}) % {M_BUCKETS}"


def rho_sql(hcol: str, div: str) -> str:
    """rho of the remaining bits: 1 + index of the lowest set bit of
    r = h div m (the unrolled CASE keeps the arithmetic in the portable
    integer subset — no engine bit-scan builtins). ``div`` is the
    engine's floor-division token ('DIV' for Spark, '//' for DuckDB) —
    operands are non-negative, so the two agree. ``hcol`` is the
    already-hashed column."""
    r = f"(({hcol}) {div} {M_BUCKETS})"
    whens = "".join(
        f" WHEN {r} % {1 << (i + 1)} = {1 << i} THEN {i + 1}"
        for i in range(RHO_BITS)
    )
    return f"CASE WHEN {r} = 0 THEN {RHO_BITS + 1}{whens} ELSE {RHO_BITS + 1} END"


def build_hll(
    df: DataFrame, key: str, group_cols: list[str], div: str = "DIV"
) -> DataFrame:
    """Sparse register table (group_cols…, b, m_rho) — ≤ m rows per
    group after ONE map-side-combined MAX aggregate."""
    hashed = df.select(*group_cols, F.expr(hash_sql(key)).alias("h"))
    return (
        hashed.select(
            *group_cols,
            F.expr(bucket_sql("h")).cast("long").alias("b"),
            F.expr(rho_sql("h", div)).cast("long").alias("rho"),
        )
        .groupBy(*group_cols, "b")
        .agg(F.max("rho").alias("m_rho"))
    )


def merge_hll(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Roll registers up to a coarser grouping — MAX per bucket."""
    return sketch.groupBy(*group_cols, "b").agg(F.max("m_rho").alias("m_rho"))


def estimate_sql() -> str:
    """The estimate over integer sufficient statistics S (harmonic sum
    in 2^-23 units, BIGINT) and V (empty buckets) — ONE identical
    expression tree in both engines. Small-range branch: linear
    counting when the raw estimate ≤ 2.5m and V > 0."""
    raw = f"({_ALPHA_SQL}) * {M_BUCKETS * M_BUCKETS} * {_UNIT} / S"
    return (
        f"CASE WHEN ({raw}) <= {_LINEAR_CUTOFF} AND V > 0"
        f" THEN {M_BUCKETS} * LN({M_BUCKETS}.0e0 / V)"
        f" ELSE ({raw}) END"
    )


def estimate_hll(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group_cols…, est) from a register table. S sums
    shiftleft(1, 23 - m_rho) over PRESENT buckets (int64, exact in any
    order) plus V·2^23 for the absent ones."""
    agg = sketch.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(1, {RHO_BITS + 1} - m_rho)"))
        .cast("long").alias("s_present"),
        F.count("*").alias("n_present"),
    )
    return agg.select(
        *group_cols,
        (
            F.col("s_present")
            + (F.lit(M_BUCKETS) - F.col("n_present")) * F.lit(_UNIT)
        ).cast("long").alias("S"),
        (F.lit(M_BUCKETS) - F.col("n_present")).cast("long").alias("V"),
    ).select(*group_cols, F.expr(estimate_sql()).alias("est"))


def estimate_from_registers_sql(registers_cte: str, group_expr: str) -> str:
    """Oracle-side twin of ``estimate_hll``: DuckDB SQL computing the
    same integer statistics and the same terminal expression over a
    register CTE with columns (grp, b, m_rho)."""
    return f"""
    SELECT grp, {estimate_sql()} AS est FROM (
      SELECT grp,
             CAST(SUM(1 << ({RHO_BITS + 1} - m_rho))
                  + ({M_BUCKETS} - COUNT(*)) * {_UNIT} AS BIGINT) AS S,
             CAST({M_BUCKETS} - COUNT(*) AS BIGINT) AS V
      FROM {registers_cte} GROUP BY {group_expr})
    """
