"""Distributed Bloom filter as DATA: build a bitmap relation from a key
set with plain aggregates, broadcast it, and prefilter a probe side —
the hand-rolled form of Spark's runtime bloom-filter join pruning
(spark.sql.optimizer.runtime.bloomFilter.*), but materialized, so it

  - survives across stages/jobs (build once, probe many),
  - is MERGEABLE: bitmaps built from disjoint key partitions or
    different days union by ``groupBy(word).agg(bit_or(bits))`` — the
    same mergeable-summary contract as the HLL rollup (see
    operators/../queries/advanced.py q_hll_rollup), and
  - is oracle-checkable, because every bit is a deterministic function
    of the key (no engine-private hash: positions come from spelled-out
    integer arithmetic identical in Spark and DuckDB).

Layout: ``m`` bits stored 32 per int64 word (shift stays < 2^31, so the
same ``1 << bit`` expression is overflow-free in both engines). Hash
family: h_i(key) = ((key % P) * A_i + B_i) % P % m with P = 1e9+7 and
A_i < P, so every intermediate fits int64 even for 10-digit keys.

Sizing: fp ≈ (1 - e^{-k·n/m})^k. With k = 3 the sweet spot is
m ≈ 4.8·n (≈1 byte per key for ~3% fp); callers size m to the
EXPECTED key count — the structure degrades gracefully (more false
positives, never false negatives) when n outgrows m.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 1_000_000_007
A = (314159257, 271828171, 161803393, 141421357)
B = (1, 7, 13, 19)
BITS_PER_WORD = 32


def _position(key, m: int, i: int):
    """Bit position i for a key — int64-safe, engine-portable.

    ``abs(key)`` guards the signed-key trap: Spark and DuckDB ``%``
    both keep the dividend's sign, so a negative key would produce a
    negative position and a negative shift count, where shiftleft
    semantics diverge across engines (Java wraps mod 64)."""
    return ((F.abs(key) % P) * A[i] + B[i]) % P % m


def _positions(key, m: int, k: int):
    """k bit positions for a key — int64-safe, engine-portable."""
    assert k <= len(A), f"hash family has {len(A)} rows, asked for {k}"
    return [_position(key, m, i) for i in range(k)]


def position_sql(col: str, m: int, i: int) -> str:
    """The SAME position expression as ANSI SQL (oracle side)."""
    return f"((ABS({col}) % {P}) * {A[i]} + {B[i]}) % {P} % {m}"


def positions_sql(col: str, m: int, k: int) -> list[str]:
    """The SAME k position expressions as ANSI SQL strings (oracle side)."""
    assert k <= len(A), f"hash family has {len(A)} rows, asked for {k}"
    return [position_sql(col, m, i) for i in range(k)]


def build_bloom(keys: DataFrame, key: str, m: int = 8192, k: int = 3) -> DataFrame:
    """(word, bits) bitmap relation from a key column — ≤ m/32 rows,
    broadcastable for any practical m. ONE shuffle on `word` (≤ m/32
    distinct values) after a map-side bit_or partial aggregate; the key
    set itself never moves to the driver."""
    kc = F.col(key)
    pos = keys.select(
        F.explode(F.array(*[p.cast("long") for p in _positions(kc, m, k)])).alias(
            "pos"
        )
    )
    return (
        pos.select(
            F.floor(F.col("pos") / BITS_PER_WORD).cast("long").alias("word"),
            (F.col("pos") % BITS_PER_WORD).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("bits"))
    )


def probe_bloom(
    probe: DataFrame, key: str, bloom: DataFrame, m: int = 8192, k: int = 3
) -> DataFrame:
    """Append ``bloom_candidate`` to `probe`: true iff ALL k bits are
    set (possible member), false = definite non-member. k broadcast
    equi-joins against the tiny bitmap — the probe side stays map-only,
    which is the entire point at 100 TB: the fact table is filtered
    before it ever reaches the expensive join's shuffle."""
    out = probe
    cond = F.lit(True)
    for i, p in enumerate(_positions(F.col(key), m, k)):
        b = bloom.select(
            F.col("word").alias(f"w{i}"), F.col("bits").alias(f"bits{i}")
        )
        out = (
            out.withColumn(f"pos{i}", p.cast("long"))
            .withColumn(f"w{i}", F.floor(F.col(f"pos{i}") / BITS_PER_WORD).cast("long"))
            .join(F.broadcast(b), f"w{i}", "left")
        )
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos{i} % {BITS_PER_WORD} AS INT))"
        )
        cond = cond & (
            F.coalesce(F.col(f"bits{i}"), F.lit(0)).bitwiseAND(mask) != 0
        )
    drop = [c for i in range(k) for c in (f"pos{i}", f"w{i}", f"bits{i}")]
    return out.withColumn("bloom_candidate", cond).drop(*drop)
