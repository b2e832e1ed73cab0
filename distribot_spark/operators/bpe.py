"""BPE tokenizer training (Sennrich et al. 2016, arXiv:1508.07909) as a
DataFrame loop — "train the tokenizer" is the step a training-data
pipeline runs BEFORE token counting (doc_tokens_bpe applies a learned
pre-tokenization; this LEARNS the merge table).

Scale shape — the part that matters at 100 TB:
  * The corpus-sized work is ONE pass: explode words, count. After
    that, everything operates on the (word, count) LEXICON, whose size
    is bounded by the distinct vocabulary (~1e7 rows for web text), not
    the corpus. This is the standard trick (fastBPE, SentencePiece do
    the same locally; here the lexicon stays a DataFrame).
  * Each merge round: pair counting is a lexicon-scan + one
    map-side-combined aggregate; ONLY the single arg-max row is
    collected to the driver (the merge decision is inherently global
    and 16 bytes — the PageRank-loop pattern, see operators/graph.py).
  * The merge rewrite is a pure JVM fold (`aggregate` HOF) over each
    word's symbol array — greedy leftmost non-overlapping, the classic
    BPE application rule. Interpreted-HOF cost is paid on the LEXICON
    (bounded), not the corpus — the regime where HOFs are fine (cf. the
    doc_repetition note in BASELINE.md about HOFs on corpus-sized
    inputs).

Determinism: ties on pair count break toward the lexicographically
smallest (left, right) pair, so the merge table is unique for a given
corpus regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from distribot_spark.session import local_rows_df


def _merge_pair_expr(col: str, left: str, right: str) -> str:
    """Greedy leftmost merge of adjacent (left, right) inside a symbol
    array, as a pure Catalyst `aggregate` fold: append each symbol,
    fusing it with the accumulator's tail when the tail is `left` and
    the symbol is `right`. A merged token never re-merges within the
    same round (the fused tail no longer equals `left`) — the standard
    non-overlapping rule."""
    l = left.replace("\\", "\\\\").replace("'", "\\'")
    r = right.replace("\\", "\\\\").replace("'", "\\'")
    return f"""
    aggregate(
      {col},
      CAST(array() AS array<string>),
      (acc, x) -> CASE
        WHEN size(acc) > 0 AND element_at(acc, -1) = '{l}' AND x = '{r}'
        THEN concat(slice(acc, 1, size(acc) - 1), array('{l}{r}'))
        ELSE concat(acc, array(x))
      END)
    """


def bpe_train(docs: DataFrame, text_col: str, n_merges: int = 10) -> DataFrame:
    """Learn `n_merges` BPE merges from a text column.

    Returns (rank, left, right, merged, pair_count): the merge table in
    learned order, pair_count = corpus-weighted frequency of the pair
    at the time it was chosen.
    """
    from distribot_spark.operators.components import _pinned_shuffle_partitions

    spark: SparkSession = docs.sparkSession
    lex = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(F.expr("split(w, '')").alias("syms"), "cnt")
        .localCheckpoint(eager=True)
    )
    n_words = lex.count()  # cheap: counts the checkpointed RDD

    merges = []
    # pin the loop's shuffle width to the LEXICON, not the corpus (the
    # components.py convention). Measured neutral at sf0.1 (10.6→10.7 s:
    # the loop cost is 10 sequential collect+checkpoint JOBS, not
    # shuffle width) — kept because at cluster widths the default would
    # schedule hundreds of empty reducers per round.
    with _pinned_shuffle_partitions(spark, n_words):
        for rank in range(1, n_merges + 1):
            top = (
                lex.filter(F.size("syms") >= 2)
                .select(
                    F.explode(
                        F.expr(
                            "transform(sequence(1, size(syms) - 1),"
                            " i -> struct(syms[i - 1] AS l, syms[i] AS r))"
                        )
                    ).alias("p"),
                    "cnt",
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.desc("n"), "l", "r")
                .limit(1)
                .collect()
            )
            if not top:
                break
            l, r, n = top[0]["l"], top[0]["r"], top[0]["n"]
            merges.append((rank, l, r, l + r, int(n)))
            lex = lex.select(
                F.expr(_merge_pair_expr("syms", l, r)).alias("syms"), "cnt"
            ).localCheckpoint(eager=True)

    return local_rows_df(spark, 
        merges, "rank int, left string, right string, merged string, pair_count long"
    )


def bpe_encode(
    docs: DataFrame, text_col: str, id_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize with a LEARNED merge table: per document, the total BPE
    token count after applying `merges` (ordered (left, right) pairs —
    bpe_train's output). Same scale split as training: merges apply to
    the DISTINCT-WORD lexicon (bounded; one chained JVM fold per merge
    rank), which then broadcast-joins back onto the corpus word stream
    — the corpus itself is touched by exactly one explode + one count
    shuffle, never by the per-symbol rewriting."""
    words = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")).alias("w"),
    ).filter(F.col("w") != "")
    lex = words.select("w").distinct().select(
        "w", F.expr("split(w, '')").alias("syms")
    )
    for left, right in merges:
        lex = lex.select(
            "w", F.expr(_merge_pair_expr("syms", left, right)).alias("syms")
        )
    sizes = lex.select("w", F.size("syms").alias("n_word_tokens"))
    counts = (
        words.join(F.broadcast(sizes), "w")
        .groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_word_tokens").cast("long").alias("n_bpe_tokens"),
        )
    )
    # empty/punctuation-only/NULL texts produce no words — they must
    # still appear as (0, 0) rows, not silently vanish from the corpus
    return (
        docs.select(F.col(id_col))
        .join(counts, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias(
                "n_bpe_tokens"
            ),
        )
    )
