"""FTS4 spellfix1 analog: edit-distance fuzzy lookup over the headword
vocabulary.

Reference semantics (/root/reference/src/wdweb.py:37-52): a spellfix
virtual table over distinct written_rep with
``rank = (rel_score * 100)^3`` — the cube weights word importance over
edit distance when ranking suggestions.  Re-expressed Spark-first:

- ``spellfix_index`` builds the (word, rank) relation from importance.
- ``fuzzy_search`` matches queries within ``max_dist`` edits, JVM-side
  (`F.levenshtein`), two physical paths:
  * broadcast: queries are small (the serving case) — broadcast
    nested-loop with a length-band pre-filter; exact.
  * q-gram: both sides large (batch spell-correction) — candidates must
    share a 2-gram, which the q-gram count bound guarantees whenever the
    longer string has >= q*(d+1) chars; pairs where BOTH sides are
    shorter route through the broadcast path, so the union stays exact.

Ranking: per query, (distance asc, rank desc, word asc) — deterministic
total order, top-k via row_number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_QGRAM = 2


def spellfix_index(importance: DataFrame) -> DataFrame:
    """importance(lang, written_rep_guess, rel_score) -> (lang, word, rank).

    rank = (rel_score*100)^3, reference wdweb.py:42-52.
    """
    return (
        importance.select(
            "lang",
            F.col("written_rep_guess").alias("word"),
            F.pow(F.col("rel_score") * 100.0, 3).alias("rank"),
        )
        .groupBy("lang", "word")
        .agg(F.max("rank").alias("rank"))
    )


def _qgrams(col, q: int = _QGRAM):
    """All q-grams of a string as an array (JVM-side, no UDF)."""
    n = F.length(col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - (q - 1), F.lit(1))),
        lambda i: F.substring(col, i, q),
    )


def fuzzy_search(
    index: DataFrame,
    queries: DataFrame,
    max_dist: int = 2,
    k: int = 10,
    big_queries: bool = False,
) -> DataFrame:
    """(query) x index(word, rank) -> top-k fuzzy matches per query.

    index: (word, rank); queries: (query).  Output: (query, word, dist,
    rank, rn) with rn = 1..k per query ordered by (dist, -rank, word).
    big_queries=True switches candidate generation to the q-gram join.
    """
    if big_queries:
        bound = _QGRAM * (max_dist + 1)
        w_grams = index.select(
            "word", F.explode(F.array_distinct(_qgrams(F.col("word")))).alias("g")
        )
        q_grams = queries.select(
            "query", F.explode(F.array_distinct(_qgrams(F.col("query")))).alias("g")
        )
        long_pairs = (
            w_grams.join(
                q_grams,
                (w_grams["g"] == q_grams["g"])
                # q-gram bound is only sound when the longer side is long
                # enough; shorter pairs come from the fallback below
                & (
                    F.greatest(F.length(w_grams["word"]), F.length(q_grams["query"]))
                    >= bound
                ),
            )
            .select("query", "word")
            .distinct()
        )
        short_pairs = (
            queries.where(F.length("query") < bound)
            .crossJoin(F.broadcast(index.where(F.length("word") < bound).select("word")))
            .select("query", "word")
        )
        cand = long_pairs.unionByName(short_pairs).distinct().join(index, "word")
    else:
        cand = index.crossJoin(F.broadcast(queries))
    scored = cand.where(
        (F.abs(F.length("word") - F.length("query")) <= max_dist)
        & (F.levenshtein("word", "query") <= max_dist)
    ).select(
        "query",
        "word",
        F.levenshtein("word", "query").alias("dist"),
        "rank",
    )
    w = Window.partitionBy("query").orderBy(
        F.col("dist").asc(), F.col("rank").desc(), F.col("word").asc()
    )
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
