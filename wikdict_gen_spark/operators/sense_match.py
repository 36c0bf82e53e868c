"""S4 sense matching: attribute gloss-only translations to sense numbers.

The reference resolves sense attribution only by exact precedence (sense
rows beat gloss rows, /root/reference/src/sparql/run.py:38-47).  This
engine generalizes the fallback: a gloss-attributed translation with no
sense number gets matched against its lexentry's sense inventory by
IDF-weighted token Jaccard overlap, and adopts the best-matching sense
number when the score clears a threshold.

Plan shape (all built-ins, no UDFs):
- tokenize glosses and senses JVM-side (lower + regex split, distinct),
- IDF from the sense corpus (docs = senses),
- candidate generation by (lexentry, token) equi-join — co-partitioned,
  never a cross join; hub tokens are capped by the IDF floor filter,
- weighted-Jaccard score via three aggregates, best sense by row_number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MIN_SCORE = 0.2  # overlap threshold below which a gloss stays unattributed
MIN_IDF = 0.0     # raise to drop stop-tokens from candidate generation


def _tokens(col):
    return F.array_distinct(
        F.filter(
            F.split(F.lower(F.regexp_replace(col, r"[^\p{L}\p{Nd} ]", " ")), r"\s+"),
            lambda t: F.length(t) > 1,
        )
    )


def sense_inventory(translation_base: DataFrame) -> DataFrame:
    """Distinct (lexentry, sense_num, sense) rows that carry a sense number."""
    return (
        translation_base.where(
            F.col("sense_num").isNotNull() & F.col("sense").isNotNull()
        )
        .select("lexentry", "sense_num", "sense")
        .distinct()
    )


def match_glosses(
    translation_base: DataFrame, round_digits: int | None = None
) -> DataFrame:
    """Score gloss-only rows against their lexentry's sense inventory.

    Returns (lexentry, to_lang, trans, gloss, matched_sense_num,
    match_score); rows below MIN_SCORE are dropped.

    round_digits: when set, the match score is rounded to that many
    decimals BEFORE the best-sense ranking and the MIN_SCORE gate.  The
    score is a ratio of ln-based IDF sums, so the raw double differs in
    the last ulp between engines (libm ln + float summation order);
    rounding first makes the ranking and threshold decisions
    deterministic across engines — the mode the cross-engine oracle uses.
    Semantics at round_digits=None are the production default.
    """
    inv = sense_inventory(translation_base)
    glosses = (
        translation_base.where(
            F.col("sense_num").isNull() & F.col("sense").isNotNull()
        )
        .select("lexentry", "to_lang", "trans", F.col("sense").alias("gloss"))
        .distinct()
    )

    sense_tok = inv.select(
        "lexentry", "sense_num", F.explode(_tokens(F.col("sense"))).alias("token")
    )
    gloss_tok = glosses.select(
        "lexentry", "to_lang", "trans", F.explode(_tokens(F.col("gloss"))).alias("token")
    )

    # IDF over the sense corpus: idf = ln((N+1)/(df+1)) + 1
    n_docs = inv.count()
    idf = (
        sense_tok.groupBy("token")
        .agg(F.countDistinct("lexentry", "sense_num").alias("df"))
        .select(
            "token",
            (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0).alias("idf"),
        )
        .where(F.col("idf") > MIN_IDF)
    )
    sense_w = sense_tok.join(idf, "token")
    gloss_w = gloss_tok.join(idf, "token")

    sense_norm = sense_w.groupBy("lexentry", "sense_num").agg(F.sum("idf").alias("s_norm"))
    gloss_norm = gloss_w.groupBy("lexentry", "to_lang", "trans").agg(
        F.sum("idf").alias("g_norm")
    )

    inter = (
        gloss_w.join(sense_w.withColumnRenamed("idf", "s_idf"), ["lexentry", "token"])
        .groupBy("lexentry", "to_lang", "trans", "sense_num")
        .agg(F.sum("idf").alias("inter"))
    )
    scored = (
        inter.join(sense_norm, ["lexentry", "sense_num"])
        .join(gloss_norm, ["lexentry", "to_lang", "trans"])
        .withColumn(
            "match_score",
            F.col("inter") / (F.col("s_norm") + F.col("g_norm") - F.col("inter")),
        )
    )
    if round_digits is not None:
        scored = scored.withColumn(
            "match_score", F.round("match_score", round_digits)
        )
    w = Window.partitionBy("lexentry", "to_lang", "trans").orderBy(
        F.col("match_score").desc(), F.col("sense_num")
    )
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("match_score") >= MIN_SCORE))
        .select(
            "lexentry",
            "to_lang",
            "trans",
            F.col("sense_num").alias("matched_sense_num"),
            F.round("match_score", 6).alias("match_score"),
        )
    )
    return best.join(glosses, ["lexentry", "to_lang", "trans"]).select(
        "lexentry", "to_lang", "trans", "gloss", "matched_sense_num", "match_score"
    )
