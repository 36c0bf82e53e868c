"""S6b grading/grouping of inferred translations.

Semantics mirrored from /root/reference/src/generic.py: the good-gate with
per-vocable rescue (keep bad rows only when the vocable has no good row —
expressed as a window max instead of the reference's NOT IN subquery), and
the display grouping with deterministic ordered sense lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wikdict_gen_spark import constants as C


def grade_translations(infer_grouped: DataFrame) -> DataFrame:
    """Gate on score>=GOOD with lexentry present; rescue vocables that have
    no good row at all (window max over the vocable partition — no join)."""
    t = infer_grouped.select(
        "from_lang",
        "to_lang",
        "lexentry",
        "sense_num",
        "sense",
        F.col("from_vocable").alias("written_rep"),
        "trans_list",
        "score",
        ((F.col("score") >= C.GOOD_SCORE) & F.col("lexentry").isNotNull()).alias("is_good"),
        (F.col("from_importance") * F.col("to_importance")).alias("importance"),
    )
    w = Window.partitionBy("from_lang", "to_lang", "written_rep")
    t = t.withColumn("any_good", F.max(F.col("is_good").cast("int")).over(w) == 1)
    return t.where(F.col("is_good") | ~F.col("any_good")).drop("any_good")


def group_translations(translation: DataFrame) -> DataFrame:
    """Display grouping: one row per (lexentry, written_rep, trans_list) with
    an ordered sense list (sense_num asc NULLS FIRST, score desc, sense asc)."""
    sort_key = F.struct(
        F.col("sense_num").isNotNull().cast("int").alias("k0"),  # NULLs first
        F.col("sense_num").alias("k1"),
        (-F.col("score")).alias("k2"),
        F.col("sense").alias("k3"),
    )
    grouped = translation.groupBy(
        "from_lang", "to_lang", "lexentry", "written_rep", "trans_list"
    ).agg(
        F.min("sense_num").alias("min_sense_num"),
        F.array_join(
            F.transform(
                F.filter(
                    F.sort_array(F.collect_list(F.struct(sort_key.alias("k"), F.col("sense").alias("s")))),
                    lambda x: x.s.isNotNull(),
                ),
                lambda x: x.s,
            ),
            " | ",
        ).alias("sense_list"),
        F.max("score").alias("score"),
        F.max("importance").alias("importance"),
    )
    return grouped


def simple_translations(infer: DataFrame, importance: DataFrame) -> DataFrame:
    """Vocable-level dictionary: best score per (from_vocable, to_vocable),
    gap-rule list per from_vocable, plus the source vocable's rel importance."""
    from wikdict_gen_spark.operators.infer import gap_rule_list

    best = infer.groupBy("from_lang", "to_lang", "from_vocable", "to_vocable").agg(
        F.max("score").alias("max_score")
    )
    listed = best.groupBy("from_lang", "to_lang", F.col("from_vocable").alias("written_rep")).agg(
        gap_rule_list(pair_col="to_vocable", score_col="max_score").alias("trans_list"),
        F.max("max_score").alias("max_score"),
    )
    rel = importance.select(
        F.col("lang").alias("from_lang"),
        F.col("written_rep_guess").alias("written_rep"),
        F.col("rel_score").alias("rel_importance"),
    )
    return listed.join(rel, ["from_lang", "written_rep"], "left")
