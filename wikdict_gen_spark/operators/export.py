"""Export jobs reading the materialized graph (reference anki_csv/sitemap
semantics; TEI/XML serialization is deliberately out of scope)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def strip_control_chars(col):
    """X12: delete control characters except newline (export hygiene)."""
    return F.regexp_replace(col, r"[\x00-\x09\x0b-\x1f]", "")


def top_simple_translations(simple_translation: DataFrame, min_score: float = 100.0,
                            k: int = 100) -> DataFrame:
    """Anki-style export: top-k vocables by score among good translations."""
    return (
        simple_translation.where(F.col("max_score") >= min_score)
        .orderBy(F.col("max_score").desc(), F.col("written_rep"))
        .limit(k)
        .select(
            strip_control_chars(F.col("written_rep")).alias("written_rep"),
            strip_control_chars(F.col("trans_list")).alias("trans_list"),
            "max_score",
        )
    )


def sitemap_entries(simple_translation: DataFrame, min_importance: float = 4.0) -> DataFrame:
    """Sitemap export: vocables above the importance floor."""
    return (
        simple_translation.where(F.col("rel_importance") > min_importance)
        .select("from_lang", "to_lang", "written_rep")
    )


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def grouped_json(translation_grouped: DataFrame) -> DataFrame:
    """A2 nesting at export time: one JSON document per headword."""
    nested = translation_grouped.groupBy("from_lang", "to_lang", "written_rep").agg(
        F.to_json(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("min_sense_num"),
                        F.col("sense_list"),
                        F.col("trans_list"),
                        F.col("score"),
                    )
                )
            )
        ).alias("entries_json")
    )
    return nested
