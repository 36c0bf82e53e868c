"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

Everything is JVM-side column arithmetic (regex + array ops); the operators
are single-pass map transforms with no shuffle, so they pipeline into any
downstream dedup/filter stage for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword inventories for the n-gram/stopword heuristic
STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "en": ["the", "and", "is", "not", "of", "to", "a", "in", "that", "it"],
    "sv": ["och", "att", "det", "som", "en", "på", "är", "av", "för", "med"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pas"],
}


def _tokens(col):
    return F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " ")


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens plus a BPE-ish subword estimate (4 chars/token)."""
    toks = _tokens(F.col(text_col))
    return docs.withColumn("n_tokens", F.size(toks)).withColumn(
        "n_subword_est",
        F.ceil(F.length(F.regexp_replace(F.col(text_col), r"\s+", "")) / F.lit(4.0)).cast("bigint"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: per language, count token hits in the
    stopword inventory; argmax wins (ties broken by language code)."""
    toks = _tokens(F.col(text_col))
    scores = [
        F.struct(
            F.size(
                F.filter(toks, lambda t: t.isin(*[F.lit(w).cast("string") for w in words]))
            ).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(STOPWORDS.items())
    ]
    best = F.array_max(F.array(*scores))
    return docs.withColumn(
        "lang_pred",
        F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("und")),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality in [0,1]: length band, punctuation ratio,
    stopword ratio, mean word length band."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*[F.lit(w) for w in all_stop])))
    len_ok = (n_chars >= 20) & (n_chars <= 100000)
    punct_ratio = punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    stop_ratio = stop_hits.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    mean_word = n_chars.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    score = (
        F.when(len_ok, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.1, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_word >= 3.0) & (mean_word <= 12.0), F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return docs.withColumn("quality", score)


def fingerprint(docs: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Document fingerprint: md5 of normalized text (exact) plus a winnowed
    k-gram min-hash (robust to local edits): min md5 over word k-grams."""
    toks = _tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.md5(F.array_join(F.slice(toks, i + 1, k), " ")),
    )
    return docs.withColumn(
        "fp_exact", F.md5(F.array_join(toks, " "))
    ).withColumn("fp_winnow", F.array_min(grams))
