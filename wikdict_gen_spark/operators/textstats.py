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


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, table A1): the
    standard web-corpus filters for boilerplate and degenerate text.

    Adds, all JVM-side column arithmetic (no shuffle, no UDF):

      dup_line_frac       repeated occurrences of a line / n_lines
      dup_line_char_frac  chars inside those repeated occurrences / chars
      top_bigram_frac     occurrences of the most common word bigram /
                          n_bigrams (array_sort + aggregate HOF: longest
                          equal run in the sorted bigram list == max
                          occurrence count — the A5 gap-rule pattern)
      max_word_run_frac   longest run of one repeated token / n_tokens
                          (same HOF over the UNsorted token list)

    Degenerate inputs (empty text, single token) score 0.0 — a short doc
    is not "repetitive", it is short; length lives in quality_score.
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_tok = F.size(toks)

    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    n_lines = F.size(lines)
    distinct_lines = F.array_distinct(lines)
    line_chars = F.aggregate(
        lines, F.lit(0), lambda acc, l: acc + F.length(l)
    )
    distinct_line_chars = F.aggregate(
        distinct_lines, F.lit(0), lambda acc, l: acc + F.length(l)
    )

    def longest_run(arr):
        # (prev, run, best) accumulator; best == longest stretch of equal
        # adjacent elements.  On a sorted array that is the mode's count.
        acc0 = F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        )

        def step(acc, x):
            run = F.when(x == acc.getField("prev"), acc.getField("run") + 1).otherwise(
                F.lit(1)
            )
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc.getField("best"), run).alias("best"),
            )

        return F.aggregate(arr, acc0, step, lambda acc: acc.getField("best"))

    bigrams = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(0), n_tok - 2),
            lambda i: F.concat(F.element_at(toks, i + 1), F.lit(" "), F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bigrams = F.size(bigrams)

    zero_if_empty = lambda num, den: F.when(  # noqa: E731
        den > 0, num.cast("double") / den.cast("double")
    ).otherwise(F.lit(0.0))

    return (
        docs.withColumn(
            "dup_line_frac",
            zero_if_empty(n_lines - F.size(distinct_lines), n_lines),
        )
        .withColumn(
            "dup_line_char_frac",
            zero_if_empty(line_chars - distinct_line_chars, line_chars),
        )
        .withColumn(
            "top_bigram_frac",
            zero_if_empty(longest_run(F.array_sort(bigrams)), n_bigrams),
        )
        .withColumn(
            "max_word_run_frac",
            F.when(n_tok >= 2, longest_run(toks).cast("double") / n_tok.cast("double"))
            .otherwise(F.lit(0.0)),
        )
    )


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
