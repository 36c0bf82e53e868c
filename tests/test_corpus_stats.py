"""Corpus rollups: exact tier on planted fixtures; sketch tier pinned to the
exact tier by error bounds (the sketch VALUES are engine-specific, so this —
not the DuckDB oracle — is their correctness contract)."""

import pytest


@pytest.fixture(scope="module")
def planted(spark):
    # src_a/en: 4 docs, one exact dup pair (3 distinct), quality varies;
    # src_b/de: 2 identical docs (1 distinct)
    good = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the field, with a steady calm pace."
    )
    return spark.createDataFrame(
        [
            (1, good, "en", "src_a"),
            (2, good, "en", "src_a"),  # exact dup of 1
            (3, "an entirely different sentence about the weather today.", "en", "src_a"),
            (4, "x", "en", "src_a"),  # fails length band
            (5, "wetter bericht heute!!! !!! ???", "de", "src_b"),
            (6, "Wetter  bericht HEUTE!!! !!! ???", "de", "src_b"),  # norm-dup of 5
        ],
        "doc_id long, text string, lang string, source string",
    )


class TestSourceStats:
    def test_exact_rollup(self, spark, planted):
        from wikdict_gen_spark.operators.corpus_stats import source_stats

        out = {
            (r["source"], r["lang"]): r for r in source_stats(planted).collect()
        }
        a = out[("src_a", "en")]
        assert a["n_docs"] == 4 and a["n_distinct"] == 3
        assert a["dup_rate"] == 0.25
        assert a["mean_chars"] == sum(
            len(t) for t in planted.where("source = 'src_a'").toPandas()["text"]
        ) / 4
        # normalization (lowercase + whitespace collapse) makes 5 == 6
        b = out[("src_b", "de")]
        assert b["n_docs"] == 2 and b["n_distinct"] == 1 and b["dup_rate"] == 0.5

    def test_mean_quality_matches_per_doc_scores(self, spark, planted):
        from wikdict_gen_spark.operators.corpus_stats import source_stats
        from wikdict_gen_spark.operators.textstats import quality_score

        per_doc = quality_score(planted).toPandas()
        expect = per_doc[per_doc.source == "src_a"]["quality"].mean()
        got = {
            r["source"]: r["mean_quality"] for r in source_stats(planted).collect()
        }
        assert got["src_a"] == expect


class TestCorpusSketches:
    def test_sketch_vs_exact_bounds(self, spark):
        from wikdict_gen_spark.operators.corpus_stats import (
            corpus_sketches,
            source_stats,
        )

        sf = "/root/testdata/sf0.01"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        rsd = 0.02
        sk = {r["lang"]: r for r in corpus_sketches(docs, rsd=rsd).collect()}
        exact = (
            source_stats(docs)
            .groupBy("lang")
            .agg({"n_distinct": "sum", "n_docs": "sum"})
            .collect()
        )
        lengths = {
            lang: sorted(
                r[0]
                for r in docs.where(f"lang = '{lang}'")
                .selectExpr("length(text)")
                .collect()
            )
            for lang in sk
        }
        for row in exact:
            lang = row["lang"]
            n_exact = row["sum(n_distinct)"]
            approx = sk[lang]["approx_distinct"]
            assert abs(approx - n_exact) / n_exact <= 3 * rsd, (lang, approx, n_exact)
            assert sk[lang]["n_docs"] == row["sum(n_docs)"]
            # percentile_approx at accuracy 10000 on n << 10000 rows is
            # rank-exact: its value must be AN element at the target rank
            # neighborhood (+-1 rank for ties/boundary conventions)
            ls = lengths[lang]
            for q, col in [(0.5, "len_p50"), (0.9, "len_p90"), (0.99, "len_p99")]:
                rank = min(len(ls) - 1, max(0, int(round(q * len(ls))) - 1))
                window = ls[max(0, rank - 1) : rank + 2]
                assert sk[lang][col] in window, (lang, col, sk[lang][col], window)

    def test_single_pass_no_row_shuffle(self, spark, planted):
        """The sketch plan must contain exactly one aggregate pair
        (partial + final) and NO expand/distinct row shuffle — the point
        of the tier."""
        from wikdict_gen_spark.operators.corpus_stats import corpus_sketches

        plan = corpus_sketches(planted)._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in plan
