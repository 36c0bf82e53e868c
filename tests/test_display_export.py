"""Display/search/export operator tests (reference wdweb-stage semantics)."""

import pytest
from pyspark.sql import functions as F

from wikdict_gen_spark.operators import display, export


@pytest.fixture(scope="module")
def form_df(spark):
    rows = [
        # lexentry, other_written, pos, rank
        ("deu/gehen__v__1", "geht", "verb", 1),
        ("deu/gehen__v__1", "ging", "verb", 4),
        ("deu/gehen__v__1", "gegangen", "verb", None),
        ("deu/haus__n__1", "Haus", "noun", 1),
        ("deu/haus__n__1", "Häuser", "noun", 2),
        ("deu/haus__n__1", "Hauses", "noun", None),
        # ambiguous plural -> filtered from pairs
        ("deu/wort__n__1", "Wort", "noun", 1),
        ("deu/wort__n__1", "Wörter", "noun", 2),
        ("deu/wort__n__1", "Worte", "noun", 2),
    ]
    return spark.createDataFrame(rows, "lexentry string, other_written string, pos string, rank int")


@pytest.fixture(scope="module")
def grouped_df(spark):
    rows = [
        ("de", "en", "deu/haus__n__1", "Haus", "house | building", 100.0, 0.9),
        ("de", "en", "deu/eis__n__1", "Eis am Stiel", "popsicle", 100.0, 0.2),
        ("de", "en", "deu/gehen__v__1", "gehen", "go", 20.0, 0.5),
    ]
    return spark.createDataFrame(
        rows,
        "from_lang string, to_lang string, lexentry string, written_rep string, "
        "trans_list string, score double, importance double",
    )


def test_ranked_display_forms(spark, form_df):
    out = {r["lexentry"]: r["display_forms"] for r in display.ranked_display_forms(form_df).collect()}
    assert out["deu/gehen__v__1"] == "geht, ging"
    assert out["deu/haus__n__1"] == "Haus, Häuser"
    assert out["deu/wort__n__1"] == "Wort, Worte / Wörter"


def test_singular_plural_pairs(spark, form_df):
    out = {r["lexentry"]: (r["singular"], r["plural"]) for r in display.singular_plural_pairs(form_df).collect()}
    assert out["deu/haus__n__1"] == ("Haus", "Häuser")
    assert "deu/wort__n__1" not in out  # ambiguous plural filtered (A15)


def test_inverted_token_index(spark, grouped_df, form_df):
    idx = display.inverted_token_index(grouped_df, form_df)
    rows = {(r["token"], r["written_rep"]): r["rank"] for r in idx.collect()}
    assert ("haus", "Haus") in rows
    assert ("eis", "Eis am Stiel") in rows  # multi-word headword tokenized
    assert ("stiel", "Eis am Stiel") in rows
    # inflected form posting discounted vs headword posting
    assert rows[("häuser", "Haus")] == pytest.approx(0.5 * (0.9 + 1.0))
    assert rows[("haus", "Haus")] == pytest.approx(1.0 * (0.9 + 1.0))


def test_inverted_token_index_en_porter(spark):
    """FTS1: English indexes stem with Porter ('running' matches 'run'),
    other languages index raw lowercase tokens."""
    rows = [("en", "de", "e/run__v__1", "running shoes", "Laufschuh", 100.0, 0.5)]
    g = spark.createDataFrame(
        rows,
        "from_lang string, to_lang string, lexentry string, written_rep string, "
        "trans_list string, score double, importance double",
    )
    en_tokens = {r["token"] for r in display.inverted_token_index(g, from_lang="en").collect()}
    assert en_tokens == {"run", "shoe"}
    de_tokens = {r["token"] for r in display.inverted_token_index(g, from_lang="de").collect()}
    assert de_tokens == {"running", "shoes"}


def test_search_translations_stemmed(spark):
    """F8 search: the query term is stemmed with the SAME tokenizer as the
    index (the FTS4 contract), the substring-hit ordering beats length,
    and the per-query limit applies."""
    rows = [
        ("en", "de", "e/run__v__1", "running", "laufend", "01", "laufend",
         100.0, 0.5, 0.5),
        ("en", "de", "e/run__n__1", "run", "Lauf", "01", "Lauf",
         100.0, 0.9, 0.9),
        ("en", "de", "e/shoe__n__1", "shoes", "Schuhe", None, "Schuhe",
         100.0, 0.2, 0.2),
    ]
    g = spark.createDataFrame(
        rows,
        "from_lang string, to_lang string, lexentry string, written_rep string, "
        "sense_list string, min_sense_num string, trans_list string, "
        "score double, importance double, translation_score double",
    )
    idx = display.inverted_token_index(g, from_lang="en")
    qs = spark.createDataFrame([(1, "runs"), (2, "shoe")], "query_id int, term string")
    out = display.search_translations(g, idx, qs, from_lang="en").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rn"], r["written_rep"]))
    # 'runs' stems to 'run' -> matches both 'run' and 'running' postings;
    # neither contains the raw term 'runs', so shorter headword wins
    assert sorted(by_q[1]) == [(1, "run"), (2, "running")]
    # 'shoe' stems to 'shoe' -> matches the 'shoes' posting (index stemmed
    # 'shoes' -> 'shoe'); substring hit ('shoe' in 'shoes')
    assert sorted(by_q[2]) == [(1, "shoes")]


def test_idiom_keys(spark, grouped_df):
    out = display.idiom_keys(grouped_df).collect()
    assert len(out) == 1
    assert out[0]["written_rep"] == "Eis am Stiel"


def test_top_simple_translations(spark):
    rows = [("w%02d" % i, "t%d" % i, float(i)) for i in range(150)]
    st = spark.createDataFrame(rows, "written_rep string, trans_list string, max_score double")
    out = export.top_simple_translations(st, min_score=100.0, k=10).collect()
    assert len(out) == 10
    assert out[0]["max_score"] == 149.0


def test_adaptive_min_score(spark):
    """A14 wiring: a small dictionary lowers the gate to 0 (nothing above
    the fixed 100 gate would survive), a large one keeps/clamps it."""
    small = [("de", "en", "w%02d" % i, "t%d" % i, float(i)) for i in range(50)]
    st = spark.createDataFrame(
        small,
        "from_lang string, to_lang string, written_rep string, trans_list string, max_score double",
    )
    thr = export.adaptive_min_score(st).collect()
    assert len(thr) == 1 and thr[0]["min_score"] == 0.0  # (0 - 1000)/45000 clamps to 0
    # default (adaptive) export keeps low-score rows for the small dictionary
    out = export.top_simple_translations(st, k=10).collect()
    assert len(out) == 10 and out[0]["max_score"] == 49.0
    # fixed gate still filters
    assert export.top_simple_translations(st, min_score=100.0, k=10).collect() == []
    # large dictionary: 46000 good rows -> round((46000-1000)/45000*100) = 100
    big = spark.range(46000).select(
        F.lit("de").alias("from_lang"), F.lit("sv").alias("to_lang"),
        F.concat(F.lit("w"), F.col("id")).alias("written_rep"),
        F.lit("t").alias("trans_list"), F.lit(150.0).alias("max_score"),
    )
    thr2 = export.adaptive_min_score(big).collect()
    assert thr2[0]["min_score"] == 100.0


def test_strip_control_chars(spark):
    df = spark.createDataFrame([("a\x01b\nc",)], "s string")
    got = df.select(export.strip_control_chars(F.col("s")).alias("s")).collect()[0]["s"]
    assert got == "ab\nc"


def test_grouped_json(spark, grouped_df):
    g = grouped_df.withColumn("min_sense_num", F.lit("01")).withColumn(
        "sense_list", F.lit("sense a")
    )
    out = export.grouped_json(g).collect()
    assert len(out) == 3
    assert all(r["entries_json"].startswith("[{") for r in out)
