"""Fuzzy-search (spellfix1 analog) operator tests."""

from pyspark.sql import functions as F

from wikdict_gen_spark.operators import fuzzy


def _rows(df):
    return sorted(
        (r["query"], r["word"], r["dist"], r["rank"], r["rn"]) for r in df.collect()
    )


def test_broadcast_matches_and_ranks(spark):
    index = spark.createDataFrame(
        [("haus", 8.0), ("maus", 27.0), ("hans", 1.0), ("zebra", 64.0)],
        "word string, rank double",
    )
    queries = spark.createDataFrame([("haut",), ("mause",)], "query string")
    out = {
        (r["query"], r["rn"]): (r["word"], r["dist"])
        for r in fuzzy.fuzzy_search(index, queries, max_dist=2, k=3).collect()
    }
    # haut: haus/hans at dist 1/2; tie-break inside dist by rank desc
    assert out[("haut", 1)] == ("haus", 1)
    assert out[("haut", 2)] == ("maus", 2)  # rank 27 beats hans rank 1
    assert out[("haut", 3)] == ("hans", 2)
    assert out[("mause", 1)] == ("maus", 1)
    # zebra never matches (dist > 2 from both queries)
    assert all(w != "zebra" for (w, _) in out.values())


def test_qgram_path_is_exact(spark):
    """The q-gram candidate path + short-pair fallback must equal the
    brute-force path row-for-row, including sub-bound-length words."""
    words = [
        "cat", "cart", "chart", "smart", "start", "state", "slate",
        "ab", "abc", "x", "translation", "transversion", "translocation",
    ]
    index = spark.createDataFrame(
        [(w, float(len(w))) for w in words], "word string, rank double"
    )
    queries = spark.createDataFrame(
        [("catr",), ("stat",), ("translaton",), ("a",), ("xy",)], "query string"
    )
    brute = fuzzy.fuzzy_search(index, queries, max_dist=2, k=10)
    qgram = fuzzy.fuzzy_search(index, queries, max_dist=2, k=10, big_queries=True)
    assert _rows(brute) == _rows(qgram)
    assert brute.count() > 0


def test_spellfix_index_cubed_rank(spark):
    imp = spark.createDataFrame(
        [("de", "haus", 0.5), ("de", "maus", 0.1)],
        "lang string, written_rep_guess string, rel_score double",
    )
    out = {r["word"]: r["rank"] for r in fuzzy.spellfix_index(imp).collect()}
    assert out["haus"] == (0.5 * 100) ** 3
    assert out["maus"] == (0.1 * 100) ** 3
