"""Sense-matching (TF-IDF/Jaccard gloss-overlap) unit tests."""

import pytest


@pytest.fixture(scope="module")
def base(spark):
    rows = [
        # lexentry, sense_num, sense, trans, to_lang, from_lang
        ("deu/haus__n__1", "01", "building where people live", "house", "en", "de"),
        ("deu/haus__n__1", "02", "noble family dynasty", "dynasty", "en", "de"),
        # gloss rows (no sense_num) to attribute
        ("deu/haus__n__1", None, "a building for living", "maison", "fr", "de"),
        ("deu/haus__n__1", None, "royal family line dynasty", "dynastie", "fr", "de"),
        ("deu/haus__n__1", None, "zzz qqq unrelated tokens", "xyz", "fr", "de"),
        # another entry, disjoint vocabulary
        ("deu/gehen__v__1", "01", "to move on foot", "go", "en", "de"),
        ("deu/gehen__v__1", None, "move by foot walking", "aller", "fr", "de"),
    ]
    return spark.createDataFrame(
        rows, "lexentry string, sense_num string, sense string, trans string, "
              "to_lang string, from_lang string"
    )


def test_gloss_matches_right_sense(spark, base):
    from wikdict_gen_spark.operators.sense_match import match_glosses

    out = {(r["lexentry"], r["trans"]): r for r in match_glosses(base).collect()}
    assert out[("deu/haus__n__1", "maison")]["matched_sense_num"] == "01"
    assert out[("deu/haus__n__1", "dynastie")]["matched_sense_num"] == "02"
    assert out[("deu/gehen__v__1", "aller")]["matched_sense_num"] == "01"


def test_unrelated_gloss_unmatched(spark, base):
    from wikdict_gen_spark.operators.sense_match import match_glosses

    out = {(r["lexentry"], r["trans"]) for r in match_glosses(base).collect()}
    assert ("deu/haus__n__1", "xyz") not in out


def test_scores_bounded(spark, base):
    from wikdict_gen_spark.operators.sense_match import match_glosses

    for r in match_glosses(base).collect():
        assert 0.0 < r["match_score"] <= 1.0
