"""Unit tests for inference aggregations on literal data (reference
test_infer.py analog: the gap rule over {100, 30, 2})."""

from pyspark.sql import functions as F

from wikdict_gen_spark.operators.infer import gap_rule_list


def _agg(spark, rows):
    df = spark.createDataFrame(rows, "g string, to_vocable string, score double")
    return {
        r["g"]: r["trans_list"]
        for r in df.groupBy("g").agg(gap_rule_list().alias("trans_list")).collect()
    }


def test_gap_rule_reference_case(spark):
    # {Wohnung:100, Haus:30, Hütte:2} -> 100 accepted (floor 0->20),
    # 30 accepted (floor 20->40), 2 rejected
    out = _agg(spark, [("g", "Haus", 30.0), ("g", "Hütte", 2.0), ("g", "Wohnung", 100.0)])
    assert out["g"] == "Wohnung | Haus"


def test_gap_rule_stops_at_first_miss(spark):
    # after a miss nothing further is accepted even if it clears the floor
    out = _agg(spark, [("g", "a", 100.0), ("g", "b", 10.0), ("g", "c", 50.0)])
    # sorted: a=100 (floor 0->20), c=50 (>=20, floor->40), b=10 < 40 -> stop
    assert out["g"] == "a | c"


def test_gap_rule_single(spark):
    assert _agg(spark, [("g", "x", 1.0)])["g"] == "x"


def test_gap_rule_deterministic_ties(spark):
    out = _agg(spark, [("g", "b", 50.0), ("g", "a", 50.0)])
    assert out["g"] == "a | b"
