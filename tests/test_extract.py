"""Extraction-stage tests: byte-identical text + structure detection parity."""

from pyspark.sql import functions as F

from wikdict_gen_spark.operators.extract import extract_text, parse_records


def test_extract_byte_identity(spark, fixture_dir):
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet")
    expected = spark.read.parquet(f"{fixture_dir}/expected_text.parquet")
    got = extract_text(pages)
    diff = (
        got.alias("g")
        .join(expected.alias("e"), "url", "full")
        .where(~F.col("g.text").eqNullSafe(F.col("e.text")))
    )
    assert diff.count() == 0
    assert got.count() == expected.count()


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_parse_records_matches_plan(spark, fixture_dir):
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet")
    raw = parse_records(extract_text(pages))

    plan_entry = spark.read.parquet(f"{fixture_dir}/plan_entry.parquet")
    assert _sorted_rows(raw["entry"].select("lexentry", "vocable", "written_rep", "lang")) == _sorted_rows(
        plan_entry.select("lexentry", "vocable", "written_rep", "lang")
    )

    plan_nym = spark.read.parquet(f"{fixture_dir}/plan_nym.parquet")
    assert _sorted_rows(raw["nym"]) == _sorted_rows(plan_nym.select("f", "nym", "t_rep", "lang"))

    # translation rows: raw (markup-noised) fields must clean back to the plan
    n_raw = raw["translation"].count()
    n_plan = spark.read.parquet(f"{fixture_dir}/plan_translation.parquet").count()
    assert n_raw == n_plan

    plan_form = spark.read.parquet(f"{fixture_dir}/plan_form.parquet")
    cols = ["lexentry", "other_written", "pos", "mood", "number", "person",
            "tense", "voice", "case", "inflection", "definiteness", "gender", "lang"]
    assert _sorted_rows(raw["form"].select(*cols)) == _sorted_rows(plan_form.select(*cols))
