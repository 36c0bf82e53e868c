"""Streaming ingestion: catch-up runs are incremental and exactly-once."""

import os
import shutil

import pyarrow.parquet as pq

from wikdict_gen_spark.sources.pages import read_pages
from wikdict_gen_spark.streaming.ingest import run_catchup


def test_read_pages_validates(spark, fixture_dir):
    df = read_pages(spark, f"{fixture_dir}/pages.parquet")
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]


def test_read_pages_rejects_bad_schema(spark, tmp_path):
    spark.range(3).write.parquet(str(tmp_path / "bad"))
    import pytest

    with pytest.raises(ValueError, match="missing columns"):
        read_pages(spark, str(tmp_path / "bad"))


def test_streaming_catchup_incremental(spark, fixture_dir, tmp_path):
    src = tmp_path / "landing"
    out = tmp_path / "extracted"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    table = pq.read_table(f"{fixture_dir}/pages.parquet")
    first, second = table.slice(0, 50), table.slice(50, 30)

    pq.write_table(first, src / "batch1.parquet")
    run_catchup(spark, str(src), str(out), str(ckpt))
    n1 = spark.read.parquet(str(out)).count()
    assert n1 == 50

    # second catch-up with no new files: nothing reprocessed
    run_catchup(spark, str(src), str(out), str(ckpt))
    assert spark.read.parquet(str(out)).count() == 50

    pq.write_table(second, src / "batch2.parquet")
    run_catchup(spark, str(src), str(out), str(ckpt))
    got = spark.read.parquet(str(out))
    assert got.count() == 80
    # extraction contract holds through the streaming path
    expected = spark.read.parquet(f"{fixture_dir}/expected_text.parquet")
    joined = got.join(expected.withColumnRenamed("text", "want"), "url")
    assert joined.where("text <> want").count() == 0
