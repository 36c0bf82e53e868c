"""Page-corpus source with schema enforcement.

The engine's only required input is the pages table (input_hint shape).
Reading goes through this module so schema drift is an error at the
boundary, not a silent cast somewhere downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wikdict_gen_spark import schemas

_EXPECTED = {f.name: f.dataType.simpleString() for f in schemas.PAGES.fields}


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Read and validate a pages corpus (url, warc_ts, html, text, lang)."""
    df = spark.read.parquet(path)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = set(_EXPECTED) - set(got)
    if missing:
        raise ValueError(f"pages corpus at {path} missing columns: {sorted(missing)}")
    for name, want in _EXPECTED.items():
        if got[name] != want:
            raise ValueError(
                f"pages corpus column {name!r}: expected {want}, got {got[name]}"
            )
    return df.select(*_EXPECTED)
