"""Incremental page ingestion via Structured Streaming.

The batch pipeline's incrementality is snapshot/resume (the reference is a
batch rebuild system), but new crawl data arrives continuously; this module
gives the extract stage a streaming front door:

    newly landed page files -> readStream -> extract UDF -> append sink

Exactly-once is the file-source + checkpoint contract; the downstream
batch stages then pick the appended extract output up on their next run.
Use `trigger(availableNow=True)` for catch-up runs (tested) and the default
micro-batch trigger for continuous tailing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikdict_gen_spark import schemas
from wikdict_gen_spark.functions.spark_udfs import extract_text_udf


def stream_pages(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of newly landed page parquet files."""
    reader = spark.readStream.schema(schemas.PAGES)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def stream_extract(pages_stream: DataFrame) -> DataFrame:
    """Streaming twin of the batch extract stage (same UDF, same contract)."""
    return pages_stream.select(
        "url", "lang", extract_text_udf(F.col("html")).alias("text"),
        F.col("warc_ts"),
    )


def run_catchup(spark: SparkSession, input_dir: str, output_dir: str,
                checkpoint_dir: str) -> None:
    """Process everything that has landed since the last checkpoint, then stop.

    Idempotent: re-running with the same checkpoint processes only new files.
    """
    extracted = stream_extract(stream_pages(spark, input_dir))
    q = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
