"""Scan-parallelism guard (operators/partitioning.widen_if_narrow):
fires only on under-parallel inputs, keeps results identical, and keeps
derived-column filters above the widening exchange (the r6 pushdown
barrier)."""

from pyspark.sql import functions as F

from wikdict_gen_spark.operators import dedup
from wikdict_gen_spark.operators.partitioning import widen_if_narrow


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestWidenIfNarrow:
    def test_widens_narrow_input(self, spark):
        cores = spark.sparkContext.defaultParallelism
        narrow = spark.range(100).coalesce(1)
        wide = widen_if_narrow(narrow)
        assert wide.rdd.getNumPartitions() == cores * 2

    def test_noop_on_parallel_input(self, spark):
        cores = spark.sparkContext.defaultParallelism
        already = spark.range(1000).repartition(cores * 4)
        out = widen_if_narrow(already)
        # returned untouched: same object, no extra exchange
        assert out is already

    def test_results_unchanged(self, spark):
        rows = [(i, f"some text number {i % 7}") for i in range(50)]
        narrow = spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1)
        base = dedup.exact_dedup(narrow).collect()
        widened = dedup.exact_dedup(widen_if_narrow(narrow)).collect()
        assert sorted(map(tuple, base)) == sorted(map(tuple, widened))

    def test_barrier_keeps_derived_filter_off_the_scan(self, spark, tmp_path):
        """A filter on a column derived from the scanned data must
        evaluate above the widening exchange, not as a pushed scan
        filter (it would run on the narrow pre-widening partitions)."""
        p = str(tmp_path / "t.parquet")
        spark.range(100).selectExpr(
            "id", "repeat('word ', 5) AS text"
        ).coalesce(1).write.mode("overwrite").parquet(p)
        df = widen_if_narrow(spark.read.parquet(p))
        derived = df.withColumn("n_tok", F.size(F.split("text", " ")))
        gated = derived.where(F.col("n_tok") >= 3)
        plan = _plan(gated)
        assert "CollectMetrics" in plan
        scan_part = plan[plan.index("FileScan"):]
        assert "size(split" not in scan_part  # filter not at the scan
        assert gated.count() == 100

    def test_shingles_widen_matches_narrow(self, spark):
        rows = [(i, "a b c d e f g") for i in range(10)]
        narrow = spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1)
        out = dedup.shingles(narrow, k=3).collect()
        assert len(out) == 10 * 5  # 5 distinct 3-grams per doc
