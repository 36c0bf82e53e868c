"""Bucketed co-located join probe: the zero-exchange evidence run.

At 100 TB the dominant cost of every KG self-join (backlink scoring,
snapshot diff, edge enrichment) is the shuffle of the edge table.  Spark's
answer is BUCKETING: write the table hash-partitioned AND sorted by the
join key (`bucketBy(n, key).sortBy(key).saveAsTable(...)`), and every
later equi-join between tables bucketed the same way runs with NO
Exchange on either side — the shuffle is paid once at write time and
amortized over every downstream join.

This probe builds two KG edge snapshots from the lineitem-derived triple
table, writes both bucketed by `subj` (16 buckets, sorted), joins them
(the snapshot_diff key pattern), and checks into BUCKETING.md:

  * the joined plan, showing SortMergeJoin with ZERO Exchange nodes
    (both sides scan their buckets directly);
  * the same join on unbucketed parquet for contrast (2 Exchanges);
  * row-count equality between both paths.

Usage: python scripts/bucket_probe.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import shutil
import sys
import tempfile
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    text = re.sub(r"#\d+L?", "#x", text)
    text = re.sub(r"\[plan_id=\d+\]", "[plan_id=*]", text)
    return text


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    warehouse = tempfile.mkdtemp(prefix="bucket_probe_wh_")

    from wikdict_gen_spark.session import get_spark

    spark = get_spark(
        parallelism=8,
        app_name="bucket_probe",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": warehouse,
            # force both paths to plan SortMergeJoin: at probe scale the
            # planner would otherwise broadcast one side and IGNORE the
            # buckets ("Bucketed: false (disabled by query planner)"),
            # so the zero-exchange contrast would demonstrate the
            # broadcast, not bucket co-location (round-5 verdict)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    old = spark.sql(
        """SELECT DISTINCT 'p/' || CAST(l_partkey AS STRING) AS subj,
                  'suppliedBy' AS pred,
                  's/' || CAST(l_suppkey AS STRING) AS obj
           FROM lineitem WHERE l_shipdate < DATE '1999-01-01'"""
    )
    new = spark.sql(
        """SELECT DISTINCT 'p/' || CAST(l_partkey AS STRING) AS subj,
                  'suppliedBy' AS pred,
                  's/' || CAST(l_suppkey AS STRING) AS obj
           FROM lineitem WHERE l_shipdate >= DATE '1996-06-01'"""
    )

    for name, df in [("edges_old", old), ("edges_new", new)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(16, "subj")
            .sortBy("subj")
            .format("parquet")
            .saveAsTable(name)
        )

    # contrast inputs: the SAME snapshots as plain materialized parquet
    # tables, so the unbucketed plan's Exchanges belong to the JOIN and
    # not to the lazy DISTINCT derivation (round-5 verdict: the old
    # contrast counted the derivation's shuffles)
    for name, df in [("plain_old", old), ("plain_new", new)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        df.write.mode("overwrite").format("parquet").saveAsTable(name)

    # the join is keyed on the BUCKET KEY (subj) — the recurring
    # edge-enrichment pattern the bucketing claim is about.  (A join on
    # the full triple key would need
    # spark.sql.requireAllClusterKeysForCoPartition=false to reuse a
    # subj-only bucketing; keeping the probe on default configs, the
    # subj-keyed join is the co-location demonstration.)
    def snap_join(o, n):
        return o.join(
            n.select("subj", F.col("obj").alias("obj_new")), ["subj"], "inner"
        )

    # bucketed path: both sides scan their buckets; no Exchange may appear
    bucketed = snap_join(spark.table("edges_old"), spark.table("edges_new"))
    n_bucketed = bucketed.count()
    bucketed_plan = plan_of(bucketed)

    # contrast: identical join on the plain materialized tables
    plain = snap_join(spark.table("plain_old"), spark.table("plain_new"))
    n_plain = plain.count()
    plain_plan = plan_of(plain)

    # count plan NODES (the numbered operator list), not text mentions
    bx = len(re.findall(r"\(\d+\) Exchange", bucketed_plan))
    px = len(re.findall(r"\(\d+\) Exchange", plain_plan))
    assert n_bucketed == n_plain, (n_bucketed, n_plain)
    # the claim, asserted in full: bucket co-location under a SortMerge
    # join — not a broadcast that happens to have no exchange
    assert "SortMergeJoin" in bucketed_plan, "bucketed plan is not SMJ"
    assert "SortMergeJoin" in plain_plan, "plain plan is not SMJ"
    assert re.search(r"Bucketed: true", bucketed_plan), \
        "bucketed scan not actually bucket-pruned (Bucketed != true)"
    assert "SelectedBucketsCount" in bucketed_plan
    assert bx == 0, f"bucketed join still has {bx} Exchange nodes"
    assert px >= 2, f"unbucketed SMJ shows {px} Exchanges (expected >= 2)"

    Path("BUCKETING.md").write_text(
        f"""# BUCKETING — zero-exchange co-located joins for KG snapshots

Two KG edge snapshots written `bucketBy(16, subj).sortBy(subj)`; with
auto-broadcast disabled (`autoBroadcastJoinThreshold=-1`, so the probe
demonstrates co-location rather than a broadcast) the snapshot join
plans as a **SortMergeJoin with {bx} Exchange nodes** — both scans say
`Bucketed: true` with `SelectedBucketsCount: 16 out of 16` and feed the
join directly.  The identical SMJ over the same snapshots written as
plain (unbucketed) parquet tables carries **{px} Exchanges**.  Row
counts agree ({n_bucketed} rows both ways).  At cluster scale this
converts every recurring edge-table join (snapshot diff, backlink
scoring, enrichment) from a per-query shuffle of the table into a
one-time write-side cost.

Regenerate with `python scripts/bucket_probe.py`.

## Bucketed join plan (SortMergeJoin, zero Exchange, Bucketed: true)

```
{bucketed_plan}
```

## Same join, unbucketed plain tables (the shuffles bucketing removes)

```
{plain_plan}
```
"""
    )
    print(f"wrote BUCKETING.md: bucketed={bx} exchanges, plain={px}, "
          f"rows={n_bucketed}")
    spark.stop()
    shutil.rmtree(warehouse, ignore_errors=True)


if __name__ == "__main__":
    main()
