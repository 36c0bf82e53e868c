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
        extra_conf={"spark.sql.warehouse.dir": warehouse},
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

    # bucketed path: both sides scan their buckets; no Exchange may appear
    b_old, b_new = spark.table("edges_old"), spark.table("edges_new")
    bucketed = b_old.join(b_new, ["subj", "pred", "obj"], "inner")
    n_bucketed = bucketed.count()
    bucketed_plan = plan_of(bucketed)

    # contrast: identical join on plain (unbucketed) DataFrames
    plain = old.join(new, ["subj", "pred", "obj"], "inner")
    n_plain = plain.count()
    plain_plan = plan_of(plain)

    bx = len(re.findall(r"\bExchange\b", bucketed_plan))
    px = len(re.findall(r"\bExchange\b", plain_plan))
    assert n_bucketed == n_plain, (n_bucketed, n_plain)
    assert bx == 0, f"bucketed join still has {bx} Exchange nodes"
    assert px > 0

    Path("BUCKETING.md").write_text(
        f"""# BUCKETING — zero-exchange co-located joins for KG snapshots

Two KG edge snapshots written `bucketBy(16, subj).sortBy(subj)`; the
snapshot join then runs with **{bx} Exchange nodes** (both sides scan
their buckets directly), against **{px} Exchanges** for the identical
join on unbucketed data.  Row counts agree ({n_bucketed} rows both
ways).  At cluster scale this converts every recurring edge-table join
(snapshot diff, backlink scoring, enrichment) from a per-query shuffle
of the table into a one-time write-side cost.

Regenerate with `python scripts/bucket_probe.py`.

## Bucketed join plan (zero Exchange)

```
{bucketed_plan}
```

## Same join, unbucketed (the shuffles bucketing removes)

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
