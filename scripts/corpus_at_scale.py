"""clean_corpus at bench scale with planted skew: the AQE evidence run.

The flagship prep composition (quality gate -> exact dedup -> LSH
near-dup removal) is oracle-verified at sf0.01; this script is the
scale half: a deterministic 600k-document synthetic corpus with the
three populations a web crawl actually has —

  * ~8.3% boilerplate near-dups (50k docs at 600k): one shared
    60-word trunk + a unique tail word per doc.  They all collapse to
    the same MinHash band signature — the "boilerplate text" mega
    bucket the operator docstring names (dedup.lsh_candidate_pairs).
    Uncapped, the bucket self-join would emit ~n_hot^2/2 = 1.25e9
    candidate pairs from an input partition of only n_hot rows: an
    OUTPUT explosion invisible to AQE's input-bytes skew heuristic, so
    the run passes max_bucket_size=100 and the mega bucket is
    clique-collapsed to (bucket-min, member) pairs.  That in turn makes
    the bucket-min a HUB KEY in the Jaccard verification join — 50k
    pair rows on one id_a — which IS an input-sized skew, and AQE
    splits it (the skew-split evidence this run checks in).
  * 5% exact duplicates (groups of 5 sharing one text) -> removed by
    the window-min exact stage before LSH ever sees them.
  * 2% garbage rows (three bangs) -> dropped by the quality gate.

Everything is derived JVM-side from md5(doc_id) — no driver loop, no
Python UDF, reproducible across processes.

The run enables AQE skew-join splitting with thresholds lowered to
bench scale (at 100 TB the default 256 MB threshold trips on its own;
a 600k-doc bucket is megabytes, so the mechanism needs a bench-sized
trigger).  After collect() (which finalizes the adaptive plan —
df.count() builds a separate QueryExecution and does NOT), the final
plan is dumped and the skew/coalesce AQE nodes are counted.

Usage: python scripts/corpus_at_scale.py [n_docs] [cpus]
Writes CORPUS_SCALE.json and prints the final plan to stdout.
"""

from __future__ import annotations

import io
import json
import re
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_docs(spark, n_docs: int):
    """Deterministic documents(doc_id, text) with planted populations."""
    from pyspark.sql import functions as F

    ids = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    did = F.col("doc_id")

    def words(seed_col, n):
        # n pseudo-words of 6 hex chars each, JVM-side
        return F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda i: F.substring(
                F.md5(F.concat(seed_col.cast("string"), F.lit(":"), i.cast("string"))),
                1,
                6,
            ),
        )

    # exact-dup groups: ids 0-4 of every 100 share the text of id - id%100
    dup_seed = F.when(did % 100 < 5, did - (did % 100)).otherwise(did)
    base_text = F.array_join(words(dup_seed, 40), " ")
    # boilerplate trunk: fixed 60 words (seed -1) + one unique tail word
    boiler_text = F.concat(
        F.array_join(words(F.lit(-1), 60), " "),
        F.lit(" "),
        F.substring(F.md5(F.concat(F.lit("tail:"), did.cast("string"))), 1, 6),
    )
    text = (
        F.when(did % 12 == 7, boiler_text)
        .when(did % 50 == 13, F.lit("!!!"))
        .otherwise(base_text)
    )
    return ids.select("doc_id", text.alias("text"))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    skew_threshold = sys.argv[3] if len(sys.argv) > 3 else "128k"
    advisory = sys.argv[4] if len(sys.argv) > 4 else "64k"

    from wikdict_gen_spark.operators.corpus import clean_corpus
    from wikdict_gen_spark.session import get_spark

    spark = get_spark(
        parallelism=cpus,
        app_name="corpus-at-scale",
        shuffle_partitions=cpus * 4,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # bench-sized skew thresholds: the hot bucket is MBs here, not the
    # 256 MB a 100-TB run would feed the default thresholds
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", skew_threshold
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
    # skew splitting slices a reduce partition at MAPPER boundaries; if
    # partition coalescing collapses the upstream stage to one task the
    # hub partition has one mapper and cannot be split — keep the
    # coalesce floor at the advisory size so bench-scale stages retain
    # multiple mappers (at 100 TB the defaults do this on their own)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", advisory)
    # the verification join feeds a groupBy that re-shuffles anyway, but
    # the skew rule is conservative about changing output partitioning —
    # force it (the extra exchange it fears is one that already exists)
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    # keep the bucket join a shuffle join: broadcasting one side would
    # hide the skew path this run is meant to evidence (and at real
    # scale the banded table is never broadcastable anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    docs = synth_docs(spark, n_docs)
    docs.write.mode("overwrite").parquet("/tmp/corpus_scale_docs.parquet")
    docs = spark.read.parquet("/tmp/corpus_scale_docs.parquet")

    t0 = time.monotonic()
    result = clean_corpus(docs, max_bucket_size=100)
    survivors = result.collect()  # finalizes the adaptive plan
    wall = time.monotonic() - t0

    buf = io.StringIO()
    with redirect_stdout(buf):
        result.explain("formatted")
    plan = buf.getvalue()
    plan_stable = re.sub(r"#\d+L?", "#x", plan)
    plan_stable = re.sub(r"\[plan_id=\d+\]", "[plan_id=*]", plan_stable)

    summary = {
        "n_docs": n_docs,
        "cpus": cpus,
        "survivors": len(survivors),
        "wall_s": round(wall, 1),
        "docs_per_s": round(n_docs / wall),
        "final_plan": "isFinalPlan=true" in plan,
        "aqe_shuffle_reads": plan.count("AQEShuffleRead"),
        "skewed_reads": plan.count("skewed"),
        "coalesced_reads": plan.count("coalesced"),
        "max_bucket_size": 100,
        "skew_threshold": skew_threshold,
        "uncapped_pair_arith": "n_hot^2/2 = %d" % ((n_docs // 12 + 1) ** 2 // 2),
        "planted": {
            "boilerplate_near_dups": sum(1 for i in range(n_docs) if i % 12 == 7),
            "exact_dup_rows": sum(
                1 for i in range(n_docs) if i % 100 < 5 and i % 12 != 7 and i % 50 != 13
            ),
            "garbage_rows": sum(1 for i in range(n_docs) if i % 50 == 13 and i % 12 != 7),
        },
    }
    Path("CORPUS_SCALE.json").write_text(json.dumps(summary, indent=2) + "\n")
    # checked-in plan evidence; scripts/dump_plans.py appends it to PLANS.md
    Path("CORPUS_SCALE_PLAN.txt").write_text(plan_stable)
    print(json.dumps(summary, indent=2))
    print(plan_stable)


if __name__ == "__main__":
    main()
