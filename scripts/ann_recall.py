"""Measure LSH ANN recall@k against the exact brute-force baseline.

Corpus: >=10k vectors derived deterministically from the sf0.1 embeddings
table — each real 64-dim vector spawns `expand` jittered copies, giving
the corpus real cluster structure so "nearest neighbor" is meaningful
(pure-random corpora make every neighbor equally far and recall
uninformative).  Queries are further jittered copies NOT in the corpus.

Reports recall@5 and the mean candidate count per query (the cost knob)
for LSH at n_probes in {1, 2, 4} (n_planes=8) AND for IVF at the same
probe counts (n_centroids=64), writes ANN_RECALL.json (picked up by
bench.py's BENCH.md writer) and prints a markdown table.  The two
methods are directly comparable: recall per candidate scanned.

Usage: python scripts/ann_recall.py [sf_dir] [expand] [n_queries]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from wikdict_gen_spark.operators import similarity as S  # noqa: E402
from wikdict_gen_spark.session import get_spark  # noqa: E402

DIM = 64
K = 5
N_PLANES = 8
N_CENTROIDS = 64


def jittered(base, salt: str, scale: float):
    """base vector + deterministic per-(id, dim, salt) jitter in [-scale, scale)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: F.element_at(base, d + 1)
        + (
            F.pmod(F.xxhash64(F.col("new_id"), d, F.lit(salt)), F.lit(20011))
            / 20011.0
            - 0.5
        )
        * (2.0 * scale),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    expand = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    spark = get_spark(parallelism=16, app_name="ann_recall", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_base = base.count()

    corpus = (
        base.select("vec_id", "embedding")
        .crossJoin(spark.range(expand).withColumnRenamed("id", "copy"))
        .withColumn("new_id", F.col("vec_id") * expand + F.col("copy"))
        .select(
            F.col("new_id").alias("vec_id"),
            jittered(F.col("embedding").cast("array<double>"), "corpus", 0.05)
            .cast("array<float>")
            .alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    n_corpus = corpus.count()

    queries = (
        base.where(F.col("vec_id") < n_queries)
        .select("vec_id", "embedding")
        .withColumn("new_id", F.col("vec_id") + 1_000_000)
        .select(
            F.col("vec_id").alias("query_id"),
            jittered(F.col("embedding").cast("array<double>"), "query", 0.05)
            .cast("array<float>")
            .alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )

    exact = (
        S.brute_force_topk(corpus, queries, k=K)
        .select("query_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()

    rows = []
    for n_probes in (1, 2, 4):
        approx = S.lsh_topk(
            corpus, queries, dim=DIM, k=K, n_planes=N_PLANES, n_probes=n_probes
        )
        hit = exact.join(approx.select("query_id", "vec_id"), ["query_id", "vec_id"])
        recall = hit.count() / n_exact
        # candidate volume = cost proxy: rows surviving the bucket join
        planes = [S._hyperplane(p, DIM) for p in range(N_PLANES)]
        e_sig = corpus.withColumn("__sig", S.rp_signature(F.col("embedding"), planes))
        bucket_sizes = e_sig.groupBy("__sig").count()
        stats = bucket_sizes.agg(
            F.count(F.lit(1)).alias("n_buckets"), F.avg("count").alias("avg_bucket")
        ).collect()[0]
        rows.append(
            {
                "method": "lsh",
                "n_planes": N_PLANES,
                "n_probes": n_probes,
                "recall_at_5": round(recall, 4),
                "avg_candidates_per_query": round(stats["avg_bucket"] * n_probes, 1),
                "n_buckets": stats["n_buckets"],
            }
        )
        print(f"lsh n_probes={n_probes}: recall@5={recall:.3f}")

    # IVF at matching probe counts: one trained quantizer reused across
    # probe settings (the production shape)
    cents = S.train_ivf_centroids(corpus, n_centroids=N_CENTROIDS)
    cell_sizes = (
        S._assign_cells(corpus, cents, "embedding", n_probes=1)
        .withColumn("__cell", F.element_at("__cell", 1))
        .groupBy("__cell")
        .count()
    )
    cstats = cell_sizes.agg(
        F.count(F.lit(1)).alias("n_cells"), F.avg("count").alias("avg_cell")
    ).collect()[0]
    for n_probes in (1, 2, 4):
        approx = S.ivf_topk(corpus, queries, centroids=cents, n_probes=n_probes, k=K)
        hit = exact.join(approx.select("query_id", "vec_id"), ["query_id", "vec_id"])
        recall = hit.count() / n_exact
        rows.append(
            {
                "method": "ivf",
                "n_centroids": N_CENTROIDS,
                "n_probes": n_probes,
                "recall_at_5": round(recall, 4),
                "avg_candidates_per_query": round(cstats["avg_cell"] * n_probes, 1),
                "n_buckets": cstats["n_cells"],
            }
        )
        print(f"ivf n_probes={n_probes}: recall@5={recall:.3f}")

    report = {
        "corpus_vectors": n_corpus,
        "base_vectors": n_base,
        "dim": DIM,
        "n_queries": n_queries,
        "k": K,
        "rows": rows,
    }
    out = Path(__file__).resolve().parent.parent / "ANN_RECALL.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
