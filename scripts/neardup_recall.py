"""Measure embedding near-dup LSH recall vs the exact all-pairs baseline,
sweeping the OR-amplification band count.

Corpus: the sf0.1 embeddings (2000 real 64-dim vectors) plus one planted
near-duplicate twin per vector (deterministic jitter small enough that
the twin's cosine sits above the 0.9 gate) — so the ground-truth pair
set is dense, known to contain every planted twin, and computed
independently by `embedding_near_dups(method="exact")`, the O(n²)
verification path.

For each n_bands in the sweep (n_planes fixed at 8), reports:
  recall        = |lsh pairs ∩ exact pairs| / |exact pairs|
                  (precision is 1.0 by construction: every emitted pair
                  is cosine-verified, banding only affects recall)
  candidate_pairs = Σ_buckets C(size, 2) across all bands — the bucket-
                  join cost knob the bands multiply.

Writes NEARDUP_RECALL.json (picked up by bench.py's BENCH.md writer) and
prints a markdown table.

Usage: python scripts/neardup_recall.py [sf_dir] [threshold]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from wikdict_gen_spark.operators import dedup as D  # noqa: E402
from wikdict_gen_spark.operators import similarity as S  # noqa: E402
from wikdict_gen_spark.session import get_spark  # noqa: E402

DIM = 64
N_PLANES = 8
BAND_SWEEP = (1, 2, 4, 8)
TWIN_JITTER = 0.02  # small enough that every twin clears the cosine gate


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9

    spark = get_spark(parallelism=16, app_name="neardup_recall",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_base = base.count()

    # planted twin: vec_id + 1_000_000, per-(id, dim) deterministic jitter
    twins = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: F.element_at("embedding", d + 1)
            + (
                F.pmod(F.xxhash64(F.col("vec_id"), d, F.lit("twin")), F.lit(20011))
                / 20011.0
                - 0.5
            )
            * (2.0 * TWIN_JITTER),
        ).alias("embedding"),
    )
    corpus = base.unionByName(twins).localCheckpoint(eager=True)
    n_corpus = corpus.count()

    exact = (
        D.embedding_near_dups(corpus, threshold=threshold, method="exact")
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()
    n_planted_found = exact.where(
        F.col("id_b") - F.col("id_a") == 1_000_000
    ).count()
    print(f"exact pairs at cosine>={threshold}: {n_exact} "
          f"(planted twins among them: {n_planted_found}/{n_base})")

    rows = []
    for n_bands in BAND_SWEEP:
        approx = D.embedding_near_dups(
            corpus, threshold=threshold, method="lsh",
            n_planes=N_PLANES, n_bands=n_bands, dim=DIM,
        )
        hit = exact.join(approx, ["id_a", "id_b"]).count()
        recall = hit / n_exact if n_exact else float("nan")
        # bucket-join cost: candidate pairs before verification
        band_sigs = []
        for b in range(n_bands):
            planes = [S._hyperplane(b * N_PLANES + p, DIM)
                      for p in range(N_PLANES)]
            band_sigs.append(F.struct(
                F.lit(b).alias("band"),
                S.rp_signature(F.col("embedding"), planes).alias("sig"),
            ))
        buckets = (
            corpus.withColumn("__bs", F.explode(F.array(*band_sigs)))
            .groupBy("__bs").count()
        )
        cand = buckets.agg(
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs")
        ).collect()[0]["pairs"]
        rows.append({
            "n_planes": N_PLANES,
            "n_bands": n_bands,
            "recall": round(recall, 4),
            "candidate_pairs": int(cand),
        })
        print(f"n_bands={n_bands}: recall={recall:.3f} "
              f"candidate_pairs={int(cand)}")

    report = {
        "corpus_vectors": n_corpus,
        "base_vectors": n_base,
        "dim": DIM,
        "threshold": threshold,
        "exact_pairs": n_exact,
        "planted_twins_in_exact": n_planted_found,
        "rows": rows,
    }
    out = Path(__file__).resolve().parent.parent / "NEARDUP_RECALL.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
