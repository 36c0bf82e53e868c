"""End-to-end training-corpus preparation: the composition a 100-TB
pre-training data pipeline actually runs, built from this engine's
primitive operators.

    quality gate  ->  exact dedup  ->  MinHash-LSH near-dup removal

Each stage's shuffle shape is the primitive's (documented at its
definition): one groupBy on the content hash, one bucketed band join
(never all-pairs), Jaccard verification on candidate pairs only.  The
near-dup drop rule is the standard greedy one — a document is dropped if
ANY candidate partner with a smaller id verifies as a near-dup — which
is SQL-expressible, so the whole composition sits under the DuckDB
oracle (q_clean_corpus) rather than only unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikdict_gen_spark.operators import dedup as D
from wikdict_gen_spark.operators import textstats as T


def clean_corpus(
    docs: DataFrame,
    quality_min: float = 0.5,
    jaccard_threshold: float = 0.5,
    num_hashes: int = 4,
    bands: int = 2,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact: bool = True,
) -> DataFrame:
    """Surviving documents of the full prep pipeline.

    Returns (id_col, quality, content_hash): one row per kept document —
    above the quality floor, canonical for its exact-content group
    (minimum id), and not a verified near-dup of any smaller canonical
    id.  `compact=False` pins the md5-portable MinHash shape (the oracle
    path); production keeps the xxhash64 default.

    Scale notes: the quality gate is pure column arithmetic (no shuffle);
    exact dedup is one groupBy on the 128-bit hash; candidates come from
    banded LSH buckets, so the pair count is driven by real collisions,
    not |docs|²; Jaccard runs only on those pairs.
    """
    scored = T.quality_score(docs, text_col=text_col).where(
        F.col("quality") >= F.lit(float(quality_min))
    )
    good = docs.join(scored.select(id_col, "quality"), id_col)

    # canonical representative per exact-content group, among good docs
    exact = D.exact_dedup(good, id_col=id_col, text_col=text_col).select(
        id_col, "content_hash"
    )
    canon = good.join(exact.select(id_col), id_col)

    # one shingle derivation feeds both the signatures and the Jaccard
    # verification (shared subtree -> AQE exchange reuse instead of a
    # second tokenize+explode pass over the corpus)
    sh = D.shingles(canon, id_col=id_col, text_col=text_col, k=k)
    sig = D.minhash_signatures(sh, id_col=id_col,
                               num_hashes=num_hashes, compact=compact)
    pairs = D.lsh_candidate_pairs(sig, id_col=id_col,
                                  num_hashes=num_hashes, bands=bands)
    verified = D.ngram_jaccard(canon, pairs, id_col=id_col,
                               text_col=text_col, k=k, shingles_df=sh).where(
        F.col("jaccard") >= F.lit(float(jaccard_threshold))
    )
    # greedy drop: id_b > id_a by construction of the pair list, so every
    # verified pair eliminates its larger id
    drops = verified.select(F.col("id_b").alias(id_col)).distinct()
    kept = canon.join(drops, id_col, "left_anti")
    return kept.join(exact, id_col).select(id_col, "quality", "content_hash")
