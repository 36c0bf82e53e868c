"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (JVM-side zip_with/aggregate
arithmetic — no Python in the loop), and an LSH-bucketed variant as the
scale path: random-hyperplane sign signatures put near vectors in the same
bucket, turning the quadratic all-pairs join into a per-bucket join.

Hyperplanes are derived deterministically from (plane index, dimension)
via a hash, so signatures are stable across runs/engines with no stored
model.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a, b):
    """Cosine similarity between two array<float|double> columns."""
    return (_dot(a, b) / (_norm(a) * _norm(b))).alias("cosine")


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast queries × scan, window top-k.

    Shuffle profile: one broadcast (queries are small by definition) + one
    shuffle for the per-query top-k window; with huge query sets, switch to
    the LSH variant.
    """
    q = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
    )
    scored = embeddings.crossJoin(q).select(
        query_id_col,
        id_col,
        cosine_expr(
            F.col(vec_col).cast("array<double>"), F.col("__qvec").cast("array<double>")
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from hashed coords."""
    import hashlib

    coords = []
    for d in range(dim):
        h = hashlib.md5(f"plane{plane}:dim{d}".encode()).hexdigest()
        # map 8 hex chars to [-1, 1)
        coords.append(int(h[:8], 16) / float(1 << 31) - 1.0)
    return coords


def rp_signature(vec_col, planes: list[list[float]]):
    """Random-projection sign signature ('1'/'0' per plane) for a vector col."""
    bits = []
    for p in planes:
        arr = F.array(*[F.lit(x) for x in p])
        bits.append(
            F.when(_dot(vec_col.cast("array<double>"), arr) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
        )
    return F.concat(*bits)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share a random-projection bucket.

    Recall is tunable on two axes: n_planes (fewer planes -> bigger
    buckets) and n_probes (margin-ordered multi-probe, Lv et al. VLDB'07:
    each query also probes the buckets reached by flipping the signature
    bits whose hyperplane margin |q·h| is smallest — the directions the
    query is most likely to have landed on the wrong side of).  Probing
    multiplies only the tiny broadcast query side; the embedding table
    still carries exactly one signature per row, so the big-side shuffle
    cost is unchanged at any probe count.
    """
    planes = [_hyperplane(p, dim) for p in range(n_planes)]
    e = embeddings.withColumn("__sig", rp_signature(F.col(vec_col), planes))

    qvec = F.col("__qvec").cast("array<double>")
    dots = F.array(
        *[_dot(qvec, F.array(*[F.lit(x) for x in p])) for p in planes]
    )
    bits = F.transform(
        F.col("__dots"), lambda d: F.when(d >= 0, F.lit("1")).otherwise(F.lit("0"))
    )
    # plane indices ordered by |margin| ascending (deterministic tiebreak
    # on the index itself)
    order = F.transform(
        F.array_sort(
            F.zip_with(
                F.col("__dots"),
                F.sequence(F.lit(0), F.lit(n_planes - 1)),
                lambda d, i: F.struct(F.abs(d).alias("m"), i.alias("i")),
            )
        ),
        lambda s: s.i,
    )

    def flip(bits_col, idx):
        return F.transform(
            bits_col,
            lambda x, i: F.when(
                i == idx, F.when(x == "1", F.lit("0")).otherwise(F.lit("1"))
            ).otherwise(x),
        )

    probes = F.array(
        F.array_join(bits, ""),
        *[
            F.array_join(flip(bits, F.element_at(order, j + 1)), "")
            for j in range(min(n_probes - 1, n_planes))
        ],
    )
    q = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
        .withColumn("__dots", dots)
        .withColumn("__sig", F.explode(probes))
        .drop("__dots")
    )
    candidates = e.join(q, "__sig").dropDuplicates([query_id_col, id_col])
    scored = candidates.select(
        query_id_col,
        id_col,
        cosine_expr(
            F.col(vec_col).cast("array<double>"), F.col("__qvec").cast("array<double>")
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
