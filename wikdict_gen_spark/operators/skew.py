"""Explicit skew handling: hot-key detection + split joins + salting.

AQE's skew-join splitting handles skewed *shuffle* partitions at runtime,
but the north rule requires explicit, plan-level skew strategy for the
entity-linking and pivot-composition joins, where key frequency follows a
Zipf law (stop-word-like vocables).  The pattern implemented here:

1. detect hot keys on the fact (probe) side with a cheap count agg;
2. route hot keys through a broadcast join against the (small) slice of
   the dimension holding exactly those keys — no shuffle of the heavy rows;
3. route the long tail through the normal shuffled hash join;
4. union the two paths.

``salted_self_join`` additionally offers classic salting for self-joins
where both sides are large: the hot build rows are replicated SALT ways and
the probe rows pick a deterministic salt, spreading one hot key over SALT
reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikdict_gen_spark import constants as C


def hot_keys(df: DataFrame, keys: list[str], threshold: int | None = None) -> DataFrame:
    """Keys whose row count exceeds the hot threshold (tiny result, broadcastable)."""
    threshold = threshold or C.HOT_KEY_THRESHOLD
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > threshold)
        .drop("__n")
    )


def skew_aware_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "left",
    threshold: int | None = None,
) -> DataFrame:
    """Join a skewed fact table to a dimension, splitting hot keys onto
    a broadcast path.

    Correctness-equivalent to ``fact.join(dim, keys, how)`` for how in
    {left, inner}; the hot slice of ``dim`` must fit in a broadcast (true
    by construction: it has at most as many rows as there are hot keys
    times dim duplication).
    """
    # hot keys are bounded by |fact| / threshold rows (each needs more than
    # `threshold` fact rows behind it), so the detection agg is a small
    # broadcast-class relation.  It stays IN the plan (no driver collect):
    # a collect would stall the driver for a full scan before the join plan
    # even exists, serializing in front of every downstream job.  As a
    # broadcast-exchange subtree the detection overlaps with the rest of
    # the job, and its three references below canonicalize to the same
    # exchange (ReusedExchange), so the scan still runs once.  Callers pass
    # checkpointed/committed inputs, so even a missed reuse is a cheap
    # cached re-scan, never a lineage recompute.
    hot = hot_keys(fact, keys, threshold)
    hot_tag = F.broadcast(hot.withColumn("__hot", F.lit(True)))
    tagged = fact.join(hot_tag, keys, "left")
    fact_hot = tagged.where(F.col("__hot").isNotNull()).drop("__hot")
    fact_cold = tagged.where(F.col("__hot").isNull()).drop("__hot")
    dim_hot = dim.join(F.broadcast(hot), keys, "semi")
    joined_hot = fact_hot.join(F.broadcast(dim_hot), keys, how)
    joined_cold = fact_cold.join(dim, keys, how)
    return joined_hot.unionByName(joined_cold)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    how: str = "inner",
    salt: int | None = None,
) -> DataFrame:
    """Salted equi-join for large×large joins with hot keys on the left.

    The right side is replicated ``salt`` times (explode over the salt
    range); each left row picks one deterministic salt bucket from a hash
    of its full row, so one hot key spreads across ``salt`` reducers.
    Result equals ``left.join(right, keys, how)`` row-for-row.
    """
    salt = salt or C.SALT_BUCKETS
    salted_left = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_left.join(salted_right, keys + ["__salt"], how)
    return out.drop("__salt")
