"""Deterministic corpus sampling: hash-gate stratified sampling for
building training mixtures (per-language / per-domain rates).

Why a hash gate and not `df.sample`: a training-data pipeline needs the
sample to be (a) reproducible across runs, clusters, and partition
layouts, (b) stable under corpus growth (a document's keep/drop never
flips when other rows arrive), and (c) auditable by an external engine.
`rand()`-based sampling is none of those.  Keeping a row iff
md5(salt:key) < threshold is all three: md5 is uniform over hex strings,
so a threshold at fraction p of the 32-hex keyspace keeps p of rows in
expectation, deterministically per key.

Scale shape: the gate is a pure column predicate — it fuses into the
scan, costs zero shuffle, and Catalyst pushes the stratum-rate lookup
(a small literal CASE/map) into the same projection.  Nothing about the
operator changes between 500 rows and 10^12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FULL = 16  # md5 hex chars used for the gate (64 bits: collision-free rates)


def rate_to_threshold(rate: float) -> str:
    """Hex threshold t such that P[md5_prefix < t] == rate (to 64-bit
    resolution), comparable LEXICOGRAPHICALLY against the fixed-width
    16-hex prefix (hex digits are ASCII-ordered, so equal-width hex
    compares as magnitude).  rate=1.0 needs a value above the whole
    keyspace: a 17-char '1000…' would sort BELOW 'a…' as a string, so it
    returns 'g' — one char past 'f', above every 16-hex prefix."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sampling rate must be in [0,1], got {rate}")
    scaled = int(rate * (1 << (4 * _FULL)))
    if scaled >= 1 << (4 * _FULL):
        return "g"
    return format(scaled, f"0{_FULL}x")


def hash_sample(docs: DataFrame, rate: float, key_col: str = "doc_id",
                salt: str = "sample") -> DataFrame:
    """Uniform deterministic sample: keep iff the salted md5 prefix falls
    below the rate threshold.  Changing `salt` draws an independent
    sample; the same salt always draws the same one."""
    gate = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))),
        1, _FULL,
    )
    return docs.where(gate < F.lit(rate_to_threshold(rate)))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mixture builder.

    `rates` maps stratum value -> keep fraction (e.g. {"en": 0.1,
    "de": 1.0}); strata not listed keep `default_rate` (0.0 = drop, the
    safe default for an explicit mixture spec).  The per-row threshold is
    a literal CASE over the rates dict, so the whole operator is one
    pushed-down predicate; rows never shuffle and the mixture is exactly
    reproducible from (rates, salt).
    """
    thresh = F.lit(rate_to_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_col) == F.lit(stratum),
            F.lit(rate_to_threshold(rate)),
        ).otherwise(thresh)
    gate = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))),
        1, _FULL,
    )
    return docs.where(gate < thresh)
