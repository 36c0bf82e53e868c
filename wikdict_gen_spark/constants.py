"""Scoring and sizing constants shared by all stages.

Centralized because these constants decide which triples survive
thresholds, i.e. they directly determine precision/recall parity with the
reference semantics (/root/reference/src/infer.sql:36,66,77,
/root/reference/src/infer.py:50-58, /root/reference/src/process.py:214-247,
/root/reference/src/generic.py:13).
"""

# evidence scores for translation edges
DIRECT_SCORE = 100.0          # a directly-observed translation edge
REVERSE_SCORE = 2.0           # edge seen only in the opposite direction
INDIRECT_DEFAULT_SCORE = 1.0  # 2-hop pivot with no backlink evidence
INDIRECT_MAX_FACTOR = 10.0    # indirect score = round(backlink^2 * 10, 1)

# quality gates
GOOD_SCORE = 20.0             # minimum score for a "good" translation
GAP_STEP = 20.0               # agg_by_score: accepted-item score-floor increment

# importance normalization
TOP_K_NORM = 10000            # rel_score denominator = mean of top-k scores
MISSING_IMPORTANCE = 0.001    # floor when the link target has no importance row

# part-of-speech classes excluded from importance scoring
# (reference: FILTER (?pos NOT IN (lexinfo:abbreviation, lexinfo:letter))
#  in importance_query, /root/reference/src/sparql/queries.py:183)
EXCLUDED_POS = ("abbreviation", "letter")

# skew handling
SALT_BUCKETS = 16             # salt fan-out for hot-key joins
HOT_KEY_THRESHOLD = 10000     # rows per key above which a key counts as hot
