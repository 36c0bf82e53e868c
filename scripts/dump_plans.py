"""Dump formatted physical plans for the flagship operators -> PLANS.md.

Run after changing operators: the checked-in PLANS.md documents that scans
are pruned (ReadSchema), filters are pushed (PushedFilters), small sides
broadcast, and the hot paths stay inside WholeStageCodegen.
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    # strip volatile ids for a stable-ish document
    text = re.sub(r"#\d+L?", "#x", text)
    text = re.sub(r"\[plan_id=\d+\]", "[plan_id=*]", text)
    return text


def main() -> None:
    import __spark_entry__ as entrymod
    from wikdict_gen_spark.session import get_spark

    spark = get_spark(parallelism=8, app_name="plans", shuffle_partitions=8)
    queries = entrymod.queries()
    picks = [
        ("q_backlink_score", "pre-aggregated backlink evidence (no raw self-join)", False),
        ("q_pivot_composition", "2-hop composition over the shared checkpoint", False),
        ("q_pivot_composition_raw", "full composition join tree with skew-aware split", True),
        ("q_gap_rule", "full inference lineage + gap-rule HOF aggregation", False),
        ("q_link_join", "skew-aware entity-link join (hot/cold split)", True),
        ("q_search", "FTS search: broadcast queries x token index + per-query window", False),
        ("q_topk_mean_norm", "global top-k + broadcast scalar normalization", False),
        ("q_exact_dedup", "hash dedup (scan -> partial agg -> final agg)", False),
        ("q_ann_topk", "broadcast queries x scan + per-query top-k window", False),
        ("q_ivf_topk", "IVF: Arrow cell assignment + broadcast cell join", False),
        ("q_tei_entries", "TEI assembly: gated join + ordered nested collect + form pre-agg", False),
        ("q_anki", "fixed-gate global ordered top-k (TakeOrderedAndProject)", False),
        ("q_clean_corpus", "corpus prep chain: quality gate -> exact dedup -> LSH near-dup removal (canon + shingle trunks localCheckpoint-materialized: Scan ExistingRDD, zero repeated parquet scans)", True),
        ("q_clean_corpus_raw", "the same chain UN-materialized (materialize=False) — the full logical tree the checkpoints cut; kept as the why-materialize evidence", False),
        ("q_line_dedup", "boilerplate-line removal: one explode (checkpointed), broadcast inventory flag-join folded into a single groupBy(doc) reassembly", True),
        ("q_bm25", "BM25: query-term filter pushed beneath the postings aggregation; df/corpus stats broadcast", False),
        ("q_sessionize", "sessionization: one user-key shuffle, window arithmetic + same-key aggregation", True),
        ("q_collocations", "bigram PMI: two partial-agg counts, broadcast unigram joins after the min_count filter", False),
        ("q_remove_spans", "substring removal: checkpointed positional-gram trunk feeds frequency agg + removal join; broadcast frequent-gram inventory; index-aware array-HOF excision (no token-level shuffle)", True),
        ("q_decontam", "decontamination: DISTINCT benchmark gram inventory broadcast against a single corpus gram pass", False),
        ("q_pack_offsets", "sequence packing: range exchange -> per-__pid window (NO global single-task window) -> broadcast base-offset join", True),
        ("q_host_stats", "per-host rollup over canonical urls: fused string algebra into one combiner-friendly countDistinct expansion", False),
        ("q_snapshot_diff", "snapshot diff: full-outer SMJ on the whole triple key (hub subjects spread over their fan-out)", False),
        # keep LAST: disables broadcast joins for the whole session to
        # force the cluster-scale SMJ regime
        ("q_pagerank_iter", "one PageRank iteration in the SMJ regime: the persisted hash(src) edge table joins the rank vector with NO exchange on the edge side (Pregel partition-once layout)", True),
    ]
    out = ["# PLANS — formatted physical plans of flagship operators\n"]
    out.append(
        "Regenerate with `python scripts/dump_plans.py`.  Things to check:\n"
        "`ReadSchema` lists only needed columns (pruning), `PushedFilters`\n"
        "reach the scan, small sides are `BroadcastHashJoin`/`BroadcastExchange`,\n"
        "hot expressions sit inside `WholeStageCodegen` spans, and AQE nodes\n"
        "(`AdaptiveSparkPlan`) wrap every shuffle.\n\n"
        "Queries marked POST-EXECUTION are dumped *after* running the query,\n"
        "so `AdaptiveSparkPlan isFinalPlan=true` shows the plan AQE actually\n"
        "executed — broadcast-exchange reuse (`ReusedExchange`) and runtime\n"
        "skew handling are visible evidence, not intent.  The shared derived\n"
        "edge table is a `localCheckpoint` (Scan ExistingRDD in these plans):\n"
        "its parquet scan + DISTINCT run once per session, not once per\n"
        "reference (round 2 had 30 lineitem scans in the q_gap_rule plan).\n"
    )
    def build(name):
        if name == "q_pivot_composition_raw":
            # the entry query reads the memoized localCheckpoint, whose plan
            # collapses to an RDD scan once materialized — rebuild the
            # composition over the raw derived table so the full join tree
            # (skew split, broadcast detection, exchange reuse) is visible
            from wikdict_gen_spark.operators import infer as I

            spark.read.parquet(f"{SF_DIR}/lineitem.parquet").createOrReplaceTempView(
                "lineitem"
            )
            at = spark.sql(entrymod.ALL_TRANS_SQL)
            return I.indirect(at, I.backlink_score(at))
        if name == "q_clean_corpus_raw":
            from wikdict_gen_spark.operators import corpus as C

            return C.clean_corpus(
                spark.read.parquet(f"{SF_DIR}/documents.parquet"),
                quality_min=0.5, jaccard_threshold=0.5,
                num_hashes=4, bands=2, k=3, compact=False,
                materialize=False,
            )
        if name == "q_pagerank_iter":
            # one iteration against the persisted loop-invariant tables in
            # the no-broadcast (cluster-scale) regime, so the plan shows
            # the edge side reading the cache without an exchange
            from pyspark import StorageLevel
            from pyspark.sql import functions as F

            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
            lvl = StorageLevel(True, True, False, False, 1)
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet").createOrReplaceTempView(
                "lineitem"
            )
            edges = spark.sql(entrymod._PR_EDGES_SQL)
            deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
            ed = edges.join(deg, "src").repartition("src").persist(lvl)
            pr = (
                edges.select(F.col("src").alias("node")).distinct()
                .select("node", F.lit(0.01).alias("pr"))
                .localCheckpoint(eager=False, storageLevel=lvl)
            )
            contrib = (
                ed.join(pr, ed["src"] == pr["node"])
                .groupBy("dst")
                .agg(F.sum(F.col("pr") / F.col("deg")).alias("contrib"))
            )
            return contrib
        return queries[name](spark, SF_DIR)

    for name, why, final in picks:
        df = build(name)
        if final:
            # collect() executes df's OWN QueryExecution (count()/write()
            # would build a different one), so explain afterwards prints
            # the AQE final plan with isFinalPlan=true
            df.collect()
            out.append(
                f"\n## {name} — {why} (POST-EXECUTION, AQE final plan)\n\n"
                f"```\n{plan_of(df)}```\n"
            )
        else:
            out.append(f"\n## {name} — {why}\n\n```\n{plan_of(df)}```\n")

    scale_plan = Path("CORPUS_SCALE_PLAN.txt")
    if scale_plan.exists():
        out.append(
            "\n## clean_corpus at 600k docs, planted 50k-doc boilerplate "
            "mega-bucket (POST-EXECUTION, AQE final plan)\n\n"
            "Produced by `scripts/corpus_at_scale.py 600000 32` (run stats in\n"
            "CORPUS_SCALE.json, protocol in BENCH.md).  What to check, and why\n"
            "each node is there:\n\n"
            "- `AQEShuffleRead / Arguments: skewed` on\n"
            "  `hashpartitioning(id_a, ...)` — the Jaccard verification join's\n"
            "  pair side.  With `max_bucket_size` clique collapse, the mega\n"
            "  bucket's ~50k pairs all carry the bucket-min as `id_a`, an\n"
            "  input-sized hub skew that AQE splits at mapper boundaries.\n"
            "  (The RAW mega-bucket skew — n^2/2 = 1.25e9 pairs out of an\n"
            "  n-row input partition — is an OUTPUT explosion AQE's\n"
            "  input-bytes heuristic cannot see; the cap converts it into\n"
            "  this splittable form.  That asymmetry is why the cap exists.)\n"
            "- `AQEShuffleRead / Arguments: coalesced` on the small\n"
            "  post-filter exchanges — runtime right-sizing of the tiny side.\n"
            "- zero `Scan parquet` nodes: both multi-consumer trunks (canon,\n"
            "  shingles) are localCheckpoints (`Scan ExistingRDD`), so the\n"
            "  corpus is scanned once per trunk, not once per consumer.\n\n"
            f"```\n{scale_plan.read_text()}```\n"
        )

    Path("PLANS.md").write_text("".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
