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
        ("q_backlink_score", "pre-aggregated backlink evidence (no raw self-join)"),
        ("q_pivot_composition", "2-hop composition with skew-aware split"),
        ("q_gap_rule", "full inference lineage + gap-rule HOF aggregation"),
        ("q_topk_mean_norm", "global top-k + broadcast scalar normalization"),
        ("q_exact_dedup", "hash dedup (scan -> partial agg -> final agg)"),
        ("q_ann_topk", "broadcast queries x scan + per-query top-k window"),
    ]
    out = ["# PLANS — formatted physical plans of flagship operators\n"]
    out.append(
        "Regenerate with `python scripts/dump_plans.py`.  Things to check:\n"
        "`ReadSchema` lists only needed columns (pruning), `PushedFilters`\n"
        "reach the scan, small sides are `BroadcastHashJoin`/`BroadcastExchange`,\n"
        "hot expressions sit inside `WholeStageCodegen` spans, and AQE nodes\n"
        "(`AdaptiveSparkPlan`) wrap every shuffle.\n"
    )
    for name, why in picks:
        df = queries[name](spark, SF_DIR)
        out.append(f"\n## {name} — {why}\n\n```\n{plan_of(df)}```\n")
    Path("PLANS.md").write_text("".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
