"""Dump per-query `.explain("formatted")` to plans/r06/<query>_<tag>.txt.

Usage: python scripts/r06_plans.py <before|after> [names...]
Defaults to the bench headline set plus the other touched queries.
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.1"

DEFAULT = [
    "q_gap_rule", "q_evidence_fusion", "q_entry_assembly", "q_topk_mean_norm",
    "q_window_rank", "q_exact_dedup", "q_minhash_signature", "q_minhash_compact",
    "q_minhash_inline", "q_language_id", "q_ann_topk", "q_token_index",
    "q_fuzzy_search", "q_clean_corpus", "q_line_dedup", "q_pagerank",
    "q_bm25", "q_remove_spans",
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    text = re.sub(r"#\d+L?", "#x", text)
    text = re.sub(r"\[plan_id=\d+\]", "[plan_id=*]", text)
    return text


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    import __spark_entry__ as entrymod
    from bench import EXTRA_QUERIES
    from wikdict_gen_spark.session import get_spark

    spark = get_spark(parallelism=32, app_name="r06_plans",
                      shuffle_partitions=32)
    queries = {**entrymod.queries(), **EXTRA_QUERIES}
    out = Path(__file__).resolve().parent.parent / "plans" / "r06"
    out.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = queries[name](spark, SF_DIR)
        (out / f"{name}_{tag}.txt").write_text(plan_of(df))
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
