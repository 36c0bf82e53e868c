#!/usr/bin/env python
"""650-pair TEI rehearsal: pipeline + write_tei across all 26 registry
languages.

Builds a corpus spanning every language in the registry (26 x 25 = 650
directed pairs), runs the full pipeline, assembles + renders + writes one
TEI file per pair, and records:

- that exactly 650 files exist, all named with ISO-639-3 codes
  (`{iso3}-{iso3}.tei`), routed into small/ per the headword threshold;
- per-pair headword-count skew (the straggler bound of the one-file-per-
  pair contract: a single pair's file is written by a single task);
- phase walls (pipeline vs tei-assembly+write).

Writes PAIRS_REHEARSAL.json; BENCH.md cites the numbers.

Usage: python scripts/pair_rehearsal.py [n_concepts]  (default 300)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wikdict_gen_spark import languages as langreg
from wikdict_gen_spark.fixtures import build_bench_corpus
from wikdict_gen_spark.operators import tei
from wikdict_gen_spark.pipeline import run_pipeline
from wikdict_gen_spark.session import get_spark


def main() -> None:
    n_concepts = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    langs = langreg.SUPPORTED_LANGS
    base = Path(tempfile.gettempdir()) / f"wikdict_rehearsal_{n_concepts}"
    corpus = base / "corpus"
    if not (corpus / "_DONE").exists():
        build_bench_corpus(corpus, n_concepts=n_concepts, seed=11, workers=16,
                           langs=langs)
        (corpus / "_DONE").touch()

    spark = get_spark(app_name="pair_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    out = run_pipeline(spark, str(corpus / "pages.parquet"),
                       str(base / "work"), fused=True)
    from pyspark.sql import functions as F

    rows = tei.tei_entry_rows(
        # the reference fans out over permutations of DISTINCT languages
        # (helper.py supported_langs), so self-pairs the pivot composition
        # can produce (l1 -> l2 -> l1) are out of contract
        out["translation_grouped"].where(F.col("from_lang") != F.col("to_lang")),
        out["entry"],
        out["form"].select("lexentry", "other_written", "rank"),
        min_score=0.0,
    )
    t_pipeline = time.monotonic() - t0

    t1 = time.monotonic()
    out_dir = base / "tei_out"
    counts = tei.write_tei(tei.tei_entry_xml(rows), str(out_dir),
                           today="2026-08-17")
    t_tei = time.monotonic() - t1
    spark.stop()

    files = sorted(p.relative_to(out_dir).as_posix()
                   for p in out_dir.rglob("*.tei"))
    iso3 = set(langreg.LANGUAGE_CODES3.values())
    bad_names = [f for f in files
                 if not all(c in iso3 for c in Path(f).stem.split("-"))]
    n_pairs_expected = len(langs) * (len(langs) - 1)
    hw = sorted(counts.values())
    report = {
        "n_langs": len(langs),
        "n_pairs_expected": n_pairs_expected,
        "n_pairs_written": len(counts),
        "n_files": len(files),
        "bad_filenames": bad_names,
        "n_small_routed": sum(1 for f in files if f.startswith("small/")),
        "headwords_total": sum(hw),
        "headwords_min": hw[0],
        "headwords_p50": hw[len(hw) // 2],
        "headwords_max": hw[-1],
        "skew_max_over_p50": round(hw[-1] / max(hw[len(hw) // 2], 1), 2),
        "pipeline_wall_s": round(t_pipeline, 1),
        "tei_wall_s": round(t_tei, 1),
        "n_concepts": n_concepts,
    }
    Path("PAIRS_REHEARSAL.json").write_text(json.dumps(report, indent=1))
    print(json.dumps(report))
    ok = (len(files) == n_pairs_expected == len(counts) and not bad_names)
    print("REHEARSAL", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
