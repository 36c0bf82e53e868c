"""Independent reference-semantics oracle over the fixture plan tables.

A deliberately naive pure-Python/pandas evaluation of the pipeline
semantics (precedence, importance, backlink, pivot composition, fusion,
gap rule) at toy scale.  Shares only the scalar contract functions with
the engine — no Spark, no DataFrame logic — so an engine bug can't hide
in shared code.
"""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from wikdict_gen_spark import constants as C
from wikdict_gen_spark.functions.textclean import is_dummy_sense


def _load(fixture_dir: str, name: str) -> list[dict]:
    return (
        duckdb.sql(f"SELECT * FROM '{fixture_dir}/{name}.parquet'")
        .df()
        .where(lambda d: d.notna(), None)
        .to_dict("records")
    )


def gap_rule(candidates: list[tuple[str, float]]) -> str:
    """(candidate, score) -> ' | ' list; sort score desc / candidate asc."""
    result = []
    floor = 0.0
    for cand, score in sorted(candidates, key=lambda x: (-x[1], x[0])):
        if score >= floor:
            result.append(cand)
            floor += C.GAP_STEP
        else:
            break
    return " | ".join(result)


class Oracle:
    def __init__(self, fixture_dir: str):
        self.entry = _load(fixture_dir, "plan_entry")
        self.translation = _load(fixture_dir, "plan_translation")
        self.nym = _load(fixture_dir, "plan_nym")
        self.pos = _load(fixture_dir, "plan_pos")
        self._compute()

    def _compute(self) -> None:
        lex2 = {e["lexentry"]: e for e in self.entry}
        # chosen pos per lexentry = lexical minimum (choose_pos semantics)
        lex_pos: dict[str, str] = {}
        for p in self.pos:
            cur = lex_pos.get(p["lexentry"])
            if cur is None or p["part_of_speech"] < cur:
                lex_pos[p["lexentry"]] = p["part_of_speech"]

        def eligible(lexentry: str) -> bool:
            """F6 pos gate: abbreviation/letter entries don't score importance."""
            return lex_pos.get(lexentry) not in C.EXCLUDED_POS or lex_pos.get(lexentry) is None

        # --- importance (node salience) -----------------------------------
        trans_targets = defaultdict(set)
        for t in self.translation:
            if not eligible(t["lexentry"]):
                continue
            e = lex2[t["lexentry"]]
            trans_targets[(e["lang"], e["vocable"])].add((t["to_lang"], t["trans"]))
        syn_refs = defaultdict(set)
        for n in self.nym:
            if n["nym"] == "synonym":
                syn_refs[(n["lang"], n["t_rep"])].add(n["f"])
        self.importance: dict[tuple[str, str], float] = {}
        by_lang_scores = defaultdict(list)
        for e in self.entry:
            if not eligible(e["lexentry"]):
                continue  # vocable scores only through its eligible lexentries
            key = (e["lang"], e["vocable"])
            if key in self.importance:
                continue
            guess = e["vocable"][4:].replace("_", " ")
            score = math.sqrt(len(trans_targets.get(key, ()))) + math.sqrt(
                len(syn_refs.get((e["lang"], guess), ()))
            )
            self.importance[key] = score
            by_lang_scores[e["lang"]].append(score)
        high = {
            lang: sum(sorted(ss, reverse=True)[: C.TOP_K_NORM]) / min(len(ss), C.TOP_K_NORM)
            for lang, ss in by_lang_scores.items()
        }
        self.rel_importance = {
            (lang, voc): s / high[lang] for (lang, voc), s in self.importance.items()
        }
        # surface-form lookup for entity linking (guess -> rel importance)
        self.rel_by_guess: dict[tuple[str, str], float] = {}
        for (lang, voc), rel in self.rel_importance.items():
            self.rel_by_guess[(lang, voc[4:].replace("_", " "))] = rel

        # --- sense-beats-gloss precedence -----------------------------------
        sense_keys = {
            (t["lexentry"], t["to_lang"], t["trans"])
            for t in self.translation
            if t["kind"] == "sense"
        }
        kept = [
            t
            for t in self.translation
            if t["kind"] == "sense"
            or (t["lexentry"], t["to_lang"], t["trans"]) not in sense_keys
        ]

        # --- processed translation (dedup by min lexentry) -------------------
        groups = defaultdict(list)
        for t in kept:
            e = lex2[t["lexentry"]]
            if (t["from_lang"], e["vocable"]) not in self.rel_importance:
                continue  # inner from-importance join: excluded vocables drop out
            sense = t["sense"]
            if sense is not None and is_dummy_sense(sense, t["from_lang"]):
                sense = None
            from_imp = self.rel_importance[(t["from_lang"], e["vocable"])]
            to_imp = self.rel_by_guess.get((t["to_lang"], t["trans"]), C.MISSING_IMPORTANCE)
            groups[
                (t["from_lang"], t["to_lang"], t["sense_num"], sense, e["written_rep"], t["trans"])
            ].append((t["lexentry"], from_imp, to_imp))
        self.all_trans = []
        for (f_lang, t_lang, sense_num, sense, rep, trans), rows in groups.items():
            self.all_trans.append(
                {
                    "from_lang": f_lang,
                    "to_lang": t_lang,
                    "lexentry": min(r[0] for r in rows),
                    "sense_num": sense_num,
                    "sense": sense if sense is not None else "",
                    "from_vocable": rep,
                    "to_vocable": trans,
                    "from_importance": max(r[1] for r in rows),
                    "to_importance": max(r[2] for r in rows),
                }
            )

        # --- backlink scores ---------------------------------------------------
        back_all = defaultdict(int)
        back_good = defaultdict(int)
        for b in self.all_trans:
            back_all[(b["from_lang"], b["to_lang"], b["from_vocable"], b["sense"])] += 1
            back_good[
                (b["from_lang"], b["to_lang"], b["from_vocable"], b["to_vocable"], b["sense"])
            ] += 1
        self.backlink = {}  # (A,B,a,b,back_sense) -> ratio
        for t in self.all_trans:
            A, B, a, b = t["from_lang"], t["to_lang"], t["from_vocable"], t["to_vocable"]
            for (bf, bt, bv, s), n_all in back_all.items():
                if (bf, bt, bv) == (B, A, b):
                    good = back_good.get((B, A, b, a, s), 0)
                    self.backlink[(A, B, a, b, s)] = good / n_all

        # --- evidence: direct, indirect, reverse --------------------------------
        inputs = []
        for t in self.all_trans:
            inputs.append({**t, "source": "direct", "source_detail": None,
                           "score": C.DIRECT_SCORE})
        # indirect: group by (A, C, a, c, pivot_lang, lexentry, sense_num, sense)
        ind = defaultdict(list)
        for t1 in self.all_trans:
            for t2 in self.all_trans:
                if t1["to_lang"] == t2["from_lang"] and t1["to_vocable"] == t2["from_vocable"]:
                    bl = self.backlink.get(
                        (t1["from_lang"], t1["to_lang"], t1["from_vocable"],
                         t1["to_vocable"], t2["sense"])
                    )
                    key = (
                        t1["from_lang"], t2["to_lang"], t1["from_vocable"], t2["to_vocable"],
                        t1["to_lang"], t1["lexentry"], t1["sense_num"], t1["sense"],
                    )
                    ind[key].append(
                        (bl, t1["from_importance"], t2["to_importance"], t1["to_vocable"])
                    )
        for (A, CL, a, c, p_lang, lexentry, sense_num, sense), rows in ind.items():
            bls = [r[0] for r in rows if r[0] is not None]
            max_bl = max(bls) if bls else None
            pvoc = min(r[3] for r in rows)
            score = (
                round(max_bl * max_bl * C.INDIRECT_MAX_FACTOR, 1)
                if max_bl is not None
                else C.INDIRECT_DEFAULT_SCORE
            )
            marker = "" if max_bl is None else ("+" if max_bl == 1.0 else "-")
            inputs.append(
                {
                    "from_lang": A, "to_lang": CL, "lexentry": lexentry,
                    "sense_num": sense_num, "sense": sense,
                    "from_vocable": a, "to_vocable": c,
                    "from_importance": max(r[1] for r in rows),
                    "to_importance": max(r[2] for r in rows),
                    "source": "indirect",
                    "source_detail": f"{p_lang}{marker}:{pvoc}",
                    "score": score,
                }
            )
        covered = {
            (i["from_lang"], i["to_lang"], i["from_vocable"], i["to_vocable"]) for i in inputs
        }
        for t in self.all_trans:
            key = (t["to_lang"], t["from_lang"], t["to_vocable"], t["from_vocable"])
            if key not in covered:
                inputs.append(
                    {
                        "from_lang": t["to_lang"], "to_lang": t["from_lang"],
                        "lexentry": None, "sense_num": None, "sense": "",
                        "from_vocable": t["to_vocable"], "to_vocable": t["from_vocable"],
                        "from_importance": t["from_importance"],
                        "to_importance": t["to_importance"],
                        "source": "direct_reverse", "source_detail": None,
                        "score": C.REVERSE_SCORE,
                    }
                )

        # --- fusion ------------------------------------------------------------
        fused = defaultdict(lambda: {"sources": [], "details": [], "score": 0.0})
        for i in inputs:
            sense = i["sense"] if i["sense"] != "" else None
            key = (
                i["from_lang"], i["to_lang"], i["lexentry"], i["sense_num"], sense,
                i["from_vocable"], i["to_vocable"],
                round(i["from_importance"], 9), round(i["to_importance"], 9),
            )
            fused[key]["sources"].append(i["source"])
            if i["source_detail"] is not None:
                fused[key]["details"].append(i["source_detail"])
            fused[key]["score"] += i["score"]
        self.infer = [
            {
                "from_lang": k[0], "to_lang": k[1], "lexentry": k[2], "sense_num": k[3],
                "sense": k[4], "from_vocable": k[5], "to_vocable": k[6],
                "from_importance": k[7], "to_importance": k[8],
                "sources": sorted(v["sources"]), "source_details": sorted(v["details"]),
                "score": v["score"],
            }
            for k, v in fused.items()
        ]

        # --- gap-rule grouping ----------------------------------------------------
        g = defaultdict(list)
        for r in self.infer:
            g[(r["from_lang"], r["to_lang"], r["lexentry"], r["sense_num"],
               r["sense"], r["from_vocable"])].append(r)
        self.infer_grouped = [
            {
                "from_lang": k[0], "to_lang": k[1], "lexentry": k[2], "sense_num": k[3],
                "sense": k[4], "from_vocable": k[5],
                "trans_list": gap_rule([(r["to_vocable"], r["score"]) for r in rows]),
                "score": max(r["score"] for r in rows),
            }
            for k, rows in g.items()
        ]

    # --- triple views -----------------------------------------------------------
    def expected_translation_triples(self) -> set[tuple[str, str, str]]:
        return {
            (f"{r['from_lang']}/{r['from_vocable']}", "translatesTo",
             f"{r['to_lang']}/{r['to_vocable']}")
            for r in self.infer
        }
