"""Tests for the web-corpus operators: boilerplate-line removal, PII
scrubbing, deterministic sampling, PageRank, collocations, incremental
dedup — each on a planted fixture with an independently-computed answer."""

import math

import pytest
from pyspark.sql import functions as F

from wikdict_gen_spark.operators import dedup, graph, sampling, textstats, webclean

BOILER = "cookie consent required"
PAGES = [
    # 5 docs share the banner; body lines are unique
    (1, f"{BOILER}\nalpha body one\nfooter site-a"),
    (2, f"{BOILER}\nbeta body two\nfooter site-a"),
    (3, f"{BOILER}\ngamma body three\nfooter site-a"),
    (4, f"{BOILER}\ndelta body four\nfooter site-a"),
    (5, f"{BOILER}\nepsilon body five"),
    (6, BOILER),  # all-boilerplate page must survive with text=''
    (7, "  \n\n"),  # whitespace-only page: zero lines in, zero out
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "doc_id long, text string")


class TestLineDedup:
    def test_frequent_lines_threshold(self, pages):
        freq = webclean.frequent_lines(pages, min_docs=4).collect()
        # banner in 6 docs, footer in 4, bodies in 1 each
        assert {r["n_docs"] for r in freq} == {6, 4}
        assert len(freq) == 2

    def test_strip_reassembles_in_order(self, spark):
        df = spark.createDataFrame(
            [(1, "keep one\nzap\nkeep two"), (2, "zap"), (3, "zap"), (4, "zap")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in webclean.strip_boilerplate_lines(df, min_docs=3).collect()
        }
        assert out[1]["text"] == "keep one\nkeep two"  # order preserved
        assert out[1]["n_lines_kept"] == 2 and out[1]["n_lines_removed"] == 1

    def test_all_boilerplate_and_empty_docs_survive(self, pages):
        out = {
            r["doc_id"]: r
            for r in webclean.strip_boilerplate_lines(pages, min_docs=4).collect()
        }
        assert len(out) == 7  # nothing dropped, including the degenerate docs
        assert out[6]["text"] == "" and out[6]["n_lines_removed"] == 1
        assert out[7]["text"] == "" and out[7]["n_lines_kept"] == 0
        assert out[1]["text"] == "alpha body one"
        assert out[5]["text"] == "epsilon body five"  # footer absent in 5: kept? no—
        # doc 5 has no footer line; only the banner is stripped

    def test_reusable_inventory(self, pages, spark):
        inv = webclean.frequent_lines(pages, min_docs=4)
        fresh = spark.createDataFrame(
            [(99, f"{BOILER}\nnew body")], "doc_id long, text string"
        )
        out = webclean.strip_boilerplate_lines(
            fresh, min_docs=4, boilerplate=inv
        ).collect()
        assert out[0]["text"] == "new body"


class TestPiiScrub:
    def test_counts_and_tokens(self, spark):
        df = spark.createDataFrame(
            [
                (1, "mail a.b+c@ex-ample.org or x@y.io, server 10.0.0.7"),
                (2, "call +49 30 1234 567 now"),
                (3, "nothing here"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in webclean.pii_scrub(df).collect()}
        assert out[1]["n_email"] == 2 and out[1]["n_ipv4"] == 1
        assert out[1]["text_scrubbed"] == "mail <EMAIL> or <EMAIL>, server <IP>"
        assert out[2]["n_phone"] == 1 and "<PHONE>" in out[2]["text_scrubbed"]
        assert out[3]["text_scrubbed"] == "nothing here"
        assert out[3]["n_email"] == out[3]["n_ipv4"] == out[3]["n_phone"] == 0

    def test_email_domain_not_double_counted_as_ip(self, spark):
        # dotted quad inside an email's domain: consumed by the email pass
        # first, so the ipv4 pass never sees it
        df = spark.createDataFrame(
            [(1, "u@10.0.0.7.example.com end")], "doc_id long, text string"
        )
        r = webclean.pii_scrub(df).collect()[0]
        assert r["n_email"] == 1 and r["n_ipv4"] == 0
        assert r["text_scrubbed"] == "<EMAIL> end"


class TestSampling:
    def test_threshold_edges(self):
        assert sampling.rate_to_threshold(0.0) == "0" * 16
        assert sampling.rate_to_threshold(1.0) == "g"  # above every hex prefix
        assert sampling.rate_to_threshold(0.5) == "8000000000000000"

    def test_deterministic_and_nested(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"] for r in sampling.hash_sample(df, 0.25).collect()}
        b = {r["doc_id"] for r in sampling.hash_sample(df, 0.25).collect()}
        assert a == b  # reproducible
        half = {r["doc_id"] for r in sampling.hash_sample(df, 0.5).collect()}
        assert a <= half  # lower rate is a subset of higher (same salt)
        assert 0.15 < len(a) / 2000 < 0.35  # near the nominal rate

    def test_stratified_rates(self, spark):
        rows = [(i, ["en", "de", "es"][i % 3]) for i in range(3000)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = sampling.stratified_sample(df, {"en": 1.0, "de": 0.5}, salt="t")
        by_lang = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert by_lang["en"] == 1000  # rate 1.0 keeps every row
        assert 350 < by_lang["de"] < 650
        assert "es" not in by_lang  # default_rate=0 drops unlisted strata


class TestPageRank:
    def _numpy_pagerank(self, edges, n_iter=3, d=0.85):
        nodes = sorted({u for e in edges for u in e})
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        pr = [1.0 / n] * n
        out = {v: 0 for v in nodes}
        for s, _ in edges:
            out[s] += 1
        for _ in range(n_iter):
            contrib = [0.0] * n
            for s, t in edges:
                contrib[idx[t]] += pr[idx[s]] / out[s]
            dangling = sum(pr[idx[v]] for v in nodes if out[v] == 0)
            pr = [(1 - d) / n + d * (c + dangling / n) for c in contrib]
        return dict(zip(nodes, pr))

    def test_matches_reference_implementation(self, spark):
        edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
        # e is dangling (dst only): exercises the redistribution term
        edges.append(("a", "e"))
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r["node"]: r["pagerank"]
            for r in graph.pagerank(df, iterations=3).collect()
        }
        want = self._numpy_pagerank(edges)
        assert got.keys() == want.keys()
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12)

    def test_ranks_sum_to_one(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "d")]
        df = spark.createDataFrame(edges, "src string, dst string")
        total = (
            graph.pagerank(df, iterations=4)
            .agg(F.sum("pagerank").alias("s"))
            .collect()[0]["s"]
        )
        assert total == pytest.approx(1.0, abs=1e-9)

    def test_degree_stats(self, spark):
        df = spark.createDataFrame(
            [("a", "b"), ("a", "b"), ("b", "c")], "src string, dst string"
        )
        out = {r["node"]: r for r in graph.degree_stats(df).collect()}
        assert (out["a"]["out_deg"], out["a"]["in_deg"]) == (2, 0)
        assert (out["b"]["out_deg"], out["b"]["in_deg"]) == (1, 2)
        assert (out["c"]["out_deg"], out["c"]["in_deg"]) == (0, 1)


class TestCollocations:
    def test_pmi_exact(self, spark):
        # corpus: 'x y' always together; 'p'/'q' never adjacent
        df = spark.createDataFrame(
            [(1, "x y p"), (2, "x y q"), (3, "q p x y")],
            "doc_id long, text string",
        )
        out = {
            (r["w1"], r["w2"]): r
            for r in textstats.collocations(df, min_count=2).collect()
        }
        r = out[("x", "y")]
        assert r["n_pair"] == 3 and r["n_w1"] == 3 and r["n_w2"] == 3
        # n_tokens=10, n_bigrams=7: pmi = ln((3/7)/((3/10)^2))
        assert r["pmi"] == pytest.approx(math.log((3 / 7) / (0.3 * 0.3)), abs=1e-12)
        assert ("p", "q") not in out  # below min_count

    def test_bigram_never_crosses_documents(self, spark):
        df = spark.createDataFrame(
            [(1, "a b"), (2, "b a"), (3, "a b"), (4, "b a")],
            "doc_id long, text string",
        )
        out = textstats.collocations(df, min_count=1).collect()
        counts = {(r["w1"], r["w2"]): r["n_pair"] for r in out}
        assert counts == {("a", "b"): 2, ("b", "a"): 2}


class TestIncrementalDedup:
    def test_bootstrap_then_increment(self, spark):
        batch1 = spark.createDataFrame(
            [(1, "same text"), (2, "Same  TEXT"), (3, "unique one")],
            "doc_id long, text string",
        )
        first = dedup.incremental_dedup(batch1, None)
        got1 = {r["doc_id"] for r in first.collect()}
        assert got1 == {1, 3}  # within-batch canonical-min

        seen = first.select("content_hash")
        batch2 = spark.createDataFrame(
            [(10, "same text"), (11, "brand new"), (12, "brand  NEW")],
            "doc_id long, text string",
        )
        got2 = {r["doc_id"] for r in dedup.incremental_dedup(batch2, seen).collect()}
        assert got2 == {11}  # 10 seen in history, 12 collapsed into 11

    def test_carries_full_row(self, spark):
        batch = spark.createDataFrame(
            [(1, "t", "en")], "doc_id long, text string, lang string"
        )
        row = dedup.incremental_dedup(batch, None).collect()[0]
        assert row["lang"] == "en" and row["content_hash"]


class TestSessionize:
    def _events(self, spark):
        from datetime import datetime as dt

        rows = [
            # user 1: two sessions split by a 2h gap (threshold 30 min)
            (1, 100, dt(2024, 1, 1, 10, 0, 0)),
            (2, 100, dt(2024, 1, 1, 10, 10, 0)),
            (3, 100, dt(2024, 1, 1, 12, 30, 0)),
            # user 2: one event
            (4, 200, dt(2024, 1, 1, 9, 0, 0)),
            # user 1 again: exactly-at-threshold gap does NOT split (> not >=)
            (5, 100, dt(2024, 1, 1, 13, 0, 0)),
        ]
        return spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp"
        )

    def test_gap_splits_sessions(self, spark):
        from wikdict_gen_spark.operators import sessions

        out = sessions.sessionize(self._events(spark), gap_seconds=1800).collect()
        idx = {r["event_id"]: r["session_idx"] for r in out}
        assert idx[1] == 0 and idx[2] == 0  # 10-min gap: same session
        assert idx[3] == 1  # 2h20 gap: new session
        assert idx[5] == 1  # 30:00 gap == threshold: NOT a new session
        assert idx[4] == 0

    def test_timestamp_tie_is_deterministic(self, spark):
        from datetime import datetime as dt

        from wikdict_gen_spark.operators import sessions

        rows = [(i, 1, dt(2024, 1, 1, 10, 0, 0)) for i in range(5)]
        df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
        out = sessions.session_stats(df, gap_seconds=60).collect()
        assert len(out) == 1 and out[0]["n_events"] == 5
        assert out[0]["duration_s"] == 0

    def test_session_stats(self, spark):
        from wikdict_gen_spark.operators import sessions

        out = {
            (r["user_id"], r["session_idx"]): r
            for r in sessions.session_stats(
                self._events(spark), gap_seconds=1800
            ).collect()
        }
        assert out[(100, 0)]["n_events"] == 2
        assert out[(100, 0)]["duration_s"] == 600
        assert out[(100, 1)]["n_events"] == 2  # events 3 and 5
        assert out[(200, 0)]["n_events"] == 1


class TestBM25:
    def test_hand_computed(self, spark):
        from wikdict_gen_spark.operators import ranking

        docs = spark.createDataFrame(
            [(1, "cat dog"), (2, "cat cat cat fish"), (3, "bird fish")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["score"]
            for r in ranking.bm25_scores(docs, ["cat"], k1=1.2, b=0.75).collect()
        }
        # N=3, df(cat)=2, idf = ln((3-2+0.5)/(2+0.5)+1); avgdl = 8/3
        idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)

        def s(tf, dl):
            return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (8 / 3)))

        assert got.keys() == {1, 2}  # doc 3 has no query term
        assert got[1] == pytest.approx(s(1, 2), abs=1e-12)
        assert got[2] == pytest.approx(s(3, 4), abs=1e-12)
        assert got[2] > got[1]  # higher tf wins at comparable length

    def test_duplicate_query_terms_score_once(self, spark):
        from wikdict_gen_spark.operators import ranking

        docs = spark.createDataFrame(
            [(1, "cat dog"), (2, "dog dog")], "doc_id long, text string"
        )
        a = {r["doc_id"]: r["score"]
             for r in ranking.bm25_scores(docs, ["dog"]).collect()}
        b = {r["doc_id"]: r["score"]
             for r in ranking.bm25_scores(docs, ["dog", "dog"]).collect()}
        assert a == b

    def test_empty_query_terms_raise_cleanly(self, spark):
        from wikdict_gen_spark.operators import ranking

        docs = spark.createDataFrame([(1, "cat")], "doc_id long, text string")
        with pytest.raises(ValueError, match="non-empty"):
            ranking.bm25_scores(docs, [])

    def test_rare_term_outscores_common(self, spark):
        from wikdict_gen_spark.operators import ranking

        rows = [(i, "common filler words") for i in range(1, 10)]
        rows.append((10, "common rare"))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["score"]
            for r in ranking.bm25_scores(docs, ["common", "rare"]).collect()
        }
        # doc 10 matches both; the rare term's idf dominates
        assert got[10] > max(v for k, v in got.items() if k != 10)


class TestDuplicatedSpans:
    def test_planted_template(self, spark):
        from wikdict_gen_spark.operators import dedup

        template = "all rights reserved by the site"
        docs = spark.createDataFrame(
            [
                (1, f"unique alpha words here {template}"),
                (2, f"{template} other beta content entirely"),
                (3, "nothing shared with anyone at all today"),
                (4, "tiny"),  # < k tokens: zero spans
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in dedup.duplicated_span_stats(docs, k=6, min_docs=2).collect()
        }
        # the 6-token template yields exactly one shared 6-gram per doc
        assert out[1]["n_dup_spans"] == 1 and out[2]["n_dup_spans"] == 1
        assert out[3]["n_dup_spans"] == 0
        assert out[4]["n_spans"] == 0 and out[4]["dup_span_frac"] == 0.0
        assert out[1]["dup_span_frac"] == 1 / out[1]["n_spans"]

    def test_within_doc_repeat_not_cross_doc(self, spark):
        from wikdict_gen_spark.operators import dedup

        # the same span twice in ONE doc: count(DISTINCT doc) = 1 < 2
        docs = spark.createDataFrame(
            [(1, "x y z w x y z w"), (2, "a b c d e f g h")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in dedup.duplicated_span_stats(docs, k=4, min_docs=2).collect()
        }
        assert out[1]["n_dup_spans"] == 0 and out[2]["n_dup_spans"] == 0


class TestContamination:
    def test_planted_benchmark_overlap(self, spark):
        from wikdict_gen_spark.operators import dedup

        eval_q = "what is the capital of france in europe"
        bench = spark.createDataFrame([(eval_q,)], "text string")
        docs = spark.createDataFrame(
            [
                (1, f"trivia dump says {eval_q} and more filler text"),
                (2, "clean document with entirely original phrasing inside"),
                (3, "short doc"),  # < k tokens: zero spans
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in dedup.contamination_stats(docs, bench, k=6).collect()
        }
        # the 8-token eval question contributes 3 shared 6-grams to doc 1
        assert out[1]["is_contaminated"] == 1 and out[1]["n_contam_spans"] == 3
        assert out[2]["is_contaminated"] == 0 and out[2]["n_contam_spans"] == 0
        assert out[3]["n_spans"] == 0 and out[3]["is_contaminated"] == 0
        assert out[1]["contam_frac"] == 3 / out[1]["n_spans"]

    def test_min_hits_threshold(self, spark):
        from wikdict_gen_spark.operators import dedup

        bench = spark.createDataFrame(
            [("alpha beta gamma delta epsilon zeta",)], "text string"
        )
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta trailing words here")],
            "doc_id long, text string",
        )
        # exactly one shared 6-gram: flagged at min_hits=1, clean at 2
        one = dedup.contamination_stats(docs, bench, k=6, min_hits=1).collect()[0]
        two = dedup.contamination_stats(docs, bench, k=6, min_hits=2).collect()[0]
        assert one["n_contam_spans"] == 1
        assert one["is_contaminated"] == 1 and two["is_contaminated"] == 0

    def test_shuffle_join_path_matches_broadcast(self, spark):
        from wikdict_gen_spark.operators import dedup

        bench = spark.createDataFrame(
            [("one two three four five six seven",)], "text string"
        )
        docs = spark.createDataFrame(
            [(1, "zero one two three four five six seven eight"),
             (2, "none of these words match anything benchmarked at all")],
            "doc_id long, text string",
        )
        a = sorted(
            dedup.contamination_stats(docs, bench, k=6).collect(),
            key=lambda r: r["doc_id"],
        )
        b = sorted(
            dedup.contamination_stats(
                docs, bench, k=6, broadcast_inventory=False
            ).collect(),
            key=lambda r: r["doc_id"],
        )
        assert [r.asDict() for r in a] == [r.asDict() for r in b]


class TestUrlCanonicalization:
    def _canon(self, spark, urls):
        from wikdict_gen_spark.operators.webclean import canonicalize_urls

        df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                                   "doc_id long, url string")
        rows = canonicalize_urls(df).orderBy("doc_id").collect()
        return [(r["canonical_url"], r["host"]) for r in rows]

    def test_rules(self, spark):
        got = self._canon(spark, [
            "HTTPS://WWW.Site.COM:443/A/b/?utm_source=x&q=1&fbclid=z#top",
            "http://site.com:80/",
            "https://site.com:8443/keep-port",
            "https://site.com/p?utm_a=1&utm_b=2",   # query empties -> no '?'
            "https://site.com",                      # empty path -> '/'
            "  https://site.com/x//  ",              # trim + multi trailing slash
            "not a url at all",                      # passthrough (trimmed)
            "ftp://Mixed.Case/path:80",              # non-http: port untouched
        ])
        assert got[0] == ("https://www.site.com/A/b?q=1", "www.site.com")
        assert got[1] == ("http://site.com/", "site.com")
        assert got[2] == ("https://site.com:8443/keep-port", "site.com:8443")
        assert got[3] == ("https://site.com/p", "site.com")
        assert got[4] == ("https://site.com/", "site.com")
        assert got[5] == ("https://site.com/x", "site.com")
        assert got[6] == ("not a url at all", "")
        assert got[7] == ("ftp://mixed.case/path:80", "mixed.case")

    def test_param_order_and_ref_exactness(self, spark):
        # remaining params keep order; 'ref' drops only as the WHOLE name
        got = self._canon(spark, [
            "https://h/p?b=2&ref=x&a=1&referrer=keep&gclid=g",
        ])
        assert got[0][0] == "https://h/p?b=2&a=1&referrer=keep"

    def test_host_stats_dup_rate(self, spark):
        from wikdict_gen_spark.operators.webclean import host_stats

        df = spark.createDataFrame(
            [
                (1, "https://a.com/x?utm_source=1"),
                (2, "https://a.com/x#frag"),        # same canonical as 1
                (3, "https://a.com/y"),
                (4, "https://b.com/only"),
            ],
            "doc_id long, url string",
        )
        out = {r["host"]: r for r in host_stats(df).collect()}
        a = out["a.com"]
        assert a["n_pages"] == 3 and a["n_urls"] == 2 and a["dup_rate"] == 1 / 3
        assert out["b.com"]["dup_rate"] == 0.0


class TestRemoveDuplicatedSpans:
    def test_template_excised_everywhere(self, spark):
        from wikdict_gen_spark.operators import dedup

        tpl = "all rights reserved by site"
        docs = spark.createDataFrame(
            [
                (1, f"intro words {tpl} then unique tail one"),
                (2, f"{tpl} and other fresh content here"),
                (3, "totally unrelated text with nothing shared at all"),
                (4, "tiny"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in dedup.remove_duplicated_spans(docs, k=5, min_docs=2).collect()
        }
        # the shared 5-gram vanishes from BOTH docs (no canonical survives)
        assert out[1]["text_clean"] == "intro words then unique tail one"
        assert out[2]["text_clean"] == "and other fresh content here"
        assert out[1]["n_removed"] == 5 and out[2]["n_removed"] == 5
        assert out[3]["n_removed"] == 0
        assert out[4]["text_clean"] == "tiny" and out[4]["n_removed"] == 0

    def test_overlapping_spans_merge_coverage(self, spark):
        from wikdict_gen_spark.operators import dedup

        # a 6-token shared run yields two overlapping frequent 5-grams;
        # coverage merges: 6 tokens removed, not 10
        run = "a b c d e f"
        docs = spark.createDataFrame(
            [(1, f"x {run} y"), (2, f"p {run} q")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in dedup.remove_duplicated_spans(docs, k=5, min_docs=2).collect()
        }
        assert out[1]["n_removed"] == 6 and out[1]["text_clean"] == "x y"
        assert out[2]["n_removed"] == 6 and out[2]["text_clean"] == "p q"

    def test_stats_and_removal_agree(self, spark):
        """n_removed > 0 exactly where duplicated_span_stats flags spans."""
        from wikdict_gen_spark.operators import dedup

        docs = spark.createDataFrame(
            [
                (1, "shared prefix tokens run here plus own words alpha"),
                (2, "shared prefix tokens run here plus own words beta"),
                (3, "independent content entirely its own thing gamma delta"),
            ],
            "doc_id long, text string",
        )
        stats = {
            r["doc_id"]: r["n_dup_spans"]
            for r in dedup.duplicated_span_stats(docs, k=5, min_docs=2).collect()
        }
        removed = {
            r["doc_id"]: r["n_removed"]
            for r in dedup.remove_duplicated_spans(docs, k=5, min_docs=2).collect()
        }
        for d in stats:
            assert (stats[d] > 0) == (removed[d] > 0)


class TestPackOffsets:
    def test_prefix_sum_and_chunk_ranges(self, spark):
        from wikdict_gen_spark.operators.packing import pack_offsets

        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * (3 + i % 4))) for i in range(50)],
            "doc_id long, text string",
        )
        rows = pack_offsets(docs, max_tokens=10).orderBy("doc_id").collect()
        off = 0
        for r in rows:
            nt = 3 + r["doc_id"] % 4
            assert r["n_tokens"] == nt
            assert r["start_offset"] == off
            assert r["seq_start"] == off // 10
            assert r["seq_end"] == (off + nt - 1) // 10
            off += nt

    def test_no_single_task_window(self, spark):
        """The executed plan must not contain a global (empty-partition-key)
        window — the whole point of the two-phase prefix sum."""
        from wikdict_gen_spark.operators.packing import pack_offsets

        docs = spark.createDataFrame(
            [(i, "a b c") for i in range(100)], "doc_id long, text string"
        )
        df = pack_offsets(docs, max_tokens=8)
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Window" in line and "windowspecdefinition" in line:
                assert "__pid" in line, f"global window found: {line[:160]}"

    def test_straddling_document_spans_sequences(self, spark):
        from wikdict_gen_spark.operators.packing import pack_offsets

        docs = spark.createDataFrame(
            [(1, " ".join(["a"] * 7)), (2, " ".join(["b"] * 7))],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in pack_offsets(docs, max_tokens=10).collect()}
        assert (out[1]["seq_start"], out[1]["seq_end"]) == (0, 0)
        # doc 2 occupies offsets 7..13 -> straddles sequences 0 and 1
        assert (out[2]["seq_start"], out[2]["seq_end"]) == (0, 1)


class TestTemperatureSampling:
    def test_rates_math(self):
        from wikdict_gen_spark.operators.sampling import temperature_rates

        # T=1: natural shares -> every rate is target/total
        r = temperature_rates({"a": 800, "b": 200}, temperature=1.0,
                              target_total=100)
        assert r["a"] == 100 * 0.8 / 800 and r["b"] == 100 * 0.2 / 200
        # T -> large flattens: the small stratum's rate rises toward cap
        hot = temperature_rates({"a": 800, "b": 200}, 100.0, 100)
        assert hot["b"] > r["b"] and hot["a"] < r["a"]
        # rate caps at 1.0 when the target share exceeds the stratum
        # (high T pushes the tiny stratum toward a uniform share)
        cap = temperature_rates({"a": 10, "b": 10000}, 100.0, 20000)
        assert cap["a"] == 1.0
        # low T sharpens toward the head instead: the big stratum caps
        sharp = temperature_rates({"a": 10, "b": 10000}, 0.5, 20000)
        assert sharp["b"] == 1.0 and sharp["a"] < 0.01
        # zero-count stratum keeps nothing
        assert temperature_rates({"a": 0, "b": 5}, 1.0, 3)["a"] == 0.0

    def test_rates_exact_path_overflow_guard(self):
        import pytest

        from wikdict_gen_spark.operators.sampling import temperature_rates

        # integral-alpha operands past 2^53 lose cross-engine bit parity;
        # the exact path must refuse loudly rather than silently drift
        with pytest.raises(ValueError, match="2\\^53"):
            temperature_rates({"a": 2**30}, temperature=0.5,
                              target_total=2**30)
        # same magnitudes on the float path (non-integral alpha) are fine
        assert temperature_rates({"a": 2**30}, 0.4, 2**30)["a"] == 1.0

    def test_sample_is_deterministic_and_balanced(self, spark):
        from wikdict_gen_spark.operators.sampling import temperature_sample

        docs = spark.createDataFrame(
            [(i, "en" if i < 900 else "de") for i in range(1000)],
            "doc_id long, lang string",
        )
        a = {r["doc_id"] for r in
             temperature_sample(docs, 2.0, 300, key_col="doc_id").collect()}
        b = {r["doc_id"] for r in
             temperature_sample(docs, 2.0, 300, key_col="doc_id").collect()}
        assert a == b
        # T=2 upsamples the minority lang relative to natural share
        de = sum(1 for i in a if i >= 900)
        assert de / max(len(a), 1) > 0.1  # natural share is 0.1


class TestCdcChunks:
    def _chunks(self, spark, docs):
        from collections import defaultdict
        from wikdict_gen_spark.operators import dedup

        by = defaultdict(list)
        for r in dedup.cdc_chunks(docs, avg_chunk_tokens=16).collect():
            by[r["doc_id"]].append((r["chunk_idx"], r["chunk_hash"], r["n_tokens"]))
        return {d: sorted(v) for d, v in by.items()}

    def test_boundaries_resync_after_insertion(self, spark):
        import random

        random.seed(7)
        words = [f"tok{random.randrange(10**6)}" for _ in range(200)]
        docs = spark.createDataFrame(
            [(1, " ".join(words)),
             (2, " ".join(["inserted", "words", "here"] + words))],
            "doc_id long, text string",
        )
        by = self._chunks(spark, docs)
        h1 = {h for _, h, _ in by[1]}
        h2 = {h for _, h, _ in by[2]}
        # token conservation through the chunking
        assert sum(n for *_, n in by[1]) == 200
        assert sum(n for *_, n in by[2]) == 203
        # a 3-token PREFIX insertion leaves the vast majority of chunk
        # hashes intact (boundaries re-synchronize) — fixed-size blocks
        # would share none
        assert len(h1 & h2) >= len(h1) - 2

    def test_chunk_reassembly_and_determinism(self, spark):
        import random

        random.seed(11)
        words = [f"w{random.randrange(10**6)}" for _ in range(120)]
        docs = spark.createDataFrame(
            [(1, " ".join(words))], "doc_id long, text string"
        )
        from wikdict_gen_spark.operators import dedup

        a = self._chunks(spark, docs)[1]
        b = self._chunks(spark, docs)[1]
        assert a == b  # content-defined => deterministic
        # contiguous 0-based chunk indices
        assert [i for i, _, _ in a] == list(range(len(a)))

    def test_tiny_docs_single_chunk(self, spark):
        docs = spark.createDataFrame(
            [(1, "one"), (2, "two words")], "doc_id long, text string"
        )
        by = self._chunks(spark, docs)
        assert len(by[1]) == 1 and by[1][0][2] == 1
        assert len(by[2]) == 1 and by[2][0][2] == 2


class TestChunkDupStats:
    def test_shared_run_detected_at_different_offsets(self, spark):
        """The CDC advantage: the same long run is flagged even when it
        sits at different token offsets in different docs."""
        import random

        random.seed(3)
        shared = " ".join(f"s{random.randrange(10**6)}" for _ in range(60))
        u1 = " ".join(f"a{random.randrange(10**6)}" for _ in range(37))
        u2 = " ".join(f"b{random.randrange(10**6)}" for _ in range(11))
        docs = spark.createDataFrame(
            [(1, f"{u1} {shared}"), (2, f"{u2} {shared}"),
             (3, " ".join(f"c{random.randrange(10**6)}" for _ in range(80)))],
            "doc_id long, text string",
        )
        from wikdict_gen_spark.operators import dedup

        out = {
            r["doc_id"]: r
            for r in dedup.chunk_dup_stats(docs, avg_chunk_tokens=16).collect()
        }
        # interior chunks of the shared run re-synchronize in both docs
        assert out[1]["n_dup_chunks"] >= 1 and out[2]["n_dup_chunks"] >= 1
        assert out[3]["n_dup_chunks"] == 0
        assert out[1]["dup_chunk_frac"] == (
            out[1]["n_dup_chunks"] / out[1]["n_chunks"]
        )
