"""Tests for the training-data operators: dedup, similarity, text analysis."""

import math

import pytest
from pyspark.sql import functions as F

from wikdict_gen_spark.operators import corpus, dedup, similarity, textstats

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "The  quick brown fox jumps over the lazy dog", "en"),  # ws/case dup of 1
    (3, "the quick brown fox jumps over the lazy cat today", "en"),  # near-dup
    (4, "der schnelle braune fuchs springt und ist nicht langsam", "de"),
    (5, "completely different content about spark engines and data", "en"),
    (6, "le chat est sur la table et il ne dort pas", "fr"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


class TestDedup:
    def test_exact(self, docs, spark):
        out = dedup.exact_dedup(docs).collect()
        by_id = {r["doc_id"]: r["n_dups"] for r in out}
        assert by_id[1] == 2  # doc 2 collapsed into doc 1
        assert 2 not in by_id
        assert by_id[3] == 1

    def test_minhash_lsh_finds_near_dup(self, docs):
        sh = dedup.shingles(docs, k=2)
        sig = dedup.minhash_signatures(sh, num_hashes=16)
        pairs = dedup.lsh_candidate_pairs(sig, num_hashes=16, bands=8).collect()
        pair_set = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 2) in pair_set
        assert (1, 3) in pair_set or (2, 3) in pair_set
        assert (4, 5) not in pair_set

    def test_minhash_compact_same_collisions(self, docs):
        """compact=True (xxhash64 longs, the production wire shape) feeds the
        same banding contract and still collides normalized dups."""
        sh = dedup.shingles(docs, k=2)
        sig = dedup.minhash_signatures(sh, num_hashes=16, compact=True)
        assert dict(sig.dtypes)["minhash"] == "array<bigint>"
        pairs = dedup.lsh_candidate_pairs(sig, num_hashes=16, bands=8).collect()
        pair_set = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (1, 2) in pair_set
        assert (4, 5) not in pair_set

    def test_minhash_inline_equals_table_path(self, docs):
        """The row-local HOF signature path must agree value-for-value
        with the shingle-table path, in both hash shapes."""
        sh = dedup.shingles(docs, k=3)
        for compact in (False, True):
            table = {
                r["doc_id"]: list(r["minhash"])
                for r in dedup.minhash_signatures(
                    sh, num_hashes=8, compact=compact
                ).collect()
            }
            inline = {
                r["doc_id"]: list(r["minhash"])
                for r in dedup.minhash_signatures_inline(
                    docs, k=3, num_hashes=8, compact=compact
                ).collect()
            }
            assert inline == table

    def test_lsh_max_bucket_size_clique_collapse(self, spark):
        """A planted mega-bucket (30 docs sharing one boilerplate trunk)
        collapses to (bucket-min, member) pairs under max_bucket_size,
        while small buckets keep the exact all-pairs list."""
        trunk = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [(i, f"{trunk} tail{i}") for i in range(30)]
        rows += [(100, "totally different text one here"),
                 (101, "totally different text one here")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        sh = dedup.shingles(docs, k=3)
        sig = dedup.minhash_signatures(sh, num_hashes=4, compact=False)
        capped = {
            (r["id_a"], r["id_b"])
            for r in dedup.lsh_candidate_pairs(
                sig, num_hashes=4, bands=2, max_bucket_size=10
            ).collect()
        }
        full = {
            (r["id_a"], r["id_b"])
            for r in dedup.lsh_candidate_pairs(sig, num_hashes=4, bands=2).collect()
        }
        # the small exact-dup bucket is identical in both shapes
        assert (100, 101) in capped and (100, 101) in full
        # collapse is lossless for the greedy smaller-id-wins drop rule:
        # the droppable set (docs appearing as id_b) is identical...
        mega_capped = {p for p in capped if p[1] < 100}
        mega_full = {p for p in full if p[1] < 100}
        assert {b for _, b in mega_capped} == {b for _, b in mega_full}
        # ...while the member-member cross product is gone: only the
        # per-band bucket minima remain as id_a (<= bands of them), and
        # the pair count drops from quadratic to linear in bucket size
        assert len({a for a, _ in mega_capped}) <= 2
        assert len(mega_full) > 400 and len(mega_capped) < 2 * 30
        # cap larger than every bucket == exact behavior
        uncapped = {
            (r["id_a"], r["id_b"])
            for r in dedup.lsh_candidate_pairs(
                sig, num_hashes=4, bands=2, max_bucket_size=1000
            ).collect()
        }
        assert uncapped == full

    def test_near_dup_clusters_transitive(self, spark):
        """A~B and B~C verified but A-C below threshold: clustering must
        still put all three in one component (the greedy rule's gap)."""
        # A/B differ in the last 3 words (jaccard 15/21 = 0.71), B/C in
        # the first 4 (14/22 = 0.64); A/C differ in both ends: 11/25 =
        # 0.44 < threshold — only the transitive closure links A to C
        a = " ".join(f"w{i}" for i in range(20))
        b = " ".join((f"w{i}" if i < 17 else f"x{i}") for i in range(20))
        c = " ".join((f"y{i}" if i < 4 else (f"w{i}" if i < 17 else f"x{i}"))
                     for i in range(20))
        rows = [(1, a), (2, b), (3, c),
                (10, "completely different text about spark engines"),
                (11, "another unrelated document about benchmarks")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["cluster_id"]
               for r in dedup.near_dup_clusters(
                   docs, jaccard_threshold=0.5, num_hashes=8, bands=4
               ).collect()}
        assert out[1] == out[2] == out[3] == 1
        assert out[10] == 10 and out[11] == 11
        # sanity: A-C alone is BELOW the threshold (the transitive case)
        pairs = spark.createDataFrame([(1, 3)], "id_a long, id_b long")
        j = dedup.ngram_jaccard(docs, pairs, k=3).collect()
        assert not j or j[0]["jaccard"] < 0.5

    def test_ngram_jaccard(self, docs, spark):
        pairs = spark.createDataFrame([(1, 2), (1, 5)], "id_a long, id_b long")
        out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup.ngram_jaccard(docs, pairs).collect()}
        assert out[(1, 2)] == pytest.approx(1.0)
        assert (1, 5) not in out or out[(1, 5)] < 0.2

    def test_embedding_near_dups(self, spark):
        """Planted jittered copies: exact finds them, LSH finds a subset
        that still includes the planted near-dup pairs."""
        import random

        rng = random.Random(7)
        base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(6)]
        rows = []
        for i, v in enumerate(base):
            rows.append((i * 2, [float(x) for x in v]))
            # close copy: tiny jitter -> cosine ~0.999
            rows.append((i * 2 + 1, [float(x + rng.uniform(-0.02, 0.02)) for x in v]))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        planted = {(i * 2, i * 2 + 1) for i in range(6)}
        exact = {
            (r["id_a"], r["id_b"])
            for r in dedup.embedding_near_dups(emb, 0.95, method="exact").collect()
        }
        assert planted <= exact
        lsh = {
            (r["id_a"], r["id_b"])
            for r in dedup.embedding_near_dups(
                emb, 0.95, method="lsh", dim=16, n_planes=4
            ).collect()
        }
        assert lsh <= exact  # bucket path never invents pairs
        assert planted <= lsh  # jittered copies share the sign signature

    def test_embedding_near_dups_band_amplification(self, spark):
        """OR-amplified banding: more bands never loses pairs (recall is
        monotone in n_bands), every band count stays a subset of exact,
        and exhaustive banding at few planes recovers pairs a single
        band misses."""
        import random

        rng = random.Random(11)
        base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(12)]
        rows = []
        for i, v in enumerate(base):
            rows.append((i * 2, [float(x) for x in v]))
            rows.append((i * 2 + 1, [float(x + rng.uniform(-0.1, 0.1)) for x in v]))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        exact = {
            (r["id_a"], r["id_b"])
            for r in dedup.embedding_near_dups(emb, 0.9, method="exact").collect()
        }
        found = {}
        for n_bands in (1, 2, 4):
            found[n_bands] = {
                (r["id_a"], r["id_b"])
                for r in dedup.embedding_near_dups(
                    emb, 0.9, method="lsh", dim=16, n_planes=6, n_bands=n_bands
                ).collect()
            }
            assert found[n_bands] <= exact
        assert found[1] <= found[2] <= found[4]

    def test_simhash_near_dups_close(self, docs):
        sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
        def hamming(a, b):
            return sum(x != y for x, y in zip(a, b))
        assert hamming(sig[1], sig[2]) == 0
        assert hamming(sig[1], sig[3]) <= hamming(sig[1], sig[5])


class TestSimilarity:
    def test_brute_force_topk_self_is_nearest(self, spark):
        import random

        rng = random.Random(7)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        queries = spark.createDataFrame(rows[:3], "query_id long, embedding array<double>")
        out = similarity.brute_force_topk(emb, queries, k=3)
        top1 = {r["query_id"]: r["vec_id"] for r in out.where(F.col("rank") == 1).collect()}
        for q in range(3):
            assert top1[q] == q  # cosine(self) == 1

    def test_lsh_topk_subset_of_bucket(self, spark):
        import random

        rng = random.Random(7)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        queries = spark.createDataFrame(rows[:3], "query_id long, embedding array<double>")
        out = similarity.lsh_topk(emb, queries, dim=8, k=3, n_planes=4)
        top1 = {r["query_id"]: r["vec_id"] for r in out.where(F.col("rank") == 1).collect()}
        for q in range(3):
            assert top1[q] == q  # identical vector always shares the bucket

    def test_lsh_multiprobe_recall_monotone(self, spark):
        """Margin-ordered multi-probe: more probes -> recall of the exact
        top-1 never drops, and probe-1 results are a subset of probe-4."""
        import random

        rng = random.Random(11)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        # query with vectors NOT in the table (perturbed copies) so the
        # nearest neighbor can land across a bucket boundary
        qrows = [
            (i, [x + rng.uniform(-0.05, 0.05) for x in rows[i][1]])
            for i in range(30)
        ]
        queries = spark.createDataFrame(qrows, "query_id long, embedding array<double>")
        exact = {
            r["query_id"]: r["vec_id"]
            for r in similarity.brute_force_topk(emb, queries, k=1)
            .where(F.col("rank") == 1).collect()
        }

        def run(n_probes):
            out = similarity.lsh_topk(
                emb, queries, dim=8, k=1, n_planes=6, n_probes=n_probes
            ).where(F.col("rank") == 1).collect()
            return {r["query_id"]: r["vec_id"] for r in out}

        r1, r4 = run(1), run(4)
        recall1 = sum(r1.get(q) == v for q, v in exact.items())
        recall4 = sum(r4.get(q) == v for q, v in exact.items())
        assert recall4 >= recall1
        assert recall4 > 0
        # every query answered at probe 1 is still answered at probe 4
        assert set(r1) <= set(r4)

    def test_ivf_topk_self_and_recall(self, spark):
        """IVF: a vector queried against its own table always finds itself
        (it probes its own cell first), and probing more cells never
        loses queries while recovering most exact top-1s on a clustered
        corpus."""
        import random

        rng = random.Random(23)
        # clustered corpus: 8 centers x 30 jittered members
        centers = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(8)]
        rows = [
            (c * 30 + j, [x + rng.uniform(-0.15, 0.15) for x in centers[c]])
            for c in range(8)
            for j in range(30)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        queries = spark.createDataFrame(
            rows[:5], "query_id long, embedding array<double>"
        )
        out = similarity.ivf_topk(emb, queries, n_centroids=8, n_probes=1, k=3)
        top1 = {
            r["query_id"]: r["vec_id"]
            for r in out.where(F.col("rank") == 1).collect()
        }
        for q in range(5):
            assert top1[q] == q  # self is in the probed cell

        # held-out perturbed queries: exact-top1 recall at 4 probes on a
        # clustered corpus must be high, and probe sets must be monotone
        qrows = [
            (i, [x + rng.uniform(-0.05, 0.05) for x in rows[i][1]])
            for i in range(0, 240, 8)
        ]
        held = spark.createDataFrame(qrows, "query_id long, embedding array<double>")
        exact = {
            r["query_id"]: r["vec_id"]
            for r in similarity.brute_force_topk(emb, held, k=1)
            .where(F.col("rank") == 1).collect()
        }
        cents = similarity.train_ivf_centroids(emb, n_centroids=8)

        def run(n_probes):
            return {
                r["query_id"]: r["vec_id"]
                for r in similarity.ivf_topk(
                    emb, held, centroids=cents, n_probes=n_probes, k=1
                ).where(F.col("rank") == 1).collect()
            }

        r1, r4 = run(1), run(4)
        recall1 = sum(r1.get(q) == v for q, v in exact.items())
        recall4 = sum(r4.get(q) == v for q, v in exact.items())
        assert recall4 >= recall1
        assert recall4 >= int(0.8 * len(exact))
        assert set(r1) <= set(r4)

    def test_ivf_centroids_deterministic(self, spark):
        import random

        import numpy as np

        rng = random.Random(5)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(100)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        c1 = similarity.train_ivf_centroids(emb, n_centroids=4)
        c2 = similarity.train_ivf_centroids(emb, n_centroids=4)
        assert np.array_equal(c1, c2)
        # unit rows (spherical k-means)
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


class TestCleanCorpus:
    def test_planted_cases(self, spark):
        """Each drop reason planted once: below-quality, exact dup,
        LSH-verified near-dup; the clean rest survives with quality and
        content_hash attached."""
        rows = [
            (1, "the quick brown fox jumps over the lazy dog and sleeps well"),
            (2, "The  quick brown fox jumps over the lazy dog and sleeps well"),
            # near-dup of 1: appended token -> Jaccard 0.909, and the
            # deterministic md5 minhash banding provably buckets the pair
            (3, "the quick brown fox jumps over the lazy dog and sleeps well tonight"),
            (4, "completely different content about spark engines and the data"),
            (5, "!!!!!!!!!!"),  # quality 0.25: too short, all punctuation
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in corpus.clean_corpus(
                docs, quality_min=0.5, jaccard_threshold=0.5,
                num_hashes=4, bands=2, k=3, compact=False,
            ).collect()
        }
        assert set(out) == {1, 4}          # 2 exact-dropped, 3 near-dropped, 5 low-quality
        assert out[1]["quality"] >= 0.5
        assert out[1]["content_hash"] != out[4]["content_hash"]
        # compact production path agrees on the survivor set
        out_compact = corpus.clean_corpus(
            docs, quality_min=0.5, jaccard_threshold=0.5,
            num_hashes=4, bands=2, k=3, compact=True,
        ).collect()
        assert {r["doc_id"] for r in out_compact} == {1, 4}


class TestTextStats:
    def test_token_count(self, docs):
        out = {r["doc_id"]: r["n_tokens"] for r in textstats.token_count(docs).collect()}
        assert out[1] == 9

    def test_language_id(self, docs):
        out = {r["doc_id"]: r["lang_pred"] for r in textstats.language_id(docs).collect()}
        assert out[1] == "en"
        assert out[4] == "de"
        assert out[6] == "fr"

    def test_quality_score_range(self, docs):
        out = textstats.quality_score(docs).collect()
        assert all(0.0 <= r["quality"] <= 1.0 for r in out)
        by_id = {r["doc_id"]: r["quality"] for r in out}
        assert by_id[1] >= 0.75  # clean english sentence

    def test_repetition_stats(self, spark):
        """Hand-computed Gopher repetition signals on planted docs."""
        rows = [
            # 4 lines, 'same line' repeated 3x (2 repeat occurrences):
            # dup_line_frac = 2/4; chars: 3*9+5=32 total, 9+5=14 distinct
            # -> dup_line_char_frac = 18/32
            (1, "same line\nsame line\nsame line\nother"),
            # "ha ha ha ha gut": run of 4 'ha' / 5 toks; bigrams:
            # 'ha ha' x3 of 4 -> top_bigram_frac = 0.75
            (2, "ha ha ha ha gut"),
            # no repetition anywhere
            (3, "all words differ here truly"),
            # degenerate: single token
            (4, "solo"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in textstats.repetition_stats(docs).collect()}
        assert out[1]["dup_line_frac"] == pytest.approx(2 / 4)
        assert out[1]["dup_line_char_frac"] == pytest.approx(18 / 32)
        assert out[2]["max_word_run_frac"] == pytest.approx(4 / 5)
        assert out[2]["top_bigram_frac"] == pytest.approx(3 / 4)
        assert out[3]["dup_line_frac"] == 0.0
        assert out[3]["top_bigram_frac"] == pytest.approx(1 / 4)  # all unique
        assert out[3]["max_word_run_frac"] == pytest.approx(1 / 5)
        assert all(out[4][c] == 0.0 for c in (
            "dup_line_frac", "dup_line_char_frac",
            "top_bigram_frac", "max_word_run_frac"))

    def test_fingerprint_dup_detection(self, docs):
        out = {r["doc_id"]: (r["fp_exact"], r["fp_winnow"]) for r in textstats.fingerprint(docs).collect()}
        assert out[1][0] == out[2][0]  # normalized exact dup
        assert out[1][1] == out[2][1]
        assert out[1][0] != out[5][0]


class TestSnapshotDiff:
    def test_three_statuses(self, spark):
        from wikdict_gen_spark.operators.materialize import snapshot_diff

        old = spark.createDataFrame(
            [("a", "p", "x"), ("b", "p", "y"), ("c", "p", "z")],
            "subj string, pred string, obj string",
        )
        new = spark.createDataFrame(
            [("b", "p", "y"), ("c", "p", "z"), ("d", "p", "w")],
            "subj string, pred string, obj string",
        )
        got = {
            (r["subj"], r["pred"], r["obj"]): r["status"]
            for r in snapshot_diff(old, new).collect()
        }
        assert got[("a", "p", "x")] == "removed"
        assert got[("d", "p", "w")] == "added"
        assert got[("b", "p", "y")] == got[("c", "p", "z")] == "kept"
        assert len(got) == 4

    def test_payload_change_is_kept(self, spark):
        """Diff identity is the triple key; non-key payload is ignored."""
        from wikdict_gen_spark.operators.materialize import snapshot_diff

        old = spark.createDataFrame(
            [("a", "p", "x", 0.1)], "subj string, pred string, obj string, score double"
        )
        new = spark.createDataFrame(
            [("a", "p", "x", 0.9)], "subj string, pred string, obj string, score double"
        )
        rows = snapshot_diff(old, new).collect()
        assert len(rows) == 1 and rows[0]["status"] == "kept"
