"""Tests for search / anomalies / dedup / similarity operators."""

import math

import pandas as pd
import pytest

from pyspark.sql import functions as F

from arkhammirror_spark.operators.anomalies import embedding_anomalies, zscore_anomalies
from arkhammirror_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
    simhash_neardup,
    verified_neardup_pairs,
)
from arkhammirror_spark.operators.search import (
    autocomplete,
    bm25_scores,
    hybrid_merge,
    hybrid_weights,
    regex_search,
    tokenize_col,
)
from arkhammirror_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucket_topk,
    pairwise_cosine_above,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "quick quick quick brown foxes everywhere today"),
        (3, "a completely unrelated sentence about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, "the quick brown fox jumps over the lazy cat today ok"),  # near dup
        (6, "email me at john.smith@example.com or call 555-123-4567 now"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


class TestBM25:
    def test_reference_formula(self, spark, docs):
        res = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["quick"]).collect()}
        # doc 2 has tf=3 → highest raw score → normalized 1.0
        assert res[2] == 1.0
        assert all(0 < v <= 1.0 for v in res.values())
        # manual check of the RSJ idf + bm25 for doc 2
        # corpus: 6 docs; 'quick' appears in docs 1,2,4,5 → df=4
        toks = {
            1: ["quick", "brown", "fox", "jumps", "over", "lazy", "dog"],
            2: ["quick", "quick", "quick", "brown", "foxes", "everywhere", "today"],
            3: ["completely", "unrelated", "sentence", "about", "spark", "engines"],
            4: ["quick", "brown", "fox", "jumps", "over", "lazy", "dog"],
            5: ["quick", "brown", "fox", "jumps", "over", "lazy", "cat", "today", "ok"],
            6: ["email", "me", "john", "smith", "example", "com", "call", "555", "123", "4567", "now"],
        }
        avg = sum(len(v) for v in toks.values()) / 6
        idf = math.log((6 - 4 + 0.5) / (4 + 0.5) + 1)

        def bm25(tf, dl):
            return idf * tf * 2.5 / (tf + 1.5 * (1 - 0.75 + 0.75 * dl / avg))

        expected = {d: bm25(toks[d].count("quick"), len(toks[d])) for d in (1, 2, 4, 5)}
        mx = max(expected.values())
        for d in (1, 2, 4, 5):
            assert abs(res[d] - expected[d] / mx) < 1e-9

    def test_stopwords_and_short_tokens_dropped(self, spark, docs):
        got = docs.select(tokenize_col(F.col("text")).alias("t")).where(
            F.col("doc_id").isNull() | True
        ).collect()
        flat = [t for r in got for t in r["t"]]
        assert "the" not in flat  # stopword
        assert all(len(t) > 1 for t in flat)


class TestRegexHybrid:
    def test_presets(self, spark, docs):
        emails = regex_search(docs, preset="email").collect()
        assert emails[0]["match_text"] == "john.smith@example.com"
        phones = regex_search(docs, preset="phone_us").collect()
        assert phones[0]["match_text"] == "555-123-4567"

    def test_hybrid_weights(self):
        assert hybrid_weights(384) == (0.5, 0.5)
        assert hybrid_weights(768) == (0.6, 0.4)
        assert hybrid_weights(2048) == (0.7, 0.3)
        assert hybrid_weights(None) == (0.6, 0.4)

    def test_hybrid_merge_full_outer(self, spark):
        sem = spark.createDataFrame([(1, 0.9), (2, 0.5)], "doc_id: long, score: double")
        kw = spark.createDataFrame([(2, 1.0), (3, 0.4)], "doc_id: long, score: double")
        got = {r["doc_id"]: r["hybrid_score"] for r in hybrid_merge(sem, kw, dimensions=768).collect()}
        assert abs(got[1] - 0.9 * 0.6) < 1e-12
        assert abs(got[2] - (0.5 * 0.6 + 1.0 * 0.4)) < 1e-12
        assert abs(got[3] - 0.4 * 0.4) < 1e-12

    def test_autocomplete(self, spark, docs):
        got = autocomplete(docs, "the quick").collect()
        assert len(got) == 3  # docs 1, 4, 5 share the prefix


class TestAnomalies:
    def test_zscore_flags_outlier(self, spark):
        rows = [(i, 100.0) for i in range(30)] + [(99, 500.0)]
        df = spark.createDataFrame(rows, "doc_id: long, n_chars: double")
        got = zscore_anomalies(df, ["n_chars"], threshold=3.0).collect()
        assert [r["doc_id"] for r in got] == [99]
        r = got[0]
        import statistics

        vals = [100.0] * 30 + [500.0]
        z = abs((500 - statistics.mean(vals)) / statistics.stdev(vals))
        assert abs(r["z_score"] - z) < 1e-9
        assert r["confidence"] == min(1.0, z / 5.0)

    def test_embedding_outlier(self, spark):
        rows = [(i, [1.0, 0.0, 0.0]) for i in range(20)] + [(99, [-5.0, 8.0, 2.0])]
        df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
        got = embedding_anomalies(df, threshold=3.0).collect()
        assert [r["vec_id"] for r in got] == [99]


class TestDedup:
    def test_exact(self, spark, docs):
        groups = exact_dedup(docs, "text", "doc_id").collect()
        dup = [g for g in groups if g["n_copies"] > 1]
        assert len(dup) == 1
        assert dup[0]["member_ids"] == [1, 4]
        assert dup[0]["keeper"] == 1

    def test_shingles_match_python(self, spark, docs):
        got = shingles(docs.where("doc_id = 1"), n=3).collect()
        text = "the quick brown fox jumps over the lazy dog"
        words = text.split()
        expected = {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
        assert {r["shingle"] for r in got} == expected

    def test_exact_jaccard_pairs(self, spark, docs):
        pairs = ngram_jaccard_pairs(docs, threshold=0.99).collect()
        assert {(p["id_a"], p["id_b"]) for p in pairs} == {(1, 4)}
        assert pairs[0]["jaccard"] == 1.0

    def test_jaccard_df_cap_drops_planted_hot_shingle(self, spark):
        """Adversarial skew shape: one boilerplate trigram planted across
        every doc would emit O(n²) join rows; with df_cap it must be
        excluded from intersection AND sizes, so (a) docs related ONLY
        through the boilerplate stop pairing, (b) genuinely similar docs
        still pair with the exact Jaccard over the filtered universe, and
        (c) the audit frame reports exactly the planted shingles."""
        from arkhammirror_spark.operators.dedup import (
            hot_shingles,
            shingle_hashes,
        )

        footer = " all rights reserved worldwide"
        base = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [(1, base + footer), (2, base + " extra" + footer)] + [
            (i, f"unique{i} text{i} body{i} words{i} here{i}" + footer)
            for i in range(3, 40)
        ]
        docs = spark.createDataFrame(rows, "doc_id: long, text: string")

        uncapped = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(docs, threshold=0.05).collect()
        }
        # footer-only overlap pairs every doc with every other
        assert len(uncapped) > 500

        capped = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                docs, threshold=0.05, df_cap=10
            ).collect()
        }
        # only the genuinely-similar pair survives; its Jaccard is exact
        # over the footer-free shingle universe: the two pure-footer
        # trigrams (df=39) drop, leaving doc 1 with 8 shingles, doc 2
        # with 9, sharing the 6 base trigrams -> 6/11
        assert set(capped) == {(1, 2)}
        assert abs(capped[(1, 2)] - 6 / 11) < 1e-9

        sh = shingle_hashes(docs)
        audit = hot_shingles(sh, df_cap=10).collect()
        # hot shingles = trigrams fully inside footer + those bridging each
        # doc's last words into it; every audited df exceeds the cap
        assert audit and all(r["df"] > 10 for r in audit)
        # the pure-footer trigram "all rights reserved" (df = 39) is caught
        import pyspark.sql.functions as SF

        hot_set = {r["h"] for r in audit}
        probe = spark.createDataFrame(
            [("all rights reserved",)], "shingle: string"
        ).select(SF.xxhash64("shingle").alias("h")).collect()[0]["h"]
        assert probe in hot_set

    def test_lsh_verified_equals_bruteforce(self, spark, docs):
        thr = 0.5
        lsh = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in verified_neardup_pairs(docs, threshold=thr).collect()
        }
        brute = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in ngram_jaccard_pairs(docs, threshold=thr).collect()
        }
        assert lsh == brute
        assert (1, 4) in lsh

    def test_minhash_identical_docs_identical_sigs(self, spark, docs):
        sh = shingles(docs, n=3)
        sigs = {r["doc_id"]: r["signature"] for r in minhash_signatures(sh, k=32).collect()}
        assert sigs[1] == sigs[4]
        assert sigs[1] != sigs[3]

    def test_shingle_hashes_carry_full_64bit_key(self, spark, docs):
        # the Jaccard equality key must be the RAW xxhash64 (full 64-bit
        # range, negatives included), not a 31-bit fold — a folded key
        # collides at ~n²/2³² per doc and silently inflates n_shared
        from arkhammirror_spark.operators.dedup import shingle_hashes

        hs = [r["h"] for r in shingle_hashes(docs, n=3).collect()]
        assert min(hs) < 0 or max(hs) >= (1 << 31)  # escaped the [0, 2^31) fold
        # signature path still folds into [0, p): all minhash values bounded
        sh = shingle_hashes(docs, n=3)
        sigs = minhash_signatures(sh, k=8).collect()
        for r in sigs:
            assert all(0 <= v < (1 << 31) - 1 for v in r["signature"])
        # raw-shingle and hashed-frame inputs produce identical signatures
        sigs2 = {
            r["doc_id"]: r["signature"]
            for r in minhash_signatures(shingles(docs, n=3), k=8).collect()
        }
        assert {r["doc_id"]: r["signature"] for r in sigs} == sigs2

    def test_simhash_dup_and_neardup(self, spark, docs):
        sims = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
        assert sims[1] == sims[4]
        pairs = simhash_neardup(docs, max_hamming=0).collect()
        assert {(p["id_a"], p["id_b"]) for p in pairs} >= {(1, 4)}


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        import random

        rng = random.Random(3)
        rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(200)]
        # plant a clone of vec 0
        rows.append((900, [x * 1.001 for x in rows[0][1]]))
        return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>").cache()

    def test_brute_force_finds_clone(self, spark, emb):
        qv = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]
        top = brute_force_topk(emb.where("vec_id <> 0"), qv, k=3).collect()
        assert top[0]["vec_id"] == 900
        assert top[0]["score"] > 0.999

    def test_lsh_recall_vs_bruteforce(self, spark, emb):
        qv = [float(x) for x in emb.where("vec_id = 0").collect()[0]["embedding"]]
        pool = emb.where("vec_id <> 0")
        brute = [r["vec_id"] for r in brute_force_topk(pool, qv, k=5).collect()]
        ann = [r["vec_id"] for r in lsh_bucket_topk(pool, qv, k=5, n_planes=8).collect()]
        # the clone must be recalled; overall recall@5 ≥ 2/5 for the bucketed probe
        assert ann and ann[0] == 900
        assert len(set(brute) & set(ann)) >= 2

    def test_pairwise_cosine(self, spark, emb):
        pairs = pairwise_cosine_above(emb, 0.999, n_planes=6).collect()
        assert {(p["id_a"], p["id_b"]) for p in pairs} == {(0, 900)}

    def test_banded_lsh_auto_r_scales_with_corpus(self, spark, emb):
        from arkhammirror_spark.operators.similarity import (
            pairwise_cosine_above_banded,
            recommended_rows_per_band,
        )

        assert recommended_rows_per_band(200) == 8
        assert recommended_rows_per_band(1_000_000) == 20
        assert recommended_rows_per_band(2) == 4  # floor
        # rows_per_band=None derives R from the corpus count; output is
        # still the exact verified pair set
        pairs = pairwise_cosine_above_banded(
            emb, 0.999, rows_per_band=None
        ).collect()
        assert {(p["id_a"], p["id_b"]) for p in pairs} == {(0, 900)}


class TestRerankers:
    def test_recency_blend(self, spark):
        import datetime as dt

        rows = [
            (1, 0.9, dt.date(2024, 1, 1)),
            (2, 0.9, dt.date(2024, 1, 11)),  # newest
            (3, 0.9, None),
        ]
        df = spark.createDataFrame(rows, "doc_id: long, score: double, created_at: date")
        from arkhammirror_spark.operators.search import recency_boost

        got = {r["doc_id"]: r["score"] for r in recency_boost(df).collect()}
        assert abs(got[2] - (0.9 * 0.5 + 1.0 * 0.5)) < 1e-12  # age 0
        assert abs(got[1] - (0.9 * 0.5 + (1 / (1 + 10 * 0.1)) * 0.5)) < 1e-12
        assert got[3] == 0.9  # null ts untouched

    def test_dedupe_and_diversify(self, spark):
        rows = [(1, "a", 0.9), (2, "a", 0.8), (3, "a", 0.7), (4, "a", 0.6), (5, "b", 0.5)]
        df = spark.createDataFrame(rows, "rid: long, doc_id: string, score: double")
        from arkhammirror_spark.operators.search import dedupe_results, diversify_by_source

        kept = dedupe_results(df).collect()
        assert {(r["rid"], r["doc_id"]) for r in kept} == {(1, "a"), (5, "b")}
        div = diversify_by_source(df, max_per_source=3).collect()
        assert sorted(r["rid"] for r in div) == [1, 2, 3, 5]


class TestLshHotBucketCap:
    def test_identical_signature_cluster_is_capped(self, spark):
        """10k docs with the SAME signature land in one bucket per band;
        the guard must bound candidates to C(cap, 2) instead of ~50M,
        flag them truncated, and ledger the dropped members."""
        from arkhammirror_spark.operators.dedup import (
            lsh_bucket_audit,
            lsh_candidate_pairs,
        )

        sig = list(range(16))
        sigs = spark.range(10_000).select(
            F.col("id").alias("doc_id"),
            F.array(*[F.lit(v) for v in sig]).alias("signature"),
        )
        pairs = lsh_candidate_pairs(
            sigs, bands=4, rows=4, bucket_cap=50
        ).collect()
        assert len(pairs) == 50 * 49 // 2
        assert all(r["truncated"] for r in pairs)
        # survivors are the 50 smallest ids, all mutually paired
        ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
        assert ids == set(range(50))
        audit = lsh_bucket_audit(
            sigs, bands=4, rows=4, bucket_cap=50
        ).collect()
        assert len(audit) == 4  # one hot bucket per band
        assert all(a["size"] == 10_000 and a["dropped"] == 9_950
                   for a in audit)

    def test_cap_leaves_cold_buckets_exact_and_unflagged(self, spark):
        """Distinct-signature corpus: capped output == uncapped output,
        nothing flagged truncated, audit empty."""
        from arkhammirror_spark.operators.dedup import (
            lsh_bucket_audit,
            lsh_candidate_pairs,
        )

        # 40 docs in 20 identical-signature pairs -> 20 candidate pairs
        sigs = spark.range(40).select(
            F.col("id").alias("doc_id"),
            F.array(
                *[(F.col("id") / 2).cast("long") * 100 + F.lit(i)
                  for i in range(16)]
            ).alias("signature"),
        )
        capped = lsh_candidate_pairs(sigs, bands=4, rows=4, bucket_cap=50)
        uncapped = lsh_candidate_pairs(sigs, bands=4, rows=4,
                                       bucket_cap=None)
        c = sorted((r["id_a"], r["id_b"], r["truncated"])
                   for r in capped.collect())
        u = sorted((r["id_a"], r["id_b"], r["truncated"])
                   for r in uncapped.collect())
        assert c == u
        assert len(c) == 20
        assert not any(t for _, _, t in c)
        assert lsh_bucket_audit(sigs, bands=4, rows=4,
                                bucket_cap=50).count() == 0
