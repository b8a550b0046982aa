"""Dedup operators: MinHash-LSH vs exact Jaccard ground truth, SimHash, exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_loaders_spark.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)


@pytest.fixture(scope="module")
def dup_corpus(spark):
    """Corpus with planted near-duplicates."""
    base = (
        "the quick brown fox jumps over the lazy dog and runs through the green "
        "forest while the hunter watches from a distance with great patience"
    )
    rows = []
    for i in range(20):
        rows.append((i, f"unique document number {i} " + " ".join(f"tok{i}_{j}" for j in range(30))))
    rows.append((100, base))
    rows.append((101, base))  # exact dup of 100
    rows.append((102, base.replace("green", "dark")))  # near dup
    rows.append((103, base.replace("quick", "slow").replace("lazy", "sleepy")))  # near dup
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates(spark, dup_corpus):
    groups = exact_duplicates(dup_corpus).collect()
    assert len(groups) == 1
    assert groups[0]["canonical_id"] == 100
    assert groups[0]["n_docs"] == 2
    kept = dedup_exact(dup_corpus)
    assert kept.count() == dup_corpus.count() - 1
    assert kept.filter(F.col("doc_id") == 101).count() == 0


def test_ngram_jaccard_finds_planted_pairs(spark, dup_corpus):
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_corpus, threshold=0.5).collect()
    }
    assert (100, 101) in pairs and pairs[(100, 101)] == 1.0
    assert (100, 102) in pairs
    # unrelated docs never pair
    assert all(a >= 100 and b >= 100 for a, b in pairs)


def test_minhash_estimates_jaccard(spark, dup_corpus):
    exact = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_corpus, threshold=0.3).collect()
    }
    est = {
        (r["a"], r["b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(dup_corpus, num_hashes=64, bands=16).collect()
    }
    # exact dup pair: estimate must be 1.0
    assert est.get((100, 101)) == 1.0
    # every high-jaccard exact pair must be recalled by LSH
    for pair, j in exact.items():
        if j >= 0.6:
            assert pair in est, f"LSH missed {pair} (jaccard={j})"
            assert abs(est[pair] - j) < 0.35, f"estimate off for {pair}: {est[pair]} vs {j}"


def test_minhash_signature_deterministic(spark, dup_corpus):
    a = {r["doc_id"]: list(r["sig"]) for r in minhash_signatures(dup_corpus).collect()}
    b = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(dup_corpus.repartition(7)).collect()
    }
    assert a == b


def test_simhash_properties(spark, dup_corpus):
    fps = {r["doc_id"]: r["simhash"] for r in simhash(dup_corpus).collect()}
    assert fps[100] == fps[101]  # identical text → identical fingerprint
    # near dup: small Hamming distance; unrelated: large
    def hamming(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert hamming(fps[100], fps[102]) <= 12
    assert hamming(fps[100], fps[0]) > 20


def test_shingles_count(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    got = sorted(r["shingle"] for r in shingles(df, 3).collect())
    assert got == ["a b c", "b c d", "c d e"]


def test_minhash_degenerate_bucket_capped(spark):
    """1k boilerplate-identical docs share every band bucket; pair
    generation must be O(n) (star topology), not O(n²) all-pairs
    (VERDICT r01 scale fix — hot-key discipline of merge.py)."""
    from es_loaders_spark.dedup import minhash_lsh_pairs

    n = 1000
    rows = [(i, "the same boilerplate page body repeated for every doc") for i in range(n)]
    # a couple of genuinely distinct docs so not everything is one group
    rows += [(n, "completely different text about spark and parquet engines"),
             (n + 1, "completely different text about spark and parquet engines")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, max_bucket=64).collect()
    # star pairs: every boilerplate doc pairs with canonical doc 0 exactly once
    boiler = [(r["a"], r["b"]) for r in pairs if r["b"] < n]
    assert len(boiler) == n - 1, f"expected {n-1} star pairs, got {len(boiler)}"
    assert all(a == 0 for a, _ in boiler)
    # bound: far below the all-pairs explosion (n*(n-1)/2 ≈ 500k)
    assert len(pairs) < 2 * n
    # the distinct near-dup pair is still found
    assert (n, n + 1) in {(r["a"], r["b"]) for r in pairs}


def test_minhash_portable_matches_default_semantics(spark, dup_corpus):
    """Portable (md5) variant estimates the same Jaccard structure as the
    xxhash64 scale path: both must link the planted duplicate pair."""
    from es_loaders_spark.dedup import minhash_lsh_pairs

    for portable in (False, True):
        got = {
            (r["a"], r["b"]): r["est_jaccard"]
            for r in minhash_lsh_pairs(dup_corpus, portable=portable).collect()
        }
        assert (100, 101) in got  # identical docs always collide
        assert got[(100, 101)] == 1.0


def test_verified_pipeline_hashed_sets_match_string_jaccard(spark, dup_corpus):
    """The production pipeline's shared hashed-shingle relation must yield
    the same exact-Jaccard values as the string-set path: xxhash64 is
    injective on any real shingle set, so |A∩B|/|A∪B| is preserved."""
    from es_loaders_spark.dedup import (
        hashed_shingle_sets,
        lsh_verified_pairs,
        minhash_signatures_from_hashed,
        release_dedup_caches,
    )

    fast = {
        (r["a"], r["b"]): r["jaccard"]
        for r in lsh_verified_pairs(dup_corpus, threshold=0.5).collect()
    }
    truth = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_corpus, threshold=0.5).collect()
    }
    assert fast[(100, 101)] == 1.0
    for k, j in fast.items():
        assert truth[k] == j, (k, j, truth.get(k))
    # shared-relation signatures ARE the public API's signatures
    via_shared = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures_from_hashed(hashed_shingle_sets(dup_corpus)).collect()
    }
    direct = {
        r["doc_id"]: list(r["sig"]) for r in minhash_signatures(dup_corpus).collect()
    }
    assert via_shared == direct
    release_dedup_caches()
