"""Similarity search: brute-force correctness vs numpy; LSH recall."""

from __future__ import annotations

import numpy as np
import pytest

from es_loaders_spark.similarity import cosine_topk, lsh_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.collect()
    ids = np.asarray([r["vec_id"] for r in rows])
    mat = np.asarray([list(r["embedding"]) for r in rows], dtype=np.float64)
    return ids, mat


def test_bruteforce_matches_numpy(spark, emb, emb_np):
    ids, mat = emb_np
    q = mat[ids == 0][0]
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -np.round(sims, 4)))[:10]
    want = [(int(ids[i]), float(np.round(sims[i], 4))) for i in order]
    got = [(r["vec_id"], r["cosine"]) for r in cosine_topk(emb, list(q), k=10).collect()]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) <= 1e-4


def test_lsh_recall(spark, emb, emb_np):
    """These embeddings are near-random (max non-self cosine ≈ 0.33), the
    hardest case for LSH; recall is measured, not assumed."""
    ids, mat = emb_np
    q = list(mat[ids == 0][0])
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in lsh_topk(emb, q, k=10, n_planes=4, probe_hamming=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # query vector itself always found (same bucket by construction)
    assert 0 in approx


def test_lsh_is_actually_approximate(spark, emb, emb_np):
    """LSH must scan a strict subset (narrow probe → few candidates)."""
    ids, mat = emb_np
    q = list(mat[ids == 0][0])
    narrow = lsh_topk(emb, q, k=500, n_planes=8, probe_hamming=0).count()
    assert narrow < len(ids) * 0.25


def test_ann_indexed_matches_unindexed(spark, tmp_path_factory):
    """Pre-bucketed ANN (partition-pruned) == on-the-fly LSH, and the
    probe scan is served by PartitionFilters on bucket (no full pass)."""
    from pyspark.sql import functions as F

    from es_loaders_spark.similarity import (
        build_ann_index,
        lsh_topk,
        lsh_topk_indexed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    d = str(tmp_path_factory.mktemp("ann_idx"))
    build_ann_index(emb, d, dim=len(q))
    a = [(r["vec_id"], r["cosine"]) for r in lsh_topk(emb, q, k=15).collect()]
    b = [(r["vec_id"], r["cosine"]) for r in lsh_topk_indexed(spark, d, q, k=15).collect()]
    assert a == b
    plan = lsh_topk_indexed(spark, d, q, k=15)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


# --- IVF (inverted-file) coarse quantizer -----------------------------------


def test_ivf_exhaustive_equals_bruteforce(spark, emb, emb_np):
    """nprobe = n_centroids probes every list → exactly the exact top-k."""
    from es_loaders_spark.similarity import ivf_topk, train_ivf_centroids

    ids, mat = emb_np
    q = list(mat[ids == 0][0])
    cent = train_ivf_centroids(emb, n_centroids=8, n_iters=2)
    exact = [(r["vec_id"], r["cosine"]) for r in cosine_topk(emb, q, k=15).collect()]
    ivf = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk(emb, q, cent, k=15, nprobe=8).collect()
    ]
    assert ivf == exact


def test_ivf_recall_and_pruning(spark, emb, emb_np):
    """nprobe=2 of 8: candidate set is a strict subset; the query's own
    vector is always found (it sits in its nearest list by construction);
    recall vs brute force is measured, not assumed."""
    from es_loaders_spark.similarity import (
        ivf_assign_col,
        ivf_topk,
        train_ivf_centroids,
    )
    from pyspark.sql import functions as F

    ids, mat = emb_np
    q = list(mat[ids == 0][0])
    cent = train_ivf_centroids(emb, n_centroids=8, n_iters=3)
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    got = ivf_topk(emb, q, cent, k=10, nprobe=2).collect()
    approx = {r["vec_id"] for r in got}
    assert 0 in approx
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall too low: {recall}"
    # strict subset scanned: assignment splits the data across ≥ 2 lists
    n_lists = (
        emb.withColumn("_l", ivf_assign_col(F.col("embedding"), cent))
        .select("_l").distinct().count()
    )
    assert n_lists >= 2


def test_ivf_centroids_deterministic(spark, emb):
    from es_loaders_spark.similarity import train_ivf_centroids

    a = train_ivf_centroids(emb, n_centroids=4, n_iters=2)
    b = train_ivf_centroids(emb, n_centroids=4, n_iters=2)
    assert np.array_equal(a, b)


def test_ivf_indexed_matches_unindexed(spark, emb, tmp_path_factory):
    """Materialized IVF == on-the-fly, probes served by PartitionFilters
    on list_id (partition-pruned scan, not a full pass)."""
    from pyspark.sql import functions as F

    from es_loaders_spark.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
        train_ivf_centroids,
    )

    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    d = str(tmp_path_factory.mktemp("ivf_idx"))
    cent = build_ivf_index(emb, d, n_centroids=8, n_iters=2)
    cent2 = train_ivf_centroids(emb, n_centroids=8, n_iters=2)
    assert np.array_equal(cent, cent2)
    a = [(r["vec_id"], r["cosine"]) for r in ivf_topk(emb, q, cent, k=15, nprobe=2).collect()]
    b = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk_indexed(spark, d, q, k=15, nprobe=2).collect()
    ]
    assert a == b
    plan = (
        ivf_topk_indexed(spark, d, q, k=15, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "list_id" in plan


def test_ann_index_append_delete_cycle(spark, emb, tmp_path_factory):
    """VERDICT r04 #5 done-criterion: LSH index parity across an
    append + delete cycle — indexed results equal the on-the-fly path
    over (base ∪ appended) minus tombstoned, at every step."""
    from pyspark.sql import functions as F

    from es_loaders_spark.similarity import (
        append_ann_index,
        ann_tombstones,
        build_ann_index,
        delete_ann_ids,
        lsh_topk,
        lsh_topk_indexed,
    )

    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    dim = len(q)
    base = emb.filter(F.col("vec_id") < 300)
    extra = emb.filter(F.col("vec_id") >= 300)
    d = str(tmp_path_factory.mktemp("ann_idx"))
    build_ann_index(base, d, dim=dim, n_planes=4, seed=42)

    def indexed():
        return [(r["vec_id"], r["cosine"])
                for r in lsh_topk_indexed(spark, d, q, k=12, probe_hamming=2).collect()]

    def direct(df):
        return [(r["vec_id"], r["cosine"])
                for r in lsh_topk(df, q, k=12, n_planes=4, seed=42,
                                  probe_hamming=2).collect()]

    assert indexed() == direct(base)
    # append: new vectors land in their buckets, visible immediately
    n = append_ann_index(extra, d)
    assert n == extra.count()
    assert indexed() == direct(emb)
    # delete: tombstoned ids vanish from probes without a rewrite
    victims = [vid for vid, _ in indexed()[:3]]
    delete_ann_ids(spark, d, spark.createDataFrame([(v,) for v in victims], "id long"))
    live = emb.filter(~F.col("vec_id").isin(victims))
    assert indexed() == direct(live)
    assert not any(v in {x for x, _ in indexed()} for v in victims)
    # idempotent delete; tombstone table holds exactly the victim set
    delete_ann_ids(spark, d, spark.createDataFrame([(victims[0],)], "id long"))
    assert {r["vec_id"] for r in ann_tombstones(spark, d).collect()} == set(victims)
    assert indexed() == direct(live)


def test_ivf_index_append_delete_cycle(spark, emb, tmp_path_factory):
    """Same cycle for the IVF index: appended vectors are assigned with
    the PERSISTED quantizer (no retrain), deletes are live-filtered; at
    nprobe = n_lists the indexed result equals exact brute force over
    the live set — the strongest parity available after an append."""
    from pyspark.sql import functions as F

    from es_loaders_spark.similarity import (
        append_ivf_index,
        build_ivf_index,
        cosine_topk,
        delete_ann_ids,
        ivf_topk_indexed,
    )

    q = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    base = emb.filter(F.col("vec_id") < 300)
    extra = emb.filter(F.col("vec_id") >= 300)
    d = str(tmp_path_factory.mktemp("ivf_maint"))
    build_ivf_index(base, d, n_centroids=4, n_iters=2)
    append_ivf_index(extra, d)
    full = [(r["vec_id"], r["cosine"])
            for r in ivf_topk_indexed(spark, d, q, k=10, nprobe=4).collect()]
    exact = [(r["vec_id"], r["cosine"]) for r in cosine_topk(emb, q, k=10).collect()]
    assert full == exact
    victims = [x for x, _ in full[:2]]
    delete_ann_ids(spark, d, spark.createDataFrame([(v,) for v in victims], "id long"))
    after = [(r["vec_id"], r["cosine"])
             for r in ivf_topk_indexed(spark, d, q, k=10, nprobe=4).collect()]
    want = [(r["vec_id"], r["cosine"])
            for r in cosine_topk(emb.filter(~F.col("vec_id").isin(victims)), q, k=10).collect()]
    assert after == want


# ---------------------------------------------------------------------------
# r6: unified indexed kNN (ann_candidates/ann_topk) + dsl.search routing
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ivf_dir(spark, emb, tmp_path_factory):
    from es_loaders_spark.similarity import build_ivf_index

    d = str(tmp_path_factory.mktemp("ivf_knn"))
    build_ivf_index(emb, d, n_centroids=8, n_iters=3, seed=5)
    return d


@pytest.fixture(scope="module")
def lsh_dir(spark, emb, tmp_path_factory):
    from es_loaders_spark.similarity import build_ann_index

    dim = len(emb.select("embedding").first()[0])
    d = str(tmp_path_factory.mktemp("lsh_knn"))
    build_ann_index(emb, d, dim=dim, n_planes=6, seed=9)
    return d


def _qvec(emb):
    return [float(x) for x in emb.filter("vec_id = 3").select("embedding").first()[0]]


def test_ann_topk_default_is_exact(spark, emb, ivf_dir, lsh_dir):
    """No num_candidates / no probe knob → probe everything == brute force."""
    from es_loaders_spark.similarity import ann_topk

    q = _qvec(emb)
    want = [(r["vec_id"], r["cosine"]) for r in cosine_topk(emb, q, k=10).collect()]
    for d in (ivf_dir, lsh_dir):
        got = [(r["vec_id"], r["cosine"]) for r in ann_topk(spark, d, q, k=10).collect()]
        assert got == want


def test_ann_topk_num_candidates_monotone_recall(spark, emb, ivf_dir):
    """Recall@10 is non-decreasing in num_candidates, reaching 1.0 when
    num_candidates covers the corpus (the ES accuracy knob), and is
    reported so the trade-off is visible in the test log."""
    from es_loaders_spark.similarity import ann_topk

    q = _qvec(emb)
    n = emb.count()
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    recalls = []
    for nc in (10, n // 4, n):
        got = {r["vec_id"] for r in ann_topk(spark, ivf_dir, q, k=10, num_candidates=nc).collect()}
        recalls.append(len(got & exact) / len(exact))
    print(f"IVF recall@10 by num_candidates {[10, n // 4, n]}: {recalls}")
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0


def test_ann_topk_honors_tombstones(spark, emb, tmp_path):
    # private index: the tombstone must not leak into the shared fixture
    from es_loaders_spark.similarity import (
        ann_topk,
        build_ivf_index,
        delete_ann_ids,
    )

    idx = str(tmp_path / "ivf_tomb")
    build_ivf_index(emb, idx, n_centroids=8, n_iters=3, seed=5)
    q = _qvec(emb)
    top = [r["vec_id"] for r in ann_topk(spark, idx, q, k=5).collect()]
    victim = top[0]
    delete_ann_ids(spark, idx, spark.createDataFrame([(victim,)], "vec_id long"))
    after = [r["vec_id"] for r in ann_topk(spark, idx, q, k=5).collect()]
    assert victim not in after
    # live-set identity: indexed full-probe == brute force over survivors
    want = [
        r["vec_id"]
        for r in cosine_topk(emb.filter(f"vec_id <> {victim}"), q, k=5).collect()
    ]
    assert after == want


def test_ann_topk_missing_index_raises(spark, tmp_path):
    from es_loaders_spark.similarity import ann_topk

    with pytest.raises(ValueError, match="no ANN index"):
        ann_topk(spark, str(tmp_path / "nope"), [0.1, 0.2], k=3)


def test_dsl_knn_ann_routing_matches_exact(spark, emb, lsh_dir):
    """dsl.search(knn=..., ann_index_dir=) at full probe == the exact knn
    path: same ids AND same rounded scores (shared candidate relation +
    the same (1+cos)/2 scoring expression)."""
    from es_loaders_spark import dsl

    q = _qvec(emb)
    body = {"knn": {"field": "embedding", "query_vector": q, "k": 8}}
    exact = [(r["vec_id"], r["score"]) for r in dsl.search(spark, emb, body, id_col="vec_id").collect()]
    served = [
        (r["vec_id"], r["score"])
        for r in dsl.search(spark, emb, body, id_col="vec_id", ann_index_dir=lsh_dir).collect()
    ]
    assert served == exact


def test_dsl_knn_ann_prefilter(spark, emb, ivf_dir):
    """ES pre-filter semantics on the ANN path: the filter restricts
    candidates BEFORE the top-k, so every hit satisfies it and equals
    the exact pre-filtered result."""
    from es_loaders_spark import dsl

    q = _qvec(emb)
    body = {"knn": {
        "field": "embedding", "query_vector": q, "k": 8,
        "filter": {"range": {"label": {"gte": 3}}},
    }}
    exact = [(r["vec_id"], r["score"]) for r in dsl.search(spark, emb, body, id_col="vec_id").collect()]
    served = [
        (r["vec_id"], r["score"])
        for r in dsl.search(spark, emb, body, id_col="vec_id", ann_index_dir=ivf_dir).collect()
    ]
    assert served == exact
    labels = {r["label"] for r in emb.join(
        spark.createDataFrame([(d,) for d, _ in served], "vec_id long"), "vec_id"
    ).select("label").collect()}
    assert all(lb >= 3 for lb in labels)


def test_ann_candidates_plan_is_partition_pruned(spark, emb, ivf_dir):
    """The probe scan must show PartitionFilters on list_id — the pruned
    IO that makes the ANN path the 100-TB serving posture."""
    from es_loaders_spark.similarity import ann_candidates

    q = _qvec(emb)
    live, _ = ann_candidates(spark, ivf_dir, q, k=5, nprobe=2)
    plan = live._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "list_id" in plan.split("PartitionFilters", 1)[1][:200]
