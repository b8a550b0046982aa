"""Interleaved r3-code vs r5-code A/B for the two unexplained BENCH_r04
drifts (VERDICT r04 "What's wrong" #1 / next #6): `bm25_exact_topk_avg`
(+17%) and `index_build_documents_positional` (+16%).

Same discipline that root-caused the r3 `postings` mystery: both code
versions run the identical workload in fresh subprocesses, interleaved
within one window (the box has ~2-3x cross-minute co-tenant noise),
minima reported. The r3 tree is a git worktree pinned at the round-3
snapshot commit; each child imports the package from its own tree.

Usage:
    python bench/drift_ab.py --setup   # create the r3 worktree
    python bench/drift_ab.py           # run the A/B (3 passes each)
    python bench/drift_ab.py --child <repo_path>   # one measured pass
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

R5 = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R3_COMMIT = "c0505a6"  # "round 3: verdict/advice/correctness/bench"
R3_TREE = "/tmp/es_loaders_r3_tree"


def child(repo: str) -> None:
    import shutil
    import tempfile
    import time

    sys.path.insert(0, repo)
    from es_loaders_spark.bm25 import bm25_topk
    from es_loaders_spark.build import build_index
    from es_loaders_spark.postings import (
        corpus_stats, doc_lengths, postings_long, term_df,
    )
    from es_loaders_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("drift-ab", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = [
        "spark index crawl data",
        "the fast query merge",
        "w0500 w0123 batch window",
        "hash join group filter",
        "page web the scan",
    ]
    # same warm inputs as bench.py: cache + materialize before timing
    p, dl = postings_long(docs).cache(), doc_lengths(docs).cache()
    p.count(), dl.count()
    tdf = term_df(p).cache()
    stats = corpus_stats(dl)
    # untimed JIT warmup (one small positional build + one scorer query)
    wd = tempfile.mkdtemp(prefix="drift_warm_")
    shutil.rmtree(wd, ignore_errors=True)
    build_index(spark, docs.limit(2000), wd, n_shards=8, positions=True)
    shutil.rmtree(wd, ignore_errors=True)
    bm25_topk(spark, p, dl, tdf, stats, queries[0], k=20).collect()

    out = {"build_positional": [], "exact_topk_avg": []}
    for _ in range(2):
        d = tempfile.mkdtemp(prefix="drift_idx_")
        shutil.rmtree(d, ignore_errors=True)
        t0 = time.time()
        build_index(spark, docs, d, n_shards=max(8, cpus), positions=True)
        out["build_positional"].append(round(time.time() - t0, 3))
        shutil.rmtree(d, ignore_errors=True)
        t0 = time.time()
        for q in queries:
            bm25_topk(spark, p, dl, tdf, stats, q, k=20).collect()
        out["exact_topk_avg"].append(round((time.time() - t0) / len(queries), 4))
    print(json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", default=None)
    ap.add_argument("--setup", action="store_true")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()
    if args.child:
        child(args.child)
        return
    if args.setup or not os.path.exists(R3_TREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", R3_TREE, R3_COMMIT],
            cwd=R5, check=True,
        )
    results: dict[str, list[float]] = {
        "r3_build": [], "r5_build": [], "r3_exact": [], "r5_exact": [],
    }
    for i in range(args.passes):
        for tag, repo in (("r3", R3_TREE), ("r5", R5)):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", repo],
                capture_output=True, text=True, timeout=1800,
                env={**os.environ, "PYTHONPATH": repo}, cwd=repo,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            results[f"{tag}_build"] += r["build_positional"]
            results[f"{tag}_exact"] += r["exact_topk_avg"]
            print(f"pass {i} {tag}: {r}", file=sys.stderr)
    summary = {
        "index_build_documents_positional": {
            "r3_min": min(results["r3_build"]),
            "r5_min": min(results["r5_build"]),
            "ratio": round(min(results["r5_build"]) / min(results["r3_build"]), 3),
        },
        "bm25_exact_topk_avg": {
            "r3_min": min(results["r3_exact"]),
            "r5_min": min(results["r5_exact"]),
            "ratio": round(min(results["r5_exact"]) / min(results["r3_exact"]), 3),
        },
        "all_samples": results,
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
