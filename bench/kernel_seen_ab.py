"""Isolation A/B of the kernel's already-scored membership structure
(VERDICT r04 #7): r4's single sorted array + np.insert vs r5's
_SortedSegments, fed the identical chunk stream a mega-shard stopword
query produces (many chunks, bounded chunk size, ~all candidates fresh).

Interleaved runs (the box has ~2-3x co-tenant noise between minutes);
reported numbers are minima of N passes. Pure numpy — no Spark, no IO.
"""

from __future__ import annotations

import json
import time

import numpy as np

from es_loaders_spark.wand import _SortedSegments


def _chunks(total: int, chunk: int, seed: int = 3) -> list[np.ndarray]:
    rng = np.random.RandomState(seed)
    ids = rng.permutation(total * 2)[:total].astype(np.int64)
    return [np.sort(ids[i : i + chunk]) for i in range(0, total, chunk)]


def run_old(chunks: list[np.ndarray]) -> float:
    t0 = time.perf_counter()
    seen = np.empty(0, dtype=np.int64)
    for cand in chunks:
        if seen.size:
            pos = np.searchsorted(seen, cand)
            dup = (pos < seen.size) & (seen[np.minimum(pos, seen.size - 1)] == cand)
            cand = cand[~dup]
        seen = np.insert(seen, np.searchsorted(seen, cand), cand)
    return time.perf_counter() - t0


def run_new(chunks: list[np.ndarray]) -> float:
    t0 = time.perf_counter()
    seen = _SortedSegments()
    for cand in chunks:
        if seen.size:
            cand = cand[~seen.contains(cand)]
        seen.add(cand)
    return time.perf_counter() - t0


def main() -> None:
    results = {}
    for total, chunk in [(200_000, 512), (1_000_000, 512), (1_000_000, 4096)]:
        chunks = _chunks(total, chunk)
        old_t, new_t = [], []
        for _ in range(3):  # interleaved
            old_t.append(run_old(chunks))
            new_t.append(run_new(chunks))
        results[f"{total}x{chunk}"] = {
            "np_insert_sec": round(min(old_t), 4),
            "segments_sec": round(min(new_t), 4),
            "speedup": round(min(old_t) / min(new_t), 2),
        }
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
