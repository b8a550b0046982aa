"""Document deletion: tombstones + delete_by_query + compaction.

The reference deletes documents with ES ``delete_by_query``
(mira/elasticsearch.py:255-274, term-filtered; driven by clean_analysis
at 211-225) and relies on index rebuilds otherwise. Lucene's model —
which ES uses underneath — is TOMBSTONES: deletes mark docs in a
live-docs bitmap; queries skip them; segment merges drop them
physically. Same model here:

- ``delete_ids`` / ``delete_by_term``: append doc_ids to the index's
  ``deletes`` tombstone table (manifest-committed parquet).
- Query paths (wand.topk/topk_batch, phrase.phrase_docs,
  merge.merged_postings) anti-join tombstones — deleted docs never
  surface. Corpus stats (n_docs/avgdl/df) keep their pre-delete values
  until compaction, exactly like Lucene's docCount between merges.
- ``compact_index``: physically rebuilds the shards/doclens/terms
  tables from the survivor set — afterwards the index is
  content-identical to a fresh build of the survivors (pytest asserts
  rank-identity), tombstones are cleared, generations reset to 1.

Scale notes: tombstone tables are tiny next to the index (doc_ids
only); the anti-joins broadcast under AQE. Compaction is one
(shard, term)-keyed shuffle — the same shape as the salted merge — and
runs decode → filter → re-encode fully vectorized per group.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import (
    INDEX_SCHEMA,
    _write_json_atomic,
    generation_dirs,
    read_generations,
)
from .catalog import ManifestCatalog, PartitionEntry
from .codec import decode_block, decode_block_positions, encode_blocks_flat


def tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Committed tombstone doc_ids, or None if nothing was deleted."""
    d = os.path.join(index_dir, "deletes")
    cat = ManifestCatalog(index_dir)
    if not cat.committed_partitions("deletes"):
        return None
    return spark.read.parquet(d).select("doc_id")


def filter_deleted(spark: SparkSession, index_dir: str, df: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Anti-join tombstones out of ``df`` (no-op when none exist)."""
    tomb = tombstones(spark, index_dir)
    if tomb is None:
        return df
    return df.join(
        tomb.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )


def delete_ids(spark: SparkSession, index_dir: str, ids: DataFrame) -> int:
    """Tombstone the given doc_ids (idempotent: duplicates collapse).

    Returns the total number of tombstoned docs after the call.
    """
    cat = ManifestCatalog(index_dir)
    d = cat.table_dir("deletes")
    ids = ids.select(F.col(ids.columns[0]).cast("long").alias("doc_id")).distinct()
    existing = tombstones(spark, index_dir)
    if existing is not None:
        ids = ids.unionByName(existing).distinct()
    # collect-free commit: write new snapshot dir, manifest points at it
    version = cat.load("deletes").version + 1
    part = os.path.join(d, f"shard={version}")
    ids.coalesce(1).write.mode("overwrite").parquet(part)
    n = spark.read.parquet(part).count()
    # drop older snapshots (superseded) before committing the new one —
    # the parquet dir then holds exactly the latest full tombstone set
    for name in os.listdir(d):
        if name.startswith("shard=") and name != f"shard={version}":
            import shutil

            shutil.rmtree(os.path.join(d, name), ignore_errors=True)
    cat.commit(
        "deletes",
        [
            PartitionEntry(
                partition_id=version, stage="deletes", input_rows=n,
                docs=n, terms=0, bytes=0, wall_ms=0,
            )
        ],
    )
    return int(n)


def delete_by_term(spark: SparkSession, index_dir: str, term: str) -> int:
    """ES ``delete_by_query`` with a term filter (mira/elasticsearch.py:
    255-274): tombstone every doc whose postings contain ``term`` —
    answered FROM THE INDEX (term-pushdown block read), no text scan."""
    idx = (
        read_generations(spark, index_dir, "shards")
        .filter(F.col("term") == term)
        .select(
            "term", "min_doc", "max_doc", "n", "max_tf", "min_dl",
            "docs_payload", "tfs_payload",
        )
    )

    def decode(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                d, _t = decode_block(row)
                out.append(d)
            if out:
                yield pd.DataFrame({"doc_id": np.concatenate(out)})

    ids = idx.mapInPandas(decode, "doc_id long")
    return delete_ids(spark, index_dir, ids)


def compact_index(spark: SparkSession, index_dir: str) -> dict:
    """Physically drop tombstoned docs: rebuild shards/doclens/terms from
    the survivor set, clear tombstones, reset to one generation.

    Content-identical to a fresh build of the survivors (same codec, same
    block boundaries, exact per-posting dls for the skylines), so BM25
    top-k is rank-identical to a from-scratch index (pytest-asserted).
    stats.json is replaced LAST (atomic visibility point).
    """
    import json
    import shutil

    tomb = tombstones(spark, index_dir)
    stats_path = os.path.join(index_dir, "stats.json")
    with open(stats_path) as f:
        stats = json.load(f)
    if tomb is None:
        return stats
    cat = ManifestCatalog(index_dir)
    n_shards = int(cat.load("shards").props["n_shards"])

    # survivor doclens (per shard, doc-sorted like the build writes them)
    dls = read_generations(spark, index_dir, "doclens").join(
        tomb, "doc_id", "left_anti"
    )
    new_doclens = os.path.join(index_dir, "doclens_compact")
    dls.repartition(n_shards, "shard").sortWithinPartitions("doc_id").write.mode(
        "overwrite"
    ).partitionBy("shard").parquet(new_doclens)

    # survivor postings: per-shard decode → filter → re-encode; dl per
    # surviving posting comes from the shard's doclens side of the cogroup
    shards = read_generations(spark, index_dir, "shards")
    dl_clean = spark.read.parquet(new_doclens)

    def compact_shard(key, idx_pdf: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        empty = pd.DataFrame(
            {
                f.name: pd.Series(
                    dtype="object" if "payload" in f.name or f.name == "term" else "int64"
                )
                for f in INDEX_SCHEMA.fields
            }
        )
        if idx_pdf.empty:
            return empty
        keep_docs = np.sort(dl_pdf["doc_id"].to_numpy(dtype=np.int64))
        keep_dls = dl_pdf.sort_values("doc_id")["dl"].to_numpy(dtype=np.int64)
        out_frames = []
        srt = idx_pdf.sort_values(["term", "min_doc"], kind="stable")
        for term, g in srt.groupby("term", sort=False):
            d_parts, t_parts, p_parts = [], [], []
            has_pos = True
            for _, row in g.iterrows():
                d, t = decode_block(row)
                raw = row["pos_payload"]
                if raw is not None and len(raw) > 0:
                    p = decode_block_positions(row, t)
                else:
                    p, has_pos = None, False
                pos_idx = np.searchsorted(keep_docs, d)
                ok = (pos_idx < keep_docs.size) & (
                    keep_docs[np.minimum(pos_idx, keep_docs.size - 1)] == d
                )
                if not ok.any():
                    continue
                d_parts.append(d[ok])
                t_parts.append(t[ok])
                if p is not None:
                    p_parts.append(p[np.repeat(ok, t)])
            if not d_parts:
                continue
            docs = np.concatenate(d_parts)
            tfs = np.concatenate(t_parts)
            dl_pos = np.searchsorted(keep_docs, docs)
            dls_per_posting = keep_dls[dl_pos]
            seg = np.asarray([0, docs.size], dtype=np.int64)
            positions = (
                np.concatenate(p_parts) if has_pos and p_parts else None
            )
            fb = encode_blocks_flat(docs, tfs, dls_per_posting, seg, positions=positions)
            nb = fb["block_id"].size
            out_frames.append(
                pd.DataFrame(
                    {
                        "shard": np.full(nb, shard, dtype=np.int32),
                        "term": term,
                        "df": np.int64(docs.size),
                        "block_id": fb["block_id"],
                        "min_doc": fb["min_doc"],
                        "max_doc": fb["max_doc"],
                        "n": fb["n"],
                        "max_tf": fb["max_tf"],
                        "min_dl": fb["min_dl"],
                        "docs_payload": fb["docs_payload"],
                        "tfs_payload": fb["tfs_payload"],
                        "sky_tfs_payload": fb["sky_tfs_payload"],
                        "sky_dls_payload": fb["sky_dls_payload"],
                        "pos_payload": fb["pos_payload"],
                    }
                )
            )
        return pd.concat(out_frames, ignore_index=True) if out_frames else empty

    new_shards = os.path.join(index_dir, "shards_compact")
    (
        shards.groupBy("shard")
        .cogroup(dl_clean.groupBy("shard"))
        .applyInPandas(compact_shard, INDEX_SCHEMA)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(new_shards)
    )

    # new global stats + term dfs from the compacted tables
    agg = dl_clean.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    new_terms = os.path.join(index_dir, "terms_compact")
    (
        spark.read.parquet(new_shards)
        .filter(F.col("block_id") == 0)
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .write.mode("overwrite")
        .parquet(new_terms)
    )

    # swap: drop old generations, move compacted tables into place; the
    # atomic stats.json replace at the end is the visibility point
    for table in ("shards", "doclens"):
        for d in generation_dirs(index_dir, table):
            shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(os.path.join(index_dir, "terms"), ignore_errors=True)
    shutil.rmtree(os.path.join(index_dir, "merged"), ignore_errors=True)
    os.replace(new_shards, os.path.join(index_dir, "shards"))
    os.replace(new_doclens, os.path.join(index_dir, "doclens"))
    os.replace(new_terms, os.path.join(index_dir, "terms"))
    cat.drop("deletes")

    stats = {
        "n_docs": int(agg["n"]),
        "avgdl": float(agg["avgdl"] or 0.0),
        # doc_ids are NEVER reused: max_doc_id keeps its high-water mark
        # even if the top docs were deleted (append contract stays monotone)
        "max_doc_id": int(stats.get("max_doc_id", -1)),
        "generations": 1,
        "applied_batches": list(stats.get("applied_batches", [])),
    }
    _write_json_atomic(stats_path, stats)
    return stats
