"""Global sort-merge of shard-local postings with hot-term salting.

North-rule component: merge the per-shard posting lists (build.py) into
a single term-partitioned index, handling stopword-class skew
explicitly. Without salting, ``groupBy(term)`` puts ALL postings of
'the' (df ≈ N) into one task — the classic Zipf-head hot key. AQE
skew-join cannot fix an aggregation key with one giant group (SURVEY
§4), so:

- terms with global df > ``hot_df_threshold`` are split by
  ``salt = doc_id // span`` (span a global constant derived from
  n_docs), producing (term, salt) groups of bounded size whose docID
  ranges are disjoint — merged independently, concat is trivially
  correct;
- the salt explosion happens BEFORE the shuffle using only block
  metadata (plain min_doc/max_doc row predicates on the FLAT block
  layout — no decode, no Python), so the shuffle itself is balanced.

Merged impact metadata: max_tf is recomputed exactly from decoded tfs;
min_dl is propagated per-posting from source blocks (a sound lower bound
— pruning stays exact, SURVEY §7 step 6). Resume:
output is hash-bucketed by term; completed buckets are recorded in the
manifest and skipped on re-run (mid-merge idempotence, north_star).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .catalog import ManifestCatalog, PartitionEntry
from .codec import (
    BLOCK_SIZE,
    decode_blocks_flat_batch,
    decode_positions_flat_batch,
    pack_payloads,
    skyline_payloads_flat,
    varint_encode,
    varint_nbytes,
)
from .wand import load_index_meta

MERGED_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("df", T.LongType()),
        T.StructField("block_id", T.IntegerType()),
        T.StructField("min_doc", T.LongType()),
        T.StructField("max_doc", T.LongType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("max_tf", T.LongType()),
        T.StructField("min_dl", T.LongType()),
        T.StructField("docs_payload", T.BinaryType()),
        T.StructField("tfs_payload", T.BinaryType()),
        T.StructField("sky_tfs_payload", T.BinaryType()),
        T.StructField("sky_dls_payload", T.BinaryType()),
        T.StructField("pos_payload", T.BinaryType()),
    ]
)


def _merge_group_fn(span: int):
    def merge_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term, salt, bucket = key[0], int(key[1]), int(key[2])
        # salt == -1 is the unsalted sentinel: full doc range, stored as salt 0
        if salt < 0:
            lo, hi, salt = 0, 1 << 62, 0
        else:
            lo, hi = salt * span, (salt + 1) * span
        # batch-decode ALL source blocks of this (term, salt) group in one
        # vectorized pass (no per-block Python; VERDICT r02 #3 — a salted
        # hot-term group is ~500k blocks at 100× scale)
        d_flat, t_flat, off = decode_blocks_flat_batch(
            pdf["min_doc"].to_numpy(), pdf["docs_payload"].tolist(),
            pdf["tfs_payload"].tolist(),
        )
        counts = np.diff(off)
        sel = (d_flat >= lo) & (d_flat < hi)  # boundary blocks overlap salt ranges
        docs = d_flat[sel]
        tfs = t_flat[sel]
        ubs = np.repeat(pdf["min_dl"].to_numpy(dtype=np.int64), counts)[sel]
        # positional payloads ride along: select the kept postings' token
        # runs (token mask = per-posting selection repeated tf). Blocks
        # without positions → positions disabled for the whole merged term
        # (mixed payloads are unusable).
        raw_pos = pdf["pos_payload"].tolist()
        all_pos = all(p is not None and len(p) > 0 for p in raw_pos)
        if all_pos and docs.size:
            pos = decode_positions_flat_batch(raw_pos, t_flat)[
                np.repeat(sel, t_flat)
            ]
        else:
            pos = np.empty(0, dtype=np.int64)
        if docs.size == 0:
            return pd.DataFrame(
                {
                    "bucket": pd.Series(dtype="int32"),
                    "term": pd.Series(dtype="object"),
                    "salt": pd.Series(dtype="int32"),
                    "df": pd.Series(dtype="int64"),
                    "block_id": pd.Series(dtype="int32"),
                    "min_doc": pd.Series(dtype="int64"),
                    "max_doc": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int32"),
                    "max_tf": pd.Series(dtype="int64"),
                    "min_dl": pd.Series(dtype="int64"),
                    "docs_payload": pd.Series(dtype="object"),
                    "tfs_payload": pd.Series(dtype="object"),
                    "sky_tfs_payload": pd.Series(dtype="object"),
                    "sky_dls_payload": pd.Series(dtype="object"),
                    "pos_payload": pd.Series(dtype="object"),
                }
            )
        order = np.argsort(docs)  # k-way merge of sorted runs ≡ global sort
        has_pos = pos.size > 0
        if has_pos:
            # gather variable-length token runs in the postings' new order
            old_off = np.zeros(tfs.size + 1, dtype=np.int64)
            np.cumsum(tfs, out=old_off[1:])
            new_tf = tfs[order]
            new_off = np.zeros(new_tf.size + 1, dtype=np.int64)
            np.cumsum(new_tf, out=new_off[1:])
            gather = (
                np.repeat(old_off[order], new_tf)
                + np.arange(pos.size, dtype=np.int64)
                - np.repeat(new_off[:-1], new_tf)
            )
            pos = pos[gather]
        docs, tfs, ubs = docs[order], tfs[order], ubs[order]
        if docs.size > 1 and (np.diff(docs) == 0).any():
            raise ValueError(f"duplicate doc_id in merged postings for term {term!r}")

        n = docs.size
        starts = np.arange(0, n, BLOCK_SIZE, dtype=np.int64)
        ends = np.minimum(starts + BLOCK_SIZE, n)
        deltas = np.empty(n, dtype=np.uint64)
        deltas[0] = 0
        deltas[1:] = np.diff(docs).astype(np.uint64)
        deltas[starts] = 0
        docs_payloads = pack_payloads(deltas, starts, ends)
        tfs_payloads = pack_payloads((tfs - 1).astype(np.uint64), starts, ends)
        bmax_tf = np.maximum.reduceat(tfs, starts)
        bmin_dl = np.minimum.reduceat(ubs, starts)
        # merged skyline: exact tfs x propagated per-posting dl lower
        # bounds — all blocks in one vectorized pass
        sky_t_pl, sky_d_pl = skyline_payloads_flat(tfs, ubs, starts, ends)
        if has_pos:
            tok_off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(tfs, out=tok_off[1:])
            pos_delta = np.empty(pos.size, dtype=np.uint64)
            pos_delta[0] = pos[0]
            pos_delta[1:] = (pos[1:] - pos[:-1]).astype(np.uint64)
            pos_delta[tok_off[:-1]] = pos[tok_off[:-1]].astype(np.uint64)
            pos_pl = pack_payloads(pos_delta, tok_off[starts], tok_off[ends])
        else:
            pos_pl = [b""] * starts.size
        return pd.DataFrame(
            {
                "bucket": np.full(starts.size, bucket, dtype=np.int32),
                "term": term,
                "salt": np.full(starts.size, salt, dtype=np.int32),
                "df": np.int64(n),
                "block_id": np.arange(starts.size, dtype=np.int32),
                "min_doc": docs[starts],
                "max_doc": docs[ends - 1],
                "n": (ends - starts).astype(np.int32),
                "max_tf": bmax_tf.astype(np.int64),
                "min_dl": bmin_dl.astype(np.int64),
                "docs_payload": docs_payloads,
                "tfs_payload": tfs_payloads,
                "sky_tfs_payload": sky_t_pl,
                "sky_dls_payload": sky_d_pl,
                "pos_payload": pos_pl,
            }
        )

    return merge_group


def merge_index(
    spark: SparkSession,
    index_dir: str,
    hot_df_threshold: int | None = None,
    n_salts: int = 16,
    n_buckets: int = 32,
    resume: bool = True,
) -> str:
    """Merge shard-local postings into merged/ (term-partitioned, salted).

    Returns the merged directory path.
    """
    stats = load_index_meta(spark, index_dir)
    n_docs = int(stats["n_docs"])
    if hot_df_threshold is None:
        hot_df_threshold = max(64, n_docs // 10)
    span = max(1, -(-n_docs // n_salts))

    cat = ManifestCatalog(index_dir)
    merged_dir = os.path.join(index_dir, "merged")
    done = cat.committed_partitions("merged", "merge") if resume else set()
    missing = sorted(set(range(n_buckets)) - done)
    if not missing:
        return merged_dir
    cat.clean_uncommitted("merged", partition_col="bucket")

    from .build import read_generations

    shards = read_generations(spark, index_dir, "shards")
    tdf = spark.read.parquet(os.path.join(index_dir, "terms"))
    hot = tdf.filter(F.col("df") > hot_df_threshold).select(
        "term", F.lit(True).alias("is_hot")
    )

    bucketed = (
        shards.withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
        .filter(F.col("bucket").isin(missing))
        .join(F.broadcast(hot), "term", "left")
    )
    # explode hot terms into per-salt rows; keep only blocks whose doc
    # range intersects the salt range (plain metadata predicates — JVM);
    # non-hot terms get sentinel salt -1 = unsalted full range
    salted = (
        bucketed.withColumn(
            "salt",
            F.explode(
                F.when(
                    F.col("is_hot").isNotNull(),
                    F.sequence(F.lit(0), F.lit(n_salts - 1)),
                ).otherwise(F.array(F.lit(-1)))
            ),
        )
        .filter(
            (F.col("salt") < 0)
            | (
                (F.col("max_doc") >= F.col("salt").cast("long") * F.lit(span))
                & (F.col("min_doc") < (F.col("salt").cast("long") + 1) * F.lit(span))
            )
        )
        .select(
            "bucket", "term", "salt", "shard", "block_id",
            "min_doc", "max_doc", "n", "max_tf", "min_dl", "docs_payload",
            "tfs_payload", "sky_tfs_payload", "sky_dls_payload", "pos_payload",
        )
    )

    t0 = time.time()
    merged = salted.groupBy("term", "salt", "bucket").applyInPandas(
        _merge_group_fn(span), MERGED_SCHEMA
    )
    merged.write.partitionBy("bucket").mode("append").parquet(merged_dir)
    wall = int((time.time() - t0) * 1000)

    lineage = {
        r["bucket"]: r
        for r in spark.read.parquet(merged_dir)
        .filter(F.col("bucket").isin(missing))
        .groupBy("bucket")
        .agg(
            F.count_distinct("term", "salt").alias("rows"),
            F.sum(F.when(F.col("block_id") == 0, F.col("df"))).alias("postings"),
        )
        .collect()
    }
    cat.commit(
        "merged",
        [
            PartitionEntry(
                partition_id=bkt,
                stage="merge",
                input_rows=int(lineage[bkt]["postings"]) if bkt in lineage else 0,
                docs=0,
                terms=int(lineage[bkt]["rows"]) if bkt in lineage else 0,
                bytes=0,
                wall_ms=wall,
            )
            for bkt in missing
        ],
        props={"n_salts": n_salts, "span": span, "hot_df_threshold": hot_df_threshold,
               "n_buckets": n_buckets},
    )
    return merged_dir


def merged_postings(spark: SparkSession, index_dir: str, terms: list[str]) -> DataFrame:
    """Decode merged postings for given terms → (term, doc_id, tf) long form.

    Used by tests (merged == single-shot) and the term-lookup query path.
    Parquet predicate pushdown keeps the scan to the requested terms.
    """
    merged = spark.read.parquet(os.path.join(index_dir, "merged")).filter(
        F.col("term").isin(terms)
    )

    def decode(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            d, t, off = decode_blocks_flat_batch(
                pdf["min_doc"].to_numpy(), pdf["docs_payload"].tolist(),
                pdf["tfs_payload"].tolist(),
            )
            if d.size:
                yield pd.DataFrame(
                    {
                        "term": np.repeat(pdf["term"].to_numpy(), np.diff(off)),
                        "doc_id": d,
                        "tf": t,
                    }
                )

    from .deletes import filter_deleted

    return filter_deleted(
        spark, index_dir, merged.mapInPandas(decode, "term string, doc_id long, tf long")
    )
