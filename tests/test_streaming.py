"""Structured Streaming: windowed counts equal batch aggregation; file sink."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from es_loaders_spark.streaming.pipeline import incremental_load, windowed_event_counts


def test_windowed_counts_match_batch(spark, sf_dir, tmp_path):
    # driver parquet stores ts as TIMESTAMP_NTZ; watermarks need TIMESTAMP
    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["win_start"], r["event_type"]): (r["n"], round(r["total_value"], 4))
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r["win_start"], r["event_type"]): (r["n"], round(r["total_value"], 4))
        for r in events.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n", "total_value")
        .collect()
    }
    # append-mode emits only watermark-closed windows: everything emitted
    # must match batch, and most windows must have been emitted
    assert got
    for k, v in got.items():
        assert want[k] == v
    assert len(got) >= len(want) - 5  # tail windows may still be open


def test_incremental_load_exactly_once(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "src2")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    q = incremental_load(stream.select("event_id", "ts", "value"), out, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 == events.count()
    # re-run with same checkpoint: no new data → no duplicates (W6 analogue)
    stream2 = spark.readStream.schema(events.schema).parquet(src)
    q2 = incremental_load(stream2.select("event_id", "ts", "value"), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_stream_index_updates(spark, tmp_path):
    """File stream → per-batch index generations → queryable BM25 index."""
    from es_loaders_spark.corpus import synthesize_web_pages
    from es_loaders_spark.extract import extract_text
    from es_loaders_spark.streaming.pipeline import stream_index_updates
    from es_loaders_spark.wand import topk

    pages = synthesize_web_pages(spark, 300, seed=9).withColumn(
        "text2", extract_text(F.col("html"))
    )
    src = str(tmp_path / "docsrc")
    schema = "url string, text string"
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt_idx")

    # arrival 1 → availableNow run builds the index
    pages.filter(F.col("url") < "https://site150").select(
        "url", F.col("text2").alias("text")
    ).coalesce(1).write.mode("append").parquet(src)
    q = stream_index_updates(spark.readStream.schema(schema).parquet(src), idx, ckpt)
    q.awaitTermination(180)

    # arrival 2 → next availableNow run appends a generation (checkpoint
    # skips the already-processed file — the W6 high-watermark analogue)
    pages.filter(F.col("url") >= "https://site150").select(
        "url", F.col("text2").alias("text")
    ).coalesce(1).write.mode("append").parquet(src)
    q = stream_index_updates(spark.readStream.schema(schema).parquet(src), idx, ckpt)
    q.awaitTermination(180)

    import json, os

    with open(os.path.join(idx, "stats.json")) as f:
        stats = json.load(f)
    assert stats["n_docs"] == 300
    assert stats["generations"] >= 2  # at least initial build + one append

    hits = topk(spark, idx, "spark crawl the", k=5).collect()
    assert len(hits) == 5
    assert hits[0]["score"] >= hits[-1]["score"]

    # restart with same checkpoint: no new files → no new generations
    q2 = stream_index_updates(spark.readStream.schema(schema).parquet(src), idx, ckpt)
    q2.awaitTermination(120)
    with open(os.path.join(idx, "stats.json")) as f:
        assert json.load(f)["n_docs"] == 300


def test_stateful_group_totals_carry_across_batches(spark, sf_dir, tmp_path):
    """W2 streaming analogue: group state carries across micro-batches —
    final per-key totals equal the batch groupBy even though each key's
    rows are split across multiple single-file batches."""
    from es_loaders_spark.streaming.pipeline import stateful_group_totals

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "src3")
    # 3 files → with maxFilesPerTrigger=1, 3 micro-batches splitting keys
    events.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stateful_group_totals(stream, key_col="user_id")
    sink = str(tmp_path / "sink3")

    # update-mode emissions captured via foreachBatch (file sinks are
    # append-only); each micro-batch appends its updated keys
    def capture(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)

    q = (
        out.writeStream.foreachBatch(capture)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    import pandas as pd

    emitted = spark.read.parquet(sink).toPandas()
    # last emission per key = largest n (monotone running totals)
    final = emitted.sort_values("n").groupby("key").last()
    want = {
        r["user_id"]: (r["n"], round(r["t"], 4))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    got = {int(k): (int(v["n"]), round(float(v["total_value"]), 4)) for k, v in final.iterrows()}
    assert got == want
    # state genuinely carried: some key must have been emitted more than once
    assert (emitted.groupby("key").size() > 1).any()


def test_stream_index_updates_tiered_merge_bounds_generations(spark, tmp_path):
    """A long-running stream's per-batch generations get collapsed by the
    tiered merge hook (merge_every), keeping fan-in bounded while results
    match an unbounded run."""
    from es_loaders_spark.corpus import synthesize_web_pages
    from es_loaders_spark.extract import extract_text
    from es_loaders_spark.streaming.pipeline import stream_index_updates
    from es_loaders_spark.wand import topk

    pages = synthesize_web_pages(spark, 240, seed=11).withColumn(
        "text2", extract_text(F.col("html"))
    )
    schema = "url string, text string"
    cuts = ["https://site060", "https://site120", "https://site180", None]

    def run(idx, ckpt, src, merge_every):
        lo = ""
        for hi in cuts:
            part = pages.filter(F.col("url") >= lo)
            if hi is not None:
                part = part.filter(F.col("url") < hi)
                lo = hi
            part.select("url", F.col("text2").alias("text")).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q = stream_index_updates(
                spark.readStream.schema(schema).parquet(src), idx, ckpt,
                merge_every=merge_every,
            )
            q.awaitTermination(180)

    idx_m, idx_u = str(tmp_path / "idx_m"), str(tmp_path / "idx_u")
    run(idx_m, str(tmp_path / "ck_m"), str(tmp_path / "src_m"), merge_every=2)
    run(idx_u, str(tmp_path / "ck_u"), str(tmp_path / "src_u"), merge_every=0)

    import json, os

    gm = json.load(open(os.path.join(idx_m, "stats.json")))
    gu = json.load(open(os.path.join(idx_u, "stats.json")))
    assert gm["n_docs"] == gu["n_docs"] == 240
    assert gu["generations"] == 4  # build + 3 appends, unmerged
    assert gm["generations"] < gu["generations"]  # tiered merge collapsed
    for q in ["spark crawl the", "page data w0003"]:
        a = [(r["doc_id"], r["score"]) for r in topk(spark, idx_m, q, k=10).collect()]
        b = [(r["doc_id"], r["score"]) for r in topk(spark, idx_u, q, k=10).collect()]
        assert a == b


def test_stream_ann_updates(spark, tmp_path):
    """Vector streaming (r6): first batch builds the IVF index, later
    batches append with the stored quantizer; probes see appends
    immediately; a double-applied batch cannot duplicate vectors
    (idempotent partition-pruned anti-join)."""
    import shutil

    from pyspark.sql import functions as F

    from es_loaders_spark.similarity import ann_topk, cosine_topk
    from es_loaders_spark.streaming.pipeline import stream_ann_updates

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    src_dir = str(tmp_path / "vec_src")
    # two "arrivals": maxFilesPerTrigger=1 → two micro-batches
    emb.filter(F.col("vec_id") < n // 2).coalesce(1).write.parquet(
        f"{src_dir}/a.parquet")
    emb.filter(F.col("vec_id") >= n // 2).coalesce(1).write.parquet(
        f"{src_dir}/b.parquet")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    idx = str(tmp_path / "vec_idx")
    ckpt = str(tmp_path / "vec_ckpt")
    q = stream_ann_updates(stream, idx, ckpt, kind="ivf", n_centroids=4)
    q.awaitTermination(120)

    assert spark.read.parquet(idx).count() == n  # no loss, no dup
    qv = [float(x) for x in emb.filter("vec_id = 1").select("embedding").first()[0]]
    got = [(r["vec_id"], r["cosine"]) for r in ann_topk(spark, idx, qv, k=5).collect()]
    want = [(r["vec_id"], r["cosine"]) for r in cosine_topk(emb, qv, k=5).collect()]
    assert got == want

    # crash-window replay: re-appending batch b's rows must be a no-op
    from es_loaders_spark.similarity import evict_ann_counts
    from es_loaders_spark.streaming.pipeline import stream_ann_updates as _s

    # simulate by deleting the marker and re-running the same source
    import json, os
    mp = os.path.join(idx, "_applied_batches.json")
    with open(mp) as f:
        tags = json.load(f)["batches"]
    os.remove(mp)
    ckpt2 = str(tmp_path / "vec_ckpt2")
    stream2 = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    q2 = _s(stream2, idx, ckpt2, kind="ivf", n_centroids=4)
    q2.awaitTermination(120)
    evict_ann_counts(idx)
    assert spark.read.parquet(idx).count() == n, "replay duplicated vectors"
