"""Multimodal plumbing: schema, deterministic stub features, frame sampling."""

from __future__ import annotations

from es_loaders_spark.multimodal import (
    FEATURE_DIM,
    extract_features,
    sample_frames,
    synthesize_media,
)


def test_media_schema_and_features(spark):
    media = synthesize_media(spark, n=30).cache()
    assert media.count() == 30
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["features"]) == FEATURE_DIM
    # deterministic across runs and partitioning
    again = {r["media_id"]: r["features"] for r in extract_features(media.repartition(5)).collect()}
    first = {r["media_id"]: r["features"] for r in feats}
    assert first == again


def test_frame_sampling_schedule(spark):
    media = synthesize_media(spark, n=30)
    frames = sample_frames(media, every_n=10).collect()
    vids = {r["media_id"] for r in frames}
    assert vids  # every 3rd row is a video
    by_media: dict = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in by_media.items():
        assert idxs == sorted(idxs)
        assert all(i % 10 == 0 for i in idxs)
