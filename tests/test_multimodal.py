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


def test_ppm_codec_hand_computed():
    """Real decode against a hand-written PPM fixture (VERDICT r01 item 9)."""
    import numpy as np

    from es_loaders_spark.multimodal import decode_ppm, encode_ppm, resize_nearest

    # 2x2 RGB image, hand-assembled bytes
    raw = b"P6\n2 2\n255\n" + bytes(
        [255, 0, 0,   0, 255, 0,
           0, 0, 255, 10, 20, 30]
    )
    arr = decode_ppm(raw)
    assert arr.shape == (2, 2, 3)
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[1, 1].tolist() == [10, 20, 30]
    # comments + extra whitespace in header
    commented = b"P6\n# a comment\n 2\t2 # trailing\n255\n" + raw[11:]
    assert np.array_equal(decode_ppm(commented), arr)
    # round trip
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)
    # nearest-neighbor upscale doubles each pixel
    up = resize_nearest(arr, 4, 4)
    assert up.shape == (4, 4, 3)
    assert np.array_equal(up[0, 0], arr[0, 0]) and np.array_equal(up[3, 3], arr[1, 1])


def test_wav_codec_hand_computed():
    import struct

    import numpy as np

    from es_loaders_spark.multimodal import decode_wav, encode_wav

    samples = np.array([[0], [1000], [-1000], [32767]], dtype=np.int16)
    payload = encode_wav(samples, 8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    got, sr = decode_wav(payload)
    assert sr == 8000
    assert np.array_equal(got, samples)
    # hand-assembled wav with an extra LIST chunk between fmt and data
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = struct.pack("<4h", 5, -5, 7, -7)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    got2, _ = decode_wav(raw)
    assert got2[:, 0].tolist() == [5, -5, 7, -7]


def test_resize_images_stage(spark):
    import numpy as np

    from es_loaders_spark.multimodal import decode_ppm, resize_images

    media = synthesize_media(spark, n=12)
    out = {r["media_id"]: bytes(r["payload"]) for r in resize_images(media, 16, 12).collect()}
    assert len(out) == 4  # every 3rd row is an image
    for payload in out.values():
        assert decode_ppm(payload).shape == (12, 16, 3)
