"""Multimodal columns: opaque binary media with typed metadata.

Images/audio/video are carried as ``binary`` columns plus a metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages. The container has no image/audio
libraries, so the decoder bodies are STUBS behind ``import``-guards —
the Spark-side plumbing (schema, partitioning, UDF signatures, batch
shapes) is real and tested with a deterministic fake decoder.

Design notes for 100 TB: media bytes dominate row size, so stages
``select`` only (id, media) before the UDF (column pruning keeps Arrow
transfer minimal), and ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds per-batch memory; feature outputs are small fixed-width arrays.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(256 + (i % 5) * 64)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (64 + i % 8, 48 + i % 8, 16000, 30 + i % 10),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Decode image bytes → HxWx3 array. STUB: no codec libs in container.

    Real implementation would use Pillow/torchvision here. The
    deterministic fake derives pixels from the payload hash so the
    pipeline is testable end-to-end.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        digest = hashlib.sha256(payload).digest()
        base = np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
        return np.resize(base, (height, width, 3))
    raise NotImplementedError("real image decode not wired in this environment")


def extract_features(media: DataFrame) -> DataFrame:
    """media → (media_id, kind, features array<float>) via mapInPandas.

    One Arrow pass; per-batch vectorized feature reduction. Output is
    narrow (id + FEATURE_DIM floats), so downstream joins broadcast.
    """

    def run(batches):
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                arr = _decode_image(bytes(payload), meta["width"], meta["height"])
                flat = arr.reshape(-1)
                chunks = np.array_split(flat, FEATURE_DIM)
                feats.append([float(np.round(c.mean(), 4)) for c in chunks])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    schema = "media_id long, kind string, features array<double>"
    return media.select("media_id", "kind", "payload", "meta").mapInPandas(run, schema)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """video rows → (media_id, frame_idx) frame-sampling plan (metadata only).

    Frame extraction itself is a decode stub; the sampling schedule is
    real Catalyst (explode over a sequence — no Python).
    """
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
