"""Multimodal column plumbing: opaque binary payloads with typed
metadata, processed by Arrow-batched kernels.

The image/audio decode libraries are not in this container, so the
decode step is STUBBED behind ``decoder=`` hooks (a deterministic fake
by default, clearly marked); everything Spark-side — schema, batch
iteration, partitioning, output shape — is real and tested. Swapping in
a real decoder (PIL / torchaudio / pyav) changes one function.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),     # image|audio|video
    T.StructField("payload", T.BinaryType(), False),  # opaque encoded bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])


def synthetic_media(spark: SparkSession, n: int, seed: int = 42,
                    partitions: int = 8) -> DataFrame:
    """Deterministic fake media table. Payload bytes follow a closed
    arithmetic form — ``byte[k] = (id*131 + k*17 + seed) % 256`` over a
    length of ``256 + (id*37) % 256`` — so an independent engine
    (the DuckDB oracle) can reproduce the exact bytes/feature sums and
    strict-equality-gate the whole mapInPandas pipeline, which an RNG
    payload cannot. The plumbing (binary column built per Arrow batch,
    nullable typed metadata) is unchanged from a real media table."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                i = int(i)
                kind = ["image", "audio", "video"][i % 3]
                length = 256 + (i * 37) % 256
                payload = bytes(((i * 131 + np.arange(length) * 17 + seed)
                                 % 256).astype(np.uint8))
                rows.append({
                    "media_id": i,
                    "kind": kind,
                    "payload": payload,
                    "mime": {"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind],
                    "width": 64 + (i * 13) % 1856 if kind != "audio" else None,
                    "height": 64 + (i * 11) % 1016 if kind != "audio" else None,
                    "duration_ms": (500 + (i * 197) % 59500
                                    if kind != "image" else None),
                })
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)


def fake_decode_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB decoder: deterministic pseudo-features — feature j is the
    sum of payload bytes at positions ``k ≡ j (mod dim)`` (a strided
    byte histogram; every value is an integer exactly representable in
    float32). A real deployment replaces this with actual decode +
    model inference; the Spark plumbing (Arrow batches in, fixed-dim
    float vectors out) is identical.
    """
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    out = np.zeros(dim, dtype=np.int64)
    np.add.at(out, np.arange(raw.size) % dim, raw)
    return out.astype(np.float32)


def _unsupported_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    raise NotImplementedError(
        "real media decoding requires PIL/pyav/torchaudio — not present "
        "in this environment; pass decoder=fake_decode_features or a "
        "real decoder")


def extract_features(df: DataFrame, dim: int = 16,
                     decoder: Callable[[bytes, int], np.ndarray]
                     = fake_decode_features) -> DataFrame:
    """(media_id, kind, feature array<float>) via mapInPandas — one
    Arrow batch per call, features vectorized per batch."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(bytes(p), dim).tolist()
                     for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "feature": feats})

    return df.mapInPandas(
        per_batch, schema="media_id long, kind string, feature array<float>")


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame to decode
    (media_id, frame_idx, ts_ms). The decode itself is the stubbed
    step; the explode is the real distributed work distribution."""
    vids = df.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.posexplode(F.sequence(
            F.lit(0), (F.col("duration_ms") / every_ms).cast("int")))
        .alias("frame_idx", "ts_s"),
    ).select("media_id", "frame_idx",
             (F.col("frame_idx") * every_ms).alias("ts_ms"))
