"""streaming_dedup: first-seen exact dedup with cross-micro-batch
state, checked against the batch dedup ground truth."""

from __future__ import annotations

import pandas as pd

from sketchlib.streaming import streaming_dedup


def test_streaming_dedup_cross_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # file A: ten docs over five distinct texts (each duplicated once)
    pd.DataFrame({"doc_id": range(10),
                  "text": [f"t{i % 5}" for i in range(10)]}
                 ).to_parquet(src / "a.parquet")
    # file B: five repeats of file A's texts + five genuinely new ones
    pd.DataFrame({"doc_id": range(10, 20),
                  "text": [f"t{i}" for i in range(10)]}
                 ).to_parquet(src / "b.parquet")

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1")  # force >1 micro-batch
              .parquet(str(src)))
    q = (streaming_dedup(stream)
         .writeStream.format("memory").queryName("dedup_sink")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.sql("SELECT text FROM dedup_sink").toPandas()
    # exactly one survivor per distinct text, including duplicates that
    # arrived in a LATER micro-batch than their first occurrence
    assert sorted(got["text"]) == sorted(f"t{i}" for i in range(10))


def test_streaming_dedup_watermarked(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ts = pd.Timestamp("2026-01-01 00:00:00")
    df = pd.DataFrame({"doc_id": range(6),
                       "text": ["a", "a", "b", "b", "c", "c"],
                       "ts": [ts + pd.Timedelta(seconds=i)
                              for i in range(6)]})
    # watermarks require tz-aware TIMESTAMP; micros not pandas-default
    # nanos (Spark reads INT64 nanos as a type mismatch)
    df["ts"] = df["ts"].dt.tz_localize("UTC").astype("datetime64[us, UTC]")
    df.to_parquet(src / "a.parquet")

    stream = (spark.readStream
              .schema("doc_id long, text string, ts timestamp")
              .parquet(str(src)))
    q = (streaming_dedup(stream, ts_col="ts", watermark="1 hour")
         .writeStream.format("memory").queryName("dedup_wm_sink")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.sql("SELECT text FROM dedup_wm_sink").toPandas()
    assert sorted(got["text"]) == ["a", "b", "c"]


def test_streaming_minhash_delta_matches_batch_recompute(spark, tmp_path):
    """Streaming near-dup detection (round 5): each micro-batch dedups
    against the persistent band+shingle index and then appends to it.
    Over two micro-batches the union of emitted pairs must equal the
    batch-mode full recompute over everything — including cross-batch
    pairs found when the LATER member arrives."""
    from pyspark.sql import functions as F

    from sketchlib.dedup import minhash_dedup_pairs
    from sketchlib.streaming import minhash_delta_sink

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark quiet forest tonight")
    texts_a = [f"{base} variant {i}" for i in range(5)]
    texts_a += texts_a[:2]                       # in-batch exact dups
    texts_b = [f"{base} variant {i}" for i in (0, 3)]  # cross-batch dups
    texts_b += [f"totally different text about {i} ships sailing the "
                f"wide open sea under a red morning sky {i}"
                for i in range(3)]
    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame({"doc_id": range(len(texts_a)),
                  "text": texts_a}).to_parquet(src / "a.parquet")
    pd.DataFrame({"doc_id": range(100, 100 + len(texts_b)),
                  "text": texts_b}).to_parquet(src / "b.parquet")

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src)))
    sink = minhash_delta_sink(str(tmp_path / "index"),
                              str(tmp_path / "pairs"), threshold=0.9)
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = {(r["id_a"], r["id_b"]) for r in
           spark.read.option("basePath", str(tmp_path / "pairs"))
           .parquet(str(tmp_path / "pairs")).collect()}
    all_docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts_a)]
        + [(100 + i, t) for i, t in enumerate(texts_b)],
        "doc_id long, text string")
    want = {(r["id_a"], r["id_b"]) for r in
            minhash_dedup_pairs(all_docs, threshold=0.9).collect()}
    assert got == want
    assert any(a < 100 <= b for a, b in got)     # cross-batch pair found
