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
