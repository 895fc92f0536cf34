"""Watermark / late-data semantics of the streaming leg.

Two contracts:
- ``windowed_counts`` (the exact watermarked baseline): events later
  than the watermark are DROPPED — a window that finalized never
  changes — while late events still inside the watermark merge into
  their (open) window;
- ``windowed_sketch_sink``: mergeable sketches make late data trivial —
  a late event in any later micro-batch folds into its window's sketch
  (the store keeps per-epoch partials, no finalize-then-freeze step).

Batches are sequenced deterministically the same way the checkpoint
recovery test does: separate availableNow runs over an append-only
file source, restarting from one checkpoint so the watermark state
carries across runs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sketchlib.sketches.cm import CMConfig, CountMin
from sketchlib.streaming import (WindowedSketchStore, windowed_counts,
                                 windowed_sketch_sink)

SCHEMA = "k string, ts timestamp"


def _rows(spark, rows):
    return spark.createDataFrame(
        [(k, f"2024-01-01 {t}") for k, t in rows], "k string, ts string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))


def test_windowed_counts_watermark_drops_too_late(spark, tmp_path):
    src = str(tmp_path / "wm_src")
    ckpt = str(tmp_path / "wm_ckpt")
    captured: dict = {}

    def run(df):
        df.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        agg = windowed_counts(stream, "k", "ts", window="1 hour",
                              watermark="30 minutes")

        def sink(out, epoch_id):
            for r in out.collect():  # finalized windows only (append)
                captured[(r["w"]["start"].strftime("%H:%M"), r["k"])] = r["n"]

        q = (agg.writeStream.foreachBatch(sink).outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # phase 1: 5 events in W1=[00:00,01:00), 3 in W2=[01:00,02:00),
    # 1 at 02:00 (W3) that advances the watermark to 01:30 => W1 is
    # finalized after this run
    run(_rows(spark, [("a", "00:10:00")] * 5
              + [("a", "01:10:00")] * 3 + [("a", "02:00:00")]))

    # phase 2 (restart from the same checkpoint, watermark 01:30):
    # a TOO-LATE event at 00:30 (its window closed at 01:00 < 01:30 —
    # must be dropped) and a late-but-inside event at 01:45 (W2 is
    # still open — must merge); the 04:00 row pushes the watermark to
    # 03:30 so W2 and W3 finalize
    run(_rows(spark, [("a", "00:30:00"), ("a", "01:45:00"),
                      ("a", "04:00:00")]))

    # phase 3: one flush row so the W2/W3 eviction emits even if no
    # no-data micro-batch ran at the end of phase 2
    run(_rows(spark, [("a", "06:00:00")]))

    assert captured[("00:00", "a")] == 5      # too-late row NOT counted
    assert captured[("01:00", "a")] == 3 + 1  # in-watermark late merged
    assert captured[("02:00", "a")] == 1


def test_sketch_sink_merges_late_data_across_batches(spark, tmp_path):
    """The mergeable-sketch path has no finalize step: a late event in
    a later micro-batch folds into its window's sketch, and the result
    equals the batch oracle over ALL the data."""
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    store = WindowedSketchStore()
    cfg = CMConfig(np_bits=14, nh=5, seed=7, conservative=False)
    sink = windowed_sketch_sink(store, lambda: CountMin(cfg),
                                key_col="k", ts_col="ts", window="1 hour")

    def run(df):
        df.coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (stream.writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run(_rows(spark, [("a", "00:10:00")] * 4 + [("b", "02:30:00")]))
    run(_rows(spark, [("a", "00:40:00")] * 2))   # late into W1

    w1 = "2024-01-01 00:00:00"
    assert w1 in store.windows()
    kh = np.array([spark.sql("SELECT xxhash64('a') h").collect()[0]["h"]],
                  dtype=np.int64).view(np.uint64)
    assert store.sketch(w1).estimate(kh)[0] == 6  # 4 on-time + 2 late
