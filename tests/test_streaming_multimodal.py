"""Structured Streaming windowed sketches + multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.multimodal import (MEDIA_SCHEMA, extract_features,
                                  fake_decode_features, frame_sample_plan,
                                  synthetic_media, _unsupported_decode)
from sketchlib.sketches.cm import CMConfig, CountMin
from sketchlib.streaming import (WindowedSketchStore, windowed_counts,
                                 windowed_sketch_sink)

SF = "/root/testdata/sf0.01"


def test_streaming_windowed_cm_matches_batch_oracle(spark, tmp_path):
    # stage events as a file stream source
    src = str(tmp_path / "stream_src")
    ev = spark.read.parquet(f"{SF}/events.parquet").limit(4000)
    ev.repartition(4).write.parquet(src)

    stream = (spark.readStream.schema(ev.schema).parquet(src)
              .withColumn("ts", F.col("ts")))
    store = WindowedSketchStore()
    cfg = CMConfig(np_bits=16, nh=5, seed=137, conservative=False)
    sink = windowed_sketch_sink(store, lambda: CountMin(cfg),
                                key_col="event_type", ts_col="ts",
                                window="1 hour")
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # exact per-window oracle from the batch path
    batch = (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n"))
             .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                      .alias("ws"), "event_type", "n")
             .toPandas())
    assert store.windows(), "no windows committed"
    kh = (ev.select(F.col("event_type"), F.xxhash64("event_type").alias("kh"))
          .distinct().toPandas())
    key_hash = dict(zip(kh["event_type"], kh["kh"]))
    for ws in store.windows():
        sk = store.sketch(ws)
        sub = batch[batch["ws"] == ws]
        assert len(sub), ws
        keys = np.array([key_hash[e] for e in sub["event_type"]],
                        dtype=np.int64).view(np.uint64)
        est = sk.estimate(keys)
        np.testing.assert_array_equal(est,
                                      sub["n"].to_numpy().astype(np.uint64))


def test_streaming_replayed_epoch_idempotent():
    store = WindowedSketchStore()
    cfg = CMConfig(np_bits=12, nh=3, seed=1, conservative=False)
    sk = CountMin(cfg)
    sk.update(np.arange(100, dtype=np.uint64))
    store.commit(0, epoch_id=7, blob=sk.to_bytes())
    store.commit(0, epoch_id=7, blob=sk.to_bytes())  # replay
    est = store.sketch(0).estimate(np.arange(100, dtype=np.uint64))
    assert (est == 1).all()  # not double-counted


def test_multimodal_features_and_frame_plan(spark):
    media = synthetic_media(spark, 60, seed=9, partitions=4).cache()
    assert media.schema == MEDIA_SCHEMA
    feats = extract_features(media, dim=16).toPandas()
    assert len(feats) == 60
    assert all(len(f) == 16 for f in feats["feature"])
    # determinism: same payload -> same features
    one = media.filter(F.col("media_id") == 3).toPandas()
    f1 = fake_decode_features(bytes(one["payload"][0]), 16)
    row = feats[feats["media_id"] == 3]["feature"].iloc[0]
    np.testing.assert_allclose(np.array(row, dtype=np.float32), f1)

    plan = frame_sample_plan(media, every_ms=5000).toPandas()
    vids = media.filter(F.col("kind") == "video").toPandas()
    assert set(plan["media_id"]) == set(vids["media_id"])
    expect = int((vids["duration_ms"] // 5000 + 1).sum())
    assert len(plan) == expect

    with pytest.raises(Exception):
        extract_features(media, dim=16,
                         decoder=_unsupported_decode).count()

def test_stateful_sketch_stream_applyinpandaswithstate(spark, tmp_path):
    """applyInPandasWithState custom stateful operator: per-key HLL of
    a value column, updated across micro-batches, verified against the
    exact batch distinct count."""
    from sketchlib.sketches.base import deserialize
    from sketchlib.sketches.hll import HyperLogLog
    from sketchlib.streaming import stateful_sketch_stream

    src = str(tmp_path / "state_src")
    ev = spark.read.parquet(f"{SF}/events.parquet").limit(6000)
    ev.repartition(3).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = stateful_sketch_stream(stream, "event_type", "user_id",
                                 lambda: HyperLogLog(14))
    q = (out.writeStream.format("memory").queryName("state_out")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "state_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    # last emitted row per key carries the final state
    res = spark.sql("""
        SELECT key, n_seen, blob FROM (
          SELECT *, row_number() OVER (PARTITION BY key
                                       ORDER BY n_seen DESC) AS rn
          FROM state_out) WHERE rn = 1""").collect()
    assert res, "no stateful output"
    exact = {r["event_type"]: (r["n"], r["d"]) for r in
             ev.groupBy("event_type")
               .agg(F.count("*").alias("n"),
                    F.countDistinct("user_id").alias("d")).collect()}
    assert {r.key for r in res} == set(exact)
    for r in res:
        n_rows, n_distinct = exact[r.key]
        assert r.n_seen == n_rows
        est = deserialize(bytes(r.blob)).estimate()
        # p=14 HLL: ~0.8% expected rel. error; allow 5%
        assert abs(est - n_distinct) <= max(3, 0.05 * n_distinct)


def test_stateful_stream_checkpoint_recovery_bitexact(spark, tmp_path):
    """Kill/restart recovery: run the stateful sketch stream over phase
    1, stop, add phase-2 files, RESTART from the same checkpoint, and
    assert the recovered per-key sketches are bit-identical to an
    uninterrupted run over all the data (HLL registers are
    order-independent max-merges, so equality is exact). The memory
    sink can't recover from a checkpoint, so output is captured via
    foreachBatch (which can)."""
    from sketchlib.sketches.base import deserialize
    from sketchlib.sketches.hll import HyperLogLog
    from sketchlib.streaming import stateful_sketch_stream

    ev = spark.read.parquet(f"{SF}/events.parquet").limit(6000)
    src = str(tmp_path / "rec_src")
    p1 = ev.filter(F.col("event_id") % 2 == 0)
    p2 = ev.filter(F.col("event_id") % 2 == 1)
    p1.repartition(2).write.mode("append").parquet(src)

    def run(ckpt, capture):
        stream = spark.readStream.schema(ev.schema).parquet(src)
        out = stateful_sketch_stream(stream, "event_type", "user_id",
                                     lambda: HyperLogLog(12))

        def sink(df, epoch_id):
            for r in df.collect():   # tiny: one row per touched key
                capture[r.key] = (r.n_seen, bytes(r.blob))

        q = (out.writeStream.foreachBatch(sink)
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    ckpt = str(tmp_path / "rec_ckpt")
    final: dict = {}
    run(ckpt, final)                                # phase 1
    p2.repartition(3).write.mode("append").parquet(src)
    run(ckpt, final)                                # restart, phase 2 only

    full: dict = {}
    run(str(tmp_path / "rec_ckpt2"), full)          # uninterrupted oracle

    assert set(final) == set(full) and final
    n_phase1 = p1.count()
    assert sum(n for n, _ in final.values()) == ev.count()
    assert sum(n for n, _ in final.values()) > n_phase1  # state restored
    for k, (n_seen, blob) in final.items():
        a = deserialize(blob)
        b = deserialize(full[k][1])
        assert (a.registers == b.registers).all()
        assert n_seen == full[k][0]


def test_streaming_window_drift_matches_batch_ks(spark, tmp_path):
    """Streaming drift monitor: per-window KLL value sketches fed by
    foreachBatch; KS between consecutive windows equals the exact
    batch two-sample KS (exact regime — no compaction)."""
    from sketchlib.sketches.kll import KLL
    from sketchlib.streaming import window_drift

    src = str(tmp_path / "drift_src")
    ev = spark.read.parquet(f"{SF}/events.parquet").limit(6000)
    ev.repartition(4).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    store = WindowedSketchStore()
    sink = windowed_sketch_sink(store, lambda: KLL(1 << 15),
                                key_col="value", ts_col="ts",
                                window="1 day", hash_values=False)
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "drift_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    drift = window_drift(store, stat="ks")
    assert drift, "no adjacent-window pairs"

    # exact per-window value arrays from the batch path
    pdf = (ev.select(F.date_format(F.window("ts", "1 day").start,
                                   "yyyy-MM-dd HH:mm:ss").alias("ws"),
                     F.col("value").cast("double").alias("v"))
           .toPandas())
    for wa, wb, ks in drift:
        xa = np.sort(pdf[pdf.ws == wa].v.to_numpy())
        xb = np.sort(pdf[pdf.ws == wb].v.to_numpy())
        pts = np.union1d(xa, xb)
        fa = np.searchsorted(xa, pts, side="right") / xa.size
        fb = np.searchsorted(xb, pts, side="right") / xb.size
        assert ks == pytest.approx(float(np.abs(fa - fb).max()), abs=0)


def test_streaming_windowed_mg_top_k_matches_batch(spark, tmp_path):
    """'Hot users per window' through the SAME windowed sink with a
    Misra-Gries factory (the sink is sketch-agnostic): per-window
    top-3 from the committed summaries equals the exact batch top-3
    (exact regime: k >= per-window distinct, merge across micro-batch
    replays exercised by the store's epoch keying)."""
    from functools import partial

    from sketchlib.sketches.mg import MisraGries

    src = str(tmp_path / "mg_src")
    ev = spark.read.parquet(f"{SF}/events.parquet").limit(4000)
    ev.repartition(4).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    store = WindowedSketchStore()
    sink = windowed_sketch_sink(store, partial(MisraGries, 4096),
                                key_col="user_id", ts_col="ts",
                                window="1 hour")
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "mg_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    batch = (ev.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
             .agg(F.count("*").alias("n"))
             .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                      .alias("ws"),
                     F.xxhash64("user_id").alias("kh"), "n")
             .toPandas())
    assert store.windows()
    for ws in store.windows():
        sk = store.sketch(ws)
        vals, counts = sk.items()
        sub = batch[batch["ws"] == ws].copy()
        # items() tie-breaks equal counts by value ASC in UNSIGNED
        # space — mirror that for the oracle sort
        sub["khu"] = sub["kh"].to_numpy().astype("int64").view("uint64")
        sub = sub.sort_values(["n", "khu"], ascending=[False, True])
        want = [(int(v), int(c)) for v, c
                in zip(sub["khu"].head(3), sub["n"].head(3))]
        got = [(int(v), int(c)) for v, c in zip(vals[:3], counts[:3])]
        assert got == want, ws
