"""End-to-end: streaming ingest into the Icebergish catalog +
O(delta) incremental sketch refresh over the ingested snapshots.

This closes the lakehouse loop the reference has no analog for
(its sketches are one-shot files over one FASTA input,
main.cpp:43-55): a Structured Streaming query appends micro-batches
as snapshot commits (exactly-once, epoch-keyed), and
refresh_sketch_table brings the derived sketch table up to date by
scanning ONLY the files those commits added.
"""

from __future__ import annotations

from functools import partial

import numpy as np
from pyspark.sql import functions as F

from sketchlib.iceberg import IcebergishCatalog
from sketchlib.incremental import (load_sketch_table, probe_grouped,
                                   refresh_sketch_table)
from sketchlib.sketches.base import deserialize
from sketchlib.sketches.cm import CMConfig, CountMin
from sketchlib.streaming import catalog_ingest_sink

SF = "/root/testdata/sf0.01"
CFG = CMConfig(np_bits=16, nh=5, seed=137, conservative=False)
FAC = {"cm": partial(CountMin, CFG)}


def _prep(df):
    return df.select("event_type", F.xxhash64("user_id").alias("kh"))


def _run_stream(spark, src, ckpt, cat, schema):
    q = (spark.readStream.schema(schema).parquet(src)
         .writeStream.foreachBatch(catalog_ingest_sink(cat, "events"))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_stream_ingest_then_incremental_refresh(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet").limit(6000).cache()
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cat = IcebergishCatalog(str(tmp_path / "cat"))

    # phase 1: stream in the first half, build the sketch table
    ev.filter(F.col("event_id") % 2 == 0).repartition(2).write.parquet(src)
    _run_stream(spark, src, ckpt, cat, ev.schema)
    s1 = refresh_sketch_table(spark, cat, "events", "sk", ["event_type"],
                              "kh", FAC, prepare=_prep)
    assert s1["mode"] == "initial"

    # phase 2: more files land, the SAME stream query picks them up
    (ev.filter(F.col("event_id") % 2 == 1).repartition(2)
     .write.mode("append").parquet(src))
    _run_stream(spark, src, ckpt, cat, ev.schema)
    s2 = refresh_sketch_table(spark, cat, "events", "sk", ["event_type"],
                              "kh", FAC, prepare=_prep)
    assert s2["mode"] == "incremental"

    # ingested table == source, exactly once
    n_cat = cat.load_table(spark, "events").count()
    assert n_cat == ev.count()

    # refreshed blobs bit-identical to a from-scratch batch build
    fresh = IcebergishCatalog(str(tmp_path / "cat2"))
    fresh.append("events", ev)
    refresh_sketch_table(spark, fresh, "events", "sk", ["event_type"],
                         "kh", FAC, prepare=_prep)

    def blobs(c):
        rows = load_sketch_table(spark, c, "sk", name="cm").collect()
        return {r.event_type: bytes(r.sketch) for r in rows}

    a, b = blobs(cat), blobs(fresh)
    assert a.keys() == b.keys() and all(a[k] == b[k] for k in a)

    # estimates match the exact GROUP BY (collision-free width)
    probes = (ev.groupBy("event_type", "user_id")
              .agg(F.count("*").alias("n"))
              .withColumn("kh", F.xxhash64("user_id")))
    got = (probe_grouped(probes.select("event_type", "user_id", "n", "kh"),
                         load_sketch_table(spark, cat, "sk", name="cm"),
                         ["event_type"], "kh")
           .toPandas())
    np.testing.assert_array_equal(got["est_count"].to_numpy(),
                                  got["n"].to_numpy())


def test_replayed_epoch_does_not_double_ingest(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet").limit(500)
    cat = IcebergishCatalog(str(tmp_path / "cat"))
    sink = catalog_ingest_sink(cat, "events", query_name="q1")
    sink(ev, 0)
    n1 = cat.load_table(spark, "events").count()
    sink(ev, 0)  # recovery replays epoch 0
    assert cat.load_table(spark, "events").count() == n1 == 500
    sink(ev, 1)  # a genuinely new epoch appends
    assert cat.load_table(spark, "events").count() == 1000
    # a different stream's epoch 1 is independent
    catalog_ingest_sink(cat, "events", query_name="q2")(ev, 1)
    assert cat.load_table(spark, "events").count() == 1500
