"""Streaming-leg throughput benchmark: sustained sketch-sink rate over
a file-source stream of synthetic transcript turns.

Protocol: synthesize N conversations, write them as M parquet files to
/tmp (the stream source), then run the windowed CM sketch sink
(sketchlib.streaming.windowed_sketch_sink — the same Arrow kernel as
batch) with ``maxFilesPerTrigger=1`` + ``availableNow`` so the run
processes M micro-batches back-to-back. Reported rate = total token
updates / wall between stream start and completion; the resulting
per-window sketches are gated against the exact batch aggregate
before the number is printed (one-sided CM guarantee on every probe,
epsilon-delta violation budget per window — a fast-but-wrong stream
would not report).

Usage: python tools/bench_streaming.py [n_convs] [n_files]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from functools import partial

sys.path.insert(0, "/root/repo")


def main() -> int:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from sketchlib.session import get_spark
    from sketchlib.sketches.cm import CMConfig, CountMin
    from sketchlib.streaming import WindowedSketchStore, windowed_sketch_sink
    from sketchlib.synth import transcripts

    spark = get_spark("streaming-bench", cpus=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    src = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        tdf = transcripts(spark, n_convs, seed=42, partitions=n_files)
        # word-token stream with the event timestamp carried (the batch
        # tokenizer prunes ts — streaming windows need it)
        toks = (tdf.select(
            "ts", F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
            .filter(F.col("w") != "")
            .select("ts", F.xxhash64("w").alias("token_u64")))
        toks.repartition(n_files).write.mode("overwrite").parquet(src)
        static = spark.read.parquet(src)
        n_updates = static.count()

        cfg = CMConfig(np_bits=18, nh=5, seed=137, conservative=False)
        store = WindowedSketchStore()
        sink = windowed_sketch_sink(store, partial(CountMin, cfg),
                                    "token_u64", "ts", window="1 hour")
        stream = spark.readStream.schema(static.schema) \
            .option("maxFilesPerTrigger", 1).parquet(src)
        t0 = time.time()
        q = (stream.writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        wall = time.time() - t0

        # correctness gate (50k-word vocab in w=2^18 cells => some
        # cells collide; CM's published guarantee, not equality, is
        # the sound check): est >= count on EVERY probe (one-sided),
        # and per window the fraction of probes with
        # err > (e / w) * N_window stays within 2x the e^-nh budget
        import math

        import numpy as np
        # the sink hashes its key column with xxhash64 before updating
        # (windowed_sketch_sink), so probes must apply the same map
        exact = (static.select(
            F.date_format(F.window("ts", "1 hour").start,
                          "yyyy-MM-dd HH:mm:ss").alias("ws"),
            F.xxhash64("token_u64").alias("kh"))
            .groupBy("ws", "kh").count().toPandas())
        n_checked = 0
        eps = math.e / (1 << cfg.np_bits)
        budget = 2 * math.exp(-cfg.nh)
        for ws, grp in exact.groupby("ws"):
            sk = store.sketch(ws)
            assert sk is not None, f"missing window {ws}"
            est = sk.estimate(grp["kh"].to_numpy().view(np.uint64))
            cnt = grp["count"].to_numpy()
            assert (est >= cnt).all(), f"undercount in {ws}"
            frac = float((est - cnt > eps * cnt.sum()).mean())
            assert frac <= budget, (ws, frac, budget)
            n_checked += len(grp)
        print(json.dumps({
            "n_updates": n_updates, "n_microbatches": n_files,
            "wall_sec": round(wall, 2),
            "updates_per_sec": round(n_updates / wall, 1),
            "windows": len(store.windows()),
            "probes_gated": n_checked,
        }))
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
