"""Skew-split join A/B: the same inner join + aggregation over a
hot-key fact table, (a) as Catalyst's plain shuffle join with AQE's
default skew handling, (b) through sketchlib's skew_split_join
(MG-detected hot keys broadcast, cold keys shuffled).

The fact table is adversarially skewed: ``hot_share`` of all rows
carry ONE key. In a plain shuffle join every one of those rows moves
to a single reducer; the split join leaves them in place and ships
the dim rows to them instead.

Protocol (same hazard as tools/bench_scaling.py: shared-VM load
drift): variants interleave A,B,A,B,... within one JVM after a
warm-up round, and each variant keeps its best round. Run with
AQE on (its skew-join mitigation is allowed to help the plain side —
the comparison is against Spark's best default, not a strawman).

The dim side must be BIGGER than the auto-broadcast threshold or the
comparison is vacuous: with a broadcastable dim, Catalyst plans a
broadcast hash join for the plain side too and no row ever shuffles —
skew cannot hurt a plan with no exchange (measured: plain wins ~1.5x
in that regime because the split adds bookkeeping). The operator's
regime is a dim of 10^6+ keys — a shuffle join on the plain side —
which is what the default n_keys below forces.

Usage: python tools/bench_skew.py [n_rows] [hot_share] [rounds] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    from pyspark.sql import functions as F

    from sketchlib.joins import hot_keys, skew_split_join
    from sketchlib.session import get_spark

    spark = get_spark("bench-skew", cpus=cpus, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    n_hot = int(n_rows * hot_share)
    n_keys = max(2_000_000, n_rows // 2)
    # fact: one scorching key (id 0) + a uniform cold remainder
    fact = (spark.range(n_rows)
            .select(F.when(F.col("id") < n_hot, F.lit(0))
                     .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
                     .alias("k"),
                    (F.col("id") % 97).alias("payload"))
            .cache())
    fact.count()
    dim = (spark.range(n_keys)
           .select(F.col("id").alias("k"),
                   F.pmod(F.xxhash64("id"), F.lit(1000)).alias("dpay"))
           .cache())
    dim.count()

    # hot keys detected once (reusable across joins — report its cost)
    t0 = time.time()
    hot = [v for v, _ in hot_keys(fact, "k", top_k=8, summary_k=4096)]
    detect_s = time.time() - t0

    def plain_df():
        return (fact.join(dim, "k")
                .groupBy("dpay").agg(F.sum("payload").alias("s")))

    def split_df():
        return (skew_split_join(fact, dim, "k", hot=hot)
                .groupBy("dpay").agg(F.sum("payload").alias("s")))

    def plain():
        return plain_df().count()

    def split():
        return split_df().count()

    # real equality check (per-group sums, not just group count),
    # then interleaved best-of timing
    a = sorted(map(tuple, plain_df().collect()))
    b = sorted(map(tuple, split_df().collect()))
    assert a == b, "skew_split_join result differs from plain join"
    best = {"plain": float("inf"), "split": float("inf")}
    for _ in range(rounds):
        for name, fn in (("plain", plain), ("split", split)):
            t0 = time.time()
            fn()
            best[name] = min(best[name], time.time() - t0)

    out = {
        "n_rows": n_rows, "hot_share": hot_share, "cpus": cpus,
        "hot_detect_sec": round(detect_s, 3),
        "plain_join_sec": round(best["plain"], 3),
        "skew_split_sec": round(best["split"], 3),
        "speedup": round(best["plain"] / best["split"], 3),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
