"""Time-decayed frequency sketches (forward/backward decay over CM).

Recency-weighted heavy hitters — "what is hot NOW" — per Cormode,
Shkapenyuk, Srivastava, Xu, "Forward Decay: A Practical Time Decay
Model for Streaming Systems" (ICDE'09): each row carries a weight
``g(age)`` and every frequency statistic becomes a weighted sum, which
the library's CM kernels already support (``update_weighted``).

The decay function here is piecewise-constant halving — weight
``2^(max_buckets - min(age_bucket, max_buckets))`` with ``age_bucket =
floor(age / half_life)`` — chosen for three properties:

1. **Integer weights.** CM counters stay int64, estimates stay exact
   integers (scaled by ``2^max_buckets``), and the weighted sums are
   EXACT in any engine and any summation order — no float-accumulation
   drift, so the driver gate can be strict equality rather than a
   tolerance band.
2. **Merge-safe.** The weight is a pure function of (row ts, landmark)
   — independent of processing order or partitioning — so partial
   sketches merge associatively exactly like unweighted CM (the
   forward-decay paper's core trick: weights fixed at ingest relative
   to a landmark, not re-scaled per query).
3. **JVM-side pre-aggregation.** ``SUM(weight)`` per key is a Tungsten
   hash agg (map-side combined); Python sees |distinct keys| weighted
   rows, exactly the flagship build's scale shape.

Halving per ``half_life`` approximates exponential decay
``exp(-ln2 * age / half_life)`` within a factor of 2 (exact at bucket
boundaries); ages beyond ``max_buckets`` half-lives saturate at the
minimum weight 1 instead of decaying to 0, keeping the sketch a
superset of the unweighted one (nothing silently vanishes).
"""

from __future__ import annotations

from functools import partial

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from sketchlib.aggregate import build_sketch
from sketchlib.sketches.cm import CMConfig, CountMin

__all__ = ["decay_weight_col", "decayed_frequency", "decayed_top_k"]


def decay_weight_col(ts_col: str, landmark, half_life_s: int,
                     max_buckets: int = 8) -> Column:
    """Integer decay weight ``2^max_buckets >> age_bucket`` with
    ``age_bucket = floor((landmark - ts)/half_life_s)`` clamped to
    [0, max_buckets]. Rows newer than the landmark clamp to bucket 0
    (full weight), ancient rows to weight 1."""
    age_s = F.unix_timestamp(F.lit(landmark)) - F.unix_timestamp(
        F.col(ts_col))
    # clamp in LONG space before any narrowing: floor() returns long,
    # and casting to int pre-clamp would wrap huge age/half_life
    # ratios negative — assigning ancient rows FULL weight
    bucket = F.greatest(F.lit(0).cast("long"), F.least(
        F.lit(max_buckets).cast("long"),
        F.floor(age_s / F.lit(int(half_life_s)))))
    # 2^(max_buckets - bucket): pow over small ints is exact in double,
    # the long cast keeps the weight integral (F.shiftright needs a
    # literal bit count, so it can't take the bucket column).
    # NULL ts must yield NULL weight explicitly — Spark's least/
    # greatest SKIP nulls, so without the guard a NULL age would
    # silently clamp to the max bucket; the weighted builds drop
    # NULL-weight rows, so "unknown time" contributes nothing.
    w = F.pow(F.lit(2.0), F.lit(max_buckets) - bucket).cast("long")
    return F.when(F.col(ts_col).isNull(),
                  F.lit(None).cast("long")).otherwise(w)


def decayed_frequency(spark: SparkSession, df: DataFrame, key_col: str,
                      ts_col: str, half_life_s: int,
                      cfg: CMConfig, landmark=None,
                      max_buckets: int = 8) -> DataFrame:
    """Distinct keys annotated with their CM-estimated decayed count
    ``decayed_count_scaled`` (scaled by ``2^max_buckets`` — divide by
    it for the 0..1-weighted value; keep it integral for strict
    gating).

    One JVM scan computes per-key ``SUM(weight)``; the CM build
    consumes the weighted key table (``update_weighted``), the probe
    is the standard broadcast-blob annotate. ``landmark`` defaults to
    ``MAX(ts)`` (one cheap agg — at 10^12 rows use a known watermark
    instead of scanning for it)."""
    from sketchlib.queries import _estimate_col

    if landmark is None:
        landmark = df.agg(F.max(ts_col)).collect()[0][0]
    w = decay_weight_col(ts_col, landmark, half_life_s, max_buckets)
    hashed = df.select(F.col(key_col).alias("key"),
                       F.xxhash64(key_col).alias("kh"),
                       w.alias("__w"))
    sk = build_sketch(hashed, "kh", partial(CountMin, cfg),
                      pre_aggregate=True, weight_col="__w")
    # Keys whose every row has NULL ts contribute no weight to the
    # build (NULL __w rows are dropped by the weighted pre-aggregate);
    # drop them from the probe too, so the output matches the DuckDB
    # ``SUM(weight) GROUP BY key`` oracle (which yields no row — not 0
    # — for such keys) if NULL-ts data ever appears.
    probe = (hashed.filter(F.col("__w").isNotNull())
             .select("key", "kh").distinct())
    return (_estimate_col(spark, sk, probe, "kh",
                          out_col="decayed_count_scaled")
            .select("key", "decayed_count_scaled"))


def decayed_top_k(spark: SparkSession, df: DataFrame, key_col: str,
                  ts_col: str, half_life_s: int, k: int = 10,
                  summary_k: int = 4096, landmark=None,
                  max_buckets: int = 8) -> DataFrame:
    """"What is hot NOW": top-``k`` keys by decayed weight through a
    weighted Misra-Gries summary — one pre-aggregated pass, bounded
    ``summary_k``-counter state, merge-tree-independent (the MG bound
    now reads ``true - W/(summary_k+1) <= est <= true`` with W the
    total absorbed decayed weight). Exact regime (``summary_k >=
    |distinct|`` — no trim fires) is the strict-gate posture; output
    is (key, decayed_count_scaled, rk) with (weight desc, key)
    tie-break."""
    from pyspark.sql import Window

    from sketchlib.sketches.mg import MisraGries

    if landmark is None:
        landmark = df.agg(F.max(ts_col)).collect()[0][0]
    w = decay_weight_col(ts_col, landmark, half_life_s, max_buckets)
    hashed = df.select(F.col(key_col).alias("key"),
                       F.xxhash64(key_col).alias("kh"),
                       w.alias("__w"))
    mg = build_sketch(hashed, "kh", partial(MisraGries, summary_k),
                      pre_aggregate=True, weight_col="__w")
    vals, counts = mg.items()
    import numpy as np
    vals = vals.view(np.int64)  # reinterpret as Spark's signed xxhash64

    # candidate set = every item tied with or above the k-th count, so
    # the (count desc, key) tie-break below sees ALL contenders — a
    # count-only truncation could drop a tied key the oracle keeps
    if counts.size > k:
        kth = np.sort(counts)[::-1][k - 1]
        keep = np.nonzero(counts >= kth)[0]
    else:
        keep = np.arange(counts.size)
    pairs = spark.createDataFrame(
        [(int(vals[i]), int(counts[i])) for i in keep],
        "kh long, decayed_count_scaled long")
    keys = hashed.select("key", "kh").distinct()
    win = Window.orderBy(F.col("decayed_count_scaled").desc(), "key")
    return (keys.join(F.broadcast(pairs), "kh")
            .withColumn("rk", F.row_number().over(win))
            .filter(F.col("rk") <= k)
            .select("key", "decayed_count_scaled", "rk")
            .orderBy("rk"))
