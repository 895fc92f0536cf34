"""Estimate-quality analysis — the engine's version of the reference's
pandas script (reference: output/analysis.py:1-16), as one distributed
DataFrame job instead of a driver-side pandas pass:

- one-sided guarantee violations: rows with ``true > est`` (must be 0
  when truth is the inserted multiset — SURVEY.md §5.2);
- RMSE of (est - true);
- Spearman rank correlation: Pearson correlation of the two rank
  columns (average-rank ties), computed with window ranks + ``corr``.

Two rank strategies:

- default (``scalable=False``): global ``Window.orderBy`` rank — one
  task holds the whole result table. Fine for query-result-sized
  inputs (thousands to millions of rows), lowest overhead.
- ``scalable=True``: distributed average-rank. Ranks are a function
  of the VALUE only, so we rank the ``groupBy(value).count()`` table
  (|distinct| rows), range-partition it by value, take per-partition
  cumulative row counts, and fix up with per-partition offsets — the
  only driver-side data is one (partition, total) row per range
  partition. No stage ever holds more than one range partition of
  the distinct-value table; rows join their value's rank back by a
  hash join on the value. Identical output to the window path
  (tested), usable at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _avg_ranks(df: DataFrame, col: str,
               n_ranges: int = 64) -> tuple[DataFrame, DataFrame]:
    """Internal form of :func:`avg_ranks` that also returns the
    persisted intermediate so the caller can unpersist it once the
    ranks have been consumed."""
    spark = df.sparkSession
    g = (df.groupBy(F.col(col).alias("v"))
           .agg(F.count("*").alias("c"))
           .repartitionByRange(n_ranges, F.col("v"))
           .withColumn("pid", F.spark_partition_id())
           .withColumn("cum", F.sum("c").over(
               Window.partitionBy("pid").orderBy("v")))
           .persist())
    # one row per non-empty range partition; sort by the partition's
    # value range (not pid) so the offsets are order-correct even if
    # the partitioner's id assignment ever changed
    totals = sorted(
        g.groupBy("pid").agg(F.max("cum").alias("tot"),
                             F.min("v").alias("lo")).collect(),
        key=lambda r: r["lo"])
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["pid"], acc))
        acc += r["tot"]
    off = spark.createDataFrame(offsets, "pid int, off bigint")
    ranks = (g.join(F.broadcast(off), "pid")
              .select(F.col("v").alias(col),
                      (F.col("off") + F.col("cum") - F.col("c")
                       + (F.col("c") + 1) / 2.0).alias("rank")))
    return ranks, g


def avg_ranks(df: DataFrame, col: str, n_ranges: int = 64) -> DataFrame:
    """Distributed average rank (ties share their mean rank) of each
    DISTINCT value of ``col``: returns a ``(col, rank)`` DataFrame with
    one row per distinct value. ``col`` must be null- and NaN-free
    (the per-partition offset ordering is undefined under NaN).

    Plan shape: hash-agg to (value, count) — |distinct| rows — then
    ``repartitionByRange`` on value so partition ids ascend with value
    ranges, per-partition running row counts via a window PARTITIONED
    by ``spark_partition_id()`` (never a global single-task window),
    and a broadcast join of per-partition offsets (one scalar per
    range partition, the only thing collected). avg rank of a value
    with multiplicity c whose predecessors cover r rows is
    r + (c + 1) / 2.

    Caches a |distinct|-row table for the lifetime of the returned
    DataFrame; :func:`estimate_metrics` manages that lifecycle —
    long-lived callers using this directly should prefer it.
    """
    ranks, _g = _avg_ranks(df, col, n_ranges)
    return ranks


def estimate_metrics(df: DataFrame, true_col: str = "true_count",
                     est_col: str = "estimated_count",
                     scalable: bool = False) -> dict:
    """Returns {n, n_violations, rmse, spearman} for a result table of
    (…, true_col, est_col) rows — analysis.py's three checks.

    With no analyzable rows, returns n=0 and None metrics; ``spearman``
    is also None when undefined (constant column ⇒ corr is null)."""

    # rows where either metric is null/NaN/unparseable (e.g. a
    # malformed CSV line) carry no information and would poison RMSE
    # (and the rank-offset ordering in the scalable path) — drop them
    # up front so both rank strategies see the same clean pairs, and
    # ``n`` counts rows actually analyzed
    pairs = (df.select(F.col(true_col).cast("double").alias("t"),
                       F.col(est_col).cast("double").alias("e"))
               .filter(F.col("t").isNotNull() & F.col("e").isNotNull()
                       & ~F.isnan("t") & ~F.isnan("e")))
    cached = []
    if scalable:
        rt, g1 = _avg_ranks(pairs, "t")
        re_, g2 = _avg_ranks(pairs, "e")
        cached = [g1, g2]
        ranked = (pairs.join(rt.withColumnRenamed("rank", "rt"), "t")
                       .join(re_.withColumnRenamed("rank", "re"), "e"))
    else:
        def avg_rank(col: str):
            # average rank for ties == (rank + (count_in_tie - 1) / 2)
            w_rank = Window.orderBy(F.col(col))
            w_tie = Window.partitionBy(F.col(col))
            return (F.rank().over(w_rank)
                    + (F.count("*").over(w_tie) - 1) / 2.0)

        ranked = (pairs.withColumn("rt", avg_rank("t"))
                       .withColumn("re", avg_rank("e")))

    row = ranked.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("t") > F.col("e"), 1).otherwise(0))
         .alias("n_violations"),
        F.sqrt(F.avg((F.col("e") - F.col("t")) ** 2)).alias("rmse"),
        F.corr("rt", "re").alias("spearman"),
    ).collect()[0]
    for g in cached:
        g.unpersist()
    n = int(row["n"])
    return {"n": n,
            "n_violations": int(row["n_violations"]) if n else 0,
            "rmse": float(row["rmse"]) if row["rmse"] is not None else None,
            "spearman": (float(row["spearman"])
                         if row["spearman"] is not None else None)}
