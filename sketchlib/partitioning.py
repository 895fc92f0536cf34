"""Sketch-driven range partitioning: equi-depth bounds from a KLL
sketch, applied as a codegen-friendly bucket column.

Spark's own ``repartitionByRange`` computes its bounds by SAMPLING the
input — which re-executes the upstream plan once just to sample it,
resists reuse (every call re-samples, two tables never agree on
bounds), and gives no error guarantee on the split balance. The
library already has the right primitive: a mergeable KLL sketch built
in one pass (often as a byproduct of a pass the pipeline already
makes) yields equi-depth bounds with the KLL rank guarantee, and the
SAME bounds object can partition MANY tables consistently — the
co-location prerequisite for range-bucketed merge joins and for
min/max-prunable file layouts (write with ``partitionBy(bucket)`` or
``sortWithinPartitions(bucket, col)`` and every file's value range is
disjoint).

The bucket expression is a sum of ``(col > bound)`` casts — pure
whole-stage-codegen comparisons, no UDF, no interpreted higher-order
functions.

Reference tie-in: the reference library's quantile niche (SURVEY.md
§2.2 L13) feeds its estimates to analysis scripts; here the same
sketch *steers the physical layout*, which is what a distributed
engine actually needs quantiles for.
"""

from __future__ import annotations

from functools import partial, reduce

from pyspark.sql import Column, DataFrame, functions as F

from sketchlib.aggregate import build_sketch
from sketchlib.sketches.kll import KLL

__all__ = ["kll_range_bounds", "range_bucket_col",
           "repartition_by_sketch_ranges", "write_range_partitioned",
           "range_pruned_read", "grouped_kll_range_bounds",
           "grouped_range_bucket_counts"]


def kll_range_bounds(df: DataFrame, col: str, n_buckets: int,
                     k: int = 200) -> list[float]:
    """Equi-depth bucket bounds for ``df[col]``: the ``i/n_buckets``
    KLL quantiles (smallest value with rank >= ceil(q*n)), i in
    1..n_buckets-1. One distributed pass, blob-sized merge traffic;
    ``k >= n`` is the exact regime (rank-exact bounds, the regime the
    driver query gates), ``k=200`` gives ~1.3% rank error at any n."""
    sk = build_sketch(df.select(F.col(col).cast("double").alias("v")),
                      "v", partial(KLL, k), as_u64=False)
    return [float(sk.quantile(i / n_buckets))
            for i in range(1, n_buckets)]


def range_bucket_col(col: str, bounds: list[float]) -> Column:
    """Bucket id = number of bounds strictly below the value —
    ``sum_i (col > bounds_i)`` as chained codegen comparisons.
    Rows with NULL get bucket NULL (Spark comparison semantics)."""
    if not bounds:
        return F.lit(0).cast("long")
    terms = [(F.col(col) > F.lit(float(b))).cast("long") for b in bounds]
    return reduce(lambda a, b: a + b, terms)


def repartition_by_sketch_ranges(df: DataFrame, col: str,
                                 n_buckets: int, k: int = 200,
                                 bounds: list[float] | None = None,
                                 bucket_col: str = "__range_bucket",
                                 keep_bucket: bool = False) -> DataFrame:
    """Range-repartition ``df`` into ``n_buckets`` equi-depth value
    ranges of ``col`` using sketch bounds instead of Spark's sampling.

    The exchange is ``repartitionByRange`` on the small-int bucket id
    (its internal sampling now touches a {0..n_buckets-1} domain, not
    the raw column), so partitions ascend with the bucket id and the
    per-partition value ranges are pairwise disjoint — the property
    that makes min/max file pruning and range-bucketed merge joins
    work. Pass the same ``bounds`` to partition several tables
    consistently."""
    if bounds is None:
        bounds = kll_range_bounds(df, col, n_buckets, k=k)
    out = df.withColumn(bucket_col, range_bucket_col(col, bounds))
    out = out.repartitionByRange(n_buckets, F.col(bucket_col))
    return out if keep_bucket else out.drop(bucket_col)


def write_range_partitioned(df: DataFrame, path: str, col: str,
                            n_buckets: int, k: int = 200,
                            bounds: list[float] | None = None,
                            bucket_col: str = "range_bucket") -> list[float]:
    """Write ``df`` as parquet partitioned by the equi-depth range
    bucket of ``col`` — the value-clustered layout in which a range
    predicate on ``col`` becomes PARTITION PRUNING (directories never
    opened) instead of a full scan. Equi-depth (not equi-width) bounds
    mean the directories are balanced regardless of skew. Returns the
    bounds so the SAME layout can be applied to sibling tables and so
    readers can transfer predicates (:func:`range_pruned_read`).

    At 100 TB this is the difference between "scan 100 TB and filter"
    and "open 2 of 64 directories": layout decisions are the one
    optimization Catalyst cannot make at read time."""
    if bounds is None:
        bounds = kll_range_bounds(df, col, n_buckets, k=k)
    (df.withColumn(bucket_col, range_bucket_col(col, bounds))
       .repartitionByRange(n_buckets, F.col(bucket_col))
       .write.mode("overwrite").partitionBy(bucket_col).parquet(path))
    return bounds


def range_pruned_read(spark, path: str, col: str, bounds: list[float],
                      lo: float, hi: float,
                      bucket_col: str = "range_bucket") -> DataFrame:
    """Read back a :func:`write_range_partitioned` table restricted to
    ``lo <= col <= hi`` with the predicate TRANSFERRED to the bucket
    key: only the bucket directories whose value range intersects
    [lo, hi] are listed/opened (PartitionFilters in the scan plan —
    tests/test_partitioning.py pins it), then the exact residual
    filter runs on the survivors. Row-identical to filtering the
    unpartitioned table."""
    b_lo = sum(1 for b in bounds if b < lo)   # bucket containing lo
    b_hi = sum(1 for b in bounds if b < hi)   # bucket containing hi
    return (spark.read.parquet(path)
            .filter((F.col(bucket_col) >= b_lo) &
                    (F.col(bucket_col) <= b_hi))
            .filter((F.col(col) >= lo) & (F.col(col) <= hi)))


def grouped_kll_range_bounds(df: DataFrame, group_cols: list[str],
                             col: str, n_buckets: int,
                             k: int = 200,
                             salt_buckets: int | None = None) -> DataFrame:
    """PER-GROUP equi-depth bounds: one KLL per group through the
    salted grouped build, finalized DISTRIBUTED to a
    ``bounds array<double>`` column — (group..., bounds). The grouped
    sibling of :func:`kll_range_bounds` for per-tenant / per-language
    layouts where one global quantile grid would mis-split skewed
    subpopulations. Bounds follow the same rank spec (smallest value
    with rank >= ceil(i/n * count)); ``k >= per-group n`` is the
    exact regime."""
    from functools import partial as _p

    from sketchlib.aggregate import build_grouped_sketches, finalize_grouped
    from sketchlib.sketches.kll import KLL

    src = df.select(*group_cols, F.col(col).cast("double").alias("__v"))
    grouped = build_grouped_sketches(src, group_cols, "__v", _p(KLL, k),
                                     as_u64=False,
                                     salt_buckets=salt_buckets)
    qs = [i / n_buckets for i in range(1, n_buckets)]

    def _bounds(sk, _qs=tuple(qs)):
        return [float(sk.quantile(q)) for q in _qs]

    return finalize_grouped(grouped, _bounds, "bounds", "array<double>")


def grouped_range_bucket_counts(df: DataFrame, group_cols: list[str],
                                col: str, n_buckets: int,
                                k: int = 200,
                                salt_buckets: int | None = None
                                ) -> DataFrame:
    """(group..., bucket, n_rows): every row bucketed against ITS
    group's equi-depth bounds. The bucket expression is
    ``size(filter(bounds, b -> b < v))`` over the joined-back bounds
    array — a 3-element higher-order filter per row (interpreted but
    trivially small; the join is a broadcast of |groups| rows)."""
    bounds = grouped_kll_range_bounds(df, group_cols, col, n_buckets,
                                      k=k, salt_buckets=salt_buckets)
    src = df.select(*group_cols, F.col(col).cast("double").alias("__v"))
    joined = src.join(F.broadcast(bounds), group_cols)
    # NULL values get bucket NULL, matching range_bucket_col's
    # documented semantics (F.filter alone would drop NULL-predicate
    # elements and silently assign bucket 0)
    bucket = F.when(
        F.col("__v").isNull(), F.lit(None).cast("long")).otherwise(
        F.size(F.filter("bounds",
                        lambda b: b < F.col("__v"))).cast("long"))
    return (joined.withColumn("bucket", bucket)
            .groupBy(*group_cols, "bucket")
            .agg(F.count(F.lit(1)).alias("n_rows")))
