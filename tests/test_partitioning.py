"""Sketch-driven range partitioning (sketchlib/partitioning.py).

Gates: exact-regime bounds equal rank quantiles; bucket assignment
matches a driver-side recount; skewed input still yields balanced,
range-disjoint partitions; shared bounds co-partition two tables
consistently (the range-join co-location prerequisite).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.partitioning import (kll_range_bounds, range_bucket_col,
                                    repartition_by_sketch_ranges)


@pytest.fixture(scope="module")
def skewed_vals(spark):
    # lognormal-ish skew: many small values, a long right tail
    rng = np.random.default_rng(7)
    vals = np.exp(rng.normal(0.0, 1.5, size=20_000)).tolist()
    return spark.createDataFrame([(float(v),) for v in vals],
                                 "v double").cache()


def test_exact_regime_bounds_are_rank_quantiles(spark, skewed_vals):
    n = skewed_vals.count()
    bounds = kll_range_bounds(skewed_vals, "v", 4, k=n + 1)
    arr = np.sort(np.array(skewed_vals.toPandas()["v"]))
    for i, b in enumerate(bounds, start=1):
        q = i / 4
        assert b == arr[int(np.ceil(q * n)) - 1]


def test_bucket_col_matches_numpy(spark, skewed_vals):
    bounds = kll_range_bounds(skewed_vals, "v", 8, k=30_000)
    got = (skewed_vals
           .withColumn("b", range_bucket_col("v", bounds))
           .groupBy("b").count().toPandas()
           .sort_values("b").reset_index(drop=True))
    arr = np.array(skewed_vals.toPandas()["v"])
    want = (arr[:, None] > np.array(bounds)[None, :]).sum(axis=1)
    wc = np.bincount(want, minlength=8)
    assert int(got["count"].sum()) == arr.size
    for _, row in got.iterrows():
        assert int(row["count"]) == int(wc[int(row["b"])])


def test_partitions_balanced_and_range_disjoint(spark, skewed_vals):
    n_buckets = 8
    out = repartition_by_sketch_ranges(skewed_vals, "v", n_buckets,
                                       k=30_000)
    sizes_minmax = (out.withColumn("pid", F.spark_partition_id())
                    .groupBy("pid")
                    .agg(F.count("*").alias("c"),
                         F.min("v").alias("lo"), F.max("v").alias("hi"))
                    .orderBy("pid").toPandas())
    n = skewed_vals.count()
    mean = n / n_buckets
    nonempty = sizes_minmax[sizes_minmax["c"] > 0]
    # equi-depth despite the skew: every partition within 2x of mean
    assert nonempty["c"].max() <= 2 * mean
    # ranges pairwise disjoint in partition order
    his = nonempty["hi"].to_numpy()
    los = nonempty["lo"].to_numpy()
    assert all(his[i] <= los[i + 1] for i in range(len(nonempty) - 1))


def test_shared_bounds_copartition_two_tables(spark, skewed_vals):
    """Two tables bucketed with the SAME bounds agree on every value's
    bucket — the contract sampling-based repartitionByRange cannot
    give (each call re-samples its own input)."""
    bounds = kll_range_bounds(skewed_vals, "v", 4, k=30_000)
    other = skewed_vals.sample(0.3, seed=1)
    a = skewed_vals.withColumn("b", range_bucket_col("v", bounds))
    b = other.withColumn("b", range_bucket_col("v", bounds))
    j = (a.join(b, "v").filter(a["b"] != b["b"]))
    assert j.count() == 0


def test_empty_bounds_single_bucket(spark, skewed_vals):
    out = skewed_vals.withColumn("b", range_bucket_col("v", []))
    assert out.agg(F.max("b")).collect()[0][0] == 0


def test_range_partitioned_write_prunes_and_matches(spark, skewed_vals,
                                                    tmp_path_factory):
    from sketchlib.partitioning import (range_pruned_read,
                                        write_range_partitioned)
    path = str(tmp_path_factory.mktemp("rp") / "tbl")
    bounds = write_range_partitioned(skewed_vals, path, "v", 8, k=30_000)
    lo, hi = float(bounds[2]), float(bounds[4])

    got = range_pruned_read(spark, path, "v", bounds, lo, hi)
    want = skewed_vals.filter((F.col("v") >= lo) & (F.col("v") <= hi))
    assert got.count() == want.count()
    assert got.agg(F.sum("v")).collect()[0][0] == \
        pytest.approx(want.agg(F.sum("v")).collect()[0][0])

    # the bucket predicate must reach the scan as a partition filter
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:250]
    assert "range_bucket" in pf and ">= 2" in pf and "<= 4" in pf
    # all 8 directories exist, and the 3 qualifying ones hold exactly
    # the rows the pruned read returns pre-residual
    import glob
    n_dirs = len(glob.glob(f"{path}/range_bucket=*"))
    assert n_dirs == 8
    direct = spark.read.parquet(*[f"{path}/range_bucket={b}"
                                  for b in (2, 3, 4)])
    bucketed_only = (spark.read.parquet(path)
                     .filter((F.col("range_bucket") >= 2) &
                             (F.col("range_bucket") <= 4)))
    assert direct.count() == bucketed_only.count()


def test_grouped_bounds_exact_regime(spark):
    from sketchlib.partitioning import grouped_range_bucket_counts
    import pandas as pd
    rng = np.random.default_rng(13)
    rows = [("a", float(v)) for v in rng.normal(0, 1, 3000)] + \
           [("b", float(v)) for v in np.exp(rng.normal(0, 2, 5000))]
    df = spark.createDataFrame(rows, "g string, v double").cache()
    got = (grouped_range_bucket_counts(df, ["g"], "v", 4, k=10_000,
                                       salt_buckets=4)
           .toPandas().sort_values(["g", "bucket"])
           .reset_index(drop=True))
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    for g, sub in pdf.groupby("g"):
        arr = np.sort(sub["v"].to_numpy())
        n = arr.size
        bounds = np.array([arr[int(np.ceil(q * n)) - 1]
                           for q in (0.25, 0.5, 0.75)])
        want = np.bincount(
            (sub["v"].to_numpy()[:, None] > bounds[None, :]).sum(axis=1),
            minlength=4)
        sg = got[got["g"] == g]
        for _, row in sg.iterrows():
            assert int(row["n_rows"]) == int(want[int(row["bucket"])]), g
        assert int(sg["n_rows"].sum()) == n
