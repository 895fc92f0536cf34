"""Deterministic E-S sampling (sketchlib/sampling.py).

Gates: partitioning-invariance (the sample is a pure function of row
identity + seed), exact regime (k >= n returns everything), weight
monotonicity (doubling a row's weight can only help it), statistical
sanity (heavier rows sampled more often across seeds), and the plan
shape (TakeOrderedAndProject — per-task top-k, no full shuffle).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.sampling import (stratified_sample, weighted_sample,
                                with_sample_priority)


@pytest.fixture(scope="module")
def rows(spark):
    return spark.createDataFrame(
        [(i, "abc"[i % 3], 1.0 + (i % 10)) for i in range(300)],
        "id long, grp string, w double").cache()


def test_sample_partitioning_invariant(spark, rows):
    a = sorted(r["id"] for r in
               weighted_sample(rows.repartition(1), 40, ["id"],
                               "w", seed=7).collect())
    b = sorted(r["id"] for r in
               weighted_sample(rows.repartition(17), 40, ["id"],
                               "w", seed=7).collect())
    assert a == b and len(a) == 40


def test_sample_exact_regime_returns_all(spark, rows):
    got = weighted_sample(rows, 1000, ["id"], "w").count()
    assert got == 300
    # uniform stratified, k >= stratum size
    st = stratified_sample(rows, ["grp"], 100, ["id"])
    assert st.count() == 300


def test_uniform_sample_matches_hash_order(spark, rows):
    """Uniform rank key is u itself — the k ids with the largest
    md5-derived u, recomputable by hand."""
    p = with_sample_priority(rows, ["id"], seed=3).toPandas()
    want = set(p.sort_values(["priority", "id"],
                             ascending=[False, True]).head(25)["id"])
    got = set(r["id"] for r in
              weighted_sample(rows, 25, ["id"], seed=3).collect())
    assert got == want


def test_weight_monotonicity(spark, rows):
    """Scaling one row's weight up (u fixed, ln(u)<0, key=ln(u)/w
    rises toward 0) can only improve its rank; with a huge factor the
    row must enter the sample."""
    boosted = rows.withColumn(
        "w", F.when(F.col("id") == 123, F.lit(1e9)).otherwise(F.col("w")))
    got = set(r["id"] for r in
              weighted_sample(boosted, 10, ["id"], "w", seed=1).collect())
    assert 123 in got


def test_weighted_sampling_is_weight_proportional(spark):
    """Across many seeds, a weight-10 row is drawn ~10x as often as a
    weight-1 row (E-S first-draw inclusion is exactly w_i/W; for
    k=1 the test is exact in expectation)."""
    df = spark.createDataFrame(
        [(i, 10.0 if i < 10 else 1.0) for i in range(110)],
        "id long, w double").cache()
    heavy = 0
    n_seeds = 200
    for seed in range(n_seeds):
        (rid,) = [r["id"] for r in
                  weighted_sample(df, 1, ["id"], "w", seed=seed).collect()]
        heavy += rid < 10
    # P(heavy) = 100/200 = 0.5; binomial(200, .5) 5-sigma ~ 0.177
    assert abs(heavy / n_seeds - 0.5) < 0.18


def test_stratified_per_group_counts_and_determinism(spark, rows):
    st = stratified_sample(rows, ["grp"], 7, ["id"], "w", seed=9)
    counts = {r["grp"]: r["n"] for r in
              st.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 7, "b": 7, "c": 7}
    again = stratified_sample(rows.repartition(13), ["grp"], 7,
                              ["id"], "w", seed=9)
    assert (sorted(map(tuple, st.select("grp", "id").collect()))
            == sorted(map(tuple, again.select("grp", "id").collect())))


def test_weighted_sample_plan_is_take_ordered(spark, rows):
    from tests.conftest import plan_of

    plan = plan_of(weighted_sample(rows, 5, ["id"], "w"))
    assert "TakeOrderedAndProject" in plan


def test_priority_matches_duckdb(spark, rows):
    """Engine portability of the rank key itself: DuckDB recomputes
    bit-identical u (and the same selected ids for the weighted
    sample) from the same md5 formula."""
    import duckdb

    pdf = rows.toPandas()
    con = duckdb.connect()
    con.register("rows", pdf)
    want = con.sql("""
        SELECT id FROM (
          SELECT id, w,
                 ln((CAST(concat('0x', substr(md5(concat_ws(chr(31), '7',
                        CAST(id AS VARCHAR))), 1, 13)) AS BIGINT) + 0.5)
                    / 4503599627370496.0) / w AS p
          FROM rows)
        ORDER BY p DESC, id LIMIT 40""").fetchdf()["id"].tolist()
    got = [r["id"] for r in
           weighted_sample(rows, 40, ["id"], "w", seed=7).collect()]
    assert sorted(got) == sorted(want)
