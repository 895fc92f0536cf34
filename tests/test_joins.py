"""Sketch-accelerated joins (sketchlib/joins.py).

Gates: AMS join-size exact in the collision-free regime and inside
the AMS bound always; partitioning invariance (sum-merge count
sketches are order-independent); Bloom semi-join row-identical to the
plain semi-join including keys absent from the dim side.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.joins import bloom_semi_join, join_size_estimate


@pytest.fixture(scope="module")
def sides(spark):
    a = spark.createDataFrame(
        [(i % 40, "x") for i in range(2000)], "k long, pa string")
    b = spark.createDataFrame(
        [(i % 60, "y") for i in range(1200)], "k long, pb string")
    return a.cache(), b.cache()


def exact_join_size(a, b):
    return a.join(b, "k").count()


def test_join_size_exact_collision_free(spark, sides):
    a, b = sides
    est = join_size_estimate(a, "k", b, "k", np_bits=20, nh=7)
    assert est == float(exact_join_size(a, b))


def test_join_size_partitioning_invariant(spark, sides):
    a, b = sides
    e1 = join_size_estimate(a.repartition(1), "k", b.repartition(1), "k")
    e2 = join_size_estimate(a.repartition(13), "k", b.repartition(7), "k")
    assert e1 == e2


def test_join_size_ams_bound_with_collisions(spark):
    """Tiny width forces collisions; the estimate must stay inside
    6 * ||f_A||2 ||f_B||2 / sqrt(w) of the truth (both hash families)."""
    a = spark.createDataFrame([(i % 500,) for i in range(5000)], "k long")
    b = spark.createDataFrame([(i % 700,) for i in range(4200)], "k long")
    true = exact_join_size(a, b)
    f2a = (a.groupBy("k").count()
           .agg(F.sum(F.col("count") ** 2)).collect()[0][0])
    f2b = (b.groupBy("k").count()
           .agg(F.sum(F.col("count") ** 2)).collect()[0][0])
    for fw in (True, False):
        est = join_size_estimate(a, "k", b, "k", np_bits=8, nh=7,
                                 four_wise=fw)
        bound = 6.0 * float(np.sqrt(f2a * f2b / (1 << 8)))
        assert abs(est - true) <= bound, (fw, est, true, bound)


def test_bloom_semi_join_row_identical(spark, sides):
    a, b = sides
    dim = b.filter(F.col("k") % 3 == 0)  # includes keys a never has
    got = sorted(map(tuple,
                     bloom_semi_join(spark, a, "k", dim, "k", p=16)
                     .collect()))
    want = sorted(map(tuple,
                      a.join(dim.select("k").distinct(), "k", "leftsemi")
                      .collect()))
    assert got == want and len(got) > 0


def test_bloom_semi_join_empty_dim(spark, sides):
    a, b = sides
    dim = b.filter(F.col("k") < 0)
    assert bloom_semi_join(spark, a, "k", dim, "k", p=16).count() == 0
