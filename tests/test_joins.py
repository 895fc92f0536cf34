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


# ---------------------------------------------------------------- as-of
def _asof_fixture(spark):
    left = spark.createDataFrame(
        [(1, 100.0, "e1"), (1, 205.0, "e2"), (2, 50.0, "e3"),
         (3, 10.0, "e4")],
        "k long, t double, lid string")
    right = spark.createDataFrame(
        [(1, 100.0, "r1"), (1, 200.0, "r2"), (1, 300.0, "r3"),
         (2, 60.0, "r4")],
        "k long, t double, rid string")
    return left, right


def test_asof_backward_inclusive_and_unmatched(spark):
    from sketchlib.joins import asof_join
    left, right = _asof_fixture(spark)
    got = {r["lid"]: (r["rid"], r["asof_ts"])
           for r in asof_join(left, right, on="k", left_ts="t",
                              right_ts="t", right_cols=["rid"]).collect()}
    assert got == {"e1": ("r1", 100.0),   # inclusive at equal ts
                   "e2": ("r2", 200.0),   # most recent preceding
                   "e3": (None, None),    # right rows only after
                   "e4": (None, None)}    # key absent from right


def test_asof_forward(spark):
    from sketchlib.joins import asof_join
    left, right = _asof_fixture(spark)
    got = {r["lid"]: r["rid"]
           for r in asof_join(left, right, on="k", left_ts="t",
                              right_ts="t", right_cols=["rid"],
                              direction="forward").collect()}
    assert got == {"e1": "r1", "e2": "r3", "e3": "r4", "e4": None}


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized parity with pandas.merge_asof (backward, inclusive)
    on multi-key interleaved data."""
    import numpy as np
    import pandas as pd
    from sketchlib.joins import asof_join
    rng = np.random.default_rng(7)
    lp = pd.DataFrame({"k": rng.integers(0, 5, 200),
                       "t": rng.integers(0, 1000, 200).astype("float64"),
                       "lid": np.arange(200)})
    rp = pd.DataFrame({"k": rng.integers(0, 5, 150),
                       "t": rng.integers(0, 1000, 150).astype("float64"),
                       "rv": np.arange(150)})
    # unique (k, t) on the right so the tie rule can't differ
    rp = rp.drop_duplicates(["k", "t"])
    want = pd.merge_asof(lp.sort_values("t", kind="stable"),
                         rp.sort_values("t", kind="stable"),
                         on="t", by="k", direction="backward")
    want = want.sort_values("lid")["rv"].tolist()
    got_df = asof_join(spark.createDataFrame(lp), spark.createDataFrame(rp),
                       on="k", left_ts="t", right_ts="t",
                       right_cols=["rv"]).toPandas()
    got = got_df.sort_values("lid")["rv"].tolist()
    assert [(-1 if pd.isna(x) else x) for x in got] == \
           [(-1 if pd.isna(x) else x) for x in want]


def test_asof_single_shuffle_plan(spark):
    """The as-of plan must contain exactly ONE shuffle exchange (the
    key hash partitioning for the window) — no join exchange, no
    range cross-product."""
    from tests.conftest import n_shuffles, plan_of
    from sketchlib.joins import asof_join
    left, right = _asof_fixture(spark)
    j = asof_join(left, right, on="k", left_ts="t", right_ts="t",
                  right_cols=["rid"])
    assert n_shuffles(plan_of(j)) == 1


# ---------------------------------------------------------------- range
def test_range_join_matches_bruteforce(spark):
    """Pure interval join (no equi keys), every bucket_width: output
    pairs == the O(n*m) cross-filter, each exactly once."""
    import itertools
    pts = [(i, 3 * i % 97) for i in range(60)]
    ivs = [(j, 7 * j % 89, 7 * j % 89 + (j % 13)) for j in range(40)]
    p = spark.createDataFrame(pts, "pid long, v long")
    iv = spark.createDataFrame(ivs, "iid long, s long, e long")
    want = sorted((pi, ii) for (pi, v), (ii, s, e)
                  in itertools.product(pts, ivs) if s <= v < e)
    from sketchlib.joins import range_join
    for w in (1, 4, 13, 50):
        got = sorted((r["pid"], r["iid"])
                     for r in range_join(p, "v", iv, "s", "e",
                                         bucket_width=w).collect())
        assert got == want, w


def test_range_join_keyed_and_negative_values(spark):
    from sketchlib.joins import range_join
    p = spark.createDataFrame(
        [(1, -5), (1, 0), (2, -5), (1, 7)], "k long, v long")
    iv = spark.createDataFrame(
        [(1, -6, 1), (2, -10, -4), (1, 5, 6)], "k long, s long, e long")
    got = sorted((r["k"], r["v"], r["s"])
                 for r in range_join(p, "v", iv, "s", "e",
                                     bucket_width=3, keys=["k"]).collect())
    assert got == [(1, -5, -6), (1, 0, -6), (2, -5, -10)]


def test_range_join_plans_hash_join_not_bnlj(spark):
    """The whole point: a shuffled/broadcast HASH join on the bucket,
    never BroadcastNestedLoopJoin."""
    from tests.conftest import plan_of
    from sketchlib.joins import range_join
    p = spark.range(100).select(F.col("id").alias("v"))
    iv = spark.range(50).select(F.col("id").alias("s"),
                                (F.col("id") + 5).alias("e"))
    plan = plan_of(range_join(p, "v", iv, "s", "e", bucket_width=5))
    assert "NestedLoop" not in plan and "HashJoin" in plan


# ---- skew_split_join ----------------------------------------------------

@pytest.fixture(scope="module")
def skewed_sides(spark):
    """Fact side where key 7 holds half the rows (the hot-conversation
    shape); dim side has one row per key plus keys absent from fact."""
    rows = [(7, i) for i in range(3000)] + \
           [(i % 97 + 100, i) for i in range(3000)]
    fact = spark.createDataFrame(rows, "k long, payload long")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 260)], "k long, dpay string")
    return fact.cache(), dim.cache()


def test_hot_keys_finds_the_hot_key(spark, skewed_sides):
    from sketchlib.joins import hot_keys
    fact, _ = skewed_sides
    pairs = hot_keys(fact, "k", top_k=5, summary_k=512)
    assert pairs[0][0] == 7
    # MG lower bound: true=3000, off by at most n/(k+1)
    assert 3000 - 6000 // 513 <= pairs[0][1] <= 3000


def test_skew_split_join_row_identical(spark, skewed_sides):
    from sketchlib.joins import skew_split_join
    fact, dim = skewed_sides
    plain = fact.join(dim, "k").select("k", "payload", "dpay")
    split = (skew_split_join(fact, dim, "k", top_k=4, summary_k=256)
             .select("k", "payload", "dpay"))
    assert split.exceptAll(plain).count() == 0
    assert plain.exceptAll(split).count() == 0


def test_skew_split_join_leftsemi_and_override(spark, skewed_sides):
    from sketchlib.joins import skew_split_join
    fact, dim = skewed_sides
    plain = fact.join(dim, "k", "leftsemi")
    split = skew_split_join(fact, dim, "k", how="leftsemi", hot=[7])
    assert split.exceptAll(plain).count() == 0
    assert plain.exceptAll(split).count() == 0
    # hot=[] degrades to the plain join
    same = skew_split_join(fact, dim, "k", hot=[])
    assert same.count() == fact.join(dim, "k").count()


def test_skew_split_join_plan_broadcasts_only_hot_side(spark, skewed_sides):
    """With auto-broadcast off, the hot side must still plan a
    BroadcastHashJoin (explicit hint) while the cold side shuffles —
    the whole point of the operator."""
    from sketchlib.joins import skew_split_join
    fact, dim = skewed_sides
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = skew_split_join(fact, dim, "k", hot=[7])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_skew_split_join_rejects_outer(spark, skewed_sides):
    from sketchlib.joins import skew_split_join
    fact, dim = skewed_sides
    with pytest.raises(ValueError):
        skew_split_join(fact, dim, "k", how="left")


# ---- bloom_anti_join ----------------------------------------------------

def test_bloom_anti_join_row_identical(spark, sides):
    from sketchlib.joins import bloom_anti_join
    a, b = sides
    # keys 40..59 exist only in b; keys in a are 0..39 (all matched) —
    # augment a with orphan keys 100..119 so the anti result is non-empty
    a2 = a.unionByName(
        spark.createDataFrame([(100 + i % 20, "o") for i in range(200)],
                              "k long, pa string"))
    plain = a2.join(b, "k", "left_anti")
    got = bloom_anti_join(spark, a2, "k", b, "k", p=18)
    assert got.exceptAll(plain).count() == 0
    assert plain.exceptAll(got).count() == 0


def test_bloom_anti_join_tiny_filter_fp_regime(spark, sides):
    """At p=6 the filter is saturated with false positives; the exact
    anti-join on the maybes must still make the result row-identical."""
    from sketchlib.joins import bloom_anti_join
    a, b = sides
    a2 = a.unionByName(
        spark.createDataFrame([(500 + i, "o") for i in range(50)],
                              "k long, pa string"))
    plain = a2.join(b, "k", "left_anti")
    got = bloom_anti_join(spark, a2, "k", b, "k", p=6, nh=2)
    assert got.exceptAll(plain).count() == 0
    assert plain.exceptAll(got).count() == 0


def test_bloom_anti_join_null_keys_kept(spark, sides):
    from sketchlib.joins import bloom_anti_join
    _, b = sides
    a = spark.createDataFrame([(None, "n"), (7, "m"), (999, "o")],
                              "k long, pa string")
    plain = a.join(b, "k", "left_anti")
    got = bloom_anti_join(spark, a, "k", b, "k", p=18)
    assert sorted(r["pa"] for r in got.collect()) == \
        sorted(r["pa"] for r in plain.collect())


def test_hot_keys_string_conv_id(spark):
    """The north rule's skewed key is a STRING conv_id: detection runs
    in xxhash64 space, hot hashes resolve back to values with one
    pushed-down filter scan."""
    from sketchlib.joins import hot_keys
    rows = [("conv_hot", i) for i in range(2500)] + \
           [(f"conv_{i % 80:03d}", i) for i in range(2500)]
    df = spark.createDataFrame(rows, "conv_id string, x long")
    pairs = hot_keys(df, "conv_id", top_k=3, summary_k=512)
    assert pairs[0][0] == "conv_hot"
    assert 2500 - 5000 // 513 <= pairs[0][1] <= 2500


def test_skew_split_join_string_keys_row_identical(spark):
    from sketchlib.joins import skew_split_join
    rows = [("conv_hot", i) for i in range(2000)] + \
           [(f"conv_{i % 50:03d}", i) for i in range(2000)]
    fact = spark.createDataFrame(rows, "conv_id string, x long")
    dim = spark.createDataFrame(
        [("conv_hot", "H")] + [(f"conv_{i:03d}", f"d{i}")
                               for i in range(60)],
        "conv_id string, meta string")
    plain = fact.join(dim, "conv_id").select("conv_id", "x", "meta")
    split = (skew_split_join(fact, dim, "conv_id", top_k=4,
                             summary_k=256)
             .select("conv_id", "x", "meta"))
    assert split.exceptAll(plain).count() == 0
    assert plain.exceptAll(split).count() == 0


def test_skew_split_join_empty_hot_schema_matches_split_path(spark,
                                                             skewed_sides):
    """hot=[] fallback must yield the same single-key-column schema as
    the split path (an expression join would keep two 'k' columns and
    break any downstream select('k'))."""
    from sketchlib.joins import skew_split_join
    fact, dim = skewed_sides
    empty = skew_split_join(fact, dim, "k", hot=[])
    split = skew_split_join(fact, dim, "k", hot=[7])
    assert empty.columns == split.columns
    # the previously-ambiguous reference now resolves
    assert empty.select("k").count() == split.select("k").count()
