"""One-scan table profiler (sketchlib/profile.py).

Exactness gates: the exact panel must equal hand-computed SQL-style
counts (including NULL semantics — COUNT and COUNT(DISTINCT) skip
NULLs), the KLL median must be the rank median in the exact regime,
and the sketch-only regime (exact=False, the corpus-scale path) must
keep the same estimates without the exact leg.
"""

import pytest
from pyspark.sql import functions as F

from sketchlib.profile import melt_for_profile, profile_table


@pytest.fixture(scope="module")
def littable(spark):
    rows = [(i, float(i % 7), "ab"[i % 2], None if i % 5 == 0 else i % 3)
            for i in range(200)]
    return spark.createDataFrame(
        rows, "id long, val double, tag string, holey int").cache()


def test_melt_null_semantics(littable):
    m = melt_for_profile(littable, ["holey"])
    # 40 of 200 rows have NULL holey: kh must be NULL there (so SQL
    # COUNT semantics hold downstream), never the xxhash64 NULL seed
    assert m.filter(F.col("kh").isNull()).count() == 40
    assert m.filter(F.col("kh").isNotNull()).count() == 160


def test_profile_exact_panel(spark, littable):
    prof = {r["column"]: r for r in profile_table(
        spark, littable, ["id", "val", "tag", "holey"],
        qs=(0.5,), kll_k=1000).collect()}
    assert prof["id"]["n_values"] == 200
    assert prof["id"]["n_distinct"] == 200
    assert prof["val"]["n_distinct"] == 7
    assert prof["tag"]["n_distinct"] == 2
    assert prof["holey"]["n_values"] == 160       # NULLs skipped
    assert prof["holey"]["n_distinct"] == 3
    # exact-regime KLL: rank median = smallest v with rank >= ceil(n/2)
    assert prof["id"]["p0_5"] == 99.0             # rank 100 of 0..199
    assert prof["val"]["p0_5"] == 3.0
    assert prof["tag"]["p0_5"] is None            # non-numeric
    assert all(prof[c]["within_bound"] for c in prof)


def test_profile_default_columns_skip_nested(spark, littable):
    nested = littable.withColumn("arr", F.array("id"))
    cols = set(r["column"] for r in
               profile_table(spark, nested, qs=(0.5,)).collect())
    assert cols == {"id", "val", "tag", "holey"}


def test_profile_sketch_only_regime(spark, littable):
    """exact=False — the 100 TB shape: no COUNT(DISTINCT) leg, HLL
    carries the distinct estimate, n_distinct/within_bound are NULL."""
    prof = {r["column"]: r for r in profile_table(
        spark, littable, ["id", "tag"], qs=(0.5,),
        exact=False, kll_k=1000).collect()}
    assert prof["id"]["n_distinct"] is None
    assert prof["id"]["within_bound"] is None
    assert abs(prof["id"]["approx_distinct"] - 200) <= 0.05 * 200
    assert prof["id"]["n_values"] == 200
