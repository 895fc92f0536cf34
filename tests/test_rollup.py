"""rollup_grouped_sketches: hierarchy levels are produced by MERGING
child blobs, so for order-independent sketches each level must be
BIT-IDENTICAL to a direct build at that granularity, and the row set
must be exactly GROUP BY ROLLUP's."""

from functools import partial

import pytest
from pyspark.sql import functions as F

from sketchlib.aggregate import (build_grouped_sketches, build_sketch,
                                 rollup_grouped_sketches)
from sketchlib.sketches.hll import HyperLogLog


@pytest.fixture(scope="module")
def base(spark):
    rows = [(chr(97 + (i % 3)), f"s{i % 2}", i % 40) for i in range(500)]
    df = spark.createDataFrame(rows, "lang string, source string, v long")
    return df.withColumn("kh", F.xxhash64("v")).cache()


def _blobs(df, keys):
    return {tuple(r[k] for k in keys): bytes(r["sketch"])
            for r in df.collect()}


def test_rollup_levels_bitexact_vs_direct_builds(spark, base):
    fac = partial(HyperLogLog, 12)
    grouped = build_grouped_sketches(base, ["lang", "source"], "kh", fac,
                                     pre_distinct=True)
    rolled = rollup_grouped_sketches(grouped, ["lang", "source"]).cache()

    # finest level passes through untouched
    got2 = _blobs(rolled.filter(F.col("source").isNotNull()),
                  ["lang", "source"])
    want2 = _blobs(grouped, ["lang", "source"])
    assert got2 == want2

    # lang level == direct per-lang build (register-max merge is
    # associative, so merging source blobs == sketching the lang stream)
    got1 = _blobs(rolled.filter(F.col("source").isNull()
                                & F.col("lang").isNotNull()), ["lang"])
    want1 = _blobs(build_grouped_sketches(base, ["lang"], "kh", fac,
                                          pre_distinct=True), ["lang"])
    assert got1 == want1

    # grand total == direct global build
    [total] = rolled.filter(F.col("lang").isNull()).collect()
    assert total["source"] is None
    direct = build_sketch(base.select("kh").distinct(), "kh", fac)
    assert bytes(total["sketch"]) == direct.to_bytes()


def test_rollup_row_set_matches_sql_rollup(spark, base):
    fac = partial(HyperLogLog, 12)
    grouped = build_grouped_sketches(base, ["lang", "source"], "kh", fac,
                                     pre_distinct=True)
    rolled = rollup_grouped_sketches(grouped, ["lang", "source"])
    key = lambda t: tuple((x is None, x or "") for x in t)
    got = sorted(((r["lang"], r["source"]) for r in rolled.collect()),
                 key=key)
    want = sorted(((r["lang"], r["source"]) for r in
                   base.rollup("lang", "source").count().collect()),
                  key=key)
    assert got == want


def test_cube_levels_bitexact_and_row_set(spark, base):
    from sketchlib.aggregate import cube_grouped_sketches
    fac = partial(HyperLogLog, 12)
    grouped = build_grouped_sketches(base, ["lang", "source"], "kh", fac,
                                     pre_distinct=True)
    cubed = cube_grouped_sketches(grouped, ["lang", "source"]).cache()

    # the (source)-only level — the set rollup lacks — must be
    # bit-identical to a direct per-source build
    got = _blobs(cubed.filter(F.col("lang").isNull()
                              & F.col("source").isNotNull()), ["source"])
    want = _blobs(build_grouped_sketches(base, ["source"], "kh", fac,
                                         pre_distinct=True), ["source"])
    assert got == want

    key = lambda t: tuple((x is None, x or "") for x in t)
    got_rows = sorted(((r["lang"], r["source"]) for r in cubed.collect()),
                      key=key)
    want_rows = sorted(((r["lang"], r["source"]) for r in
                        base.cube("lang", "source").count().collect()),
                       key=key)
    assert got_rows == want_rows
