"""Distributed builds of HLL / Bloom / t-digest / KLL through the same
harness, cross-checked against exact oracles and Spark built-ins
(`approx_count_distinct`, `percentile_approx`) per SURVEY.md §7.3.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.aggregate import build_grouped_sketches, build_sketch
from sketchlib.sketches.bloom import BloomFilter
from sketchlib.sketches.hll import HyperLogLog
from sketchlib.sketches.kll import KLL
from sketchlib.sketches.tdigest import TDigest
from sketchlib.sketches.base import deserialize
from sketchlib.synth import transcripts
from sketchlib.tokenize import transcript_tokens

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def tokens(spark):
    t = transcript_tokens(transcripts(spark, 250, seed=5, partitions=5)).cache()
    t.count()
    return t


def test_hll_distributed_vs_exact_and_builtin(spark, tokens):
    hll = build_sketch(tokens, "token_u64", partial(HyperLogLog, 14))
    exact = tokens.select("token_u64").distinct().count()
    est = hll.estimate()
    assert abs(est - exact) / exact < 4 * hll.relative_error
    builtin = tokens.agg(
        F.approx_count_distinct("token_u64").alias("d")).collect()[0]["d"]
    assert abs(builtin - exact) / exact < 0.05  # sanity on the oracle


def test_hll_distributed_bitexact_registers(spark, tokens):
    """HLL registers are max-merged => distributed == sequential."""
    dist = build_sketch(tokens.repartition(9), "token_u64",
                        partial(HyperLogLog, 12))
    vals = tokens.select("token_u64").toPandas()["token_u64"].to_numpy()
    seq = HyperLogLog(12)
    seq.update(vals.view(np.uint64))
    np.testing.assert_array_equal(dist.registers, seq.registers)


def test_bloom_distributed_membership(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    bf = build_sketch(li.select(F.col("l_partkey").alias("k")), "k",
                      partial(BloomFilter, 20, 4))
    present = (li.select("l_partkey").distinct()
               .toPandas()["l_partkey"].to_numpy().view(np.uint64))
    assert bf.contains(present).all()
    absent = (np.arange(10**9, 10**9 + 20_000)).astype(np.uint64)
    assert bf.contains(absent).mean() < 0.01


def test_quantiles_distributed_vs_exact_and_builtin(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    col = li.select(F.col("l_extendedprice").alias("v"))
    td = build_sketch(col, "v", partial(TDigest, 200.0), as_u64=False)
    kll = build_sketch(col, "v", partial(KLL, 200), as_u64=False)
    vals = np.sort(col.toPandas()["v"].to_numpy())
    n = len(vals)
    assert td.count == n and kll.count == n
    for q in (0.1, 0.5, 0.9):
        for est in (td.quantile(q), kll.quantile(q)):
            rank = np.searchsorted(vals, est) / n
            assert abs(rank - q) < 0.03, (q, rank, est)
    builtin = li.agg(F.percentile_approx("l_extendedprice", 0.5)).collect()[0][0]
    rank_b = np.searchsorted(vals, builtin) / n
    assert abs(rank_b - 0.5) < 0.02


def test_ddsketch_distributed_relative_error(spark):
    """DDSketch through the same harness (pre-aggregate weighted
    path): every quantile within the alpha relative-error guarantee
    of the exact rank quantile."""
    from sketchlib.sketches.dd import DDSketch
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    col = li.select(F.col("l_extendedprice").alias("v"))
    dd = build_sketch(col, "v", partial(DDSketch, 0.01, 4096),
                      as_u64=False, pre_aggregate=True)
    vals = np.sort(col.toPandas()["v"].to_numpy())
    n = len(vals)
    assert dd.count == n
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        exact = vals[max(1, int(np.ceil(q * n))) - 1]
        assert abs(dd.quantile(q) - exact) <= 0.01 * abs(exact), q


def test_grouped_sketches_per_key(spark, tokens):
    out = build_grouped_sketches(
        tokens.withColumn("kind", F.substring("token", 1, 1)),
        ["kind"], "token_u64", partial(HyperLogLog, 12)).collect()
    kinds = {r["kind"]: deserialize(bytes(r["sketch"])) for r in out}
    assert set(kinds) == {"w", "t", "r"}
    exact_roles = (tokens.filter(F.col("token").startswith("r:"))
                   .select("token_u64").distinct().count())
    est = kinds["r"].estimate()
    assert abs(est - exact_roles) <= max(2, 4 * kinds["r"].relative_error * exact_roles)

def test_grouped_sketches_multi_one_pass_bitexact(spark, tokens):
    """build_grouped_sketches_multi == independent build_grouped_sketches
    per factory, bit-exact per (group, name), salted and unsalted —
    the estimator-panel pass-sharing must be free of semantic drift."""
    from sketchlib.aggregate import build_grouped_sketches_multi
    from sketchlib.sketches.pcsa import PCSA

    keyed = tokens.withColumn("kind", F.substring("token", 1, 1))
    factories = {"hll": partial(HyperLogLog, 12),
                 "pcsa": partial(PCSA, 64)}
    for salt in (None, 4):
        multi = {(r["kind"], r["name"]): bytes(r["sketch"])
                 for r in build_grouped_sketches_multi(
                     keyed, ["kind"], "token_u64", factories,
                     salt_buckets=salt).collect()}
        assert set(multi) == {(k, n) for k in ("w", "t", "r")
                              for n in factories}
        for name, fac in factories.items():
            single = {r["kind"]: bytes(r["sketch"])
                      for r in build_grouped_sketches(
                          keyed, ["kind"], "token_u64", fac,
                          salt_buckets=salt).collect()}
            for kind, blob in single.items():
                got = deserialize(multi[(kind, name)])
                want = deserialize(blob)
                np.testing.assert_array_equal(
                    got.registers if name == "hll" else got.maps,
                    want.registers if name == "hll" else want.maps)


def test_grouped_pre_aggregate_and_pre_distinct_bitexact(spark, tokens):
    """The grouped scale paths must be invisible in the result:
    pre_aggregate (JVM (key,value,count) collapse + update_weighted)
    is bit-exact for counting sketches, pre_distinct (JVM dedup) is
    bit-exact for duplicate-insensitive sketches — salted and not."""
    from sketchlib.sketches.cm import CMConfig, CountMin
    from sketchlib.sketches.mh import MinHashBottomK
    from sketchlib.sketches.wmh import CountingMinHash

    keyed = tokens.withColumn("kind", F.substring("token", 1, 1))

    def blobs(factory, **kw):
        return {r["kind"]: bytes(r["sketch"])
                for r in build_grouped_sketches(
                    keyed, ["kind"], "token_u64", factory, **kw).collect()}

    for salt in (None, 4):
        # counting sketches: weighted collapse must not change a cell
        for fac, field in ((partial(CountMin, CMConfig(8, 3, 7, False)),
                            "core"),
                           (partial(CountingMinHash, 1 << 12), "values")):
            plain = blobs(fac, salt_buckets=salt)
            pre = blobs(fac, salt_buckets=salt, pre_aggregate=True)
            for kind in plain:
                np.testing.assert_array_equal(
                    getattr(deserialize(plain[kind]), field),
                    getattr(deserialize(pre[kind]), field))
        # duplicate-insensitive sketches: dedup must be a no-op
        for fac, field in ((partial(HyperLogLog, 12), "registers"),
                           (partial(MinHashBottomK, 1 << 12), "values")):
            plain = blobs(fac, salt_buckets=salt)
            pre = blobs(fac, salt_buckets=salt, pre_distinct=True)
            for kind in plain:
                np.testing.assert_array_equal(
                    getattr(deserialize(plain[kind]), field),
                    getattr(deserialize(pre[kind]), field))
