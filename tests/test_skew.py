"""Skew handling: salted grouped aggregation and salted repartition.

North-rule requirement: conv_id-salted repartitioning to defeat
hot-conversation skew. Two mechanisms are tested:
- ``salted_repartition`` (tokenize.py): spreads a hot key's rows
  across partitions for ungrouped builds;
- ``build_grouped_sketches(salt_buckets=...)`` (aggregate.py): a
  two-stage (key, salt) -> key aggregation so one hot group's kernel
  work parallelizes; result must be bit-identical to the unsalted
  plan for order-independent sketches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.aggregate import build_grouped_sketches
from sketchlib.sketches.base import deserialize
from sketchlib.sketches.cm import CMConfig, CountMin
from sketchlib.sketches.hll import HyperLogLog
from sketchlib.tokenize import salted_repartition
from functools import partial


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows belong to one hot conversation."""
    n = 30000
    rng = np.random.default_rng(5)
    conv = np.where(rng.random(n) < 0.9, "conv_hot",
                    np.char.add("conv_", rng.integers(0, 50, n).astype(str)))
    pdf = pd.DataFrame({
        "conv_id": conv,
        "turn_idx": np.arange(n) % 97,
        "token_u64": rng.integers(0, 5000, n),
    })
    return spark.createDataFrame(pdf).cache()


def test_salted_repartition_balances_hot_key(skewed):
    parts = (salted_repartition(skewed, 8)
             .withColumn("pid", F.spark_partition_id())
             .groupBy("pid").count().toPandas())
    sizes = parts["count"].to_numpy()
    assert len(sizes) == 8
    # a plain hash-by-conv_id partitioning puts >=90% of rows in one
    # partition; salted must keep the max under 2x the mean
    assert sizes.max() < 2 * sizes.mean()


def test_salted_grouped_cm_bitexact_vs_unsalted(skewed):
    cfg = CMConfig(np_bits=12, nh=3, seed=7, conservative=False)
    plain = {r["conv_id"]: bytes(r["sketch"]) for r in
             build_grouped_sketches(skewed, ["conv_id"], "token_u64",
                                    partial(CountMin, cfg)).collect()}
    salted = {r["conv_id"]: bytes(r["sketch"]) for r in
              build_grouped_sketches(skewed, ["conv_id"], "token_u64",
                                     partial(CountMin, cfg),
                                     salt_buckets=16).collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        a = deserialize(plain[k])
        b = deserialize(salted[k])
        assert (a.core == b.core).all(), k


def test_salted_grouped_hll_estimates_match(skewed):
    plain = {r["conv_id"]: deserialize(bytes(r["sketch"])).estimate()
             for r in build_grouped_sketches(
                 skewed, ["conv_id"], "token_u64",
                 partial(HyperLogLog, 12)).collect()}
    salted = {r["conv_id"]: deserialize(bytes(r["sketch"])).estimate()
              for r in build_grouped_sketches(
                  skewed, ["conv_id"], "token_u64",
                  partial(HyperLogLog, 12), salt_buckets=16).collect()}
    assert plain == salted
