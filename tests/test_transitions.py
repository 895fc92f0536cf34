"""Transition analytics (sketchlib/transitions.py).

Gates: bigram counts equal a driver-side recount on synthetic
transcripts (order via (conv_id, turn_idx)); start-state mode keeps
one '^'-row per key; probabilities row-normalize to 1.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.synth import transcripts
from sketchlib.transitions import transition_counts


@pytest.fixture(scope="module")
def tdf(spark):
    return transcripts(spark, 300, seed=11, partitions=8).cache()


def test_counts_match_pandas(spark, tdf):
    got = (transition_counts(tdf, "conv_id", ["turn_idx"], "role",
                             with_prob=False)
           .toPandas().set_index(["prev_state", "state"])["n_transitions"]
           .sort_index())
    pdf = tdf.toPandas().sort_values(["conv_id", "turn_idx"])
    pdf["prev"] = pdf.groupby("conv_id")["role"].shift(1)
    want = (pdf.dropna(subset=["prev"])
            .groupby(["prev", "role"]).size().sort_index())
    assert got.to_numpy().tolist() == want.to_numpy().tolist()
    assert list(got.index) == list(want.index)


def test_start_state_rows(spark, tdf):
    got = transition_counts(tdf, "conv_id", ["turn_idx"], "role",
                            drop_first=False, with_prob=False)
    n_keys = tdf.select("conv_id").distinct().count()
    start_total = (got.filter(F.col("prev_state") == "^")
                   .agg(F.sum("n_transitions")).collect()[0][0])
    assert start_total == n_keys
    assert got.agg(F.sum("n_transitions")).collect()[0][0] == tdf.count()


def test_probs_row_normalize(spark, tdf):
    got = (transition_counts(tdf, "conv_id", ["turn_idx"], "role")
           .groupBy("prev_state").agg(F.sum("prob").alias("s"))
           .toPandas())
    assert np.allclose(got["s"].to_numpy(), 1.0)


def test_start_state_requires_string_states(spark, tdf):
    import pytest as _pt
    with _pt.raises(ValueError):
        transition_counts(tdf.withColumn("rc", F.xxhash64("role")),
                          "conv_id", ["turn_idx"], "rc",
                          drop_first=False)


def test_trigrams_match_pandas(spark, tdf):
    from sketchlib.transitions import sequence_ngrams
    got = (sequence_ngrams(tdf, "conv_id", ["turn_idx"], "role", n=3)
           .toPandas().set_index(["s0", "s1", "s2"])["n_occurrences"]
           .sort_index())
    pdf = tdf.toPandas().sort_values(["conv_id", "turn_idx"])
    g = pdf.groupby("conv_id")
    pdf["p1"] = g["role"].shift(1)
    pdf["p2"] = g["role"].shift(2)
    want = (pdf.dropna(subset=["p1", "p2"])
            .groupby(["p2", "p1", "role"]).size().sort_index())
    assert got.to_numpy().tolist() == want.to_numpy().tolist()
    assert list(got.index) == list(want.index)


def test_trigram_count_per_key(spark):
    from sketchlib.transitions import sequence_ngrams
    df = spark.createDataFrame(
        [("c", i, "x") for i in range(5)] + [("d", 0, "y")],
        "conv_id string, turn_idx int, role string")
    got = sequence_ngrams(df, "conv_id", ["turn_idx"], "role", n=3)
    rows = got.collect()
    # c contributes 5-3+1 = 3 trigrams, d (len 1 < 3) contributes none
    assert len(rows) == 1 and rows[0]["n_occurrences"] == 3
