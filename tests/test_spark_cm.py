"""Distributed CM build over synthetic transcripts (pyspark local).

Covers SURVEY.md §5.5(2): distributed-vs-sequential bit-exactness for
plain CM, merge commutativity, the one-sided guarantee for the
conservative variant, collision-free-width equality with the exact
oracle, and the per-row text-equality invariant from BASELINE.json
``input_hint``.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.aggregate import build_sketch
from sketchlib.sketches.cm import CMConfig, CountMin
from sketchlib.synth import transcripts, transcripts_pandas
from sketchlib.tokenize import balanced_repartition, transcript_tokens

N_CONVS = 300
SEED = 42


@pytest.fixture(scope="module")
def tdf(spark):
    df = transcripts(spark, N_CONVS, seed=SEED, partitions=6).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def tokens(tdf):
    return transcript_tokens(tdf).cache()


def test_generator_deterministic_and_partition_independent(spark, tdf):
    pdf_direct = transcripts_pandas(N_CONVS, seed=SEED)
    got = (tdf.orderBy("conv_id", "turn_idx")
              .toPandas()
              .reset_index(drop=True))
    want = (pdf_direct.sort_values(["conv_id", "turn_idx"])
                      .reset_index(drop=True))
    assert got["text"].tolist() == want["text"].tolist()
    assert got["role"].tolist() == want["role"].tolist()
    # different partitioning, same rows
    other = (transcripts(spark, N_CONVS, seed=SEED, partitions=17)
             .orderBy("conv_id", "turn_idx").toPandas())
    assert other["text"].tolist() == got["text"].tolist()


def test_per_row_text_invariant_after_pipeline(tdf):
    """BASELINE.json input_hint: per-turn text equality under stable
    (conv_id, turn_idx) ordering survives repartition+process."""
    before = tdf.orderBy("conv_id", "turn_idx").select("text").toPandas()
    after = (balanced_repartition(tdf, 13)
             .withColumn("n_tok", F.size(F.split(F.col("text"), r"\s+")))
             .orderBy("conv_id", "turn_idx")
             .select("text").toPandas())
    assert before["text"].tolist() == after["text"].tolist()


def test_plain_cm_distributed_bitexact_vs_sequential(tokens):
    cfg = CMConfig(np_bits=16, nh=5, seed=137, conservative=False)
    dist = build_sketch(balanced_repartition(tokens, 11), "token_u64",
                        partial(CountMin, cfg))
    vals = tokens.select("token_u64").toPandas()["token_u64"].to_numpy()
    seq = CountMin(cfg)
    seq.update(vals.view(np.uint64))
    np.testing.assert_array_equal(dist.core, seq.core)


def test_cm_exact_at_collision_free_width(tokens):
    """At width >> #distinct, CM point estimates equal exact counts."""
    cfg = CMConfig(np_bits=20, nh=5, seed=137, conservative=False)
    sk = build_sketch(tokens, "token_u64", partial(CountMin, cfg))
    exact = (tokens.groupBy("token_u64").count()
             .toPandas())
    keys = exact["token_u64"].to_numpy().view(np.uint64)
    est = sk.estimate(keys)
    np.testing.assert_array_equal(est, exact["count"].to_numpy().astype(np.uint64))


def test_conservative_cm_distributed_bounds(tokens):
    cfg = CMConfig(np_bits=10, nh=5, seed=137, conservative=True)
    cons = build_sketch(balanced_repartition(tokens, 7), "token_u64",
                        partial(CountMin, cfg))
    plain_cfg = CMConfig(np_bits=10, nh=5, seed=137, conservative=False)
    plain = build_sketch(tokens, "token_u64", partial(CountMin, plain_cfg))
    exact = tokens.groupBy("token_u64").count().toPandas()
    keys = exact["token_u64"].to_numpy().view(np.uint64)
    true = exact["count"].to_numpy().astype(np.uint64)
    est_c = cons.estimate(keys)
    est_p = plain.estimate(keys)
    assert (est_c >= true).all(), "one-sided guarantee broken"
    assert (est_c <= est_p).all(), "conservative exceeded plain"


def test_merge_commutativity_random_orders(tokens):
    """merge(a,b) == merge(b,a) bit-exactly across partition orderings."""
    cfg = CMConfig(np_bits=12, nh=3, seed=7, conservative=False)
    pdf = tokens.select("token_u64").toPandas()
    vals = pdf["token_u64"].to_numpy().view(np.uint64)
    rng = np.random.default_rng(0)
    parts = np.array_split(vals[rng.permutation(len(vals))], 6)
    sketches = []
    for p in parts:
        s = CountMin(cfg)
        s.update(p)
        sketches.append(s.core.copy())

    def merge_order(order):
        acc = np.zeros_like(sketches[0])
        for i in order:
            acc = acc + sketches[i]
        return acc

    base = merge_order(range(6))
    for _ in range(5):
        order = rng.permutation(6)
        np.testing.assert_array_equal(base, merge_order(order))


def test_null_text_turn_keeps_tool_and_role_tokens(spark):
    """A tool-call turn with NULL text must still emit its tool and
    role tokens: F.concat is null-intolerant, so an uncoalesced NULL
    word array would silently drop the whole row (ADVICE round 1)."""
    rows = [
        ("c0", 0, "user", "hello world", None, "2026-01-01 00:00:00"),
        ("c0", 1, "assistant", None, "bash", "2026-01-01 00:00:01"),
        ("c0", 2, "tool", None, None, "2026-01-01 00:00:02"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts string").withColumn("ts", F.col("ts").cast("timestamp"))
    toks = transcript_tokens(df).toPandas()
    # words from turn 0; tool + role tokens survive text=NULL turns
    got = sorted(toks["token"])
    assert got == sorted(["w:hello", "w:world", "r:user",
                          "t:bash", "r:assistant", "r:tool"])
