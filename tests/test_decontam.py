"""Benchmark decontamination (sketchlib/decontam.py): exact overlap
counts on a hand-built corpus, and bloom-prefilter == exact under a
deliberately undersized (false-positive-heavy) Bloom filter."""

from __future__ import annotations

import pytest

from sketchlib.decontam import benchmark_shingle_set, contamination

# benchmark "eval set": two docs with distinctive phrases
BENCH = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "to be or not to be that is the question"),
]

# training docs: 2 contaminated (share 3-gram runs with BENCH), rest clean
TRAIN = [
    # contains "the quick brown fox" => 2 overlapping 3-shingles
    (10, "breaking news the quick brown fox escaped the zoo today"),
    # contains "to be or not to be" => 4 overlapping 3-shingles
    (11, "hamlet asks to be or not to be in act three"),
    (12, "completely unrelated text about spark dataframes and shuffles"),
    (13, "another clean document with no benchmark phrases inside"),
    (14, "fox dog question be"),  # shares tokens but no 3-gram
]


@pytest.fixture(scope="module")
def frames(spark):
    b = spark.createDataFrame(BENCH, ["doc_id", "text"])
    t = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    return t, b


def test_exact_overlap_counts(spark, frames):
    t, b = frames
    rows = {r["doc_id"]: r for r in
            contamination(t, b, n=3, min_overlap=1).collect()}
    assert set(rows) == {10, 11}
    # doc 10: "the quick brown", "quick brown fox" (distinct shingles
    # of a 10-token doc: 8)
    assert rows[10]["n_hit"] == 2 and rows[10]["n_shingles"] == 8
    # doc 11: "to be or", "be or not", "or not to", "not to be"
    assert rows[11]["n_hit"] == 4
    assert rows[11]["overlap_frac"] == pytest.approx(
        int(4e6 / rows[11]["n_shingles"]) / 1e6)


def test_min_overlap_threshold(spark, frames):
    t, b = frames
    got = {r["doc_id"] for r in
           contamination(t, b, n=3, min_overlap=3).collect()}
    assert got == {11}


def test_bloom_equals_exact_under_heavy_fp(spark):
    # 200 train docs over a tiny shared vocab + an 8-bit Bloom (256
    # bits for ~60 benchmark shingles => high FP rate): the exact
    # verify must still strip every false positive.
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    train = [(i, " ".join(vocab[(i + j) % 10] for j in range(8)))
             for i in range(200)]
    bench = [(900 + i, " ".join(vocab[(3 * i + j) % 10] for j in range(12)))
             for i in range(5)]
    t = spark.createDataFrame(train, ["doc_id", "text"])
    b = spark.createDataFrame(bench, ["doc_id", "text"])
    exact = sorted(map(tuple, contamination(
        t, b, n=3, min_overlap=2, method="exact").collect()))
    bloom = sorted(map(tuple, contamination(
        t, b, n=3, min_overlap=2, method="bloom", bloom_p=8,
        bloom_nh=2).collect()))
    assert exact == bloom
    assert len(exact) > 0  # the fixture actually exercises overlap


def test_short_docs_cannot_be_flagged(spark):
    b = spark.createDataFrame([(0, "aa bb cc dd")], ["doc_id", "text"])
    t = spark.createDataFrame([(1, "aa bb"), (2, "aa bb cc")],
                              ["doc_id", "text"])
    got = {r["doc_id"]: r["n_hit"] for r in
           contamination(t, b, n=3).collect()}
    assert got == {2: 1}  # the 2-token doc has no 3-shingles at all


def test_benchmark_set_is_distinct_hashes(spark, frames):
    _, b = frames
    s = benchmark_shingle_set(b, n=3)
    assert s.columns == ["sh64"]
    assert s.count() == s.distinct().count()


def test_exact_plan_broadcasts_benchmark_side(spark, frames):
    from .conftest import plan_of
    t, b = frames
    plan = plan_of(contamination(t, b, n=3))
    assert "BroadcastExchange" in plan  # training side never shuffles
